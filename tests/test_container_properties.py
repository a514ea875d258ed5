"""Property-based hardening of the container parsers (hypothesis):
for ANY valid encode parameters the probe recovers them exactly, and
for ANY truncation/corruption the parser refuses with ValueError —
never hangs, never returns silently wrong metadata.  These are the
invariants that matter when the input is 100 TB of crawled bytes
nobody pre-validated."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from scratchdata_spark.operators import audio_containers as A
from scratchdata_spark.operators import mp4_codec as M
from scratchdata_spark.operators import warc as W
from scratchdata_spark.operators import webm_codec as WM

# Container probes are pure byte arithmetic — keep examples tight so
# the suite stays fast; shrinking still explores the boundaries.
_FAST = settings(max_examples=60, deadline=None)


@_FAST
@given(
    w=st.integers(1, 4096),
    h=st.integers(1, 4096),
    n=st.integers(0, 50),
    fps=st.integers(1, 120),
)
def test_mp4_probe_roundtrip_any_params(w, h, n, fps):
    enc = M.encode_mp4_shell(w, h, n, fps=fps)
    assert M.probe_mp4(enc) == (w, h, n)
    info = M.mp4_info(enc)
    assert info["duration_ms"] == n * (1000 // fps)


@_FAST
@given(
    w=st.integers(1, 4096),
    h=st.integers(1, 4096),
    n=st.integers(0, 700),
    fps=st.integers(1, 120),
)
def test_webm_probe_roundtrip_any_params(w, h, n, fps):
    enc = WM.encode_webm_shell(w, h, n, fps=fps)
    assert WM.probe_webm(enc) == (w, h, n)


@_FAST
@given(
    ch=st.integers(1, 8),
    rate=st.integers(1, (1 << 20) - 1),
    n=st.integers(0, (1 << 36) - 1),
    bits=st.sampled_from([8, 16, 24, 32]),
)
def test_flac_probe_roundtrip_any_params(ch, rate, n, bits):
    enc = A.encode_flac_shell(ch, rate, n, bits=bits)
    assert A.probe_flac(enc) == (ch, rate, n)
    assert A.flac_info(enc)["bits_per_sample"] == bits


@_FAST
@given(
    ch=st.integers(1, 8),
    n=st.integers(0, 1 << 40),
    pre=st.integers(0, 65535),
    codec=st.sampled_from(["opus", "vorbis"]),
)
def test_ogg_probe_roundtrip_any_params(ch, n, pre, codec):
    rate = 48000 if codec == "opus" else 44100
    kw = {"pre_skip": pre} if codec == "opus" else {}
    enc = A.encode_ogg_shell(ch, rate, n, codec=codec, **kw)
    assert A.probe_ogg(enc) == (ch, rate, n)


@_FAST
@given(cut=st.integers(1, 200), data=st.data())
def test_truncated_containers_refuse_never_hang(cut, data):
    """Truncating any container at any point must either still parse
    (prefix happens to be self-contained) or raise ValueError —
    never hang, never crash with a non-ValueError."""
    which = data.draw(st.sampled_from(["mp4", "webm", "flac", "ogg"]))
    enc = {
        "mp4": lambda: M.encode_mp4_shell(32, 24, 3),
        "webm": lambda: WM.encode_webm_shell(32, 24, 3),
        "flac": lambda: A.encode_flac_shell(2, 8000, 800),
        "ogg": lambda: A.encode_ogg_shell(2, 48000, 4800),
    }[which]()
    probe = {
        "mp4": M.probe_mp4, "webm": WM.probe_webm,
        "flac": A.probe_flac, "ogg": A.probe_ogg,
    }[which]
    trunc = enc[: max(0, len(enc) - cut)]
    try:
        probe(trunc)
    except ValueError:
        pass  # loud refusal is the contract


@_FAST
@given(
    flip_at=st.integers(0, 10_000),
    flip_to=st.integers(0, 255),
)
def test_corrupted_byte_never_hangs_webm(flip_at, flip_to):
    """One flipped byte anywhere in a WebM must parse, refuse with
    ValueError, or (if it hit opaque payload) still probe — bounded
    work either way (the EBML walker's length arithmetic must never
    loop)."""
    enc = bytearray(WM.encode_webm_shell(64, 48, 5))
    enc[flip_at % len(enc)] = flip_to
    try:
        w, h, n = WM.probe_webm(bytes(enc))
        assert 0 <= n <= 10_000  # lacing byte can inflate a count
    except ValueError:
        pass


@_FAST
@given(
    n_pages=st.integers(0, 4),
    pad=st.sampled_from([b"", b"\r\n", b"\n", b"\r\n\r\n"]),
)
def test_warc_records_roundtrip_with_padding(n_pages, pad):
    recs = [
        W.encode_warc_record(
            "response",
            W.encode_http_response(f"<p>page {i}</p>".encode()),
            target_uri=f"https://e.com/{i}",
        )
        for i in range(n_pages)
    ]
    blob = pad.join(recs) + pad
    got = list(W.iter_warc_records(blob))
    assert [r["target_uri"] for r in got] == [
        f"https://e.com/{i}" for i in range(n_pages)
    ]


@_FAST
@given(cut=st.integers(1, 400))
def test_warc_truncation_refuses_never_hangs(cut):
    rec = W.encode_warc_record(
        "response", W.encode_http_response(b"<p>body text</p>" * 8),
        target_uri="https://e.com/x",
    )
    trunc = rec[: max(0, len(rec) - cut)]
    try:
        list(W.iter_warc_records(trunc))
    except ValueError:
        pass
