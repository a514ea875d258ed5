"""MJPEG-in-AVI container codec (operators/avi_codec.py): RIFF chunk
walking, probe vs full decode, near-lossless round trip, and the real
frame-sampling path through the multimodal Arrow seam."""

from __future__ import annotations

import struct

import pytest

from scratchdata_spark.operators import avi_codec as A


def _rgb_smooth(w, h, k=0):
    return bytes(
        min(255, v)
        for y in range(h)
        for x in range(w)
        for v in ((x * 9 + k * 11) % 200 + 20, (y * 7 + k * 5) % 200 + 20,
                  (x + y * 2 + k * 17) % 200 + 20)
    )


def _max_err(a: bytes, b: bytes) -> int:
    return max((abs(x - y) for x, y in zip(a, b)), default=0)


def test_avi_mjpeg_roundtrip_near_lossless():
    w, h = 20, 14
    frames = [_rgb_smooth(w, h, k) for k in range(4)]
    enc = A.encode_avi(w, h, frames, quant=1)
    assert A.sniff_avi(enc)
    assert A.probe_avi(enc) == (w, h, 4)
    dw, dh, n, dec = A.decode_avi(enc)
    assert (dw, dh, n) == (w, h, 4)
    assert all(_max_err(f, g) <= 8 for f, g in zip(frames, dec))


def test_avi_probe_is_chunkwalk_only():
    """probe_avi must succeed with every JPEG body zeroed out — proof
    it reads only the avih header, never frame entropy data."""
    w, h = 16, 10
    enc = bytearray(A.encode_avi(w, h, [_rgb_smooth(w, h, k) for k in range(3)]))
    movi = bytes(enc).find(b"movi")
    # zero everything after the movi list type (the dc chunk headers
    # survive only in the fallback-count path, which avih avoids)
    for i in range(movi + 4, len(enc)):
        enc[i] = 0
    assert A.probe_avi(bytes(enc)) == (w, h, 3)


def test_avi_total_frames_fallback_counts_dc_chunks():
    """Writers that leave dwTotalFrames=0 still probe correctly via
    the dc-chunk count (no JPEG decode)."""
    w, h = 12, 8
    enc = bytearray(A.encode_avi(w, h, [_rgb_smooth(w, h, k) for k in range(2)]))
    avih = bytes(enc).find(b"avih")
    body = avih + 8
    assert struct.unpack("<I", enc[body + 16 : body + 20])[0] == 2
    enc[body + 16 : body + 20] = struct.pack("<I", 0)
    assert A.probe_avi(bytes(enc)) == (w, h, 2)


def test_avi_zero_frames_and_bad_inputs():
    enc0 = A.encode_avi(8, 6, [])
    assert A.probe_avi(enc0) == (8, 6, 0)
    assert A.decode_avi(enc0)[:3] == (8, 6, 0)
    with pytest.raises(ValueError, match="not an AVI"):
        A.probe_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="not an AVI"):
        A.decode_avi(b"\x89PNG")
    with pytest.raises(ValueError, match="empty dimensions"):
        A.encode_avi(0, 5, [])
    # truncated chunk stream refused loudly
    enc = A.encode_avi(8, 6, [_rgb_smooth(8, 6)])
    with pytest.raises(ValueError):
        A.decode_avi(enc[: len(enc) // 2])
    # grayscale JPEG frames expand to RGB (shared frame contract)
    from scratchdata_spark.operators import jpeg_codec as J

    gray = bytes((x * 16) % 256 for _ in range(6) for x in range(8))
    j = J.encode_jpeg(8, 6, 1, gray, quant=1)
    raw = A.encode_avi(8, 6, [])

    # splice a gray-JPEG dc chunk into the empty movi list
    def chunk(fourcc, body):
        out = fourcc + struct.pack("<I", len(body)) + body
        return out + (b"\x00" if len(body) & 1 else b"")

    hdrl_start = raw.find(b"LIST")
    hdrl_size = struct.unpack("<I", raw[hdrl_start + 4 : hdrl_start + 8])[0]
    hdrl = raw[hdrl_start : hdrl_start + 8 + hdrl_size + (hdrl_size & 1)]
    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", j))
    body = b"AVI " + hdrl + movi
    spliced = b"RIFF" + struct.pack("<I", len(body)) + body
    dw, dh, n, dec = A.decode_avi(spliced)
    assert (dw, dh, n) == (8, 6, 1)
    assert len(dec[0]) == 8 * 6 * 3
    assert _max_err(dec[0], bytes(v for g in gray for v in (g, g, g))) <= 8


def test_avi_rec_interleaved_frames_decode():
    """Spec-legal interleaved AVIs wrap frame chunks in LIST('rec ')
    groups — the movi walker must recurse into them (advisor r7: a
    flat walk silently decoded such files to zero frames)."""
    w, h = 10, 8
    frames = [_rgb_smooth(w, h, k) for k in range(3)]
    from scratchdata_spark.operators import jpeg_codec as J

    jpegs = [J.encode_jpeg(w, h, 3, f, quant=1) for f in frames]

    def chunk(fourcc, body):
        out = fourcc + struct.pack("<I", len(body)) + body
        return out + (b"\x00" if len(body) & 1 else b"")

    raw = A.encode_avi(w, h, [])  # header donor (dwTotalFrames=0 path)
    hdrl_start = raw.find(b"LIST")
    hdrl_size = struct.unpack("<I", raw[hdrl_start + 4 : hdrl_start + 8])[0]
    hdrl = raw[hdrl_start : hdrl_start + 8 + hdrl_size + (hdrl_size & 1)]
    # each frame in its own rec group (what AVIF_ISINTERLEAVED writers
    # emit: one rec list per frame-time, video + audio chunks inside)
    recs = b"".join(chunk(b"LIST", b"rec " + chunk(b"00dc", j)) for j in jpegs)
    body = b"AVI " + hdrl + chunk(b"LIST", b"movi" + recs)
    enc = b"RIFF" + struct.pack("<I", len(body)) + body

    dw, dh, n, dec = A.decode_avi(enc)
    assert (dw, dh, n) == (w, h, 3)
    assert all(_max_err(f, g) <= 8 for f, g in zip(frames, dec))
    # probe's dwTotalFrames=0 fallback must count rec-grouped chunks too
    avih = enc.find(b"avih")
    assert struct.unpack("<I", enc[avih + 8 + 16 : avih + 8 + 20])[0] == 0
    assert A.probe_avi(enc) == (w, h, 3)


def test_avi_encode_flags_consistent_with_no_index():
    """encode_avi writes no idx1 chunk, so avih dwFlags must not set
    AVIF_HASINDEX (0x10) — players trusting the flag would seek a
    missing index (advisor r7)."""
    enc = A.encode_avi(8, 6, [_rgb_smooth(8, 6)])
    assert b"idx1" not in enc
    avih = enc.find(b"avih") + 8
    (flags,) = struct.unpack("<I", enc[avih + 12 : avih + 16])
    assert flags & 0x10 == 0


def test_avi_real_frame_sampling_through_seam(spark, monkeypatch):
    """sample_frames with the fake disabled: an MJPEG AVI fans out to
    evenly-spaced REAL frames, each re-encoded as a decodable PNG —
    the same contract as the GIF path."""
    from scratchdata_spark.operators import png_codec as P
    from scratchdata_spark.operators.multimodal import (
        extract_media_meta,
        sample_frames,
    )

    monkeypatch.setenv("SCRATCHDATA_FAKE_DECODE", "0")
    w, h = 14, 9
    frames = [_rgb_smooth(w, h, k) for k in range(6)]
    payload = bytearray(A.encode_avi(w, h, frames, quant=1))
    df = spark.createDataFrame(
        [(1, "video/avi", payload)],
        "doc_id long, media_type string, payload binary",
    )
    meta = extract_media_meta(df).collect()[0]
    assert (meta.width, meta.height, meta.n_frames) == (w, h, 6)

    out = sorted(sample_frames(df, max_frames=3).collect(),
                 key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in out] == [0, 2, 4]
    assert all(r.n_frames == 6 for r in out)
    for r, want_idx in zip(out, (0, 2, 4)):
        pw, ph, pch, px = P.decode_png(bytes(r.payload))
        assert (pw, ph, pch) == (w, h, 3)
        assert _max_err(px, frames[want_idx]) <= 8
