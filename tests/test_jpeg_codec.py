"""Baseline JPEG codec (operators/jpeg_codec.py): encode→decode round
trips, marker/probe behavior, subsampling, and the Arrow/mapInPandas
seam. VERDICT r5 'What's missing #1' / 'Next round #9'."""

from __future__ import annotations

import numpy as np
import pytest

from scratchdata_spark.operators import jpeg_codec as J


def _gray(w, h):
    return bytes((x * 3 + y * 5) % 256 for y in range(h) for x in range(w))


def _rgb_smooth(w, h):
    """Low-chroma-frequency gradient: survives 4:2:0 within ±8."""
    return bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in (x * 4 % 250, y * 6 % 250, (x + y) * 3 % 250)
    )


def _max_err(a: bytes, b: bytes) -> int:
    return int(
        np.abs(
            np.frombuffer(a, np.uint8).astype(int)
            - np.frombuffer(b, np.uint8).astype(int)
        ).max()
    )


@pytest.mark.parametrize(
    "w,h,ch", [(20, 13, 1), (17, 9, 3), (8, 8, 3), (1, 1, 3), (9, 25, 1)]
)
def test_jpeg_roundtrip_444(w, h, ch):
    px = _gray(w, h) if ch == 1 else _rgb_smooth(w, h)
    enc = J.encode_jpeg(w, h, ch, px)
    assert J.sniff_jpeg(enc)
    assert J.probe_jpeg(enc) == (w, h, ch)
    w2, h2, c2, out = J.decode_jpeg(enc)
    assert (w2, h2, c2) == (w, h, ch)
    # quant=1 is near-lossless: only DCT/color rounding remains
    assert _max_err(px, out) <= 2


def test_jpeg_roundtrip_420_subsampled():
    """4:2:0 exercises the decoder's multi-block MCU + upsampling
    path; smooth chroma keeps the subsampling loss tiny, so a block-
    ordering or upsample-alignment bug shows as a big error."""
    w, h = 48, 32
    px = _rgb_smooth(w, h)
    enc = J.encode_jpeg(w, h, 3, px, subsample=2)
    w2, h2, c2, out = J.decode_jpeg(enc)
    assert (w2, h2, c2) == (w, h, 3)
    assert _max_err(px, out) <= 8
    # non-multiple-of-16 dims (MCU padding + crop)
    w, h = 21, 11
    enc = J.encode_jpeg(w, h, 3, _rgb_smooth(w, h), subsample=2)
    w2, h2, c2, out = J.decode_jpeg(enc)
    assert (w2, h2, c2) == (w, h, 3)
    assert _max_err(_rgb_smooth(w, h), out) <= 8
    # flat color is invariant under subsampling — must be exact-ish
    px = bytes([200, 30, 90]) * (24 * 16)
    enc = J.encode_jpeg(24, 16, 3, px, subsample=2)
    _, _, _, out = J.decode_jpeg(enc)
    assert _max_err(px, out) <= 1


def test_jpeg_lossy_quant_still_bounded():
    w, h = 64, 48
    px = _gray(w, h)
    enc = J.encode_jpeg(w, h, 1, px, quant=4)
    _, _, _, out = J.decode_jpeg(enc)
    assert _max_err(px, out) <= 16  # coarse quant, bounded loss
    # and it actually compresses harder than quant=1
    assert len(enc) < len(J.encode_jpeg(w, h, 1, px))


def test_jpeg_rejects_bad_inputs():
    with pytest.raises(ValueError, match="not a JPEG"):
        J.decode_jpeg(b"\x89PNG nope")
    with pytest.raises(ValueError, match="not a JPEG"):
        J.probe_jpeg(b"GIF89a")
    with pytest.raises(ValueError):
        J.encode_jpeg(0, 5, 3, b"")
    with pytest.raises(ValueError):
        J.encode_jpeg(4, 4, 2, bytes(32))
    with pytest.raises(ValueError):  # buffer size mismatch
        J.encode_jpeg(4, 4, 3, bytes(5))
    with pytest.raises(ValueError):  # grayscale can't subsample
        J.encode_jpeg(4, 4, 1, bytes(16), subsample=2)
    # truncated entropy stream
    enc = J.encode_jpeg(16, 16, 3, _rgb_smooth(16, 16))
    with pytest.raises(ValueError):
        J.decode_jpeg(enc[: len(enc) // 2])
    # progressive SOF2 refused loudly, not mis-decoded
    prog = bytearray(enc)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        J.decode_jpeg(bytes(prog))


def test_jpeg_probe_is_header_only():
    """probe_jpeg must succeed on a payload truncated right after the
    SOF marker — proof it never touches entropy data (the O(1)
    metadata-path contract)."""
    enc = J.encode_jpeg(33, 21, 3, _rgb_smooth(33, 21))
    sos = enc.find(b"\xff\xda")
    assert J.probe_jpeg(enc[:sos]) == (33, 21, 3)


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker code (round-6 advisor finding: the walk read the pad 0xFF
    as the marker and a bogus segment length).  Pad every marker in a
    valid stream with extra 0xFF bytes — probe and decode must both
    still work, bit-for-bit."""
    w, h = 16, 16
    px = _rgb_smooth(w, h)
    enc = J.encode_jpeg(w, h, 3, px)
    ref = J.decode_jpeg(enc)
    # re-emit the stream, doubling the 0xFF before each marker segment
    # header (walk markers, skip entropy after SOS)
    padded = bytearray(enc[:2])
    pos = 2
    while pos < len(enc):
        assert enc[pos] == 0xFF
        marker = enc[pos + 1]
        padded += b"\xff\xff\xff" + bytes([marker])
        if marker == 0xDA:  # SOS: copy the rest verbatim
            padded += enc[pos + 2 :]
            break
        seglen = int.from_bytes(enc[pos + 2 : pos + 4], "big")
        padded += enc[pos + 2 : pos + 2 + seglen]
        pos += 2 + seglen
    assert J.probe_jpeg(bytes(padded)) == (w, h, 3)
    assert J.decode_jpeg(bytes(padded)) == ref


def test_jpeg_probe_truncated_mid_fill_run_raises_valueerror():
    """A buffer that ends inside a 0xFF fill run must fail with the
    codec's ValueError contract, not a struct.error from reading the
    fill byte as a marker (review finding on the fill-skip fix)."""
    with pytest.raises(ValueError, match="jpeg"):
        J.probe_jpeg(b"\xff\xd8" + b"\xff" * 10)


def test_jpeg_quant_table_rounded_and_validated():
    """A non-integer custom quant table must be rounded up front so the
    DCT division and the DQT bytes agree (round-6 advisor finding:
    int()-truncated DQT bytes silently skewed pixels); out-of-range
    tables are refused loudly."""
    import numpy as np

    w, h = 24, 16
    px = _gray(w, h)
    frac = np.full((8, 8), 2.6)
    enc = J.encode_jpeg(w, h, 1, px, quant=frac)
    ref = J.encode_jpeg(w, h, 1, px, quant=np.full((8, 8), 3.0))
    assert enc == ref  # 2.6 rounds to 3, not truncates to 2
    _, _, _, out = J.decode_jpeg(enc)
    assert _max_err(px, out) <= 12
    for bad in (0, 256, np.full((8, 8), 0.2), np.full((4, 4), 5.0)):
        with pytest.raises(ValueError, match="quant table"):
            J.encode_jpeg(w, h, 1, px, quant=bad)


def test_jpeg_zigzag_matches_spec_prefix():
    """The generated zigzag table must equal the published T.81 order
    (spot-check the canonical first/last entries — a transposed or
    reflected table would still round-trip internally)."""
    expected_prefix = [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
        (2, 1), (3, 0),
    ]
    assert J._ZZ[:10] == expected_prefix
    assert J._ZZ[-3:] == [(6, 7), (7, 6), (7, 7)]


def test_jpeg_through_multimodal_seam(spark, monkeypatch):
    """A generated baseline JPEG travels the Arrow/mapInPandas path
    with the fake disabled: metadata probes true dimensions and
    resize_images decodes JPEG → resamples → re-encodes PNG (the
    normalize-to-PNG pipeline shape)."""
    from scratchdata_spark.operators import png_codec as P
    from scratchdata_spark.operators.multimodal import (
        extract_media_meta,
        resize_images,
    )

    monkeypatch.setenv("SCRATCHDATA_FAKE_DECODE", "0")
    rows = []
    for i, (w, h, sub) in enumerate([(12, 8, 1), (24, 16, 2), (16, 16, 1)]):
        rows.append(
            (
                i,
                "image/jpeg",
                bytearray(
                    J.encode_jpeg(w, h, 3, _rgb_smooth(w, h), subsample=sub)
                ),
            )
        )
    df = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    meta = {r.doc_id: (r.width, r.height) for r in extract_media_meta(df).collect()}
    assert meta == {0: (12, 8), 1: (24, 16), 2: (16, 16)}

    out = resize_images(df, target_w=6, target_h=4).collect()
    assert len(out) == 3
    for r in out:
        assert (r.width, r.height) == (6, 4)
        w2, h2, ch2, px2 = P.decode_png(bytes(r.payload))
        assert (w2, h2, ch2) == (6, 4, 3) and len(px2) == 6 * 4 * 3
