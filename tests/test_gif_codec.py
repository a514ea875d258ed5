"""GIF codec (operators/gif_codec.py): LZW round trips, block-walk
probe, frame composition, and the real frame-sampling path through
the Arrow seam — the multi-frame format that makes sample_frames
real in-sandbox."""

from __future__ import annotations

import pytest

from scratchdata_spark.operators import gif_codec as G


def _frame(w, h, k):
    """Quantized gradient (small distinct-color count by design)."""
    return bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in (
            (x * 20 + k * 40) % 256 // 32 * 32,
            (y * 25) % 256 // 32 * 32,
            (k * 60) % 256 // 64 * 64,
        )
    )


def test_gif_multiframe_roundtrip_exact():
    w, h = 13, 9
    frames = [_frame(w, h, k) for k in range(4)]
    enc = G.encode_gif(w, h, frames)
    assert G.sniff_gif(enc)
    assert G.probe_gif(enc) == (w, h, 4)
    dw, dh, nf, dec = G.decode_gif(enc)
    assert (dw, dh, nf) == (w, h, 4)
    assert dec == frames  # palette round trip is lossless


def test_gif_lzw_dictionary_growth_and_chunking():
    """A frame large enough to grow the LZW dictionary through
    several code widths and span multiple 255-byte sub-blocks."""
    import random

    rng = random.Random(7)
    w, h = 80, 60
    pal = [(i * 37 % 256, i * 91 % 256, i * 53 % 256) for i in range(16)]
    px = bytes(v for _ in range(w * h) for v in pal[rng.randrange(16)])
    enc = G.encode_gif(w, h, [px])
    assert G.decode_gif(enc)[3][0] == px


def test_gif_probe_is_blockwalk_only():
    """probe counts frames without LZW decode: corrupting the LZW
    payload bytes breaks decode but not probe."""
    w, h = 10, 8
    enc = bytearray(G.encode_gif(w, h, [_frame(w, h, 0), _frame(w, h, 1)]))
    # corrupt a byte inside the first image's data sub-block (after
    # the image descriptor + min-code-size)
    i = enc.index(b"\x2c")
    # descriptor(10) + min code(1) + len byte -> first data byte
    enc[i + 12] ^= 0xFF
    assert G.probe_gif(bytes(enc)) == (w, h, 2)
    with pytest.raises(ValueError):
        G.decode_gif(bytes(enc))


def test_gif_rejects_bad_inputs():
    with pytest.raises(ValueError, match="not a GIF"):
        G.decode_gif(b"\x89PNG")
    with pytest.raises(ValueError, match="not a GIF"):
        G.probe_gif(b"JFIF")
    with pytest.raises(ValueError):
        G.encode_gif(4, 4, [])
    with pytest.raises(ValueError):  # frame size mismatch
        G.encode_gif(4, 4, [bytes(5)])
    with pytest.raises(ValueError, match="256 distinct"):
        big = bytes(
            v for i in range(300) for v in (i % 256, i // 256, 7)
        ) + bytes((300 * 3) % 3)  # 300 distinct colors in a 300px row
        G.encode_gif(300, 1, [big])
    enc = G.encode_gif(6, 6, [_frame(6, 6, 0)])
    with pytest.raises(ValueError):
        G.decode_gif(enc[: len(enc) // 2])


def test_gif_real_frame_sampling_through_seam(spark, monkeypatch):
    """sample_frames with the fake disabled: an animated GIF fans out
    to evenly-spaced REAL frames, each re-encoded as a decodable PNG
    of the full canvas."""
    from scratchdata_spark.operators import png_codec as P
    from scratchdata_spark.operators.multimodal import (
        extract_media_meta,
        sample_frames,
    )

    monkeypatch.setenv("SCRATCHDATA_FAKE_DECODE", "0")
    w, h = 12, 7
    frames = [_frame(w, h, k) for k in range(6)]
    payload = bytearray(G.encode_gif(w, h, frames))
    df = spark.createDataFrame(
        [(1, "image/gif", payload)],
        "doc_id long, media_type string, payload binary",
    )
    # metadata probe reports the real frame count
    meta = extract_media_meta(df).collect()[0]
    assert (meta.width, meta.height, meta.n_frames) == (w, h, 6)

    out = sorted(sample_frames(df, max_frames=3).collect(),
                 key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in out] == [0, 2, 4]
    assert all(r.n_frames == 6 for r in out)
    for r, want_idx in zip(out, (0, 2, 4)):
        pw, ph, pch, px = P.decode_png(bytes(r.payload))
        assert (pw, ph, pch) == (w, h, 3)
        assert px == frames[want_idx]
