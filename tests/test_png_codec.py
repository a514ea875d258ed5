"""Pure-stdlib PNG/PPM codec (operators/png_codec.py) and its wiring
into the multimodal mapInPandas seam — real pixels end-to-end with
SCRATCHDATA_FAKE_DECODE=0."""

from __future__ import annotations

import struct
import zlib

import pytest

from scratchdata_spark.operators import png_codec as C


def _gradient(w, h, ch):
    return bytes(
        (x * 37 + y * 11 + c * 5) % 256
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_roundtrip(ch):
    w, h = 13, 7  # odd sizes catch stride bugs
    px = _gradient(w, h, ch)
    data = C.encode_png(w, h, ch, px)
    assert C.sniff(data) == "png"
    w2, h2, ch2, px2 = C.decode_png(data)
    assert (w2, h2, ch2) == (w, h, ch)
    assert px2 == px


def _png_with_filter(w, h, ch, px, ftype):
    """Hand-build a PNG whose every row uses the given filter type —
    the forward transform of RFC 2083, so decode must invert it."""
    stride = w * ch
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = px[y * stride : (y + 1) * stride]
        raw.append(ftype)
        for i in range(stride):
            left = row[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if ftype == 0:
                v = row[i]
            elif ftype == 1:
                v = row[i] - left
            elif ftype == 2:
                v = row[i] - up
            elif ftype == 3:
                v = row[i] - ((left + up) >> 1)
            else:
                v = row[i] - C._paeth(left, up, ul)
            raw.append(v & 0xFF)
        prev = row

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    color = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        C.PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_all_filter_types_defilter(ftype):
    w, h, ch = 9, 5, 3
    px = _gradient(w, h, ch)
    data = _png_with_filter(w, h, ch, px, ftype)
    assert C.decode_png(data)[3] == px


def test_png_rejects_unsupported():
    with pytest.raises(ValueError, match="not a PNG"):
        C.decode_png(b"JFIF....")
    # 16-bit depth refused loudly
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = (
        C.PNG_MAGIC
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    with pytest.raises(ValueError, match="unsupported"):
        C.decode_png(bad)


def test_ppm_roundtrip_and_comments():
    w, h = 4, 3
    px = _gradient(w, h, 3)
    data = C.encode_ppm(w, h, 3, px)
    assert C.sniff(data) == "ppm"
    assert C.decode_ppm(data) == (w, h, 3, px)
    commented = b"P6\n# a comment\n4 3\n# more\n255\n" + px
    assert C.decode_ppm(commented) == (w, h, 3, px)


def test_box_resize_exact_averages():
    # 4x2 greyscale -> 2x1: each target pixel averages a 2x2 box
    px = bytes([0, 10, 100, 110, 20, 30, 120, 130])
    out = C.box_resize(4, 2, 1, px, 2, 1)
    assert list(out) == [15, 115]
    # identity resize returns the same pixels
    assert C.box_resize(4, 2, 1, px, 4, 2) == px


def test_real_decode_through_mapinpandas(spark, monkeypatch):
    """VERDICT r4 #6: a generated PNG travels the Arrow/mapInPandas
    path with the fake disabled — metadata reports true dimensions and
    resize_images produces a decodable PNG at the target size."""
    from scratchdata_spark.operators.multimodal import (
        extract_media_meta,
        resize_images,
    )

    monkeypatch.setenv("SCRATCHDATA_FAKE_DECODE", "0")
    rows = []
    for i, (w, h) in enumerate([(12, 8), (5, 9), (16, 16)]):
        rows.append((i, "image/png", bytearray(C.encode_png(w, h, 3, _gradient(w, h, 3)))))
    df = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")

    meta = {r.doc_id: (r.width, r.height) for r in extract_media_meta(df).collect()}
    assert meta == {0: (12, 8), 1: (5, 9), 2: (16, 16)}

    out = resize_images(df, target_w=6, target_h=4).collect()
    assert len(out) == 3
    for r in out:
        assert (r.width, r.height) == (6, 4)
        w2, h2, ch2, px2 = C.decode_png(bytes(r.payload))
        assert (w2, h2, ch2) == (6, 4, 3) and len(px2) == 6 * 4 * 3

    # non-image payloads refuse loudly instead of emitting garbage
    junk = spark.createDataFrame(
        [(9, "image/jpeg", bytearray(b"JFIF not decodable"))],
        "doc_id long, media_type string, payload binary",
    )
    with pytest.raises(Exception, match="unrecognized image format"):
        resize_images(junk, 4, 4).collect()


# --------------------- round-5 adversarial-review hardening checks


def test_probe_header_only_matches_decode():
    w, h = 31, 17
    data = C.encode_png(w, h, 3, _gradient(w, h, 3))
    assert C.probe(data) == (31, 17, 3)
    ppm = C.encode_ppm(4, 3, 3, _gradient(4, 3, 3))
    assert C.probe(ppm) == (4, 3, 3)
    with pytest.raises(ValueError):
        C.probe(b"not an image")


def test_truncated_and_bomb_inputs_raise_valueerror():
    data = C.encode_png(8, 8, 3, _gradient(8, 8, 3))
    # truncated mid-chunk: ValueError, never IndexError/struct.error
    with pytest.raises(ValueError):
        C.decode_png(data[: len(data) - 20])
    # IHDR declaring absurd dimensions refuses before allocating
    ihdr = struct.pack(">IIBBBBB", 65535, 65535, 8, 2, 0, 0, 0)
    bomb = (
        C.PNG_MAGIC
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )
    with pytest.raises(ValueError, match="out of range"):
        C.decode_png(bomb)
    with pytest.raises(ValueError, match="out of range"):
        C.probe(bomb)
    # truncated PPM header
    with pytest.raises(ValueError):
        C.decode_ppm(b"P6\n4")


def test_wav_roundtrip_and_meta_mapping(spark, monkeypatch):
    """PCM WAV rides the same codec seam: header info round-trips and
    the metadata stage maps (channels, rate, frames) into its
    width/height/n_frames columns with the fake disabled."""
    from scratchdata_spark.operators.multimodal import extract_media_meta

    samples = b"\x00\x01\x02\x03" * 50  # 100 frames of 16-bit mono
    data = C.encode_wav(1, 16000, samples)
    assert C.sniff_wav(data)
    assert C.wav_info(data) == (1, 16000, 100)
    with pytest.raises(ValueError, match="bad WAV"):
        C.wav_info(b"RIFF....WAVEgarbage")

    monkeypatch.setenv("SCRATCHDATA_FAKE_DECODE", "0")
    df = spark.createDataFrame(
        [(1, "audio/wav", bytearray(data))],
        "doc_id long, media_type string, payload binary",
    )
    row = extract_media_meta(df).collect()[0]
    assert (row.width, row.height, row.n_frames) == (1, 16000, 100)
