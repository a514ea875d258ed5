"""Perceptual image hashing (operators/imagehash.py): dHash
invariance under the transformations crawl duplicates exhibit
(resize, JPEG recompression, format conversion), sensitivity to
different pictures, the fake tier's exact-dup fidelity, and the
shared Hamming-band pair machinery over image hashes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scratchdata_spark.operators import imagehash as IH
from scratchdata_spark.operators import jpeg_codec, png_codec


def _gradient(w, h, seed=0):
    """Smooth radial RGB pattern — photo-like (smooth, non-monotone:
    a pure monotone plane is dHash-degenerate, every gradient bit
    identical).  The seed moves the radial centers, so different
    seeds are genuinely different pictures."""
    cx, cy = (seed * 7) % w, (seed * 5) % h
    m = max(w * w + h * h, 1)

    def rad(px, py, x, y):
        return 255 - ((x - px) ** 2 + (y - py) ** 2) * 255 // m

    return bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in (
            rad(cx, cy, x, y),
            rad(w - 1 - cx, cy, x, y),
            rad(cx, h - 1 - cy, x, y),
        )
    )


def _hamming(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_dhash_invariant_under_resize_and_recompression():
    w, h = 48, 36
    px = _gradient(w, h)
    base = IH.dhash64(png_codec.encode_png(w, h, 3, px))
    # 2x upscale (box_resize up keeps the gradient structure)
    big = png_codec.box_resize(w, h, 3, px, w * 2, h * 2)
    up = IH.dhash64(png_codec.encode_png(w * 2, h * 2, 3, big))
    assert _hamming(base, up) <= 4
    # JPEG recompression of the same pixels
    jp = IH.dhash64(jpeg_codec.encode_jpeg(w, h, 3, px, quant=2))
    assert _hamming(base, jp) <= 6
    # a different picture is far away
    other = IH.dhash64(
        png_codec.encode_png(w, h, 3, _gradient(w, h, seed=9))
    )
    # strictly outside both invariance bounds above (deterministic:
    # integer pixels, integer resample, integer luma)
    assert _hamming(base, other) > 6


def test_dhash_deterministic_and_signed():
    enc = png_codec.encode_png(16, 12, 3, _gradient(16, 12))
    a, b = IH.dhash64(enc), IH.dhash64(enc)
    assert a == b
    assert -(1 << 63) <= a < (1 << 63)


def test_dhash_images_distributed_real_tier(spark):
    rows = []
    for i in range(6):
        w, h = 24 + i, 18 + i
        px = _gradient(w, h, seed=i % 3)
        rows.append((i, bytearray(png_codec.encode_png(w, h, 3, px))))
    rows.append((6, None))            # NULL payload
    rows.append((7, bytearray(b"not an image")))  # undecodable
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r.dhash for r in IH.dhash_images(df, fake=False).collect()}
    assert got[6] is None and got[7] is None
    assert all(got[i] is not None for i in range(6))
    # distributed values equal the driver function's
    enc0 = bytes(rows[0][1])
    assert got[0] == IH.dhash64(enc0)


def test_image_near_dup_pairs_real_tier(spark):
    """PNG and its JPEG recompression pair up; a different picture
    does not; undecodable rows drop out silently."""
    w, h = 40, 30
    px_a = _gradient(w, h, seed=1)
    # a genuinely different picture: the inverse image flips every
    # luma gradient, so its dHash sits ~64 bits away
    px_b = bytes(255 - v for v in px_a)
    rows = [
        (1, bytearray(png_codec.encode_png(w, h, 3, px_a))),
        (2, bytearray(jpeg_codec.encode_jpeg(w, h, 3, px_a, quant=1))),
        (3, bytearray(png_codec.encode_png(w, h, 3, px_b))),
        (4, bytearray(b"junk")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = IH.image_near_dup_pairs(
        df, max_hamming=6, n_bands=8, fake=False
    ).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
    assert pairs[0].hamming <= 6


def test_image_pairs_fake_tier_exact_dups_only(spark):
    """Under the env-gated fake tier the hash is payload-sha-derived:
    exact payload duplicates pair at hamming 0, everything else is
    unrelated — the plumbing contract where decode is unavailable."""
    same = bytearray(b"payload-bytes-1")
    rows = [(1, same), (2, bytearray(bytes(same))), (3, bytearray(b"other"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = IH.image_near_dup_pairs(df, fake=True).collect()
    assert [(p.id_a, p.id_b, p.hamming) for p in pairs] == [(1, 2, 0)]


def test_dhash_images_keep_payload_false_prunes_bytes(spark):
    """image_near_dup_pairs' hashing pass must not round-trip image
    bytes Python->JVM: keep_payload=False emits only (id, hash)."""
    enc = png_codec.encode_png(16, 12, 3, _gradient(16, 12))
    df = spark.createDataFrame(
        [(1, bytearray(enc))], "doc_id long, payload binary"
    )
    slim = IH.dhash_images(df, fake=False, keep_payload=False)
    assert slim.columns == ["doc_id", "dhash"]
    assert slim.collect()[0].dhash == IH.dhash64(enc)
