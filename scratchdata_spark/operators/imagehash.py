"""Perceptual image hashing + image-level near-dup pairs — the
multimodal counterpart of text SimHash: re-encoded, resized or
lightly-recompressed copies of the same picture should collapse
before a training mix ever sees them.

The reference has no image surface (SURVEY.md §2 — beyond-parity).
The hash is the public dHash (difference hash) construction: decode →
grayscale (ITU-R BT.601 integer luma) → box-resample to 9×8 →
compare horizontal neighbors → 64 gradient bits.  Gradients survive
exactly the transformations crawl duplicates exhibit (resize,
quality-level recompression, format conversion) while Hamming
distance grows quickly for genuinely different pictures — the same
published behavior pHash/dHash deployments rely on.

Everything integer and pure stdlib+numpy:

* decode reuses the in-tree codecs (png_codec PNG/PPM full decode,
  jpeg_codec baseline JPEG) inside an Arrow ``mapInPandas`` batch —
  one image resident per row being processed, the multimodal module's
  memory contract;
* the 9×8 box resample is ``png_codec.box_resize`` (integer box
  filter), so two runs — or two machines — produce bit-identical
  hashes;
* pair generation is :func:`dedup.hamming_band_pairs` — the SAME
  pigeonhole band-LSH, family collapse and hot-bucket cap the text
  SimHash tier uses, so the scale arguments (8-byte shuffle keys,
  capped buckets, exhaustive hamming-0) carry over verbatim.

Fake-decode tier: under ``SCRATCHDATA_FAKE_DECODE=1`` (the
container default — see multimodal._use_fake) the hash is the first
8 bytes of sha256(payload): deterministic, collision-faithful for
EXACT payload duplicates, so the distributed plumbing and the pair
machinery stay testable where PIL/ffmpeg-class codecs are absent.
Real tier activates per-call via ``fake=False`` (the codecs above
are in-tree, so PNG/PPM/JPEG need no external libs)."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from scratchdata_spark.operators.dedup import hamming_band_pairs
from scratchdata_spark.operators.multimodal import _use_fake


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def dhash64(payload: bytes) -> int:
    """dHash of one decoded image payload (PNG/PPM/JPEG) as a SIGNED
    64-bit int (Spark LongType).  Integer arithmetic end to end:
    BT.601 luma via (299·R + 587·G + 114·B) // 1000, integer box
    resample to 9×8, row-major MSB-first gradient bits."""
    from scratchdata_spark.operators import jpeg_codec, png_codec

    b = bytes(payload)
    if jpeg_codec.sniff_jpeg(b):
        w, h, ch, px = jpeg_codec.decode_jpeg(b)
    else:
        w, h, ch, px = png_codec.decode(b)
    small = png_codec.box_resize(w, h, ch, px, 9, 8)
    if ch >= 3:
        luma = [
            (299 * small[i] + 587 * small[i + 1] + 114 * small[i + 2])
            // 1000
            for i in range(0, 9 * 8 * ch, ch)
        ]
    else:
        luma = [small[i * ch] for i in range(9 * 8)]
    bits = 0
    for r in range(8):
        for c in range(8):
            bits = (bits << 1) | (
                1 if luma[r * 9 + c] < luma[r * 9 + c + 1] else 0
            )
    return _to_signed64(bits)


def _fake_dhash(payload: bytes) -> int:
    """Deterministic stand-in where decode is env-gated off: first 8
    sha256 bytes — exact payload duplicates collide, nothing else."""
    d = hashlib.sha256(bytes(payload)).digest()
    return _to_signed64(int.from_bytes(d[:8], "big"))


def dhash_images(
    df: DataFrame,
    payload_col: str = "payload",
    out_col: str = "dhash",
    fake: bool | None = None,
    keep_payload: bool = True,
) -> DataFrame:
    """df + ``out_col``: the 64-bit perceptual hash per image row.
    Output columns derive from the input schema — there is no id
    column to name (advisor catch r9: a declared-but-unused id_col
    implied special treatment that never happened).
    One Arrow pass; undecodable/NULL payloads yield NULL (contained,
    never fail the corpus — the try_parse_url rule applied to
    pixels).  ``fake`` defaults to the module-wide env gate, resolved
    on the DRIVER and closed over (executor workers fork before env
    changes).

    ``keep_payload=False`` emits ONLY (non-payload columns, hash):
    mapInPandas output schemas are fixed, so a downstream ``select``
    cannot prune through them — a caller that only needs the hash
    (image_near_dup_pairs) would otherwise ship every image's bytes
    Python→JVM just to drop them (reviewer catch)."""
    import pandas as pd

    use_fake = _use_fake() if fake is None else fake
    out_fields = [
        f for f in df.schema.fields
        if keep_payload or f.name != payload_col
    ]
    schema = StructType(out_fields + [StructField(out_col, LongType())])
    cols = [f.name for f in out_fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(p) -> int | None:
            if p is None:
                return None
            try:
                # hostile headers surface as ValueError in the
                # in-tree codecs (their documented contract)
                return _fake_dhash(p) if use_fake else dhash64(p)
            except (ValueError, NotImplementedError):
                return None

        for pdf in batches:
            out = pdf[cols].copy()
            out[out_col] = pd.array(
                [one(p) for p in pdf[payload_col]], dtype="Int64"
            )
            yield out

    return df.mapInPandas(run, schema)


def image_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    n_bands: int = 4,
    max_bucket_size: int | None = 4096,
    intra_family: str = "pairs",
    fake: bool | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) image near-dup pairs: hash each payload
    once, drop NULL hashes (undecodable images can't be compared),
    then the shared Hamming-band LSH.  Only (id, 8-byte hash) rows
    ever shuffle — pixels stay in the scan stage."""
    hashed = dhash_images(
        df.select(id_col, payload_col), payload_col,
        out_col="__fp", fake=fake, keep_payload=False,
    ).filter(F.col("__fp").isNotNull())
    return hamming_band_pairs(
        hashed, id_col, "__fp", max_hamming, n_bands, max_bucket_size,
        intra_family,
    )
