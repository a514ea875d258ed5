"""Multimodal columns: image/audio/video as opaque ``binary`` plus
typed metadata, with decode / feature-extraction as Arrow-batched
``mapInPandas`` stages.

The Spark-side plumbing is real and tested: binary columns, explicit
output schemas, batch-wise pandas processing, partition-preserving
metadata extraction. The *codec* layer is stubbed — this container has
no image/audio libraries — behind ``decode_image``: set
``SCRATCHDATA_FAKE_DECODE=1`` (default here) for a deterministic fake
decoder; otherwise it raises NotImplementedError where PIL/ffmpeg
would be called.

At 100 TB: binaries live in their own parquet column (columnar
pruning keeps metadata-only queries from ever touching bytes);
mapInPandas streams Arrow batches so peak memory is one batch of
decoded media per core, and ``maxRecordsPerBatch`` bounds it.
"""

from __future__ import annotations

import os
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("crc32", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize an opaque media payload column from text (the test
    corpus has no real media); schema is exactly what an ingest of
    image bytes would produce: (id, media_type, payload binary)."""
    return df.select(
        F.col(id_col),
        F.when(F.col(id_col) % 3 == 0, "image/png")
        .when(F.col(id_col) % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.encode(F.col(text_col), "utf-8").cast(BinaryType()).alias("payload"),
    )


def _fake_decode(payload: bytes, media_type: str) -> tuple[int, int, int]:
    """Deterministic stand-in for the codec call: dimensions derived
    from payload length only (mirrorable in SQL for the oracle)."""
    n = len(payload)
    return (n * 7 % 640 + 1, n * 13 % 480 + 1, n % 30 + 1)


def decode_image(payload: bytes, media_type: str) -> tuple[int, int, int]:
    """(width, height, n_frames). Real codecs are not available in
    this environment — see module docstring."""
    if os.environ.get("SCRATCHDATA_FAKE_DECODE", "1") == "1":
        return _fake_decode(payload, media_type)
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg; not present in this container"
    )


def extract_media_meta(df: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction: (doc_id, media_type, payload)
    → META_SCHEMA rows. One Arrow batch in, one out — the shape any
    real decode/resize/frame-sample stage uses."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [
                decode_image(p, m) for p, m in zip(payloads, pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": [len(p) for p in payloads],
                    "crc32": [zlib.crc32(p) for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return df.mapInPandas(run, META_SCHEMA)
