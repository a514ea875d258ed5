"""Cross-destination copy (operator A16): source query → chunked
NDJSON → destination schema-merge + bulk load.

Reference (``workers/copier.go`` + ``util/chunkedwriter.go``): the
source streams NDJSON into chunk files split at newline boundaries
past ``bulk_chunk_size_bytes``, hard-capped at
``max_bulk_query_size_bytes``; each chunk re-infers columns and loads.

Spark fast path: when both ends are SparkDestinations sharing a
session, the copy is a single distributed write — no driver
round-trip, no NDJSON. The generic path works across any Destination
pair (e.g. Spark → DuckDB) through the streamed-chunk contract.
"""

from __future__ import annotations

import io
import os
import tempfile

from scratchdata_spark.config import WorkersConfig
from scratchdata_spark.engine import Destination, SparkDestination


class CopyTooLargeError(RuntimeError):
    pass


def copy_data(
    source: Destination,
    query: str,
    dest: Destination,
    dest_table: str,
    config: WorkersConfig | None = None,
) -> int:
    """Returns rows copied."""
    config = config or WorkersConfig()

    if (
        isinstance(source, SparkDestination)
        and isinstance(dest, SparkDestination)
        and source.spark.sparkContext is dest.spark.sparkContext
    ):
        # Same cluster (possibly different child sessions): distributed
        # write straight into the destination's table directory.
        df = source.query_df(query)
        # distributed write path: infer jsontypes from the result
        # schema, register columns, then append with cast-on-write.
        types = {}
        for f in df.schema.fields:
            s = f.dataType.simpleString()
            types[f.name] = (
                "int"
                if s in ("tinyint", "smallint", "int", "bigint")
                else "float"
                if s in ("float", "double")
                else "bool"
                if s == "boolean"
                else "string"
            )
        dest.catalog.create_empty_table(dest.database, dest_table)
        dest.catalog.add_columns(dest.database, dest_table, types)
        info = dest.catalog.get(dest.database, dest_table)
        from pyspark.sql import functions as F

        cols = []
        for fld in info.struct().fields:
            if fld.name in df.columns:
                cols.append(F.col(fld.name).try_cast(fld.dataType).alias(fld.name))
            else:
                cols.append(F.lit(None).cast(fld.dataType).alias(fld.name))
        n = df.count()
        df.select(*cols).write.mode("append").parquet(
            dest.catalog.data_dir(dest.database, dest_table)
        )
        return n

    # generic path: stream NDJSON in newline-aligned chunks
    total_bytes = 0
    rows = 0
    buf = io.StringIO()
    source.query_ndjson(query, buf)
    data = buf.getvalue()
    total_bytes = len(data.encode())
    if total_bytes > config.max_bulk_query_size_bytes:
        raise CopyTooLargeError(
            f"result {total_bytes}B exceeds max_bulk_query_size_bytes"
        )
    lines = data.splitlines()
    chunk: list[str] = []
    size = 0
    for line in lines:
        chunk.append(line)
        size += len(line) + 1
        if size >= config.bulk_chunk_size_bytes:
            rows += _load_chunk(dest, dest_table, chunk)
            chunk, size = [], 0
    if chunk:
        rows += _load_chunk(dest, dest_table, chunk)
    return rows


def _load_chunk(dest: Destination, table: str, lines: list[str]) -> int:
    fd, path = tempfile.mkstemp(suffix=".ndjson")
    try:
        with os.fdopen(fd, "w") as f:
            f.write("\n".join(lines) + "\n")
        dest.create_empty_table(table)
        dest.create_columns(table, path)
        dest.insert_ndjson_file(table, path)
        return len(lines)
    finally:
        if os.path.exists(path):
            os.remove(path)
