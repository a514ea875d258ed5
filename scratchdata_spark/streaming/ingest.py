"""Structured-Streaming ingest: the Spark-native alternative to the
worker-pool path (SURVEY §3.1 translation option (a)).

``readStream`` on the sink's blob directory per (database, table) +
``foreachBatch`` running the same schema-merge/cast-on-write insert
the batch worker uses. Checkpointing gives exactly-once per file —
strictly stronger than the reference's at-least-once queue (a
replayed file cannot double-insert because the file-source tracks
consumed files in the checkpoint).

At scale this is the production path: ``maxFilesPerTrigger`` bounds
per-batch work, the trigger interval replaces the queue poll, and no
driver-side queue bookkeeping exists at all.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from scratchdata_spark.engine import SparkDestination


def start_table_ingest_stream(
    spark: SparkSession,
    dest: SparkDestination,
    table: str,
    source_dir: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
    max_files_per_trigger: int = 100,
    dedupe_keys: list[str] | None = None,
):
    """Stream NDJSON files for one table into the destination.

    The streaming source needs a fixed schema; we read every line as
    raw text and let foreachBatch re-infer per micro-batch — schema
    evolution therefore works exactly like the batch path (ADD COLUMNS
    between micro-batches), which a typed streaming schema could not do.
    """
    os.makedirs(source_dir, exist_ok=True)
    raw = (
        spark.readStream.schema(StructType([StructField("value", StringType())]))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .text(source_dir)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        # A micro-batch from a file source IS a file list — hand the
        # paths to the same atomic batch insert the worker pool uses.
        # No row ever crosses to the driver: executors read, cast and
        # write; the driver only touches file names (and streams the
        # type-inference pass over them). skip_malformed: a poisoned
        # file must not wedge the stream (checkpoint would replay it
        # on every restart).
        from urllib.parse import unquote, urlparse

        from pyspark.sql import functions as F

        # distinct file names computed executor-side; only the names
        # (not rows) are collected
        names = (
            batch_df.select(F.input_file_name().alias("f")).distinct().collect()
        )
        files = []
        for r in names:
            p = urlparse(r.f)
            files.append(unquote(p.path) if p.scheme in ("file", "") else r.f)
        if not files:
            return
        # dedupe_keys: idempotent-by-key micro-batches — checkpointing
        # already makes each FILE exactly-once, but an at-least-once
        # PRODUCER resending rows in fresh files needs the key-level
        # anti-join (engine.insert_ndjson) to keep the table clean
        dest.insert_ndjson(
            table, files, skip_malformed=True, dedupe_keys=dedupe_keys
        )

    writer = (
        raw.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(f"ingest_{dest.database}_{table}")
    )
    trigger = trigger or {"availableNow": True}
    return writer.trigger(**trigger).start()
