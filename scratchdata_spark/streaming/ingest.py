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
        import json as _json
        import logging

        raw_lines = [r.value for r in batch_df.collect() if r.value and r.value.strip()]
        # Drop unparseable lines instead of failing the batch: a poisoned
        # file would otherwise wedge the stream forever (checkpoint
        # replays the same file on every restart). The HTTP gateway
        # validates JSON before writing, so this only fires on
        # corrupted/foreign files dropped into the source dir.
        lines, bad = [], 0
        for ln in raw_lines:
            try:
                _json.loads(ln)
                lines.append(ln)
            except ValueError:
                bad += 1
        if bad:
            logging.getLogger(__name__).warning(
                "ingest stream %s.%s batch %s: skipped %d malformed line(s)",
                dest.database, table, batch_id, bad,
            )
        if not lines:
            return
        import tempfile

        fd, path = tempfile.mkstemp(suffix=".ndjson")
        try:
            with os.fdopen(fd, "w") as f:
                f.write("\n".join(lines) + "\n")
            dest.create_empty_table(table)
            dest.create_columns(table, path)
            dest.insert_ndjson_file(table, path)
        finally:
            os.remove(path)

    writer = (
        raw.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(f"ingest_{dest.database}_{table}")
    )
    trigger = trigger or {"availableNow": True}
    return writer.trigger(**trigger).start()
