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


def start_warc_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
    max_files_per_trigger: int = 20,
    record_types: tuple[str, ...] = ("response",),
    extract_text: bool = True,
    on_error: str = "skip",
    keep_paragraphs: bool = False,
):
    """Continuous crawl ingestion: WARC archives dropped into
    ``source_dir`` stream through the same record parser
    ``operators.warc.read_warc`` uses (one archive = one task,
    parse + HTML→text in a single mapInPandas pass) and land as
    documents-shaped parquet under ``out_dir``.

    foreachBatch is at-least-once, so each micro-batch OVERWRITES a
    deterministic ``batch_id=N`` partition subdir — a batch replayed
    after a mid-commit crash rewrites the same files instead of
    double-appending (the streaming/semantic.py sink pattern);
    readers get ``batch_id`` via partition discovery on ``out_dir``.
    The file-source checkpoint tracks consumed archives, so a
    restarted stream never re-parses completed ones.  At crawl scale
    ``maxFilesPerTrigger`` bounds per-batch memory to that many
    inflated archives across the executors.

    ``on_error`` defaults to ``'skip'`` here, the OPPOSITE of batch
    ``read_warc``: a foreachBatch retry replays the same file set, so
    under ``'fail'`` one structurally corrupt archive fails the
    micro-batch forever and wedges the stream with no way past it
    (advisor catch).  Skipped archives land as one sentinel row each
    under ``out_dir/_quarantine/batch_id=N`` (``warc_file`` = path,
    ``text`` = parse error) — sidelined, never silently dropped."""
    import os as _os

    from scratchdata_spark.operators.warc import (
        PARSE_ERROR_TYPE,
        WARC_SCHEMA,
        record_parser,
    )

    if "://" not in source_dir:
        # convenience for local dirs only — on an object-store URI
        # (s3a://, hdfs://) a driver-side makedirs would create a
        # junk LOCAL directory named after the URI (reviewer catch)
        _os.makedirs(source_dir, exist_ok=True)
    # a streaming source needs an explicit schema; binaryFile's is
    # fixed by the format (path, modificationTime, length, content)
    binary_schema = (
        "path string, modificationTime timestamp,"
        " length long, content binary"
    )
    files = (
        spark.readStream.format("binaryFile")
        .schema(binary_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "*.warc*")
        .load(source_dir)
        .select("path", "content")
    )
    parse = record_parser(
        record_types,
        extract_text,
        on_error=on_error,
        keep_paragraphs=keep_paragraphs,
    )

    def process_batch(batch_df, batch_id: int) -> None:
        from pyspark.sql import functions as F

        rows = batch_df.mapInPandas(parse, WARC_SCHEMA)
        if on_error == "skip":
            # one parse pass, split by the sentinel type: persist so
            # the good-rows write and the quarantine write don't each
            # re-inflate every archive (foreachBatch frames both
            # writes; the unpersist runs after they commit)
            rows = rows.persist()
            try:
                rows.filter(
                    F.col("warc_type") != PARSE_ERROR_TYPE
                ).write.mode("overwrite").parquet(
                    _os.path.join(out_dir, f"batch_id={batch_id}")
                )
                bad = rows.filter(F.col("warc_type") == PARSE_ERROR_TYPE)
                if bad.limit(1).count():
                    bad.write.mode("overwrite").parquet(
                        _os.path.join(
                            out_dir, "_quarantine", f"batch_id={batch_id}"
                        )
                    )
            finally:
                rows.unpersist()
        else:
            rows.write.mode("overwrite").parquet(
                _os.path.join(out_dir, f"batch_id={batch_id}")
            )

    trigger = trigger or {"availableNow": True}
    return (
        files.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**trigger)
        .start()
    )
