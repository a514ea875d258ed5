"""Continuous rollup: a streaming-maintained time-bucketed aggregate
(the hypertable / continuous-aggregate pattern) over an append-only
source.

Design — append-only PARTIALS, not read-modify-write:

* each micro-batch aggregates ITS OWN rows to per-(bucket, keys)
  partials (count + integer-cents sum — decomposable, merge-order
  exact) and appends them;
* the rollup's query view re-aggregates partials per bucket — reads
  amortize to the partial count, which stays tiny (one row per bucket
  per batch), and no writer ever rewrites another batch's output;
* exactly-once across restarts: partial files are staged per batch id
  then renamed to DETERMINISTIC names (``b<batch>-<part>``) — a
  replayed batch overwrites its own files byte-for-byte instead of
  duplicating them. This is the same replay contract the reference's
  at-least-once inserts rely on, upgraded to idempotence.

At scale the partial stream is the only write path touched per
trigger; a periodic ``compact_table`` folds partial files like any
other table. The final merge is a small shuffle over bucket keys.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _partials(batch_df: DataFrame, time_col: str, keys: list[str], value_col: str,
              window: str) -> DataFrame:
    return (
        batch_df.groupBy(F.window(F.col(time_col), window).alias("__w"), *keys)
        .agg(
            F.count("*").alias("partial_n"),
            # integer cents: partial merges are exact in any order
            F.sum(F.round(F.col(value_col) * 100).cast("long")).alias(
                "partial_cents"
            ),
        )
        .select(
            F.unix_micros("__w.start").alias("window_start_us"), *keys,
            "partial_n", "partial_cents",
        )
    )


def start_rollup_stream(
    stream_df: DataFrame,
    time_col: str,
    keys: list[str],
    value_col: str,
    rollup_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
):
    """Maintain the rollup from a streaming DataFrame. Returns the
    StreamingQuery (availableNow trigger: drains what exists, stops)."""
    os.makedirs(rollup_dir, exist_ok=True)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        staging = os.path.join(rollup_dir, f".staging-{batch_id}")
        _partials(batch_df, time_col, keys, value_col, window).coalesce(
            1
        ).write.mode("overwrite").parquet(staging)
        # deterministic names → a replayed batch overwrites itself
        parts = sorted(
            f for f in os.listdir(staging) if f.endswith(".parquet")
        )
        for i, f in enumerate(parts):
            os.replace(
                os.path.join(staging, f),
                os.path.join(rollup_dir, f"b{batch_id}-{i}.parquet"),
            )
        import shutil

        shutil.rmtree(staging, ignore_errors=True)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def rollup_result(
    spark: SparkSession, rollup_dir: str, keys: list[str]
) -> DataFrame:
    """Merge partials to the final continuous aggregate."""
    p = spark.read.parquet(rollup_dir)
    return (
        p.groupBy("window_start_us", *keys)
        .agg(
            F.sum("partial_n").alias("n"),
            (F.sum("partial_cents") / 100.0).alias("total_value"),
        )
        .select("window_start_us", *keys, "n", "total_value")
    )
