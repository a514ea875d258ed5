"""Shared operator utilities.

``ensure_parallelism`` protects compute-heavy operators (LSH
projections, minhash signatures, regex scoring) from degenerate input
layouts: a single cached partition or a one-row-group parquet file
would serialize the arithmetic on one core no matter how wide the
cluster is. At real scale the input has far more partitions than
cores and the helper is a no-op — the repartition only fires on
narrow inputs, where its shuffle is trivially small by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the cluster's default parallelism if
    its current layout has fewer partitions; pass through otherwise.

    Call it on the projected compute input (ids + payload columns
    only), so the fan-out shuffle moves the minimum bytes.
    """
    sc = df.sparkSession.sparkContext
    goal = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < goal:
        return df.repartition(goal)
    return df
