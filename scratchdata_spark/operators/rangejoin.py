"""Bucketed range join: point-in-interval matching without the
nested-loop product.

Spark plans a non-equi join (``p >= start AND p < end``) as
BroadcastNestedLoopJoin or a cartesian+filter — O(|points| ×
|intervals|) comparisons, the classic scale killer for time-range
lookups. The bucket trick restores an equi-join:

* choose a bucket width W in the domain's units;
* each point belongs to bucket ``p div W``;
* each interval explodes to every bucket it overlaps
  (``start div W .. end div W`` — a ``sequence`` explode);
* equi-join on bucket, then refine with the exact predicate.

A (point, interval) pair can only meet at the point's single bucket,
so no dedup is needed. Cost: |points| + Σ interval_buckets shuffled
rows instead of the product — with W ≈ median interval length, each
interval explodes to ~2 rows. Long intervals fan out more (cap W
accordingly); hot buckets fall back to AQE skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKET = "__rj_bucket"


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    end_inclusive: bool = False,
) -> DataFrame:
    """Inner join of points to the intervals containing them. The
    range columns must be numeric (cast timestamps with unix_micros
    beforehand); ``bucket_width`` is in the same units."""
    p = points.withColumn(
        BUCKET, (F.col(point_col) / bucket_width).cast("long")
    )
    iv = intervals.withColumn(
        BUCKET,
        F.explode(
            F.sequence(
                (F.col(start_col) / bucket_width).cast("long"),
                (F.col(end_col) / bucket_width).cast("long"),
            )
        ),
    )
    refine = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) <= F.col(end_col)
        if end_inclusive
        else F.col(point_col) < F.col(end_col)
    )
    return p.join(iv, BUCKET).filter(refine).drop(BUCKET)
