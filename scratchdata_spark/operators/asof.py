"""AS-OF join — an operator Spark lacks natively (SURVEY §2.B "Joins — AS OF").

The reference's default backend (DuckDB, loaded at
``duckdb/duckdb.go:80-98``) exposes ``ASOF JOIN``; users of the
reference can therefore run as-of queries, so we provide the operator.

Spark-first implementation: the **union + window trick** — no range
explosion, no per-key loop:

1. tag left rows 1 / right rows 0 and union them by name on
   (keys, ts) with each side's payload nulled on the other side;
2. one window per key-group ordered by (ts, tag, tiebreak):
   ``last(right_payload, ignorenulls=True)`` carries the most recent
   right row at-or-before each left row;
3. keep the left rows.

Cost at scale: ONE shuffle of |L|+|R| rows by key + a per-partition
sort — the same cost as a sort-merge join, versus the naive
range-join + row_number which materializes |L|×|R_matching| pairs.
Skewed keys are handled by AQE skew-join splitting on the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    tiebreak: str | None = None,
    direction: str = "backward",
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (direction="backward"; "forward" gives the
    earliest right row with ``right_ts >= left_ts``) within `keys`.

    Right payload columns keep their names; they must not collide with
    left column names (rename beforehand if they do). ``tiebreak`` is a
    right-side column making the pick deterministic when two right rows
    share a timestamp (the larger value wins for backward).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    lpay = [c for c in left.columns if c not in keys and c != left_ts]
    rpay = [c for c in right.columns if c not in keys and c != right_ts]
    clash = set(lpay) & set(rpay)
    if clash:
        raise ValueError(f"overlapping payload columns: {sorted(clash)}")

    ts = "__asof_ts"
    tag = "__asof_is_left"
    lhs = left.select(
        *keys,
        F.col(left_ts).alias(ts),
        F.lit(1).alias(tag),
        *[F.col(c) for c in lpay],
        *[F.lit(None).alias(c) for c in rpay],
    )
    rhs = right.select(
        *keys,
        F.col(right_ts).alias(ts),
        F.lit(0).alias(tag),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
        *[F.col(c) for c in rpay],
    )
    both = lhs.unionByName(rhs)

    order = [F.col(ts).asc(), F.col(tag).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc_nulls_first())
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picked = {c: F.last(F.col(c), ignorenulls=True).over(w) for c in rpay}
    else:
        order = [F.col(ts).desc(), F.col(tag).asc()]
        if tiebreak:
            order.append(F.col(tiebreak).desc_nulls_first())
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picked = {c: F.last(F.col(c), ignorenulls=True).over(w) for c in rpay}

    out = both.select(
        *keys,
        F.col(ts),
        F.col(tag),
        *[F.col(c) for c in lpay],
        *[picked[c].alias(c) for c in rpay],
    )
    out = out.filter(F.col(tag) == 1).drop(tag)
    out = out.withColumnRenamed(ts, left_ts)
    if how == "inner":
        cond = F.lit(False)
        for c in rpay:
            cond = cond | F.col(c).isNotNull()
        out = out.filter(cond)
    return out
