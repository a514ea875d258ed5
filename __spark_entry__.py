"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (TPC-H Q1 shape) on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (plus the
LLM-pipeline extras), as (spark, sf_dir) -> DataFrame callables.
``oracle_sql()`` — matching DuckDB SQL for the hash-compare gate;
entries without SQL-expressible semantics are omitted (rows-only check).

The real definitions live in ``scratchdata_spark.inventory`` (and the
operator modules it imports); this file is just the contract surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import scratchdata_spark.inventory_extras  # noqa: F401  (registers extras)
import scratchdata_spark.streaming.queries  # noqa: F401  (registers streaming)
from scratchdata_spark.inventory import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = REGISTRY["q01_pricing_summary"]
    return fn(spark, "/root/testdata/sf0.001")


# The driver checks entries in dict-insertion order and stops after
# ~50.  Round 3 rotation: front-load the 41 entries whose only green
# row is from round 1 (the x_*/s_* surface is banked in
# CORRECTNESS_r02 the same way), plus the entries fixed or added this
# round and a few x_*/s_* sanity rows, so every registry entry has a
# green row no older than one round.
_PRIORITY = [
    "q01_pricing_summary",  # flagship stays first (sanity row)
    # fixed/added this round (canonicalizer-safe features; depth-2 FK
    # parity; DuckDB-dialect passthrough)
    "x_multimodal_features",
    "q_nested_flatten_multitable_depth2",
    "q_dialect_duckdb_text",
    "q_nested_flatten_multitable",
    # new corpus-preparation stage (round 3)
    "x_split_train_val",
    "x_sample_stratified",
    "x_pack_sequences",
    # round-1-only long tail: re-verify under this round's plan-cache,
    # load(), and session-tuning changes
    "q_approx_count_distinct",
    "q_grouping_sets",
    "q_rollup",
    "q_cube",
    "q_join_left",
    "q_join_right",
    "q_join_full_outer",
    "q_join_cross",
    "q_join_semi",
    "q_join_anti",
    "q_join_theta",
    "q_join_asof",
    "q_window_rank",
    "q_window_lag_lead",
    "q_window_frame_rows",
    "q_window_frame_range",
    "q_window_ntile",
    "q_topk_per_group",
    "q_qualify_latest",
    "q_order_limit_offset",
    "q_union_all",
    "q_union_distinct",
    "q_intersect",
    "q_except",
    "q_distinct",
    "q_scalar_subquery",
    "q_in_subquery",
    "q_exists_correlated",
    "q_cte",
    "q_string_funcs",
    "q_date_funcs",
    "q_math_funcs",
    "q_json_funcs",
    "q_case_cast",
    "q_pivot",
    "q_unpivot",
    "q_sample_deterministic",
    "q_tablesample",
    "q_array_funcs",
    "q_explode_posexplode",
    "q_map_struct_funcs",
    # streaming sanity row (fresh multi-batch evidence; the rest of the
    # s_* surface is banked in CORRECTNESS_r02 and pytest-covered)
    "s_stream_tumbling_hour",
]


def _ordered() -> list[str]:
    pri = [n for n in _PRIORITY if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in set(pri)]
    return pri + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name][0] for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name][1] for name in _ordered() if REGISTRY[name][1] is not None
    }
