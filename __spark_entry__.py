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
# ~50.  ROTATION INVARIANT (standing, per VERDICT r4 #1): no entry's
# newest driver row may be older than 2 rounds.  Slot budget each
# round: (a) flagship sanity row; (b) every entry with NO row in the
# last two rounds — this round that is the 21 r2-stale/never-checked
# entries, paid down in full; (c) entries NEW this round; (d) the
# oldest remaining rows (r3) until the window fills, semantics-heavy
# shapes first (joins, windows, subqueries, set ops, streaming).
# After r5 every entry's newest row is r3/r4/r5 → max staleness 2.
# The r3 entries that did NOT fit this window (the simple
# function-sheet shapes: q_array_funcs, q_case_cast, q_cube,
# q_date_funcs, q_dialect_duckdb_text, q_distinct,
# q_explode_posexplode, q_grouping_sets, q_join_cross, q_json_funcs,
# q_map_struct_funcs, q_math_funcs, q_order_limit_offset, q_pivot,
# q_qualify_latest, q_rollup, q_sample_deterministic, q_string_funcs,
# q_tablesample, q_topk_per_group, q_union_all, q_unpivot,
# q_approx_count_distinct, x_multimodal_features, x_split_train_val,
# plus x_pack_sequences + x_sample_stratified +
# q_nested_flatten_multitable_depth2 — pushed past the edge by the
# round-5 newcomers — and the past-edge newcomers
# x_dedup_simhash_pairs, q_dml_copy_roundtrip,
# q_dml_compact_roundtrip, x_lm_perplexity (never driver-checked);
# x_semantic/time-travel entries get r5 rows)
# reach staleness 2 at r5 and MUST front the r6 window.
_PRIORITY = [
    "q01_pricing_summary",  # flagship stays first (sanity row)
    # --- (b) never driver-checked / newest row is r2 — 21 entries ---
    "x_dedup_incremental",  # never in any window; rows-only
    "q02_filter_predicates",
    "q_agg_basic",
    "q_agg_stats",
    "q_count_distinct",
    "q_percentile_exact",
    "q_agg_filter",
    "q_time_bucket_15min",
    "q_window_first_last",
    "q_lateral_join",
    "q_word_count",
    "q_scan_external_csv",
    "q_scan_external_orc",
    "q_approx_quantile",
    "x_range_join_bucketed",
    "x_dedup_exact_rows",
    "x_dedup_minhash_lsh",
    "x_dedup_simhash",
    "x_dedup_embedding_lsh",  # re-check after the round-5 bucket cap
    "x_ann_cosine_lsh",  # re-check after the round-5 truncation cap
    "x_ann_ivf_topk",
    # --- (c) new this round ---
    "x_dedup_incremental_exact",  # sha256 oracle for the incremental path
    "q_dml_ctas_roundtrip",  # CTAS + INSERT…SELECT through query_df
    "x_multimodal_codec_real",  # PNG/WAV encode→decode under the hash gate
    "q_dml_merge_roundtrip",  # MERGE INTO through the statement path
    "x_semantic_dedup",  # SemDeDup, oracle-able fixed-seed config
    "x_semantic_kmeans",  # iterative Lloyd's: rows-only by design
    "q_dml_timetravel_roundtrip",  # table_at pre-delete snapshot hash
    # --- (d) oldest (r3) rows, semantics-heavy first — 21 slots ---
    "s_stream_tumbling_hour",
    "q_join_asof",
    "q_join_semi",
    "q_join_anti",
    "q_join_theta",
    "q_join_left",
    "q_join_right",
    "q_join_full_outer",
    "q_window_frame_rows",
    "q_window_frame_range",
    "q_window_lag_lead",
    "q_window_ntile",
    "q_window_rank",
    "q_cte",
    "q_exists_correlated",
    "q_in_subquery",
    "q_scalar_subquery",
    "q_intersect",
    "q_except",
    "q_union_distinct",
    "q_nested_flatten_multitable",
    "q_nested_flatten_multitable_depth2",
    # --- past the ~50 edge: x_pack_sequences, x_sample_stratified,
    # x_split_train_val, x_multimodal_features (r3 — they join the r6
    # front-of-window list, plus past-edge newcomers
    # x_dedup_simhash_pairs) then r4-green ---
    "x_pack_sequences",
    "x_sample_stratified",
    "x_split_train_val",
    "x_multimodal_features",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q_dialect_qualify",
    "q_dialect_file_scan",
    "q_dialect_asof",
    "x_dedup_exact",
    "x_dedup_clusters",
    "x_dedup_survivors",
    "x_text_quality",
    "x_multimodal_meta",
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
