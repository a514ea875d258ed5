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
# newest driver row may be older than 2 rounds.
#
# SLOT-BUDGET POLICY (standing, per VERDICT r5 #3).  The window is 50
# slots; the flagship takes one every round, so sustained capacity is
# 49 x 3 rounds = 147 entries at max staleness 2.  The registry holds
# 138 (131 + seven r6 newcomers) — headroom is 9 entries, so NET
# ADDITIONS ARE CAPPED AT ~4/ROUND; past 147 an addition must retire
# or consolidate an existing entry (the paired rows-only/oracle
# variants — e.g. x_dedup_exact_rows vs x_dedup_incremental_exact —
# are first in line to share a slot on alternate rounds).  Window
# composition each round, in order: (a) flagship sanity row;
# (b) entries with NO driver row ever; (c) entries NEW this round;
# (d) every entry whose newest row is 2 rounds old (MUST run —
# invariant); (e) fill with the 1-round-old cohort, semantics-heavy
# first (streaming, nested flatten, joins/windows/subqueries), so the
# next round's mandatory cohort (d) shrinks below 49.
#
# r6 ledger: (b) = 4 never-checked r5 late newcomers
# (x_dedup_simhash_pairs, q_dml_copy_roundtrip,
# q_dml_compact_roundtrip, x_lm_perplexity — all judge-green in r5);
# (c) = 2 in-window (x_semantic_incremental, x_multimodal_codec_jpeg)
# + 5 past-edge late additions (x_multimodal_codec_gif,
# x_dedup_substring, x_source_overlap, x_split_leakage_safe,
# x_ann_pq_topk — never driver-checked, MUST front the r7 window;
# registry = 138 total, four over the soft +4/round cap — r7 repays
# by alternating the paired rows-only/oracle slots:
# x_dedup_exact_rows with x_dedup_exact, x_dedup_incremental with
# x_dedup_incremental_exact, x_semantic_kmeans with x_semantic_dedup
# — each pair shares one window slot on alternate rounds, freeing 3
# slots/round; at 138 entries the 3-round window capacity is 147+3
# shared = 150, so the staleness-2 invariant still holds through r8
# only if r7 adds <=4 net);
# (d) = the 28 r3-newest entries (the function-sheet shapes +
# x_pack_sequences, x_sample_stratified, x_split_train_val,
# x_multimodal_features, q_nested_flatten_multitable_depth2);
# (e) = 15 of the 49 r4-newest (streaming x6, nested flatten x2,
# external files scan, q03/q05/q06, embedding-cosine, ngram-jaccard,
# model-score), leaving 34 r4-era + the 5 never-checked late
# newcomers (gif/substring/source_overlap/leakage_safe/pq) as r7's
# mandatory cohort (fits: 39 + 1 flagship + <=2 new + 8 r5-era
# starts = 50, with the 3 alternate-round shared slots as slack).
_PRIORITY = [
    "q01_pricing_summary",  # (a) flagship stays first (sanity row)
    # --- (b) never driver-checked ---
    "x_dedup_simhash_pairs",
    "q_dml_copy_roundtrip",
    "q_dml_compact_roundtrip",
    "x_lm_perplexity",
    # --- (c) new this round ---
    "x_semantic_incremental",  # corpus-vs-new SemDeDup, fixed centroids
    "x_multimodal_codec_jpeg",  # baseline JPEG decode under the hash gate
    # --- (d) staleness-2 cohort (newest row r3) — 28 entries, all ---
    "q_array_funcs",
    "q_case_cast",
    "q_cube",
    "q_date_funcs",
    "q_dialect_duckdb_text",
    "q_distinct",
    "q_explode_posexplode",
    "q_grouping_sets",
    "q_join_cross",
    "q_json_funcs",
    "q_map_struct_funcs",
    "q_math_funcs",
    "q_nested_flatten_multitable_depth2",
    "q_order_limit_offset",
    "q_pivot",
    "q_qualify_latest",
    "q_rollup",
    "q_sample_deterministic",
    "q_string_funcs",
    "q_tablesample",
    "q_topk_per_group",
    "q_union_all",
    "q_unpivot",
    "q_approx_count_distinct",
    "x_multimodal_features",
    "x_pack_sequences",
    "x_sample_stratified",
    "x_split_train_val",
    # --- (e) r4-era fill, semantics-heavy first — 15 slots ---
    "s_rollup_continuous_hourly",
    "s_stream_dedup",
    "s_stream_session_windows",
    "s_stream_sliding_2h_1h",
    "s_stream_stateful_user_totals",
    "s_stream_stream_join",
    "q_nested_flatten_horizontal",
    "q_nested_flatten_vertical",
    "q_scan_external_files",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "x_dedup_embedding_cosine",
    "x_dedup_ngram_jaccard",
    "x_model_score",
    # --- past the ~50 edge: r7's mandatory cohort — the never-checked
    # late newcomers first, then the remaining 34 r4-era entries
    # (dialect sheet x13, q_agg_lists_median_mode, pipeline/text/
    # multimodal x_ ops) — listed so a driver that reads deeper than
    # 50 still refreshes the stalest first ---
    "x_multimodal_codec_gif",
    "x_dedup_substring",
    "x_source_overlap",
    "x_split_leakage_safe",
    "x_ann_pq_topk",
    "q_dialect_qualify",
    "q_dialect_file_scan",
    "q_dialect_asof",
    "q_dialect_pivot_stmt",
    "q_dialect_distinct_on",
    "q_dialect_agg_order_by",
    "q_dialect_generate_series",
    "q_dialect_list_comprehension",
    "q_dialect_star_replace",
    "q_dialect_struct_literals",
    "q_dialect_subscripts",
    "q_dialect_union_by_name",
    "q_dialect_unnest_tokens",
    "q_agg_lists_median_mode",
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
