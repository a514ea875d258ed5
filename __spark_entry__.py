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
# r7 ledger: (b) = 5 never-checked r6 late additions
# (x_multimodal_codec_gif, x_dedup_substring, x_source_overlap,
# x_split_leakage_safe, x_ann_pq_topk — all judge-green in the r6
# session, need driver rows); (c) = 4 new this round, exactly the
# cap (s_semantic_stream, x_recipe_clean, x_multimodal_codec_mjpeg,
# x_dedup_minhash_oracle — registry 138 → 142); (d) = the full
# 34-entry r4-era mandatory cohort (dialect sheet ×14,
# q_agg_lists_median_mode, pipeline/text/multimodal x_ ops,
# x_ann_cosine_topk, x_dedup_exact); (e) = 6 r5-era fill activating
# the PAIRED-SLOT SHARES: x_dedup_incremental_exact (pairs
# x_dedup_incremental → r8) and x_semantic_dedup (pairs
# x_semantic_kmeans → r8) run now so each pair alternates;
# x_dedup_minhash_oracle (new) pairs x_dedup_minhash_lsh the same
# way, and x_dedup_exact (r4, in (d)) pairs x_dedup_exact_rows;
# plus s_stream_tumbling_hour (only r5 streaming entry), q_join_asof
# and x_dedup_embedding_lsh (the two r6-bench-flagged shapes).
# Total: 1 + 5 + 4 + 34 + 6 = 50 exactly.  r8's mandatory cohort is
# then the 43 unfilled r5-era entries minus the 3 pair-credits = 40,
# leaving ~9 free slots — the invariant holds through r9 if r8 adds
# ≤4 net.  At 142 entries + 4 shared pair-slots the 3-round capacity
# is 147+4 = 151; additions past that must retire or consolidate.
_PRIORITY = [
    "q01_pricing_summary",  # (a) flagship stays first (sanity row)
    # --- (b) never driver-checked (r6 late additions) ---
    "x_multimodal_codec_gif",
    "x_dedup_substring",
    "x_source_overlap",
    "x_split_leakage_safe",
    "x_ann_pq_topk",
    # --- (c) new this round (≤4 cap, exactly met) ---
    "s_semantic_stream",  # streaming SemDeDup under the hash gate
    "x_recipe_clean",  # declarative recipe runner round trip
    "x_multimodal_codec_mjpeg",  # MJPEG/AVI video container
    "x_dedup_minhash_oracle",  # portable-hash minhash oracle twin
    # --- (d) staleness-2 cohort (newest row r4) — 34 entries, all ---
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
    "x_ann_cosine_topk",
    "x_cap_per_source",
    "x_chunk_documents",
    "x_decontaminate",
    "x_dedup_clusters",
    "x_dedup_exact",
    "x_dedup_survivors",
    "x_global_shuffle",
    "x_multimodal_frames",
    "x_multimodal_meta",
    "x_multimodal_resize",
    "x_pii_scrub",
    "x_pipeline_clean_corpus",
    "x_quality_repetition",
    "x_resample_temperature",
    "x_salted_join_skew",
    "x_text_fingerprint",
    "x_text_langid",
    "x_text_quality",
    "x_text_token_count",
    # --- (e) r5-era fill — 6 slots: pair-share activations first ---
    "x_dedup_incremental_exact",  # pair: x_dedup_incremental → r8
    "x_semantic_dedup",  # pair: x_semantic_kmeans → r8
    "s_stream_tumbling_hour",
    "q_join_asof",
    "x_dedup_embedding_lsh",  # r6 bench-flagged: fresh row post-tuning
    "q_dml_merge_roundtrip",
    # --- past the ~50 edge: r8's mandatory cohort (the remaining
    # r5-era entries, semantics-heavy first), so a driver that reads
    # deeper than 50 still refreshes the stalest first ---
    "q02_filter_predicates",
    "q_cte",
    "q_scalar_subquery",
    "q_in_subquery",
    "q_exists_correlated",
    "q_lateral_join",
    "q_join_left",
    "q_join_right",
    "q_join_full_outer",
    "q_join_semi",
    "q_join_anti",
    "q_join_theta",
    "q_window_rank",
    "q_window_lag_lead",
    "q_window_ntile",
    "q_window_first_last",
    "q_window_frame_rows",
    "q_window_frame_range",
    "q_union_distinct",
    "q_intersect",
    "q_except",
    "q_agg_basic",
    "q_agg_filter",
    "q_agg_stats",
    "q_count_distinct",
    "q_approx_quantile",
    "q_percentile_exact",
    "q_time_bucket_15min",
    "q_word_count",
    "q_nested_flatten_multitable",
    "q_scan_external_csv",
    "q_scan_external_orc",
    "q_dml_ctas_roundtrip",
    "q_dml_timetravel_roundtrip",
    "x_dedup_minhash_lsh",
    "x_dedup_simhash",
    "x_dedup_incremental",
    "x_dedup_exact_rows",
    "x_ann_cosine_lsh",
    "x_ann_ivf_topk",
    "x_range_join_bucketed",
    "x_semantic_kmeans",
    "x_multimodal_codec_real",
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
