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
# ~50.  Round 4 rotation, slot-budgeted: (a) the flagship sanity row,
# (b) every never-driver-checked entry — the dialect layer and
# corpus operators grown this round MUST get their first rows,
# (c) the six s_* streaming entries (explicit VERDICT-r3 ask:
# multi-batch driver evidence), (d) as much of the r2-banked
# hash-oracle tail as fits — operators whose modules were touched in
# rounds 3-4 first.  The simplest untouched passthrough shapes
# (filters, plain aggs, word count, lateral) and the rows-only
# re-checks sit past the window edge: they are pytest-exercised
# every session, their code is unchanged since their r2 hash-green
# row, and a one-round-staler row there costs less than a
# never-checked entry shipping without any driver evidence.
_PRIORITY = [
    "q01_pricing_summary",  # flagship stays first (sanity row)
    # --- never driver-checked (new in round 4) ---
    "q_dialect_qualify",
    "q_dialect_file_scan",
    "q_dialect_asof",
    "q_dialect_distinct_on",
    "q_dialect_unnest_tokens",
    "q_dialect_struct_literals",
    "q_dialect_generate_series",
    "q_dialect_subscripts",
    "q_dialect_star_replace",
    "q_dialect_agg_order_by",
    "q_dialect_pivot_stmt",
    "q_dialect_list_comprehension",
    "q_dialect_union_by_name",
    "x_quality_repetition",
    "x_pii_scrub",
    "x_dedup_clusters",
    "x_dedup_survivors",
    "x_decontaminate",
    "x_global_shuffle",
    "x_model_score",
    "x_cap_per_source",
    "x_resample_temperature",
    "x_chunk_documents",
    # streaming: multi-batch driver evidence for the s_* surface
    "s_stream_sliding_2h_1h",
    "s_stream_session_windows",
    "s_stream_stateful_user_totals",
    "s_stream_dedup",
    "s_stream_stream_join",
    "s_rollup_continuous_hourly",
    # --- r2-banked hash-oracle tail, touched-code first ---
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q_agg_lists_median_mode",
    "q_scan_external_files",
    "q_nested_flatten_horizontal",
    "q_nested_flatten_vertical",
    "x_dedup_exact",
    "x_dedup_ngram_jaccard",
    "x_dedup_embedding_cosine",
    "x_ann_cosine_topk",
    "x_text_token_count",
    "x_text_quality",
    "x_text_langid",
    "x_text_fingerprint",
    "x_multimodal_meta",
    "x_multimodal_resize",
    "x_multimodal_frames",
    "x_pipeline_clean_corpus",
    # --- past the ~50 edge: unchanged passthrough shapes (r2 green,
    # pytest-exercised) then the rows-only re-checks ---
    "x_salted_join_skew",
    "x_range_join_bucketed",
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
    "x_dedup_exact_rows",
    "x_dedup_incremental",
    "x_dedup_minhash_lsh",
    "x_dedup_simhash",
    "x_dedup_embedding_lsh",
    "x_ann_cosine_lsh",
    "x_ann_ivf_topk",
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
