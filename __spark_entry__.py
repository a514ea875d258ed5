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
# ~50.  Round 4 rotation: front-load exactly the 49 entries WITHOUT a
# green row in CORRECTNESS_r03 — the r2-banked long tail (agg family,
# external scans, the x_*/s_* surface), q_dialect_qualify (added after
# the r3 window was fixed, never driver-checked), and the two dialect
# entries new this round — so by end of round every registry entry has
# a green row in r03∪r04.
_PRIORITY = [
    "q01_pricing_summary",  # flagship stays first (sanity row)
    # never driver-checked / new this round (dialect layer)
    "q_dialect_qualify",
    "q_dialect_file_scan",
    "q_dialect_asof",
    # r2-banked long tail: scans/aggs
    "q02_filter_predicates",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q_agg_basic",
    "q_agg_stats",
    "q_count_distinct",
    "q_approx_quantile",
    "q_percentile_exact",
    "q_agg_filter",
    "q_agg_lists_median_mode",
    "q_time_bucket_15min",
    "q_window_first_last",
    "q_lateral_join",
    "q_word_count",
    "q_scan_external_files",
    "q_scan_external_csv",
    "q_scan_external_orc",
    "q_nested_flatten_horizontal",
    "q_nested_flatten_vertical",
    # r2-banked LLM-pipeline surface
    "x_dedup_exact",
    "x_dedup_exact_rows",
    "x_dedup_ngram_jaccard",
    "x_dedup_minhash_lsh",
    "x_dedup_simhash",
    "x_dedup_embedding_cosine",
    "x_dedup_embedding_lsh",
    "x_ann_cosine_topk",
    "x_ann_cosine_lsh",
    "x_ann_ivf_topk",
    "x_text_token_count",
    "x_text_quality",
    "x_text_langid",
    "x_text_fingerprint",
    "x_multimodal_meta",
    "x_multimodal_resize",
    "x_multimodal_frames",
    "x_salted_join_skew",
    "x_pipeline_clean_corpus",
    "x_range_join_bucketed",
    # streaming: multi-batch evidence for the r2-banked s_* surface
    "s_stream_sliding_2h_1h",
    "s_stream_session_windows",
    "s_stream_stateful_user_totals",
    "s_stream_dedup",
    "s_stream_stream_join",
    "s_rollup_continuous_hourly",
    # added mid-round-4 AFTER the 50-slot window above was planned:
    # first overflow positions (the driver checks ~50 in order), so
    # they lead the r5 window; both are local-oracle PASS
    # (tools/check_correctness.py at sf0.01)
    "x_quality_repetition",
    "x_pii_scrub",
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
