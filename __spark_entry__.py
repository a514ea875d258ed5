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
# newest driver row may be older than 2 rounds (i.e. every entry runs
# at least once per 3-round cycle).
#
# SLOT-BUDGET POLICY (standing, per VERDICT r5 #3).  The window is 50
# slots; the flagship takes one every round, so sustained capacity is
# 49 x 3 rounds = 147 entries at max staleness 2.  Past 147 effective
# demand, an addition must retire or consolidate an existing entry.
# Window composition each round, in order: (a) flagship sanity row;
# (b) entries with NO driver row ever; (c) entries NEW this round;
# (d) every entry whose newest row is 2 rounds old (MUST run —
# invariant); (e) fill with the 1-round-old cohort, semantics-heavy
# first, so the next round's mandatory cohort (d) shrinks below 49.
#
# PAIR/FAMILY LEDGER (consolidation, per VERDICT r5 #3 / r9 #2).  A
# pair (or family) shares one window slot per 3-round cycle: the
# invariant is satisfied when ANY member's newest run is within the
# cycle; the family's slot rotates round-robin through its members so
# every member is still periodically re-verified.  Roster after r10's
# consolidation (VERDICT r9 #2 named i-iii; iv added because it is
# the same UNION surface and r11's arithmetic needs it):
#   P1 x_dedup_exact_rows ........ x_dedup_exact
#   P2 x_dedup_incremental ....... x_dedup_incremental_exact
#   P3 x_semantic_kmeans ......... x_semantic_dedup
#   P4 x_dedup_minhash_lsh ....... x_dedup_minhash_oracle
#   P5 x_dedup_embedding_lsh ..... x_dedup_embedding_oracle
#   P6 q_tablesample ............. q_sample_deterministic
#   F7 q_grouping_sets / q_rollup / q_cube          (r10 new — one
#      GROUPING SETS surface; rollup/cube are its specializations)
#   F8 q_union_all / q_distinct / q_union_distinct  (r10 new — one
#      UNION/DISTINCT surface; union_all∘distinct ≡ union_distinct)
#   P9 x_dedup_simhash_pairs ..... x_dedup_simhash  (r10 new — same
#      fingerprint family; the pairs entry is the stronger gate.
#      Newest member run: simhash_pairs r9 — NOT r10; the pair is due
#      again r12, and x_dedup_simhash skips r11 on the r9 credit)
#   F10 q_scan_external_files / q_scan_external_csv /
#      q_scan_external_orc  (r10 new, the candidate VERDICT r9 named
#      — one external-scan query over 3 file formats.  Newest member
#      run: q_scan_external_files r9 → family due r12; csv/orc drop
#      from r11's mandatory cohort on that credit.  Rotation: the r12
#      turn runs csv, r15 orc, r18 files.)
# Effective demand = 157 registered − (6 pairs·1 + 2 families·2 + 1
# pair·1 + 1 family·2) = 144 vs 147 capacity → 3 slots of headroom
# (the 2 slots F10 frees fund 2 of the 3 r10-registered entries:
# x_quality_classifier / x_dsir_select / x_dedup_paragraph).
# Named r12 consolidation candidate if more is needed: the multimodal
# codec family (x_multimodal_codec_gif/mjpeg/jpeg — one decode seam,
# 3 containers; pull it INTO r11 if r11 must register anything new,
# since r11's window is exactly full at 50).
#
# r11 ledger (planned in the r10 header, endorsed by VERDICT r10 #1;
# the arithmetic was re-derived from the CORRECTNESS_r* history this
# round and matches exactly): mandatory = the 49-entry r8-era cohort
# MINUS the two (e) fills run r10 (s_stream_session_windows,
# s_stream_stateful_user_totals) MINUS x_dedup_simhash (P9 credit:
# pairs twin ran r9, within cycle at r11) MINUS q_union_distinct (F8
# credit: q_union_all ran r9) MINUS q_scan_external_csv and
# q_scan_external_orc (F10 credit: q_scan_external_files ran r9)
# = 43, PLUS q_tablesample (P6 turn: sample_deterministic ran r9),
# PLUS x_image_near_dup, x_crawl_chain, x_quality_classifier,
# x_dsir_select and x_dedup_paragraph (category b — all registered
# r10, no driver row yet), PLUS flagship = 43 + 7 = 50 → EXACTLY
# full; no r11 registration (VERDICT r10 #3's composed pre-training
# chain EXTENDS the existing x_crawl_chain entry in place rather
# than registering a sibling, so no slot is consumed and the codec
# consolidation stays a named r12 option).
# P2/P3/P5 pair-turns land r11 via their r8 members
# (x_dedup_incremental, x_semantic_kmeans, x_dedup_embedding_oracle —
# all inside the cohort below, no extra slots).  P1/P4's cohort
# members (x_dedup_exact, x_dedup_minhash_oracle, newest own row r7)
# next take their pairs' turns r13 — within the 6-round per-member
# cadence pair alternation implies.
#
# R12 PLAN (sketch; finalize in the r12 header): the r9-era cohort is
# 49 entries, + flagship = 50 exactly full BEFORE credits.  Credits
# due r12 free slots: F7 (grouping_sets/rollup/cube all ran r9 — run
# ONE member r12, round-robin pick q_rollup; frees 2), F8 turn (run
# q_distinct, credit q_union_all; q_union_distinct's own turn r15),
# F10 turn (run q_scan_external_csv per the ledger rotation, credit
# files/orc — csv+orc are r8-era so this ADDS one slot vs the r9
# cohort), P9 turn due r12 (x_dedup_simhash_pairs ran r9 — run
# pairs again or rotate to x_dedup_simhash; 1 slot), P6 (sample_
# deterministic ran r9 → family due r12, rotate to q_tablesample?
# — no: q_tablesample runs r11 below, so P6's newest run will be
# r11 and the family skips r12).  Net: ~48-50; if tight, pull the
# named codec-family consolidation (x_multimodal_codec_gif/mjpeg/
# jpeg → one decode-seam family; jpeg newest r9, gif/mjpeg r10).
#
# R11 CARRY-OVER (r10 warehouse_dml review, deferred finding #10):
# CREATE OR REPLACE TABLE crash-atomicity — CLOSED r11: the staged
# replacement adopts as the NEXT generation of the same table root
# and schema+pointer swap in one atomic catalog write
# (catalog.replace_table); kill-between-stages pytests in
# tests/test_dml_atomic.py prove the old table survives every stage.
_PRIORITY = [
    "q01_pricing_summary",  # (a) flagship stays first (sanity row)
    # --- (b) registered r10, no driver row ever ---
    "x_image_near_dup",
    "x_crawl_chain",  # extended r11: full pre-training admission chain
    "x_quality_classifier",
    "x_dsir_select",
    "x_dedup_paragraph",
    # --- P6 pair-turn (q_sample_deterministic ran r9) ---
    "q_tablesample",
    # --- (d) staleness cohort (newest row r8) — 43 entries; includes
    # the P2/P3/P5 pair-turns (incremental, kmeans, embedding_oracle)
    "q02_filter_predicates",
    "q_agg_basic",
    "q_agg_filter",
    "q_agg_stats",
    "q_approx_quantile",
    "q_count_distinct",
    "q_cte",
    "q_dml_ctas_roundtrip",
    "q_dml_timetravel_roundtrip",
    "q_except",
    "q_exists_correlated",
    "q_in_subquery",
    "q_intersect",
    "q_join_anti",
    "q_join_full_outer",
    "q_join_left",
    "q_join_right",
    "q_join_semi",
    "q_join_theta",
    "q_lateral_join",
    "q_nested_flatten_multitable",
    "q_percentile_exact",
    "q_scalar_subquery",
    "q_time_bucket_15min",
    "q_window_first_last",
    "q_window_frame_range",
    "q_window_frame_rows",
    "q_window_lag_lead",
    "q_window_ntile",
    "q_window_rank",
    "q_word_count",
    "s_stream_dedup",
    "s_stream_sliding_2h_1h",
    "x_ann_cosine_lsh",
    "x_ann_ivf_topk",
    "x_audio_features",
    "x_dedup_embedding_oracle",  # P5 pair-turn (lsh twin rode r10 credit)
    "x_dedup_incremental",  # P2 pair-turn
    "x_multimodal_codec_mp4",
    "x_multimodal_codec_real",
    "x_multimodal_codec_webm",
    "x_range_join_bucketed",
    "x_semantic_kmeans",  # P3 pair-turn
    # --- past the ~50 edge: r11 credit skippers, newest-first ---
    "x_dedup_simhash",  # P9 credit (simhash_pairs ran r9)
    "q_union_distinct",  # F8 credit (q_union_all ran r9)
    "q_scan_external_csv",  # F10 credit (files twin ran r9)
    "q_scan_external_orc",  # F10 credit
    "x_dedup_exact",  # P1 credit (exact_rows ran r10)
    "x_dedup_minhash_oracle",  # P4 credit (minhash_lsh ran r10)
    "x_dedup_incremental_exact",  # P2 credit (incremental runs r11)
    "x_semantic_dedup",  # P3 credit (kmeans runs r11)
    "x_dedup_embedding_lsh",  # P5 credit (oracle twin runs r11)
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
