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
#   F11 x_multimodal_codec_jpeg / _gif / _mjpeg  (r12 new — the
#      candidate VERDICT r10/r11 named: one decode seam, 3 container
#      formats; mp4/webm/real stay independent (probe-vs-full-decode
#      families).  Newest member runs: gif/mjpeg r10, jpeg r9 →
#      jpeg skips r12 on the r10 credit; family due r13 (rotation:
#      r13 jpeg, r16 gif, r19 mjpeg).  Frees the slot that funds the
#      s_crawl_stream registration, per VERDICT r11 #2/#8.)
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
# R12 LEDGER (executes the R11 sketch + VERDICT r11 #1/#2/#8): the
# r9-era cohort is 49 entries + flagship = 50 full BEFORE credits.
# Credits applied, each freeing its slot from the mandatory cohort:
#   F7 turn: run q_rollup, skip q_grouping_sets + q_cube  (−2)
#   F8 turn: run q_distinct, skip q_union_all              (−1)
#   F10 turn: run q_scan_external_csv (r8), skip q_scan_
#     external_files (r9 member)                      (−1 +1 = 0)
#   P9 turn: run x_dedup_simhash (r8), skip x_dedup_simhash_
#     pairs (r9 member)                               (−1 +1 = 0)
#   P6 credit: skip q_sample_deterministic (q_tablesample ran
#     r11 → family within cycle)                           (−1)
#   F11 (NEW, consolidating the codec family per VERDICT r10/r11's
#     named candidate): skip x_multimodal_codec_jpeg on the
#     gif/mjpeg r10 credit                                 (−1)
# → 42 cohort + 2 rotated members + flagship = 45, five slots free:
#   +s_crawl_stream (NEW r12 — the streamed admission chain VERDICT
#     r11 #2 prescribed; F11's freed slot funds the registration)
#   +x_dedup_incremental_exact, x_semantic_dedup,
#    x_dedup_embedding_lsh, x_dedup_exact — four of the five
#    r7-stale entries pulled forward (VERDICT r11 #1's slack rule;
#    their 6-round member cadence hits r13, whose r10-era cohort is
#    already full).  The fifth, x_dedup_minhash_oracle, takes P4's
#    r13 pair-turn (swap with x_dedup_minhash_lsh, net 0), and
#    x_dedup_exact running NOW gives P1 an r12 credit so x_dedup_
#    exact_rows skips r13 — r13 arithmetic closes at ≤50.
# Window = 45 + 5 = EXACTLY 50.  Effective demand after F11 =
# 158 registered − (6 pairs·1 + 3 families·2 + 1 pair·1 + 1
# family·2) = 143 vs 147 capacity.
#
# R13 LEDGER (executes the r12 sketch, one substitution): mandatory =
# the r10-era cohort (49, re-derived from the CORRECTNESS_r* history)
# + flagship = 50 full BEFORE credits.  Credits, each a cohort
# member: F11 turn (run x_multimodal_codec_jpeg per the rotation;
# gif+mjpeg — both r10, in the cohort — skip on the family slot:
# net −1), P1 credit (x_dedup_exact ran r12 → skip x_dedup_exact_
# rows: −1), P4 turn (run x_dedup_minhash_oracle — the last r7-era
# entry — INSTEAD of cohort member x_dedup_minhash_lsh: net 0)
# → 45 cohort runs + jpeg + minhash_oracle + flagship = 48.  The 2
# free slots: q_dialect_columns (NEW r13 — the COLUMNS() macro
# expansion VERDICT r12 #4 prescribed; category (b) outranks slack
# fills) and q_union_distinct (r8, F8's r15 member turn pulled
# forward).  The sketch's second pull-forward, q_scan_external_orc
# (r8), is DISPLACED to r14 by the new registration — r14's
# P2/P3/P5 credits (incremental_exact / semantic_dedup /
# embedding_lsh all ran r12) free three slots there.  Net: 50
# EXACTLY.  Effective demand after the registration: 159 − 15
# consolidated = 144 vs 147 capacity.
#
# R14 PLAN (sketch; finalize in the r14 header): mandatory = the
# r11-era cohort (49) + flagship = 50 BEFORE credits.  Credits:
# P2 (skip x_dedup_incremental), P3 (skip x_semantic_kmeans), P5
# (skip x_dedup_embedding_oracle) → −3; P6 family turn due (newest
# member row r11): run q_sample_deterministic (r9 member) instead of
# q_tablesample (net 0).  Freed 3 slots → q_scan_external_orc
# (displaced from r13), s_crawl_stream (r12 — rejoins ahead of its
# r15 deadline), + 1 semantics-heavy (e) fill from the r12 cohort.
#
# R11 CARRY-OVER (r10 warehouse_dml review, deferred finding #10):
# CREATE OR REPLACE TABLE crash-atomicity — CLOSED r11: the staged
# replacement adopts as the NEXT generation of the same table root
# and schema+pointer swap in one atomic catalog write
# (catalog.replace_table); kill-between-stages pytests in
# tests/test_dml_atomic.py prove the old table survives every stage.
_PRIORITY = [
    "q01_pricing_summary",  # (a) flagship stays first (sanity row)
    # --- (b) NEW r13: COLUMNS() macro expansion (VERDICT r12 #4) ---
    "q_dialect_columns",
    # --- family/pair turns due r13 (members rotated in) ---
    "x_multimodal_codec_jpeg",  # F11 turn (credits gif, mjpeg)
    "x_dedup_minhash_oracle",  # P4 turn (credits minhash_lsh)
    # --- r8-era member pulled forward (F8's r15 turn, run early) ---
    "q_union_distinct",
    # --- (d) staleness cohort (newest row r10) minus the credit
    # skippers gif/mjpeg/exact_rows/minhash_lsh — 45 entries ---
    "q_agg_lists_median_mode",
    "q_dialect_agg_order_by",
    "q_dialect_asof",
    "q_dialect_distinct_on",
    "q_dialect_file_scan",
    "q_dialect_generate_series",
    "q_dialect_list_comprehension",
    "q_dialect_pivot_stmt",
    "q_dialect_qualify",
    "q_dialect_star_replace",
    "q_dialect_struct_literals",
    "q_dialect_subscripts",
    "q_dialect_union_by_name",
    "q_dialect_unnest_tokens",
    "q_dml_merge_roundtrip",
    "q_join_asof",
    "s_semantic_stream",
    "s_stream_session_windows",
    "s_stream_stateful_user_totals",
    "s_stream_tumbling_hour",
    "x_ann_cosine_topk",
    "x_ann_pq_topk",
    "x_cap_per_source",
    "x_chunk_documents",
    "x_decontaminate",
    "x_dedup_clusters",
    "x_dedup_substring",
    "x_dedup_survivors",
    "x_global_shuffle",
    "x_multimodal_frames",
    "x_multimodal_meta",
    "x_multimodal_resize",
    "x_pii_scrub",
    "x_pipeline_clean_corpus",
    "x_quality_repetition",
    "x_recipe_clean",
    "x_remove_boilerplate",
    "x_resample_temperature",
    "x_salted_join_skew",
    "x_source_overlap",
    "x_split_leakage_safe",
    "x_text_fingerprint",
    "x_text_langid",
    "x_text_quality",
    "x_text_token_count",
    # --- past the ~50 edge: r13 credit skippers / displaced ---
    "q_scan_external_orc",  # displaced to r14 (see R13 LEDGER note)
    "x_multimodal_codec_gif",  # F11 credit (jpeg runs r13)
    "x_multimodal_codec_mjpeg",  # F11 credit
    "x_dedup_exact_rows",  # P1 credit (x_dedup_exact ran r12)
    "x_dedup_minhash_lsh",  # P4 credit (minhash_oracle runs r13)
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
