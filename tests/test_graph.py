"""connected_components / dedup_by_pairs (operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scratchdata_spark.operators.graph import connected_components, dedup_by_pairs


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    rows = connected_components(df).collect()
    return {r.id: r.comp for r in rows}


def test_clique_and_chain_and_isolated_pair(spark):
    # clique {1,2,3}, chain 10-11-12-13, pair {20,21}
    got = _cc(
        spark,
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13), (20, 21)],
    )
    assert got == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
    }


def test_reversed_and_duplicate_edges(spark):
    got = _cc(spark, [(5, 4), (4, 5), (5, 4), (6, 5)])
    assert got == {4: 4, 5: 4, 6: 4}


def test_long_chain_converges_via_pointer_jumping(spark):
    # 64-vertex path: plain propagation needs 63 rounds; with the
    # pointer jump it must finish within the default max_iter=25.
    got = _cc(spark, [(i, i + 1) for i in range(100, 163)])
    assert set(got.values()) == {100}
    assert len(got) == 64


def test_self_loops_ignored(spark):
    df = spark.createDataFrame([(7, 7), (7, 8)], "id_a long, id_b long")
    rows = connected_components(df).collect()
    assert {r.id: r.comp for r in rows} == {7: 7, 8: 7}


def test_max_iter_backstop_raises(spark):
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)


def test_dedup_by_pairs_keeps_cluster_minimum(spark):
    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(8)], "doc_id long, body string"
    )
    # clusters {0,1,2} and {5,6}; 3,4,7 untouched
    pairs = spark.createDataFrame(
        [(1, 0), (1, 2), (5, 6)], "id_a long, id_b long"
    )
    kept = sorted(
        r.doc_id for r in dedup_by_pairs(docs, pairs, "doc_id").collect()
    )
    assert kept == [0, 3, 4, 5, 7]


def test_dedup_by_pairs_empty_pairs_is_identity(spark):
    docs = spark.createDataFrame(
        [(i, "x") for i in range(5)], "doc_id long, body string"
    )
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup_by_pairs(docs, pairs, "doc_id").count() == 5


def test_component_labels_are_member_minimum_property(spark):
    # random-ish deterministic graph: edges (i, (i*7) % 50) for i<50
    edges = [(i, (i * 7) % 50) for i in range(50) if i != (i * 7) % 50]
    got = _cc(spark, edges)
    # brute-force union-find oracle
    parent = {v: v for e in edges for v in e}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in parent}
    assert got == want


def test_dedup_by_pairs_best_elects_highest_score(spark):
    from scratchdata_spark.operators.graph import dedup_by_pairs_best

    df = spark.createDataFrame(
        [
            (1, "mangled copy", 0.2),
            (2, "clean original", 0.9),
            (3, "another mangled", 0.4),
            (7, "unpaired survives", 0.1),
            (8, "tie a", 0.5),
            (9, "tie b", 0.5),
            (10, "null scored", None),
            (11, "real scored", 0.3),
        ],
        "doc_id long, text string, q double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (8, 9), (10, 11)], "id_a long, id_b long"
    )
    kept = {
        r["doc_id"]
        for r in dedup_by_pairs_best(df, pairs, "doc_id", "q").collect()
    }
    # cluster {1,2,3}: highest score wins (2, not min-id 1);
    # tie {8,9}: smaller id; {10,11}: NULL loses to a real score
    assert kept == {2, 7, 8, 11}


def test_dedup_by_pairs_best_matches_min_id_when_scores_equal(spark):
    from scratchdata_spark.operators.graph import (
        dedup_by_pairs,
        dedup_by_pairs_best,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(10)], "doc_id long, text string"
    ).withColumn("q", F.lit(1.0))
    pairs = spark.createDataFrame(
        [(0, 5), (5, 6), (2, 9)], "id_a long, id_b long"
    )
    a = {r["doc_id"] for r in dedup_by_pairs(df, pairs, "doc_id").collect()}
    b = {
        r["doc_id"]
        for r in dedup_by_pairs_best(df, pairs, "doc_id", "q").collect()
    }
    assert a == b  # constant scores degrade to the min-id rule


def test_near_dedup_recipe_best_survivor(spark):
    from pyspark.sql import functions as F

    from scratchdata_spark.operators.recipe import run_recipe

    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [
            (1, base + " extra", 0.1),
            (2, base + " other", 0.9),  # same cluster, better quality
            (5, "totally different text about gardens and weather", 0.5),
        ],
        "doc_id long, text string, q double",
    )
    out, _ = run_recipe(
        df,
        [{"op": "near_dedup", "threshold": 0.5, "survivor": "best",
          "score_col": "q"}],
    )
    assert {r["doc_id"] for r in out.collect()} == {2, 5}


def test_dedup_by_pairs_best_string_ids_and_nan_scores(spark):
    """r10 second review catches: a negated-id tiebreak silently
    no-ops for string ids (NULL != comparisons), and NaN scores order
    LARGEST in Spark so a max-election would let a corrupted 0/0
    score beat a clean 0.9 — the min-struct election handles both."""
    from scratchdata_spark.operators.graph import dedup_by_pairs_best

    df = spark.createDataFrame(
        [
            ("doc-a", 0.2),
            ("doc-b", 0.9),
            ("doc-c", float("nan")),  # NaN must never win
            ("doc-z", 0.5),
        ],
        "doc_id string, q double",
    )
    pairs = spark.createDataFrame(
        [("doc-a", "doc-b"), ("doc-b", "doc-c")], "id_a string, id_b string"
    )
    kept = {
        r["doc_id"]
        for r in dedup_by_pairs_best(df, pairs, "doc_id", "q").collect()
    }
    assert kept == {"doc-b", "doc-z"}


def test_dedup_by_pairs_best_all_nan_cluster_falls_to_min_id(spark):
    from scratchdata_spark.operators.graph import dedup_by_pairs_best

    df = spark.createDataFrame(
        [(3, float("nan")), (1, float("nan")), (2, None)],
        "doc_id long, q double",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    kept = {
        r["doc_id"]
        for r in dedup_by_pairs_best(df, pairs, "doc_id", "q").collect()
    }
    assert len(kept) == 1  # exactly one survivor, deterministically


def test_near_dedup_survivor_validation(spark):
    import pytest as _pytest

    from scratchdata_spark.operators.recipe import run_recipe

    df = spark.createDataFrame([(1, "t", 0.5)], "doc_id long, text string, q double")
    with _pytest.raises(ValueError, match="score_col"):
        run_recipe(df, [{"op": "near_dedup", "survivor": "best"}])
    with _pytest.raises(ValueError, match="unknown survivor"):
        run_recipe(
            df, [{"op": "near_dedup", "survivor": "highest", "score_col": "q"}]
        )
