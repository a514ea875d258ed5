"""Recipe runner (operators/recipe.py): stage composition equals the
hand-written chain, the manifest's accounting is exact, and the
config-validation / count-toggle contracts hold."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scratchdata_spark.inventory import load
from scratchdata_spark.operators.recipe import STAGES, run_recipe


def test_recipe_matches_manual_chain(spark, sf_dir):
    """exact_dedup → quality_filter → split through the runner is
    row-identical to calling the operators directly."""
    from scratchdata_spark.operators.dedup import exact_dedup
    from scratchdata_spark.operators.pipeline import train_val_split
    from scratchdata_spark.operators.text import quality_score

    d = load(spark, sf_dir)["documents"]
    got, manifest = run_recipe(
        d,
        [
            {"op": "exact_dedup"},
            {"op": "quality_filter", "min_score": 0.3},
            {"op": "split", "val_fraction_256": 13},
        ],
    )
    want = train_val_split(
        exact_dedup(d, "text", "doc_id").filter(
            quality_score(F.col("text")) >= 0.3
        )
    )
    g = {(r.doc_id, r.split) for r in got.select("doc_id", "split").collect()}
    w = {(r.doc_id, r.split) for r in want.select("doc_id", "split").collect()}
    assert g == w and len(g) > 0


def test_recipe_manifest_accounting(spark, sf_dir):
    d = load(spark, sf_dir)["documents"]
    n0 = d.count()
    got, manifest = run_recipe(
        d,
        [
            {"op": "exact_dedup"},
            {"op": "cap_per_group", "group_col": "source", "cap": 5},
            {"op": "filter", "where": "lang = 'en'"},
        ],
    )
    assert [m["op"] for m in manifest] == [
        "exact_dedup", "cap_per_group", "filter",
    ]
    assert manifest[0]["rows_in"] == n0
    for prev, nxt in zip(manifest, manifest[1:]):
        assert nxt["rows_in"] == prev["rows_out"]
    for m in manifest:
        assert m["rows_dropped"] == m["rows_in"] - m["rows_out"]
        assert m["rows_dropped"] >= 0
        assert m["rows_added"] == 0  # nothing here expands
    # cap really capped, filter really filtered
    assert manifest[1]["rows_out"] <= 20 * 5  # 20 sources in testdata
    assert got.filter(F.col("lang") != "en").count() == 0
    assert manifest[-1]["rows_out"] == got.count()
    # params echo without the op key
    assert manifest[1]["params"] == {"group_col": "source", "cap": 5}


def test_recipe_unknown_op_raises_before_spark(spark, sf_dir):
    d = load(spark, sf_dir)["documents"]
    with pytest.raises(ValueError, match="unknown recipe ops.*nope"):
        run_recipe(d, [{"op": "exact_dedup"}, {"op": "nope"}])


def test_recipe_missing_required_param_raises_before_spark(spark, sf_dir):
    """A config typo must fail upfront, not after earlier stages have
    burned cluster time (cap_per_group without its cap)."""
    d = load(spark, sf_dir)["documents"]
    with pytest.raises(ValueError, match="cap_per_group needs 'cap'"):
        run_recipe(
            d,
            [{"op": "exact_dedup"}, {"op": "cap_per_group", "group_col": "source"}],
        )


def test_recipe_expanding_stage_reports_rows_added(spark, sf_dir):
    """chunk multiplies rows: the manifest must report the expansion
    as rows_added, never a negative drop count."""
    d = load(spark, sf_dir)["documents"]
    got, manifest = run_recipe(
        d, [{"op": "chunk", "chunk_chars": 64, "overlap_chars": 8}]
    )
    m = manifest[0]
    assert m["rows_out"] > m["rows_in"]
    assert m["rows_added"] == m["rows_out"] - m["rows_in"]
    assert m["rows_dropped"] == 0


def test_recipe_counts_off(spark, sf_dir):
    d = load(spark, sf_dir)["documents"]
    got, manifest = run_recipe(
        d, [{"op": "exact_dedup"}], counts=False
    )
    assert manifest[0]["rows_in"] is None
    assert manifest[0]["rows_out"] is None
    assert manifest[0]["rows_dropped"] is None
    assert got.count() > 0  # result still computes


def test_recipe_decontaminate_drop(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated text about spark partitions and shuffles here"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog indeed")],
        "q long, text string",
    )
    kept, manifest = run_recipe(
        docs,
        [{"op": "decontaminate", "benchmark": bench, "drop": True, "n": 8}],
    )
    ids = [r.doc_id for r in kept.collect()]
    assert ids == [2]
    # audit columns dropped with drop=True
    assert "contaminated" not in kept.columns
    # the benchmark DataFrame must NOT be serialized into the manifest
    assert "benchmark" not in manifest[0]["params"]
    assert manifest[0]["rows_dropped"] == 1


def test_recipe_pii_and_repetition(spark):
    docs = spark.createDataFrame(
        [
            (1, "contact me at alice@example.com for details about the offer"),
            (2, "spam spam spam spam spam spam spam spam spam spam"),
        ],
        "doc_id long, text string",
    )
    got, _ = run_recipe(
        docs,
        [
            {"op": "repetition_filter", "max_dup_fraction": 0.5},
            {"op": "scrub_pii"},
        ],
    )
    rows = got.collect()
    assert [r.doc_id for r in rows] == [1]
    assert "alice@example.com" not in rows[0].text


def test_recipe_terminal_pack(spark, sf_dir):
    d = load(spark, sf_dir)["documents"]
    got, manifest = run_recipe(
        d,
        [
            {"op": "exact_dedup"},
            {"op": "pack", "group_col": "source", "context_tokens": 256},
        ],
    )
    assert set(got.columns) == {
        "doc_id", "source", "n_tokens", "pack_id", "pack_offset",
    }
    assert manifest[-1]["rows_out"] == manifest[-1]["rows_in"]  # manifest rows 1:1


def test_recipe_persist_stages_same_result(spark, sf_dir):
    d = load(spark, sf_dir)["documents"]
    stages = [{"op": "exact_dedup"}, {"op": "split"}]
    a, _ = run_recipe(d, stages, persist_stages=True)
    b, _ = run_recipe(d, stages)
    assert {tuple(r) for r in a.select("doc_id", "split").collect()} == {
        tuple(r) for r in b.select("doc_id", "split").collect()
    }


def test_stage_registry_is_complete():
    """Every documented op is registered (recipes in config files
    depend on these exact names)."""
    assert {
        "exact_dedup", "near_dedup", "quality_filter", "langid_filter",
        "repetition_filter", "scrub_pii", "decontaminate",
        "cap_per_group", "temperature", "split", "leakage_safe_split",
        "global_shuffle", "chunk", "pack", "filter",
    } <= set(STAGES)


def test_recipe_remove_span_dups_matches_manual(spark, sf_dir):
    """remove_span_dups through the runner == remove_duplicate_spans
    called directly (text rewritten, non-text columns preserved), and
    the manifest reports zero row delta (a rewrite, not a filter)."""
    from scratchdata_spark.operators.dedup import remove_duplicate_spans

    d = load(spark, sf_dir)["documents"]
    got, manifest = run_recipe(
        d, [{"op": "remove_span_dups", "ngram": 8, "min_count": 2}]
    )
    assert set(got.columns) == set(d.columns)
    want = remove_duplicate_spans(
        d.select("doc_id", "text"), ngram=8, min_count=2
    )
    g = {(r.doc_id, r.text) for r in got.select("doc_id", "text").collect()}
    w = {(r.doc_id, r.text) for r in want.select("doc_id", "text").collect()}
    assert g == w and len(g) > 0
    assert manifest[0]["rows_dropped"] == 0
    assert manifest[0]["rows_added"] == 0
    # keep_metrics carries the audit columns through
    got2, _ = run_recipe(
        d,
        [{"op": "remove_span_dups", "ngram": 8, "keep_metrics": True}],
        counts=False,
    )
    assert {"n_tokens", "n_tokens_removed"} <= set(got2.columns)


def test_recipe_semantic_dedup_matches_manual(spark, sf_dir):
    """semantic_dedup through the runner == the operator's survivor
    set semi-joined back, vec_col is REQUIRED, and dropped rows are
    exactly the non-survivors."""
    from scratchdata_spark.operators.semantic import semantic_dedup

    e = load(spark, sf_dir)["embeddings"]
    with pytest.raises(ValueError, match="vec_col"):
        run_recipe(e, [{"op": "semantic_dedup"}], id_col="vec_id")
    got, manifest = run_recipe(
        e,
        [{"op": "semantic_dedup", "vec_col": "embedding",
          "k": 4, "threshold": 0.4, "max_iter": 0}],
        id_col="vec_id",
    )
    surv = semantic_dedup(
        e, id_col="vec_id", vec_col="embedding",
        k=4, threshold=0.4, max_iter=0,
    )
    g = {r.vec_id for r in got.select("vec_id").collect()}
    w = {r.vec_id for r in surv.select("vec_id").collect()}
    assert g == w and len(g) > 0
    assert set(got.columns) == set(e.columns)
    assert manifest[0]["rows_out"] == len(g)
    assert manifest[0]["rows_dropped"] == e.count() - len(g)


def test_recipe_remove_boilerplate_stage(spark, sf_dir):
    """The boilerplate stage composes in a recipe and its manifest
    row reports zero dropped ROWS (it rewrites text, not rows) while
    the text itself loses the chrome paragraphs."""
    prose = (
        "This is a real paragraph of prose with enough words and the"
        " usual density of function words that a reader would expect."
    )
    doc = "Home | Products | Pricing\n" + prose + "\nCopyright 2024 X"
    d = spark.createDataFrame(
        [(1, doc), (2, prose)], "doc_id long, text string"
    )
    got, manifest = run_recipe(
        d, [{"op": "remove_boilerplate"}, {"op": "exact_dedup"}]
    )
    rows = {r.doc_id: r.text for r in got.collect()}
    # both docs clean to the same prose; exact_dedup then keeps min id
    assert rows == {1: prose}
    bp = manifest[0]
    assert bp["op"] == "remove_boilerplate"
    assert bp["rows_dropped"] == 0


def test_recipe_checkpoint_stage_cuts_lineage(spark):
    """The checkpoint stage is a row-identity lineage cut: same rows
    out, manifest reports zero drops, and the returned frame's plan no
    longer contains the upstream scan (an ExistingRDD/checkpoint leaf
    instead) — the phase-boundary cut the composed selection recipes
    need (r11 soak measurement: planning time is exponential in the
    number of self-joining stages without it)."""
    d = spark.createDataFrame(
        [(i, f"doc {i} text here") for i in range(10)],
        "doc_id long, text string",
    )
    got, manifest = run_recipe(
        d, [{"op": "checkpoint"}, {"op": "exact_dedup"}]
    )
    assert manifest[0]["op"] == "checkpoint"
    assert manifest[0]["rows_dropped"] == 0
    assert got.count() == 10
    # the cut frame's logical plan is a checkpoint scan, not the
    # original LocalRelation lineage
    cut, _ = run_recipe(d, [{"op": "checkpoint", "eager": True}])
    assert "ExistingRDD" in cut._jdf.queryExecution().analyzed().toString() or \
        "LogicalRDD" in cut._jdf.queryExecution().analyzed().toString()
