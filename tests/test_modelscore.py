"""Batch model-inference seam (operators/modelscore.py)."""

from __future__ import annotations

from scratchdata_spark.operators.modelscore import (
    default_scorer,
    score_documents,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "a solid sentence with several words here"),
            (2, ""),
            (3, "x" * 5000),
            (4, None),
        ],
        "doc_id long, text string",
    )


def test_default_scorer_bounds_and_passthrough(spark):
    out = score_documents(_docs(spark))
    rows = {r.doc_id: r for r in out.collect()}
    assert set(out.columns) == {"doc_id", "text", "model_score"}
    for r in rows.values():
        assert 0.0 <= r.model_score <= 1.0
    # empty and null text: tok=0, alpha=0, brevity=1 → 0.2 exactly
    assert rows[2].model_score == 0.2
    assert rows[4].model_score == 0.2
    # the 5000-char x-run saturates brevity to 0; alpha=1 → 0.3 + tok
    assert abs(rows[3].model_score - (0.5 * (1 / 200.0) + 0.3)) < 1e-9


def test_custom_scorer_callable(spark):
    def constant(batch):
        return batch["text"].fillna("").str.len() * 0.0 + 0.75

    out = score_documents(_docs(spark), scorer=constant)
    assert {r.model_score for r in out.collect()} == {0.75}


def test_env_hook_resolves_on_executor(spark, monkeypatch):
    # default_scorer itself, addressed through the env hook
    monkeypatch.setenv(
        "SPARK_GRAFT_SCORER", "scratchdata_spark.operators.modelscore:default_scorer"
    )
    out = {r.doc_id: r.model_score for r in score_documents(_docs(spark)).collect()}
    monkeypatch.delenv("SPARK_GRAFT_SCORER")
    base = {r.doc_id: r.model_score for r in score_documents(_docs(spark)).collect()}
    assert out == base


def test_renamed_text_column(spark):
    df = spark.createDataFrame([(1, "hello world")], "id long, body string")
    out = score_documents(df, text_col="body").collect()
    assert out[0].body == "hello world"
    assert 0.0 < out[0].model_score <= 1.0
