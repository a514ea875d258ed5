"""Corpus mixing (pipeline.mix_corpora): weight-proportional token
budgets, downsample-only feasibility, deterministic hash sampling,
and exact manifest accounting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scratchdata_spark.operators.pipeline import mix_corpora
from scratchdata_spark.operators.text import token_count


def _src(spark, name, n, words_per_doc):
    rows = [
        (i, " ".join(f"{name}{i}w{j}" for j in range(words_per_doc)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_mix_proportions_and_manifest(spark):
    a = _src(spark, "a", 400, 10)  # 4000 tokens
    b = _src(spark, "b", 100, 10)  # 1000 tokens
    mix, manifest = mix_corpora(
        [("web", a), ("books", b)], {"web": 0.5, "books": 0.5}
    )
    m = {e["source"]: e for e in manifest}
    # feasible total = min(4000/0.5, 1000/0.5) = 2000: books binds
    assert m["books"]["binding"] and m["books"]["keep_rate"] == 1.0
    assert m["web"]["target_tokens"] == 1000
    assert m["web"]["available_tokens"] == 4000
    assert 0.2 <= m["web"]["keep_rate"] <= 0.3
    got = mix.groupBy("source").agg(
        F.sum(token_count(F.col("text"))).alias("t")
    ).collect()
    tokens = {r.source: r.t for r in got}
    assert tokens["books"] == 1000
    # hash sampling: expected 1000, tolerate sampling noise
    assert 700 <= tokens["web"] <= 1300
    # determinism: identical documents on re-run
    mix2, _ = mix_corpora(
        [("web", a), ("books", b)], {"web": 0.5, "books": 0.5}
    )
    ids = lambda d: sorted(
        (r.source, r.doc_id) for r in d.select("source", "doc_id").collect()
    )
    assert ids(mix) == ids(mix2)
    # a different seed keeps a different (same-sized-ish) subset
    mix3, _ = mix_corpora(
        [("web", a), ("books", b)], {"web": 0.5, "books": 0.5}, seed="mix1"
    )
    assert ids(mix3) != ids(mix)


def test_mix_explicit_target_and_upsampling_refusal(spark):
    a = _src(spark, "a", 200, 10)  # 2000 tokens
    b = _src(spark, "b", 200, 10)
    mix, manifest = mix_corpora(
        [("x", a), ("y", b)], [3.0, 1.0], target_tokens=800
    )
    m = {e["source"]: e for e in manifest}
    assert m["x"]["target_tokens"] == 600
    assert m["y"]["target_tokens"] == 200
    assert not m["x"]["binding"] and not m["y"]["binding"]
    with pytest.raises(ValueError, match="upsampling of source 'x'"):
        mix_corpora([("x", a), ("y", b)], [3.0, 1.0], target_tokens=4000)
    with pytest.raises(ValueError, match="positive weight"):
        mix_corpora([("x", a)], [0.0])


def test_mix_schema_and_empty_source(spark):
    a = _src(spark, "a", 10, 5)
    empty = a.filter(F.lit(False))
    mix, manifest = mix_corpora(
        [("full", a), ("none", empty)], [1.0, 1.0]
    )
    assert mix.columns == ["doc_id", "text", "source"]
    # an empty source makes the feasible total 0: everything drops
    assert mix.count() == 0
    assert manifest[1]["available_tokens"] == 0


def test_mix_with_bpe_token_counts(spark):
    """The bpe_token_counts seam composes (VERDICT r8 #6): budgets
    computed from real merge-table counts, not the whitespace
    estimator — and the manifest's available_tokens equal the BPE
    sums exactly."""
    from scratchdata_spark.operators.bpe import bpe_token_counts, bpe_train

    rows_a = [(i, "the quick brown fox " * 3) for i in range(10)]
    rows_b = [(100 + i, "encoding merges frequent pairs " * 2)
              for i in range(10)]
    a = spark.createDataFrame(rows_a, "doc_id long, text string")
    b = spark.createDataFrame(rows_b, "doc_id long, text string")
    both = a.unionByName(b)
    merges = bpe_train(both, n_merges=20, sample_rows=100, top_words=100)
    a_tok = bpe_token_counts(a, merges)
    b_tok = bpe_token_counts(b, merges)
    mix, manifest = mix_corpora(
        [("a", a_tok), ("b", b_tok)], [1.0, 1.0],
        token_count_col="bpe_tokens",
    )
    m = {e["source"]: e for e in manifest}
    exp_a = sum(r.bpe_tokens for r in a_tok.collect())
    exp_b = sum(r.bpe_tokens for r in b_tok.collect())
    assert m["a"]["available_tokens"] == exp_a
    assert m["b"]["available_tokens"] == exp_b
    # binding source (smaller BPE total) keeps everything
    binding = "a" if exp_a <= exp_b else "b"
    assert m[binding]["binding"] and m[binding]["keep_rate"] == 1.0
    # output schema unchanged by the precomputed-count path
    assert mix.columns == ["doc_id", "text", "source"]
    assert mix.count() >= 10
