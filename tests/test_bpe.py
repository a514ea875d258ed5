"""BPE tokenizer (operators/bpe.py): merge learning determinism and
frequency order, canonical rank-order apply, the distributed count
path, and parity between the cached Arrow apply and the reference
encoder."""

from __future__ import annotations

from pyspark.sql import functions as F

from scratchdata_spark.operators import bpe as B


def _corpus(spark, n=200):
    rows = [
        (i, "the thermal theme of the theater " * 3 + f"tail {i}")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_train_learns_frequent_pairs(spark):
    merges = B.bpe_train(_corpus(spark), n_merges=40, sample_rows=200)
    assert 0 < len(merges) <= 40
    # the dominant word 'the' must collapse to ONE token within the
    # first few merges (whether the learner picked t+h or h+e first
    # is a legal tie-break)
    ranks3 = {p: i for i, p in enumerate(merges[:3])}
    assert B.bpe_encode_word("the", ranks3) == ["the</w>"]
    # determinism: identical table across runs
    assert merges == B.bpe_train(_corpus(spark), n_merges=40, sample_rows=200)


def test_bpe_encode_word_rank_order():
    # ranks: th first, then the+EOW chain
    merges = [("t", "h"), ("th", "e"), ("the", "</w>")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert B.bpe_encode_word("the", ranks) == ["the</w>"]
    # unknown word: falls back to chars + EOW with partial merges
    assert B.bpe_encode_word("tha", ranks) == ["th", "a", "</w>"]
    # no applicable merges: pure characters
    assert B.bpe_encode_word("xyz", {}) == ["x", "y", "z", "</w>"]


def test_bpe_token_counts_distributed(spark):
    corpus = _corpus(spark, 100)
    merges = B.bpe_train(corpus, n_merges=60, sample_rows=100)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r.doc_id: r.bpe_tokens for r in B.bpe_token_counts(
        corpus, merges
    ).collect()}
    assert len(got) == 100
    # reference: encode one row's words directly
    row = corpus.filter(F.col("doc_id") == 7).collect()[0]
    want = sum(
        len(B.bpe_encode_word(w, ranks))
        for w in B._normalize_py(row.text).split(" ")
        if w
    )
    assert got[7] == want
    # a trained tokenizer compresses its own corpus below char count
    n_chars = len(B._normalize_py(row.text).replace(" ", ""))
    assert got[7] < n_chars
    # NULL text yields NULL count, schema appends the one column
    withnull = spark.createDataFrame(
        [(1, None)], "doc_id long, text string"
    )
    out = B.bpe_token_counts(withnull, merges).collect()[0]
    assert out.bpe_tokens is None
