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
    assert B.bpe_encode_word("the", ranks3) == ["the" + B._EOW]
    # determinism: identical table across runs
    assert merges == B.bpe_train(_corpus(spark), n_merges=40, sample_rows=200)


def test_bpe_encode_word_rank_order():
    E = B._EOW
    # ranks: th first, then the+EOW chain
    merges = [("t", "h"), ("th", "e"), ("the", E)]
    ranks = {p: i for i, p in enumerate(merges)}
    assert B.bpe_encode_word("the", ranks) == ["the" + E]
    # unknown word: falls back to chars + EOW with partial merges
    assert B.bpe_encode_word("tha", ranks) == ["th", "a", E]
    # no applicable merges: pure characters
    assert B.bpe_encode_word("xyz", {}) == ["x", "y", "z", E]
    # the marker char cannot be forged from input text
    assert B.bpe_encode_word("a" + E + "b", {}) == ["a", "�", "b", E]


def test_bpe_long_word_counts_stay_linear():
    """A megabyte whitespace-free 'word' (minified JS, base64) must
    cost linear chunked work and count consistently with its pieces."""
    ranks = {("a", "a"): 0, ("aa", "aa"): 1}
    big = "a" * 100_000
    got = B._count_word(big, ranks)
    # aaaa-collapsing merges: each 256-char chunk becomes 64 'aaaa'
    # symbols (+1 EOW on the last chunk after the spurious-EOW fold)
    assert got == (100_000 // 4) + 1


def test_bpe_token_counts_distributed(spark):
    corpus = _corpus(spark, 100)
    merges = B.bpe_train(corpus, n_merges=60, sample_rows=100)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r.doc_id: r.bpe_tokens for r in B.bpe_token_counts(
        corpus, merges
    ).collect()}
    assert len(got) == 100
    # reference: encode one row's words directly — normalization via
    # the SAME Spark expression the operator uses (no python twin: the
    # \s semantics differ between Java and Python regexes)
    from scratchdata_spark.operators.dedup import normalize_text

    row = corpus.filter(F.col("doc_id") == 7).select(
        normalize_text(F.col("text")).alias("norm")
    ).collect()[0]
    want = sum(
        len(B.bpe_encode_word(w, ranks))
        for w in row.norm.split(" ")
        if w
    )
    assert got[7] == want
    # a trained tokenizer compresses its own corpus below char count
    assert got[7] < len(row.norm.replace(" ", ""))
    # NULL text yields NULL count, schema appends the one column
    withnull = spark.createDataFrame(
        [(1, None)], "doc_id long, text string"
    )
    out = B.bpe_token_counts(withnull, merges).collect()[0]
    assert out.bpe_tokens is None
