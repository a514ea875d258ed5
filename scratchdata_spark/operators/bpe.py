"""Byte-pair-encoding tokenizer: sample-fit TRAIN on the driver,
distributed APPLY in Arrow batches — real merge-table token counts
for the operators that today estimate with whitespace/regex
(text.token_count / bpe_ish_token_count): sequence packing, per-source
caps and training-cost estimates all key on tokens, and a 10-20%
systematic miscount moves real budgets.

The reference has no tokenizer (SURVEY.md §2 — beyond-parity); the
algorithm is the public BPE procedure (Sennrich et al. 2016,
arXiv:1508.07909): start from characters (with an end-of-word
marker), repeatedly merge the most frequent adjacent symbol pair.

Scale shape — the kmeans/PQ sample-fit pattern exactly:

* TRAIN collects a BOUNDED word-frequency sample (one aggregation
  over ``sample_rows`` documents, then ``top_words`` (word, count)
  rows to the driver — merge learning needs global pair counts, and
  a Zipf-truncated vocabulary changes merges marginally);
* merge learning is pure driver Python over that table —
  deterministic tie-break (count desc, pair lexicographic) so two
  runs (or two engines) learn identical tables;
* APPLY ships the merge table in the task closure (PQ-LUT pattern)
  and encodes inside ``mapInPandas`` with a per-batch word cache —
  Zipf means the cache hits almost always, so the per-row cost is a
  dict lookup, not a merge loop.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from scratchdata_spark.operators.dedup import normalize_text

_EOW = "</w>"


def _word_counts(
    df: DataFrame, text_col: str, sample_rows: int, top_words: int
) -> list[tuple[str, int]]:
    """Bounded (word, count) table: deterministic lowest-id-free
    sample via LIMIT on the natural order is nondeterministic, so the
    sample is the FIRST ``sample_rows`` by a hash of the text — stable
    across runs and partitionings."""
    words = (
        df.select(F.xxhash64(text_col).alias("__h"), F.col(text_col))
        .orderBy("__h")
        .limit(sample_rows)
        .select(
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias(
                "__w"
            )
        )
        .filter(F.col("__w") != "")
        .groupBy("__w")
        .count()
        .orderBy(F.col("count").desc(), F.col("__w"))
        .limit(top_words)
    )
    return [(r["__w"], r["count"]) for r in words.collect()]


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 512,
    sample_rows: int = 10_000,
    top_words: int = 20_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a bounded sample; returns
    the ordered merge list (the whole model — apply needs nothing
    else).  Deterministic: stable sample, stable tie-breaks."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in _word_counts(df, text_col, sample_rows, top_words):
        vocab[tuple(w) + (_EOW,)] = vocab.get(tuple(w) + (_EOW,), 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break  # nothing repeats: further merges are noise
        merges.append(best)
        merged = best[0] + best[1]
        out: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            s, i, n = [], 0, len(sym)
            while i < n:
                if i + 1 < n and sym[i] == best[0] and sym[i + 1] == best[1]:
                    s.append(merged)
                    i += 2
                else:
                    s.append(sym[i])
                    i += 1
            t = tuple(s)
            out[t] = out.get(t, 0) + c
        vocab = out
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with the trained merge ranks: repeatedly apply
    the LOWEST-RANK applicable merge (the canonical BPE apply
    order — training order, not left-to-right greedy)."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """df + ``out_col``: the document's real BPE token count.  The
    merge table rides the task closure; a per-batch word→count cache
    turns the Zipf bulk of the corpus into dict lookups."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, IntegerType())]
    )
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}

        def count(text) -> int | None:
            if text is None:
                return None
            total = 0
            for w in _normalize_py(text).split(" "):
                if not w:
                    continue
                n = cache.get(w)
                if n is None:
                    n = len(bpe_encode_word(w, ranks))
                    cache[w] = n
                total += n
            return total

        for pdf in batches:
            out = pdf[cols].copy()
            out[out_col] = [count(t) for t in pdf[text_col]]
            yield out

    return df.mapInPandas(run, schema)


def _normalize_py(text: str) -> str:
    """Python twin of dedup.normalize_text (lowercase + whitespace
    collapse) so apply tokenizes exactly what train counted."""
    import re

    return re.sub(r"\s+", " ", text.strip()).lower()
