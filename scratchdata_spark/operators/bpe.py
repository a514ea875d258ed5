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

* TRAIN collects a BOUNDED word-frequency table: the document sample
  is the pq.py hash-filter (count once, keep rows hashing under the
  target fraction — map-only, no per-partition top-K heap of full
  documents), then one explode/groupBy and a ``top_words`` TakeOrdered
  of small (word, count) rows;
* merge learning is pure driver Python over that table —
  deterministic tie-break (count desc, pair lexicographic) so two
  runs (or two engines) learn identical tables;
* APPLY normalizes and splits WORDS IN SPARK with the exact same
  ``normalize_text`` expression training used (a Python regex twin
  drifts: Java ``\\s`` is ASCII-only, Python's is Unicode — NBSP text
  would train one vocabulary and apply another), ships the merge
  table in the task closure (PQ-LUT pattern) and encodes inside
  ``mapInPandas`` with a bounded word cache — Zipf means the cache
  hits almost always, so the per-row cost is a dict lookup, not a
  merge loop.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from scratchdata_spark.operators.dedup import normalize_text

# End-of-word marker: a PRIVATE-USE codepoint, not '</w>' — literal
# '</w>' in crawled XML would merge into a symbol string-identical to
# the marker and conflate mid-word/end-of-word statistics (reviewer
# catch).  Input occurrences of the marker char are folded to U+FFFD
# on BOTH paths so no input can forge it.
_EOW = ""
_CACHE_MAX = 200_000  # bounded like every other cache in this repo
_CACHE_WORD_MAX = 64  # longer words are near-unique; caching them
# only grows the dict
_CHUNK = 256  # merge application is O(len²) per word; chunking keeps
# a megabyte base64 'word' linear (reviewer catch)


def _scrub_marker(col):
    return F.regexp_replace(col, _EOW, "�")


def _word_counts(
    df: DataFrame,
    text_col: str,
    sample_rows: int,
    top_words: int,
    id_col: str | None,
) -> list[tuple[str, int]]:
    """Bounded (word, count) table.  The document sample is the
    deterministic pq.py hash filter — NULLs excluded first (all NULL
    rows share xxhash64's constant and would otherwise hoard sample
    slots while contributing zero words).  Hash ``id_col`` when the
    caller has one: hashing text clusters exact duplicates onto one
    hash value, so a boilerplate page duplicated past the sample size
    can fill the whole sample (reviewer catch)."""
    base = df.select(
        *([F.col(id_col).alias("__sid")] if id_col else []),
        F.col(text_col).alias("__t"),
    ).filter(F.col("__t").isNotNull())
    n = base.count()
    if n > sample_rows:
        den = 1 << 30
        thr = max(1, (sample_rows * den) // n)
        key = F.col("__sid") if id_col else F.col("__t")
        base = base.filter(F.pmod(F.xxhash64(key), F.lit(den)) < F.lit(thr))
    words = (
        base.select(
            F.explode(F.split(normalize_text(F.col("__t")), " ")).alias("__w")
        )
        .filter(F.col("__w") != "")
        .select(_scrub_marker(F.col("__w")).alias("__w"))
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
    id_col: str | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a bounded sample; returns
    the ordered merge list (the whole model — apply needs nothing
    else).  Deterministic: stable sample, stable tie-breaks."""
    return learn_merges(
        _word_counts(df, text_col, sample_rows, top_words, id_col), n_merges
    )


def learn_merges(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """The pure merge-learning loop over a (word, count) table —
    shared by the Spark-sampled :func:`bpe_train` and any driver-
    computed fixture (the x_bpe_token_counts registry entry trains
    the same table from literal texts to pin the distributed apply
    path under the hash gate).  Deterministic tie-break: count desc,
    then pair lexicographic."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts:
        key = tuple(w) + (_EOW,)
        vocab[key] = vocab.get(key, 0) + c
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
    sym = list(word.replace(_EOW, "�")) + [_EOW]
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


def _count_word(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Token count for one word; words past ``_CHUNK`` chars encode
    in segments (each segment's spurious EOW subtracted) — merge
    application is quadratic per word, and one megabyte base64
    'word' in a crawled document must cost linear work, never a
    straggler task."""
    if len(word) <= _CHUNK:
        return len(bpe_encode_word(word, ranks))
    total = 0
    chunks = 0
    for s in range(0, len(word), _CHUNK):
        total += len(bpe_encode_word(word[s : s + _CHUNK], ranks))
        chunks += 1
    return total - (chunks - 1)


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """df + ``out_col``: the document's real BPE token count.
    Normalization/splitting happens IN SPARK with the training
    expression; the merge table rides the task closure; a bounded
    word→count cache turns the Zipf bulk of the corpus into dict
    lookups (capped entries and word length — an unbounded per-task
    dict grows with the partition's distinct words; reviewer
    catch)."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    staged = df.withColumn(
        "__bpe_words", F.split(normalize_text(F.col(text_col)), " ")
    )
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, IntegerType())]
    )
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}

        def count(words) -> int | None:
            if words is None:
                return None
            total = 0
            for w in words:
                if not w:
                    continue
                n = cache.get(w)
                if n is None:
                    n = _count_word(w, ranks)
                    if len(w) <= _CACHE_WORD_MAX and len(cache) < _CACHE_MAX:
                        cache[w] = n
                total += n
            return total

        for pdf in batches:
            out = pdf[cols].copy()
            out[out_col] = [count(ws) for ws in pdf["__bpe_words"]]
            yield out

    return staged.mapInPandas(run, schema)