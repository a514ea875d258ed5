"""Deduplication operators for training-data pipelines.

Four tiers, all pure DataFrame ops (no Python in the hot path):

* exact          — group by content hash, keep canonical row
* minhash_lsh    — shingle → minhash signature → banded LSH buckets →
                   candidate pairs → exact-Jaccard verification
* simhash        — 64-bit token-hash sign aggregate; near-dups share
                   low-Hamming fingerprints
* ngram_jaccard  — exact all-pairs Jaccard via an inverted shingle
                   index (for modest corpora / verification)

Scale design (100 TB corpus):
- exact dedup shuffles 32-byte sha256 keys, never full documents.
- minhash: signatures are n_hashes longs per doc (~512 B at n=64);
  the LSH band join shuffles (band_id, band_hash) keys only. Hot
  buckets (boilerplate docs) are the skew risk — AQE skew-join plus
  an optional bucket-size cap handle it.
- ngram_jaccard's inverted index drops shingles appearing in more
  than ``max_shingle_freq`` docs (stop-shingles produce quadratic
  pair blowup while carrying no signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MASK63 = (1 << 63) - 1


def normalize_text(col):
    """Whitespace-collapse + lowercase; the canonical form for hashing."""
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the smallest-id row per normalized-content group.

    Grouping key is sha256 of the normalized text: constant-width
    shuffle keys regardless of document size (a 100 KB doc shuffles
    32 bytes), and the same digest doubles as a content fingerprint.
    """
    h = F.sha2(normalize_text(F.col(text_col)), 256)
    w = Window.partitionBy(h).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def shingles(col, k: int = 5):
    """Character k-shingles as a distinct array — pure column
    expressions (transform over a sequence), no UDF."""
    n = F.greatest(F.length(col) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n), lambda i: col.substr(i, F.lit(k))
        )
    )


def minhash_signature(df: DataFrame, text_col: str, n_hashes: int = 64, k: int = 5) -> DataFrame:
    """Append ``__sig`` (array<long> of n_hashes minhash values).

    One xxhash64 per shingle, then n_hashes cheap seeded re-hashes
    (two-arg murmur3 ``hash(h, j)`` — overflow-free under ANSI mode)
    folded with array_min — all inside whole-stage codegen.
    """
    df = df.withColumn("__sh", shingles(normalize_text(F.col(text_col)), k))
    df = df.withColumn("__h0", F.expr("transform(__sh, s -> xxhash64(s))"))
    sig = [
        F.expr(f"array_min(transform(__h0, h -> hash(h, {j})))").cast("long")
        for j in range(n_hashes)
    ]
    return df.withColumn("__sig", F.array(*sig)).drop("__sh", "__h0")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash-LSH + exact verification.

    rows_per_band = n_hashes // bands; two docs land in the same
    bucket iff one full band of their signatures agrees. Candidates
    are verified with exact Jaccard over the shingle sets, so the
    output has no LSH false positives (only false-negative risk,
    controlled by bands/rows).

    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    r = n_hashes // bands
    sig = minhash_signature(df.select(id_col, text_col), text_col, n_hashes, k)
    sig = sig.withColumn("__shset", shingles(normalize_text(F.col(text_col)), k)).drop(
        text_col
    )

    band_cols = [
        F.struct(
            F.lit(i).alias("band"),
            F.xxhash64(F.slice("__sig", i * r + 1, r).cast("string")).alias("bh"),
        )
        for i in range(bands)
    ]
    buckets = sig.select(
        F.col(id_col), "__shset", F.explode(F.array(*band_cols)).alias("b")
    ).select(id_col, "__shset", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))

    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.__shset").alias("sh_a"),
            F.col("b.__shset").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(df: DataFrame, text_col: str, out_col: str = "simhash") -> DataFrame:
    """64-bit SimHash over whitespace tokens (xxhash64 token hashes).

    Implemented as an explode + 64 conditional sums + bit reassembly —
    one shuffle by document id, everything JVM-side.
    """
    toks = df.select(
        "*",
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("__tok"),
    ).withColumn("__th", F.xxhash64("__tok"))
    keys = [c for c in df.columns]
    bit_sums = [
        F.sum(
            F.when(F.expr(f"(__th >> {j}) & 1") == 1, 1).otherwise(-1)
        ).alias(f"__b{j}")
        for j in range(64)
    ]
    agg = toks.groupBy(*keys).agg(*bit_sums)
    fp = F.lit(0).cast("long")
    for j in range(64):
        fp = fp + F.when(F.col(f"__b{j}") > 0, F.lit(1).cast("long") * (1 << j) if j < 63 else F.lit(-(1 << 63))).otherwise(0)
    out = agg.withColumn(out_col, fp.cast("long"))
    return out.select(*keys, out_col)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    threshold: float = 0.4,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact all-pairs Jaccard via inverted shingle index.

    At scale, ``max_shingle_freq`` drops stop-shingles (present in
    > freq docs) before the pair join — they dominate the quadratic
    blowup and carry no near-dup signal. Kept None in the oracle-
    checked query for exactness on small corpora.
    """
    sh = (
        df.select(F.col(id_col), F.explode(shingles(normalize_text(F.col(text_col)), k)).alias("s"))
        .dropDuplicates([id_col, "s"])
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    if max_shingle_freq is not None:
        hot = sh.groupBy("s").agg(F.count("*").alias("df")).filter(
            F.col("df") > max_shingle_freq
        )
        sh = sh.join(hot, "s", "left_anti")
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("common"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    return (
        common.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("jaccard", F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
