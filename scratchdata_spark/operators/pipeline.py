"""Corpus-preparation operators a training-data pipeline runs after
cleaning/dedup: deterministic splits, stratified sampling, and
sequence packing. All pure column expressions / window functions —
JVM-side, shuffle only where the semantics require one — and all
hash-engine-agnostic (sha256 hex, identical in Spark and DuckDB), so
every operator is oracle-checkable value-for-value.

At 100 TB: splits and sampling are map-only (no shuffle at all —
the hash is computed per row and compared to a literal); packing
shuffles once on the grouping key, exactly the partitioning the
downstream tokenizer job wants to inherit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from scratchdata_spark.operators.text import token_count


def _hash_bucket(col: Column) -> Column:
    """First two hex chars of sha256(text): 256 deterministic,
    engine-portable buckets. Lexicographic order on lowercase hex IS
    numeric order, so a `< 'xy'` comparison selects exactly
    int('xy', 16)/256 of the mass (uniform by sha256)."""
    return F.substring(F.sha2(col, 256), 1, 2)


def train_val_split(
    df: DataFrame, text_col: str = "text", val_fraction_256: int = 13
) -> DataFrame:
    """Deterministic content-hash split: ~val_fraction_256/256 of rows
    go to 'val', the rest to 'train'. Content-keyed (not row-keyed) on
    purpose — re-ingesting the same document always lands in the same
    split, so train/val never leak into each other across pipeline
    re-runs. Map-only: no shuffle, no RNG state."""
    # 0 → everything train: 'zz' sorts above every 2-char hex bucket
    # (format(256, '02x') would be the 3-char '100', which hex buckets
    # 'a0'.. compare ABOVE lexicographically — misrouting ~37% to val)
    if val_fraction_256 <= 0:
        threshold = "zz"
    else:
        threshold = format(max(256 - val_fraction_256, 0), "02x")
    return df.withColumn(
        "split",
        F.when(_hash_bucket(F.col(text_col)) < F.lit(threshold), "train")
        .otherwise("val"),
    )


def stratified_sample(
    df: DataFrame, strata_col: str, rates_256: dict[str, int],
    text_col: str = "text", default_256: int = 256,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep ~rates_256[s]/256 of
    each stratum (e.g. downsample a dominant language). Same
    content-hash mechanism as the split — reproducible, map-only, and
    a document's fate never depends on partitioning or scan order."""
    threshold = None
    for value, rate in rates_256.items():
        hex_rate = F.lit(format(min(rate, 256), "02x") if rate < 256 else "zz")
        cond = F.col(strata_col) == value
        threshold = (
            F.when(cond, hex_rate)
            if threshold is None
            else threshold.when(cond, hex_rate)
        )
    default_hex = F.lit(format(min(default_256, 256), "02x") if default_256 < 256 else "zz")
    threshold = default_hex if threshold is None else threshold.otherwise(default_hex)
    return df.filter(_hash_bucket(F.col(text_col)) < threshold)


def pack_sequences(
    df: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    context_tokens: int = 2048,
) -> DataFrame:
    """Sequence-packing plan: within each group (source, shard, …),
    order documents deterministically and assign each to a pack of
    ~context_tokens whitespace tokens (pack_id = how many full
    contexts precede the document's start offset). Output is the
    (doc, pack, offset) manifest the tokenizer job consumes; documents
    longer than the context get a pack of their own, oversize handling
    being the tokenizer's concern. One shuffle, keyed by the group —
    the same partitioning the downstream job wants."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = token_count(F.col(text_col)).alias("n_tokens")
    with_cum = df.select(
        F.col(id_col), F.col(group_col), n
    ).withColumn("cum_tokens", F.sum("n_tokens").over(w))
    start = (F.col("cum_tokens") - F.col("n_tokens")).cast("long")
    return with_cum.select(
        id_col,
        group_col,
        "n_tokens",
        F.floor(start / context_tokens).cast("long").alias("pack_id"),
        (start % context_tokens).cast("long").alias("pack_offset"),
    )
