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

from scratchdata_spark.operators.dedup import normalize_text
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


def global_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "epoch0",
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic pseudorandom global shuffle + sharding: every row
    gets a ``shard`` (uniform by content of sha256(seed:id)) and a
    ``pos`` within its shard (rank by the same hash). Changing the
    seed reshuffles the corpus; the same seed reproduces the exact
    order on re-runs — what a training job needs to restart mid-epoch
    or re-materialize a shard.

    Scale: shard assignment is map-only; the only shuffle keys on
    ``shard`` — exactly the partitioning the shard writer consumes —
    and ``pos`` sorts within each shard partition, never globally.
    The shard index is the true hex VALUE of the digest's first four
    chars (16 uniform bits before the modulo), computed with ascii()
    arithmetic because both engines evaluate it identically — no
    engine-specific hash in the contract.  The first formulation used
    raw ascii codes with base-256 weights: every weight above the
    lowest char vanishes mod any n_shards dividing 256, and ascii of
    a hex char mod 16 only covers 0–9 — shards 10–15 were
    STRUCTURALLY empty at n_shards=16 and the distribution skewed at
    every power of two. Hex-value digits are uniform on 0–15, so any
    n_shards ≤ 65536 shards evenly; larger counts raise rather than
    silently repeat the empty-shard defect.
    """
    if n_shards < 1 or n_shards > 65536:
        raise ValueError(
            f"n_shards={n_shards} outside [1, 65536]: the shard index"
            " carries 16 bits of digest entropy, so more shards would"
            " be structurally empty"
        )
    h = F.sha2(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")), 256
    )

    def hexval(i: int):
        a = F.ascii(F.substring(F.col("__h"), i, 1))
        # '0'-'9' → 48..57 (-48), 'a'-'f' → 97..102 (-87); sha2 hex
        # is lowercase in both engines
        return a - F.when(a >= 97, F.lit(87)).otherwise(F.lit(48))

    shard = (
        hexval(1) * 4096 + hexval(2) * 256 + hexval(3) * 16 + hexval(4)
    ) % n_shards
    w = Window.partitionBy("shard").orderBy(F.col("__h"), F.col(id_col))
    return (
        df.withColumn("__h", h)
        .withColumn("shard", shard.cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("__h")
    )


def word_ngrams(col: Column, n: int) -> Column:
    """Distinct word n-grams of normalized text as an array<string> —
    pure column expressions (split → transform over a sequence →
    array_join), codegen end to end. Texts shorter than n words yield
    an empty array (the sequence guard matters: Spark's
    ``sequence(1, 0)`` counts DOWN, it is not empty)."""
    from scratchdata_spark.operators import bind_once

    # let-bound: the in-lambda slice would otherwise re-split the row
    # once per n-gram — O(tokens²) (the r13 features_col find)
    def _grams(toks):
        cnt = F.size(toks) - (n - 1)
        grams = F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
        return F.when(cnt >= 1, F.array_distinct(grams)).otherwise(
            F.array().cast("array<string>")
        )

    return bind_once(F.split(normalize_text(col), " "), _grams)


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: count, per training document, the
    distinct word n-grams it shares with any document of the
    ``benchmark`` (eval-set) corpus, and flag documents at or above
    ``min_hits`` as contaminated. The n-gram-overlap test is the
    standard published decontamination procedure for LLM training
    sets (n=8..13 word grams); callers drop or audit flagged rows.

    Scale (100 TB training corpus, MB-scale benchmark): the benchmark
    gram set is tiny, so the overlap join broadcasts it (AQE; no
    shuffle of the exploded training grams). The only shuffle is the
    per-document hit count, which partial-aggregates map-side, and
    the final attach ships (id, count) pairs — never text. Grams stay
    as strings rather than hashes so results are engine-portable and
    exactly auditable; at extreme benchmark sizes, xxhash64-ing the
    gram column on both sides of the join is the drop-in compaction.
    """
    bcol = bench_text_col or text_col
    bench_grams = benchmark.select(
        F.explode(word_ngrams(F.col(bcol), n)).alias("gram")
    ).distinct()
    doc_grams = df.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
    )
    # doc_grams is distinct per (doc, gram) by construction
    # (word_ngrams array_distincts), so count(*) is the distinct count
    hits = (
        doc_grams.join(bench_grams, "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated_ngrams"))
    )
    return (
        df.join(hits, id_col, "left")
        .withColumn(
            "n_contaminated_ngrams",
            F.coalesce(F.col("n_contaminated_ngrams"), F.lit(0)),
        )
        .withColumn(
            "contaminated", F.col("n_contaminated_ngrams") >= min_hits
        )
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-group document cap (domain caps in a web corpus: no single
    source may contribute more than ``cap`` documents). Winners are
    chosen by content-hash order — deterministic across re-runs and
    partitionings, and unbiased w.r.t. crawl/scan order, which a
    naive LIMIT per group is not. One shuffle on the group key;
    the rank is a single window pass within each group partition."""
    w = Window.partitionBy(group_col).orderBy(
        F.sha2(F.col(text_col), 256), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def resample_by_temperature(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-based source rebalancing, downsample-only: keep
    each group at a rate ∝ count^(alpha-1), scaled so the
    smallest group keeps everything. alpha=1 keeps the natural
    distribution, alpha→0 approaches uniform-over-groups — the
    standard multilingual/temperature mixing rule, materialized
    deterministically: a document survives iff the first 4 hex chars
    of sha256(text) fall below its group's keep-threshold, so re-runs
    and re-partitions keep exactly the same documents.

    Scale: group counts are one partial-aggregated shuffle over a
    tiny key space; the keep-rate table broadcasts back; the filter
    itself is map-only. The threshold is compared as a 4-char hex
    string (printf('%04x') — identical in Spark and DuckDB), never
    parsed back to int, so the whole operator is oracle-checkable."""
    counts = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    rates = counts.withColumn("__rate", F.pow("__n", F.lit(alpha - 1.0)))
    max_rate = rates.agg(F.max("__rate").alias("__mx"))
    keep = (
        rates.crossJoin(F.broadcast(max_rate))
        .withColumn("__keep", F.col("__rate") / F.col("__mx"))
        .select(group_col, "__keep")
    )
    # least(...) caps the grid at 65535 ('ffff'): keep-rates just
    # below 1.0 would otherwise round to 65536, whose printf '10000'
    # is 5 chars and lexicographically BELOW almost every 4-char hex
    # prefix — dropping ~94% of a group meant to keep ~all of it
    thresh = F.expr(
        "printf('%04x', cast(least(round(__keep * 65536), 65535.0) as int))"
    )
    return (
        df.join(F.broadcast(keep), group_col)
        .withColumn(
            "__th",
            F.when(F.col("__keep") >= 1.0, F.lit("zzzz")).otherwise(thresh),
        )
        .filter(F.substring(F.sha2(F.col(text_col), 256), 1, 4) < F.col("__th"))
        .drop("__keep", "__th")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = 512,
    overlap_chars: int = 64,
) -> DataFrame:
    """Split documents into overlapping character windows — the
    chunking stage in front of an embedding model (RAG indexing,
    similarity search over long documents). Offsets advance by
    chunk_chars - overlap_chars; the final window is allowed to be
    short rather than silently dropping the tail. Pure column
    expressions (sequence → posexplode → substring): map-side only,
    no shuffle, parallelism is the input partitioning — exactly what
    a 100 TB corpus wants from a fan-out transform."""
    if overlap_chars >= chunk_chars:
        raise ValueError("overlap_chars must be smaller than chunk_chars")
    step = chunk_chars - overlap_chars
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length(F.col(text_col)) - 1, F.lit(0)),
        F.lit(step),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_ix", "chunk_start"),
        F.col(text_col),
    ).select(
        id_col,
        "chunk_ix",
        "chunk_start",
        F.substring(
            F.col(text_col), F.col("chunk_start") + 1, chunk_chars
        ).alias("chunk_text"),
    )


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


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    val_fraction_256: int = 13,
) -> DataFrame:
    """Near-dup-aware train/val split: every document follows its
    duplicate-cluster REPRESENTATIVE (minimum-id member) into the
    split, so near-duplicates can never straddle train/val — the
    classic eval-leakage trap that a per-document content-hash split
    (:func:`train_val_split`) cannot close (near-dups hash apart).

    ``pairs`` is the pluggable near-dup tier: exact n-gram-Jaccard
    pairs at test scale, MinHash-LSH / SemDeDup pairs at corpus scale
    — any (id_a, id_b) frame. Documents in no pair are their own
    representative and split exactly as :func:`train_val_split` would.

    Scale shape: connected components over the pairs (log rounds, ids
    only), then two id-keyed joins — the representative lookup ships
    (id, 2-char hash bucket), never document text, and the duplicate-
    cluster side is tiny next to the corpus (AQE broadcasts it).

    Returns (id_col, split) with split ∈ {'train', 'val'}.
    """
    from scratchdata_spark.operators.graph import connected_components

    if val_fraction_256 <= 0:
        threshold = "zz"
    else:
        threshold = format(max(256 - val_fraction_256, 0), "02x")
    comp = connected_components(pairs)  # (id, comp = min member id)
    buckets = df.select(
        F.col(id_col).alias("__rep_id"),
        _hash_bucket(F.col(text_col)).alias("__b"),
    )
    rep = df.select(id_col).join(
        comp, F.col(id_col) == F.col("id"), "left"
    ).select(
        F.col(id_col),
        F.coalesce(F.col("comp"), F.col(id_col)).alias("__rep_id"),
    )
    return rep.join(buckets, "__rep_id").select(
        F.col(id_col),
        F.when(F.col("__b") < F.lit(threshold), "train")
        .otherwise("val")
        .alias("split"),
    )


def mix_corpora(
    sources: list[tuple[str, DataFrame]],
    weights: dict[str, float] | list[float],
    target_tokens: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "mix0",
    token_count_col: str | None = None,
) -> tuple[DataFrame, list[dict]]:
    """Deterministic multi-corpus training mix: each named source
    contributes ``weights``-proportional TOKEN mass, downsample-only
    (no source is upsampled — repetition is an epoch decision, not a
    mixing one).  Returns ``(mix, manifest)`` where the mix carries
    ``(id_col, text_col, source)`` and the manifest records, per
    source, available tokens, the token target, the keep rate, and
    the binding constraint.

    ``target_tokens=None`` sizes the mix to the LARGEST total the
    weights permit without upsampling: total = min_i(avail_i / w_i)
    — the binding source keeps everything, the rest downsample to
    proportion.  An explicit target that would require upsampling
    some source raises instead of silently under-delivering that
    source's share.

    Mechanics per source: one token-sum aggregation (whitespace
    token_count by default; pass ``token_count_col`` naming a
    precomputed per-document count — e.g. ``bpe.bpe_token_counts``'s
    output — when merge-table accuracy matters), then a map-only
    deterministic hash filter
    (sha-prefix, the temperature-resampling grid) at
    ``keep = w_i·total / avail_i``.  Row-level sampling is unbiased
    in tokens (survival is independent of document length), so
    E[kept tokens] = keep·avail; the manifest records expectations,
    and re-runs keep exactly the same documents (seeded hash, no
    RNG).  At 100 TB: one agg + one filter per source, a unionByName
    of pruned (id, text, source) projections — no shuffle beyond the
    per-source token sums."""
    from scratchdata_spark.operators.text import token_count

    names = [n for n, _ in sources]
    if isinstance(weights, dict):
        w = [float(weights[n]) for n in names]
    else:
        w = [float(x) for x in weights]
    if len(w) != len(sources) or any(x <= 0 for x in w):
        raise ValueError("mix_corpora: need one positive weight per source")
    total_w = sum(w)
    w = [x / total_w for x in w]
    tok = (
        F.col(token_count_col)
        if token_count_col
        else token_count(F.col(text_col))
    )
    avail = []
    for _, df in sources:
        row = df.agg(
            F.coalesce(F.sum(tok), F.lit(0)).alias("t")
        ).collect()[0]
        avail.append(int(row["t"]))
    feasible = min(
        (a / wi for a, wi in zip(avail, w) if wi > 0), default=0.0
    )
    if target_tokens is None:
        total = feasible
    else:
        total = float(target_tokens)
        if total > feasible + 1e-9:
            binding = names[
                min(range(len(w)), key=lambda i: avail[i] / w[i])
            ]
            raise ValueError(
                f"mix_corpora: target {target_tokens} needs upsampling of"
                f" source {binding!r} (feasible max ≈ {int(feasible)})"
            )
    parts = []
    manifest = []
    for (name, df), wi, a in zip(sources, w, avail):
        keep = min(1.0, (wi * total / a) if a else 0.0)
        part = df.select(
            F.col(id_col), F.col(text_col), F.lit(name).alias("source")
        )
        if keep < 1.0:
            # the temperature-resampling hex grid: seeded, portable,
            # re-runs keep exactly the same documents.  floor(x+0.5),
            # NOT round(): Python round() is banker's (half-even) and
            # DuckDB's is half-away — floor(+0.5) is the one form both
            # an oracle SQL and this Python compute bit-identically
            th = "%04x" % min(65535, int(keep * 65536 + 0.5))
            part = part.filter(
                F.substring(
                    F.sha2(F.concat(F.lit(seed), F.col(text_col)), 256), 1, 4
                )
                < F.lit(th)
            )
        parts.append(part)
        manifest.append(
            {
                "source": name,
                "weight": wi,
                "available_tokens": a,
                "target_tokens": int(wi * total),
                "keep_rate": round(keep, 6),
                "binding": keep >= 1.0,
            }
        )
    mix = parts[0]
    for p in parts[1:]:
        mix = mix.unionByName(p)
    return mix, manifest
