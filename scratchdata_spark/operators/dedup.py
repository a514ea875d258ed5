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

from scratchdata_spark.operators import ensure_parallelism, triangular_pairs

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
    expressions (transform over a sequence), no UDF.

    ``col`` is let-bound (operators.bind_once): callers pass computed
    expressions (normalize_text of the raw column), and the in-lambda
    ``substr`` would otherwise re-normalize the row once per SHINGLE
    — O(chars²) (the r13 features_col find, same fix)."""
    from scratchdata_spark.operators import bind_once

    def _sh(c):
        n = F.greatest(F.length(c) - (k - 1), F.lit(1))
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n), lambda i: c.substr(i, F.lit(k))
            )
        )

    return bind_once(col, _sh)


def minhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 64,
    k: int = 5,
    portable: bool = False,
) -> DataFrame:
    """(id, ``__sig`` array<long>) of n_hashes minhash values per doc.

    Explode shingles to rows, one xxhash64 per shingle, then a single
    hash-aggregate computing n_hashes seeded mins (two-arg murmur3
    ``hash(h, j)``). The aggregate combines map-side — the shuffle
    carries one 64-long signature per doc, never shingles — and the
    whole path allocates no intermediate arrays (the earlier
    ``array_min(transform(...))×64`` formulation spent its time in
    per-row array churn). Duplicate shingles need no dedup: min() is
    idempotent.

    ``portable=True`` swaps the JVM-private hashes for an
    engine-portable family so an external SQL engine can reproduce the
    signatures bit-for-bit (the oracle tier — same role as
    exact_substring's hashed=False): base hash = the first 12 hex
    chars of md5(shingle) as a 48-bit int (md5 and UTF-8 agree
    everywhere), seeded family = ``(h0·(2j+3) + 1000003·j) mod 2^44``
    — exact in BIGINT on both engines (products < 2^54), uniform
    because h0 already is. Default stays xxhash64+murmur3 (cheaper,
    better mixed) for production use.
    """
    base = df.select(F.col(id_col), normalize_text(F.col(text_col)).alias("__norm"))
    n = F.greatest(F.length("__norm") - (k - 1), F.lit(1))
    ex = base.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n), lambda i: F.col("__norm").substr(i, F.lit(k))
            )
        ).alias("__s"),
    )
    if portable:
        h = ex.select(
            F.col(id_col),
            F.conv(F.substring(F.md5("__s"), 1, 12), 16, 10)
            .cast("long")
            .alias("__h0"),
        )
        aggs = [
            F.min(
                F.pmod(
                    F.col("__h0") * F.lit(2 * j + 3) + F.lit(1000003 * j),
                    F.lit(1 << 44),
                )
            ).alias(f"__m{j}")
            for j in range(n_hashes)
        ]
    else:
        h = ex.select(F.col(id_col), F.xxhash64("__s").alias("__h0"))
        aggs = [
            F.min(F.hash(F.col("__h0"), F.lit(j))).cast("long").alias(f"__m{j}")
            for j in range(n_hashes)
        ]
    sig = h.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col),
        F.array(*[F.col(f"__m{j}") for j in range(n_hashes)]).alias("__sig"),
    )


def minhash_params_for(
    n_docs: int, threshold: float = 0.5, base_rows: int = 4
) -> tuple[int, int]:
    """Corpus-size-aware (n_hashes, bands) keeping the LSH S-curve
    midpoint at ``threshold``.

    Rows-per-band r grows one step per decade beyond ~50k docs —
    random band collisions scale ~N²·J_bgʳ, so raising r is the lever
    that keeps candidate mass bounded as the corpus grows. Bands are
    then pinned to b = ⌈threshold⁻ʳ⌉, which holds the midpoint fixed:
    P(candidate | J=t) = 1−(1−tʳ)^b ≈ 1−e⁻¹ for b = t⁻ʳ, at any r.
    Bigger r ⇒ steeper curve ⇒ better precision at the same recall
    midpoint; the price is signature width n = b·r (linear map-side
    work, no extra shuffle).

    Same auto-scale pattern as the embedding-LSH plane count
    (similarity.py / tools/scale_soak.py: planes = log2(n/60)).
    """
    import math

    r = base_rows + max(0, round(math.log10(max(n_docs, 1) / 50_000)))
    bands = max(2, math.ceil(threshold**-r))
    return bands * r, bands


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    k: int = 5,
    threshold: float = 0.5,
    max_bucket_size: int | None = 256,
    est_margin: float | None = 0.15,
    corpus_size: int | None = None,
    portable: bool = False,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash-LSH + exact verification.

    rows_per_band = n_hashes // bands; two docs land in the same
    bucket iff one full band of their signatures agrees. Candidates
    are verified with exact Jaccard over the shingle sets, so the
    output has no LSH false positives (only false-negative risk,
    controlled by bands/rows and the two scale valves below).

    Scale valves (both standard LSH-pipeline practice; set to None
    for the exhaustive behavior):

    * ``max_bucket_size`` — buckets larger than this are degenerate
      (boilerplate/templated text whose band hashes collide en masse;
      a B-doc bucket emits B²/2 candidate pairs). They are dropped
      before the pair join; true near-dups still meet in their other
      ``bands-1`` buckets.
    * ``est_margin`` — candidates are pre-screened with the minhash
      agreement fraction (an unbiased Jaccard estimator already in
      hand, 64 long comparisons) and must score ≥ threshold −
      est_margin before paying exact set intersection. With 64 hashes
      the estimator σ at J=0.5 is ≈0.06, so a 0.15 margin keeps
      ≳99% recall while cutting verification work by orders of
      magnitude on collision-heavy corpora.

    ``corpus_size`` (document count, when the caller knows it) turns
    on corpus-size-aware banding: (n_hashes, bands) are resolved by
    :func:`minhash_params_for`, which raises rows-per-band one step
    per decade beyond ~50k docs while holding the S-curve midpoint at
    ``threshold`` — bounded random-collision mass at any scale, same
    recall midpoint. Explicit n_hashes/bands apply when it is None.

    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    return _minhash_stages(
        df, id_col, text_col, n_hashes, bands, k, threshold,
        max_bucket_size, est_margin, corpus_size, portable,
    )["pairs"]


def _minhash_stages(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int,
    bands: int,
    k: int,
    threshold: float,
    max_bucket_size: int | None,
    est_margin: float | None,
    corpus_size: int | None,
    portable: bool,
) -> dict:
    """:func:`minhash_lsh_pairs`'s pipeline with each stage exposed —
    ``sig`` (signature build, persisted), ``cand`` (bucket build +
    cap + triangular expansion + estimator screen, persisted) and
    ``pairs`` (exact-Jaccard verify) — the ``_span_removal_stages``
    pattern, so the soak can attribute the 100× wall per stage
    (VERDICT r8 #4: 104.5 s/500k docs was the largest unattributed
    soak block).  Stage walls read CUMULATIVELY: counting ``cand``
    reuses the persisted ``sig``; counting ``pairs`` reuses both."""
    from pyspark import StorageLevel

    if corpus_size is not None:
        n_hashes, bands = minhash_params_for(corpus_size, threshold)
    r = n_hashes // bands
    # Persist the signatures: the DAG references them from five
    # branches (bucket build, hot-bucket count, self-join a/b sides,
    # estimator screen) — without caching Spark recomputes the shingle
    # scan per branch. Cached statistics also let the optimizer see
    # the true (small) size when joining signatures to candidates.
    sig = minhash_signature(
        ensure_parallelism(df.select(id_col, text_col)),
        id_col, text_col, n_hashes, k, portable=portable,
    ).persist(StorageLevel.MEMORY_AND_DISK)

    band_cols = [
        F.struct(
            F.lit(i).alias("band"),
            F.xxhash64(F.slice("__sig", i * r + 1, r).cast("string")).alias("bh"),
        )
        for i in range(bands)
    ]
    # The band self-join carries ONLY (id, band_hash): at corpus scale
    # the ×bands exploded stream must never haul shingle sets through
    # the shuffle (that payload is bands× the corpus itself, and its
    # size is invisible to the optimizer, inviting a catastrophic
    # broadcast of the exploded side).
    buckets = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("b")
    ).select(id_col, F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))

    # Candidate pairs: group each bucket's member ids and expand the
    # in-bucket pairs with array combinatorics — ONE shuffle keyed by
    # (band, bh) instead of a self-join's two, and the bucket-size cap
    # applies before any pair materializes. Equivalent to the classic
    # bucket self-join with a.id < b.id.
    members = buckets.groupBy("band", "bh").agg(
        F.sort_array(F.collect_list(F.col(id_col))).alias("ids")
    )
    if max_bucket_size is not None:
        members = members.filter(F.size("ids") <= max_bucket_size)
    cand = triangular_pairs(
        members.filter(F.size("ids") >= 2), "ids"
    ).dropDuplicates(["id_a", "id_b"])

    # Cheap estimator screen: agreement fraction of the signatures we
    # already computed. No join hints — the cached signature table has
    # known statistics, so the optimizer broadcasts whichever side is
    # genuinely small (locally that's the signatures; on a 100 TB
    # corpus the candidate set is the small side and AQE flips it).
    if est_margin is not None:
        sigs = sig.select(F.col(id_col), F.col("__sig"))
        with_a = cand.join(
            sigs.withColumnRenamed(id_col, "id_a").withColumnRenamed("__sig", "sig_a"),
            "id_a",
        )
        with_b = with_a.join(
            sigs.withColumnRenamed(id_col, "id_b").withColumnRenamed("__sig", "sig_b"),
            "id_b",
        )
        agree = F.size(
            F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda z: z)
        )
        cand = with_b.filter(agree / n_hashes >= threshold - est_margin).select(
            "id_a", "id_b"
        )

    # Exact-Jaccard verification: shingle sets are materialized ONLY
    # for docs that survived the screen (semi-join pruning) — the
    # expensive per-doc shingle arrays scale with the survivor count,
    # not the corpus. Shingles are xxhash64-hashed to longs first:
    # Jaccard over 64-bit shingle hashes equals Jaccard over the
    # strings (collision odds ~2⁻⁶⁴·|set|²) and the intersect compares
    # 8-byte longs instead of 5-char strings. ensure_parallelism here
    # is load-bearing: this branch re-reads the RAW input, and on a
    # single-row-group source the whole shingle build would otherwise
    # run on one core (measured 154 s of a 183 s 10×-soak wall).
    # No broadcast hint on the semi-join: survivors scale with
    # candidate volume (~millions of ids on a duplicate-heavy corpus),
    # so a forced broadcast could exceed executor memory at 100 TB —
    # AQE picks broadcast itself whenever the set is actually small,
    # exactly as the two pair-joins below rely on it to.
    cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
    survivor_ids = (
        cand.select(F.col("id_a").alias(id_col))
        .union(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # shingles() already dedups the strings; distinct strings stay
    # distinct under xxhash64 (w.h.p.), so no second array_distinct
    hashed = F.transform(
        shingles(normalize_text(F.col(text_col)), k), lambda s: F.xxhash64(s)
    )
    # The semi join must sit BELOW the shingle projection in the code:
    # Catalyst's PushDownLeftSemiAntiJoin does NOT move a semi join
    # under a Project in Spark 4.1 (verified with a minimal repro —
    # the r13 captured plan showed Project(__shset) for EVERY doc
    # feeding an Exchange of full shingle arrays before the join).
    # Joining first prunes to survivors, and the join's exchange (when
    # the planner picks SMJ) carries (id, text) instead of the ~8×
    # larger array<long> shingle payload.
    shsets = (
        ensure_parallelism(df.select(id_col, text_col))
        .join(survivor_ids, id_col, "left_semi")
        .select(F.col(id_col), hashed.alias("__shset"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # No join hints here: both inputs are persisted with known (small)
    # statistics, so the planner broadcasts the genuinely smaller side
    # — hinting `half` would build a broadcast of pair×shingle-array
    # rows on the driver, which is the expensive direction.
    half = shsets.withColumnRenamed(id_col, "id_a").withColumnRenamed(
        "__shset", "sh_a"
    ).join(cand, "id_a")
    pairs = shsets.withColumnRenamed(id_col, "id_b").withColumnRenamed(
        "__shset", "sh_b"
    ).join(half, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    verified = (
        pairs.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    # shsets is exposed so stage-attribution callers can unpersist it
    # (it persists inside this pipeline; leaking it would keep a
    # second survivor-shingle cache resident at soak scale)
    return {"sig": sig, "cand": cand, "shsets": shsets, "pairs": verified}


def dedup_against_corpus(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    k: int = 5,
    threshold: float = 0.5,
    max_bucket_size: int | None = 256,
    near: bool = True,
    corpus_size: int | None = None,
) -> DataFrame:
    """Incremental dedup: flag NEW documents that duplicate an
    EXISTING corpus — the production shape (a crawl increment against
    a 100 TB corpus), where re-running all-pairs dedup over
    corpus+increment would redo O(corpus²) work for an
    O(increment×corpus) question.

    Two tiers, sharing the batch operators' machinery:

    * exact — content fingerprints (sha256 of normalized text),
      semi-joined: only digests cross the shuffle, never documents.
    * near — banded MinHash: the increment's band keys join the
      corpus's band index on (band, band-hash). In production the
      corpus index (one (band, hash, id) row set per corpus version)
      is materialized once and reused per increment; degenerate
      corpus buckets are capped like the batch operator. Candidates
      screen on the signature agreement fraction (unbiased Jaccard
      estimator, σ≈0.06 at 64 hashes) ≥ threshold.

    Returns new_df + ``dup_exact`` / ``dup_near`` booleans and
    ``dup_of`` (min matching corpus id — audit evidence; NULL when no
    near match). ``near=False`` runs the exact tier alone (sha256
    fingerprints — every step SQL-expressible, so this path is
    hash-oracle-checkable; the near tier's xxhash64 band index is
    not) and returns new_df + ``dup_exact`` only. ``corpus_size``
    (when the caller knows the standing corpus's document count)
    turns on the same corpus-size-aware banding as the batch
    operator (:func:`minhash_params_for`) — random band-collision
    mass between the increment and a 100 TB corpus is governed by
    the CORPUS size, so rows-per-band must rise with it exactly as
    in the all-pairs case.
    """
    from pyspark import StorageLevel

    if corpus_size is not None:
        n_hashes, bands = minhash_params_for(corpus_size, threshold)
    r = n_hashes // bands
    fp = lambda c: F.sha2(normalize_text(c), 256)  # noqa: E731
    new_fp = new_df.select(F.col(id_col), fp(F.col(text_col)).alias("__fp"))
    corp_fp = corpus_df.select(fp(F.col(text_col)).alias("__fp")).distinct()
    exact = (
        new_fp.join(corp_fp, "__fp", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("dup_exact", F.lit(True))
    )
    if not near:
        return new_df.join(exact, id_col, "left").withColumn(
            "dup_exact", F.coalesce("dup_exact", F.lit(False))
        )

    sig_new = minhash_signature(
        ensure_parallelism(new_df.select(id_col, text_col)),
        id_col, text_col, n_hashes, k,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sig_corp = minhash_signature(
        ensure_parallelism(corpus_df.select(id_col, text_col)),
        id_col, text_col, n_hashes, k,
    ).persist(StorageLevel.MEMORY_AND_DISK)

    def band_rows(sig, out_id):
        band_cols = [
            F.struct(
                F.lit(i).alias("band"),
                F.xxhash64(
                    F.slice("__sig", i * r + 1, r).cast("string")
                ).alias("bh"),
            )
            for i in range(bands)
        ]
        return sig.select(
            F.col(id_col).alias(out_id),
            F.explode(F.array(*band_cols)).alias("b"),
        ).select(out_id, F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))

    nb = band_rows(sig_new, "__nid")
    cb = band_rows(sig_corp, "__cid")
    if max_bucket_size is not None:
        hot = (
            cb.groupBy("band", "bh")
            .count()
            .filter(F.col("count") > max_bucket_size)
            .select("band", "bh")
        )
        cb = cb.join(hot, ["band", "bh"], "left_anti")
    cand = (
        nb.join(cb, ["band", "bh"])
        .select("__nid", "__cid")
        .dropDuplicates(["__nid", "__cid"])
    )
    withs = cand.join(
        sig_new.select(F.col(id_col).alias("__nid"), F.col("__sig").alias("sig_n")),
        "__nid",
    ).join(
        sig_corp.select(F.col(id_col).alias("__cid"), F.col("__sig").alias("sig_c")),
        "__cid",
    )
    agree = F.size(
        F.filter(F.zip_with("sig_n", "sig_c", lambda x, y: x == y), lambda z: z)
    )
    near = (
        withs.filter(agree / n_hashes >= threshold)
        .groupBy("__nid")
        .agg(F.min("__cid").alias("dup_of"))
        .withColumnRenamed("__nid", id_col)
    )
    return (
        new_df.join(exact, id_col, "left")
        .join(near, id_col, "left")
        .withColumn("dup_exact", F.coalesce("dup_exact", F.lit(False)))
        .withColumn("dup_near", F.col("dup_of").isNotNull())
    )


def simhash(
    df: DataFrame,
    text_col: str,
    out_col: str = "simhash",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """64-bit SimHash over whitespace tokens (xxhash64 token hashes).

    Implemented as an explode + 64 conditional sums + bit reassembly —
    one shuffle by document id, everything JVM-side.

    ``key_cols`` — columns that uniquely identify a document.  When
    given, only those columns ride the per-token rows and the
    aggregate shuffle (rows sharing a key merge their token streams);
    when None, every input column is carried and used as the grouping
    key — fine for narrow frames, but at corpus scale pass the id so
    the raw text stays out of the shuffle key.
    """
    keys = list(key_cols) if key_cols is not None else [c for c in df.columns]
    toks = ensure_parallelism(df).select(
        *keys,
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("__tok"),
    ).withColumn("__th", F.xxhash64("__tok"))
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


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
    max_bucket_size: int | None = 4096,
    intra_family: str = "pairs",
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance — the
    fingerprint tier turned into a PAIR operator via Hamming-band LSH
    (the classic pigeonhole construction): split the 64-bit
    fingerprint into ``n_bands`` equal slices; two fingerprints within
    Hamming distance d < n_bands must agree EXACTLY on at least one
    slice, so candidates are generated by ``n_bands`` equi-joins on
    (band, slice-value), then verified with ``bit_count(xor)``.

    Identical fingerprints are collapsed into a FAMILY before banding
    (groupBy on the 8-byte fingerprint), so exact duplicates can never
    be dropped by the hot-bucket cap — a million-doc boilerplate
    family is one band member, and its intra-family pairs (hamming 0)
    are emitted from the family row directly.  ``max_bucket_size``
    therefore caps DISTINCT fingerprints per (band, slice) bucket;
    like the MinHash cap, dropping a hotter-than-cap bucket trades
    recall on near-miss pairs (hamming ≥ 1) whose every band is
    degenerate — exhaustiveness for ``max_hamming ≤ n_bands - 1``
    holds whenever no bucket exceeds the cap, and hamming-0 pairs are
    exhaustive unconditionally.

    Scale shape: the fingerprint aggregate shuffles (id, token-hash)
    rows — never the raw text — the band shuffle carries 8-byte
    fingerprints, and candidate expansion is a grouped collect +
    array combinatorics.  ``intra_family="star"`` emits only
    (representative, member) pairs within an identical-fingerprint
    family — O(N) instead of O(N²) output, spanning-equivalent for
    connected-components clustering.  Returns (id_a, id_b, hamming)
    with id_a < id_b; rows sharing ``id_col`` merge token streams
    into one fingerprint (ids are assumed unique).
    """
    fp = simhash(
        df.select(id_col, text_col), text_col, out_col="__fp",
        key_cols=[id_col],
    )
    return hamming_band_pairs(
        fp, id_col, "__fp", max_hamming, n_bands, max_bucket_size,
        intra_family,
    )


def hamming_band_pairs(
    fp: DataFrame,
    id_col: str,
    fp_col: str = "__fp",
    max_hamming: int = 3,
    n_bands: int = 4,
    max_bucket_size: int | None = 4096,
    intra_family: str = "pairs",
) -> DataFrame:
    """The Hamming-band LSH over ANY (id, 64-bit fingerprint) table —
    extracted from :func:`simhash_pairs` so other fingerprint
    domains (perceptual image hashes — operators/imagehash.py — or
    externally-computed signatures) reuse the identical pigeonhole
    construction, family collapse, hot-bucket cap and verification.
    Semantics and scale shape exactly as documented on
    :func:`simhash_pairs`."""
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs n_bands >= {max_hamming + 1}"
            " for the pigeonhole guarantee"
        )
    if intra_family not in ("pairs", "star"):
        raise ValueError("intra_family must be 'pairs' or 'star'")
    width = 64 // n_bands
    if fp_col != "__fp":
        fp = fp.select(F.col(id_col), F.col(fp_col).alias("__fp"))
    from pyspark import StorageLevel

    fam = (
        fp.groupBy("__fp")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("ids"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if intra_family == "pairs":
        # per-anchor expansion: an exact-dup family has NO size cap
        # (by design — collapsing it is what makes the bucket cap
        # safe), so its pair row must never be single-row quadratic
        intra = triangular_pairs(
            fam.filter(F.size("ids") >= 2), "ids"
        ).withColumn("hamming", F.lit(0).cast("int"))
    else:  # star: representative -> member spanning edges (O(N) row
        # output, one member per generated row)
        intra_expr = (
            "transform(slice(ids, 2, size(ids)),"
            " y -> struct(ids[0] AS id_a, y AS id_b))"
        )
        intra = (
            fam.filter(F.size("ids") >= 2)
            .select(F.explode(F.expr(intra_expr)).alias("p"))
            .select("p.id_a", "p.id_b", F.lit(0).cast("int").alias("hamming"))
        )
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.expr(
                f"(__fp >> {b * width}) & {(1 << width) - 1}"
            ).alias("bv"),
        )
        for b in range(n_bands)
    ]
    buckets = fam.select(
        F.col("__fp"), F.explode(F.array(*band_cols)).alias("b")
    ).select("__fp", F.col("b.band").alias("band"), F.col("b.bv").alias("bv"))
    if max_bucket_size is not None:
        hot = (
            buckets.groupBy("band", "bv")
            .count()
            .filter(F.col("count") > max_bucket_size)
            .select("band", "bv")
        )
        buckets = buckets.join(hot, ["band", "bv"], "left_anti")
    members = buckets.groupBy("band", "bv").agg(
        F.sort_array(F.collect_list("__fp")).alias("fps")
    )
    cand = (
        triangular_pairs(
            members.filter(F.size("fps") >= 2), "fps", "fp_a", "fp_b"
        )
        .dropDuplicates(["fp_a", "fp_b"])  # fp pairs can share >1 band
        .withColumn("hamming", F.expr("bit_count(fp_a ^ fp_b)").cast("int"))
        .filter(F.col("hamming") <= max_hamming)
    )
    cross = (
        cand.join(
            fam.select(F.col("__fp").alias("fp_a"), F.col("ids").alias("ids_a")),
            "fp_a",
        )
        .join(
            fam.select(F.col("__fp").alias("fp_b"), F.col("ids").alias("ids_b")),
            "fp_b",
        )
        # rectangular family × family expansion, one explode per
        # side: per-row bounded at max(|ids_a|, |ids_b|) instead of
        # the full |a|×|b| struct array in one row
        .select(F.explode("ids_a").alias("__xa"), "ids_b", "hamming")
        .select("__xa", F.explode("ids_b").alias("__xb"), "hamming")
        .select(
            F.least("__xa", "__xb").alias("id_a"),
            F.greatest("__xa", "__xb").alias("id_b"),
            "hamming",
        )
    )
    return intra.unionByName(cross)


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
        ensure_parallelism(df.select(id_col, text_col))
        .select(F.col(id_col), F.explode(shingles(normalize_text(F.col(text_col)), k)).alias("s"))
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


def duplicate_ngram_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 20,
    min_count: int = 2,
    cross_doc_only: bool = False,
    hashed: bool = True,
) -> DataFrame:
    """Exact-substring duplication metrics per document — the
    token-level counterpart of document dedup (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499: verbatim spans repeated across a corpus are
    memorization fuel even when no two whole documents match).

    Every ``ngram``-token sliding window is keyed (window text, or
    ``xxhash64`` of it when ``hashed`` — constant-width shuffle keys
    at scale; the unhashed form exists so the DuckDB oracle can
    reproduce the grouping), windows whose key occurs ``min_count``+
    times corpus-wide (``cross_doc_only`` additionally requires 2+
    distinct docs) are duplicate spans, and each document reports:

    ``n_tokens``, ``dup_windows`` (flagged window starts),
    ``dup_tokens`` (DISTINCT token positions covered by any flagged
    window — overlapping windows don't double-count), and
    ``dup_fraction = dup_tokens / n_tokens`` (round 6). Filter or
    trim the high-fraction tail downstream.

    Scale shape: window extraction is MAP-ONLY array combinatorics
    (transform over a sequence, one Generate); the key count is one
    partial-agg shuffle; flagged positions join back ids-only; the
    coverage count explodes ≤ ngram rows per FLAGGED window only.
    Documents shorter than ``ngram`` tokens report zero duplication
    by construction.
    """
    words = F.split(normalize_text(F.col(text_col)), " ")
    base = ensure_parallelism(
        df.select(F.col(id_col).alias("__id"), words.alias("__w"))
    ).withColumn("__n_tokens", F.size("__w"))
    wins = (
        base.filter(F.col("__n_tokens") >= ngram)
        .select(
            "__id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(__w) - {ngram}),"
                    f" i -> array_join(slice(__w, i + 1, {ngram}), ' '))"
                )
            ).alias("__pos", "__g"),
        )
    )
    if hashed:
        wins = wins.withColumn("__g", F.xxhash64("__g"))
    # count_distinct forces a pre-agg on (__g, __id) — near the raw
    # window count in shuffle bytes — so only pay it when the
    # cross-doc predicate actually reads it.
    if cross_doc_only:
        counts = wins.groupBy("__g").agg(
            F.count("*").alias("__c"),
            F.count_distinct("__id").alias("__d"),
        )
        dup_keys = counts.filter(
            (F.col("__d") >= 2) & (F.col("__c") >= min_count)
        ).select("__g")
    else:
        counts = wins.groupBy("__g").agg(F.count("*").alias("__c"))
        dup_keys = counts.filter(F.col("__c") >= min_count).select("__g")
    flagged = wins.join(dup_keys, "__g").select("__id", "__pos")
    cov = (
        flagged.select(
            "__id",
            F.explode(
                F.expr(f"sequence(__pos, __pos + {ngram} - 1)")
            ).alias("__t"),
        )
        .groupBy("__id")
        .agg(F.count_distinct("__t").alias("__dup_tokens"))
    )
    nwin = flagged.groupBy("__id").agg(F.count("*").alias("__dup_windows"))
    return (
        base.select("__id", "__n_tokens")
        .join(nwin, "__id", "left")
        .join(cov, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.col("__n_tokens").cast("int").alias("n_tokens"),
            F.coalesce("__dup_windows", F.lit(0)).cast("int")
            .alias("dup_windows"),
            F.coalesce("__dup_tokens", F.lit(0)).cast("int")
            .alias("dup_tokens"),
            F.round(
                F.coalesce("__dup_tokens", F.lit(0))
                / F.col("__n_tokens"), 6
            ).alias("dup_fraction"),
        )
    )


def source_ngram_overlap(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    ngram: int = 8,
    hashed: bool = True,
) -> DataFrame:
    """Cross-source contamination matrix: for every pair of sources,
    how many distinct word ``ngram``-grams they share and the Jaccard
    fraction — the corpus diagnostic run before training-mix assembly
    (a benchmark split that shares verbatim spans with a web crawl is
    leaked, not held out; cf. the reference's query-over-stored-corpus
    role, pkg/api/query.go, which this extends with pipeline
    analytics the reference does not attempt).

    Output: (source_a, source_b, shared_ngrams, n_a, n_b, jaccard)
    with source_a < source_b; source pairs sharing nothing are absent.
    ``jaccard`` is the raw IEEE quotient (no rounding: int/int
    division is bit-identical on every engine, while ROUND can split
    half-ties — see dup_token_fraction).

    Scale shape (100 TB): n-gram extraction is map-only array
    combinatorics; the distinct (source, gram) dedup is the one big
    shuffle, on a constant-width xxhash64 key when ``hashed`` (the
    unhashed form exists for the DuckDB oracle).  The per-gram source
    set is bounded by the SOURCE CARDINALITY (collect_set, never a
    gram self-join), so pair expansion via ``triangular_pairs`` is
    tiny, and the matrix itself is |sources|² rows at most.
    """
    words = F.split(normalize_text(F.col(text_col)), " ")
    base = ensure_parallelism(
        df.select(F.col(source_col).alias("__s"), words.alias("__w"))
    )
    grams = base.filter(F.size("__w") >= ngram).select(
        "__s",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(__w) - {ngram}),"
                f" i -> array_join(slice(__w, i + 1, {ngram}), ' '))"
            )
        ).alias("__g"),
    )
    if hashed:
        grams = grams.withColumn("__g", F.xxhash64("__g"))
    grams = grams.dropDuplicates(["__s", "__g"])
    sizes = grams.groupBy("__s").agg(F.count("*").alias("__n"))
    sets = (
        grams.groupBy("__g")
        .agg(F.sort_array(F.collect_set("__s")).alias("__ss"))
        .filter(F.size("__ss") >= 2)
    )
    shared = (
        triangular_pairs(sets, "__ss", "source_a", "source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("shared_ngrams"))
    )
    na = sizes.select(F.col("__s").alias("source_a"), F.col("__n").alias("n_a"))
    nb = sizes.select(F.col("__s").alias("source_b"), F.col("__n").alias("n_b"))
    return (
        shared.join(na, "source_a")
        .join(nb, "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_ngrams",
            "n_a",
            "n_b",
            (
                F.col("shared_ngrams")
                / (F.col("n_a") + F.col("n_b") - F.col("shared_ngrams"))
            ).alias("jaccard"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 20,
    min_count: int = 2,
    hashed: bool = True,
) -> DataFrame:
    """Exact-substring DEDUPLICATION — the removal action behind
    :func:`duplicate_ngram_stats`'s metrics (Lee et al.
    arXiv:2107.06499 §4.2 dedups the corpus by deleting all but one
    occurrence of every repeated span; the stats operator only
    measures them).

    Every ``ngram``-token window whose key repeats ``min_count``+
    times corpus-wide elects ONE canonical occurrence — the smallest
    ``(doc, position)`` pair, deterministic under any partitioning —
    and a token position is removed iff it is covered by some
    NON-canonical duplicated window and NOT covered by any canonical
    one (so the kept copy survives verbatim). Adjacent intra-document
    repetition collapses to its first copy by the same rule —
    bridging windows straddling two copies are unique, so only the
    true repeats vote.  The canonical-coverage protection is
    one-sided: a non-canonical occurrence whose tokens all sit under
    canonical occurrences of OTHER keys is retained too (protection
    beats deletion wherever the two overlap), so heavily-overlapping
    duplicate span families may keep more than one copy — the
    conservative direction for training data; byte-exact single-copy
    semantics need Lee et al.'s suffix-interval merge, which is not
    a fixed-width-window operator.  Rows with a NULL id pass through
    unexamined (their windows can neither vote nor be rewritten
    addressably — a NULL id would otherwise win every struct-min
    election and void the comparisons against it).

    Output: ``(id, text, n_tokens, n_tokens_removed)`` where ``text``
    is rebuilt from the KEPT tokens of the normalized form
    (lowercased, whitespace-collapsed — the canonical hashing form,
    and what a tokenizer consumes anyway; byte-exact original
    reconstruction would need original offsets, which normalization
    discards by design). Docs shorter than ``ngram`` tokens pass
    through untouched (normalized).

    Scale shape mirrors the stats operator, minimized to one
    aggregation per logical step: map-only window extraction; ONE
    shuffle computing count + keeper election together (min-struct in
    the same groupBy); flagged windows are then RE-CLUSTERED BY
    DOCUMENT (one exchange of flagged-window rows, explicit partition
    count so AQE's tiny-map-side coalesce can't serialize the fan-out)
    BEFORE coverage explodes ≤ ngram positions per window — so the
    coverage aggregation, the protection filter (``max(canon)``), and
    the per-doc drop-set collection all run id-clustered with ZERO
    further exchanges (hashpartitioning(__id) satisfies the
    (__id, __t) clustering).  The round-6 shape exploded first and
    aggregated after the key-partitioned join, shuffling ngram× the
    flagged-window count in (id, position) rows — ~194M rows at the
    100× soak, the attributed superlinear wall; the re-cluster cuts
    that exchange by the ngram factor.  The rebuild attaches each
    doc's drop-set (bounded by its own token count) by id and
    reconstructs map-side via ``array_except`` over positions —
    O(tokens) per doc.  Until the attach, every shuffle is
    ids/keys-only; the attach itself joins the (typically far
    smaller, already id-partitioned) drop-set side against the token
    arrays, so AQE broadcasts it and text stays map-side — in the
    worst case (most docs carry drops) the text pays ONE
    hash-partitioned exchange, still linear.  Keys: the stats operator
    tolerates a 64-bit hash collision (one miscounted metric row);
    a MUTATION must not (a collision would delete real text), so
    ``hashed=True`` here keys on a 128-bit composite of two
    independently-seeded xxhash64s — still constant-width, collision
    odds ~n²/2¹²⁹; ``hashed=False`` keeps the window string itself
    so an external SQL engine can reproduce the grouping.
    """
    return _span_removal_stages(
        df, id_col, text_col, ngram, min_count, hashed
    )["out"]


def _span_removal_stages(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int,
    min_count: int,
    hashed: bool,
) -> dict[str, DataFrame]:
    """The :func:`remove_duplicate_spans` pipeline with each stage
    exposed — the soak harness times stages individually (keys /
    drops / rebuild) so a scaling regression is attributable to a
    stage, not just "the removal got slower" (VERDICT r6 #1)."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    base = ensure_parallelism(
        df.select(F.col(id_col).alias("__id"), words.alias("__w"))
    )
    wins = (
        base.filter(F.col("__id").isNotNull() & (F.size("__w") >= ngram))
        .select(
            "__id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(__w) - {ngram}),"
                    f" i -> array_join(slice(__w, i + 1, {ngram}), ' '))"
                )
            ).alias("__pos", "__g"),
        )
    )
    if hashed:
        wins = wins.withColumn(
            "__g", F.struct(F.xxhash64("__g"), F.xxhash64(F.lit(1), "__g"))
        )
    keys = (
        wins.groupBy("__g")
        .agg(
            F.count("*").alias("__c"),
            F.min(F.struct("__id", "__pos")).alias("__k"),
        )
        .filter(F.col("__c") >= min_count)
        .select("__g", "__k")
    )
    marked = wins.join(keys, "__g").withColumn(
        "__is_canon",
        (F.col("__k.__id") == F.col("__id"))
        & (F.col("__k.__pos") == F.col("__pos")),
    )
    # Re-cluster flagged windows by DOCUMENT before the ×ngram
    # coverage explode: this exchange carries one skinny row per
    # flagged window; everything after it (coverage agg, protection
    # filter, drop-set collect, and the drop side of the attach) is
    # id-clustered and exchange-free.  Explicit partition count:
    # the map side is skinny but explodes ×ngram downstream — AQE
    # would coalesce it to a handful of partitions and grind the
    # fan-out there (the stats operator's AQE-blindspot lesson).
    shuffle_n = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    clustered = marked.select("__id", "__pos", "__is_canon").repartition(
        shuffle_n, "__id"
    )
    drops = (
        clustered.select(
            "__id",
            "__is_canon",
            F.explode(
                F.expr(f"sequence(__pos, __pos + {ngram} - 1)")
            ).alias("__t"),
        )
        .groupBy("__id", "__t")
        .agg(F.max("__is_canon").alias("__protected"))
        .filter(~F.col("__protected"))
        .groupBy("__id")
        .agg(F.collect_set(F.col("__t").cast("int")).alias("__drop"))
    )
    out = base.join(drops, "__id", "left").withColumn(
        "__drop", F.coalesce("__drop", F.array().cast("array<int>"))
    )
    out = out.select(
        F.col("__id").alias(id_col),
        F.expr(
            "array_join(transform("
            "array_except(sequence(0, size(__w) - 1), __drop),"
            " i -> element_at(__w, i + 1)), ' ')"
        ).alias(text_col),
        F.size("__w").cast("int").alias("n_tokens"),
        F.size("__drop").cast("int").alias("n_tokens_removed"),
    )
    return {
        "base": base,
        "wins": wins,
        "keys": keys,
        "marked": marked,
        "drops": drops,
        "out": out,
    }


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    sep: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-wide paragraph-level dedup — the CCNet preprocessing
    step (Wenzek et al. 2019, arXiv:1911.00359): a paragraph whose
    normalized content appears anywhere else in the corpus survives
    only at its canonical occurrence (smallest ``(id, position)``,
    the exact_dedup min-id election applied per paragraph); every
    other copy is removed from its document.  Sits between doc-level
    ``exact_dedup`` and span-level ``remove_duplicate_spans`` in
    granularity — the standard cheap kill for boilerplate that
    repeats across pages (navigation, disclaimers, footers) without
    the n-gram machinery.

    Scale shape (the remove_duplicate_spans drop-set pattern):

    * paragraph fingerprints are sha256 of the normalized text —
      CONSTANT-WIDTH keys, so the election aggregation and the
      decision join shuffle 32-byte digests + (id, pos) ints, never
      paragraph text;
    * the drop set groups to ``(id, array<pos>)`` — one compact row
      per affected document (AQE broadcasts it when duplication is
      rare; worst case one doc-level exchange, the same contract as
      the span remover);
    * reconstruction is pure column algebra map-side: re-split the
      original text and keep positions outside the drop array
      (two-argument higher-order ``filter`` — no exploded text ever
      crosses an exchange).

    Paragraphs shorter than ``min_chars`` after normalization (blank
    lines, stray separators) are never treated as duplicates — they
    are layout, and collapsing every blank line corpus-wide would
    rewrite documents that share no content.  Returns the input
    columns with ``text_col`` rebuilt plus ``paragraphs_removed``.
    NULL text passes through untouched (0 removed).

    ``sep`` is a LITERAL separator string (quoted for the split, used
    verbatim for the rejoin — passing a regex here would corrupt the
    rebuilt text, r10 review catch).
    """
    if "\\E" in sep:
        raise ValueError("dedup_paragraphs: separator cannot contain \\E")
    arr = F.split(F.col(text_col), r"\Q" + sep + r"\E")
    paras = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(arr).alias("__pos", "__p"),
    ).select(
        "__id",
        "__pos",
        F.sha2(normalize_text(F.col("__p")), 256).alias("__fp"),
        F.length(normalize_text(F.col("__p"))).alias("__len"),
    ).filter(F.col("__len") >= min_chars)
    canon = paras.groupBy("__fp").agg(
        F.min(F.struct("__id", "__pos")).alias("__c"),
        F.count(F.lit(1)).alias("__n"),
    )
    drops = (
        paras.join(canon, "__fp")
        .filter(
            (F.col("__n") > 1)
            & (F.struct("__id", "__pos") != F.col("__c"))
        )
        .groupBy("__id")
        .agg(F.sort_array(F.collect_list("__pos")).alias("__drop"))
    )
    keep_cols = [c for c in df.columns if c != text_col]
    rebuilt = F.array_join(
        F.filter(arr, lambda _, i: ~F.array_contains("__drop", i)), sep
    )
    out = df.join(
        drops, df[id_col] == drops["__id"], "left"
    ).select(
        *[df[c] for c in keep_cols],
        F.when(F.col("__drop").isNull(), F.col(text_col))
        .otherwise(rebuilt)
        .alias(text_col),
        F.coalesce(F.size("__drop"), F.lit(0)).alias("paragraphs_removed"),
    )
    return out
