"""Hashed n-gram data selection: model-based quality filtering and
DSIR importance resampling.

Two training-data pipeline components the reference has no analog for
(SURVEY.md §2 — beyond-parity), both built on one shared feature map:
word unigrams + bigrams hashed into a fixed bucket space, the public
fastText trick (Joulin et al. 2016, arXiv:1607.01759).

* **Quality classifier** — the CCNet/GPT-3-style "model-based quality
  filter": a logistic regression over hashed n-gram counts separates
  reference prose from junk, and documents score by the learned
  weights.  Scale shape is the BPE sample-fit pattern exactly: Spark
  does the corpus-scale work (tokenize → hash → count, one shuffle),
  the driver runs the tiny deterministic optimization over a BOUNDED
  sample of sparse feature rows, and scoring is a broadcast join +
  one aggregation — no Python in the scoring plan.
* **DSIR** — data selection via importance resampling (Xie et al.
  2023, arXiv:2302.03169): hashed n-gram distributions of a small
  target corpus and the raw corpus give every raw document a log
  importance weight  Σ_b c_b·(log p̂_target(b) − log p̂_raw(b)) with
  Laplace smoothing; the top-weighted documents are selected.  Both
  distributions are ≤ ``buckets`` rows, so everything after the one
  feature shuffle per corpus is broadcast-sized.

Engine-portability: with ``portable=True`` the bucket hash is the
repo's md5-prefix family (dedup.py's minhash-oracle idiom) which an
external SQL engine reproduces bit-for-bit, so both operators run
under the DuckDB hash gate end to end; the default is xxhash64
(JVM-side, faster, no SQL twin).  The Python twins (``py_features`` /
``py_bucket``) mirror the portable path exactly — the classifier's
driver-side trainer featurizes with them, and the fixture entry
asserts Spark-extracted features equal Python-extracted ones.

100 TB notes: feature extraction is one explode + one partial-agg
shuffle per corpus (map-side combine collapses repeats before the
exchange); distributions and weight tables are bounded by ``buckets``
(driver/broadcast traffic is O(buckets), never O(corpus)); training
collects only ``sample_rows`` sparse rows behind an explicit valve;
selection is a TakeOrdered top-k, not a global sort.
"""

from __future__ import annotations

import hashlib
import math
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scratchdata_spark.operators import bind_once, ensure_parallelism

# One tokenizer, three engines.  ASCII-only word characters: the
# split pattern is identical bytes in Java, Python and DuckDB regex
# dialects, and lower() only has to agree on characters that can
# enter [a-z0-9] (standard Unicode simple case folding — all three
# engines agree there).
_TOKEN_SPLIT = r"[^a-z0-9]+"
_PY_SPLIT = re.compile(_TOKEN_SPLIT)

MAX_TRAIN_SAMPLE = 1_000_000  # sparse feature rows, not documents
# score_quality's array (streaming) tier carries a DENSE bucket→weight
# array as a plan literal; past this bucket count the literal bloats
# every task's plan and codegen
ARRAY_TIER_MAX_BUCKETS = 8192


def words_col(col: Column) -> Column:
    """Lowercased word array, empties dropped."""
    return F.filter(
        F.split(F.lower(col), _TOKEN_SPLIT), lambda w: w != F.lit("")
    )


def features_col(col: Column) -> Column:
    """Unigrams + space-joined bigrams, one array (fastText's word
    n-gram feature set with n=2).

    The word array is LET-BOUND (operators.bind_once) so the
    split+filter runs once per row: the bigram lambda's two
    ``element_at`` reads per element would otherwise re-evaluate the
    whole tokenize per bigram — O(tokens²) (r13 measurement on the
    hash pipeline: 0.81 s → 0.27 s at sf0.1)."""

    def _feats(w: Column) -> Column:
        bigrams = F.when(
            F.size(w) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(w) - 2),
                lambda i: F.concat_ws(" ", F.element_at(w, i + 1),
                                      F.element_at(w, i + 2)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.concat(w, bigrams)

    return bind_once(words_col(col), _feats)


def feature_hash_col(feat: Column, portable: bool) -> Column:
    """Feature → signed 64-bit hash.  Portable = the md5-prefix 48-bit
    family every oracle-checked hash in this repo uses (dedup.py:105);
    default = xxhash64 (JVM-side, no SQL twin).  Modulus-independent:
    the same hash serves any bucket count (the Arrow gate tier's
    shared-hash trick)."""
    if portable:
        return F.conv(F.substring(F.md5(feat), 1, 12), 16, 10).cast("long")
    return F.xxhash64(feat)


def bucket_col(feat: Column, buckets: int, portable: bool) -> Column:
    """Feature → bucket id: :func:`feature_hash_col` mod buckets."""
    return F.pmod(feature_hash_col(feat, portable), F.lit(buckets))


def feature_hashes_col(col: Column, portable: bool) -> Column:
    """Per-document feature-hash array (unigrams + bigrams, hashed) —
    the JVM-side half of the Arrow gate tier: tokenization and
    hashing stay in the plan (exact parity with bucket_col /
    hashed_features for BOTH hash families), only the weight gather
    moves to numpy."""
    return F.transform(
        features_col(col), lambda f: feature_hash_col(f, portable)
    )


def hashed_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    buckets: int,
    portable: bool = False,
) -> DataFrame:
    """(id, bucket, cnt) sparse feature counts — ONE shuffle (the
    groupBy; partial aggregation collapses repeated buckets map-side
    before the exchange).  Documents with no tokens contribute no
    rows; callers that must score them left-join back to the ids."""
    # Fan the projected (id, text) input out to the cluster's
    # parallelism before the explode: tokenize→md5-hash→bucket is the
    # compute-heavy stage of both selection operators, and a
    # single-row-group parquet scan (or any narrow upstream layout)
    # would otherwise run it on ONE core regardless of cluster width
    # (r13 measurement: x_quality_classifier 10.8 s single-task vs
    # 1.3 s fanned at sf0.1/32 cores).  At real scale the input has
    # more partitions than cores and this is a no-op; when it fires,
    # the shuffle moves only the two projected columns.
    ex = ensure_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode(features_col(F.col(text_col))).alias("__f"),
    )
    return (
        ex.select(
            F.col(id_col),
            bucket_col(F.col("__f"), buckets, portable).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ------------------------------------------------------- Python twins


def py_words(text: str) -> list[str]:
    return [w for w in _PY_SPLIT.split(text.lower()) if w]


def py_features(text: str) -> list[str]:
    w = py_words(text)
    return w + [f"{a} {b}" for a, b in zip(w, w[1:])]


def py_bucket(feat: str, buckets: int) -> int:
    return int(hashlib.md5(feat.encode("utf-8")).hexdigest()[:12], 16) % buckets


def py_feature_counts(text: str, buckets: int) -> dict[int, int]:
    out: dict[int, int] = {}
    for f in py_features(text):
        b = py_bucket(f, buckets)
        out[b] = out.get(b, 0) + 1
    return out


# -------------------------------------------------- quality classifier


def train_logreg(
    rows: list[tuple[dict[int, int], int]],
    *,
    buckets: int,
    iters: int = 200,
    lr: float = 0.5,
    l2: float = 1e-3,
) -> tuple[dict[int, float], float]:
    """Deterministic full-batch logistic regression over sparse
    L1-normalized hashed-count rows: zero init, fixed iterations, no
    randomness — two runs (or a Spark-extracted and a Python-extracted
    feature matrix) produce bit-identical weights.  Driver cost is
    O(iters · nnz); the corpus never comes here."""
    import numpy as np

    touched = sorted({b for feats, _ in rows for b in feats})
    idx = {b: i for i, b in enumerate(touched)}
    n, d = len(rows), len(touched)
    x = np.zeros((n, d))
    y = np.zeros(n)
    for r, (feats, label) in enumerate(rows):
        total = sum(feats.values())
        if total:
            for b, c in feats.items():
                x[r, idx[b]] = c / total
        y[r] = label
    w = np.zeros(d)
    bias = 0.0
    for _ in range(iters):
        z = x @ w + bias
        p = 1.0 / (1.0 + np.exp(-z))
        g = x.T @ (p - y) / n + l2 * w
        gb = float(np.sum(p - y) / n)
        w -= lr * g
        bias -= lr * gb
    return {b: float(w[idx[b]]) for b in touched}, float(bias)


def train_quality_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    *,
    buckets: int = 4096,
    portable: bool = False,
    sample_rows: int = MAX_TRAIN_SAMPLE,
    iters: int = 200,
    lr: float = 0.5,
    l2: float = 1e-3,
) -> tuple[dict[int, float], float]:
    """Fit on Spark-extracted features: the corpus-scale work
    (tokenize/hash/count) runs distributed, then a BOUNDED sample of
    sparse (id, bucket, cnt) rows + labels comes to the driver for the
    tiny optimization (the bpe_train split of labor).  The valve is on
    feature ROWS — the driver allocation — and raises rather than
    silently truncate."""
    feats = hashed_features(
        df, id_col, text_col, buckets=buckets, portable=portable
    )
    labels = df.select(F.col(id_col), F.col(label_col).alias("__y"))
    # LEFT join from labels so token-free documents (which emit no
    # feature rows) still reach the optimizer as zero vectors — a
    # zero row contributes nothing to the weight gradient but still
    # moves the bias, exactly as a Python-side train_logreg over the
    # same labeled rows would (r10 advisor catch: an inner join
    # silently dropped their labels, breaking the bit-parity
    # contract for corpora containing empty docs).
    rows = (
        labels.join(feats, id_col, "left")
        .select(id_col, "bucket", "cnt", "__y")
        .limit(sample_rows + 1)
        .collect()
    )
    if len(rows) > sample_rows:
        raise ValueError(
            f"selection: training sample exceeds {sample_rows} feature rows;"
            " pre-sample the corpus or raise sample_rows explicitly"
        )
    by_doc: dict = {}
    for r in rows:
        feats_d, label = by_doc.setdefault(r[0], ({}, int(r[3])))
        if r[1] is not None:
            feats_d[int(r[1])] = int(r[2])
    ordered = [by_doc[k] for k in sorted(by_doc)]
    return train_logreg(
        ordered, buckets=buckets, iters=iters, lr=lr, l2=l2
    )


def _no_tokens(bkts: Column) -> Column:
    """Token-free guard shared by the in-plan tiers: under legacy /
    ANSI-off configs ``size(NULL)`` is -1, not NULL, so the test is
    ``<= 0`` — an ``== 0`` guard let NULL-text rows score NULL instead
    of the token-free constant (r10 third review catch, empirically
    confirmed under spark.sql.ansi.enabled=false)."""
    return F.coalesce(F.size(bkts), F.lit(0)) <= 0


def _dense_dot_expr(
    table: dict[int, float],
    default: float,
    text_col: str,
    *,
    buckets: int,
    portable: bool,
    streaming: bool,
    what: str,
) -> tuple[Column, Column]:
    """The in-plan (streaming-legal) dot product shared by the
    classifier's array tier and the DSIR gate: features → buckets →
    aggregate-HOF sum over a dense bucket-indexed literal (O(1)
    ``element_at``).  Returns ``(buckets_array, dot)``.  One copy of
    the guard/plumbing — the ANSI-off NULL bug had to be fixed in two
    places before this helper existed (r10 third review catch)."""
    if buckets > ARRAY_TIER_MAX_BUCKETS:
        hint = (
            "reduce buckets (streaming input cannot use the join tier)"
            if streaming
            else "use the join/batch path"
        )
        raise ValueError(
            f"{what}: in-plan tier needs buckets <="
            f" {ARRAY_TIER_MAX_BUCKETS}; {hint}"
        )
    # ONE ArrayType literal node, not `buckets` separate literals:
    # F.array(*lits) put 1-8k expression nodes in the plan, and a
    # STREAMING query re-plans every micro-batch — measured 3.7x
    # slower analyze+run at 2048 buckets (r12 admission-stream soak
    # catch; batch plans pay the same analysis cost once)
    dense = F.lit([float(table.get(b, default)) for b in range(buckets)])
    bkts = F.transform(
        features_col(F.col(text_col)),
        lambda f: bucket_col(f, buckets, portable),
    )
    dot = F.aggregate(
        bkts,
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(dense, (b + 1).cast("int")),
    )
    return bkts, dot


def quality_prob_expr(
    weights: dict[int, float],
    bias: float,
    text_col: str,
    *,
    buckets: int,
    portable: bool = False,
    round_to: int = 6,
) -> Column:
    """The classifier's gate-online form (r12): per-document quality
    probability as ONE column expression — the exact array tier
    ``score_quality`` dispatches to, exposed as an expression so a
    STREAMING admission chain can apply the trained model with zero
    shuffles and zero state (the ``dsir_score_expr`` shape).  Fit
    offline with :func:`train_quality_classifier`, gate online with
    this."""
    sig0 = round(1.0 / (1.0 + math.exp(-bias)), round_to)
    bkts, dot = _dense_dot_expr(
        weights, 0.0, text_col,
        buckets=buckets, portable=portable,
        streaming=True, what="quality_prob_expr",
    )
    z = F.lit(bias) + dot / F.size(bkts)
    return F.when(_no_tokens(bkts), F.lit(sig0)).otherwise(
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), round_to)
    )


def score_quality(
    df: DataFrame,
    weights: dict[int, float],
    bias: float,
    *,
    id_col: str,
    text_col: str,
    buckets: int,
    portable: bool = False,
    round_to: int = 6,
    plan: str = "auto",
) -> DataFrame:
    """Score every document: sigmoid(bias + Σ w_b·c_b / Σ c_b),
    rounded so the value survives engine-order float noise (the
    minhash-jaccard convention).  Token-free documents score
    sigmoid(bias) (zero feature vector).  No Python in either plan.

    Two tiers (the embedding-LSH dispatch lesson, re-learned with
    measurements here):

    * ``'join'`` — one feature shuffle + a broadcast join against the
      weight table + one aggregation + a left-join back.  The BATCH
      tier: explode/groupBy/join all run in whole-stage codegen, and
      at the 100× soak (500k docs) it holds 40.4 s where both in-plan
      variants lose (create_map-literal 65.6 s — linear-scan lookups;
      dense-array-literal 69.4 s — higher-order functions evaluate
      INTERPRETED, so zero-shuffle does not mean fast).
    * ``'array'`` — the weight table rides the plan as a dense
      bucket-indexed array literal and the whole score is ONE column
      expression (features → buckets → aggregate-HOF dot product,
      O(1) ``element_at`` lookups): zero shuffles and zero state, so
      it is legal on a STREAMING DataFrame in plain append mode —
      the crawl-time quality gate — and fine for small interactive
      batches.  Needs ``buckets`` ≤ ``ARRAY_TIER_MAX_BUCKETS``.
    * ``'arrow'`` — :func:`admission_scores_arrow_pass` on a
      :func:`feature_hashes_col` array: tokenize+hash stay in the
      plan (exact hash parity with the other tiers), the weight
      gather runs as one numpy indexing op per document inside a
      map-only ``mapInPandas`` — zero shuffles, weights closure-borne
      (needs ``buckets`` ≤ ``ARRAY_TIER_MAX_BUCKETS``).  r13
      measurement at sf0.1 (5k docs, fresh plans): join tier 1.36 s,
      arrow 1.01 s — the join tier's exchange + double aggregation +
      join-back cost more than the Arrow boundary here.  The join
      tier remains the dispatch for big weight tables, where a
      closure array would bloat every task.
    * ``'auto'`` (default): streaming input → ``'array'`` (the join
      tier's blocking aggregation cannot run in append mode);
      batch → ``'arrow'`` when the weight table fits the closure
      cap, ``'join'`` otherwise.

    Contract note: ids are expected unique (one row per document).
    On duplicate ids the tiers legitimately differ — the join tier's
    groupBy scores each id on the UNION of its rows' features, the
    array/arrow tiers score each ROW independently.
    """
    if plan not in ("auto", "array", "join", "arrow"):
        raise ValueError(
            "score_quality: plan must be 'auto'|'array'|'join'|'arrow'"
        )
    if plan == "auto":
        if df.isStreaming:
            plan = "array"
        else:
            plan = "arrow" if buckets <= ARRAY_TIER_MAX_BUCKETS else "join"
    if plan == "arrow":
        if buckets > ARRAY_TIER_MAX_BUCKETS:
            raise ValueError(
                f"score_quality: plan='arrow' needs buckets <="
                f" {ARRAY_TIER_MAX_BUCKETS}"
            )
        hashed = ensure_parallelism(df.select(id_col, text_col)).select(
            F.col(id_col),
            feature_hashes_col(F.col(text_col), portable).alias("__qh"),
        )
        return admission_scores_arrow_pass(
            hashed, "__qh", weights=weights, bias=bias,
            qc_buckets=buckets, round_to=round_to,
        ).select(F.col(id_col), "quality_prob")
    sig0 = round(1.0 / (1.0 + math.exp(-bias)), round_to)
    if plan == "array":
        prob = quality_prob_expr(
            weights, bias, text_col,
            buckets=buckets, portable=portable, round_to=round_to,
        )
        return df.select(F.col(id_col), prob.alias("quality_prob"))
    spark = df.sparkSession
    feats = hashed_features(
        df, id_col, text_col, buckets=buckets, portable=portable
    )
    wdf = spark.createDataFrame(
        [(int(b), float(w)) for b, w in sorted(weights.items())],
        "bucket long, w double",
    )
    per_doc = (
        feats.join(F.broadcast(wdf), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("__total"),
            F.sum(F.col("cnt") * F.coalesce(F.col("w"), F.lit(0.0))).alias(
                "__dot"
            ),
        )
    )
    z = F.lit(bias) + F.col("__dot") / F.col("__total")
    scored = per_doc.select(
        F.col(id_col),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), round_to).alias(
            "quality_prob"
        ),
    )
    base = df.select(id_col)
    return base.join(scored, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("quality_prob"), F.lit(sig0)).alias("quality_prob"),
    )


# ---------------------------------------------------------------- DSIR


def _bucket_dists(fr: DataFrame, ft: DataFrame) -> DataFrame:
    """Raw/target bucket distributions from feature frames — ONE copy
    of the groupBy + full-join + coalesce that dsir_logweights and
    dsir_logratio_table previously each built (r10 third review
    catch: the smoothing inputs must not be able to drift apart; the
    2e-6 table-vs-batch test is the drift canary for the formula
    itself, which lives once in Spark expressions and once in driver
    math by necessity)."""
    rdist = fr.groupBy("bucket").agg(F.sum("cnt").alias("rc"))
    tdist = ft.groupBy("bucket").agg(F.sum("cnt").alias("tc"))
    return rdist.join(tdist, "bucket", "full").select(
        "bucket",
        F.coalesce("rc", F.lit(0)).alias("rc"),
        F.coalesce("tc", F.lit(0)).alias("tc"),
    )


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    *,
    buckets: int = 8192,
    alpha: float = 1.0,
    portable: bool = False,
    round_to: int = 6,
    persist: bool = True,
) -> DataFrame:
    """Per-document DSIR log importance weight
    Σ_b c_b·(ln p̂_t(b) − ln p̂_r(b)) with add-``alpha`` smoothing over
    the ``buckets``-dim hashed n-gram space.  Distributions are one
    bounded agg each (≤ buckets rows → broadcast); per-document
    weights are one aggregation over the raw feature rows.  Token-free
    documents weight 0.

    The raw feature relation feeds BOTH the distribution and the
    per-document aggregation; ``persist=True`` (default, the lm.py
    convention) caches it MEMORY_AND_DISK so the corpus tokenizes
    once, not twice — at 100 TB the second tokenization pass is the
    whole job.  The handle is not unpersisted here (the result is
    lazy); long-lived sessions doing one-shot scoring can pass
    ``persist=False``."""
    fr = hashed_features(
        raw, id_col, text_col, buckets=buckets, portable=portable
    )
    if persist:
        from pyspark import StorageLevel

        fr = fr.persist(StorageLevel.MEMORY_AND_DISK)
    ft = hashed_features(
        target, id_col, text_col, buckets=buckets, portable=portable
    )
    dists = _bucket_dists(fr, ft)
    totals = dists.agg(
        F.sum("rc").alias("rt"), F.sum("tc").alias("tt")
    )
    a, b = F.lit(float(alpha)), F.lit(float(alpha * buckets))
    ratios = dists.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("tc") + a) / (F.col("tt") + b))
            - F.log((F.col("rc") + a) / (F.col("rt") + b))
        ).alias("logratio"),
    )
    per_doc = (
        fr.join(F.broadcast(ratios), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.col("cnt") * F.col("logratio")), round_to
            ).alias("dsir_logweight")
        )
    )
    return raw.select(id_col).join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce("dsir_logweight", F.lit(0.0)).alias("dsir_logweight"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int,
    buckets: int = 8192,
    alpha: float = 1.0,
    portable: bool = False,
    persist: bool = True,
) -> DataFrame:
    """Top-``k`` raw documents by DSIR weight.  Deterministic across
    engines: ordering is on the ROUNDED weight with an ``id`` tiebreak
    (two engines disagreeing in the last ulp round to the same value,
    and equal values select identically).  TakeOrdered top-k — no
    global sort materializes."""
    w = dsir_logweights(
        raw, target, id_col, text_col,
        buckets=buckets, alpha=alpha, portable=portable, persist=persist,
    )
    return w.orderBy(F.desc("dsir_logweight"), F.col(id_col)).limit(k)


def dsir_logratio_table(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    *,
    buckets: int = 8192,
    alpha: float = 1.0,
    portable: bool = False,
) -> tuple[dict[int, float], float]:
    """Fit the DSIR per-bucket log importance ratios and bring them to
    the driver — the offline half of a fit-offline / gate-online
    pipeline (CCNet's shape).  Returns ``(table, default)``: the
    ≤ ``buckets``-entry ratio dict plus the all-smoothing ratio
    ln((α/(Tt+αB)) / (α/(Tr+αB))) for buckets absent from both
    corpora.  The collect is bounded by ``buckets`` rows (two bounded
    aggs + one ≤ buckets-row result), never by corpus size."""
    fr = hashed_features(
        raw.select(F.lit(0).alias("__one"), F.col(text_col)),
        "__one", text_col, buckets=buckets, portable=portable,
    )
    ft = hashed_features(
        target.select(F.lit(0).alias("__one"), F.col(text_col)),
        "__one", text_col, buckets=buckets, portable=portable,
    )
    rows = _bucket_dists(fr, ft).collect()  # ≤ buckets rows
    rt = sum(r["rc"] for r in rows)
    tt = sum(r["tc"] for r in rows)
    b = float(alpha * buckets)
    return {
        int(r["bucket"]): math.log((r["tc"] + alpha) / (tt + b))
        - math.log((r["rc"] + alpha) / (rt + b))
        for r in rows
    }, math.log(alpha / (tt + b)) - math.log(alpha / (rt + b))


def dsir_score_expr(
    table: dict[int, float],
    default: float,
    text_col: str,
    *,
    buckets: int,
    portable: bool = False,
    round_to: int = 6,
) -> Column:
    """The online half: per-document DSIR log weight as ONE column
    expression over a dense bucket-indexed ratio literal — zero
    shuffles, zero state, legal on a streaming DataFrame in append
    mode (the score_quality array tier applied to DSIR).  Use the
    batch path (dsir_logweights) for corpus-scale scoring — HOFs
    evaluate interpreted (the measured score_quality lesson)."""
    bkts, logw = _dense_dot_expr(
        table, default, text_col,
        buckets=buckets, portable=portable,
        streaming=True, what="dsir_score_expr",
    )
    return F.when(_no_tokens(bkts), F.lit(0.0)).otherwise(
        F.round(logw, round_to)
    )


# ------------------------------------------- Arrow gate tier (r13)


def _round_half_up(x: float, nd: int) -> float:
    """Spark's round(double, n) is HALF_UP (away from zero) where
    Python's round is half-even — the Arrow tier must round exactly
    like the expression tier or the two disagree on 5-boundary
    values."""
    m = 10.0 ** nd
    return math.copysign(math.floor(abs(x) * m + 0.5) / m, x)


def admission_scores_arrow_pass(
    df: DataFrame,
    hashes_col: str,
    *,
    weights: dict[int, float] | None = None,
    bias: float = 0.0,
    qc_buckets: int = 4096,
    dsir_table: dict[int, float] | None = None,
    dsir_default: float = 0.0,
    dsir_buckets: int = 8192,
    round_to: int = 6,
) -> DataFrame:
    """The Arrow LUT tier for the trained admission gates (r13,
    VERDICT r12 #3): ONE ``mapInPandas`` pass computes the enabled
    gate scores from a :func:`feature_hashes_col` array column —
    closure-borne numpy weight vectors (the Bloom/PQ LUT pattern),
    one ``vec[h % buckets].sum()`` gather per row.  Consumes
    ``hashes_col`` and appends ``quality_prob`` and/or
    ``dsir_logweight``.

    vs the expression tier (quality_prob_expr / dsir_score_expr): the
    dense array-literal HOF evaluates INTERPRETED per token — the r12
    10x admission-stream soak attributed ~2/3 of the steady-state
    wall to the two gate expressions (classifier ~20.6 s, DSIR
    ~41.6 s) — where this tier keeps tokenize+hash in the plan (one
    HOF producing the hash array, no dense-literal lookups) and does
    the gather vectorized.  Both gates share ONE hash array: the
    hash is modulus-independent, so the tier also tokenizes once
    where the expression tier tokenizes per gate.  A map-only pass —
    zero shuffles, zero state, append-mode stream-legal — evaluated
    exactly once by construction (a struct-returning pandas_udf was
    measured duplicating into two ArrowEvalPython nodes under
    projection collapse; mapInPandas cannot be duplicated).

    Exact-parity contract with the expression tier (pinned by
    tests/test_admission_gate_tiers.py): same tokenizer and hash
    (JVM-side), HALF_UP rounding, python-round sigmoid(bias) for the
    token-free constant, 0.0 token-free DSIR weight, z clamped to
    ±745 where Spark's exp saturates to inf."""
    import numpy as np

    from pyspark.sql.types import DoubleType, StructField, StructType

    if weights is None and dsir_table is None:
        raise ValueError(
            "admission_scores_arrow_pass: at least one gate"
            " (weights / dsir_table) is required"
        )
    out_fields = [f for f in df.schema.fields if f.name != hashes_col]
    wvec = sig0 = rvec = None
    if weights is not None:
        if qc_buckets > ARRAY_TIER_MAX_BUCKETS:
            raise ValueError(
                f"admission_scores_arrow_pass: qc_buckets <="
                f" {ARRAY_TIER_MAX_BUCKETS}"
            )
        # keys outside [0, buckets) are DROPPED, exactly like the
        # expression tier's dense literal (range(buckets) lookup) —
        # wrapping them by modulus aliased foreign weights in (r13
        # parity-test catch)
        wvec = np.zeros(qc_buckets, dtype=np.float64)
        for b, w in weights.items():
            if 0 <= int(b) < qc_buckets:
                wvec[int(b)] = float(w)
        # python round, NOT half-up: quality_prob_expr computes its
        # token-free constant driver-side with python round
        sig0 = round(1.0 / (1.0 + math.exp(-bias)), round_to)
        out_fields.append(StructField("quality_prob", DoubleType()))
    if dsir_table is not None:
        if dsir_buckets > ARRAY_TIER_MAX_BUCKETS:
            raise ValueError(
                f"admission_scores_arrow_pass: dsir_buckets <="
                f" {ARRAY_TIER_MAX_BUCKETS}"
            )
        rvec = np.full(dsir_buckets, float(dsir_default), dtype=np.float64)
        for b, w in dsir_table.items():
            if 0 <= int(b) < dsir_buckets:
                rvec[int(b)] = float(w)
        out_fields.append(StructField("dsir_logweight", DoubleType()))
    schema = StructType(out_fields)
    _bias, _qcb, _dsb, _rt = float(bias), qc_buckets, dsir_buckets, round_to

    def score_batches(batches):
        for pdf in batches:
            hs = pdf[hashes_col]
            n = len(pdf)
            qp = np.empty(n, dtype=np.float64) if wvec is not None else None
            lw = np.empty(n, dtype=np.float64) if rvec is not None else None
            for i, h in enumerate(hs):
                arr = None if h is None else np.asarray(h, dtype=np.int64)
                if arr is None or arr.size == 0:
                    # token-free / NULL text: the expression tier's
                    # _no_tokens constants
                    if qp is not None:
                        qp[i] = sig0
                    if lw is not None:
                        lw[i] = 0.0
                    continue
                if qp is not None:
                    # numpy % matches pmod: sign follows the divisor
                    z = _bias + wvec[arr % _qcb].sum() / arr.size
                    z = min(max(z, -745.0), 745.0)
                    qp[i] = _round_half_up(1.0 / (1.0 + math.exp(-z)), _rt)
                if lw is not None:
                    lw[i] = _round_half_up(rvec[arr % _dsb].sum(), _rt)
            out = pdf.drop(columns=[hashes_col])
            if qp is not None:
                out["quality_prob"] = qp
            if lw is not None:
                out["dsir_logweight"] = lw
            yield out

    return df.mapInPandas(score_batches, schema)
