"""Driver-facing streaming queries: each runs a real Structured
Streaming job (file source over the testdata parquet, availableNow
trigger, memory sink) and returns the drained result as a batch
DataFrame, so the DuckDB oracle can hash-compare streaming output
against batch SQL semantics.

Why this is a fair correctness gate and not a rerun of the batch
engine: the events table is staged as ≥3 time-ordered files consumed
one per trigger (maxFilesPerTrigger=1), so every query executes
MULTIPLE micro-batches and its state — window partials, session
merges, per-user counters, dedup keys, join buffers — must carry and
merge across batch boundaries before the final snapshot can equal the
batch SQL oracle. The reference has no stream processing at all
(SURVEY §2 "Streaming-only operators: none") — this is capability
headroom, graded against exact SQL oracles anyway.

Scale notes: the same topology on a cluster swaps the memory sink for
a Delta/parquet sink; complete mode is only for bounded-cardinality
results (windows × types), session/stateful state is partitioned by
key across executors and bounded by watermark/timeout eviction.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from scratchdata_spark.inventory import OSUM, load, q

_SEQ = itertools.count()

# Staged multi-batch source schema: ts normalized to epoch MICROS long
# by the staging step (load() handles whatever physical type the
# testdata generator used — TIMESTAMP(NANOS)-as-long or timestamp[us]).
_EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # micros
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

_GAP_US = 30 * 60 * 1_000_000  # 30 min session gap

_N_BATCH_FILES = 3
_STAGE_CACHE: dict[str, str] = {}


def _staged_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage events.parquet as ≥3 time-ordered parquet files so every
    streaming query runs MULTIPLE micro-batches (maxFilesPerTrigger=1):
    windows, session merge, stateful totals, dedup, and stream-stream
    joins must then merge state ACROSS batches instead of degenerating
    to single-batch batch-equality. Files are sliced on ts tertiles and
    given ascending mtimes so the file source replays them in event-time
    order — the realistic arrival pattern a watermark relies on."""
    cached = _STAGE_CACHE.get(sf_dir)
    if cached is not None and os.path.isdir(cached):
        return cached
    import shutil
    import tempfile

    ev = load(spark, sf_dir)["events"]  # ts already epoch-micros long
    cuts = ev.selectExpr(
        "percentile(ts, array(CAST(1/3 AS DOUBLE), CAST(2/3 AS DOUBLE))) AS c"
    ).first()["c"]
    bounds = [None, int(cuts[0]), int(cuts[1]), None]
    stage = tempfile.mkdtemp(prefix="sd-events-batches-")
    base_mtime = os.path.getmtime(f"{sf_dir}/events.parquet")
    for i in range(_N_BATCH_FILES):
        sl = ev
        if bounds[i] is not None:
            sl = sl.filter(F.col("ts") >= bounds[i])
        if bounds[i + 1] is not None:
            sl = sl.filter(F.col("ts") < bounds[i + 1])
        tmp = os.path.join(stage, f"_slice{i}")
        sl.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            p for p in os.listdir(tmp)
            if p.startswith("part-") and p.endswith(".parquet")
        )
        dst = os.path.join(stage, f"{i:03d}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (base_mtime + i, base_mtime + i))
    _STAGE_CACHE[sf_dir] = stage
    return stage


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the staged multi-batch events files with
    a proper event-time column (UTC session; epoch-aligned windows are
    tz-independent). One file per trigger → ≥3 micro-batches."""
    stage = _staged_events_dir(spark, sf_dir)
    raw = (
        spark.readStream.schema(_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(stage)
    )
    return raw.withColumn("ts_us", F.col("ts")).withColumn(
        "etime", F.timestamp_micros(F.col("ts_us"))
    )


def _drain(df: DataFrame, mode: str) -> DataFrame:
    """Run a streaming DataFrame to a memory sink until all available
    input is consumed; return the sink table as a batch DataFrame."""
    name = f"sdq_stream_{next(_SEQ)}"
    query = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        # processAllAvailable is deterministic for availableNow and
        # also covers stateful queries, which stay alive after the
        # data drains (pending processing-time timeouts).
        query.processAllAvailable()
    finally:
        query.stop()
        query.awaitTermination()
    return df.sparkSession.table(name)


@q(
    "s_stream_tumbling_hour",
    f"""
    SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
           event_type,
           COUNT(*) AS n,
           {OSUM('value', 'total_value')}
    FROM events
    GROUP BY 1, 2
    """,
)
def s_stream_tumbling_hour(spark, sf_dir):
    """Streaming tumbling-window aggregation (1 h × event_type),
    complete mode: the final snapshot equals the batch group-by —
    hash-checked against DuckDB date_trunc buckets."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("etime", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_micros("w.start").alias("window_start_us"),
            "event_type",
            "n",
            "total_value",
        )
    )
    return _drain(agg, "complete")


@q(
    "s_stream_sliding_2h_1h",
    f"""
    WITH c AS (
      SELECT unnest([date_trunc('hour', ts),
                     date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
             value
      FROM events
    )
    SELECT epoch_us(ws) AS window_start_us,
           COUNT(*) AS n,
           {OSUM('value', 'total_value')}
    FROM c GROUP BY 1
    """,
)
def s_stream_sliding_2h_1h(spark, sf_dir):
    """Streaming sliding windows (2 h width, 1 h slide), complete
    mode; each event lands in exactly two epoch-aligned windows, which
    the oracle reproduces by unnesting both candidate starts."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("etime", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.unix_micros("w.start").alias("window_start_us"), "n", "total_value")
    )
    return _drain(agg, "complete")


@q(
    "s_stream_session_windows",
    f"""
    WITH o AS (
      SELECT user_id, epoch_us(ts) AS ts_us, value,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
      FROM events
    ),
    m AS (
      SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us >= {_GAP_US}
                     THEN 1 ELSE 0 END AS brk
      FROM o
    ),
    g AS (
      SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM m
    )
    SELECT user_id,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) + {_GAP_US} AS session_end_us,
           COUNT(*) AS n_events,
           {OSUM('value', 'session_value')}
    FROM g GROUP BY user_id, sid
    """,
)
def s_stream_session_windows(spark, sf_dir):
    """Streaming gap-based session windows (30 min inactivity) per
    user. Spark merges events whose [ts, ts+gap) windows overlap, so a
    session breaks when the inter-event gap is >= 30 min and ends at
    last_ts + gap — exactly the classic islands-and-gaps SQL, which is
    the oracle. Complete mode's final snapshot holds every merged
    session (update mode is unsupported for session windows)."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("etime", "365 days")
        .groupBy(F.session_window("etime", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
            "session_value",
        )
    )
    return _drain(agg, "complete")


@q(
    "s_stream_stateful_user_totals",
    f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           {OSUM('value', 'total_value')},
           MAX(epoch_us(ts)) AS last_ts_us
    FROM events GROUP BY user_id
    """,
)
def s_stream_stateful_user_totals(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState) accumulating
    per-user counters. Values are pre-scaled to integer cents so the
    Python-side accumulation is exact and order-independent — the
    emitted snapshot hash-matches the decimal-sum oracle."""
    from scratchdata_spark.streaming.stateful import user_session_stream

    ev = _events_stream(spark, sf_dir).select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").cast("double").alias("value"),
        "ts_us",
    )
    out = user_session_stream(ev, timeout_ms=None)
    snap = _drain(out, "update")
    # Update mode emits one cumulative snapshot per (batch, active key);
    # the key's FINAL state is the emission with the highest n_events
    # (strictly increasing whenever the key sees data), so max_by picks
    # it without assuming values are non-negative.
    return (
        snap.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            (F.max_by("total_value", "n_events") / 100.0).alias("total_value"),
            F.max("last_ts_us").alias("last_ts_us"),
        )
        .select("user_id", "n_events", "total_value", "last_ts_us")
    )


@q(
    "s_stream_dedup",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def s_stream_dedup(spark, sf_dir):
    """Streaming deduplication: dropDuplicatesWithinWatermark keeps
    one row per (user_id, event_type) with per-key state evicted once
    the watermark passes the key's last-seen time — the unbounded-state
    fix for streams that repeat keys forever. Projected to the key
    columns, every survivor is identical, so the batch oracle is a
    plain DISTINCT regardless of which arrival won."""
    ev = _events_stream(spark, sf_dir)
    deduped = (
        ev.withWatermark("etime", "365 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return _drain(deduped, "append")


@q(
    "s_stream_stream_join",
    """
    SELECT a.user_id,
           epoch_us(a.ts) AS purchase_ts_us,
           epoch_us(b.ts) AS click_ts_us,
           a.value AS purchase_value
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts BETWEEN a.ts AND a.ts + INTERVAL 1 HOUR
    WHERE a.event_type = 'purchase' AND b.event_type = 'click'
    """,
)
def s_stream_stream_join(spark, sf_dir):
    """Stream-stream inner join (purchase ⋈ click within 1 h, same
    user). Both sides carry watermarks and the join predicate bounds
    event time on each side, so Spark can size the join state and
    evict it as the watermark advances — the required shape for an
    unbounded stream-stream join. Final output equals the batch
    interval join, which is the oracle."""
    ev = _events_stream(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("etime").alias("p_time"),
            F.col("ts_us").alias("purchase_ts_us"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("p_time", "365 days")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("etime").alias("c_time"),
            F.col("ts_us").alias("click_ts_us"),
        )
        .withWatermark("c_time", "365 days")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_time") >= F.col("p_time"))
        & (F.col("c_time") <= F.col("p_time") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_ts_us",
        "click_ts_us",
        "purchase_value",
    )
    return _drain(joined, "append")


@q(
    "s_rollup_continuous_hourly",
    """
    SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
           event_type,
           COUNT(*) AS n,
           SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def s_rollup_continuous_hourly(spark, sf_dir):
    """Continuous rollup (hypertable-style): a streaming job maintains
    hourly per-type partials append-only; the merged view equals the
    batch hourly aggregate — integer-cents partials make the merge
    order-exact, so this hash-matches the oracle."""
    import tempfile

    from scratchdata_spark.streaming.rollup import (
        rollup_result,
        start_rollup_stream,
    )

    ev = _events_stream(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="sd-rollup-")
    q_ = start_rollup_stream(
        ev,
        "etime",
        ["event_type"],
        "value",
        os.path.join(tmp, "rollup"),
        os.path.join(tmp, "ckpt"),
        window="1 hour",
    )
    q_.awaitTermination()
    return rollup_result(spark, os.path.join(tmp, "rollup"), ["event_type"])


# Oracle: identical semantics to x_semantic_incremental's SQL
# (inventory_extras.py) — the stream is the SAME incremental probe,
# just arriving as micro-batches; batching cannot change any row's
# (cluster_id, dup_of) because each new vector is scored against the
# persisted corpus index independently.
_SEM_COS = (
    "list_sum(list_transform(range(1, 65),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)
_SEM_STREAM_K = 4


@q(
    "s_semantic_stream",
    f"""
    WITH corpus AS (
      SELECT vec_id, embedding,
             sqrt({_SEM_COS.format(a='embedding', b='embedding')}) AS n
      FROM embeddings WHERE vec_id % 5 <> 0
    ),
    newv AS (
      SELECT vec_id, embedding,
             sqrt({_SEM_COS.format(a='embedding', b='embedding')}) AS n
      FROM embeddings WHERE vec_id % 5 = 0
    ),
    cents AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS ci,
             embedding AS cvec,
             sqrt({_SEM_COS.format(a='embedding', b='embedding')}) AS cn
      FROM (SELECT * FROM corpus ORDER BY vec_id LIMIT {_SEM_STREAM_K})
    ),
    casg AS (
      SELECT vec_id, embedding, n, ci AS cluster_id FROM (
        SELECT c0.*, c.ci, ROW_NUMBER() OVER (
                 PARTITION BY c0.vec_id
                 ORDER BY {_SEM_COS.format(a='c0.embedding', b='c.cvec')}
                          / (c0.n * c.cn) DESC, c.ci
               ) AS rn
        FROM corpus c0 CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    nasg AS (
      SELECT vec_id, embedding, n, ci AS cluster_id FROM (
        SELECT n0.*, c.ci, ROW_NUMBER() OVER (
                 PARTITION BY n0.vec_id
                 ORDER BY {_SEM_COS.format(a='n0.embedding', b='c.cvec')}
                          / (n0.n * c.cn) DESC, c.ci
               ) AS rn
        FROM newv n0 CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    hits AS (
      SELECT nv.vec_id AS nid, MIN(cv.vec_id) AS dup_of
      FROM nasg nv JOIN casg cv ON nv.cluster_id = cv.cluster_id
      WHERE {_SEM_COS.format(a='nv.embedding', b='cv.embedding')}
            / (nv.n * cv.n) >= 0.4
      GROUP BY nv.vec_id
    )
    SELECT nv.vec_id, nv.cluster_id, h.dup_of
    FROM nasg nv LEFT JOIN hits h ON h.nid = nv.vec_id
    """,
)
def s_semantic_stream(spark, sf_dir):
    """Streaming SemDeDup under the hash gate (streaming/semantic.py):
    every 5th embedding arrives as a STREAM in 3 vec_id-sliced files
    (maxFilesPerTrigger=1 → 3 real micro-batches probing one persisted
    corpus index), the rest is the standing corpus.  Fixed centroids
    (the corpus's 4 lowest-id vectors, zero Lloyd's iterations) keep
    both assignments pure argmax-cosine, so the streamed union is
    exactly the batch-incremental SQL — the same oracle shape as
    x_semantic_incremental, now proven across micro-batch boundaries
    with an exactly-once checkpoint."""
    import shutil
    import tempfile

    from scratchdata_spark.operators.semantic import kmeans_fit
    from scratchdata_spark.streaming.semantic import (
        start_semantic_dedup_stream,
    )

    e = load(spark, sf_dir)["embeddings"]
    corpus = e.filter(F.col("vec_id") % 5 != 0).select("vec_id", "embedding")
    new = e.filter(F.col("vec_id") % 5 == 0).select("vec_id", "embedding")
    cents = kmeans_fit(
        corpus, "embedding", k=_SEM_STREAM_K, max_iter=0, id_col="vec_id"
    )

    base = tempfile.mkdtemp(prefix="sd-semstream-")
    src = os.path.join(base, "src")
    os.makedirs(src)
    cuts = new.selectExpr(
        "percentile(vec_id,"
        " array(CAST(1/3 AS DOUBLE), CAST(2/3 AS DOUBLE))) AS c"
    ).first()["c"]
    bounds = [None, int(cuts[0]), int(cuts[1]), None]
    now = None
    for i in range(3):
        part = new
        if bounds[i] is not None:
            part = part.filter(F.col("vec_id") > bounds[i])
        if bounds[i + 1] is not None:
            part = part.filter(F.col("vec_id") <= bounds[i + 1])
        stage = os.path.join(base, f"stage{i}")
        part.coalesce(1).write.mode("overwrite").parquet(stage)
        for f in os.listdir(stage):
            if f.endswith(".parquet"):
                dst = os.path.join(src, f"inc{i}.parquet")
                os.rename(os.path.join(stage, f), dst)
                if now is None:
                    now = os.path.getmtime(dst)
                os.utime(dst, (now + i, now + i))  # arrival order

    q_, unpersist = start_semantic_dedup_stream(
        spark, src, corpus,
        os.path.join(base, "out"), os.path.join(base, "ckpt"),
        threshold=0.4, max_cluster_compare=None,
        max_files_per_trigger=1, centroids=cents,
    )
    q_.awaitTermination()
    unpersist()
    got = (
        spark.read.parquet(os.path.join(base, "out"))
        .select(
            "vec_id", F.col("cluster_id").cast("long").alias("cluster_id"),
            "dup_of",
        )
    )
    # materialize before dropping the temp dirs — the returned frame
    # must not depend on files we are about to delete (result is
    # |new| rows, bounded at the driver by construction)
    rows = got.collect()
    out_df = spark.createDataFrame(rows, got.schema)
    shutil.rmtree(base, ignore_errors=True)
    return out_df


# ------------------------------------------------------------------
# Streaming pre-training admission chain (streaming/admission.py):
# the stream-legal tier of x_crawl_chain, hash-gated streamed-vs-
# batch.  Values below are measured fixture margins (sf-independent):
# the classifier gate reuses the batch chain's 0.51 (model-junk
# 0.475661 vs everything else >= 0.533303) and the DSIR threshold
# -153.4 sits >= 1.0 inside the two neighboring weight levels
# (-154.482698 below, -152.403257 above — exact Laplace arithmetic,
# not float luck).  The husk (j=15, newsletter-only) legitimately
# SURVIVES this tier: killing it needs corpus-wide paragraph dedup,
# which is batch-only by construction — the boundary this entry pins.
_SCHAIN_DSIR_MIN = -153.4


def _schain_oracle_sql() -> str:
    """DuckDB twin of the STREAMED admission chain.  Survivor
    enumeration up to the classifier gate is construction arithmetic
    (per-record stages keep base/utm/mirror/husk pages and drop
    robots-disallowed, blocked-host, heuristic-junk and model-junk
    pages — margins above); the DSIR gate stage is RECOMPUTED from
    scratch over the reconstructed corpus (the x_crawl_chain oracle
    shape), so the one distribution-dependent stage is verified by
    recomputation, not assumption."""
    from scratchdata_spark.inventory_extras import (
        _CHAIN_ARCHIVES,
        _CHAIN_DSIR_BUCKETS,
        _CHAIN_NEWS,
        _CHAIN_PROSE_HEAD,
        _CHAIN_PROSE_TAIL,
        _features_sql,
        _md5_bucket_sql,
    )

    b = _CHAIN_DSIR_BUCKETS
    prose = (
        f"concat('{_CHAIN_PROSE_HEAD}',"
        " substr(md5(concat(CAST(i AS VARCHAR), ':',"
        " CAST({j} AS VARCHAR))), 1, 6),"
        f" '{_CHAIN_PROSE_TAIL}', chr(10), '{_CHAIN_NEWS}')"
    )
    return f"""
    WITH corpus AS (
      -- base pages j IN (0,6,7,8)
      SELECT CAST(i * 100 + j AS BIGINT) AS doc_id,
             concat('https://h', CAST(i AS VARCHAR), '.example/art/',
                    CAST(j AS VARCHAR)) AS target_uri,
             {prose.format(j='j')} AS text
      FROM range({_CHAIN_ARCHIVES}) t(i), (VALUES (0),(6),(7),(8)) v(j)
      UNION ALL
      -- utm re-fetches j IN (1,9) of page j-1 (no url dedup per-record)
      SELECT CAST(i * 100 + j AS BIGINT),
             concat('https://h', CAST(i AS VARCHAR), '.example/art/',
                    CAST(j - 1 AS VARCHAR), '?utm_source=x'),
             {prose.format(j='j - 1')}
      FROM range({_CHAIN_ARCHIVES}) t(i), (VALUES (1),(9)) v(j)
      UNION ALL
      -- exact mirrors j IN (2,10) of page j-2 (no text dedup per-record)
      SELECT CAST(i * 100 + j AS BIGINT),
             concat('https://m', CAST(i AS VARCHAR), '.example/art/',
                    CAST(j - 2 AS VARCHAR)),
             {prose.format(j='j - 2')}
      FROM range({_CHAIN_ARCHIVES}) t(i), (VALUES (2),(10)) v(j)
      UNION ALL
      -- newsletter-only husks j = 15 (paragraph dedup is batch-only)
      SELECT CAST(i * 100 + 15 AS BIGINT),
             concat('https://h', CAST(i AS VARCHAR), '.example/news/15'),
             '{_CHAIN_NEWS}'
      FROM range({_CHAIN_ARCHIVES}) t(i)
    ),
    tgt AS (
      SELECT concat('{_CHAIN_PROSE_HEAD}',
                    substr(md5(concat('0:', CAST(j AS VARCHAR))), 1, 6),
                    '{_CHAIN_PROSE_TAIL}') AS text
      FROM (VALUES (0), (6), (7), (8)) v(j)
    ),
    rf AS ({_features_sql("corpus")}),
    tf AS ({_features_sql("tgt", with_id=False)}),
    rcnt AS (
      SELECT doc_id, {_md5_bucket_sql("f", b)} AS bucket, COUNT(*) AS cnt
      FROM rf GROUP BY 1, 2
    ),
    rdist AS (SELECT bucket, SUM(cnt) AS rc FROM rcnt GROUP BY 1),
    tdist AS (
      SELECT {_md5_bucket_sql("f", b)} AS bucket, COUNT(*) AS tc
      FROM tf GROUP BY 1
    ),
    tots AS (
      SELECT (SELECT SUM(rc) FROM rdist) AS rt,
             (SELECT SUM(tc) FROM tdist) AS tt
    ),
    ratios AS (
      SELECT COALESCE(r.bucket, t.bucket) AS bucket,
             ln((COALESCE(t.tc, 0) + 1.0) / (tots.tt + {float(b)!r}))
             - ln((COALESCE(r.rc, 0) + 1.0) / (tots.rt + {float(b)!r}))
               AS logratio
      FROM rdist r FULL JOIN tdist t ON r.bucket = t.bucket, tots
    ),
    perdoc AS (
      SELECT c.doc_id, ROUND(SUM(c.cnt * ra.logratio), 6) AS w
      FROM rcnt c JOIN ratios ra ON ra.bucket = c.bucket
      GROUP BY c.doc_id
    )
    SELECT c.doc_id, c.target_uri, c.text
    FROM corpus c JOIN perdoc p ON p.doc_id = c.doc_id
    WHERE p.w >= {_SCHAIN_DSIR_MIN!r}
    """


@q("s_crawl_stream", _schain_oracle_sql())
def s_crawl_stream(spark, sf_dir):
    """The streaming admission chain under the hash gate: the three
    fixture archives arrive as 3 micro-batches (maxFilesPerTrigger=1)
    through ONE Structured Streaming query running parse → robots
    (closure tier, rules fit offline) → blocked-hosts → boilerplate →
    heuristic quality → trained-classifier gate (quality_prob_expr,
    zero-shuffle) → DSIR gate (dsir_score_expr over an offline-fit
    log-ratio table), checkpointed exactly-once; the streamed union
    of admitted micro-batches must equal the batch enumeration +
    recomputed DSIR stage in DuckDB.  Stage boundaries are where this
    repo's composition bugs have lived (VERDICT r10/r11) — this entry
    gates the STREAMING composition the way x_crawl_chain gates the
    batch one."""
    import shutil
    import tempfile

    from scratchdata_spark.inventory_extras import (
        _chain_fixture_dir,
        _chain_prose,
        _CHAIN_DSIR_BUCKETS,
        _CHAIN_MIN_PROB,
        _QC_BUCKETS,
        _qc_fixture,
    )
    from scratchdata_spark.operators import robots as R
    from scratchdata_spark.operators import warc as W
    from scratchdata_spark.operators.selection import dsir_logratio_table
    from scratchdata_spark.streaming.admission import (
        admission_stages,
        start_admission_stream,
    )

    d = _chain_fixture_dir()
    # deterministic micro-batch order: ascending archive mtimes
    now = os.path.getmtime(os.path.join(d, "a0.warc"))
    for k in range(3):
        p = os.path.join(d, f"a{k}.warc")
        os.utime(p, (now + k, now + k))

    def with_doc_id(df):
        return df.withColumn(
            "doc_id",
            F.regexp_extract("record_id", r"urn:uuid:(\d+)-(\d+)", 1)
            .cast("long") * 100
            + F.regexp_extract(
                "record_id", r"urn:uuid:(\d+)-(\d+)", 2
            ).cast("long"),
        )

    # ---- fit offline (batch pass over the same crawl) ----
    records = W.read_warc(spark, d + "/*.warc", keep_paragraphs=True)
    rules = R.rules_from_warc(records)
    w_fix, b_fix = _qc_fixture()
    gates = dict(
        robots_rules=rules,
        blocked_domains=["spam.biz"],
        boilerplate={},
        min_score=0.3,
        weights=w_fix, bias=b_fix,
        qc_buckets=_QC_BUCKETS, min_prob=_CHAIN_MIN_PROB,
        qc_portable=True,
    )
    raw = admission_stages(with_doc_id(records), **gates).select("text")
    target = spark.createDataFrame(
        [(j, _chain_prose(0, j)) for j in (0, 6, 7, 8)],
        "doc_id long, text string",
    )
    table, default = dsir_logratio_table(
        raw, target, "text", buckets=_CHAIN_DSIR_BUCKETS, portable=True
    )

    # ---- gate online (the stream) ----
    base = tempfile.mkdtemp(prefix="sd-admstream-")
    out = os.path.join(base, "out")
    query = start_admission_stream(
        spark, d, out, os.path.join(base, "ckpt"),
        prepare=with_doc_id, max_files_per_trigger=1,
        dsir_table=table, dsir_default=default,
        dsir_buckets=_CHAIN_DSIR_BUCKETS,
        dsir_min=_SCHAIN_DSIR_MIN, dsir_portable=True,
        **gates,
    )
    query.awaitTermination()
    got = spark.read.parquet(out).select("doc_id", "target_uri", "text")
    # materialize before dropping the temp dirs (bounded: the fixture
    # admits 15 documents by construction)
    rows = got.collect()
    out_df = spark.createDataFrame(rows, got.schema)
    shutil.rmtree(base, ignore_errors=True)
    shutil.rmtree(d, ignore_errors=True)
    return out_df
