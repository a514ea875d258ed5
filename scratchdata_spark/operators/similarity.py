"""Embedding similarity search over an ``array<float>`` column.

* brute-force cosine top-k — the exactness baseline: broadcast the
  query vectors, one pass over the corpus, per-query top-k via a
  rank-limited window (Spark pushes the k-filter into the sort).
* LSH-bucketed (random hyperplane) — the scale path: b sign-bits per
  vector form a bucket id; candidate generation joins on bucket,
  then exact re-ranking within candidates. Hyperplanes are
  deterministic (hash-derived), so results are reproducible without
  storing a model.

Math note: dot products fold the array left-to-right with a double
accumulator (``aggregate``/``zip_with``), i.e. the same element order
every engine uses for a list fold — which is what makes the oracle
hash-comparable (a parallel/vectorized reduction would round
differently).

At 100 TB: the corpus never moves — queries broadcast to it. For
corpus×corpus kNN, the LSH bucket join replaces the quadratic cross
join; bucket width (n_planes) trades recall for bucket size, and AQE
skew handling covers dense regions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    """Sequential left-to-right dot product (fold with double acc).

    Deliberately a HOF fold, not a 64-term unrolled expression: the
    unrolled tree overflows codegen method limits and measures ~5×
    slower; the fold's per-element interpretation is fine as long as
    callers don't fold three times per pair (see cosine_topk).
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries: (query_id_col, vec_col) — expected small; broadcast.
    Excludes self-matches when ids collide. Deterministic tiebreak on
    (similarity desc, corpus id asc).

    Norms are computed once per side BEFORE the |Q|×|C| expansion —
    the pairwise stage pays one dot-product fold, not three.
    """
    q = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
        _norm(F.col(vec_col)).alias("__qn"),
    )
    joined = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        _norm(F.col(vec_col)).alias("__cn"),
    ).crossJoin(F.broadcast(q))
    sim = joined.filter(F.col("neighbor_id") != F.col("__qid")).withColumn(
        "cos_sim",
        _dot(F.col("__cvec"), F.col("__qvec")) / (F.col("__cn") * F.col("__qn")),
    )
    w = Window.partitionBy("__qid").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias("query_id"),
            "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def hyperplane_bits(vec_col, dim: int, n_planes: int = 8):
    """Deterministic random-hyperplane sign bits → bucket id (long).

    Plane p, dimension i weight = centered hash in [-0.5, 0.5):
    ``(xxhash64(p*dim+i) mod 1000)/1000 - 0.5`` — reproducible across
    runs and engines, no stored model.
    """
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.expr(
                    f"transform(sequence(0, {dim - 1}),"
                    f" i -> (pmod(xxhash64(cast({p} * {dim} as long) + i), 1000L) / 1000.0) - 0.5)"
                ),
                lambda x, wgt: x.cast("double") * wgt,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p).cast("long")).otherwise(0)
    return bucket


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    n_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.

    Recall < 1 by design (neighbors across a hyperplane are missed);
    raise recall with fewer planes (bigger buckets) or multi-probe.
    The candidate join shuffles on bucket id — at corpus scale this is
    the difference between |Q|×|C| and |Q|×|C|/2^planes comparisons.
    """
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        hyperplane_bits(F.col(vec_col), dim, n_planes).alias("__bucket"),
    )
    qb = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.col(vec_col).alias("__qvec"),
        hyperplane_bits(F.col(vec_col), dim, n_planes).alias("__bucket"),
    )
    cand = cb.join(F.broadcast(qb), "__bucket").filter(
        F.col("neighbor_id") != F.col("__qid")
    )
    sim = cand.withColumn("cos_sim", cosine(F.col("__cvec"), F.col("__qvec")))
    w = Window.partitionBy("__qid").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias("query_id"),
            "neighbor_id",
            F.round("cos_sim", 6).alias("cos_sim"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
