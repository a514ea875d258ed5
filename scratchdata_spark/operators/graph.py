"""Distributed connected components over a pair/edge DataFrame.

The dedup tiers (minhash-LSH, embedding-LSH, n-gram Jaccard —
operators/dedup.py, operators/similarity.py) emit verified duplicate
PAIRS. Turning pairs into a deduplicated corpus needs the transitive
closure: if A~B and B~C, then {A, B, C} is one duplicate cluster and
exactly one member survives. ``connected_components`` computes the
cluster id (= minimum member id) for every vertex; ``dedup_by_pairs``
applies it to keep one canonical row per cluster.

Algorithm: iterative min-label propagation with pointer jumping.
Each vertex's label starts as its own id; every round it adopts the
minimum of its own label and its neighbors' labels, then follows its
label one hop (label := label(label)). Labels are monotonically
non-increasing and bounded below by the component minimum, so the
fixpoint is exact; the pointer-jump halves chain lengths each round,
giving O(log d) convergence on diameter-d components instead of the
O(d) of plain propagation. This is the standard Spark-friendly CC
formulation (cf. Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC'14 — the alternating-star family has the same
per-round shape: a min-aggregate plus a relabel join).

Scale design (100 TB corpus, billions of pairs):
- State per round is one (id, comp) row per vertex — two longs —
  plus the static symmetric edge list. Nothing per-document is
  shuffled; the caller's pair-producing tier already reduced
  documents to ids.
- Each round costs one groupBy(min) shuffle over edges plus two
  label joins. High-degree hub vertices (boilerplate duplicated a
  million times) skew the groupBy; AQE skew-join splitting handles
  it without a salting pass because the aggregate is a min —
  partials combine map-side.
- ``localCheckpoint(eager=True)`` truncates the lineage each round;
  without it the plan doubles per iteration and the driver melts at
  ~15 rounds. On a production cluster with a reliable checkpoint
  dir, ``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()``
  is the fault-tolerant variant (localCheckpoint trades executor
  loss tolerance for speed, the right default on a dedup batch job
  that simply re-runs on failure).
- Duplicate-cluster graphs are near-cliques (diameter 2-4), so the
  loop typically converges in 3 rounds; ``max_iter`` is a backstop
  for pathological chain graphs, and hitting it raises rather than
  silently returning partial clusters.

Reference parity: the reference has no graph operator — this is
beyond-parity surface for the training-data pipeline (SURVEY §2.C).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, comp) for every vertex appearing in ``edges``; ``comp`` is
    the minimum vertex id of the connected component.

    ``edges`` is undirected input — orientation and duplicate pairs
    are both fine (the symmetric closure is built internally).
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # dropDuplicates bounds per-round join width when the pair tier
    # emits the same pair from several LSH bands
    sym = sym.dropDuplicates(["a", "b"]).localCheckpoint(eager=True)

    lab = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # min neighbor label; map-side partial min keeps hub-vertex
        # skew bounded before the shuffle
        nbr = (
            sym.join(
                lab.select(
                    F.col("id").alias("b"), F.col("comp").alias("nc")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nc").alias("nc"))
            .withColumnRenamed("a", "id")
        )
        cand = lab.join(nbr, "id", "left").select(
            "id",
            F.least(F.col("comp"), F.coalesce(F.col("nc"), F.col("comp"))).alias(
                "comp"
            ),
        )
        # pointer jump: follow the label one hop. Labels are always
        # vertex ids (mins of ids), so the join key always resolves;
        # left + coalesce only guards the self-label case.
        jumped = (
            cand.alias("x")
            .join(
                cand.select(
                    F.col("id").alias("__cid"), F.col("comp").alias("__cc")
                ),
                F.col("x.comp") == F.col("__cid"),
                "left",
            )
            .select(
                F.col("x.id").alias("id"),
                F.least(
                    F.col("x.comp"), F.coalesce(F.col("__cc"), F.col("x.comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.join(
                lab.select(F.col("id"), F.col("comp").alias("__old")), "id"
            )
            .filter(F.col("comp") != F.col("__old"))
            .limit(1)
            .count()
        )
        lab = jumped
        if changed == 0:
            return lab
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds —"
        " pathological chain graph; raise max_iter"
    )


def dedup_by_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep one canonical row (minimum ``id_col``) per duplicate
    cluster implied by ``pairs``; rows in no pair survive untouched.

    The anti-join ships only loser ids — at 100 TB the document
    payload never moves, and AQE broadcasts the loser set when the
    duplicate fraction is small.
    """
    comp = connected_components(pairs, src, dst)
    losers = comp.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def dedup_by_pairs_best(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Quality-aware cluster survivor election: keep the HIGHEST-
    ``score_col`` member of each duplicate cluster (ties break to the
    smaller id, so the election is total and deterministic), instead
    of :func:`dedup_by_pairs`'s minimum-id rule.  The production
    pattern behind it: near-dup clusters routinely contain one clean
    original and several mangled re-crawls, and min-id keeps whichever
    was crawled first — a quality model (selection.score_quality) or
    heuristic (text.quality_score) should pick instead.

    Plan shape matches dedup_by_pairs: pointer-jumped components, one
    (id, comp, score) aggregation to elect winners — scores ride the
    shuffle as one double next to the ids, the document payload never
    moves — and a loser-ids anti-join that AQE broadcasts when the
    duplicate fraction is small.
    """
    comp = connected_components(pairs, src, dst)
    scored = comp.join(
        df.select(
            F.col(id_col).alias("id"),
            # NEGATED score so a MIN election takes the highest score
            # with the natural ascending id tiebreak — never negate
            # the id, which would silently no-op for string ids (r10
            # second review catch).  NULL scores coalesce to -inf →
            # negate to +inf → always lose; NaN scores order LARGEST
            # in Spark, so under MIN they also always lose (under the
            # earlier max-election a NaN-scored mangled re-crawl beat
            # a 0.9 clean original — same review catch).
            (
                -F.coalesce(
                    F.col(score_col).cast("double"), F.lit(float("-inf"))
                )
            ).alias("__ns"),
        ),
        "id",
    )
    winners = scored.groupBy("comp").agg(
        F.min(F.struct(F.col("__ns"), F.col("id"))).alias("__w")
    )
    losers = (
        scored.join(winners, "comp")
        .filter(F.col("id") != F.col("__w.id"))
        .select(F.col("id").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")
