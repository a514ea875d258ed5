"""Product-quantization suite (operators/pq.py): encode mechanics,
fit quality, exact recovery when the codebook can represent the
corpus losslessly, and recall against the brute-force oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scratchdata_spark.inventory import load
from scratchdata_spark.operators.pq import (
    pq_encode,
    pq_fit,
    pq_reconstruction_error,
    pq_topk,
)


def test_pq_encode_shape_and_determinism(spark, sf_dir):
    e = load(spark, sf_dir)["embeddings"]
    books = pq_fit(e, "embedding", 64, m=8, nbits=4, id_col="vec_id",
                   max_iter=2)
    assert len(books) == 8 and len(books[0][0]) == 8  # m subspaces, dsub=8
    enc = pq_encode(e, books, "embedding").select("vec_id", "pq_code")
    rows = {r.vec_id: r.pq_code for r in enc.collect()}
    ksub = len(books[0])
    for code in rows.values():
        assert len(code) == 8
        assert all(0 <= c < ksub for c in code)
    again = {r.vec_id: r.pq_code
             for r in pq_encode(e, books, "embedding")
             .select("vec_id", "pq_code").collect()}
    assert again == rows  # encoding is deterministic

    # NULL / wrong-width vectors encode as NULL, never crash
    bad = spark.createDataFrame(
        [(1, None), (2, [0.0] * 63)], "vec_id long, embedding array<float>"
    )
    got = {r.vec_id: r.pq_code for r in pq_encode(bad, books, "embedding").collect()}
    assert got == {1: None, 2: None}


def test_pq_fit_improves_reconstruction(spark, sf_dir):
    e = load(spark, sf_dir)["embeddings"]
    seeds = pq_fit(e, "embedding", 64, m=4, nbits=4, id_col="vec_id",
                   max_iter=0)   # lowest-id seed codewords, no Lloyd's
    fitted = pq_fit(e, "embedding", 64, m=4, nbits=4, id_col="vec_id",
                    max_iter=8)
    err_seed = pq_reconstruction_error(e, seeds, "embedding")
    err_fit = pq_reconstruction_error(e, fitted, "embedding")
    assert err_fit < err_seed  # Lloyd's iterations reduce quantization error


def test_pq_exact_when_codebook_is_lossless(spark):
    """ksub == corpus size: the deterministic lowest-id seeding makes
    every vector its own codeword, reconstruction is exact, and
    pq_topk must equal the brute-force exact ranking bit for bit."""
    from scratchdata_spark.operators.similarity import cosine_topk

    import random
    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(8)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        rows[:3], "query_id long, embedding array<float>"
    )
    books = pq_fit(corpus, "embedding", 16, m=4, nbits=3, id_col="vec_id",
                   max_iter=0)  # 2^3 = corpus size -> seeds ARE the corpus
    got = pq_topk(
        corpus, queries, 16, k=3, m=4, nbits=3, codebooks=books,
    ).collect()
    want = cosine_topk(corpus, queries, k=3).collect()
    gmap = {(r.query_id, r.rank): (r.neighbor_id, r.approx_cos) for r in got}
    wmap = {(r.query_id, r.rank): (r.neighbor_id, r.cos_sim) for r in want}
    assert set(gmap) == set(wmap)
    for key, (nid, cos) in gmap.items():
        assert wmap[key][0] == nid, (key, gmap[key], wmap[key])
        assert wmap[key][1] == pytest.approx(cos, abs=2e-6)


def test_pq_topk_recall_vs_brute_force(spark, sf_dir):
    """Compressed codes shortlist, exact refine decides: recall@5
    over 10 queries against exact cosine_topk.  The test embeddings
    pack the true neighbors within ~0.01 cosine of each other, so
    codes alone can't resolve the ordering (measured 0.4) — the
    rerank stage must recover most of it."""
    from scratchdata_spark.operators.similarity import cosine_topk

    e = load(spark, sf_dir)["embeddings"]
    queries = (
        e.orderBy("vec_id").limit(10)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    books = pq_fit(e, "embedding", 64, m=8, nbits=6, id_col="vec_id",
                   max_iter=6)
    exact = cosine_topk(e, queries, k=5)
    x = {(r.query_id, r.neighbor_id) for r in exact.collect()}

    codes_only = pq_topk(e, queries, 64, k=5, m=8, nbits=6, codebooks=books)
    a0 = {(r.query_id, r.neighbor_id) for r in codes_only.collect()}
    refined = pq_topk(
        e, queries, 64, k=5, m=8, nbits=6, codebooks=books, rerank=20
    )
    a1 = {(r.query_id, r.neighbor_id) for r in refined.collect()}
    r0 = len(a0 & x) / len(x)
    r1 = len(a1 & x) / len(x)
    assert r0 >= 0.3, r0  # codes alone still land in the neighborhood
    assert r1 >= 0.7, r1  # exact refine over an R=4·k=20 shortlist recovers it
    assert r1 > r0, (r0, r1)

    # refined scores are EXACT cosine for the survivors
    emap = {(r.query_id, r.neighbor_id): r.cos_sim for r in exact.collect()}
    for r in refined.collect():
        key = (r.query_id, r.neighbor_id)
        if key in emap:
            assert emap[key] == pytest.approx(r.approx_cos, abs=2e-6)


def test_pq_topk_plan_emits_partial_topk_only(spark, sf_dir):
    """The scoring stage must not shuffle O(corpus × queries) rows:
    the only exchange after the scan partitions the per-batch top-k
    rows for the global window."""
    import re

    from tests.test_plans import plan

    e = load(spark, sf_dir)["embeddings"]
    queries = (
        e.orderBy("vec_id").limit(5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    books = pq_fit(e, "embedding", 64, m=4, nbits=4, id_col="vec_id",
                   max_iter=1)
    p = plan(pq_topk(e, queries, 64, k=3, m=4, nbits=4, codebooks=books))
    assert "CartesianProduct" not in p
    assert "Join" not in p  # LUTs ride the closure; no query-corpus join
    # one exchange for the global top-k window, nothing else
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 1, p


def test_ivf_pq_lossless_single_cell_matches_exact(spark):
    """n_centroids=1 + ksub >= corpus: residuals are distinct, each
    gets its own codeword, reconstruction is exact, and with every
    row in the one probed cell the ranking must equal brute force."""
    from scratchdata_spark.operators.pq import ivf_pq_fit, ivf_pq_topk
    from scratchdata_spark.operators.similarity import cosine_topk

    import random
    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(8)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = spark.createDataFrame(
        rows[:3], "query_id long, embedding array<float>"
    )
    cents, books = ivf_pq_fit(
        corpus, "embedding", 16, n_centroids=1, m=4, nbits=3,
        id_col="vec_id", max_iter=0,
    )
    got = ivf_pq_topk(
        corpus, queries, 16, k=3, n_centroids=1, nprobe=1, m=4, nbits=3,
        centroids=cents, codebooks=books,
    ).collect()
    want = cosine_topk(corpus, queries, k=3).collect()
    gmap = {(r.query_id, r.rank): (r.neighbor_id, r.approx_cos) for r in got}
    wmap = {(r.query_id, r.rank): (r.neighbor_id, r.cos_sim) for r in want}
    assert set(gmap) == set(wmap)
    for key, (nid, cos) in gmap.items():
        assert wmap[key][0] == nid, (key, gmap[key], wmap[key])
        assert wmap[key][1] == pytest.approx(cos, abs=2e-6)


def test_ivf_pq_recall_and_probe_pruning(spark, sf_dir):
    """IVF-PQ with refine recovers most true neighbors while scoring
    only ~nprobe/n_centroids of the corpus; residual encoding must
    not be WORSE than flat PQ at equal bits (usually better)."""
    from scratchdata_spark.operators.pq import ivf_pq_topk
    from scratchdata_spark.operators.similarity import cosine_topk

    e = load(spark, sf_dir)["embeddings"]
    queries = (
        e.orderBy("vec_id").limit(10)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(e, queries, k=5).collect()}
    got = ivf_pq_topk(
        e, queries, 64, k=5, n_centroids=8, nprobe=4, m=8, nbits=6,
        rerank=20,
    )
    a = {(r.query_id, r.neighbor_id) for r in got.collect()}
    recall = len(a & exact) / len(exact)
    assert recall >= 0.5, recall  # probing half the cells, tight neighbors


def test_ivf_pq_encode_nulls_and_reuse(spark, sf_dir):
    from scratchdata_spark.operators.pq import (
        ivf_pq_encode,
        ivf_pq_fit,
        ivf_pq_topk,
    )

    e = load(spark, sf_dir)["embeddings"]
    cents, books = ivf_pq_fit(
        e, "embedding", 64, n_centroids=4, m=4, nbits=4,
        id_col="vec_id", max_iter=3,
    )
    bad = spark.createDataFrame(
        [(1, None), (2, [0.0] * 63)], "vec_id long, embedding array<float>"
    )
    got = {r.vec_id: (r.ivf_cell, r.pq_code)
           for r in ivf_pq_encode(bad, cents, books, "embedding").collect()}
    assert got == {1: (None, None), 2: (None, None)}
    # fit-once / encode-once / probe-many reuse path
    enc = ivf_pq_encode(e, cents, books, "embedding")
    queries = (
        e.orderBy("vec_id").limit(5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    r1 = ivf_pq_topk(
        e, queries, 64, k=5, nprobe=2, centroids=cents, codebooks=books,
        encoded=enc,
    ).collect()
    assert len(r1) == 25


def test_ivf_pq_plan_no_join_on_codes_path(spark, sf_dir):
    """Probe filtering happens inside the scoring closure via the
    probe-mask lookup: the codes path must stay a joinless scan with
    one exchange for the global top-k window."""
    import re

    from tests.test_plans import plan
    from scratchdata_spark.operators.pq import ivf_pq_fit, ivf_pq_topk

    e = load(spark, sf_dir)["embeddings"]
    cents, books = ivf_pq_fit(
        e, "embedding", 64, n_centroids=4, m=4, nbits=4,
        id_col="vec_id", max_iter=1,
    )
    queries = (
        e.orderBy("vec_id").limit(5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    p = plan(ivf_pq_topk(
        e, queries, 64, k=3, nprobe=2, centroids=cents, codebooks=books,
    ))
    assert "CartesianProduct" not in p
    assert "Join" not in p
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 1, p


def test_ivf_pq_nprobe1_neighbors_come_from_home_cell(spark, sf_dir):
    """The probe mask must actually gate candidates: with nprobe=1
    every returned neighbor's encoded cell equals its query's
    nearest (home) cell — the observable form of the
    ~nprobe/n_centroids pruning."""
    from scratchdata_spark.operators.pq import (
        ivf_pq_encode,
        ivf_pq_fit,
        ivf_pq_topk,
    )

    e = load(spark, sf_dir)["embeddings"]
    cents, books = ivf_pq_fit(
        e, "embedding", 64, n_centroids=8, m=4, nbits=4,
        id_col="vec_id", max_iter=3,
    )
    enc = ivf_pq_encode(e, cents, books, "embedding")
    cell_of = {r.vec_id: r.ivf_cell for r in enc.select("vec_id", "ivf_cell").collect()}
    queries = (
        e.orderBy("vec_id").limit(8)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    qcell = {
        r.vec_id: r.ivf_cell
        for r in ivf_pq_encode(
            queries.withColumnRenamed("query_id", "vec_id"),
            cents, books, "embedding",
        ).select("vec_id", "ivf_cell").collect()
    }
    got = ivf_pq_topk(
        e, queries, 64, k=5, nprobe=1, centroids=cents, codebooks=books,
        encoded=enc,
    ).collect()
    assert got, "nprobe=1 still returns the home cell's members"
    for r in got:
        assert cell_of[r.neighbor_id] == qcell[r.query_id], r
