"""Plan-quality gates: the 100 TB design assertions from SURVEY §4.

Correctness tests prove the answers are right; these prove the
*physical plans* are the ones that survive a 1000-executor scale-up:
filters reach the parquet scan, scans read only referenced columns,
small dimensions broadcast instead of shuffling the fact table,
aggregations combine map-side, and hot paths stay inside whole-stage
codegen. A regression here is a silent 10-100× cost at scale even
when every value is still correct.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from scratchdata_spark.inventory import REGISTRY, load


def plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    l = load(spark, sf_dir)["lineitem"]
    df = l.filter(
        (F.col("l_shipdate") >= "1994-01-01") & (F.col("l_discount") > 0.05)
    ).select("l_orderkey", "l_quantity")
    p = plan(df)
    assert "PushedFilters: [" in p
    # at least the IsNotNull + comparison filters must be pushed
    pushed = p.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "GreaterThan" in pushed or "GreaterThanOrEqual" in pushed, pushed


def test_column_pruning_q01(spark, sf_dir):
    fn, _ = REGISTRY["q01_pricing_summary"]
    p = plan(fn(spark, sf_dir))
    # scan must read only the 7 referenced lineitem columns
    read_schema = p.split("ReadSchema: ", 1)[1].split("\n", 1)[0]
    assert "l_quantity" in read_schema and "l_shipdate" in read_schema
    for unused in ("l_comment", "l_shipinstruct", "l_partkey", "l_suppkey"):
        assert unused not in read_schema, f"{unused} not pruned: {read_schema}"


def test_small_dim_join_broadcasts(spark, sf_dir):
    t = load(spark, sf_dir)
    df = (
        t["customer"]
        .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("n"))
    )
    p = plan(df)
    # nation (25 rows) must broadcast; shuffling customer on nationkey
    # (25 distinct keys -> skew) would be the wrong plan at any scale
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p


def test_partial_aggregation_map_side(spark, sf_dir):
    fn, _ = REGISTRY["q01_pricing_summary"]
    p = plan(fn(spark, sf_dir), mode="simple")
    # two HashAggregate nodes (partial + final) around one Exchange:
    # map-side combine collapses 600k rows to ~6 groups before shuffle
    assert p.count("HashAggregate") >= 2, p
    assert p.count("Exchange") == 1, p


def test_whole_stage_codegen_hot_path(spark, sf_dir):
    fn, _ = REGISTRY["q01_pricing_summary"]
    # AQE materializes codegen spans only in the executed (final) plan
    df = fn(spark, sf_dir)
    df.collect()
    p = plan(df, mode="simple")
    assert "isFinalPlan=true" in p, p
    # codegen stages print as "*(n) Operator" in simple mode
    assert "*(" in p, p


def test_map_only_pipeline_has_no_shuffle(spark, sf_dir):
    o = load(spark, sf_dir)["orders"]
    df = o.filter(F.col("o_totalprice") > 100000).select(
        "o_orderkey", (F.col("o_totalprice") * 0.9).alias("discounted")
    )
    p = plan(df, mode="simple")
    assert "Exchange" not in p, p


def test_aqe_and_shuffle_sizing(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    # shuffle partitions sized from env, not the 200 default
    assert int(spark.conf.get("spark.sql.shuffle.partitions")) <= 64


def test_semi_join_no_full_materialization(spark, sf_dir):
    fn, _ = REGISTRY["q_join_semi"]
    p = plan(fn(spark, sf_dir), mode="simple")
    assert "LeftSemi" in p, p


@pytest.mark.parametrize("name", ["q03_shipping_priority", "q05_local_supplier_volume"])
def test_join_agg_queries_broadcast_dims(spark, sf_dir, name):
    fn, _ = REGISTRY[name]
    p = plan(fn(spark, sf_dir), mode="simple")
    assert "BroadcastHashJoin" in p, p


def test_topk_per_group_single_shuffle(spark, sf_dir):
    fn, _ = REGISTRY["q_topk_per_group"]
    p = plan(fn(spark, sf_dir), mode="simple")
    # rank-within-partition needs exactly one exchange on the group key
    assert p.count("Exchange") <= 2, p


def test_bucketed_tables_join_without_shuffle(spark, sf_dir, tmp_path):
    """Bucketing is the co-located-join lever at 100 TB: two tables
    bucketed+sorted on the join key sort-merge-join with ZERO
    exchanges — the shuffle is prepaid once at write time."""
    o = load(spark, sf_dir)["orders"]
    l = load(spark, sf_dir)["lineitem"]
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at sf0.001 the planner would broadcast instead; force the
        # sort-merge path the big-data case takes so the test exercises
        # the bucketed (shuffle-free) variant of it
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        (
            o.select("o_orderkey", "o_totalprice").write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", str(tmp_path / "orders_b"))
            .saveAsTable("orders_bucketed")
        )
        (
            l.select("l_orderkey", "l_quantity").write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", str(tmp_path / "lineitem_b"))
            .saveAsTable("lineitem_bucketed")
        )
        joined = spark.table("orders_bucketed").join(
            spark.table("lineitem_bucketed"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        p = plan(joined, mode="simple")
        assert "Exchange" not in p, p
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")


def test_lsh_near_dup_avoids_cartesian(spark, sf_dir):
    """The LSH candidate join must plan as an equi-join on the bucket
    id (hash or sort-merge), never a cartesian/BNL product — at corpus
    scale that's the whole point of the operator."""
    from scratchdata_spark.operators.similarity import near_dup_pairs

    e = load(spark, sf_dir)["embeddings"]
    p = plan(near_dup_pairs(e, dim=64, threshold=0.4, n_planes=4))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Join" in p  # the bucket equi-join survives


def test_lsh_near_dup_bucket_capped_ids_only(spark, sf_dir):
    """The embedding-LSH tier must never equi-self-join on the bucket
    id.  The only join allowed to key on ``__bucket`` is the LeftAnti
    hot-bucket drop (applied count-first, BEFORE anything groups);
    verification is the grouped collect_list + GEMM pass — each
    vector moves once.  An uncapped bucket self-join is quadratic
    with vector payload in flight the moment one degenerate bucket
    appears (templated/zero embeddings)."""
    import re

    from scratchdata_spark.operators.similarity import near_dup_pairs

    e = load(spark, sf_dir)["embeddings"]
    p = plan(near_dup_pairs(e, dim=64, threshold=0.4, n_planes=4))
    assert "collect_list" in p, p  # grouped expansion, not a self-join
    # every join segment whose keys mention __bucket must be the
    # LeftAnti hot-bucket filter (ids only), never an Inner pair join
    for seg in re.split(r"\n\(\d+\) ", p):
        if "Join" in seg.split("\n", 1)[0] and "__bucket" in seg:
            assert "LeftAnti" in seg, seg


def test_cosine_topk_lsh_bucket_truncated(spark, sf_dir):
    """cosine_topk_lsh bounds per-bucket work by deterministic
    truncation (sort-based row_number ≤ cap) — dropping whole buckets
    would orphan the queries hashing there."""
    from scratchdata_spark.operators.similarity import cosine_topk_lsh

    e = load(spark, sf_dir)["embeddings"]
    queries = e.filter(F.col("vec_id") < 10).selectExpr(
        "vec_id as query_id", "embedding"
    )
    p = plan(cosine_topk_lsh(e, queries, dim=64, k=5, n_planes=6))
    assert "row_number" in p, p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_cosine_topk_exchange_is_pruned(spark, sf_dir):
    """Brute-force cosine_topk must not exchange the full q×n scored
    set (VERDICT r6 #4; tier reshaped r13): the GEMM scoring seam
    computes every corpus×query cosine inside one map-only
    ``mapInPandas`` pass (cumsum accumulation — the HOF fold order
    bit-for-bit) and prunes each batch to its local top-k BELOW the
    ranking window's hash exchange, so the shuffle carries
    ~q·k·batches rows instead of q×n."""
    from scratchdata_spark.operators.similarity import cosine_topk

    e = load(spark, sf_dir)["embeddings"]
    queries = e.filter(F.col("vec_id") < 10).selectExpr(
        "vec_id as query_id", "embedding"
    )
    p = plan(cosine_topk(e, queries, k=5), mode="simple")
    # exactly one hash exchange (the window's), and it consumes the
    # scoring seam's output: parent prints above child in tree order
    idx_ex = [i for i, ln in enumerate(p.splitlines())
              if "Exchange hashpartitioning" in ln]
    idx_ar = [i for i, ln in enumerate(p.splitlines())
              if "MapInPandas" in ln]
    assert len(idx_ex) == 1 and len(idx_ar) == 1, p
    assert idx_ex[0] < idx_ar[0], p


def test_ivf_probe_join_shape(spark, sf_dir):
    """IVF: centroids broadcast to both sides (tiny table), and the
    probe join is an equi-join on the cell id — not a cross join of
    queries against the whole corpus."""
    from scratchdata_spark.operators.similarity import ivf_topk

    e = load(spark, sf_dir)["embeddings"]
    queries = e.filter(F.col("vec_id") < 10).selectExpr(
        "vec_id as query_id", "embedding"
    )
    p = plan(ivf_topk(e, queries, dim=64, k=5, n_centroids=16, nprobe=4))
    assert "BroadcastExchange" in p  # centroid assignment side
    # the only permissible nested-loop work is against the broadcast
    # centroid list (bounded n_centroids rows), never corpus×queries
    assert "CartesianProduct" not in p


def test_partition_pruning_partitioned_table(spark, tmp_path):
    """A predicate on the declared partition column must prune at
    planning time: non-matching directories never enter the scan."""
    from scratchdata_spark.catalog import TableCatalog
    from scratchdata_spark.engine import SparkDestination

    d = SparkDestination(spark, TableCatalog(str(tmp_path / "wh")), "db")
    d.create_empty_table("pp")
    import os, tempfile

    fd, path = tempfile.mkstemp(suffix=".ndjson")
    with os.fdopen(fd, "w") as f:
        f.write('{"day": "d0", "v": 1}\n')
    d.create_columns("pp", path)
    d.set_partitioning("pp", "day")
    d.insert_ndjson_file("pp", path)
    os.remove(path)
    fd, path = tempfile.mkstemp(suffix=".ndjson")
    with os.fdopen(fd, "w") as f:
        f.write('{"day": "d1", "v": 2}\n')
    d.insert_ndjson("pp", path)
    os.remove(path)

    p = plan(d.query_df("SELECT v FROM pp WHERE day = 'd1'"))
    assert "PartitionFilters" in p
    seg = p.split("PartitionFilters", 1)[1][:160]
    assert "day" in seg  # the predicate moved into partition pruning


def test_range_join_bucketed_is_equi_join(spark, sf_dir):
    """The bucketed range join must plan as a hash/sort-merge equi-join
    on the bucket — never the BroadcastNestedLoopJoin Spark produces
    for the raw non-equi predicate."""
    from scratchdata_spark.operators.rangejoin import range_join_bucketed

    l = load(spark, sf_dir)["lineitem"].select(
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("p")
    )
    o = load(spark, sf_dir)["orders"].limit(100).select(
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("s"),
        (F.unix_micros(F.col("o_orderdate").cast("timestamp")) + 604_800_000_000).alias("e"),
    )
    p = plan(range_join_bucketed(l, o, "p", "s", "e", 86_400_000_000))
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_intersect_variant_broadcast_semi_single_shuffle(spark, sf_dir):
    """The INTERSECT bench variant must plan as ONE broadcast semi join
    + one aggregate exchange — never the aggregate-both-sides + sort-
    merge shape Spark gives the INTERSECT keyword (three shuffles)."""
    import scratchdata_spark.inventory_extras  # noqa: F401 (registers variants)
    from scratchdata_spark.inventory import BENCH_VARIANTS

    p = plan(BENCH_VARIANTS["q_intersect"](spark, sf_dir))
    assert "BroadcastHashJoin" in p and "LeftSemi" in p
    # tree lines only ("Exchange (n)"); the detail section repeats names
    shuffles = p.count("Exchange (") - p.count("BroadcastExchange (")
    assert shuffles <= 1, p


def test_multimodal_meta_variant_is_map_only(spark, sf_dir):
    """The metadata fast path is a single projection over the scan:
    no exchange, no Python boundary."""
    import scratchdata_spark.inventory_extras  # noqa: F401 (registers variants)
    from scratchdata_spark.inventory import BENCH_VARIANTS

    p = plan(BENCH_VARIANTS["x_multimodal_meta"](spark, sf_dir))
    assert "Exchange" not in p
    assert "ArrowEvalPython" not in p and "MapInPandas" not in p


def test_ensure_parallelism_noop_on_wide_input(spark):
    """The fan-out helper must NOT insert a shuffle when the input
    already has cluster parallelism — at 100 TB every scan does, and
    an unconditional repartition would re-shuffle the whole corpus."""
    from scratchdata_spark.operators import ensure_parallelism

    wide = spark.range(10_000, numPartitions=64)
    assert ensure_parallelism(wide) is wide
    narrow = spark.range(10_000, numPartitions=1)
    out = ensure_parallelism(narrow)
    assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism


def test_dialect_asof_is_union_window_not_nested_loop(spark, sf_dir):
    """The ASOF text rewrite must produce the union+window plan (one
    shuffle on the key, Window over the union) — NEVER a nested-loop
    domain join, which is what a correlated-LATERAL formulation
    decorrelates into (quadratic: minutes at sf0.1)."""
    import scratchdata_spark.inventory_extras  # noqa: F401
    from scratchdata_spark.inventory import REGISTRY

    p = plan(REGISTRY["q_dialect_asof"][0](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    assert "Window" in p and "Union" in p


def test_corpus_quality_ops_are_map_only(spark, sf_dir):
    """Repetition metrics and PII scrubbing are pure projections over
    the scan — no exchange, no Python boundary — so they run at
    parquet-scan speed on any corpus size. (ensure_parallelism may
    add one fan-out repartition on narrow local inputs; assert no
    AGGREGATE shuffle and no Python.)"""
    import scratchdata_spark.inventory_extras  # noqa: F401
    from scratchdata_spark.inventory import REGISTRY

    for name in ("x_quality_repetition", "x_pii_scrub"):
        p = plan(REGISTRY[name][0](spark, sf_dir))
        assert "ArrowEvalPython" not in p and "MapInPandas" not in p, name
        assert "HashAggregate" not in p and "SortAggregate" not in p, name


def test_global_shuffle_single_exchange_no_global_sort(spark, sf_dir):
    """The shuffle/shard manifest must shuffle ONCE (hash on the shard
    key — the partitioning the shard writer inherits) and sort only
    within partitions; a global sort (range partitioning) would
    serialize the corpus through one ordering at 100 TB."""
    import scratchdata_spark.inventory_extras  # noqa: F401
    from scratchdata_spark.inventory import REGISTRY

    p = plan(REGISTRY["x_global_shuffle"][0](spark, sf_dir))
    shuffles = p.count("Exchange (") - p.count("BroadcastExchange (")
    assert shuffles == 1, p
    assert "rangepartitioning" not in p.lower(), p


def test_decontaminate_broadcasts_benchmark_grams(spark, sf_dir):
    """The benchmark gram set must broadcast into the overlap join —
    shuffling the exploded corpus grams on the gram key would move
    the whole tokenized corpus at 100 TB."""
    import scratchdata_spark.inventory_extras  # noqa: F401
    from scratchdata_spark.inventory import REGISTRY

    p = plan(REGISTRY["x_decontaminate"][0](spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p, p


def test_chunk_documents_is_map_only(spark, sf_dir):
    """Chunking is a fan-out transform (sequence → posexplode →
    substring): it must stay map-side — any exchange would shuffle
    the full corpus text just to split strings."""
    import scratchdata_spark.inventory_extras  # noqa: F401
    from scratchdata_spark.inventory import REGISTRY

    p = plan(REGISTRY["x_chunk_documents"][0](spark, sf_dir), mode="simple")
    assert "Exchange" not in p, p
    assert "Generate" in p  # the explode runs JVM-side, not in Python


def test_cap_per_group_single_shuffle_no_global_sort(spark, sf_dir):
    """The domain cap shuffles once on the group key and ranks within
    partitions — a global sort or a second exchange would serialize
    the corpus at 100 TB."""
    import scratchdata_spark.inventory_extras  # noqa: F401
    from scratchdata_spark.inventory import REGISTRY

    p = plan(REGISTRY["x_cap_per_source"][0](spark, sf_dir))
    shuffles = p.count("Exchange (") - p.count("BroadcastExchange (")
    assert shuffles == 1, p
    assert "rangepartitioning" not in p.lower(), p


def test_resample_temperature_broadcasts_keep_rates(spark, sf_dir):
    """The per-group keep-rate table is tiny (one row per source) and
    must broadcast back onto the corpus; a sort-merge join here would
    shuffle every document on the group key."""
    import scratchdata_spark.inventory_extras  # noqa: F401
    from scratchdata_spark.inventory import REGISTRY

    p = plan(REGISTRY["x_resample_temperature"][0](spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p, p


def test_cosine_topk_lsh_multiprobe_plan(spark, sf_dir):
    """Multi-probe keeps the scale shape: the query side explodes to
    probe buckets and BROADCASTS; the corpus is never cross-joined."""
    from scratchdata_spark.operators.similarity import cosine_topk_lsh

    e = load(spark, sf_dir)["embeddings"]
    queries = e.filter(F.col("vec_id") < 10).selectExpr(
        "vec_id as query_id", "embedding"
    )
    p = plan(cosine_topk_lsh(e, queries, dim=64, k=5, n_planes=6, n_probes=3))
    assert "BroadcastExchange" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_simhash_pairs_band_join_ids_only(spark, sf_dir):
    """The Hamming-band candidate expansion mirrors the MinHash
    shape: grouped collect over (band, slice) keys with a count-first
    cap — never a fingerprint-carrying self-join on the band value."""
    import re

    from scratchdata_spark.operators.dedup import simhash_pairs

    d = load(spark, sf_dir)["documents"]
    p = plan(simhash_pairs(d, "doc_id", "text", max_hamming=3))
    assert "collect_list" in p, p
    assert "CartesianProduct" not in p
    for seg in re.split(r"\n\(\d+\) ", p):
        if "Join" in seg.split("\n", 1)[0] and "bv" in seg:
            assert "LeftAnti" in seg, seg  # ids-only hot-bucket drop


def test_semantic_assignment_is_map_only(spark, sf_dir):
    """Cluster assignment rides broadcast centroid literals — no
    exchange, no join: one codegen'd pass over the corpus."""
    from scratchdata_spark.operators.semantic import assign_clusters

    e = load(spark, sf_dir)["embeddings"]
    cents = [[float(i == j) for j in range(64)] for i in range(4)]
    p = plan(assign_clusters(e, cents, "embedding"))
    assert "Exchange" not in p, p
    assert "Join" not in p, p


def test_semantic_dedup_pairs_are_ids_only(spark, sf_dir):
    """The within-cluster verify is the grouped single-shuffle shape:
    one collect_list moves each (id, vec) struct once — never a pair
    self-join — and nothing goes cartesian.  Gated on semantic_pairs
    — the downstream connected-components step is iterative, so
    semantic_dedup's final explain no longer shows the pair stage's
    lineage."""
    from scratchdata_spark.operators.semantic import semantic_pairs

    e = load(spark, sf_dir)["embeddings"]
    p = plan(
        semantic_pairs(e, "vec_id", "embedding", k=4, threshold=0.4,
                       max_iter=0, max_cluster_compare=None)
    )
    assert "collect_list" in p, p
    assert "CartesianProduct" not in p, p


def test_pair_expansion_is_size_tiered(spark, sf_dir):
    """The TEXT pair tiers (minhash, simhash) go through
    triangular_pairs' HYBRID expansion (round-5 judge finding + r6
    soak measurement): the one-shot flatten(transform(...)) — which
    builds the whole C(m,2) pair array inside one task row — may only
    run behind a ``size <= one_shot_max`` guard (bounded ~131k
    structs/row), and arrays above it expand per-anchor (posexplode +
    suffix-slice explode; rows bounded by the array length).  The
    cosine tiers (semantic, embedding-LSH) don't expand id pairs at
    all any more — they verify via the grouped GEMM (next test)."""
    from scratchdata_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_pairs,
    )

    d = load(spark, sf_dir)["documents"]
    plans = {
        "minhash": plan(minhash_lsh_pairs(d, "doc_id", "text")),
        "simhash": plan(simhash_pairs(d, "doc_id", "text", max_hamming=3)),
    }
    for name, p in plans.items():
        # unguarded one-shot flatten would appear without size guards
        assert "<= 512" in p, (name, p)
        assert "> 512" in p, (name, p)
        assert p.count("Generate") >= 3, (name, p)


def test_cosine_verify_is_grouped_gemm(spark, sf_dir):
    """The cosine tiers (semantic, embedding-LSH) verify via ONE
    grouped Arrow pass (similarity.grouped_cosine_pairs_arrow): the
    plan shows the cluster/bucket collect_list feeding MapInPandas,
    and — the load-bearing part — NO per-pair id join and NO
    Generate-based pair explode (each vector crosses the wire once,
    O(corpus); the r6 A/B measured both the interpreted-HOF join
    predicate and a per-pair Arrow verify losing)."""
    from scratchdata_spark.operators.semantic import semantic_pairs
    from scratchdata_spark.operators.similarity import near_dup_pairs

    e = load(spark, sf_dir)["embeddings"]
    for name, df in {
        "semantic": semantic_pairs(e, "vec_id", "embedding", k=4,
                                   threshold=0.4, max_iter=0),
        "embedding_lsh": near_dup_pairs(e, 64, "vec_id", "embedding",
                                        n_planes=12),
    }.items():
        p = plan(df)
        assert "MapInPandas" in p, (name, p)
        assert "collect_list" in p, (name, p)
        assert "CartesianProduct" not in p, (name, p)
        # no pair-explode Generate between the grouping and the GEMM
        assert "Generate" not in p, (name, p)


def test_triangular_pairs_tiers_agree(spark):
    """Both expansion tiers produce the identical pair set: force an
    array through each tier by moving the threshold."""
    from scratchdata_spark.operators import triangular_pairs

    df = spark.createDataFrame(
        [(list(range(40)),), (list(range(3)),)], "ids array<int>"
    )
    one_shot = sorted(
        map(tuple, triangular_pairs(df, "ids", one_shot_max=64).collect())
    )
    per_anchor = sorted(
        map(tuple, triangular_pairs(df, "ids", one_shot_max=2).collect())
    )
    expect = sorted(
        [(a, b) for a in range(40) for b in range(a + 1, 40)]
        + [(a, b) for a in range(3) for b in range(a + 1, 3)]
    )
    assert one_shot == per_anchor == expect


def test_simhash_entry_shuffle_carries_no_text(spark, sf_dir):
    """The registry simhash entry groups by doc_id only: the aggregate
    exchange must not hash-partition on the raw text column."""
    from scratchdata_spark.operators.dedup import simhash

    d = load(spark, sf_dir)["documents"].select("doc_id", "text")
    p = plan(simhash(d, "text", key_cols=["doc_id"]))
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", p):
        assert "text" not in m.group(1), m.group(0)


def test_lm_bigram_extraction_is_map_only(spark, sf_dir):
    """Bigrams build inside the row (array combinatorics) — the
    extraction itself must plan with no exchange and no join."""
    from scratchdata_spark.operators.lm import _bigrams

    d = load(spark, sf_dir)["documents"]
    p = plan(_bigrams(d, "doc_id", "text"))
    assert "Exchange" not in p, p
    assert "Join" not in p, p


def test_substring_dedup_hashed_shuffle_is_constant_width(spark, sf_dir):
    """duplicate_ngram_stats (hashed=True, the scale default) must
    key the window-count shuffle on the xxhash64 value, never the
    window STRING — constant-width keys regardless of window width —
    and extract windows map-only (one Generate, no self-join)."""
    from scratchdata_spark.operators.dedup import duplicate_ngram_stats

    d = load(spark, sf_dir)["documents"]
    p = plan(duplicate_ngram_stats(d, ngram=8))
    assert "xxhash64" in p, p
    assert "CartesianProduct" not in p, p
    # the count aggregate's exchange partitions on the hashed key
    import re as _re

    agg_exchanges = [
        seg for seg in _re.split(r"\n\(\d+\) ", p)
        if seg.startswith("Exchange") and "__g" in seg
    ]
    assert agg_exchanges, p
    for seg in agg_exchanges:
        # hashed keys print as __g#<exprId>L (long); a regression to
        # string keys would print __g#<exprId> with no suffix
        assert _re.search(r"__g#\d+L", seg), seg


def test_source_overlap_hashed_shuffle_is_constant_width(spark, sf_dir):
    """source_ngram_overlap (hashed=True, the scale default) must key
    the gram dedup/collect_set shuffles on the xxhash64 value, never
    the gram STRING, and must not self-join grams (the per-gram
    source set comes from collect_set, so pair expansion is bounded
    by source cardinality)."""
    from scratchdata_spark.operators.dedup import source_ngram_overlap

    d = load(spark, sf_dir)["documents"]
    p = plan(source_ngram_overlap(d, ngram=8))
    assert "xxhash64" in p, p
    assert "CartesianProduct" not in p, p
    import re as _re

    gram_exchanges = [
        seg for seg in _re.split(r"\n\(\d+\) ", p)
        if seg.startswith("Exchange") and "__g" in seg
    ]
    assert gram_exchanges, p
    for seg in gram_exchanges:
        assert _re.search(r"__g#\d+L", seg), seg


def test_remove_duplicate_spans_text_stays_out_of_key_shuffles(spark, sf_dir):
    """remove_duplicate_spans: no cartesian anywhere, and the token
    arrays (__w — the document text) must not ride any key-side
    exchange: the only exchange allowed to carry __w is the final
    drop-set attach join on __id (AQE broadcasts the drop side when
    small; worst case one linear text exchange — docstring)."""
    import re as _re

    from scratchdata_spark.operators.dedup import remove_duplicate_spans

    d = load(spark, sf_dir)["documents"]
    p = plan(remove_duplicate_spans(d, ngram=8))
    assert "CartesianProduct" not in p, p
    exchanges = [
        seg for seg in _re.split(r"\n\(\d+\) ", p)
        if seg.startswith("Exchange")
    ]
    assert exchanges, p
    # ensure_parallelism's RoundRobin fan-out of the skinny source
    # also lists __w; it is a no-op on properly-partitioned input at
    # scale — only HASH exchanges (real key shuffles) are in scope
    carrying_text = [
        seg for seg in exchanges
        if "__w" in seg and "hashpartitioning" in seg
    ]
    # window-key (__g) shuffles are ids-only
    for seg in exchanges:
        if "__g" in seg or "__t#" in seg:
            assert "__w" not in seg, seg
    # at most the one attach-side exchange may carry the arrays
    assert len(carrying_text) <= 1, p
    # the r6 superlinear wall (VERDICT #1): coverage used to shuffle
    # ngram× the flagged-window count in (__id, __t) rows. Flagged
    # windows now re-cluster by __id BEFORE the explode, so no
    # exchange may carry the exploded position column at all, and the
    # id-recluster exchange must exist (explicit REPARTITION_BY_NUM —
    # AQE-coalesce-proof for the downstream fan-out)
    assert not any("__t#" in seg for seg in exchanges), p
    assert any(
        "hashpartitioning(__id" in seg and "REPARTITION_BY_NUM" in seg
        for seg in exchanges
    ), p


def test_container_probe_entries_are_map_only(spark, sf_dir):
    """The r8 codec/audio gate entries (MP4/WebM probes, WAV
    features) must be exchange-free: one pruned parquet scan of
    doc_id feeding mapInPandas — per-row container arithmetic never
    justifies a shuffle, and the doc_id filter must reach the scan."""
    import scratchdata_spark.inventory_extras  # noqa: F401 (registers)
    from scratchdata_spark.inventory import REGISTRY

    for name in (
        "x_multimodal_codec_mp4",
        "x_multimodal_codec_webm",
        "x_audio_features",
    ):
        fn, _ = REGISTRY[name]
        p = plan(fn(spark, sf_dir))
        assert "Exchange" not in p, (name, p)
        assert "MapInPandas" in p, name
        assert "LessThan(doc_id,200)" in p, (name, p)
        # column pruning: the scan reads only doc_id, never text/bytes
        read_schema = p.split("ReadSchema: ", 1)[1].split("\n", 1)[0]
        assert "text" not in read_schema, (name, read_schema)


def test_minhash_verify_prunes_before_shingling(spark, sf_dir):
    """The minhash verify branch may rebuild shingle sets only for
    docs that survived the candidate screen.  Catalyst's
    PushDownLeftSemiAntiJoin does NOT move a semi join below a
    Project (verified on 4.1 with a minimal repro), so the pruning
    join must sit below the shingle projection in the operator code
    itself — the r13 plan capture caught the projected ``__shset``
    arrays (~8× the text bytes) being built for EVERY doc and hauled
    through the join's shuffle.  Gate: no shuffle exchange may carry
    the shingle-hash arrays; they exist only above the semi join
    (broadcast of the pruned survivor relation is fine)."""
    from scratchdata_spark.operators.dedup import minhash_lsh_pairs

    d = load(spark, sf_dir)["documents"]
    p = plan(minhash_lsh_pairs(d, "doc_id", "text"))
    assert "__shset" in p, p  # the verify branch exists
    for block in p.split("\n\n"):
        head = block.split("\n", 1)[0]
        if ") Exchange" in head and "__shset" in block:
            raise AssertionError(f"shingle arrays cross a shuffle:\n{block}")
