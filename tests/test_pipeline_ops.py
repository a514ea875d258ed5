"""Corpus-preparation operators (operators/pipeline.py): split
determinism, stratified rates, packing invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from scratchdata_spark.operators.pipeline import (
    pack_sequences,
    stratified_sample,
    train_val_split,
)


def _docs(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
        (F.col("id") % 4).cast("string").alias("source"),
        F.concat(F.lit("doc text number "), F.col("id").cast("string"),
                 F.lit(" lorem ipsum dolor sit amet")).alias("text"),
    )


def test_split_is_deterministic_and_content_keyed(spark):
    d = _docs(spark)
    a = {r["doc_id"]: r["split"] for r in train_val_split(d).collect()}
    b = {r["doc_id"]: r["split"] for r in train_val_split(d.repartition(7)).collect()}
    assert a == b  # partitioning-independent
    vals = sum(1 for s in a.values() if s == "val")
    # ~13/256 ≈ 5%; loose bounds for 500 docs
    assert 4 <= vals <= 60
    # same text, different id → same split (content-keyed)
    dup = d.withColumn("doc_id", F.col("doc_id") + 10_000)
    c = {r["doc_id"] - 10_000: r["split"] for r in train_val_split(dup).collect()}
    assert a == c


def test_stratified_sample_rates(spark):
    d = _docs(spark, 900)
    kept = stratified_sample(d, "lang", {"en": 64}).groupBy("lang").count()
    by = {r["lang"]: r["count"] for r in kept.collect()}
    n_en = d.filter(F.col("lang") == "en").count()
    n_de = d.filter(F.col("lang") == "de").count()
    assert by["de"] == n_de  # default 256/256: keep all
    assert 0.13 * n_en <= by.get("en", 0) <= 0.40 * n_en  # ~64/256 = 25%


def test_pack_sequences_invariants(spark):
    d = _docs(spark, 200)
    out = pack_sequences(d, "source", context_tokens=32).collect()
    assert len(out) == 200
    by_group: dict = {}
    for r in sorted(out, key=lambda r: (r["source"], r["doc_id"])):
        by_group.setdefault(r["source"], []).append(r)
    for rows in by_group.values():
        cum = 0
        for r in rows:
            assert r["pack_id"] == cum // 32
            assert r["pack_offset"] == cum % 32
            cum += r["n_tokens"]
        # pack ids are nondecreasing in doc order
        ids = [r["pack_id"] for r in rows]
        assert ids == sorted(ids)


def test_split_zero_val_fraction_keeps_everything_train(spark):
    d = _docs(spark, 300)
    out = train_val_split(d, val_fraction_256=0).select("split").distinct().collect()
    assert [r["split"] for r in out] == ["train"]


# ------------------------------------------------------ decontamination


def test_word_ngrams_basic_and_short_text(spark):
    from pyspark.sql import functions as F

    from scratchdata_spark.operators.pipeline import word_ngrams

    df = spark.createDataFrame(
        [("a b c d",), ("a  B c",), ("x",), ("",)], "t string"
    )
    got = [r.g for r in df.select(word_ngrams(F.col("t"), 3).alias("g")).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == ["a b c"]  # normalization: collapse + lowercase
    assert got[2] == []  # shorter than n
    assert got[3] == []


def test_word_ngrams_distinct(spark):
    from pyspark.sql import functions as F

    from scratchdata_spark.operators.pipeline import word_ngrams

    df = spark.createDataFrame([("a b a b a b",)], "t string")
    got = df.select(word_ngrams(F.col("t"), 2).alias("g")).collect()[0].g
    assert sorted(got) == ["a b", "b a"]


def test_decontaminate_counts_and_flags(spark):
    from scratchdata_spark.operators.pipeline import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),  # shares 2 distinct 3-grams
            (2, "totally unrelated words here now"),
            (3, "quick brown fox somewhere else entirely"),  # shares 1
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox sat down")], "doc_id long, text string"
    )
    out = {
        r.doc_id: (r.n_contaminated_ngrams, r.contaminated)
        for r in decontaminate(docs, bench, n=3, min_hits=2).collect()
    }
    assert out[1] == (2, True)  # 'the quick brown', 'quick brown fox'
    assert out[2] == (0, False)
    assert out[3] == (1, False)  # below min_hits


def test_decontaminate_keeps_all_rows_and_columns(spark):
    from scratchdata_spark.operators.pipeline import decontaminate

    docs = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "d e f", "de")],
        "doc_id long, text string, lang string",
    )
    bench = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    out = decontaminate(docs, bench, n=3)
    assert out.count() == 2
    assert set(out.columns) == {
        "doc_id", "text", "lang", "n_contaminated_ngrams", "contaminated"
    }


# ----------------------------------------------------- global shuffle


def test_global_shuffle_deterministic_and_balanced(spark):
    from scratchdata_spark.operators.pipeline import global_shuffle

    docs = spark.createDataFrame(
        [(i, f"body {i}") for i in range(400)], "doc_id long, text string"
    )
    a = {r.doc_id: (r.shard, r.pos) for r in global_shuffle(docs, n_shards=4).collect()}
    b = {r.doc_id: (r.shard, r.pos) for r in global_shuffle(docs, n_shards=4).collect()}
    assert a == b  # same seed → identical assignment
    shards = [s for s, _ in a.values()]
    assert set(shards) == {0, 1, 2, 3}
    # roughly balanced: no shard takes more than half the corpus
    from collections import Counter

    assert max(Counter(shards).values()) < 200
    # positions are a 1..n permutation within each shard
    by_shard: dict = {}
    for s, p in a.values():
        by_shard.setdefault(s, []).append(p)
    for ps in by_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_global_shuffle_covers_every_shard_at_16_and_beyond(spark):
    """Regression: the original shard formula used raw ascii codes
    with base-256 weights — mod any divisor of 256 only the THIRD hex
    char survived, and its ascii values mod 16 cover just 0–9, so
    shards 10–15 were structurally empty at n_shards=16. The hex-VALUE
    formula is uniform on 12 bits: every shard must be populated and
    roughly balanced."""
    from collections import Counter

    from scratchdata_spark.operators.pipeline import global_shuffle

    docs = spark.createDataFrame(
        [(i, f"body {i}") for i in range(3200)], "doc_id long, text string"
    )
    for n in (16, 100):
        got = global_shuffle(docs, n_shards=n)
        counts = Counter(r.shard for r in got.collect())
        assert set(counts) == set(range(n)), sorted(set(range(n)) - set(counts))
        assert max(counts.values()) < 3 * 3200 / n  # no gross skew
    # beyond the 16 bits the digest prefix carries, shards would be
    # structurally empty again — refuse loudly instead
    import pytest

    with pytest.raises(ValueError, match="65536"):
        global_shuffle(docs, n_shards=65537)


def test_global_shuffle_seed_changes_order(spark):
    from scratchdata_spark.operators.pipeline import global_shuffle

    docs = spark.createDataFrame(
        [(i, "x") for i in range(200)], "doc_id long, text string"
    )
    a = {r.doc_id: (r.shard, r.pos) for r in global_shuffle(docs, seed="e0").collect()}
    b = {r.doc_id: (r.shard, r.pos) for r in global_shuffle(docs, seed="e1").collect()}
    assert a != b


def test_cap_per_group_caps_and_is_deterministic(spark):
    from scratchdata_spark.operators.pipeline import cap_per_group

    d = _docs(spark, 400)  # 4 sources × 100 docs
    capped = cap_per_group(d, "source", 25)
    by = {r["source"]: r["count"]
          for r in capped.groupBy("source").count().collect()}
    assert all(v == 25 for v in by.values())
    # winners are content-hash chosen: partitioning-independent
    a = sorted(r["doc_id"] for r in capped.collect())
    b = sorted(
        r["doc_id"]
        for r in cap_per_group(d.repartition(13), "source", 25).collect()
    )
    assert a == b
    # groups under the cap keep every row
    small = cap_per_group(d.filter(F.col("doc_id") < 10), "source", 25)
    assert small.count() == 10


def test_resample_by_temperature_rates(spark):
    from scratchdata_spark.operators.pipeline import resample_by_temperature

    # skewed sources: 0 → 600 docs, 1 → 150, 2 → 50
    d = spark.range(800).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 600, "big")
        .when(F.col("id") < 750, "mid")
        .otherwise("small")
        .alias("source"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
    )
    out = resample_by_temperature(d, "source", alpha=0.5)
    by = {r["source"]: r["count"]
          for r in out.groupBy("source").count().collect()}
    # smallest group keeps everything (keep-rate scaled to 1.0)
    assert by["small"] == 50
    # bigger groups are downsampled harder: expected keep ~ sqrt(50/n)
    assert by["mid"] < 150 and by["big"] < 600
    assert by["big"] / 600 < by["mid"] / 150
    # alpha=1 keeps the natural distribution untouched
    assert resample_by_temperature(d, "source", alpha=1.0).count() == 800
    # deterministic across partitionings
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in resample_by_temperature(
            d.repartition(11), "source", alpha=0.5
        ).collect()
    )
    assert a == b


def test_chunk_documents_windows(spark):
    import pytest

    from scratchdata_spark.operators.pipeline import chunk_documents

    d = spark.createDataFrame(
        [(1, "a" * 250), (2, "xy"), (3, "")], ["doc_id", "text"]
    )
    out = chunk_documents(d, chunk_chars=100, overlap_chars=20).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: offsets 0,80,160,240 → 4 chunks; last one short (10 chars)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_ix"])
    assert [r["chunk_start"] for r in c1] == [0, 80, 160, 240]
    assert [len(r["chunk_text"]) for r in c1] == [100, 100, 90, 10]
    # consecutive chunks overlap by exactly 20 chars
    assert c1[0]["chunk_text"][-20:] == c1[1]["chunk_text"][:20]
    # short doc: one whole chunk; empty doc: one empty chunk (kept,
    # not dropped — callers filter if they want)
    assert [r["chunk_text"] for r in by_doc[2]] == ["xy"]
    assert [r["chunk_text"] for r in by_doc[3]] == [""]
    with pytest.raises(ValueError):
        chunk_documents(d, chunk_chars=64, overlap_chars=64)


def test_resample_near_unity_keep_rate_is_not_truncated(spark):
    """Two near-equal large groups: the slightly-larger one's keep
    rate rounds to the 65536 grid top — the threshold must cap at
    'ffff' (keep ~everything), not overflow to the 5-char '10000'
    whose lexicographic compare drops ~94% of the group."""
    from scratchdata_spark.operators.pipeline import resample_by_temperature

    d = spark.range(2001).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, "a").otherwise("b").alias("source"),
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
    )
    out = resample_by_temperature(d, "source", alpha=0.5)
    by = {r["source"]: r["count"]
          for r in out.groupBy("source").count().collect()}
    assert by["a"] == 1000  # smaller group: keep-rate exactly 1
    # larger group keeps ~all (>= 99%), never the ~6% of the bug
    assert by["b"] >= 990
