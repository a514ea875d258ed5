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
