"""Gate-tier parity battery (r13, VERDICT r12 #3): the admission
chain's trained gates run as either the expression tier
(quality_prob_expr / dsir_score_expr — dense array-literal HOFs) or
the Arrow LUT tier (one feature-hash HOF + a mapInPandas numpy
gather).  The tiers must agree on every VALUE and every survivor —
identical tokenizer, hash, rounding (HALF_UP, the Spark round
semantics), token-free constants, and exp saturation.  A divergence
here is a silent wrong admission at 100 TB."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from scratchdata_spark.streaming.admission import admission_stages

VOCAB = (
    "the quick brown fox jumps over lazy dog data spark model train"
    " clean web page click here buy now news"
).split()


def _docs(spark, n=200, seed=7):
    random.seed(seed)
    rows = []
    for i in range(n):
        k = random.randint(0, 60)
        text = (
            " ".join(random.choice(VOCAB) for _ in range(k))
            if k
            else ("" if i % 3 else None)
        )
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _model(seed=7):
    random.seed(seed + 1)
    weights = {
        b: random.uniform(-1, 1) for b in random.sample(range(4096), 800)
    }
    table = {
        b: random.uniform(-2, 2) for b in random.sample(range(8192), 1500)
    }
    return weights, table


_BASE = dict(
    robots_rules=None, blocked_domains=None, boilerplate=None,
    min_score=None,
)


def _both(docs, **kw):
    a = admission_stages(docs, **_BASE, **kw, gate_tier="expr")
    b = admission_stages(docs, **_BASE, **kw, gate_tier="arrow")
    return (
        a.orderBy("doc_id").collect(),
        b.orderBy("doc_id").collect(),
    )


def test_tier_parity_both_gates(spark):
    weights, table = _model()
    a, b = _both(
        _docs(spark),
        weights=weights, bias=0.13, qc_buckets=4096, min_prob=0.5,
        dsir_table=table, dsir_default=-0.37, dsir_buckets=8192,
        dsir_min=-1.0,
    )
    assert a == b  # values AND survivors, incl. token-free/NULL rows
    assert len(a) > 0


def test_tier_parity_single_gates(spark):
    weights, table = _model()
    docs = _docs(spark, n=150, seed=11)
    a, b = _both(
        docs, weights=weights, bias=-0.4, qc_buckets=4096, min_prob=0.4
    )
    assert a == b and len(a) > 0
    a, b = _both(
        docs,
        dsir_table=table, dsir_default=0.2, dsir_buckets=8192,
        dsir_min=-0.5,
    )
    assert a == b and len(a) > 0


def test_tier_parity_portable_hash(spark):
    weights, table = _model(seed=3)
    a, b = _both(
        _docs(spark, n=120, seed=3),
        weights=weights, bias=0.0, qc_buckets=2048, min_prob=0.5,
        qc_portable=True,
        dsir_table=table, dsir_default=0.0, dsir_buckets=2048,
        dsir_min=-1e18, dsir_portable=True,
    )
    assert a == b and len(a) > 0


def test_arrow_tier_plan_shape(spark):
    """One MapInPandas (the LUT pass), zero exchanges, zero
    row-at-a-time Python; the expression tier has zero Python nodes
    — and 'auto' resolves to the Arrow tier (the r13 measured
    dispatch)."""
    weights, table = _model()
    kw = dict(
        weights=weights, bias=0.1, qc_buckets=4096, min_prob=0.5,
        dsir_table=table, dsir_default=0.0, dsir_buckets=8192,
        dsir_min=-1.0,
    )
    docs = _docs(spark, n=40)
    arrow = admission_stages(docs, **_BASE, **kw, gate_tier="arrow")
    plan = arrow._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    auto = admission_stages(docs, **_BASE, **kw)
    assert auto._jdf.queryExecution().executedPlan().toString().count(
        "MapInPandas"
    ) == 1
    expr = admission_stages(docs, **_BASE, **kw, gate_tier="expr")
    eplan = expr._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in eplan and "EvalPython" not in eplan


def test_quarantine_rows_bypass_both_tiers(spark):
    weights, table = _model()
    docs = _docs(spark, n=60, seed=5).withColumn(
        "__quarantined", F.col("doc_id") % 10 == 0
    )
    kw = dict(
        weights=weights, bias=0.1, qc_buckets=4096, min_prob=0.99,
        dsir_table=table, dsir_default=0.0, dsir_buckets=8192,
        dsir_min=1e18,  # admit nothing — only quarantine survives
    )
    for tier in ("expr", "arrow"):
        out = admission_stages(
            docs, **_BASE, **kw, gate_tier=tier
        ).collect()
        assert {r["doc_id"] % 10 for r in out} == {0}
        assert all(
            r["quality_prob"] is None and r["dsir_logweight"] is None
            for r in out
        )


def test_mixed_hash_families_refuse_arrow(spark):
    """One hash array can't serve two hash families: explicit arrow
    raises; auto falls back to the expression tier."""
    weights, table = _model()
    docs = _docs(spark, n=20)
    kw = dict(
        weights=weights, bias=0.0, qc_buckets=1024, min_prob=0.5,
        qc_portable=True,
        dsir_table=table, dsir_default=0.0, dsir_buckets=1024,
        dsir_min=-1e18, dsir_portable=False,
    )
    with pytest.raises(ValueError, match="hash family"):
        admission_stages(docs, **_BASE, **kw, gate_tier="arrow")
    auto = admission_stages(docs, **_BASE, **kw)
    assert "MapInPandas" not in (
        auto._jdf.queryExecution().executedPlan().toString()
    )


def test_round_half_up_matches_spark(spark):
    """_round_half_up must reproduce Spark's round(double, 6) —
    HALF_UP on the exact binary double — including 5-boundary and
    negative values (Python's round is half-even and diverges)."""
    from scratchdata_spark.operators.selection import _round_half_up

    xs = [
        0.1234565, -0.1234565, 0.1234575, -0.1234575, 0.9999995,
        -0.9999995, 1.5e-7, -1.5e-7, 2.5e-7, 0.0, 1.0, -3.7654321,
        12.3456785, 0.49999949999, 0.50000050001,
    ]
    got = [_round_half_up(x, 6) for x in xs]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    want = [
        r["r"]
        for r in df.select(F.round("x", 6).alias("r")).collect()
    ]
    assert got == want
