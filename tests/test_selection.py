"""Hashed n-gram data selection (operators/selection.py): feature-map
parity across the three engines' twins, deterministic classifier
training, scoring/DSIR value checks against brute-force numpy, empty
and token-free document handling, driver valves, and plan gates (no
Python in any scoring plan, bounded exchanges)."""

from __future__ import annotations

import contextlib
import io
import math

import pytest

from scratchdata_spark.operators import selection as S

POS = [
    "the quick brown fox jumps over the lazy dog and then it rests",
    "we present the results of the experiment and discuss what it means",
    "she walked along the river and watched the light change on the water",
    "the committee agreed that the proposal should be studied in detail",
    "a long paragraph of ordinary prose tends to contain common words",
    "he explained the idea again so that everyone could follow the steps",
    "the weather was mild and the garden was full of early flowers",
    "reading the book slowly made the argument much easier to follow",
]
NEG = [
    "Home | Products | Pricing | Blog | Contact | Login",
    "click here click here click here buy now buy now",
    "404 404 404 301 500 error error error",
    "xz9 qq7 zzk vv2 pp0 mm3 kk8 jj1",
    "SALE SALE SALE 50% OFF BUY NOW LIMITED TIME",
    "lorem42 ipsum99 dolor13 sit77 amet00",
    "next prev next prev page1 page2 page3 page4",
    "download download install install upgrade upgrade now now",
]
B = 512


def _fixture_df(spark):
    rows = [(i, t, 1) for i, t in enumerate(POS)] + [
        (100 + i, t, 0) for i, t in enumerate(NEG)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


# -------------------------------------------------------- feature map


def test_spark_features_match_python_twin(spark):
    df = _fixture_df(spark)
    got = {
        (r[0], r[1]): r[2]
        for r in S.hashed_features(
            df, "doc_id", "text", buckets=B, portable=True
        ).collect()
    }
    want = {}
    for i, t, _ in [(i, t, 1) for i, t in enumerate(POS)] + [
        (100 + i, t, 0) for i, t in enumerate(NEG)
    ]:
        for b, c in S.py_feature_counts(t, B).items():
            want[(i, b)] = c
    assert got == want


def test_feature_map_unicode_and_punct_parity(spark):
    texts = [
        "Héllo—WORLD the;end",  # accents split, case folds
        "  leading and trailing  ",
        "one",
        "",
        "a b a b a b",  # repeated bigrams accumulate counts
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r[0], r[1]): r[2]
        for r in S.hashed_features(
            df, "doc_id", "text", buckets=B, portable=True
        ).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        for b, c in S.py_feature_counts(t, B).items():
            want[(i, b)] = c
    assert got == want


def test_py_features_shape():
    assert S.py_features("the quick fox") == [
        "the", "quick", "fox", "the quick", "quick fox",
    ]
    assert S.py_features("one") == ["one"]
    assert S.py_features("") == []


def test_feature_extraction_single_exchange(spark):
    df = _fixture_df(spark)
    p = _plan(S.hashed_features(df, "doc_id", "text", buckets=B))
    assert p.count("Exchange") == 1, p  # the groupBy, nothing else
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


# ---------------------------------------------------------- classifier


def test_training_is_deterministic_and_separates(spark):
    df = _fixture_df(spark)
    w1, b1 = S.train_quality_classifier(
        df, "doc_id", "text", "label", buckets=B, portable=True
    )
    w2, b2 = S.train_quality_classifier(
        df, "doc_id", "text", "label", buckets=B, portable=True
    )
    assert w1 == w2 and b1 == b2  # bit-identical reruns
    # python-twin training on the same fixture → identical weights
    rows = [(S.py_feature_counts(t, B), 1) for t in POS] + [
        (S.py_feature_counts(t, B), 0) for t in NEG
    ]
    # train_quality_classifier orders docs by id: POS ids 0..7 then NEG
    w3, b3 = S.train_logreg(rows, buckets=B)
    assert w1 == w3 and b1 == b3
    # and the model actually separates the fixture
    scored = {
        r[0]: r[1]
        for r in S.score_quality(
            df, w1, b1, id_col="doc_id", text_col="text",
            buckets=B, portable=True,
        ).collect()
    }
    assert min(scored[i] for i in range(len(POS))) > 0.5
    assert max(scored[100 + i] for i in range(len(NEG))) < 0.5


def test_scoring_matches_brute_force(spark):
    df = _fixture_df(spark)
    w, bias = S.train_quality_classifier(
        df, "doc_id", "text", "label", buckets=B, portable=True
    )
    got = {
        r[0]: r[1]
        for r in S.score_quality(
            df, w, bias, id_col="doc_id", text_col="text",
            buckets=B, portable=True,
        ).collect()
    }
    for i, t in list(enumerate(POS)) + [
        (100 + i, t) for i, t in enumerate(NEG)
    ]:
        feats = S.py_feature_counts(t, B)
        total = sum(feats.values())
        z = bias + sum(w.get(b, 0.0) * c for b, c in feats.items()) / total
        assert got[i] == pytest.approx(round(1 / (1 + math.exp(-z)), 6))


def test_token_free_documents_score_sigmoid_bias(spark):
    df = spark.createDataFrame(
        [(1, "real words here"), (2, ""), (3, "—!!—")],
        "doc_id long, text string",
    )
    out = {
        r[0]: r[1]
        for r in S.score_quality(
            df, {0: 1.0}, -0.3, id_col="doc_id", text_col="text",
            buckets=B, portable=True,
        ).collect()
    }
    expect = round(1 / (1 + math.exp(0.3)), 6)
    assert out[2] == expect and out[3] == expect
    assert len(out) == 3  # token-free docs still present


def test_training_valve_raises(spark):
    df = _fixture_df(spark)
    with pytest.raises(ValueError, match="feature rows"):
        S.train_quality_classifier(
            df, "doc_id", "text", "label", buckets=B, sample_rows=10
        )


def test_scoring_default_dispatches_to_arrow_tier(spark):
    """r13: batch 'auto' now dispatches to the Arrow LUT tier when the
    weight table fits the closure cap (measured 1.01 s vs the join
    tier's 1.36 s at sf0.1) — exactly ONE map-only MapInPandas, no
    row-at-a-time Python, no shuffle in the scoring plan."""
    df = _fixture_df(spark)
    out = S.score_quality(
        df, {1: 0.5, 2: -0.5}, 0.1, id_col="doc_id", text_col="text",
        buckets=B,
    )
    p = _plan(out)
    assert p.count("MapInPandas") == 1
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Exchange" not in p.replace("Exchange RoundRobin", "")  # fan-out only


def test_scoring_join_plan_no_python_and_broadcast_join(spark):
    df = _fixture_df(spark)
    out = S.score_quality(
        df, {1: 0.5, 2: -0.5}, 0.1, id_col="doc_id", text_col="text",
        buckets=B, plan="join",
    )
    p = _plan(out)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "MapInPandas" not in p
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoop" not in p, p


def test_scoring_arrow_join_tier_parity(spark):
    """The arrow and join tiers must produce identical scores —
    including token-free docs and both hash families."""
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, ""), (3, None),
         (4, "numbers 123 and symbols !!"), (5, "the the the")],
        "doc_id long, text string",
    )
    w = {b: (b % 7 - 3) / 4.0 for b in range(B)}
    for portable in (True, False):
        a = {
            r[0]: r[1]
            for r in S.score_quality(
                df, w, -0.2, id_col="doc_id", text_col="text",
                buckets=B, portable=portable, plan="arrow",
            ).collect()
        }
        j = {
            r[0]: r[1]
            for r in S.score_quality(
                df, w, -0.2, id_col="doc_id", text_col="text",
                buckets=B, portable=portable, plan="join",
            ).collect()
        }
        assert a == j


# ---------------------------------------------------------------- DSIR


def _dsir_brute(raw, target, buckets, alpha):
    rdist: dict[int, int] = {}
    tdist: dict[int, int] = {}
    for _, t in raw:
        for b, c in S.py_feature_counts(t, buckets).items():
            rdist[b] = rdist.get(b, 0) + c
    for _, t in target:
        for b, c in S.py_feature_counts(t, buckets).items():
            tdist[b] = tdist.get(b, 0) + c
    rt, tt = sum(rdist.values()), sum(tdist.values())
    out = {}
    for i, t in raw:
        lw = 0.0
        for b, c in S.py_feature_counts(t, buckets).items():
            lr = math.log((tdist.get(b, 0) + alpha) / (tt + alpha * buckets)) - math.log(
                (rdist.get(b, 0) + alpha) / (rt + alpha * buckets)
            )
            lw += c * lr
        out[i] = round(lw, 6)
    return out


def test_dsir_logweights_match_brute_force(spark):
    raw = [(i, t) for i, t in enumerate(POS + NEG)]
    target = [(i, t) for i, t in enumerate(POS[:4])]
    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    got = {
        r[0]: r[1]
        for r in S.dsir_logweights(
            rdf, tdf, "doc_id", "text", buckets=B, portable=True
        ).collect()
    }
    want = _dsir_brute(raw, target, B, 1.0)
    for i in got:
        assert got[i] == pytest.approx(want[i], abs=2e-6)


def test_dsir_prefers_target_like_documents(spark):
    # target = the prose distribution; junk vocabulary is absent from
    # it, so junk documents accumulate only smoothing-floor terms and
    # prose documents only above-floor ones.  (With a 2-document
    # target the property is weaker — DSIR's raw-sum weights are
    # length-biased, which is the published estimator's behavior.)
    raw = [(i, t) for i, t in enumerate(POS + NEG)]
    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(POS)], "doc_id long, text string"
    )
    top = S.dsir_select(
        rdf, tdf, "doc_id", "text", k=len(POS), buckets=B, portable=True
    ).collect()
    ids = {r[0] for r in top}
    assert len(ids & set(range(len(POS)))) >= len(POS) - 1


def test_dsir_token_free_document_weights_zero(spark):
    rdf = spark.createDataFrame(
        [(1, "the common words"), (2, "")], "doc_id long, text string"
    )
    tdf = spark.createDataFrame([(1, "the words")], "doc_id long, text string")
    got = {r[0]: r[1] for r in S.dsir_logweights(
        rdf, tdf, "doc_id", "text", buckets=B, portable=True
    ).collect()}
    assert got[2] == 0.0 and len(got) == 2


def test_dsir_plan_no_python_bounded_exchanges(spark):
    rdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(POS + NEG)], "doc_id long, text string"
    )
    tdf = spark.createDataFrame(
        [(0, POS[0])], "doc_id long, text string"
    )
    out = S.dsir_logweights(rdf, tdf, "doc_id", "text", buckets=B)
    p = _plan(out)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # feature agg (raw, reused) + feature agg (target) + two dist aggs
    # + per-doc agg; the dist/ratio side is broadcast back — no join
    # of two corpus-sized sides anywhere
    assert "BroadcastHashJoin" in p, p


def test_dsir_select_deterministic_tiebreak(spark):
    # two identical docs → equal rounded weights → id ascending wins
    rdf = spark.createDataFrame(
        [(5, "same text"), (3, "same text"), (9, "other junk zz")],
        "doc_id long, text string",
    )
    tdf = spark.createDataFrame([(1, "same text")], "doc_id long, text string")
    top = S.dsir_select(
        rdf, tdf, "doc_id", "text", k=2, buckets=B, portable=True
    ).collect()
    assert [r[0] for r in top] == [3, 5]


# ------------------------------------------------------- recipe stage


def test_quality_model_recipe_stage_filters_and_accounts(spark):
    from scratchdata_spark.operators.recipe import run_recipe

    df = _fixture_df(spark)
    w, bias = S.train_quality_classifier(
        df, "doc_id", "text", "label", buckets=B, portable=True
    )
    out, manifest = run_recipe(
        df.select("doc_id", "text"),
        [{"op": "quality_model", "weights": w, "bias": bias,
          "buckets": B, "portable": True, "min_prob": 0.5}],
    )
    kept = {r[0] for r in out.select("doc_id").collect()}
    assert kept == set(range(len(POS)))  # junk filtered, prose kept
    assert manifest[0]["rows_in"] == len(POS) + len(NEG)
    assert manifest[0]["rows_out"] == len(POS)
    # the stage keeps the caller's full row, not the scoring projection
    assert set(out.columns) == {"doc_id", "text"}


def test_quality_model_requires_trained_params(spark):
    from scratchdata_spark.operators.recipe import run_recipe

    df = _fixture_df(spark)
    with pytest.raises(ValueError, match="required recipe parameters"):
        run_recipe(df, [{"op": "quality_model", "min_prob": 0.5}])


# ----------------------------------------------- property-based parity


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_texts = st.lists(
    st.text(max_size=60),  # full unicode — lower()/split parity domain
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_texts)
def test_feature_map_parity_property(spark, texts):
    """Spark-extracted hashed features == the Python twin for
    ARBITRARY unicode text — the contract the classifier's trainer
    and every oracle rests on (one drift in lower()/split/md5 and the
    trained weights stop matching the scoring plan's features)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r[0], r[1]): r[2]
        for r in S.hashed_features(
            df, "doc_id", "text", buckets=B, portable=True
        ).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        for bk, c in S.py_feature_counts(t, B).items():
            want[(i, bk)] = c
    assert got == want


# ---------------------------------------------------------- array tier


def test_array_tier_matches_join_tier(spark):
    df = _fixture_df(spark)
    w, bias = S.train_quality_classifier(
        df, "doc_id", "text", "label", buckets=B, portable=True
    )
    kw = dict(id_col="doc_id", text_col="text", buckets=B, portable=True)
    a = {r[0]: r[1] for r in S.score_quality(df, w, bias, plan="array", **kw).collect()}
    b = {r[0]: r[1] for r in S.score_quality(df, w, bias, plan="join", **kw).collect()}
    assert a == b
    # auto dispatches BATCH input to the join tier (codegen wins at
    # scale: 40.4 s vs 69.4 s at the 100x soak)
    c = {r[0]: r[1] for r in S.score_quality(df, w, bias, **kw).collect()}
    assert c == b


def test_array_tier_zero_shuffle_plan(spark):
    df = _fixture_df(spark)
    out = S.score_quality(
        df, {1: 0.5, 2: -0.5}, 0.1, id_col="doc_id", text_col="text",
        buckets=B, plan="array",
    )
    p = _plan(out)
    assert "Exchange" not in p, p  # whole score inside the scan stage
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Join" not in p


def test_array_tier_token_free_and_null(spark):
    df = spark.createDataFrame(
        [(1, "words here"), (2, ""), (3, None)], "doc_id long, text string"
    )
    out = {
        r[0]: r[1]
        for r in S.score_quality(
            df, {0: 1.0}, -0.3, id_col="doc_id", text_col="text",
            buckets=B, plan="array",
        ).collect()
    }
    expect = round(1 / (1 + math.exp(0.3)), 6)
    assert out[2] == expect and out[3] == expect and len(out) == 3


def test_score_quality_plan_validation(spark):
    df = _fixture_df(spark)
    with pytest.raises(ValueError, match="plan"):
        S.score_quality(
            df, {}, 0.0, id_col="doc_id", text_col="text", buckets=B,
            plan="bogus",
        )


def test_array_tier_scores_a_stream(spark, tmp_path):
    """The array tier is a pure column expression, so it scores a
    STREAMING DataFrame directly — the crawl-time quality gate shape
    (no aggregation state, no watermark, plain append mode)."""
    src = tmp_path / "in"
    src.mkdir()
    df = _fixture_df(spark).select("doc_id", "text")
    df.coalesce(1).write.parquet(str(src / "batch0"))
    w, bias = S.train_quality_classifier(
        _fixture_df(spark), "doc_id", "text", "label",
        buckets=B, portable=True,
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src / "*")
    )
    # auto must dispatch STREAMING input to the array tier
    scored = S.score_quality(
        stream, w, bias, id_col="doc_id", text_col="text",
        buckets=B, portable=True,
    )
    q = (
        scored.writeStream.format("memory")
        .queryName("qscores")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r[0]: r[1] for r in spark.sql("SELECT * FROM qscores").collect()
    }
    want = {
        r[0]: r[1]
        for r in S.score_quality(
            df, w, bias, id_col="doc_id", text_col="text",
            buckets=B, portable=True, plan="array",
        ).collect()
    }
    assert got == want and len(got) == 16


# ------------------------------------------- DSIR fit-offline / gate-online


def test_dsir_table_gate_matches_batch_weights(spark):
    raw = [(i, t) for i, t in enumerate(POS + NEG)]
    target = [(i, t) for i, t in enumerate(POS[:4])]
    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    table, default = S.dsir_logratio_table(
        rdf, tdf, "text", buckets=B, portable=True
    )
    gated = {
        r[0]: r[1]
        for r in rdf.select(
            "doc_id",
            S.dsir_score_expr(
                table, default, "text", buckets=B, portable=True
            ).alias("w"),
        ).collect()
    }
    batch = {
        r[0]: r[1]
        for r in S.dsir_logweights(
            rdf, tdf, "doc_id", "text", buckets=B, portable=True
        ).collect()
    }
    for i in batch:
        assert gated[i] == pytest.approx(batch[i], abs=2e-6)


def test_dsir_gate_is_zero_shuffle_and_streams(spark, tmp_path):
    rdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(POS + NEG)], "doc_id long, text string"
    )
    tdf = spark.createDataFrame(
        [(0, POS[0])], "doc_id long, text string"
    )
    table, default = S.dsir_logratio_table(
        rdf, tdf, "text", buckets=B, portable=True
    )
    expr = S.dsir_score_expr(table, default, "text", buckets=B, portable=True)
    p = _plan(rdf.select("doc_id", expr.alias("w")))
    assert "Exchange" not in p and "Join" not in p, p
    # and it gates a stream in append mode
    src = tmp_path / "in"
    src.mkdir()
    rdf.coalesce(1).write.parquet(str(src / "b0"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src / "*")
    )
    q = (
        stream.select("doc_id", expr.alias("w"))
        .writeStream.format("memory")
        .queryName("dsirgate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r[0]: r[1] for r in spark.sql("SELECT * FROM dsirgate").collect()}
    want = {
        r[0]: r[1]
        for r in rdf.select("doc_id", expr.alias("w")).collect()
    }
    assert got == want


def test_dsir_gate_bucket_cap(spark):
    with pytest.raises(ValueError, match="buckets"):
        S.dsir_score_expr({}, 0.0, "text", buckets=100_000)


def test_dsir_select_recipe_stage(spark):
    from scratchdata_spark.operators.recipe import run_recipe

    rdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(POS + NEG)], "doc_id long, text string"
    )
    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(POS)], "doc_id long, text string"
    )
    out, manifest = run_recipe(
        rdf,
        [{"op": "dsir_select", "target": tdf, "k": 5, "buckets": B,
          "portable": True}],
    )
    assert out.count() == 5
    assert manifest[0]["rows_out"] == 5
    assert set(out.columns) == {"doc_id", "text"}
    with pytest.raises(ValueError, match="required recipe parameters"):
        run_recipe(rdf, [{"op": "dsir_select", "k": 5}])


def test_in_plan_tiers_null_text_under_legacy_size_of_null(spark):
    """size(NULL) = -1 under ANSI-off/legacy configs: the token-free
    guard must be <= 0, not == 0, or NULL-text rows score NULL and a
    downstream min_prob gate silently drops them (r10 third review
    catch, shared guard in _dense_dot_expr/_no_tokens)."""
    prev = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        df = spark.createDataFrame(
            [(1, None), (2, "real words")], "doc_id long, text string"
        )
        out = {
            r[0]: r[1]
            for r in S.score_quality(
                df, {0: 1.0}, -0.3, id_col="doc_id", text_col="text",
                buckets=B, portable=True, plan="array",
            ).collect()
        }
        assert out[1] == round(1 / (1 + math.exp(0.3)), 6)  # not None
        table, default = ({0: 0.5}, -0.1)
        got = {
            r[0]: r[1]
            for r in df.select(
                "doc_id",
                S.dsir_score_expr(
                    table, default, "text", buckets=B, portable=True
                ).alias("w"),
            ).collect()
        }
        assert got[1] == 0.0  # not None
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.ansi.enabled")
        else:
            spark.conf.set("spark.sql.ansi.enabled", prev)


def test_streaming_bucket_cap_message_does_not_suggest_join(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    spark.createDataFrame([(1, "x")], "doc_id long, text string")\
        .write.parquet(str(src / "b0"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src / "*")
    )
    with pytest.raises(ValueError, match="reduce buckets"):
        S.score_quality(
            stream, {0: 1.0}, 0.0, id_col="doc_id", text_col="text",
            buckets=100_000,
        )


def test_token_free_documents_train_as_zero_vectors(spark):
    # A token-free doc emits no feature rows, but its label must still
    # reach the optimizer (as a zero vector — moves only the bias),
    # matching a Python-side train_logreg over the same labeled rows
    # (r10 advisor catch: the old inner join dropped it entirely).
    df = spark.createDataFrame(
        [(0, POS[0], 1), (1, POS[1], 1), (2, "", 0), (3, NEG[0], 0)],
        "doc_id long, text string, label int",
    )
    w, b = S.train_quality_classifier(
        df, "doc_id", "text", "label", buckets=B, portable=True
    )
    rows = [
        (S.py_feature_counts(POS[0], B), 1),
        (S.py_feature_counts(POS[1], B), 1),
        ({}, 0),  # the empty doc, id order 2
        (S.py_feature_counts(NEG[0], B), 0),
    ]
    w_ref, b_ref = S.train_logreg(rows, buckets=B)
    assert w == w_ref and b == b_ref
    # and dropping the empty doc changes the fit — the label is live
    w_drop, b_drop = S.train_logreg(rows[:2] + rows[3:], buckets=B)
    assert (w, b) != (w_drop, b_drop)
