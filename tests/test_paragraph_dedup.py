"""Corpus-wide paragraph dedup (dedup.dedup_paragraphs — the CCNet
preprocessing step): canonical-occurrence election, cross- and
within-document removal, blank-line immunity, NULL containment, and
the drop-set plan contract (no exploded text across an exchange)."""

from __future__ import annotations

import contextlib
import io

from scratchdata_spark.operators.dedup import dedup_paragraphs

SHARED = "subscribe to our newsletter for updates"
FOOTER = "copyright example corp all rights reserved"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_document_paragraph_removed_canonical_survives(spark):
    df = _df(
        spark,
        [
            (1, f"unique one\n{SHARED}"),
            (2, f"{SHARED}\nunique two"),
            (3, f"unique three\n{SHARED}\nmore three"),
        ],
    )
    out = {r["doc_id"]: r for r in dedup_paragraphs(df).collect()}
    # canonical = smallest (id, pos): doc 1 pos 1 beats doc 2 pos 0
    assert out[1]["text"] == f"unique one\n{SHARED}"
    assert out[2]["text"] == "unique two"
    assert out[3]["text"] == "unique three\nmore three"
    assert [out[i]["paragraphs_removed"] for i in (1, 2, 3)] == [0, 1, 1]


def test_within_document_repeats_collapse_to_first(spark):
    df = _df(spark, [(1, f"{FOOTER}\nbody text here\n{FOOTER}")])
    out = dedup_paragraphs(df).collect()[0]
    assert out["text"] == f"{FOOTER}\nbody text here"
    assert out["paragraphs_removed"] == 1


def test_normalization_case_and_whitespace_match(spark):
    df = _df(
        spark,
        [
            (1, "The  Quick   FOX"),
            (2, "the quick fox"),
        ],
    )
    out = {r["doc_id"]: r for r in dedup_paragraphs(df).collect()}
    assert out[1]["text"] == "The  Quick   FOX"  # canonical keeps original
    assert out[2]["text"] == ""
    assert out[2]["paragraphs_removed"] == 1


def test_blank_lines_never_dedup(spark):
    df = _df(spark, [(1, "a\n\nb\n\nc"), (2, "x\n\ny")])
    out = {r["doc_id"]: r for r in dedup_paragraphs(df).collect()}
    assert out[1]["text"] == "a\n\nb\n\nc"
    assert out[2]["text"] == "x\n\ny"
    assert out[1]["paragraphs_removed"] == 0


def test_null_and_empty_text_pass_through(spark):
    df = _df(spark, [(1, None), (2, ""), (3, "real\nreal")])
    out = {r["doc_id"]: r for r in dedup_paragraphs(df).collect()}
    assert out[1]["text"] is None and out[1]["paragraphs_removed"] == 0
    assert out[2]["text"] == "" and out[2]["paragraphs_removed"] == 0
    assert out[3]["text"] == "real" and out[3]["paragraphs_removed"] == 1


def test_all_paragraphs_dropped_leaves_empty_doc(spark):
    df = _df(spark, [(1, SHARED), (2, SHARED), (3, SHARED)])
    out = {r["doc_id"]: r for r in dedup_paragraphs(df).collect()}
    assert out[1]["text"] == SHARED
    assert out[2]["text"] == "" and out[3]["text"] == ""


def test_extra_columns_preserved(spark):
    df = spark.createDataFrame(
        [(1, f"a\n{SHARED}", "web"), (2, SHARED, "books")],
        "doc_id long, text string, source string",
    )
    out = {r["doc_id"]: r for r in dedup_paragraphs(df).collect()}
    assert out[1]["source"] == "web" and out[2]["source"] == "books"
    assert out[2]["text"] == ""


def test_custom_separator_is_literal(spark):
    # sep is a LITERAL: '|' splits AND rejoins as the same character
    # (a regex sep would rebuild 'a\|b' — the r10 review catch)
    df = _df(spark, [(1, f"a|{SHARED}"), (2, f"{SHARED}|b|c")])
    out = {
        r["doc_id"]: r for r in dedup_paragraphs(df, sep="|").collect()
    }
    assert out[1]["text"] == f"a|{SHARED}"
    assert out[2]["text"] == "b|c"
    assert out[2]["paragraphs_removed"] == 1


def test_plan_no_python_and_no_exploded_text_exchange(spark):
    df = _df(spark, [(1, "a\nb"), (2, "b\nc")])
    out = dedup_paragraphs(df)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="formatted")
    p = buf.getvalue()
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # every Exchange carries digests/ids/positions or whole-document
    # rows — never an exploded paragraph column (__p stays map-side)
    for block in p.split("\n\n"):
        if block.strip().startswith("(") and "Exchange" in block.split("\n")[0]:
            assert "__p#" not in block, block


def test_paragraph_dedup_recipe_stage(spark):
    from scratchdata_spark.operators.recipe import run_recipe

    df = _df(spark, [(1, f"a\n{SHARED}"), (2, f"{SHARED}\nb")])
    out, manifest = run_recipe(df, [{"op": "paragraph_dedup"}])
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got == {1: f"a\n{SHARED}", 2: "b"}
    assert manifest[0]["rows_in"] == manifest[0]["rows_out"] == 2
