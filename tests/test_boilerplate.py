"""Paragraph-level boilerplate removal (operators/text.py
remove_boilerplate, jusText-style heuristics) and the paragraph-
preserving HTML extraction that feeds it (warc.html_to_text
keep_paragraphs=True)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from scratchdata_spark.operators import warc as W
from scratchdata_spark.operators.text import remove_boilerplate

PROSE = (
    "This is a real paragraph of prose with enough words and the"
    " usual density of function words that a reader would expect."
)
PROSE2 = (
    "The second paragraph also reads like language, because it is"
    " written in sentences and not as navigation chrome."
)
NAV = "Home | Products | Pricing | Blog | Contact"
COPYRIGHT = "Copyright 2024 ExampleCorp All Rights Reserved"
NUMBERS = "2024 12 31 99.99 17 42 2038 01 19"
SHORT = "Read more"


def test_remove_boilerplate_keeps_prose_drops_chrome(spark):
    doc = "\n".join([NAV, PROSE, SHORT, PROSE2, NUMBERS, COPYRIGHT])
    df = spark.createDataFrame(
        [(1, doc), (2, None), (3, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in remove_boilerplate(df).collect()}
    assert got[1].text == PROSE + "\n" + PROSE2
    assert 0.3 < got[1].boilerplate_fraction < 0.7
    assert got[2].text is None and got[2].boilerplate_fraction is None
    assert got[3].text == "" and got[3].boilerplate_fraction == 0.0
    # schema: out col replaces text, fraction added, order preserved
    assert remove_boilerplate(df).columns == [
        "doc_id", "text", "boilerplate_fraction"
    ]
    # out_col keeps the original when asked
    kept = remove_boilerplate(df, out_col="clean").collect()[0]
    assert kept.clean  # populated


def test_remove_boilerplate_is_map_only_column_algebra(spark):
    df = spark.createDataFrame([(1, PROSE)], "doc_id long, text string")
    out = remove_boilerplate(df)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="simple")
    p = buf.getvalue()
    assert "Exchange" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "MapInPandas" not in p


def test_html_to_text_keep_paragraphs_feeds_the_filter(spark):
    html = (
        "<html><head><script>x()</script></head><body>"
        "<nav>Home | Products | Pricing | Blog | Contact</nav>"
        f"<h1>A headline that is long enough to be kept if it is prose"
        f" and contains the usual words</h1>"
        f"<p>{PROSE}</p><p>{PROSE2}</p>"
        "<footer>Copyright 2024 ExampleCorp All Rights Reserved"
        "</footer></body></html>"
    ).encode()
    text = W.html_to_text(html, keep_paragraphs=True)
    lines = text.split("\n")
    assert PROSE in lines and PROSE2 in lines
    assert "Home | Products | Pricing | Blog | Contact" in lines
    # default flat mode unchanged (oracle/fingerprint stability)
    flat = W.html_to_text(html)
    assert "\n" not in flat
    # end to end: extraction -> distributed boilerplate filter
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = remove_boilerplate(df).collect()[0]
    kept = got.text.split("\n")
    assert PROSE in kept and PROSE2 in kept
    assert all("Copyright" not in ln for ln in kept)
    assert all("| Pricing |" not in ln for ln in kept)


def test_remove_boilerplate_single_paragraph_document(spark):
    df = spark.createDataFrame(
        [(1, PROSE), (2, NAV)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in remove_boilerplate(df).collect()}
    assert got[1].text == PROSE and got[1].boilerplate_fraction == 0.0
    assert got[2].text == "" and got[2].boilerplate_fraction == 1.0


def test_source_newlines_do_not_fragment_paragraphs(spark):
    """Pretty-printed HTML wraps prose across source lines; only
    TAG-derived boundaries are paragraph breaks (reviewer catch: the
    word-count floor was eating fragments of wrapped <p> blocks),
    and entity newlines (&#10;) are in-paragraph whitespace too."""
    html = (
        b"<html><body><p>This is a real paragraph of prose\n"
        b"with enough words and the usual density\n"
        b"of function words that a reader would expect.</p>"
        b"<p>Great news for everyone&#10;today and tomorrow.</p>"
        b"</body></html>"
    )
    text = W.html_to_text(html, keep_paragraphs=True)
    lines = text.split("\n")
    assert len(lines) == 2
    assert lines[0] == PROSE
    assert lines[1] == "Great news for everyone today and tomorrow."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = remove_boilerplate(df).collect()[0]
    assert got.text == text  # nothing eaten
    assert got.boilerplate_fraction == 0.0


def test_boilerplate_fraction_ignores_separator_whitespace(spark):
    """Blank-line separated paragraphs with nothing removed report
    EXACTLY 0.0 (the fraction is dropped-paragraph chars over total
    paragraph chars, not raw length delta — reviewer catch)."""
    df = spark.createDataFrame(
        [(1, PROSE + "\n\n" + PROSE2)], "doc_id long, text string"
    )
    got = remove_boilerplate(df).collect()[0]
    assert got.boilerplate_fraction == 0.0
    assert got.text == PROSE + "\n" + PROSE2
    # and a dropped paragraph's fraction is its exact char share
    doc = PROSE + "\n" + NAV
    got2 = remove_boilerplate(
        spark.createDataFrame([(1, doc)], "doc_id long, text string")
    ).collect()[0]
    assert got2.boilerplate_fraction == round(
        len(NAV) / (len(PROSE) + len(NAV)), 6
    )


def test_custom_stopword_list(spark):
    """Non-English corpora pass their own function words (the
    documented language contract): German prose survives with a
    German list, empties under the English default."""
    de = (
        "das ist ein ganz normaler absatz mit vielen worten und der"
        " dichte von funktionswoertern die man erwarten wuerde"
    )
    df = spark.createDataFrame([(1, de)], "doc_id long, text string")
    assert remove_boilerplate(df).collect()[0].text == ""
    german = ("der", "die", "das", "und", "ist", "ein", "mit", "von",
              "man", "ganz")
    got = remove_boilerplate(df, stopwords=german).collect()[0]
    assert got.text == de


def test_c4_terminal_punct_and_repeated_paragraph_rules(spark):
    """The two optional C4 rules (Raffel et al. 2020 §2.2): terminal
    punctuation keeps sentence-ending paragraphs only, and
    within-document repeats collapse to their first occurrence."""
    trunc = (
        "this paragraph has the words and the density of prose but"
        " it was cut off mid"
    )
    doc = "\n".join([PROSE, trunc, PROSE2])
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    # default: truncated prose survives (stopword-rich, long enough)
    assert trunc in remove_boilerplate(df).collect()[0].text
    got = remove_boilerplate(
        df, require_terminal_punct=True
    ).collect()[0]
    assert got.text == PROSE + "\n" + PROSE2
    # repeated footer between sections collapses to one occurrence
    rep = "\n".join([PROSE, PROSE2, PROSE])
    df2 = spark.createDataFrame([(1, rep)], "doc_id long, text string")
    assert remove_boilerplate(df2).collect()[0].text == rep  # default
    # keeps repeats
    got2 = remove_boilerplate(
        df2, drop_repeated_paragraphs=True
    ).collect()[0]
    assert got2.text == PROSE + "\n" + PROSE2
    # fraction accounts the dropped repeat
    assert got2.boilerplate_fraction == round(
        len(PROSE) / (2 * len(PROSE) + len(PROSE2)), 6
    )


def test_language_key_stopword_lists(spark):
    """stopwords='de' resolves the shipped per-language list; an
    unknown key refuses naming the known ones."""
    de = (
        "das ist ein ganz normaler absatz mit vielen worten und der"
        " dichte von funktionswoertern die man erwarten wuerde"
    )
    df = spark.createDataFrame([(1, de)], "doc_id long, text string")
    assert remove_boilerplate(df, stopwords="de").collect()[0].text == de
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no stopword list"):
        remove_boilerplate(df, stopwords="xx")


def test_terminal_punct_tolerates_trailing_cr_and_empty_stops_raise(spark):
    """CRLF corpora: a trailing \\r must not fail the terminal-punct
    rule (Spark trim strips only 0x20 — reviewer catch); an empty
    stopword list raises instead of silently scoring with English."""
    doc = PROSE + "\r\n" + NAV
    df = spark.createDataFrame(
        [(1, doc.replace("\r\n", "\n").replace(PROSE, PROSE + "\r"))],
        "doc_id long, text string",
    )
    got = remove_boilerplate(df, require_terminal_punct=True).collect()[0]
    assert PROSE in got.text
    import pytest as _pytest

    with _pytest.raises(ValueError, match="stopwords is empty"):
        remove_boilerplate(df, stopwords=[])


def test_remove_boilerplate_properties(spark):
    """Property batch over randomized paragraph soup (one Spark job,
    hypothesis-free for session economy — the strategies are
    deterministic seeds): (1) IDEMPOTENCE — cleaning cleaned text
    changes nothing; (2) output paragraphs are a SUBSEQUENCE of
    input paragraphs (whitespace-collapsed); (3) the fraction sits
    in [0, 1]; (4) every surviving paragraph satisfies the
    predicate's cheap proxies (word count)."""
    import hashlib
    import random

    rng = random.Random(0xB0)
    words_prose = (
        "the and of to in is it that for with as this from".split()
        + ["reader", "value", "table", "scan", "result", "prose"]
    )
    docs = []
    for i in range(60):
        paras = []
        for _ in range(rng.randint(0, 6)):
            kind = rng.randint(0, 3)
            if kind == 0:  # prose-ish
                paras.append(" ".join(
                    rng.choice(words_prose) for _ in range(rng.randint(3, 30))
                ))
            elif kind == 1:  # chrome
                paras.append(" | ".join(
                    hashlib.sha256(str((i, _)).encode()).hexdigest()[:6]
                    for _ in range(rng.randint(1, 6))
                ))
            elif kind == 2:  # digits
                paras.append(" ".join(
                    str(rng.randint(0, 9999)) for _ in range(rng.randint(1, 8))
                ))
            else:  # junk whitespace shapes
                paras.append("   ")
        docs.append((i, "\n".join(paras)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    once = {r.doc_id: r for r in remove_boilerplate(df).collect()}
    twice_df = spark.createDataFrame(
        [(k, v.text) for k, v in once.items()], "doc_id long, text string"
    )
    twice = {r.doc_id: r for r in remove_boilerplate(twice_df).collect()}
    for i, orig in docs:
        o, t = once[i], twice[i]
        # (1) idempotence: second pass keeps everything
        assert t.text == o.text, i
        assert t.boilerplate_fraction == 0.0, i
        # (2) subsequence of whitespace-collapsed input paragraphs
        inp = [" ".join(p.split()) for p in orig.split("\n") if p.strip()]
        out = o.text.split("\n") if o.text else []
        it = iter(inp)
        assert all(any(p == q for q in it) for p in out), i
        # (3) fraction bounds
        assert 0.0 <= o.boilerplate_fraction <= 1.0, i
        # (4) cheap proxy: survivors have >= 5 words
        assert all(len(p.split()) >= 5 for p in out), i
