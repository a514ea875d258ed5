"""Text-analysis operators: token counts, quality scoring, language
ID, content fingerprinting. All built-in-function expressions — they
run inside whole-stage codegen, no Python in the row path, so a 100 TB
documents table processes at parquet-scan speed.

Every function here is also expressible in ANSI SQL (see the oracle
strings in inventory_extras.py) — deterministic integer/regex
arithmetic, no engine-specific randomness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from scratchdata_spark.operators.dedup import normalize_text


def token_count(col) -> Column:
    """Whitespace tokens; empty string counts 0."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, 0).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("int")


def bpe_ish_token_count(col) -> Column:
    """Sub-word-ish token estimate: word-boundary pieces + digits +
    punctuation, the usual ~chars/4 BPE heuristic check column."""
    return F.size(
        F.filter(
            F.split(col, r"(?<=\W)|(?=\W)"),
            lambda s: F.trim(s) != "",
        )
    ).cast("int")


def punct_ratio(col) -> Column:
    stripped = F.regexp_replace(col, r"[^\p{Punct}]", "")
    return (F.length(stripped) / F.greatest(F.length(col), F.lit(1))).cast("double")


def digit_ratio(col) -> Column:
    stripped = F.regexp_replace(col, r"[^0-9]", "")
    return (F.length(stripped) / F.greatest(F.length(col), F.lit(1))).cast("double")


_STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "it", "that", "for")


def stopword_ratio(col) -> Column:
    toks = F.split(normalize_text(col), " ")
    hits = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
    return (hits / F.greatest(F.size(toks), F.lit(1))).cast("double")


def quality_score(col) -> Column:
    """Composite [0,1] quality heuristic: long enough, low punctuation
    and digit noise, some stopword mass (natural-language signal).

    NULL/empty/whitespace-only text scores 0.0, not the ~0.4-0.6 the
    penalty terms would default to with zero denominators (r10 soak
    catch: boilerplate removal empties chrome-only documents, and a
    quality filter that then PASSES the empty husk admits it to the
    corpus — the NULL-passes-filter trap family)."""
    n = F.length(col)
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 5.0)
    digit_pen = F.greatest(F.lit(0.0), F.lit(1.0) - digit_ratio(col) * 5.0)
    stop_score = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    # Explicit-class probe, not trim: trim strips ONLY 0x20 (the r9
    # CRLF lesson), so a "\n\t\n" husk would still score ~0.4 (second
    # review catch).  rlike exits on the first non-whitespace hit — a
    # regexp_replace stripped copy cost +50% on the sf1 quality wall
    # (measured).  The class is spelled out rather than \S because
    # Java's \s includes \x0B while RE2's (DuckDB's) does not — a
    # vertical-tab-only husk would score 0.0 here and ~0.4 in the
    # oracle (r10 review catch); both engines get the same class.
    has_content = F.coalesce(col.rlike(r"[^ \t\n\x0B\f\r]"), F.lit(False))
    return F.when(~has_content, F.lit(0.0)).otherwise(
        F.round(
            0.4 * len_score + 0.2 * punct_pen + 0.2 * digit_pen
            + 0.2 * stop_score,
            6,
        )
    )


# language markers: tiny per-language function-word/character signals.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|is|was|with)\b",
    "de": r"\b(der|die|das|und|ist|mit|ein)\b",
    "es": r"\b(el|la|los|las|es|con|una?)\b",
    "fr": r"\b(le|la|les|est|avec|une?|et)\b",
    "zh": r"[一-鿿]",
}


def _marker_count(col, pattern: str) -> Column:
    return F.regexp_count(normalize_text(col), F.lit(pattern))


_LANG_PRIORITY = ("en", "de", "es", "fr", "zh")


def lang_id(col) -> Column:
    """First-maximum over marker-hit counts in _LANG_PRIORITY order;
    'und' (undetermined) when no marker fires. A when-chain keeps the
    tiebreak rule trivially mirrorable in ANSI SQL (CASE chain)."""
    counts = {code: _marker_count(col, LANG_MARKERS[code]) for code in _LANG_PRIORITY}
    expr = F.lit("und")
    for code in reversed(_LANG_PRIORITY):
        is_first_max = counts[code] > 0
        for other in _LANG_PRIORITY:
            if other == code:
                break
            is_first_max = is_first_max & (counts[code] > counts[other])
        for other in _LANG_PRIORITY[_LANG_PRIORITY.index(code) + 1 :]:
            is_first_max = is_first_max & (counts[code] >= counts[other])
        expr = F.when(is_first_max, F.lit(code)).otherwise(expr)
    return expr


def fingerprint(col) -> Column:
    """Content fingerprint: sha256 over normalized text — stable
    across engines (DuckDB sha256() matches)."""
    return F.sha2(normalize_text(col), 256)


# ------------------------------------------------- repetition quality

def dup_token_fraction(col) -> Column:
    """Fraction of tokens that repeat an earlier token (1 − type/token
    ratio) — the cheapest Gopher-style repetition signal; boilerplate
    and keyword-stuffed docs score high."""
    toks = F.split(normalize_text(col), " ")
    n = F.size(toks)
    # no rounding: int/int division is bit-identical IEEE 754 on every
    # engine, while ROUND(x, 6) can split on half-tie modes (1/128 =
    # 0.0078125 rounds differently under HALF_UP vs half-even)
    return ((n - F.size(F.array_distinct(toks))) / F.greatest(n, F.lit(1))).cast(
        "double"
    )


def adjacent_pairs(arr):
    """``array<struct<w1, w2>>`` of adjacent elements — empty below 2
    elements (``sequence(1, 0)`` would DESCEND, so the guard is load-
    bearing). The one implementation behind every bigram consumer
    (top_bigram_fraction here, the LM operators in lm.py).

    ``arr`` is let-bound (operators.bind_once): callers pass computed
    split expressions, and the two per-element ``element_at`` reads
    would otherwise re-tokenize the row per PAIR — O(tokens²) (the
    r13 features_col find, same fix)."""
    from scratchdata_spark.operators import bind_once

    def _pairs(a):
        n = F.size(a)
        return F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.struct(
                    F.element_at(a, i).alias("w1"),
                    F.element_at(a, i + 1).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))

    return bind_once(arr, _pairs)


def top_bigram_fraction(col) -> Column:
    """Occurrence share of the most frequent word bigram (Gopher's
    top-2-gram filter). Pure HOF expression — O(unique·total) per row,
    JVM-side; fine for document-sized inputs and exactly mirrorable in
    DuckDB list functions."""
    toks = F.split(normalize_text(col), " ")
    grams = F.transform(
        adjacent_pairs(toks),
        lambda p: F.concat_ws(
            " ", p.getField("w1"), p.getField("w2")
        ),
    )
    counts = F.transform(
        F.array_distinct(grams),
        lambda g: F.size(F.filter(grams, lambda x: x == g)),
    )
    top = F.coalesce(F.array_max(counts), F.lit(0))
    return (top / F.greatest(F.size(grams), F.lit(1))).cast("double")


# ------------------------------------------------------- PII scrubbing

# RE2-compatible patterns (no backrefs/lookbehind) so Spark's Java
# regex and DuckDB's RE2 match the exact same spans.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d[\d -]{7,}\d",
}


def pii_count(col, kind: str) -> Column:
    return F.regexp_count(col, F.lit(PII_PATTERNS[kind])).cast("int")


def scrub_pii(col) -> Column:
    """Replace emails / IPv4s / phone-ish digit runs with typed
    placeholder tokens. Order matters only for readability — the three
    patterns cannot overlap (phone's charset has no ``.``/``@``).
    Global replace on both engines (Spark default; DuckDB 'g')."""
    out = col
    for kind in ("email", "ipv4", "phone"):
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


# ------------------------------------------------ boilerplate removal

# Function-word list for the paragraph classifier — deliberately
# larger than the quality_score _STOPWORDS: the signal here is a
# per-PARAGRAPH fraction over few words, where a 10-word list is too
# coarse (navigation chrome and prose both round to 0).
_BOILERPLATE_STOPWORDS = (
    "the", "and", "of", "a", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "at", "by", "an", "be", "are", "was", "were",
    "this", "these", "from", "or", "but", "not", "have", "has", "had",
    "they", "their", "you", "your", "we", "our", "he", "she", "his",
    "her", "its", "will", "would", "can", "could", "there", "what",
    "when", "which", "who", "also", "into", "about", "than", "then",
    "so", "if", "do", "does", "did", "i",
)

# Per-language function-word lists (public knowledge — the most
# frequent closed-class words of each language; jusText ships the
# same idea as per-language files).  ``remove_boilerplate`` accepts
# the language KEY as its ``stopwords`` argument.  Deliberately
# space-delimited European languages only: the word heuristics do
# not apply to unspaced scripts (see the language contract).
BOILERPLATE_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": _BOILERPLATE_STOPWORDS,
    "de": (
        "der", "die", "das", "und", "in", "von", "zu", "den", "mit",
        "auf", "ist", "im", "dem", "nicht", "ein", "eine", "als",
        "auch", "es", "an", "werden", "aus", "er", "hat", "dass",
        "sie", "nach", "wird", "bei", "einer", "um", "am", "sind",
        "noch", "wie", "einem", "über", "einen", "so", "zum", "war",
        "haben", "nur", "oder", "aber", "vor", "bis", "mehr", "durch",
        "man", "sein", "wurde", "sei",
    ),
    "es": (
        "de", "la", "que", "el", "en", "y", "a", "los", "del", "se",
        "las", "por", "un", "para", "con", "no", "una", "su", "al",
        "lo", "como", "más", "pero", "sus", "le", "ya", "o", "este",
        "sí", "porque", "esta", "entre", "cuando", "muy", "sin",
        "sobre", "también", "me", "hasta", "hay", "donde", "quien",
        "desde", "todo", "nos", "durante", "todos", "uno", "les",
        "ni", "contra", "otros", "ese", "eso", "está",
    ),
    "fr": (
        "de", "la", "le", "et", "les", "des", "en", "un", "du", "une",
        "que", "est", "pour", "qui", "dans", "a", "par", "plus",
        "pas", "au", "sur", "ne", "se", "ce", "il", "sont", "ont",
        "aux", "avec", "son", "ou", "mais", "on", "cette", "comme",
        "ces", "dont", "être", "elle", "tout", "nous", "sa", "leur",
        "sans", "aussi", "peut", "fait", "était", "entre", "deux",
    ),
}


def remove_boilerplate(
    df: "DataFrame",
    text_col: str = "text",
    out_col: str | None = None,
    min_words: int = 5,
    min_stopword_fraction: float = 0.12,
    max_digit_fraction: float = 0.30,
    max_punct_fraction: float = 0.30,
    stopwords: tuple[str, ...] | list[str] | str | None = None,
    require_terminal_punct: bool = False,
    drop_repeated_paragraphs: bool = False,
) -> "DataFrame":
    """Paragraph-level boilerplate removal — the jusText idea
    (Pomikálek 2011: classify paragraphs by stopword density and
    length; navigation chrome, copyright lines and link lists carry
    few function words) simplified to four thresholds and expressed
    ENTIRELY as column algebra: split on newlines → higher-order
    ``filter`` with the per-paragraph predicate → ``array_join``.
    Map-only, whole-stage codegen, zero Python, zero shuffle — at
    100 TB boilerplate removal runs inside the scan stage, exactly
    like the URL normalizers.

    Input contract: paragraphs are newline-separated —
    ``warc.html_to_text(body, keep_paragraphs=True)`` emits this
    shape.  Text without newlines is one paragraph (kept or dropped
    whole).  NULL text passes through NULL.

    LANGUAGE CONTRACT: the default ``stopwords`` list is ENGLISH —
    on German/Spanish/… text every paragraph scores ~0 and the
    document empties.  Pass a language key from
    :data:`BOILERPLATE_STOPWORDS` (``stopwords="de"``), any word
    tuple (jusText ships per-language lists), or set
    ``min_stopword_fraction=0.0`` to disable the check.  For
    CJK-class scripts (no word spacing) the word/stopword heuristics
    do not apply at all — run langid first and route those documents
    around this operator.

    A paragraph SURVIVES iff: word count ≥ ``min_words`` AND
    stopword fraction ≥ ``min_stopword_fraction`` AND digit fraction
    ≤ ``max_digit_fraction`` AND punctuation fraction ≤
    ``max_punct_fraction`` (digit/punct via this module's
    digit_ratio/punct_ratio — ONE definition of punctuation,
    ``\\p{Punct}``, shared with quality_score).

    Two optional C4-style rules (Raffel et al. 2020 §2.2, both pure
    column algebra like the rest): ``require_terminal_punct`` keeps
    only paragraphs ending in ``. ! ? "`` (the C4 'terminal
    punctuation' line rule — navigation and truncated fragments
    rarely end a sentence), and ``drop_repeated_paragraphs`` removes
    within-document repeats keeping the first occurrence
    (``array_distinct`` preserves order) — headers/footers pasted
    between sections collapse before cross-document span dedup ever
    runs.

    Adds ``out_col`` (default: overwrite ``text_col``) and
    ``boilerplate_fraction`` — DROPPED paragraph chars over total
    paragraph chars, so separator whitespace never inflates it and
    an untouched document reports exactly 0.0."""
    from pyspark.sql import DataFrame  # noqa: F401  (doc type only)

    out_col = out_col or text_col
    if isinstance(stopwords, str):
        if stopwords not in BOILERPLATE_STOPWORDS:
            raise ValueError(
                f"remove_boilerplate: no stopword list for"
                f" {stopwords!r}; known: {sorted(BOILERPLATE_STOPWORDS)}"
                " — pass an explicit word tuple for other languages"
            )
        stopwords = BOILERPLATE_STOPWORDS[stopwords]
    if stopwords is not None and not list(stopwords):
        # an empty list is a caller bug (a failed per-language
        # lookup, say) — falling back to ENGLISH here would silently
        # empty a non-English corpus, the exact trap the language
        # contract warns about
        raise ValueError(
            "remove_boilerplate: stopwords is empty — pass None for"
            " the English default or a non-empty word sequence"
        )
    stops = list(stopwords) if stopwords else list(_BOILERPLATE_STOPWORDS)

    def keep(p):
        words = F.filter(F.split(F.trim(p), r"\s+"), lambda w: w != "")
        wc = F.size(words)
        stop_hits = F.size(
            F.filter(words, lambda w: F.lower(w).isin(stops))
        )
        cond = (
            (wc >= F.lit(min_words))
            & (stop_hits / F.greatest(wc, F.lit(1))
               >= F.lit(min_stopword_fraction))
            & (digit_ratio(p) <= F.lit(max_digit_fraction))
            & (punct_ratio(p) <= F.lit(max_punct_fraction))
        )
        if require_terminal_punct:
            # \s*$ not trim(): Spark trim strips only 0x20, so a
            # CRLF corpus would fail every line on the trailing \r
            cond = cond & p.rlike(r'[.!?"]\s*$')
        return cond

    paras_all = F.filter(
        F.split(F.col(text_col), r"\n+"),
        lambda p: F.trim(p) != "",
    )
    paras = (
        F.array_distinct(paras_all)
        if drop_repeated_paragraphs
        else paras_all
    )
    kept_paras = F.filter(paras, keep)
    kept = F.array_join(kept_paras, "\n")

    def char_sum(arr):
        return F.aggregate(
            arr, F.lit(0).cast("long"), lambda acc, p: acc + F.length(p)
        )

    # total over the PRE-distinct array: a deduplicated repeat is
    # dropped boilerplate and must count in the fraction
    total_chars = char_sum(paras_all)
    frac = F.round(
        (total_chars - char_sum(kept_paras))
        / F.greatest(total_chars, F.lit(1)).cast("double"),
        6,
    )
    return df.withColumn("__bp_kept", kept).withColumn(
        "boilerplate_fraction",
        F.when(F.col(text_col).isNull(), None).otherwise(frac),
    ).withColumn(
        out_col,
        F.when(F.col(text_col).isNull(), None).otherwise(
            F.col("__bp_kept")
        ),
    ).drop("__bp_kept")
