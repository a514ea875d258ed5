"""DuckDB-dialect compatibility for the Spark SQL passthrough.

The reference forwards user SQL verbatim to its default backend —
DuckDB (pkg/util/sql.go:9-13, pkg/destinations/duckdb/query.go) — so
a reference user's saved queries are written in DuckDB's dialect.
Spark 4 already parses a large slice of it natively (GROUP BY ALL /
ORDER BY ALL, ``* EXCEPT (...)``, ``::`` casts, ILIKE, ``len``); this
module closes the most common remaining gaps so those queries run
unchanged:

* **SQL-function aliases** (registered once per session as Spark SQL
  UDFs — inlined JVM expressions, NOT Python UDFs): ``epoch_us``,
  ``epoch_ms``, ``epoch``, ``string_split`` (literal separator, via
  ``\\Q..\\E`` regex quoting), ``regexp_matches``, ``list_sort``.
* **Token rewrites** applied outside string literals and comments:
  ``* EXCLUDE (...)`` → ``* EXCEPT (...)``, ``//`` → ``DIV``,
  ``list_value(`` → ``array(``, ``list_contains(`` →
  ``array_contains(``, ``USING SAMPLE n% / n ROWS`` → ``TABLESAMPLE``.
* **strftime(expr, 'fmt')** → ``date_format(expr, '<translated>')``
  for the common C directives (%Y %m %d %H %M %S …).
* **QUALIFY** → wraps the query and filters on the window result
  (DuckDB/Snowflake semantics) when the statement is one top-level
  SELECT.

Anything the rewriter does not recognize passes through untouched —
valid Spark SQL is never altered (every rewritten token is a parse
error in stock Spark, so there is nothing to collide with).

Known divergences NOT bridged (they parse on both engines with
different meanings, so a text rewrite would silently change valid
Spark queries): array subscripts (DuckDB ``a[1]`` is 1-based, Spark
0-based — use ``element_at(a, 1)``, 1-based on both), and ``split``'s
separator (regex on Spark, handled here only via the ``string_split``
alias). These are documented rather than guessed at.
"""

from __future__ import annotations

import re

# --------------------------------------------------------------- masking


def _segments(sql: str):
    """Split sql into (is_code, text) segments; string literals
    ('..' with '' escapes, ".." and `..` quoted identifiers) and
    -- / /* */ comments are non-code so rewrites never touch their
    contents."""
    out = []
    i, n = 0, len(sql)
    start = 0
    while i < n:
        ch = sql[i]
        if ch == "'" or ch == '"' or ch == "`":
            if start < i:
                out.append((True, sql[start:i]))
            q = ch
            j = i + 1
            while j < n:
                if sql[j] == q:
                    if j + 1 < n and sql[j + 1] == q:  # doubled quote
                        j += 2
                        continue
                    break
                j += 1
            j = min(j, n - 1)
            out.append((False, sql[i : j + 1]))
            i = j + 1
            start = i
        elif ch == "-" and sql[i : i + 2] == "--":
            if start < i:
                out.append((True, sql[start:i]))
            j = sql.find("\n", i)
            j = n if j == -1 else j
            out.append((False, sql[i:j]))
            i = j
            start = i
        elif ch == "/" and sql[i : i + 2] == "/*":
            if start < i:
                out.append((True, sql[start:i]))
            j = sql.find("*/", i + 2)
            j = n if j == -1 else j + 2
            out.append((False, sql[i:j]))
            i = j
            start = i
        else:
            i += 1
    if start < n:
        out.append((True, sql[start:]))
    return out


def _rewrite_code(code: str) -> str:
    # * EXCLUDE (a, b) → * EXCEPT (a, b)   (DuckDB keyword for Spark's)
    code = re.sub(r"(\*\s*)EXCLUDE(\s*\()", r"\1EXCEPT\2", code, flags=re.I)
    # integer division: a // b → a DIV b. Exact for integer operands
    # (both truncate toward zero, -7//2 = -7 DIV 2 = -3). DuckDB's //
    # on DECIMAL/DOUBLE behaves as plain division (7.5 // 2 = 3.75) —
    # a type-dependent meaning no text rewrite can reproduce; integer
    # usage is the dialect's documented contract here.
    code = re.sub(r"//", " DIV ", code)
    # list_* constructors/predicates with direct array_* counterparts
    code = re.sub(r"\blist_value\s*\(", "array(", code, flags=re.I)
    code = re.sub(r"\blist_contains\s*\(", "array_contains(", code, flags=re.I)
    code = re.sub(r"\blist_has_any\s*\(", "arrays_overlap(", code, flags=re.I)
    code = re.sub(r"\blist_transform\s*\(", "transform(", code, flags=re.I)
    code = re.sub(r"\blist_filter\s*\(", "filter(", code, flags=re.I)
    code = re.sub(r"\blist_unique\s*\(", "array_distinct(", code, flags=re.I)
    code = re.sub(r"\barray_length\s*\(", "size(", code, flags=re.I)
    code = re.sub(r"\bstarts_with\s*\(", "startswith(", code, flags=re.I)
    # USING SAMPLE 10% | USING SAMPLE 100 ROWS → TABLESAMPLE
    code = re.sub(
        r"\bUSING\s+SAMPLE\s+(\d+(?:\.\d+)?)\s*%",
        r"TABLESAMPLE (\1 PERCENT)",
        code,
        flags=re.I,
    )
    code = re.sub(
        r"\bUSING\s+SAMPLE\s+(\d+)\s+ROWS\b",
        r"TABLESAMPLE (\1 ROWS)",
        code,
        flags=re.I,
    )
    return code


def _rewrite_bracket_literals(parts: list[tuple[bool, str]]) -> str:
    """DuckDB list literals ``[1, 'a']`` → ``array(1, 'a')``. A ``[``
    is a subscript only when it IMMEDIATELY follows a value expression
    (identifier char, ``)``, ``]``, closing quote — ``a[1]``,
    ``expr()[1]``); any whitespace or operator before it means a list
    constructor (``SELECT [1, 2]``, ``IN [..]``). Bracket pairs match
    via a stack carried ACROSS segments (a literal's string elements
    are non-code segments); non-code text itself is never altered."""
    out = []
    stack = []  # True = literal (rewritten), False = subscript
    prev = ""  # last raw char of the ORIGINAL text, whitespace included
    for is_code, text in parts:
        if not is_code:
            out.append(text)
            if text:
                prev = text[-1]
            continue
        for ch in text:
            if ch == "[":
                is_subscript = bool(prev) and (prev.isalnum() or prev in "_)]'\"")
                stack.append(not is_subscript)
                out.append("[" if is_subscript else "array(")
            elif ch == "]" and stack:
                out.append(")" if stack.pop() else "]")
            else:
                out.append(ch)
            prev = ch
    return "".join(out)


# ------------------------------------------------------------- strftime

# C directive → java.time pattern (the common subset; DuckDB docs list
# these as its core strftime directives)
_STRFTIME = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%H": "HH",
    "%I": "hh", "%M": "mm", "%S": "ss", "%f": "SSSSSS", "%g": "SSS",
    "%j": "DDD", "%a": "EEE", "%A": "EEEE", "%b": "MMM", "%B": "MMMM",
    "%p": "a", "%Z": "zzz", "%z": "xx", "%%": "%",
}


def _strftime_to_java(fmt: str) -> str:
    """Translate a C strftime format to a java.time pattern; literal
    alphabetic characters are quoted so Java doesn't read them as
    pattern letters."""
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            d = fmt[i : i + 2]
            out.append(_STRFTIME.get(d, d))
            i += 2
        else:
            c = fmt[i]
            out.append(f"'{c}'" if c.isalpha() else c)
            i += 1
    return "".join(out)


_MASK = "\x00"


def _mask_literals(sql: str) -> tuple[str, list[str]]:
    """Replace every non-code segment with a ``\\x00<i>\\x00``
    placeholder so function-shape regexes (strftime, date_diff) can
    run over the code structure WITHOUT ever matching inside an
    unrelated string literal — the placeholder stands where the
    literal argument sits, and the rewrite looks its content up by
    index. Round-trips exactly via _unmask_literals."""
    chunks, literals = [], []
    for is_code, text in _segments(sql):
        if is_code:
            chunks.append(text)
        else:
            chunks.append(f"{_MASK}{len(literals)}{_MASK}")
            literals.append(text)
    return "".join(chunks), literals


def _unmask_literals(masked: str, literals: list[str]) -> str:
    return re.sub(
        f"{_MASK}(\\d+){_MASK}", lambda m: literals[int(m.group(1))], masked
    )


def _rewrite_date_diff(masked: str, literals: list[str]) -> str:
    """``date_diff('day', a, b)`` → ``timestampdiff(DAY, a, b)`` on
    the literal-masked text: the part-name placeholder must be the
    call's first argument, so a literal elsewhere can never match."""
    def repl(m):
        lit = literals[int(m.group(1))]
        part = lit[1:-1] if lit[:1] == "'" else lit
        if not re.fullmatch(r"\w+", part):
            return m.group(0)
        return f"timestampdiff({part.upper()},"

    return re.sub(
        rf"\bdate_diff\s*\(\s*{_MASK}(\d+){_MASK}\s*,", repl, masked, flags=re.I
    )


def _rewrite_strftime(masked: str, literals: list[str]) -> str:
    """``strftime(<expr>, '<fmt>')`` → ``date_format(expr, ...)`` on
    the literal-masked text; the format placeholder must be the second
    argument of the call shape (no nested commas in expr)."""
    def repl(m):
        lit = literals[int(m.group(2))]
        if lit[:1] != "'":
            return m.group(0)
        translated = _strftime_to_java(lit[1:-1])
        return f"date_format({m.group(1)}, '{translated}')"

    return re.sub(
        rf"\bstrftime\s*\(\s*([^,()]+(?:\([^()]*\))?[^,()]*)\s*,\s*{_MASK}(\d+){_MASK}\s*\)",
        repl,
        masked,
        flags=re.I,
    )


# -------------------------------------------------------------- qualify


def _rewrite_qualify(sql: str) -> str:
    """``SELECT ... QUALIFY <pred> [ORDER BY ...] [LIMIT ...]`` →
    ``SELECT * FROM ( SELECT ... ) __q WHERE <pred> ...`` — filters on
    window-function results, DuckDB/Snowflake semantics. Applied only
    when exactly one top-level QUALIFY exists (paren depth 0)."""
    segs = _segments(sql)
    # locate QUALIFY at depth 0 across code segments
    depth = 0
    pos = -1  # char offset in original sql
    offset = 0
    for is_code, text in segs:
        if is_code:
            for m in re.finditer(r"[()]|\bQUALIFY\b", text, flags=re.I):
                tok = m.group(0)
                if tok == "(":
                    depth += 1
                elif tok == ")":
                    depth -= 1
                elif depth == 0:
                    if pos != -1:
                        return sql  # two top-level QUALIFYs: give up
                    pos = offset + m.start()
        offset += len(text)
    if pos == -1:
        return sql
    head = sql[:pos].rstrip()
    tail = sql[pos + len("QUALIFY") :].strip()
    # split trailing ORDER BY / LIMIT out of the predicate — they must
    # land OUTSIDE the wrapper, after the WHERE. Depth-0 only: an
    # ORDER BY inside the predicate's own OVER (...) clause is part of
    # the window spec, not the statement tail.
    split_at = -1
    depth = 0
    offset = 0
    for seg_is_code, seg_text in _segments(tail):
        if seg_is_code:
            for m in re.finditer(r"[()]|\bORDER\s+BY\b|\bLIMIT\b", seg_text, flags=re.I):
                tok = m.group(0)
                if tok == "(":
                    depth += 1
                elif tok == ")":
                    depth -= 1
                elif depth == 0 and split_at == -1:
                    split_at = offset + m.start()
        offset += len(seg_text)
    if split_at != -1:
        pred, rest = tail[:split_at].strip(), tail[split_at:]
    else:
        pred, rest = tail, ""
    # The predicate may itself contain a window function (QUALIFY
    # row_number() OVER (...) = 1 — the most common form), which Spark
    # rejects in WHERE. Compute it as a projected column in an inner
    # SELECT (where windows ARE legal), filter on it, then drop it.
    return (
        f"SELECT * EXCEPT (__qualify_pred) FROM ("
        f" SELECT *, ({pred}) AS __qualify_pred FROM ( {head} ) __qualify_src"
        f" ) WHERE __qualify_pred {rest}"
    ).strip()


# ---------------------------------------------------------------- public

COMPAT_FUNCTIONS = [
    # DuckDB epoch helpers (ts → seconds / millis / micros)
    "CREATE OR REPLACE TEMPORARY FUNCTION epoch_us(x TIMESTAMP)"
    " RETURNS BIGINT RETURN unix_micros(x)",
    "CREATE OR REPLACE TEMPORARY FUNCTION epoch_ms(x TIMESTAMP)"
    " RETURNS BIGINT RETURN unix_millis(x)",
    # DuckDB's epoch() returns DOUBLE seconds INCLUDING the fraction
    "CREATE OR REPLACE TEMPORARY FUNCTION epoch(x TIMESTAMP)"
    " RETURNS DOUBLE RETURN unix_micros(x) / 1000000.0D",
    # literal-separator split (Spark's split takes a REGEX; \Q..\E
    # quotes the separator so '.' splits on dots, not everything)
    "CREATE OR REPLACE TEMPORARY FUNCTION string_split(s STRING, sep STRING)"
    " RETURNS ARRAY<STRING> RETURN split(s, concat('\\\\Q', sep, '\\\\E'))",
    "CREATE OR REPLACE TEMPORARY FUNCTION regexp_matches(s STRING, p STRING)"
    " RETURNS BOOLEAN RETURN s RLIKE p",
    # list_sort is deliberately ABSENT: a typed SQL UDF would coerce
    # numeric arrays to ARRAY<STRING> and sort lexicographically —
    # silently wrong. Users get a loud unresolved-function error and
    # sort_array(), which matches DuckDB's list_sort for every type.
    "CREATE OR REPLACE TEMPORARY FUNCTION list_sum(a ARRAY<DOUBLE>)"
    " RETURNS DOUBLE RETURN aggregate(a, 0.0D, (acc, x) -> acc + x)",
]


def register_compat_functions(spark) -> None:
    """Session-scoped SQL UDFs (inlined JVM expressions — they appear
    in plans as their body, inside whole-stage codegen; never Python)."""
    for ddl in COMPAT_FUNCTIONS:
        spark.sql(ddl)


def rewrite(sql: str) -> str:
    """DuckDB SQL → Spark SQL. Pure text transform; string literals,
    quoted identifiers, and comments are never modified."""
    sql = _rewrite_qualify(sql)
    parts = [
        (is_code, _rewrite_code(text) if is_code else text)
        for is_code, text in _segments(sql)
    ]
    rewritten = _rewrite_bracket_literals(parts)
    # literal-argument rewrites run on masked text: the target literal
    # participates via its placeholder, unrelated literals can't match
    masked, literals = _mask_literals(rewritten)
    masked = _rewrite_date_diff(_rewrite_strftime(masked, literals), literals)
    return _unmask_literals(masked, literals)
