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
    ('..' with '' escapes, ".." identifiers) and -- / /* */ comments
    are non-code so rewrites never touch their contents."""
    out = []
    i, n = 0, len(sql)
    start = 0
    while i < n:
        ch = sql[i]
        if ch == "'" or ch == '"':
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
    # integer division: a // b → a DIV b
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


def _rewrite_date_diff(sql: str) -> str:
    """``date_diff('day', a, b)`` → ``timestampdiff(DAY, a, b)`` — the
    part name lives in a string literal, so this runs on the full text
    (like strftime) rather than in the literal-masked pass."""
    return re.sub(
        r"\bdate_diff\s*\(\s*'(\w+)'\s*,",
        lambda m: f"timestampdiff({m.group(1).upper()},",
        sql,
        flags=re.I,
    )


def _rewrite_strftime(sql: str) -> str:
    # strftime(<expr>, '<fmt>') — expr must be paren-free or
    # parenthesized; keep it conservative (no nested commas).
    def repl(m):
        return f"date_format({m.group(1)}, '{_strftime_to_java(m.group(2))}')"

    return re.sub(
        r"\bstrftime\s*\(\s*([^,()]+(?:\([^()]*\))?[^,()]*)\s*,\s*'([^']*)'\s*\)",
        repl,
        sql,
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
    # split trailing ORDER BY / LIMIT at depth 0 out of the predicate
    m = re.search(r"\b(ORDER\s+BY|LIMIT)\b", tail, flags=re.I)
    pred, rest = (tail[: m.start()].strip(), tail[m.start() :]) if m else (tail, "")
    return f"SELECT * FROM ( {head} ) __qualify WHERE {pred} {rest}".strip()


# ---------------------------------------------------------------- public

COMPAT_FUNCTIONS = [
    # DuckDB epoch helpers (ts → seconds / millis / micros)
    "CREATE OR REPLACE TEMPORARY FUNCTION epoch_us(x TIMESTAMP)"
    " RETURNS BIGINT RETURN unix_micros(x)",
    "CREATE OR REPLACE TEMPORARY FUNCTION epoch_ms(x TIMESTAMP)"
    " RETURNS BIGINT RETURN unix_millis(x)",
    "CREATE OR REPLACE TEMPORARY FUNCTION epoch(x TIMESTAMP)"
    " RETURNS BIGINT RETURN unix_seconds(x)",
    # literal-separator split (Spark's split takes a REGEX; \Q..\E
    # quotes the separator so '.' splits on dots, not everything)
    "CREATE OR REPLACE TEMPORARY FUNCTION string_split(s STRING, sep STRING)"
    " RETURNS ARRAY<STRING> RETURN split(s, concat('\\\\Q', sep, '\\\\E'))",
    "CREATE OR REPLACE TEMPORARY FUNCTION regexp_matches(s STRING, p STRING)"
    " RETURNS BOOLEAN RETURN s RLIKE p",
    "CREATE OR REPLACE TEMPORARY FUNCTION list_sort(a ARRAY<STRING>)"
    " RETURNS ARRAY<STRING> RETURN sort_array(a)",
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
    return _rewrite_date_diff(_rewrite_strftime(rewritten))
