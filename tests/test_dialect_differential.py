"""Standing differential battery: the same DuckDB-dialect query text
runs on BOTH engines (DuckDB directly, Spark through the dialect
fallback) and must agree value-for-value.  This is the r11 probe
harness made permanent — three ad-hoc waves of it found eight real
divergences (list_sum NULL semantics, strftime literal quoting,
date_diff boundary counting among them), so the corpus that passed
stays pinned here and every future dialect change re-proves it.

Cases that are KNOWN blind spots (valid in both dialects with
different meanings — ^, log, 3-arg regexp_replace, DATE-DATE …) are
deliberately absent: they execute with Spark's meaning by design and
are documented in dialect.py's module docstring instead.

Comparison is stringified-and-sorted, which also pins the VALUE-level
agreement for floats (engine-specific result WIDTHS like DuckDB's
HUGEINT sums are documented divergences and excluded)."""

from __future__ import annotations

import duckdb
import pytest

from scratchdata_spark.dialect import (
    prepare_query_text,
    register_compat_functions,
    rewrite,
)

# one tiny shared relation both engines hold
_ROWS = [(1, "alpha", 10, [1, 2, 3]), (2, "beta", 20, [4, 5]),
         (3, "abc", 30, [6])]

CASES = [
    # arithmetic / division
    "SELECT -7 // 2 AS q",
    "SELECT 7 // 2 AS q, 9 // 4 AS r",
    "SELECT id // 2 AS h FROM t ORDER BY id",
    "SELECT 10 // 4 + 1 AS x",
    "SELECT 7 / 2 AS d",
    "SELECT -7 % 3 AS m",
    "SELECT round(2.5) AS r1, round(-2.5) AS r2, round(2.345, 2) AS r3",
    "SELECT abs(-2.5) AS a, floor(-1.5) AS f, ceil(-1.5) AS c",
    "SELECT power(2, 10) AS p",
    "SELECT bit_count(7) AS b",
    "SELECT pi() AS p",
    # strings
    "SELECT substr('abcdef', -2) AS neg, substr('abcdef', 2, 3) AS mid",
    "SELECT left('abcdef', 2) AS l, right('abcdef', 2) AS r",
    "SELECT repeat('ab', 3) AS r",
    "SELECT lpad('5', 3, '0') AS l, rpad('5', 3, '0') AS r",
    "SELECT reverse('abc') AS r",
    "SELECT contains('hello', 'ell') AS c",
    "SELECT instr('hello', 'l') AS i",
    "SELECT split_part('a,b,c', ',', 2) AS p",
    "SELECT printf('%d-%s', 7, 'x') AS p",
    "SELECT concat_ws('-', 'a', NULL, 'b') AS s",
    "SELECT 'Hello' ILIKE 'h%' AS m",
    "SELECT length(NULL) AS n",
    "SELECT 'a' || 'b' || NULL AS s",
    "SELECT position('b' IN 'abc') AS p",
    "SELECT starts_with(g, 'a') AS sw, count(*)::BIGINT AS n"
    " FROM t GROUP BY ALL ORDER BY sw",
    "SELECT regexp_replace('aaa', 'a', 'b', 'g') AS r",
    "SELECT regexp_extract('a123b', '([0-9]+)', 1) AS e",
    "SELECT str_split_regex('a1b2c', '[0-9]') AS p",
    "SELECT to_hex(255) AS h, to_hex(-1) AS neg",
    "SELECT id FROM t WHERE g ~ '^a' ORDER BY id",
    "SELECT id FROM t WHERE g !~ '^a' ORDER BY id",
    # lists / structs
    "SELECT list_contains([1,2], 2) AS c",
    "SELECT arr[-1] AS last, arr[1] AS first FROM t ORDER BY first",
    "SELECT [id, id*2] AS l FROM t ORDER BY id",
    "SELECT list_transform(arr, y -> y + 1) AS l FROM t ORDER BY id",
    "SELECT list_filter(arr, y -> y > 1) AS l FROM t ORDER BY id",
    "SELECT array_length(arr) AS n FROM t ORDER BY n",
    "SELECT flatten([[1,2],[3]]) AS f",
    "SELECT array_to_string([1,2,3], '-') AS s",
    "SELECT list_sum(list_transform(arr, y -> y * 1.0)) AS s"
    " FROM t ORDER BY s",
    "SELECT list_sum([1.0, NULL, 2.0]) AS withnull, list_sum([]) AS empty",
    "SELECT x.a AS a FROM (SELECT {'a': 1} AS x)",
    "SELECT unnest(arr) AS e FROM t WHERE id = 1 ORDER BY e",
    # aggregates / windows
    "SELECT arg_max(id, id) AS am, arg_min(g, id) AS an FROM t",
    "SELECT quantile_cont(id, 0.5) AS med FROM t",
    "SELECT median(id) AS m FROM t",
    "SELECT g, list(id ORDER BY id DESC) AS ids FROM t GROUP BY g ORDER BY g",
    "SELECT group_concat(g, '|' ORDER BY g) AS gc FROM t",
    "SELECT string_agg(g, ',' ORDER BY g) AS sa FROM t",
    "SELECT first(v ORDER BY id) AS f, last(v ORDER BY id) AS l FROM t",
    "SELECT bool_and(v > 5) AS ba, bool_or(v > 25) AS bo FROM t",
    "SELECT bit_and(v) AS b1, bit_or(v) AS b2, bit_xor(v) AS b3 FROM t",
    "SELECT corr(id, v) AS c, stddev_samp(v) AS sd FROM t",
    "SELECT count(*) FILTER (WHERE v > 10) AS n FROM t",
    "SELECT g, sum(v) AS s FROM t GROUP BY g HAVING sum(v) > 15 ORDER BY g",
    "SELECT id, sum(v) OVER w AS s FROM t WINDOW w AS (ORDER BY id)"
    " ORDER BY id",
    "SELECT lag(v, 1, 0) OVER (ORDER BY id) AS l FROM t ORDER BY id",
    "SELECT percent_rank() OVER (ORDER BY v) AS p FROM t ORDER BY p",
    "SELECT grouping(g) AS gr, g, sum(v) AS s FROM t GROUP BY ROLLUP(g)"
    " ORDER BY gr, g",
    "SELECT v, ntile(2) OVER (ORDER BY v) AS nt FROM t ORDER BY v",
    "SELECT id, row_number() OVER (ORDER BY id) AS rn FROM t QUALIFY rn <= 2",
    "SELECT max(v) - min(v) AS spread FROM t",
    "SELECT sum(v)::DOUBLE / count(*) AS avg FROM t",
    "SELECT any_value(g) AS av FROM (SELECT * FROM t WHERE g = 'beta') q",
    # dates / times
    "SELECT strftime(TIMESTAMP '2024-03-05 07:08:09',"
    " '%Y-%m-%dT%H:%M:%S') AS f",
    "SELECT try_strptime('2024-01-02', '%Y-%m-%d') AS ts",
    "SELECT date_part('year', DATE '2024-03-05') AS y",
    "SELECT last_day(DATE '2024-02-05') AS ld",
    "SELECT DATE '2024-01-01' + 5 AS d",
    "SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 3 HOUR AS ts",
    "SELECT date_diff('month', DATE '2024-01-15', DATE '2024-03-01') AS m",
    "SELECT date_diff('year', DATE '2023-12-31', DATE '2024-01-01') AS y",
    "SELECT datediff('hour', TIMESTAMP '2024-01-01 00:59:00',"
    " TIMESTAMP '2024-01-01 01:01:00') AS h",
    "SELECT date_diff('day', DATE '2024-01-01', DATE '2024-01-31') AS d",
    # misc
    "SELECT try_cast('xx' AS INT) AS c",
    "SELECT nullif(3, 3) AS n, ifnull(NULL, 7) AS i",
    "SELECT coalesce(NULL, NULL, 3) AS c",
    "SELECT id FROM t WHERE v BETWEEN 15 AND 25",
    "SELECT CASE WHEN v > 15 THEN 'hi' ELSE 'lo' END AS c FROM t ORDER BY id",
    "SELECT x FROM range(3) r(x) ORDER BY x",
    "SELECT a, b FROM (VALUES (1, 'x'), (2, 'y')) v(a, b) ORDER BY a",
    "SELECT v FROM t ORDER BY g NULLS LAST, v LIMIT 2",
    "SELECT json_extract_string('{\"a\": \"x\"}', '$.a') AS j",
    "SELECT CAST(5 AS VARCHAR) AS s, 3::INT8 AS i8, 1.5::FLOAT8 AS f8",
]


# NULL-bearing second relation for the r12 wave (grouping null
# markers, correlated subqueries, set-op NULL handling)
_N_ROWS = [(1, "a", 1), (2, "a", None), (3, None, 3), (4, "b", 4),
           (5, "b", 4)]


@pytest.fixture(scope="module")
def engines(spark):
    # an isolated session carrying the ENGINE's semantics
    # (doubleQuotedIdentifiers — r12); backslash-literal parity rides
    # the same TEXT preprocessing query_df applies (see the test body)
    spark = spark.newSession()
    spark.conf.set("spark.sql.ansi.doubleQuotedIdentifiers", "true")
    register_compat_functions(spark)
    spark.createDataFrame(
        _ROWS, "id long, g string, v long, arr array<long>"
    ).createOrReplaceTempView("t")
    spark.createDataFrame(
        _N_ROWS, "id long, k string, v long"
    ).createOrReplaceTempView("n")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES"
        " (1,'alpha',10,[1,2,3]),(2,'beta',20,[4,5]),(3,'abc',30,[6]))"
        " v(id,g,v,arr)"
    )
    con.execute(
        "CREATE TABLE n AS SELECT * FROM (VALUES (1,'a',1),(2,'a',NULL),"
        "(3,NULL,3),(4,'b',4),(5,'b',4)) v(id,k,v)"
    )
    return spark, con


def _norm(rows):
    return sorted(tuple(str(c) for c in r) for r in rows)


@pytest.mark.parametrize("sql", CASES, ids=lambda s: s[:48])
def test_same_text_both_engines(engines, sql):
    spark, con = engines
    expect = _norm(con.execute(sql).fetchall())
    # the engine's pre-parse bridges (r13 call semantics + r12 literal
    # semantics, composed by prepare_query_text) run BEFORE the
    # dialect fallback (query_df order) — the battery mirrors it
    got = _norm([
        tuple(r)
        for r in spark.sql(rewrite(prepare_query_text(sql))).collect()
    ])
    assert got == expect, f"{sql}\n spark={got}\n duck={expect}"


# r11 wave-5 cases: list functions with probed NULL semantics, the
# compat UDFs, and calendar helpers
CASES_W5 = [
    "SELECT list_append(arr, 9) AS a FROM t ORDER BY id",
    "SELECT list_prepend(0, arr) AS a FROM t ORDER BY id",
    "SELECT list_concat(arr, [9]) AS a FROM t ORDER BY id",
    "SELECT list_position([7,8,9], 8) AS hit, list_position([7,8,9], 99) AS miss",
    "SELECT list_reverse([1,2,3]) AS r, array_reverse([1,2,3]) AS r2",
    "SELECT list_extract([7,8,9], 2) AS e, array_extract([7,8,9], -1) AS ne",
    "SELECT list_max([3,1,2]) AS mx, list_min([3,1,2]) AS mn",
    "SELECT list_max([NULL, 2, 1]) AS mx",
    "SELECT list_sort([3,1,2]) AS s, list_sort([3,NULL,1]) AS sn",
    "SELECT list_reverse_sort([3,NULL,1]) AS rs",
    "SELECT list_unique([1,1,NULL,2]) AS u, list_unique([]) AS e",
    "SELECT list_count([1,NULL,3]) AS c, list_count([]) AS e",
    # list_distinct order is UNSPECIFIED in DuckDB — sort for compare
    "SELECT list_sort(list_distinct([1,1,NULL,2])) AS d",
    "SELECT list_any_value([NULL, 5, 6]) AS a",
    "SELECT strlen('hello') AS n, ord('A') AS o, unicode('A') AS u",
    "SELECT sha256('abc') AS h",
    "SELECT xor(5, 3) AS x",
    "SELECT isodow(DATE '2024-03-05') AS tue, isodow(DATE '2024-03-03') AS sun",
    "SELECT week(DATE '2024-01-01') AS w1, week(DATE '2023-01-01') AS w2",
    "SELECT isnan('nan'::DOUBLE) AS n, isinf('inf'::DOUBLE) AS i",
    "SELECT make_date(2024, 3, 5) AS d",
    "SELECT translate('abc', 'ab', 'xy') AS tr",
    "SELECT map_keys(MAP {'a': 1, 'b': 2}) AS k, map_values(MAP {'a': 1}) AS v",
    "SELECT cot(1.0) AS c, degrees(pi()) AS d, factorial(5) AS f",
]
CASES.extend(CASES_W5)

# r12 advisor regressions: DuckDB treats NULL lists as empty for
# append/prepend and SKIPS NULL list_concat arguments (Spark's
# array_append/concat are NULL-poisoning), and returns NULL on index
# 0 / out-of-range where ANSI-mode element_at throws.  Each of these
# was a silent-wrong-value (or loud-error-on-valid-query) divergence
# before the r12 wrapped-call bridges.
CASES_R12A = [
    "SELECT list_append(CAST(NULL AS INT[]), 1) AS a",
    "SELECT list_append(CAST(NULL AS INT[]), CAST(NULL AS INT)) AS a",
    "SELECT list_append([1], CAST(NULL AS INT)) AS a",
    "SELECT list_prepend(1, CAST(NULL AS INT[])) AS a",
    "SELECT list_prepend(CAST(NULL AS INT), [1]) AS a",
    "SELECT list_concat(CAST(NULL AS INT[]), [1,2]) AS a",
    "SELECT list_concat([1,2], CAST(NULL AS INT[])) AS a",
    "SELECT list_concat(CAST(NULL AS INT[]), CAST(NULL AS INT[])) AS a",
    "SELECT list_concat([1,NULL], [2]) AS a",
    "SELECT list_concat(arr, [9]) AS a FROM t ORDER BY id",
    "SELECT list_extract([1,2,3], 5) AS oob, list_extract([1,2,3], 0) AS z,"
    " list_extract([1,2,3], -1) AS neg",
    "SELECT list_extract(CAST(NULL AS INT[]), 1) AS nl,"
    " list_extract([1,2,3], CAST(NULL AS INT)) AS ni",
    "SELECT array_extract([1,2,3], 5) AS oob",
    "SELECT arr[5] AS oob, arr[0] AS z FROM t ORDER BY id",
    "SELECT ([1,2,3])[-1] AS neg, ([1,2,3])[7] AS oob",
]
CASES.extend(CASES_R12A)

# r12 probe wave (VERDICT r11 #3): window frames (ROWS/RANGE,
# reversed/forward-only/degenerate bounds, named windows, NULL
# ordering), GROUPING SETS / ROLLUP / CUBE null-marker semantics
# against REAL NULL groups (grouping() disambiguation, HAVING on
# grouping, expression rollup keys), correlated subqueries
# (scalar/EXISTS/IN incl. the NOT-IN-with-NULLs trap, correlated
# HAVING), and set-operator type coercion + NULL rows.  58/60
# probes agreed on first contact — pinned here; the two ordered
# quantified comparisons (> ANY / > ALL) had no Spark form and
# now refuse with guidance, while = ANY / <> ALL bridge exactly
# to IN / NOT IN (probed on every NULL/empty edge).
CASES_R12B = [
    'SELECT id, sum(v) OVER (ORDER BY id ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS s FROM t ORDER BY id',
    'SELECT id, sum(v) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s FROM t ORDER BY id',
    'SELECT id, sum(v) OVER (ORDER BY id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS s FROM t ORDER BY id',
    'SELECT id, sum(v) OVER (ORDER BY id ROWS BETWEEN 2 FOLLOWING AND 3 FOLLOWING) AS s FROM t ORDER BY id',
    'SELECT id, sum(v) OVER (ORDER BY id ROWS BETWEEN 3 PRECEDING AND 2 PRECEDING) AS s FROM t ORDER BY id',
    'SELECT id, sum(v) OVER (ORDER BY v RANGE BETWEEN 10 PRECEDING AND 10 FOLLOWING) AS s FROM t ORDER BY id',
    'SELECT id, sum(v) OVER (ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s FROM t ORDER BY id',
    'SELECT id, sum(v) OVER (ORDER BY v DESC RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS s FROM t ORDER BY id',
    'SELECT id, sum(v) OVER (ORDER BY id) AS s FROM t ORDER BY id',
    'SELECT id, sum(v) OVER () AS s FROM t ORDER BY id',
    'SELECT id, first_value(v) OVER (ORDER BY id ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS f, last_value(v) OVER (ORDER BY id ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS l FROM t ORDER BY id',
    'SELECT id, last_value(v) OVER (ORDER BY id) AS l FROM t ORDER BY id',
    'SELECT id, nth_value(v, 2) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS nv FROM t ORDER BY id',
    'SELECT id, v, max(v) OVER (PARTITION BY id % 2 ORDER BY id ROWS UNBOUNDED PRECEDING) AS m FROM t ORDER BY id',
    'SELECT id, count(*) OVER (ORDER BY v RANGE BETWEEN CURRENT ROW AND 15 FOLLOWING) AS c FROM t ORDER BY id',
    'SELECT id, sum(v) OVER w AS s, count(*) OVER w AS c FROM t WINDOW w AS (ORDER BY id ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) ORDER BY id',
    'SELECT id, avg(v) OVER (ORDER BY id ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS a FROM t ORDER BY id',
    'SELECT k, v, sum(v) OVER (PARTITION BY k ORDER BY id) AS s FROM n ORDER BY id',
    'SELECT id, sum(v) OVER (ORDER BY k NULLS FIRST, id) AS s FROM n ORDER BY id',
    'SELECT id, sum(v) OVER (ORDER BY k NULLS LAST, id) AS s FROM n ORDER BY id',
    'SELECT k, sum(v) AS s, grouping(k) AS gk FROM n GROUP BY ROLLUP(k) ORDER BY gk, k NULLS FIRST',
    'SELECT k, v, sum(id) AS s, grouping(k) AS gk, grouping(v) AS gv FROM n GROUP BY CUBE(k, v) ORDER BY gk, gv, k NULLS FIRST, v NULLS FIRST',
    'SELECT k, v, sum(id) AS s FROM n GROUP BY GROUPING SETS ((k), (v), ()) ORDER BY k NULLS FIRST, v NULLS FIRST, s',
    'SELECT k, v, sum(id) AS s FROM n GROUP BY GROUPING SETS ((k, v)) ORDER BY k NULLS FIRST, v NULLS FIRST',
    "SELECT coalesce(k, 'TOTAL') AS kk, sum(v) AS s, grouping(k) AS gk FROM n GROUP BY ROLLUP(k) ORDER BY gk, kk",
    'SELECT k, count(*) AS c FROM n GROUP BY ROLLUP(k) HAVING grouping(k) = 0 ORDER BY k NULLS FIRST',
    'SELECT grouping(k) + grouping(v) AS lvl, count(*) AS c FROM n GROUP BY CUBE(k, v) ORDER BY lvl, c',
    'SELECT k, v % 2 AS p, sum(id) AS s FROM n GROUP BY ROLLUP(k, v % 2) ORDER BY k NULLS FIRST, p NULLS FIRST, s',
    'SELECT t1.id, (SELECT max(t2.v) FROM t t2 WHERE t2.id < t1.id) AS mx FROM t t1 ORDER BY t1.id',
    'SELECT t1.id, (SELECT count(*) FROM t t2 WHERE t2.v > t1.v) AS c FROM t t1 ORDER BY t1.id',
    'SELECT id FROM t t1 WHERE EXISTS (SELECT 1 FROM n WHERE n.id = t1.id AND n.v IS NULL) ORDER BY id',
    'SELECT id FROM t t1 WHERE NOT EXISTS (SELECT 1 FROM n WHERE n.id = t1.id AND n.v IS NULL) ORDER BY id',
    'SELECT id FROM n WHERE v IN (SELECT v FROM t WHERE v < 25) ORDER BY id',
    'SELECT id FROM n WHERE v NOT IN (SELECT v FROM t) ORDER BY id',
    'SELECT id FROM t WHERE v NOT IN (SELECT v FROM n) ORDER BY id',
    'SELECT id FROM t t1 WHERE v = (SELECT max(v) FROM t) ORDER BY id',
    'SELECT t1.g, (SELECT sum(n.v) FROM n WHERE n.id <= t1.id) AS s FROM t t1 ORDER BY t1.g',
    'SELECT k, sum(v) AS s FROM n GROUP BY k HAVING sum(v) > (SELECT avg(v) FROM n) ORDER BY k',
    'SELECT id FROM t UNION SELECT id FROM n ORDER BY id',
    'SELECT v FROM t UNION SELECT v FROM n ORDER BY v NULLS FIRST',
    'SELECT id FROM n EXCEPT SELECT id FROM t ORDER BY id',
    'SELECT id FROM n EXCEPT ALL SELECT id FROM t ORDER BY id',
    'SELECT v FROM n INTERSECT SELECT v FROM t ORDER BY v',
    'SELECT v FROM n INTERSECT ALL SELECT v FROM n ORDER BY v NULLS FIRST',
    'SELECT 1 AS x UNION SELECT 1.5 AS x ORDER BY x',
    'SELECT 1 AS x UNION SELECT CAST(2 AS BIGINT) AS x ORDER BY x',
    'SELECT v AS x FROM t UNION SELECT 1.5 ORDER BY x',
    'SELECT NULL AS x UNION SELECT 1 AS x ORDER BY x NULLS FIRST',
    'SELECT v FROM n UNION ALL SELECT v FROM n ORDER BY v NULLS FIRST LIMIT 4',
    'SELECT k FROM n EXCEPT SELECT g FROM t ORDER BY k NULLS FIRST',
    'SELECT k FROM n INTERSECT SELECT k FROM n ORDER BY k NULLS FIRST',
    'SELECT id, v FROM n EXCEPT SELECT id, v FROM n WHERE v IS NOT NULL ORDER BY id',
    "SELECT sum(v) FILTER (WHERE k = 'a') AS s, count(v) FILTER (WHERE v IS NULL) AS c FROM n",
    'SELECT id, ntile(2) OVER (ORDER BY k NULLS LAST, id) AS nt FROM n ORDER BY id',
    'SELECT id, dense_rank() OVER (ORDER BY v NULLS FIRST) AS dr, rank() OVER (ORDER BY v NULLS FIRST) AS r FROM n ORDER BY id',
    'SELECT id, cume_dist() OVER (ORDER BY v) AS cd FROM t ORDER BY id',
    'SELECT id, lead(v, 1) OVER (ORDER BY id) AS ld, lag(v, 2, -1) OVER (ORDER BY id) AS lg FROM n ORDER BY id',
    'SELECT min(v) OVER (PARTITION BY k) AS m, id FROM n ORDER BY id',
    'SELECT id FROM n WHERE v = ANY (SELECT v FROM t WHERE v < 25) ORDER BY id',
    'SELECT id FROM n WHERE v = SOME (SELECT v FROM t) ORDER BY id',
    'SELECT id FROM t WHERE v <> ALL (SELECT v FROM n) ORDER BY id',
    'SELECT id FROM n WHERE v <> ALL (SELECT v FROM t) ORDER BY id',
    # (the SELECT-LIST form of this probe is a documented blind spot:
    # Spark's existence join projects false where the standard says
    # NULL for a no-match probe against a NULL-bearing set — see
    # dialect.py's module docstring.  WHERE position agrees.)
    "SELECT id FROM n WHERE 2 = ANY (SELECT v FROM n WHERE v IS NULL"
    " OR v = 1) ORDER BY id",
    'SELECT 1 <> ALL (SELECT v FROM n WHERE FALSE) AS a',
]
CASES.extend(CASES_R12B)

# r12 self-review wave over the r11 rewriter additions: ordered
# aggregates with NULL sort keys (the struct-sort null guard and
# the first/last min_by/max_by guard — two silent divergences
# fixed: DuckDB is NULLS LAST in both directions, Spark's struct
# sort and bare min_by/max_by were not), DISTINCT ordered aggs,
# order-insensitive aggs carrying a no-op ORDER BY, the combined
# * EXCLUDE (...) REPLACE (...) star form, datetrunc, and the
# origin-anchored time_bucket bridge (incl. a pre-origin 1969
# timestamp).  Within-tie order for equal sort keys is
# deliberately NOT pinned — unspecified in both engines (ours is
# value-deterministic, DuckDB's is input-order).
CASES_R12C = [
    "SELECT string_agg(g, ',' ORDER BY v DESC) AS sa, list(v ORDER BY g) AS lv FROM t",
    'SELECT list(DISTINCT g ORDER BY g) AS l FROM t',
    'SELECT list(DISTINCT k ORDER BY k) AS l, list(DISTINCT k ORDER BY k DESC) AS ld FROM n',
    'SELECT list(k ORDER BY k) AS l, list(k ORDER BY k DESC) AS ld FROM n',
    'SELECT list(id ORDER BY k NULLS FIRST) AS l FROM n',
    'SELECT last(id ORDER BY k) AS l FROM n',
    'SELECT last(id ORDER BY k DESC) AS l FROM n',
    'SELECT first(id ORDER BY k NULLS FIRST) AS f FROM n',
    'SELECT first(k ORDER BY k) AS f, last(k ORDER BY k) AS l FROM n',
    "SELECT string_agg(CAST(id AS VARCHAR), ',' ORDER BY k) AS s FROM n",
    "SELECT string_agg(CAST(id AS VARCHAR), ',' ORDER BY k DESC) AS s FROM n",
    'SELECT g, sum(v ORDER BY v) AS s FROM t GROUP BY g ORDER BY g',
    'SELECT avg(v ORDER BY v DESC) AS a, count(v ORDER BY g) AS c FROM t',
    'SELECT id, v FROM (SELECT * REPLACE (v * 2 AS v) FROM t) q ORDER BY id',
    'SELECT id, g, v FROM (SELECT * EXCLUDE (arr) REPLACE (v * 2 AS v) FROM t) q ORDER BY id',
    'SELECT id, g, v FROM (SELECT * EXCLUDE (arr) REPLACE (upper(g) AS g, v + 1 AS v) FROM t) q ORDER BY id',
    "SELECT time_bucket(INTERVAL 15 MINUTE, TIMESTAMP '2024-01-01 07:38:21') AS b",
    "SELECT time_bucket(INTERVAL 7 DAY, TIMESTAMP '2024-01-10 07:38:21') AS b",
    "SELECT time_bucket(INTERVAL '90 seconds', TIMESTAMP '2024-01-01 00:02:31') AS b",
    "SELECT time_bucket(INTERVAL 2 HOUR, TIMESTAMP '1969-12-31 23:00:00') AS b",
    "SELECT time_bucket(INTERVAL 1 WEEK, TIMESTAMP '2024-01-10 00:00:00') AS b",
    "SELECT CAST(datetrunc('month', TIMESTAMP '2024-03-15 01:02:03') AS DATE) AS m",
]
CASES.extend(CASES_R12C)

# r12 wave D: EXTRACT/date_part field bridges (epoch is a fractional
# DOUBLE, dow is Sunday=0, isodow is DAYOFWEEK_ISO exactly), numeric
# 1-arg trunc, NULL-guarded format (DuckDB's format is NULL-poisoning
# where Java's format_string prints 'null'), json_valid through
# try_parse_json ('null' and '123' are VALID documents), json_keys,
# datepart/datetrunc synonyms, and interval arithmetic.  upper('ß')
# is a documented blind spot (ICU ẞ vs JVM SS), not pinned.
CASES_R12D = [
    "SELECT extract(epoch FROM TIMESTAMP '2024-01-01 00:00:10.5') AS e",
    "SELECT extract(dow FROM DATE '2024-03-03') AS sun,"
    " extract(dow FROM DATE '2024-03-04') AS mon",
    "SELECT extract(isodow FROM DATE '2024-03-03') AS sun,"
    " extract(isodow FROM DATE '2024-03-04') AS mon",
    "SELECT date_part('dow', DATE '2024-03-03') AS dw,"
    " date_part('isodow', DATE '2024-03-03') AS iso",
    "SELECT date_part('epoch', TIMESTAMP '2024-01-01 00:00:10') AS e",
    "SELECT datepart('year', DATE '2024-03-05') AS y",
    # (trunc over DOUBLE is a documented width divergence: DuckDB keeps
    # DOUBLE where floor/ceil return BIGINT — values equal)
    "SELECT trunc(2.7) AS t, trunc(-2.7) AS tn",
    "SELECT format('{} and {}', 1, 'x') AS f, format('{}', 2.5) AS g",
    "SELECT format('{} {}', NULL, true) AS n",
    "SELECT json_valid('{\"a\":1}') AS v, json_valid('nope') AS nv,"
    " json_valid('null') AS jn, json_valid('123') AS num,"
    " json_valid(NULL) AS sn",
    "SELECT json_keys('{\"a\": 1, \"b\": 2}') AS k",
    "SELECT json_array_length('[1,2,3]') AS n",
    "SELECT levenshtein('kitten', 'sitting') AS d",
    "SELECT INTERVAL 1 DAY + INTERVAL 2 HOUR AS i,"
    " TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 90 MINUTE AS ts",
    "SELECT TIMESTAMP '2024-01-31 10:00:00' + INTERVAL 1 MONTH AS ts",
    "SELECT strftime(TIMESTAMP '2024-03-05 07:08:09', '%d/%m/%Y %I:%M %p') AS f",
    "SELECT strftime(TIMESTAMP '2024-03-05 07:08:09', '%H%M%S') AS f",
    "SELECT strptime('05/03/2024', '%d/%m/%Y') AS ts",
    "SELECT epoch(TIMESTAMP '2024-01-01 00:00:00') AS e,"
    " epoch_ms(TIMESTAMP '2024-01-01 00:00:00.123') AS ms",
    "SELECT greatest(1, NULL, 3) AS g, least(1, NULL, 3) AS l",
    "SELECT log2(8) AS l2, log10(100) AS l10, ln(exp(1)) AS e",
    "SELECT md5('abc') AS h",
    "SELECT substr('日本語abc', 2, 3) AS s, reverse('日本語') AS r,"
    " length('straße') AS n",
]
CASES.extend(CASES_R12D)

# r12 wave E: BACKSLASH literal semantics — the largest silent
# divergence class found to date.  Stock Spark's parser processes
# backslash escapes inside '…' ('\d' parses as 'd'), DuckDB does not,
# so every regex character class in a saved query silently matched
# the wrong thing (probed: regexp_extract('a12', '\d+', 0) = '' on
# the old config, '12' on DuckDB).  Destination sessions (and this
# battery's session) now run spark.sql.parser.escapedStringLiterals
# for exact literal parity; the cases below all carry raw
# backslashes end to end.
CASES_R12E = [
    r"SELECT regexp_extract('2024-03-05', '(\d+)-(\d+)', 2) AS g",
    r"SELECT regexp_extract_all('a1b22c333', '\d+') AS m",
    r"SELECT regexp_matches('abc123', '[a-z]+\d+') AS m",
    r"SELECT regexp_split_to_array('a b  c', '\s+') AS p",
    r"SELECT regexp_replace('a1b2', '\d', 'x', 'g') AS r",
    r"SELECT '\d' AS raw, length('\n') AS n",
    r"SELECT id FROM t WHERE g ~ '\w+' ORDER BY id",
    r"SELECT split_part('a.b.c', '.', 2) AS p",
    r"SELECT string_split('a.b.c', '.') AS s",
    r"SELECT regexp_extract('key=val', '(\w+)=(\w+)', 1) AS k",
    # (order is unspecified on both engines — sorted for compare;
    # DuckDB drops NULL matches, bridged via the filter wrap)
    "SELECT list_sort(list_intersect([1,2,2,3], [2,3,4])) AS i",
    "SELECT list_sort(list_intersect([1,NULL,2], [NULL,2])) AS ni",
    "SELECT list_cat(CAST(NULL AS INT[]), [1]) AS c,"
    " array_cat([2], CAST(NULL AS INT[])) AS a,"
    " array_concat([1], [2]) AS b",
    "SELECT string_to_array('a,b,c', ',') AS s",
]
CASES.extend(CASES_R12E)

# r12 wave F: DuckDB's FROM-first statement forms (bare FROM = SELECT
# *, and FROM … SELECT … reorders to standard clause order) plus
# ordinal GROUP BY/ORDER BY.  COLUMNS() dynamic projections refuse
# with guidance (expansion needs schema).
CASES_R12F = [
    "FROM t",
    "FROM t SELECT id, v",
    "FROM t SELECT id WHERE v > 15",
    "FROM t WHERE v > 15",
    "FROM t SELECT g, sum(v) AS s GROUP BY g ORDER BY g",
    "FROM t ORDER BY id LIMIT 1",
    "FROM t SELECT * EXCLUDE (arr) WHERE id < 3 ORDER BY id",
    "SELECT id, v FROM t ORDER BY 2 DESC",
    "SELECT g FROM t GROUP BY 1 ORDER BY 1",
]
CASES.extend(CASES_R12F)

# r13 pre-parse call-semantics bridges (VERDICT r12 #1): the five
# both-valid-different-meaning forms — each of these was a SILENT
# wrong value before bridge_call_semantics (stock Spark accepted the
# text with its own meaning, so the fallback rewriter never ran).
CASES_R13A = [
    # ^ is power (left-assoc, tighter than *, looser than unary -)
    "SELECT 2 ^ 3 ^ 2 AS assoc, -2 ^ 2 AS un, 2 * 3 ^ 2 AS prec,"
    " 2 ^ -1 AS neg, 4 ^ 0.5 AS frac",
    "SELECT id ^ 2 AS sq FROM t ORDER BY id",
    "SELECT abs(-2) ^ arr[1] AS mix FROM t WHERE id = 1",
    # 2-arg trim family: (string, trim_chars) argument order
    "SELECT trim('xxhixx', 'x') AS t, ltrim('xxhixx', 'x') AS l,"
    " rtrim('xxhixx', 'x') AS r",
    "SELECT trim('abca', 'ab') AS charset, trim('  hi  ') AS plain",
    "SELECT trim(CAST(NULL AS VARCHAR), 'x') AS ns,"
    " trim('a', CAST(NULL AS VARCHAR)) AS nc",
    "SELECT ltrim(g, 'a') AS l FROM t ORDER BY id",
    # 2-arg regexp_extract[_all]: default group 0 (the full match)
    "SELECT regexp_extract('a12b34', '\\d+') AS full",
    "SELECT regexp_extract('a12b34', '(\\d)(\\d)') AS grouped",
    "SELECT regexp_extract('abc', 'z+') AS nomatch",
    "SELECT regexp_extract_all('a1b2', '\\d') AS plain",
    "SELECT regexp_extract_all('a1b2', '(\\d)') AS grouped",
    # 1-arg log is log10 (the 2-arg base form already agrees)
    "SELECT log(100) AS l10, log(2, 8) AS lb, log10(1000) AS e",
    "SELECT round(log(v), 6) AS lv FROM t ORDER BY id",
    # 3-arg regexp_replace: FIRST occurrence + RE2 rewrite syntax
    "SELECT regexp_replace('aaa', 'a', 'X') AS first",
    "SELECT regexp_replace('a1b2', '(\\d)', '<\\1>') AS ref",
    "SELECT regexp_replace('a1b2', '(\\d)', '<\\1>', 'g') AS refg",
    "SELECT regexp_replace('aab', 'a*', 'X') AS star",
    "SELECT regexp_replace('bab', 'a*', 'X') AS empty_first",
    "SELECT regexp_replace('abc', 'z', 'X') AS nomatch",
    "SELECT regexp_replace('ab', 'a', 'x$0y') AS dollar_literal",
    "SELECT regexp_replace(CAST(NULL AS VARCHAR), 'a', 'X') AS n1",
    "SELECT regexp_replace('xaby', 'ab|a', 'Z') AS alt",
    "SELECT regexp_replace('a1b2', '(\\d)(x)?', '<\\2>') AS unmatched",
    "SELECT regexp_replace(g, 'a', '@') AS col FROM t ORDER BY id",
    "SELECT regexp_replace('a$b$c', '\\$', '/', 'g') AS esc",
    # composition across bridges
    "SELECT trim(regexp_replace('xxabcxx', 'b', 'B'), 'x') AS mix",
    "SELECT log(10) ^ 2 AS chained",
]
CASES.extend(CASES_R13A)

# r13 probe wave aimed at the r12 additions (VERDICT r12 #5):
# FROM-first x set ops / subqueries, EXTRACT sub-second fields,
# format() spec subset, json_keys roots/paths, double-quoted
# identifiers x the literal bridge.  The wave found four real
# divergence classes, all fixed and pinned here: the FROM-first
# single-cut reorder corrupted set-op statements (Spark accepts the
# Hive form natively, so only statements with ANOTHER failing token
# hit it); parenthesized SELECT-less FROM-first subqueries refused;
# format_string printed DATE/TIMESTAMP args as their internal ints
# and refused every spec'd placeholder; json_keys returned NULL where
# DuckDB gives [] (non-object roots), lacked the 2-arg path form, and
# swallowed malformed input that DuckDB raises on.
CASES_R13B = [
    # FROM-first x set operations (each branch reorders independently)
    "FROM t SELECT id UNION ALL FROM t SELECT id",
    "FROM t SELECT id // 2 AS h UNION ALL FROM t SELECT id // 3 AS h",
    "FROM t SELECT id WHERE id > 1 UNION FROM t SELECT id WHERE id < 2",
    "FROM t SELECT id EXCEPT FROM t SELECT id WHERE id > 1",
    "FROM t SELECT * EXCLUDE (arr, g) WHERE id < 3 ORDER BY id",
    # FROM-first in subqueries and CTEs
    "SELECT * FROM (FROM t WHERE id = 1) s",
    "FROM (FROM t) q SELECT count(*) AS n",
    "FROM (FROM t SELECT id) q SELECT id ORDER BY id",
    "WITH c AS (FROM t SELECT id, v) SELECT sum(v) AS s FROM c",
    "WITH c AS (FROM t) FROM c SELECT id ORDER BY id",
    "FROM t SELECT g, sum(v) AS s GROUP BY g HAVING sum(v) > 15 ORDER BY g",
    "FROM t SELECT id ORDER BY id LIMIT 1 OFFSET 1",
    # EXTRACT / date_part: epoch + sub-second fields, DATE and TIMESTAMP
    "SELECT extract(epoch FROM DATE '2024-03-05') AS e",
    "SELECT extract(epoch FROM TIMESTAMP '2024-03-05 01:02:03.5') AS e",
    "SELECT extract(epoch FROM DATE '1969-12-31') AS e",
    "SELECT date_part('epoch', DATE '2024-03-05') AS e",
    "SELECT extract(microseconds FROM TIMESTAMP '2024-03-05 01:02:03.5') AS us",
    "SELECT extract(milliseconds FROM TIMESTAMP '2024-03-05 01:02:03.5') AS ms",
    "SELECT date_part('microseconds', TIMESTAMP '2024-03-05 01:02:03.5') AS us",
    "SELECT extract(microsecond FROM TIMESTAMP '2024-01-01 00:00:59.000001') AS us",
    "SELECT extract(dow FROM TIMESTAMP '2024-03-03 05:00:00') AS d,"
    " extract(doy FROM DATE '2024-02-01') AS y",
    # format(): the bridged fmtlib spec subset
    "SELECT format('{:>8}', 'x') AS f",
    "SELECT format('{:<6}', 'ab') AS f",
    "SELECT format('{:.2f}', 3.14159) AS f",
    "SELECT format('{:10.3f}', 3.14159) AS f",
    "SELECT format('{:d}', 42) AS d, format('{:05d}', 7) AS z",
    "SELECT format('{0} {0}', 'a') AS f",
    "SELECT format('{1} {0}', 'a', 'b') AS f",
    "SELECT format('{:x}', 255) AS x, format('{:o}', 9) AS o",
    "SELECT format('{{}} {}', 1) AS f",
    "SELECT format('{}', DATE '2024-03-05') AS f",
    "SELECT format('{}', TIMESTAMP '2024-03-05 01:02:03') AS f",
    "SELECT format('{} {}', NULL, 1) AS f",
    # json_keys: roots, paths, NULLs
    "SELECT json_keys('[1,2]') AS k",
    "SELECT json_keys('1') AS k",
    """SELECT json_keys('{"a":1,"b":{"c":2}}') AS k""",
    "SELECT json_keys('{}') AS k",
    "SELECT json_keys(NULL) AS k",
    """SELECT json_keys('{"a":{"b":1,"c":2}}', '$.a') AS k""",
    """SELECT json_keys('{"a":{"b":1,"c":2}}', 'a') AS k""",
    """SELECT json_keys('{"a":[1,2]}', '$.a') AS k""",
    """SELECT json_keys('{"a":1}', '$.missing') AS k""",
    # double-quoted identifiers x literal bridge
    "SELECT \"v\" FROM t WHERE \"g\" ~ '^a' ORDER BY \"v\"",
    "SELECT \"id\", 'a\\nb' AS s FROM t WHERE \"id\" = 1",
    "SELECT \"g\" FROM t WHERE \"g\" = 'it''s' OR \"id\" = 1",
    "SELECT regexp_extract(\"g\", '(a)l', 1) AS e FROM t ORDER BY id",
]
CASES.extend(CASES_R13B)

# r13 self-probe: corners of this round's OWN bridges (the per-round
# aim-at-your-additions pattern), plus the ~*/!~* anchored-(?i)
# bridge and dollar-quoted literals
CASES_R13C = [
    "SELECT trim('xhix', '') AS a, ltrim('', 'x') AS b,"
    " trim('aaa', 'a') AS c",
    "SELECT 0 ^ 0 AS a, 2 ^ 0.5 ^ 2 AS b",
    "SELECT regexp_replace('', 'a*', 'X') AS a,"
    " regexp_replace('abc', '', 'X') AS b",
    "SELECT regexp_replace('aXa', 'X', '\\0\\0') AS d",
    "SELECT regexp_replace('ab', '(a)|(z)', '<\\2>') AS u",
    "SELECT regexp_extract('', 'a*') AS a,"
    " regexp_extract('abc', '()') AS b",
    "SELECT 2 ** 3 ** 2 AS p",
    "SELECT $$it's$$ AS s",
    "SELECT $t$ $$ nested $t$ AS s",
    "SELECT $$a$b$$ AS s",
    "SELECT regexp_extract('a12', $$\\d+$$) AS e",
    # list_aggregate family (NULL-skipping, empty/NULL → NULL; the
    # decimal elements keep both engines' printed sums identical)
    "SELECT list_aggregate([1.0, NULL, 2.5], 'sum') AS s,"
    " list_aggregate([1, 2, NULL], 'count') AS c",
    "SELECT list_aggregate([3, 1, 2], 'min') AS mn,"
    " list_aggr([3, 1, 2], 'max') AS mx",
    "SELECT list_aggregate([1, 2], 'avg') AS a,"
    " list_avg([1, NULL, 2]) AS b, list_avg(CAST(NULL AS INT[])) AS n",
    "SELECT aggregate([1.0, 2.0], 'sum') AS s",
    "SELECT list_aggregate(['a', NULL, 'b'], 'string_agg', '-') AS s,"
    " list_aggregate(['a', 'b'], 'string_agg') AS d",
    "SELECT list_aggregate(CAST(NULL AS VARCHAR[]), 'string_agg', '-') AS n",
    # aggregate-surface wave: sample-corrected skewness/kurtosis
    # (silent value divergence — DuckDB is bias-corrected), ordered
    # any_value (first NON-NULL in order), FILTER without WHERE,
    # fused/approx/discrete-quantile aliases
    "SELECT round(skewness(v), 6) AS s FROM n",
    "SELECT round(kurtosis(v), 6) AS k FROM n",
    "SELECT round(skewness(v), 6) AS s, round(kurtosis(v), 6) AS k"
    " FROM (SELECT id * id AS v FROM n) q",
    "SELECT skewness(v) AS s FROM (SELECT 1 AS v UNION ALL SELECT 2) q",
    "SELECT kurtosis(v) AS k FROM"
    " (SELECT id AS v FROM n WHERE id <= 3) q",
    "SELECT round(kurtosis_pop(v), 6) AS k FROM n",
    "SELECT any_value(v ORDER BY id) AS a,"
    " any_value(v ORDER BY id DESC) AS d FROM n",
    "SELECT count(v) FILTER (v > 2) AS c,"
    " sum(v) FILTER (WHERE k = 'b') AS s FROM n",
    "SELECT favg(v) AS f, fsum(v) AS fs FROM n",
    "SELECT quantile_disc(v, 0.5) AS q, quantile(v, 0.25) AS q2 FROM n",
    "SELECT approx_quantile(v, 0.5) IS NOT NULL AS q FROM n",
    "SELECT k, quantile_disc(v, 0.5) AS q FROM n GROUP BY k ORDER BY k",
    # parallel unnest ZIPS with NULL padding (Spark's multi-generator
    # projection cross-products silently — the worst class)
    "SELECT unnest([1,2]) AS a, unnest(['x','y','z']) AS b",
    "SELECT 9 AS c, unnest([1,2]) AS a, unnest(['x','y']) AS b",
    "SELECT unnest([1,2]) + 1 AS a, unnest([3,4]) AS b",
    "SELECT id, unnest(arr) AS a, unnest([10,20]) AS b FROM t"
    " WHERE id = 1",
    # comma-lateral unnest correlates
    "SELECT t.id, u.x FROM t, unnest(t.arr) AS u(x) ORDER BY id, x",
    "SELECT t.id, u.x FROM t, unnest(t.arr) u(x) WHERE t.id = 2"
    " ORDER BY x",
    # scalar series are LISTS; wrong-direction calls are empty (Spark
    # sequence auto-reverses — guarded)
    "SELECT generate_series(3) AS a, generate_series(1, 5, 2) AS b",
    "SELECT generate_series(5, 1) AS a, generate_series(-1) AS b",
    "SELECT range(3) AS a, range(0) AS b",
    "SELECT range(2, 10, 3) AS a, range(5, 0, -2) AS b,"
    " range(1, 5, -1) AS c",
    "SELECT unnest(range(3)) AS r",
    # string/vector-surface wave
    "SELECT editdist3('kitten', 'sitting') AS l,"
    " levenshtein('abc', 'abd') AS v",
    "SELECT hamming('abc', 'abd') AS h, mismatches('aaa', 'aba') AS m",
    "SELECT round(jaccard('duck', 'luck'), 6) AS j",
    "SELECT to_base(255, 16) AS b, to_base(9, 2) AS b2",
    "SELECT like_escape('a%c', 'a$%c', '$') AS e,"
    " like_escape('abc', 'a$%c', '$') AS ne",
    "SELECT ilike_escape('A%C', 'a$%c', '$') AS e",
    "SELECT regexp_escape('a.b*c') AS r",
    "SELECT regexp_full_match('a.b', regexp_escape('a.b')) AS m,"
    " regexp_full_match('axb', regexp_escape('a.b')) AS n",
    "SELECT list_dot_product([1.0,2.0], [3.0,4.0]) AS p,"
    " round(list_cosine_similarity([1.0,0.0], [1.0,1.0]), 6) AS c",
    "SELECT list_distance([0.0,0.0], [3.0,4.0]) AS d",
    # datetime wave: silent-NULL date_trunc parts, full day/month
    # names, micros make_timestamp, epoch_ns, complete-interval
    # date_sub (vs date_diff's boundary count)
    "SELECT date_trunc('decade', DATE '2024-05-05') AS d,"
    " date_trunc('century', DATE '1999-02-01') AS c,"
    " date_trunc('millennium', DATE '2024-05-05') AS m",
    "SELECT monthname(DATE '2024-03-05') AS m,"
    " dayname(DATE '2024-03-05') AS d",
    "SELECT make_timestamp(1709600000000000) AS ts",
    "SELECT epoch_ns(TIMESTAMP '2024-03-05 01:02:03.5') AS ns",
    "SELECT date_sub('month', DATE '2024-01-15', DATE '2024-03-14') AS a,"
    " datesub('hour', TIMESTAMP '2024-01-01 00:30:00',"
    " TIMESTAMP '2024-01-01 02:00:00') AS b",
    "SELECT date_sub('day', DATE '2024-01-01', DATE '2024-02-01') AS d,"
    " date_diff('day', DATE '2024-01-01', DATE '2024-02-01') AS boundary",
]
CASES.extend(CASES_R13C)

# r13 regex-PATTERN dialect wave: DuckDB compiles RE2, Spark compiles
# java.util.regex — the pattern is DATA, so the divergences were all
# silent values until the re2_pattern_to_java literal translation.
# Every case probed DIVERGENT (or loudly broken) before the bridge.
CASES_R13D = [
    # POSIX bracket classes — Java reads them as a nested class of
    # the name's characters (silently wrong values, 12 probed)
    "SELECT regexp_extract('ab12cd', '[[:digit:]]+') AS x",
    "SELECT regexp_extract('ab12cd', '[[:alpha:]]+') AS x",
    "SELECT regexp_extract('a b' || chr(9) || 'c', '[[:space:]]+') AS x",
    "SELECT regexp_extract('ab12cd', '[[:alnum:]]+') AS x",
    "SELECT regexp_extract('ab.!?cd', '[[:punct:]]+') AS x",
    "SELECT regexp_extract('aB12', '[[:upper:]]+') AS u,"
    " regexp_extract('aB12', '[[:lower:]]+') AS l",
    "SELECT regexp_extract('ab12zz', '[[:xdigit:]]+') AS x",
    "SELECT regexp_replace('a1b2', '[[:digit:]]', 'X', 'g') AS x",
    "SELECT regexp_matches('x9', '[[:digit:]]') AS x",
    "SELECT regexp_extract('ab12', '[^[:digit:]]+') AS neg,"
    " regexp_extract('ab12', '[[:^digit:]]+') AS negposix",
    "SELECT regexp_extract('a_1-b', '[[:alnum:]_]+') AS mixed,"
    " regexp_extract('a_1-b', '[[:word:]]+') AS word",
    "SELECT regexp_extract('a' || chr(233), '[[:ascii:]]+') AS x",
    # $ is END OF TEXT in RE2; Java's also matches before a trailing
    # newline (three silent probes)
    "SELECT regexp_matches('abc' || chr(10), 'abc$') AS a,"
    " regexp_matches('abc' || chr(10), '^abc$') AS b,"
    " regexp_extract('abc' || chr(10), 'c$') AS c",
    "SELECT id FROM t WHERE g ~ '.*a$' ORDER BY id",
    "SELECT regexp_full_match('abc' || chr(10), 'abc.*') AS x",
    # octal escapes — Java reads \1 as a BACKREFERENCE
    "SELECT regexp_matches('A', '\\101') AS oct3,"
    " regexp_matches(chr(9), '\\11') AS oct2",
    # invalid-quantifier braces are LITERAL in RE2, an error in Java
    "SELECT regexp_matches('a{,3}', 'a{,3}') AS lit,"
    " regexp_matches('a{', 'a{') AS open,"
    " regexp_matches('a{2', 'a{2') AS partial,"
    " regexp_matches('a}', 'a}') AS close",
    # RE2's (?P<name>) named groups (Java spells them (?<name>))
    "SELECT regexp_extract('a1', '(?P<d>[0-9])') AS x",
    # the named-list form returns a STRUCT keyed in list order (the
    # whole-struct value prints engine-specifically — Row vs dict —
    # so the battery pins the FIELD values)
    "SELECT regexp_extract('a1', '([a-z])([0-9])', ['l', 'd']).l AS l,"
    " regexp_extract('a1', '([a-z])([0-9])', ['l', 'd']).d AS d",
    # OPTIONS arguments fold into the pattern (probed: i/c toggle
    # case, s = dot-matches-newline, m/n/p = the default, l literal)
    "SELECT regexp_matches('ABC', 'abc', 'i') AS x",
    "SELECT regexp_extract('ABC12', '([a-z]+)', 1, 'i') AS x",
    "SELECT regexp_extract_all('ABcd', '[a-z]+', 0, 'i') AS x",
    "SELECT regexp_replace('ABC', 'b', 'X', 'i') AS one,"
    " regexp_replace('ABAB', 'b', 'X', 'gi') AS all_ci",
    "SELECT regexp_matches('a' || chr(10) || 'b', 'a.b', 's') AS dotnl,"
    " regexp_matches('a' || chr(10) || 'b', 'a.b', 'm') AS nlsens",
    "SELECT regexp_matches('a.b', 'a.b', 'l') AS lit_hit,"
    " regexp_matches('axb', 'a.b', 'l') AS lit_miss",
    "SELECT str_split_regex('aXbxc', 'x', 'i') AS x",
    # inline flags agree on both engines once (?d) normalizes the
    # line-terminator set
    "SELECT regexp_matches('a' || chr(10) || 'b', '(?m)^b$') AS m,"
    " regexp_matches('a' || chr(10) || 'b', '(?s)a.b') AS s,"
    " regexp_matches('ABC', '(?i)abc') AS i",
    "SELECT regexp_extract('a' || chr(10) || 'b2', '(?m)^b.$') AS x",
    # empty-pattern split: Java also takes the zero-width match at
    # the very end (trailing '' — silently different shape)
    "SELECT str_split_regex('abc', '') AS chars,"
    " str_split_regex('', '') AS empty,"
    " regexp_split_to_array('ab', '') AS viaalias",
    # trailing-empty parity for real matches (both engines keep it)
    "SELECT str_split_regex('ab1', '[0-9]') AS trail,"
    " str_split_regex('aa', 'a') AS allsplit",
    # \Q..\E quoting and class-literal corners ([ and & are literal
    # inside an RE2 class; Java nests/intersects)
    "SELECT regexp_matches('a.b', '\\Qa.b\\E') AS q,"
    " regexp_matches('a[b', '[x[]+b') AS clsbracket,"
    " regexp_matches('a&b', 'a[&]b') AS clsamp",
    # word boundary / \A anchor / unicode class agree natively
    "SELECT regexp_extract('foo bar', '\\bbar\\b') AS b,"
    " regexp_matches('abc', '\\Aabc') AS a,"
    " regexp_matches('a', '\\pL') AS pl",
    # full-match operator with a translated pattern
    "SELECT id FROM t WHERE g ~ '[[:lower:]]+' ORDER BY id",
    "SELECT id FROM t WHERE g !~ '[[:lower:]]+a' ORDER BY id",
]
CASES.extend(CASES_R13D)

# r13 scalar-shape wave: both-valid-different-meaning function corners
# (concat NULL-skipping, left/right negative counts, the substring
# window model, list_slice inclusive slicing, strpos) — every case
# either probed DIVERGENT or loudly unresolved before the bridges.
CASES_R13E = [
    # concat casts-and-skips-NULLs in DuckDB; Spark propagated NULL
    "SELECT concat('a', NULL, 'b') AS x, concat(NULL, NULL) AS y",
    "SELECT concat('a', 1, 2.5) AS x",
    "SELECT concat(DATE '2024-01-02', ' x') AS x",
    "SELECT concat(g, NULL, id) AS x FROM t ORDER BY id",
    "SELECT concat(NULL) AS x",
    # left/right negative counts drop from the other end
    "SELECT left('abcdef', -2) AS l, right('abcdef', -2) AS r",
    "SELECT left('abc', -5) AS l, right('abc', -5) AS r",
    "SELECT left('abcdef', 2) AS l, right('abcdef', 0) AS r",
    "SELECT left(g, -1) AS l FROM t ORDER BY id",
    # substring window model: start 0 shrinks, negative start counts
    # from the end, negative length selects backward
    "SELECT substring('abcdef', 0, 3) AS zero,"
    " substring('abcdef', 1, 3) AS one,"
    " substring('abcdef', -1, 3) AS negone,"
    " substring('abcdef', -2, 3) AS negtwo",
    "SELECT substring('abcdef', -10, 3) AS far,"
    " substring('abcdef', -7, 3) AS edge,"
    " substring('abcdef', 2, 0) AS zlen,"
    " substring('abcdef', 3, -1) AS neglen",
    "SELECT substring('abcdef', -1) AS tail2,"
    " substring('abcdef', 0) AS whole,"
    " substring('abcdef', -6) AS all6",
    "SELECT substr('abcdef', 0, 2) AS s",
    "SELECT substring(g, id - 2, 3) AS dyn FROM t ORDER BY id",
    # list_slice / array_slice: 1-based inclusive, negatives from the
    # end, clamping, begin > end -> []
    "SELECT list_slice([1,2,3,4], 2, 3) AS mid,"
    " list_slice([1,2,3,4], 2, -1) AS toend,"
    " list_slice([1,2,3,4], -3, -2) AS negs",
    "SELECT list_slice([1,2,3,4], 0, 2) AS clamplo,"
    " list_slice([1,2,3,4], 3, 2) AS empty,"
    " list_slice([1,2,3,4], 2, 99) AS clamphi,"
    " list_slice([1,2,3,4], -99, 2) AS clampneg",
    "SELECT array_slice([1,2,3,4], 2, 3) AS a",
    "SELECT list_slice(arr, 1, 2) AS s FROM t ORDER BY id",
    # strpos == instr
    "SELECT strpos('hello', 'l') AS hit, strpos('hello', 'z') AS miss,"
    " strpos('hello', '') AS empty",
]
CASES.extend(CASES_R13E)

# r13 aggregate/struct/map wave: default-separator string_agg (a
# silent value through the fallback's WITHIN-GROUP rewrite AND the
# stock path), histogram/product/entropy templates, struct_extract /
# row(), map_extract, IGNORE-NULLS placement, gcd/lcm/even/isfinite
# compat functions.  MAP-typed whole values print engine-specifically
# (dict-of-arrays in duckdb's python repr), so map results pin via
# element access / cardinality.
CASES_R13F = [
    # 1-arg string_agg family: DuckDB's default separator is ','
    "SELECT string_agg(k ORDER BY id) AS s FROM n",
    "SELECT string_agg(k) AS s FROM (SELECT k FROM n WHERE id = 1) q",
    "SELECT group_concat(k ORDER BY id) AS s FROM n",
    "SELECT group_concat(k) AS s FROM (SELECT k FROM n WHERE id <= 1) q",
    "SELECT listagg(id ORDER BY id) AS s FROM n",
    # list/array_agg keep NULL elements (ordered forms)
    "SELECT list(v ORDER BY id) AS l FROM n",
    "SELECT array_agg(v ORDER BY id) AS l FROM n",
    "SELECT k, list(v ORDER BY id) AS l FROM n GROUP BY k"
    " ORDER BY k NULLS FIRST",
    # histogram: value -> count map, NULLs dropped, keys ascending
    "SELECT map_keys(histogram(k)) AS ks, map_values(histogram(k)) AS vs"
    " FROM n",
    "SELECT map_keys(histogram(v)) AS ks, map_values(histogram(v)) AS vs"
    " FROM n",
    "SELECT histogram(v) IS NULL AS empty FROM n WHERE false",
    # product: NULL-skipping, all-NULL -> NULL
    "SELECT product(v) AS p FROM n",
    "SELECT product(v) AS p FROM n WHERE v IS NULL",
    # entropy: log2-based, NULLs dropped, empty -> 0.0
    "SELECT entropy(k) AS e FROM n",
    "SELECT entropy(v) AS e FROM n",
    "SELECT entropy(v) AS e FROM n WHERE false",
    # map_extract returns a LIST ([] on miss/NULL key)
    "SELECT map_extract(MAP {'a': 1}, 'a') AS hit,"
    " map_extract(MAP {'a': 1}, 'z') AS miss,"
    " map_extract(MAP {'a': 1}, NULL) AS nullkey",
    # struct_extract by name and position (row() -> struct())
    "SELECT struct_extract({'a': 7, 'b': 'x'}, 'b') AS b",
    "SELECT struct_extract(row(1, 'x'), 1) AS p1,"
    " struct_extract(row(1, 'x'), 2) AS p2",
    # IGNORE NULLS moves out of the call parens
    "SELECT id, last_value(v IGNORE NULLS) OVER (ORDER BY id) AS lv"
    " FROM n ORDER BY id",
    "SELECT id, first_value(v IGNORE NULLS) OVER (ORDER BY id) AS fv"
    " FROM n ORDER BY id",
    "SELECT id, lag(v IGNORE NULLS) OVER (ORDER BY id) AS l"
    " FROM n ORDER BY id",
    # compat scalar functions, value-probed
    "SELECT even(2.5) AS a, even(-2.5) AS b, even(2.0) AS c,"
    " even(-0.5) AS d",
    "SELECT gcd(12, 18) AS a, gcd(-12, 18) AS b, gcd(0, 5) AS c,"
    " gcd(0, 0) AS d, lcm(4, -6) AS e",
    "SELECT greatest_common_divisor(12, 18) AS g,"
    " least_common_multiple(4, 6) AS l",
    "SELECT isfinite(1.0) AS f, isfinite('inf'::DOUBLE) AS inf,"
    " isfinite('nan'::DOUBLE) AS nan",
    # regr family / covar agree natively (pinned)
    "SELECT covar_samp(id, v) AS cs, covar_pop(id, v) AS cp FROM n",
    "SELECT regr_slope(v, id) AS s, regr_count(v, id) AS c FROM n",
]
CASES.extend(CASES_R13F)

# r13 string-utility wave: the previously loud-by-design family
# implemented — format_bytes (truncated one-decimal binary units),
# the parse_path family (root components, separator overloads,
# trim_extension), and the Arrow-vectorized similarity functions
# (jaro / jaro-winkler with the 0.7 boost threshold, FULL
# Damerau-Levenshtein, NFD strip_accents) — each validated
# value-exact against DuckDB (400 random pairs for the similarity
# trio) before pinning.
CASES_R13G = [
    "SELECT format_bytes(0) AS a, format_bytes(1) AS b,"
    " format_bytes(-1) AS c, format_bytes(1023) AS d,"
    " format_bytes(1024) AS e, format_bytes(2047) AS f",
    "SELECT format_bytes(-2048) AS a, format_bytes(123456789) AS b,"
    " format_bytes(1152921504606846976) AS c,"
    " format_bytes(1023999999999999999) AS d",
    "SELECT parse_path('/a/b/c.txt') AS a, parse_path('a//b') AS b,"
    " parse_path('') AS c, parse_path('/') AS d",
    "SELECT parse_path('a' || chr(92) || 'b', 'backslash') AS a,"
    " parse_path('a' || chr(92) || 'b/c', 'both_slash') AS b",
    "SELECT parse_dirpath('/a/b/c.txt') AS a, parse_dirpath('b.txt') AS b,"
    " parse_dirpath('/a.txt') AS c, parse_dirpath('a/b/') AS d,"
    " parse_dirpath('/') AS e, parse_dirpath('//a//b//c') AS f",
    "SELECT parse_dirname('/a/b/c.txt') AS a,"
    " parse_dirname('a/b/c.txt') AS b, parse_dirname('b.txt') AS c,"
    " parse_dirname('a/') AS d, parse_dirname('') AS e",
    "SELECT parse_filename('/a/b/c.txt') AS a,"
    " parse_filename('/a/b/c.txt', true) AS b,"
    " parse_filename('a/b/') AS c, parse_filename('.hidden', true) AS d,"
    " parse_filename('a.tar.gz', true) AS e, parse_filename('a.', true) AS f",
    "SELECT parse_filename('/a/b/c.txt', false, 'forward_slash') AS a,"
    " parse_dirpath('/a/b/c.txt', 'forward_slash') AS b",
    "SELECT jaro_similarity('duck', 'duckdb') AS a,"
    " jaro_winkler_similarity('duck', 'duckdb') AS b,"
    " jaro_winkler_similarity('martha', 'marhta') AS c,"
    " jaro_winkler_similarity('dwayne', 'duane') AS d",
    "SELECT jaro_similarity('', '') AS same, jaro_similarity('a', '') AS e,"
    " jaro_winkler_similarity('abcdef', 'abcdef') AS ident",
    "SELECT damerau_levenshtein('duckdb', 'udckbd') AS a,"
    " damerau_levenshtein('ca', 'abc') AS unrestricted,"
    " damerau_levenshtein('', 'abc') AS fromempty,"
    " damerau_levenshtein('', '') AS both_empty",
    "SELECT strip_accents('mühleisen') AS a, strip_accents('łódź') AS b,"
    " strip_accents('âéìõü ÅÆÇ ñ') AS c, strip_accents('héllo wörld') AS d",
    "SELECT jaro_similarity(g, 'alpha') AS j FROM t ORDER BY id",
    "SELECT jaro_similarity('abc', NULL) AS a, strip_accents(NULL) AS b,"
    " damerau_levenshtein(NULL, 'x') AS c, format_bytes(NULL) AS d,"
    " parse_path(NULL) AS e",
]
CASES.extend(CASES_R13G)

# r13 list-function wave: list_select/list_where/list_resize/
# list_reduce/list_zip/list_grade_up and the list_sort option forms —
# each loudly unresolved (or option-refused) before the bridges;
# every corner below probed against DuckDB first.  list_zip structs
# pin via positional struct_extract (DuckDB's zip structs are
# unnamed; the bridge builds col1…colN, the same names struct()
# would).
CASES_R13H = [
    "SELECT list_select([10,20,30], [3,1,3]) AS a,"
    " list_select([10,20], [5]) AS oob",
    "SELECT list_where([10,20,30], [true,false,true]) AS a,"
    " list_where([1,2], [true]) AS short",
    "SELECT list_resize([1,2], 0) AS empty, list_resize([1,2], 4) AS pad,"
    " list_resize([1,2,3], 2, 9) AS cut,"
    " list_resize([1], NULL) AS nullsize",
    # (3-arg fill over a TABLE column is deliberately absent: this
    # DuckDB build fills only the FIRST new slot with the value and
    # ZEROES the rest — [4,5] -> [4,5,-1,0] — contradicting its own
    # docs; the bridge follows the documented all-slots semantics)
    "SELECT list_resize(arr, 4) AS r FROM t ORDER BY id",
    "SELECT list_reduce([1,2,3], (a, b) -> a + b) AS fold,"
    " list_reduce([5], (a, b) -> a + b) AS single",
    "SELECT list_reduce(arr, (a, b) -> a + b) AS r FROM t ORDER BY id",
    "SELECT list_grade_up([30,10,20]) AS asc_perm,"
    " list_grade_up([2,2,1]) AS ties",
    "SELECT list_grade_up([30,10,20], 'DESC') AS d,"
    " list_grade_up(['b','a'], 'DESC') AS s",
    "SELECT list_sort([3,1,2], 'DESC') AS d,"
    " list_sort([3,NULL,1], 'ASC', 'NULLS FIRST') AS nf,"
    " list_sort([3,NULL,1], 'DESC', 'NULLS FIRST') AS dnf,"
    " list_sort([3,NULL,1], 'ASC') AS plain",
    "SELECT struct_extract(list_zip([1,2], ['a','b'])[1], 1) AS z1,"
    " struct_extract(list_zip([1,2,3], ['a'])[2], 2) AS padnull",
    "SELECT struct_extract(list_zip([1,2,3], ['a','b'], true)[2], 2)"
    " AS truncated",
    "SELECT apply([1,2], x -> x * 2) AS a, list_pack(1, 2) AS p,"
    " array_filter([1,2,3], x -> x > 1) AS f",
    "SELECT array_unique([1,1,2,NULL]) AS u, len('abc') AS l",
    "SELECT list_indexof([1,2,3], 3) AS i, list_position([1,2], 9) AS m",
]
CASES.extend(CASES_R13H)

# r13 interaction wave: compositions of this round's OWN bridges
# (the aim-at-your-additions protocol) — pre-parse fixes nesting in
# each other, DISTINCT + ORDER BY through the string_agg separator
# fix, the regex-translated ~ over a concat-bridged expression,
# IGNORE-NULLS with explicit frames.
CASES_R13I = [
    "SELECT string_agg(DISTINCT k ORDER BY k) AS s FROM n",
    "SELECT string_agg(DISTINCT k, '|' ORDER BY k) AS s FROM n",
    # (unordered DISTINCT group_concat is deliberately absent: the
    # concatenation order is engine-internal without ORDER BY)
    "SELECT group_concat(DISTINCT k ORDER BY k) AS s FROM n",
    "SELECT regexp_replace(concat('a', NULL, 'b'), 'b', 'X') AS r",
    "SELECT concat(substring('abcdef', 0, 3), left('xyz', -1)) AS c",
    "SELECT concat(k, id) ~ 'a[[:digit:]]' AS m FROM n"
    " WHERE k IS NOT NULL ORDER BY id",
    "SELECT list_reduce(list_transform(list_zip([1,2],[10,20]),"
    " _s -> struct_extract(_s, 1) + struct_extract(_s, 2)),"
    " (a, b) -> a + b) AS z",
    "SELECT id, last_value(v IGNORE NULLS) OVER (ORDER BY id"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lv"
    " FROM n ORDER BY id",
    "SELECT k, string_agg(CAST(v AS VARCHAR) ORDER BY id) AS s"
    " FROM n GROUP BY k ORDER BY k NULLS FIRST",
]
CASES.extend(CASES_R13I)

# r13 interval-constructor wave: the to_* family (make_dt_interval /
# make_ym_interval spellings) and frame EXCLUDE NO OTHERS (DuckDB's
# spelled-out default, dropped).  Month-granularity results CAST to
# DATE in the text: INTERVAL + DATE widens to TIMESTAMP in DuckDB and
# stays DATE in Spark — the documented printed-type divergence, same
# instant.
CASES_R13J = [
    "SELECT DATE '2024-01-01' + to_days(30) AS d",
    "SELECT TIMESTAMP '2024-01-01 00:00:00' + to_hours(5)"
    " + to_minutes(90) AS ts",
    "SELECT TIMESTAMP '2024-01-01 00:00:00' + to_seconds(90)"
    " + to_milliseconds(500) AS s",
    "SELECT TIMESTAMP '2024-01-01 00:00:00' + to_weeks(2)"
    " + to_microseconds(10) AS w",
    "SELECT CAST(DATE '2024-01-31' + to_months(1) AS DATE) AS m,"
    " CAST(DATE '2024-01-01' + to_years(1) AS DATE) AS y",
    "SELECT CAST(DATE '2020-01-01' + to_decades(1) AS DATE) AS dec,"
    " CAST(DATE '1924-01-01' + to_centuries(1) AS DATE) AS cen",
    "SELECT id, sum(v) OVER (ORDER BY id ROWS BETWEEN 1 PRECEDING"
    " AND 1 FOLLOWING EXCLUDE NO OTHERS) AS s FROM t ORDER BY id",
]
CASES.extend(CASES_R13J)
