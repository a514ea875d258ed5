"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet, then compares row count, sorted column
names, and values (sorted rows, float tolerance). Stricter than the
driver on floats is fine; looser is not — so default tolerance is
tight (1e-9 relative).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return ("f", v)
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    try:
        import datetime

        if isinstance(v, (datetime.date, datetime.datetime)):
            return str(v)
        import decimal

        if isinstance(v, decimal.Decimal):
            return ("f", float(v))
    except Exception:
        pass
    return v


def sort_key(row):
    out = []
    for v in row:
        if v is None:
            out.append((0, ""))
        elif isinstance(v, tuple) and len(v) == 2 and v[0] == "f":
            out.append((1, f"{v[1]:.9e}"))
        elif isinstance(v, tuple):
            out.append((2, str(v)))
        else:
            out.append((3, str(v)))
    return out


def cells_equal(a, b, rtol=1e-9, atol=1e-9):
    if isinstance(a, tuple) and len(a) == 2 and a[0] == "f" and isinstance(b, tuple) and b[0] == "f":
        x, y = a[1], b[1]
        if math.isnan(x) and math.isnan(y):
            return True
        return abs(x - y) <= max(atol, rtol * max(abs(x), abs(y)))
    if isinstance(a, tuple) and isinstance(b, tuple) and len(a) == len(b):
        return all(cells_equal(x, y, rtol, atol) for x, y in zip(a, b))
    return a == b


def compare(name, spark_df, con, sql):
    cols_s = sorted(spark_df.columns)
    rows_s = [tuple(norm_cell(r[c]) for c in cols_s) for r in spark_df.collect()]

    res = con.execute(sql)
    cols_d_raw = [d[0] for d in res.description]
    data_d = res.fetchall()
    order = sorted(range(len(cols_d_raw)), key=lambda i: cols_d_raw[i])
    cols_d = [cols_d_raw[i] for i in order]
    rows_d = [tuple(norm_cell(r[i]) for i in order) for r in data_d]

    errs = []
    if cols_s != cols_d:
        errs.append(f"columns differ: spark={cols_s} duckdb={cols_d}")
    if len(rows_s) != len(rows_d):
        errs.append(f"row count: spark={len(rows_s)} duckdb={len(rows_d)}")
    if not errs:
        rows_s.sort(key=sort_key)
        rows_d.sort(key=sort_key)
        bad = 0
        for i, (a, b) in enumerate(zip(rows_s, rows_d)):
            if not all(cells_equal(x, y) for x, y in zip(a, b)):
                if bad < 3:
                    errs.append(f"row {i}: spark={a} duckdb={b}")
                bad += 1
        if bad:
            errs.append(f"{bad}/{len(rows_s)} rows differ")
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from scratchdata_spark.session import get_spark

    spark = get_spark(app_name="check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                n = df.count()
                assert df.schema is not None
                n_rows_only += 1
                print(f"  ROWS-ONLY {name}: {n} rows [{time.time()-t0:.1f}s]")
                continue
            errs = compare(name, df, con, oracles[name])
        except Exception as e:  # noqa: BLE001
            errs = [f"EXCEPTION {type(e).__name__}: {str(e)[:300]}"]
        if errs:
            n_fail += 1
            print(f"  FAIL {name} [{time.time()-t0:.1f}s]")
            for e in errs:
                print(f"       {e}")
        else:
            n_pass += 1
            print(f"  PASS {name} [{time.time()-t0:.1f}s]")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
