"""DuckDB side of the BASELINE comparison: run the oracle SQL of every
headline bench query at the same scale factor, warm, best-of-N —
mirrors bench.py's protocol so the 2× target is measured, not guessed.

Usage: python tools/bench_duckdb.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import scratchdata_spark.inventory_extras  # noqa: F401
import scratchdata_spark.streaming.queries  # noqa: F401
from bench import EXTRAS, HEADLINE
from scratchdata_spark.inventory import REGISTRY

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# r14 (VERDICT r13 #7): where bench.py times a BENCH_VARIANT with plain
# double aggregates, DuckDB must time the SAME double-sum text — the
# DECIMAL casts in the oracle SQL exist only for cross-engine hash
# comparability and cost ~4× on the agg hot path, so timing Spark's
# double sums against DuckDB's decimal sums was mildly Spark-favoring.
# Variants that differ from the oracle only by Spark-side plan hints
# (q_intersect's semi-join rewrite, x_multimodal_meta's native
# expression path, q03/q05's BROADCAST hints) need no DuckDB text of
# their own — DuckDB plans the natural text itself — so only the
# decimal→double queries appear here.
DUCKDB_VARIANTS: dict[str, str] = {
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               SUM(l_extendedprice) AS sum_base_price,
               SUM(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
               SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
               AVG(l_quantity) AS avg_qty,
               AVG(l_extendedprice) AS avg_price,
               AVG(l_discount) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q03_shipping_priority": """
        SELECT l_orderkey,
               SUM(l_extendedprice * (1 - l_discount)) AS revenue,
               CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
    """,
    "q05_local_supplier_volume": """
        SELECT n_name, SUM(l_extendedprice * (1 - l_discount)) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    "q06_forecast_revenue": """
        SELECT SUM(l_extendedprice * l_discount) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 25
    """,
    "q_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               SUM(o_totalprice) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    "q_window_frame_rows": """
        SELECT o_custkey, o_orderkey,
               SUM(o_totalprice)
                 OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS running_total,
               AVG(o_totalprice)
                 OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                 AS moving_avg3
        FROM orders
    """,
}


# The _mrg rows time the same query text as their originals (only the
# Spark-side input LAYOUT differs, which DuckDB has no analogue of —
# it parallelizes inside a row group), so they reuse the same
# double-sum variant text; without this they would fall back to the
# DECIMAL oracle SQL and reintroduce the asymmetry for those rows.
for _n in (
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
):
    DUCKDB_VARIANTS[_n + "_mrg"] = DUCKDB_VARIANTS[_n]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    names = [n for n in HEADLINE + EXTRAS if n in REGISTRY and REGISTRY[n][1]]
    skipped = [n for n in HEADLINE + EXTRAS if n not in names]

    def text(n: str) -> str:
        return DUCKDB_VARIANTS.get(n, REGISTRY[n][1])

    for n in names:  # warm: page cache + duckdb meta
        con.execute(text(n)).fetchall()

    timings: dict[str, float] = {}
    for n in names:
        sql = text(n)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[n] = round(best, 4)

    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_wall_clock_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "variant_text_used": sorted(set(DUCKDB_VARIANTS) & set(names)),
                "skipped_no_oracle": skipped,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
