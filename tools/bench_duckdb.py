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

    for n in names:  # warm: page cache + duckdb meta
        con.execute(REGISTRY[n][1]).fetchall()

    timings: dict[str, float] = {}
    for n in names:
        sql = REGISTRY[n][1]
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
                "skipped_no_oracle": skipped,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
