"""Optimization-round measurement harness (guide §1).

For each bench query (HEADLINE + EXTRAS, same set as bench.py):

* captures ``df.explain("formatted")`` to ``plans/r13/<name>_<tag>.txt``
* times the computation with the noop sink (guide §1.4) — every column
  of every row is computed and discarded, so the number excludes the
  driver-collect cost that bench.py's ``toArrow()`` action includes
* labels each job (guide §1.5) so the UI/event log attributes time

No base-table cache is taken: every timed run computes from the parquet
inputs (the optimization-round ground rule).  The plan DataFrame object
is reused across reps (plan cache, not result cache — re-execution
recomputes from the files each time).

Usage: python tools/r13_measure.py <tag> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scratchdata_spark.inventory_extras  # noqa: F401
from bench import EXTRAS, HEADLINE, _query_fn
from scratchdata_spark.inventory import BENCH_VARIANTS, REGISTRY
from scratchdata_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark(
        app_name="r13-measure",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8")),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
            "spark.sql.adaptive.enabled": "false",
        },
    )

    names = [n for n in HEADLINE + EXTRAS if n in REGISTRY or n in BENCH_VARIANTS]
    if only:
        names = [n for n in names if n in only]

    timings: dict[str, float] = {}
    for name in names:
        df = _query_fn(name)(spark, sf_dir)
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        spark.sparkContext.setJobDescription(f"{tag}: {name}")
        # warm pass (codegen/JIT), then best-of-N noop-sink runs
        df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 4)

    print(json.dumps({"tag": tag, "sf_dir": sf_dir, "noop_best_of": reps,
                      "queries": timings,
                      "total": round(sum(timings.values()), 4)}))


if __name__ == "__main__":
    main()
