"""Paired A/B of selected bench queries under the honest protocol.

Usage: python tools/ab_query.py q1 [q2 ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_SHUFFLE,
     AB_AQE=on|off (default off), AB_REPS (default 3).

Mirrors bench.py's r14 rep protocol exactly (fresh build per rep,
clearCache between reps, toArrow action) for one-off measurements.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scratchdata_spark.inventory_extras  # noqa: F401
from scratchdata_spark.inventory import BENCH_VARIANTS, REGISTRY, load
from scratchdata_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    aqe = os.environ.get("AB_AQE", "off") == "on"
    reps = int(os.environ.get("AB_REPS", "3"))
    spark = get_spark(
        app_name="scratchdata-ab",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8")),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024),
            "spark.sql.adaptive.enabled": "true" if aqe else "false",
        },
    )
    load(spark, sf_dir)

    def fn(name):
        if name in BENCH_VARIANTS:
            return BENCH_VARIANTS[name]
        return REGISTRY[name][0]

    for name in names:
        fn(name)(spark, sf_dir).toArrow()  # warm: codegen + JIT
        times = []
        for _ in range(reps):
            spark.catalog.clearCache()
            df = fn(name)(spark, sf_dir)
            t0 = time.perf_counter()
            df.toArrow()
            times.append(round(time.perf_counter() - t0, 4))
        print(f"{name} aqe={'on' if aqe else 'off'} reps={times} best={min(times)}")


if __name__ == "__main__":
    main()
