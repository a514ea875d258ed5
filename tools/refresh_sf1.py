"""Assemble BENCH_sf1.json from the two engines' bench outputs at the
synthesized sf1 (tools/make_scale.py) — the same-scale dual-engine
comparison BASELINE.md's 2x target is judged against.

Runs bench.py (Spark side, its own best-of-2-passes x reps protocol)
and tools/bench_duckdb.py (DuckDB side, same query set) sequentially
on an idle box, then writes the combined document with per-query
ratios.  Keeps the standing honest-number note about the three
algorithmic-mismatch oracles.

Usage: python tools/refresh_sf1.py [sf_dir] [purpose-note]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALGORITHMIC_MISMATCHES = (
    "x_semantic_dedup", "x_quality_classifier", "x_dsir_select"
)


def _last_json(stdout: str) -> dict:
    for line in reversed(stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit("no JSON line in bench output")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sdscale/sf1"
    purpose = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "refresh after plan-touching changes"
    )
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    spark = _last_json(
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            env=env, capture_output=True, text=True, cwd=ROOT,
        ).stdout
    )
    duck = _last_json(
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "bench_duckdb.py"),
             sf_dir],
            capture_output=True, text=True, cwd=ROOT,
        ).stdout
    )
    ratios = {
        n: round(spark["queries"][n] / duck["queries"][n], 4)
        for n in duck["queries"]
        if n in spark["queries"]
    }
    comparable_ratio = round(
        sum(spark["queries"][n] for n in ratios)
        / sum(duck["queries"][n] for n in ratios),
        4,
    )
    excl = [n for n in ratios if n not in ALGORITHMIC_MISMATCHES]
    comparable_excl = round(
        sum(spark["queries"][n] for n in excl)
        / sum(duck["queries"][n] for n in excl),
        4,
    )
    prior_path = os.path.join(ROOT, "BENCH_sf1.json")
    prior = json.load(open(prior_path)) if os.path.exists(prior_path) else {}
    out = {
        "sf_dir": f"{sf_dir} (tools/make_scale.py: 10x sf0.1,"
        " FK-consistent, content-perturbed)",
        "sf": 1.0,
        "purpose": purpose,
        "spark": spark,
        "duckdb": duck,
        "ratio_spark_over_duckdb": ratios,
        "max_ratio": max(ratios.values()),
        "oracle_comparable_ratio_all": comparable_ratio,
        "oracle_comparable_ratio_excl_algorithmic_mismatches": comparable_excl,
        "honest_number_note": prior.get("honest_number_note", ""),
        "weak_marks_at_sf01": prior.get("weak_marks_at_sf01", ""),
        "methodology": prior.get(
            "methodology",
            "same parquet, warm sessions both engines, best-of runs,"
            " engines sequential on an idle box",
        ),
    }
    with open(prior_path, "w") as f:
        json.dump(out, f, indent=1)
    print(
        json.dumps(
            {
                "spark_total": spark["value"],
                "duckdb_total": duck["value"],
                "max_ratio": out["max_ratio"],
                "oracle_comparable_ratio_all": comparable_ratio,
            }
        )
    )


if __name__ == "__main__":
    main()
