"""Streaming admission-chain soak (VERDICT r11 #6): the batch chain's
1x/10x/100x ladder re-run through streaming/admission.py — same
generated archives (crawl_chain_soak.generate, fixed dup topology),
same stage operators, but paced as MICRO-BATCHES, which is where
streaming plans go superlinear (per-trigger planning cost, state the
plan should not have, sink commit overhead).

Protocol:

* Every scale runs the FULL chain (parse → robots closure → blocked →
  boilerplate → heuristic → classifier gate → DSIR gate) as ONE
  availableNow streaming query with ``maxFilesPerTrigger`` set to a
  TENTH of the archive count — 10 micro-batches at every rung, so a
  rung-to-rung wall comparison holds per-batch work 10x-ing while the
  trigger count stays fixed.  Per-trigger walls come from the query's
  own progress events (``batchDuration``); a superlinear LAST batch
  vs the first flags state or planning accumulation across triggers
  (there should be none — the chain is stateless by construction).
* Per-stage attribution runs at the 10x rung only, as an ablation
  ladder (prefixes of the stage list, one stream run each): stage
  wall ~= wall(prefix k) - wall(prefix k-1).  The batch soak's
  persist-boundary timing cannot exist inside one streaming plan, so
  the ladder is the streaming-faithful equivalent; batch walls for
  the same operators are already in scales[*].crawl_chain.
* Offline fits (classifier weights, DSIR log-ratio table, robots
  rules) are timed separately under ``fit_offline_walls_sec`` — they
  are batch work by design and must not hide in the stream walls.

Runs must be SOLO (the crawl_chain_soak caveat).  Merges an
``admission_stream`` block into each matching scale of
BENCH_scale.json — never rewrites the file wholesale.

Usage: python tools/admission_stream_soak.py [archives[,...]]
default "50,500,5000" (1x/10x/100x, ~101 records per archive).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawl_chain_soak import PAGES_PER_ARCHIVE, _prose, generate

from scratchdata_spark.session import get_spark

# ablation ladder: cumulative stage prefixes (10x rung only)
LADDER = ["parse", "robots", "heuristics", "classifier", "dsir"]


def _fits(spark, path: str) -> tuple[dict, float, dict, float, object, dict]:
    """Offline fits: classifier weights, DSIR ratio table, robots
    rules — each timed."""
    from pyspark.sql import functions as F

    from scratchdata_spark.inventory_extras import _QC_NEG, _QC_POS
    from scratchdata_spark.operators import robots as R
    from scratchdata_spark.operators import warc as W
    from scratchdata_spark.operators.selection import (
        dsir_logratio_table,
        train_quality_classifier,
    )

    walls: dict[str, float] = {}
    t0 = time.perf_counter()
    qc_df = spark.createDataFrame(
        [(i, t, 1) for i, t in enumerate(_QC_POS)]
        + [(100 + i, t, 0) for i, t in enumerate(_QC_NEG)],
        "doc_id long, text string, label int",
    )
    w_fix, b_fix = train_quality_classifier(
        qc_df, "doc_id", "text", "label", buckets=1024
    )
    walls["classifier_fit"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    records = W.read_warc(spark, path + "/*.warc", keep_paragraphs=True)
    rules = R.rules_from_warc(records).persist()
    rules.count()
    walls["robots_rules"] = round(time.perf_counter() - t0, 2)

    # DSIR ratio fit on a bounded SAMPLE of the crawl text (a prior
    # batch in production; the fit is two bounded aggs either way)
    t0 = time.perf_counter()
    raw = (
        records.filter(~F.col("target_uri").endswith("/robots.txt"))
        .select("text")
        .limit(20_000)
    )
    target = spark.createDataFrame(
        [(j, _prose(0, j)) for j in range(PAGES_PER_ARCHIVE)
         if j % 8 in (0, 6, 7) and j % 16 not in (14, 15)],
        "doc_id long, text string",
    )
    table, default = dsir_logratio_table(
        raw, target, "text", buckets=2048
    )
    walls["dsir_fit"] = round(time.perf_counter() - t0, 2)
    return w_fix, b_fix, table, default, rules, walls


def _gates(prefix: str, w_fix, b_fix, table, default, rules) -> dict:
    g: dict = {}
    if prefix in ("robots", "heuristics", "classifier", "dsir"):
        g["robots_rules"] = rules
    if prefix in ("heuristics", "classifier", "dsir"):
        g.update(
            blocked_domains=["spam.biz"], boilerplate={}, min_score=0.3
        )
    else:
        g.update(min_score=None)
    if prefix in ("classifier", "dsir"):
        g.update(
            weights=w_fix, bias=b_fix, qc_buckets=1024, min_prob=0.5
        )
    if prefix == "dsir":
        # threshold = admit-all floor: the soak measures the gate
        # EXPRESSION's cost, the fixture entry pins its verdicts
        g.update(
            dsir_table=table, dsir_default=default,
            dsir_buckets=2048, dsir_min=-1e18,
        )
    return g


def _run_stream(spark, path: str, n: int, gates: dict) -> dict:
    from scratchdata_spark.streaming.admission import start_admission_stream

    base = tempfile.mkdtemp(prefix="sd-admsoak-")
    per_trigger = max(1, n // 10)
    t0 = time.perf_counter()
    q = start_admission_stream(
        spark, path, os.path.join(base, "out"),
        os.path.join(base, "ckpt"),
        max_files_per_trigger=per_trigger, **gates,
    )
    q.awaitTermination()
    wall = round(time.perf_counter() - t0, 2)
    prog = [
        json.loads(p if isinstance(p, str) else p.json)
        for p in q.recentProgress
    ]
    batches = [
        {
            "batch_id": p["batchId"],
            "rows_in": p.get("numInputRows", 0),
            "wall_sec": round(p.get("batchDuration", 0) / 1000.0, 2),
        }
        for p in prog
        if p.get("numInputRows", 0) > 0
    ]
    out_rows = None
    try:
        out_rows = spark.read.parquet(os.path.join(base, "out")).count()
    except Exception:
        out_rows = 0
    shutil.rmtree(base, ignore_errors=True)
    return {"wall_sec": wall, "batches": batches, "rows_out": out_rows}


def main() -> None:
    counts = [
        int(x)
        for x in (sys.argv[1] if len(sys.argv) > 1 else "50,500,5000").split(",")
    ]
    spark = get_spark(app_name="admission-stream-soak")
    results: dict[str, dict] = {}
    for n in counts:
        label = f"{n // 50}x" if n % 50 == 0 else f"n{n}"
        path = generate(spark, n)
        w_fix, b_fix, table, default, rules, fit_walls = _fits(spark, path)
        stats: dict = {
            "n_archives": n,
            "n_records": n * (PAGES_PER_ARCHIVE + 1),
            "fit_offline_walls_sec": fit_walls,
        }
        full = _run_stream(
            spark, path, n,
            _gates("dsir", w_fix, b_fix, table, default, rules),
        )
        stats["full_chain"] = full
        if n % 50 == 0 and n // 50 in (10, 100):
            # gate-tier A/B (r13, VERDICT r12 #3/#6): the full chain
            # re-run with gate_tier pinned to each tier.  full_chain
            # above runs 'auto'; rows_out must agree across tiers
            # (the parity pytest pins values, this pins the e2e
            # stream).  100x also records per-trigger walls per tier
            # so the steady-state flatness check covers both.
            ab: dict = {}
            for tier in ("expr", "arrow"):
                g = _gates("dsir", w_fix, b_fix, table, default, rules)
                g["gate_tier"] = tier
                r = _run_stream(spark, path, n, g)
                ab[tier] = {
                    "wall_sec": r["wall_sec"],
                    "rows_out": r["rows_out"],
                    "trigger_walls_sec": [
                        b["wall_sec"] for b in r["batches"]
                    ],
                }
            ab["rows_out_agree"] = (
                ab["expr"]["rows_out"]
                == ab["arrow"]["rows_out"]
                == full["rows_out"]
            )
            stats["gate_tier_ablation"] = ab
        if n % 50 == 0 and n // 50 == 10:
            # ablation ladder at the 10x rung only
            ladder: dict[str, float] = {}
            prev_wall = 0.0
            for prefix in LADDER:
                r = _run_stream(
                    spark, path, n,
                    _gates(prefix, w_fix, b_fix, table, default, rules),
                )
                ladder[prefix] = round(r["wall_sec"] - prev_wall, 2)
                prev_wall = r["wall_sec"]
            stats["stage_ablation_sec_10x"] = ladder
        rules.unpersist()
        results[label] = stats
        print(json.dumps({label: stats}))

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench = os.path.join(root, "BENCH_scale.json")
    out = {}
    if os.path.exists(bench):
        with open(bench) as f:
            out = json.load(f)
    scales = out.setdefault("scales", {})
    for label, stats in results.items():
        scales.setdefault(label, {})["admission_stream"] = stats
    out.setdefault("notes", {})["admission_stream"] = (
        "streaming admission chain (streaming/admission.py: parse->"
        "robots closure->blocked->boilerplate->quality->classifier "
        "gate->dsir gate), same archives as crawl_chain, 10 micro-"
        "batches per rung (maxFilesPerTrigger=n/10) so per-batch work "
        "10x-es while trigger count stays fixed; per-trigger walls "
        "from progress events; stage attribution = ablation ladder "
        "at 10x; offline fits timed separately; solo box"
    )
    with open(bench, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"merged_into": bench}))


if __name__ == "__main__":
    main()
