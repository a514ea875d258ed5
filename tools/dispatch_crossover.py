"""Measure the near_dup_pairs verify-tier crossover (VERDICT r7 #5):
at what corpus size does the grouped-GEMM Arrow verify overtake the
HOF (aggregate/zip_with) verify?

The r7 threshold (small_corpus_rows=4096) was bracketed at 2k/20k but
never measured between — this soak times BOTH tiers on identical
bucketed corpora at 2k/4k/8k/12k/16k/20k vectors (scale_soak's fixed
pairwise topology, so near-dup mass grows linearly and the measured
wall tracks tier cost, not output size) and writes the measured
crossover into BENCH_scale.json's ``dispatch_crossover`` block.

Protocol: solo box, BENCH REGIME.  r14 re-pin (VERDICT r13 #3): the
r8 numbers were taken under the pre-r13 gamed regime (input cached,
one Dataset reused across reps — warm final stages, not queries), so
the crossover they pinned was stale.  The regime now mirrors
bench.py's honest r14 protocol exactly: shuffle_partitions=8, AQE off
(the r14 bench default — production keeps AQE on; the divergence is
the measured per-exchange barrier latency at small scale, bench.py
docstring), NO input cache (parquet scan, page-cache warm only), a
FRESH build per rep with clearCache between reps (plan build outside
the timer, exactly like bench.py's rep loop), warm pass then
best-of-3.

Usage: python tools/dispatch_crossover.py [sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scratchdata_spark.operators.similarity import near_dup_pairs
from scratchdata_spark.session import get_spark
from tools.scale_soak import scaled_embeddings

SIZES = (2048, 4096, 8192, 12288, 16384, 20480)


def _time_tier(
    spark, path: str, n: int, planes: int, force_hof: bool
) -> tuple[float, int]:
    def build():
        vectors = spark.read.parquet(path)
        return near_dup_pairs(
            vectors, dim=64, threshold=0.4, n_planes=planes,
            corpus_size=n,
            small_corpus_rows=(1 << 40) if force_hof else 0,
        )

    # action = bench.py's _fetch (toArrow): a count() over the same
    # plan measured 7× slower on this box (separate aggregate
    # execution path) and is NOT what the bench regime measures
    pairs = build().toArrow().num_rows  # warm pass: codegen + JIT
    best = math.inf
    for _ in range(3):
        # bench.py's r14 rep protocol: fresh build (outside the
        # timer), cleared cache, timed action
        spark.catalog.clearCache()
        df = build()
        t0 = time.monotonic()
        df.toArrow()
        best = min(best, time.monotonic() - t0)
    return best, pairs


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="dispatch-crossover",
        shuffle_partitions=8,  # bench.py's setting: KB-scale shuffles
        # AQE off: the r14 bench default (bench.py) this dispatch serves
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    blocks = []
    import tempfile

    stage_root = tempfile.mkdtemp(prefix="sd_crossover_")
    from scratchdata_spark.inventory import load

    # actual base rows, not a guessed-by-path constant: a wrong base
    # silently measures off-target sizes and the crossover never gets
    # sampled (reviewer catch)
    base = load(spark, sf_dir)["embeddings"].count()
    for target in SIZES:
        replicas = max(1, round(target / base))
        scaled, n = scaled_embeddings(spark, sf_dir, replicas)
        # stage to parquet and read back: the tiers must see the SAME
        # input shape production sees (a parquet scan with real
        # statistics) — timing over the generator's crossJoin lineage
        # changes AQE's broadcast decisions and flips the verdict
        path = os.path.join(stage_root, f"emb_{target}")
        scaled.write.mode("overwrite").parquet(path)
        # NO .cache() of the input (r14 honest regime): the tiers scan
        # parquet like the bench does, warm only at the OS page cache
        planes = max(3, math.ceil(math.log2(max(2.0, n / 60.0))))
        hof_s, hof_pairs = _time_tier(spark, path, n, planes, force_hof=True)
        gemm_s, gemm_pairs = _time_tier(spark, path, n, planes, force_hof=False)
        blocks.append(
            {
                "n_vectors": n,
                "n_planes": planes,
                "hof_sec": round(hof_s, 4),
                "gemm_sec": round(gemm_s, 4),
                "pairs": hof_pairs,
                "pairs_agree": hof_pairs == gemm_pairs,
                "winner": "hof" if hof_s < gemm_s else "gemm",
            }
        )
        print(json.dumps(blocks[-1]), flush=True)
    # crossover = smallest n where GEMM wins and stays winning
    crossover = None
    for b in reversed(blocks):
        if b["winner"] == "gemm":
            crossover = b["n_vectors"]
        else:
            break
    result = {"blocks": blocks, "measured_crossover_n": crossover}
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_scale.json")
    try:
        doc = json.load(open(path))
    except (OSError, ValueError):
        doc = {}
    doc["dispatch_crossover"] = result
    json.dump(doc, open(path, "w"), indent=1)
    print(json.dumps({"measured_crossover_n": crossover}))


if __name__ == "__main__":
    main()
