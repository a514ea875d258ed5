"""Scale telemetry for the Bloom dedup pre-screen: does the
build-once / screen-per-increment lifecycle hold its walls and its
false-positive rate as the corpus grows 10×?

Records per scale: bitmap size, build wall (the one byte-fold
shuffle + bounded collect), screen wall over an equally-sized fresh
increment, measured fp fraction vs the 1% target, and the join-input
reduction the screen buys (the number the design exists for).

MERGES into BENCH_scale.json under the ``bloom`` key — never
overwrites the other soak blocks (the r8 scale_soak rewrite lesson).

Usage: python tools/bloom_soak.py [sf_dir] [replicas]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scratchdata_spark.operators import bloom as B
from scratchdata_spark.session import get_spark
from tools.scale_soak import scaled_documents


def block(spark, sf_dir: str, replicas: int) -> dict:
    docs, n = scaled_documents(spark, sf_dir, replicas)
    docs = docs.persist()
    docs.count()
    t0 = time.monotonic()
    bl = B.build_bloom(docs, "text", expected_items=n, fpp=0.01)
    build_wall = time.monotonic() - t0
    # fresh increment, same size: token-distinct filler (never in
    # the corpus), so every maybe_dup=True is a false positive
    fresh = docs.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(F.lit("fresh increment "), F.col("doc_id").cast("string"),
                 F.lit(" "), F.reverse(F.col("text"))).alias("text"),
    ).persist()
    n_fresh = fresh.count()
    t0 = time.monotonic()
    maybe = (
        B.screen_new_against_bloom(fresh, bl, "text")
        .filter(F.col("maybe_dup"))
        .count()
    )
    screen_wall = time.monotonic() - t0
    docs.unpersist()
    fresh.unpersist()
    return {
        "n_corpus": n,
        "bitmap_mib": round(bl["m"] / 8 / 1024 / 1024, 2),
        "k_hashes": bl["k"],
        "build_wall_sec": round(build_wall, 3),
        "n_increment": n_fresh,
        "screen_wall_sec": round(screen_wall, 3),
        "false_positives": maybe,
        "fp_fraction": round(maybe / max(1, n_fresh), 5),
        "join_input_reduction": round(1 - maybe / max(1, n_fresh), 5),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="bloom-soak")
    out = {"1x": block(spark, sf_dir, 1), f"{replicas}x": block(spark, sf_dir, replicas)}
    print(json.dumps(out), flush=True)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_scale.json",
    )
    try:
        doc = json.load(open(path))
    except (OSError, ValueError):
        doc = {}
    # merge at BOTH levels: sibling soak blocks survive, and so do
    # this block's other replica factors from earlier runs (reviewer
    # catch — plain assignment dropped a prior 100x entry)
    doc.setdefault("bloom", {}).update(out)
    json.dump(doc, open(path, "w"), indent=1)


if __name__ == "__main__":
    main()
