"""Scale soak for the selection operators (operators/selection.py):
quality-classifier scoring and DSIR weighting at 10× and 100× of the
sf0.1 documents table (50k / 500k docs via scale_soak.scaled_documents,
the fixed-topology generator every other soak uses).

Both operators are one-feature-shuffle shapes, so the thing to verify
is simply that wall-clock stays ~linear 10×→100× (the bucket-bounded
distribution/weight tables keep every other exchange constant-size).
Production hash (xxhash64), best-of-1 cache-cold per scale — the
plans have no fit stage, so there is no cache to warm.

Usage: python tools/selection_soak.py [sf_dir] [replicas,...]
Appends a ``r10_selection_ops`` note to BENCH_scale.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scratchdata_spark.inventory_extras import _qc_fixture
from scratchdata_spark.operators.selection import (
    dsir_select,
    score_quality,
)
from scratchdata_spark.session import get_spark
from tools.scale_soak import scaled_documents

BUCKETS_QC = 4096
BUCKETS_DSIR = 8192


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = [
        int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "10,100").split(",")
    ]
    spark = get_spark()
    weights, bias = _qc_fixture()
    out: dict = {
        "what": (
            "selection operators at scale (scaled_documents topology,"
            " production xxhash64 buckets): score_quality ="
            " feature-shuffle + broadcast weight join + per-doc agg;"
            " dsir = raw/target feature shuffles (raw persisted once)"
            " + bounded dists + per-doc agg + TakeOrdered(1000)."
            " Cache cleared between scales (r10 review catch: a prior"
            " scale's pinned feature cache skews the next timing)."
        )
    }
    for rep in replicas:
        docs, n = scaled_documents(spark, sf_dir, rep)
        docs = docs.persist()
        docs.count()  # materialize the corpus outside the timings
        t0 = time.time()
        score_quality(
            docs, weights, bias, id_col="doc_id", text_col="text",
            buckets=BUCKETS_QC,
        ).agg(F.sum("quality_prob")).collect()
        qc_wall = round(time.time() - t0, 1)
        t0 = time.time()
        raw = docs.filter(F.col("doc_id") % 7 != 0)
        target = docs.filter(F.col("doc_id") % 7 == 0)
        dsir_select(
            raw, target, "doc_id", "text", k=1000, buckets=BUCKETS_DSIR
        ).agg(F.sum("dsir_logweight")).collect()
        dsir_wall = round(time.time() - t0, 1)
        out[f"{rep}x"] = {
            "n_docs": n,
            "quality_score_wall_sec": qc_wall,
            "dsir_select_wall_sec": dsir_wall,
        }
        print(json.dumps({f"{rep}x": out[f"{rep}x"]}))
        docs.unpersist()
        # dsir_logweights persists its internal feature relation (the
        # caller-owns-handles lm.py convention, unreachable from here)
        # — clear it so one scale's cache never pins through the next
        # scale's timing (r10 review catch)
        spark.catalog.clearCache()
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_scale.json",
    )
    with open(path) as f:
        bench = json.load(f)
    bench.setdefault("notes", {})["r10_selection_ops"] = out
    with open(path, "w") as f:
        json.dump(bench, f, indent=1)
    print("written r10_selection_ops")


def paragraph_soak(sf_dir: str = "/root/testdata/sf0.1",
                   replicas: tuple = (10, 100)) -> None:
    """10x/100x walls for dedup_paragraphs over synthesized
    3-paragraph documents (unique body from the scaled corpus text +
    one global shared paragraph + one residue-class paragraph — the
    x_dedup_paragraph fixture shape, so ~2/3 of paragraph instances
    are corpus-wide duplicates: the worst realistic case, every doc
    touched by the drop set)."""
    spark = get_spark()
    out = {
        "what": (
            "dedup_paragraphs over 3-paragraph docs (global shared +"
            " residue-1000 class + unique body): fingerprint agg +"
            " ids-only decision join + doc-level drop-set attach +"
            " map-side rebuild; ~2n duplicate paragraph instances."
            " Cache cleared between scales (r10 review catch)."
        )
    }
    for rep in replicas:
        from tools.scale_soak import scaled_documents

        docs, n = scaled_documents(spark, sf_dir, rep)
        staged = docs.select(
            "doc_id",
            F.concat_ws(
                "\n",
                F.lit("subscribe to our newsletter for updates"),
                F.col("text"),
                F.concat(F.lit("footer "), (F.col("doc_id") % 1000).cast("string")),
            ).alias("text"),
        ).persist()
        staged.count()
        t0 = time.time()
        from scratchdata_spark.operators.dedup import dedup_paragraphs

        res = dedup_paragraphs(staged)
        removed = res.agg(F.sum("paragraphs_removed")).collect()[0][0]
        wall = round(time.time() - t0, 1)
        out[f"{rep}x"] = {
            "n_docs": n,
            "paragraphs_removed": int(removed),
            "wall_sec": wall,
        }
        print(json.dumps({f"{rep}x": out[f"{rep}x"]}))
        staged.unpersist()
        spark.catalog.clearCache()  # same cross-scale hygiene as main()
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_scale.json",
    )
    with open(path) as f:
        bench = json.load(f)
    bench.setdefault("notes", {})["r10_paragraph_dedup"] = out
    with open(path, "w") as f:
        json.dump(bench, f, indent=1)
    print("written r10_paragraph_dedup")


if __name__ == "__main__":
    main()
