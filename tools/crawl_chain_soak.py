"""Composed crawl-admission-chain soak (VERDICT r9 #4): the
individual stages are each soaked at 100x, but stage BOUNDARIES are
where the historical traps lived (r6 AQE-coalesce on skinny map
sides, cache leaks between plan-identical stages) — so this measures
the chain test_crawl_pipeline.py exercises, composed end to end:

    WARC bytes → read_warc(keep_paragraphs) → rules_from_warc →
    filter_robots_disallowed(tier='join') → blocked_hosts →
    url_dedup → remove_boilerplate → quality_filter → exact_dedup

Synthetic archives hold duplicate TOPOLOGY fixed as the corpus grows
(the r5 generator lesson): every archive carries the same per-8-page
mix — 4 unique prose pages, 1 utm re-fetch of page 0, 1 exact mirror
of page 0 on a second host, 1 robots-disallowed page, 1 blocked-host
page, 1 junk-quality page per cycle — so output mass is linear in the
archive count and a superlinear wall is a real valve failure, not a
generator artifact.  Filler prose is word-shaped (7-char sha-derived
tokens, r6 lesson).

Archives generate INSIDE Spark tasks (one archive per row of a
range), land on /tmp/sdcrawl/<n>/ and persist across a round, like
the sf1 parquet.

Per-stage walls come from persist-boundary timing: each stage's
input is already materialized (persisted + counted), so the stage's
own count bounds exactly its work — the recipe runner's own
persist_stages regime.  Runs must be SOLO (shared-JVM stalls distort
seconds-scale stages).

Usage: python tools/crawl_chain_soak.py [archives[,archives...]]
default "50,500,5000" → 1x/10x/100x at ~101 records per archive
(~5k/50k/505k records — the document soak's scale ladder).  Merges a ``crawl_chain``
block into each matching scale of BENCH_scale.json (never overwrites
the file wholesale — scale_soak.py's known footgun).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scratchdata_spark.session import get_spark

PAGES_PER_ARCHIVE = 100  # j in 0..99; each j%8 slot has a fixed role
GEN_ROOT = "/tmp/sdcrawl"
GEN_VERSION = 3  # bump when _archive_bytes/_prose/role mix changes —
# the cache dir embeds it so stale /tmp corpora never soak silently
# (v3: news paragraph on prose pages + j%16==14 model-junk and
# j%16==15 newsletter-only pages for the r11 selection stages)

# corpus-wide repeated paragraph: prose-shaped (boilerplate keeps it),
# so at 100x its fingerprint is a ~190k-row hot key in the paragraph
# canonical election — the skew case the soak exists to hold linear
NEWS = (
    "subscribe to our newsletter today and we will send you the best "
    "articles of the week."
)
# survives every heuristic, only the trained classifier rejects it; a
# unique token per page keeps the kill mass LINEAR in archives
# (identical bodies would fold to one doc at exact_dedup)
MODEL_JUNK = (
    "click here to buy now click here to buy now sale sale sale and "
    "get the best deals on all of our products buy now limited time"
)


def _prose(i: int, j: int) -> str:
    """Word-shaped unique prose: mostly common (stopword-bearing)
    words so quality/boilerplate keep it, plus sha-derived 7-char
    tokens so no two (i, j) pages are exact duplicates."""
    import hashlib

    uniq = []
    h = hashlib.sha256(f"{i}:{j}".encode()).hexdigest()
    for k in range(0, 28, 7):
        uniq.append("w" + h[k : k + 6])
    return (
        "the quick article text is about the state of the web and "
        "it has many common words that appear in most documents. "
        f"this page covers topic {' '.join(uniq)} in detail and "
        "we think that the reader will find it useful to read."
    )


def _archive_bytes(i: int) -> bytes:
    """One deterministic .warc archive for index ``i`` — fixed
    per-cycle role mix (see module docstring)."""
    from scratchdata_spark.operators import warc as W

    def page(
        body_text: str, chrome: bool = True, news: bool = True
    ) -> bytes:
        chrome_p = (
            "<p>Home | Products | Pricing | Contact | Item 7</p>"
            if chrome
            else ""
        )
        news_p = f"<p>{NEWS}</p>" if news else ""
        return W.encode_http_response(
            (
                f"<html><body>{chrome_p}<p>{body_text}</p>"
                f"{news_p}{chrome_p}</body></html>"
            ).encode()
        )

    host = f"h{i}.example"
    recs = [
        W.encode_warc_record(
            "response",
            W.encode_http_response(
                b"User-agent: *\nDisallow: /private/",
                content_type="text/plain",
            ),
            target_uri=f"https://{host}/robots.txt",
            record_id=f"<urn:uuid:{i}-robots>",
        )
    ]
    for j in range(PAGES_PER_ARCHIVE):
        role = j % 8
        rid = f"<urn:uuid:{i}-{j}>"
        if j % 16 == 14:  # model-junk: only the classifier kills it
            import hashlib as _hl

            tok = "w" + _hl.sha256(f"mj{i}:{j}".encode()).hexdigest()[:6]
            recs.append(W.encode_warc_record(
                "response", page(f"{MODEL_JUNK} {tok}", news=False),
                target_uri=f"https://{host}/promo/{j}",
                record_id=rid,
            ))
        elif j % 16 == 15:  # newsletter-only: paragraph-dedup husk
            recs.append(W.encode_warc_record(
                "response",
                W.encode_http_response(
                    (
                        "<html><body><p>Home | Products | Pricing | "
                        f"Contact | Item 7</p><p>{NEWS}</p><p>Home | "
                        "Products | Pricing | Contact | Item 7</p>"
                        "</body></html>"
                    ).encode()
                ),
                target_uri=f"https://{host}/news/{j}",
                record_id=rid,
            ))
        elif role == 1:  # utm re-fetch of this cycle's page 0
            recs.append(W.encode_warc_record(
                "response", page(_prose(i, j - 1)),
                target_uri=f"https://{host}/art/{j - 1}?utm_source=x",
                record_id=rid,
            ))
        elif role == 2:  # exact text mirror of page 0 on a 2nd host
            recs.append(W.encode_warc_record(
                "response", page(_prose(i, j - 2)),
                target_uri=f"https://m{i}.example/art/{j - 2}",
                record_id=rid,
            ))
        elif role == 3:  # robots-disallowed
            recs.append(W.encode_warc_record(
                "response", page(_prose(i, j)),
                target_uri=f"https://{host}/private/{j}",
                record_id=rid,
            ))
        elif role == 4:  # blocked host
            recs.append(W.encode_warc_record(
                "response", page(_prose(i, j)),
                target_uri=f"https://ads{i % 50}.spam.biz/{j}",
                record_id=rid,
            ))
        elif role == 5:  # junk quality (digits + symbols, no stopwords)
            junk = ("0101 @@ ## 42 $$ %% 9999 ^^ && 8888 !! " * 6).strip()
            recs.append(W.encode_warc_record(
                "response", page(junk, chrome=False, news=False),
                target_uri=f"https://{host}/junk/{j}",
                record_id=rid,
            ))
        else:  # roles 0, 6, 7: unique prose pages
            recs.append(W.encode_warc_record(
                "response", page(_prose(i, j)),
                target_uri=f"https://{host}/art/{j}",
                record_id=rid,
            ))
    return b"".join(recs)


def generate(spark, n_archives: int) -> str:
    out_dir = os.path.join(
        GEN_ROOT, f"{n_archives}-v{GEN_VERSION}-p{PAGES_PER_ARCHIVE}"
    )
    done = os.path.join(out_dir, "_done")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    def write_part(rows):
        for r in rows:
            i = r["id"]
            with open(os.path.join(out_dir, f"a{i:06d}.warc"), "wb") as fh:
                fh.write(_archive_bytes(i))

    spark.range(n_archives).repartition(32).foreachPartition(write_part)
    open(done, "w").close()
    return out_dir


def run_chain(spark, path: str) -> dict:
    """Stage-timed composed chain; every stage input persisted, so
    each wall bounds that stage's own work."""
    from scratchdata_spark.operators import robots as R
    from scratchdata_spark.operators import warc as W
    from scratchdata_spark.operators.recipe import run_recipe

    stats: dict = {"stage_walls_sec": {}, "stage_rows": {}}

    def timed(name, df):
        t0 = time.perf_counter()
        df = df.persist()
        n = df.count()
        stats["stage_walls_sec"][name] = round(time.perf_counter() - t0, 2)
        stats["stage_rows"][name] = n
        return df

    t_all = time.perf_counter()
    records = timed(
        "ingest",
        W.read_warc(spark, path + "/*.warc", keep_paragraphs=True)
        .withColumn("doc_id", F.xxhash64("record_id")),
    )
    rules = R.rules_from_warc(records)
    admitted = timed(
        "robots_join",
        R.filter_robots_disallowed(
            records.filter(~F.col("target_uri").endswith("/robots.txt")),
            rules,
            tier="join",
        ),
    )
    # records (incl. ~GB of binary payloads at 100x) pins the block
    # manager otherwise and distorts the downstream stage walls the
    # tool exists to record (review catch); admitted is materialized
    records.unpersist()
    # r11: the chain now runs the FULL pre-training admission story —
    # the r10 crawl prefix plus paragraph dedup, the trained quality
    # classifier and DSIR selection (VERDICT r10 #3).  The model is
    # trained ONCE on the driver through the full Spark path with the
    # PRODUCTION hash (portable=False — the soak measures the engine
    # tier, not the md5 oracle tier); min_prob=0.5 splits the
    # measured fixture scores (prose ~0.53, model-junk ~0.48, husk
    # sig0 ~0.499).
    from scratchdata_spark.inventory_extras import _QC_NEG, _QC_POS
    from scratchdata_spark.operators.selection import (
        train_quality_classifier,
    )

    qc_df = spark.createDataFrame(
        [(i, t, 1) for i, t in enumerate(_QC_POS)]
        + [(100 + i, t, 0) for i, t in enumerate(_QC_NEG)],
        "doc_id long, text string, label int",
    )
    w_fix, b_fix = train_quality_classifier(
        qc_df, "doc_id", "text", "label", buckets=1024
    )
    prev = admitted
    chain = [
        {"op": "blocked_hosts", "domains": ["spam.biz"]},
        {"op": "url_dedup"},
        {"op": "remove_boilerplate"},
        {"op": "quality_filter", "min_score": 0.3},
        {"op": "exact_dedup"},
        {"op": "paragraph_dedup"},
        {
            "op": "quality_model",
            "weights": w_fix,
            "bias": b_fix,
            "buckets": 1024,
            "min_prob": 0.5,
        },
    ]
    for stage in chain:
        t0 = time.perf_counter()
        df, manifest = run_recipe(prev, [stage])
        stats["stage_walls_sec"][stage["op"]] = round(
            time.perf_counter() - t0, 2
        )
        stats["stage_rows"][stage["op"]] = manifest[0]["rows_out"]
        prev.unpersist()
        prev = df
        if stage["op"] == "exact_dedup":
            # LINEAGE CUT at the cleaning/selection phase boundary
            # (r11 measurement): every selection stage below joins the
            # frame against a derivative of itself, DOUBLING the
            # logical plan — by DSIR the analyzer re-plans ~16 copies
            # of the full crawl DAG and Catalyst planning time, not
            # execution, dominates (measured: the dsir action alone
            # 49-75 s at 1x against ~3 s on a cut lineage).  persist()
            # does NOT truncate lineage for analysis; localCheckpoint
            # does.  Production pipelines materialize at exactly this
            # boundary (the multi-pass selection phase re-reads its
            # admission set by construction).
            prev = prev.localCheckpoint(eager=True)
    # DSIR selection toward archive-0's prose (any fixed slice works:
    # distributions are corpus-wide aggs; k = half the candidates so
    # the selection does real discrimination at every scale)
    from scratchdata_spark.operators.selection import dsir_select

    k = max(1, stats["stage_rows"]["quality_model"] // 2)
    target = spark.createDataFrame(
        [(j, _prose(0, j)) for j in range(PAGES_PER_ARCHIVE)
         if j % 8 in (0, 6, 7) and j % 16 not in (14, 15)],
        "doc_id long, text string",
    )
    t0 = time.perf_counter()
    picked = dsir_select(
        prev, target, "doc_id", "text", k=k, buckets=2048,
    )
    out = prev.join(picked.select("doc_id"), "doc_id", "left_semi")
    n_sel = out.count()
    stats["stage_walls_sec"]["dsir_select"] = round(
        time.perf_counter() - t0, 2
    )
    stats["stage_rows"]["dsir_select"] = n_sel
    stats["wall_sec"] = round(time.perf_counter() - t_all, 2)
    stats["survivors"] = n_sel
    prev.unpersist()
    return stats


def main() -> None:
    counts = [
        int(x)
        for x in (sys.argv[1] if len(sys.argv) > 1 else "50,500,5000").split(",")
    ]
    spark = get_spark(app_name="crawl-chain-soak")
    results: dict[str, dict] = {}
    for n in counts:
        # labels anchor to the FIXED 50-archive 1x base, not the first
        # argument — a single-scale re-run must merge into its own
        # label, not clobber 1x (review catch r10)
        label = f"{n // 50}x" if n % 50 == 0 else f"n{n}"
        path = generate(spark, n)
        stats = run_chain(spark, path)
        stats["n_archives"] = n
        stats["n_records"] = n * (PAGES_PER_ARCHIVE + 1)
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
        scales.setdefault(label, {})["crawl_chain"] = stats
    # r11: the chain changed (three selection stages appended), so the
    # provenance note is REPLACED this once, not setdefault-preserved
    out.setdefault("notes", {})["crawl_chain"] = (
        "composed admission chain (ingest->robots join->blocked->"
        "url_dedup->boilerplate->quality->exact_dedup->paragraph_"
        "dedup->quality_model->dsir_select), fixed dup topology per "
        "archive incl. corpus-wide news paragraph (hot fp key) and "
        "per-16-page model-junk/newsletter-husk classes; walls are "
        "persist-boundary stage timings, solo box"
    )
    with open(bench, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"merged_into": bench}))


if __name__ == "__main__":
    main()
