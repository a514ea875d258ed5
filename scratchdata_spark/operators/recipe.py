"""Declarative training-data pipeline recipes: compose the corpus
operators (dedup → filter → decontaminate → rebalance → split →
shuffle/chunk/pack) from a plain list of stage dicts and get back the
result plus a per-stage provenance MANIFEST — rows in, rows out,
drops, parameters — the record a data-governance review (and the next
engineer) actually asks for.

The reference engine has no pipeline-composition surface (it is a
query engine; see SURVEY.md §2 — every stage here is beyond-parity),
but a 100 TB pre-training corpus is never built with one operator: it
is exactly this chain, and the chain's VALUE is that each stage is one
of this repo's scale-designed operators — the runner adds sequencing
and bookkeeping, never new shuffles.

A recipe is JSON-shaped (the ``benchmark`` DataFrame for
decontamination is the one non-JSON value), so it can live in config::

    df, manifest = run_recipe(docs, [
        {"op": "exact_dedup"},
        {"op": "near_dedup", "threshold": 0.7},
        {"op": "quality_filter", "min_score": 0.35},
        {"op": "langid_filter", "langs": ["en"]},
        {"op": "decontaminate", "benchmark": eval_df, "drop": True},
        {"op": "cap_per_group", "group_col": "source", "cap": 10000},
        {"op": "temperature", "group_col": "source", "alpha": 0.5},
        {"op": "split", "val_fraction_256": 13},
        {"op": "global_shuffle", "seed": "epoch0", "n_shards": 64},
    ])

Scale notes:

* ``counts=True`` (default) runs one ``count()`` per stage to fill the
  manifest, and therefore defaults ``persist_stages`` ON: each count
  is an action, and counting stage i without persisting would
  re-execute every shuffle of stages 0..i — O(S²) stage work.  With
  persistence each stage computes once (the count materializes it,
  then the predecessor unpersists).  At 100 TB you may still prefer
  ``counts=False`` (manifest rows then carry ``rows_out=None``) and a
  single count at the end.
* At cluster scale prefer checkpointing stage boundaries to a table
  (the warehouse's CTAS) over cache — lineage across ten wide stages
  is how plans outgrow the planner.
* Schema-changing stages (``chunk``, ``pack``) are terminal-ish by
  nature: stages after them must address the columns they emit.  The
  runner does not reorder anything — recipes are executed exactly as
  written.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STAGES: dict[str, Callable[..., DataFrame]] = {}


def _stage(name: str):
    def reg(fn):
        STAGES[name] = fn
        return fn

    return reg


@_stage("exact_dedup")
def _exact_dedup(df, p, id_col, text_col):
    from scratchdata_spark.operators.dedup import exact_dedup

    return exact_dedup(df, text_col, id_col)


@_stage("near_dedup")
def _near_dedup(df, p, id_col, text_col):
    """MinHash-LSH pairs → connected components → keep one member per
    duplicate cluster: the minimum id (default), or with
    ``survivor='best'`` + ``score_col`` the highest-scoring member
    (dedup_by_pairs_best — near-dup clusters routinely hold one clean
    original and several mangled re-crawls; a quality column should
    pick, not crawl order)."""
    from scratchdata_spark.operators.dedup import minhash_lsh_pairs
    from scratchdata_spark.operators.graph import (
        dedup_by_pairs,
        dedup_by_pairs_best,
    )

    pairs = minhash_lsh_pairs(
        df,
        id_col,
        text_col,
        n_hashes=p.get("n_hashes", 64),
        bands=p.get("bands", 16),
        k=p.get("k", 5),
        threshold=p.get("threshold", 0.5),
    )
    survivor = p.get("survivor", "min_id")
    if survivor not in ("min_id", "best"):
        raise ValueError(
            f"near_dedup: unknown survivor {survivor!r}"
            " (use 'min_id' or 'best') — a typo here would silently"
            " discard the high-quality originals the option keeps"
        )
    if survivor == "best":
        if "score_col" not in p:
            raise ValueError("near_dedup: survivor='best' needs score_col")
        return dedup_by_pairs_best(df, pairs, id_col, p["score_col"])
    return dedup_by_pairs(df, pairs, id_col)


@_stage("quality_filter")
def _quality_filter(df, p, id_col, text_col):
    from scratchdata_spark.operators.text import quality_score

    return df.filter(
        quality_score(F.col(text_col)) >= float(p.get("min_score", 0.3))
    )


@_stage("langid_filter")
def _langid_filter(df, p, id_col, text_col):
    from scratchdata_spark.operators.text import lang_id

    return df.filter(lang_id(F.col(text_col)).isin(list(p["langs"])))


@_stage("repetition_filter")
def _repetition_filter(df, p, id_col, text_col):
    from scratchdata_spark.operators.text import dup_token_fraction

    return df.filter(
        dup_token_fraction(F.col(text_col))
        <= float(p.get("max_dup_fraction", 0.3))
    )


@_stage("scrub_pii")
def _scrub_pii(df, p, id_col, text_col):
    from scratchdata_spark.operators.text import scrub_pii

    return df.withColumn(text_col, scrub_pii(F.col(text_col)))


@_stage("decontaminate")
def _decontaminate(df, p, id_col, text_col):
    """``drop=True`` removes contaminated rows and the audit columns;
    default keeps every row with ``contaminated`` /
    ``n_contaminated_ngrams`` attached for review."""
    from scratchdata_spark.operators.pipeline import decontaminate

    out = decontaminate(
        df,
        p["benchmark"],
        text_col=text_col,
        id_col=id_col,
        bench_text_col=p.get("bench_text_col"),
        n=p.get("n", 8),
        min_hits=p.get("min_hits", 1),
    )
    if p.get("drop", False):
        out = out.filter(~F.col("contaminated")).drop(
            "contaminated", "n_contaminated_ngrams"
        )
    return out


@_stage("cap_per_group")
def _cap_per_group(df, p, id_col, text_col):
    from scratchdata_spark.operators.pipeline import cap_per_group

    return cap_per_group(
        df, p["group_col"], int(p["cap"]), id_col=id_col, text_col=text_col
    )


@_stage("temperature")
def _temperature(df, p, id_col, text_col):
    from scratchdata_spark.operators.pipeline import resample_by_temperature

    return resample_by_temperature(
        df,
        p["group_col"],
        alpha=float(p.get("alpha", 0.5)),
        id_col=id_col,
        text_col=text_col,
    )


@_stage("split")
def _split(df, p, id_col, text_col):
    from scratchdata_spark.operators.pipeline import train_val_split

    return train_val_split(
        df, text_col=text_col, val_fraction_256=p.get("val_fraction_256", 13)
    )


@_stage("leakage_safe_split")
def _leakage_safe_split(df, p, id_col, text_col):
    """Near-dup-aware split: pairs come from MinHash-LSH at the given
    threshold, clusters split by their representative's content hash
    (pipeline.leakage_safe_split) — near-duplicates never straddle
    train/val."""
    from scratchdata_spark.operators.dedup import minhash_lsh_pairs
    from scratchdata_spark.operators.pipeline import leakage_safe_split

    pairs = minhash_lsh_pairs(
        df, id_col, text_col, threshold=p.get("threshold", 0.5)
    )
    return leakage_safe_split(
        df,
        pairs,
        id_col=id_col,
        text_col=text_col,
        val_fraction_256=p.get("val_fraction_256", 13),
    )


@_stage("remove_span_dups")
def _remove_span_dups(df, p, id_col, text_col):
    """Exact-substring span REMOVAL (dedup.remove_duplicate_spans —
    Lee et al. §4.2): every repeated ``ngram``-token window keeps one
    canonical occurrence corpus-wide, covered positions elsewhere are
    deleted and the text rebuilt.  The operator emits only
    (id, text, metrics), so non-text columns (source, lang, …) are
    re-attached by id — ONE hash exchange, which downstream stages
    (cap_per_group by source) need anyway.  ``keep_metrics=True``
    carries n_tokens/n_tokens_removed into the output for auditing."""
    from scratchdata_spark.operators.dedup import remove_duplicate_spans

    rewritten = remove_duplicate_spans(
        df.select(id_col, text_col),
        id_col=id_col,
        text_col=text_col,
        ngram=p.get("ngram", 20),
        min_count=p.get("min_count", 2),
        hashed=p.get("hashed", True),
    )
    if not p.get("keep_metrics", False):
        rewritten = rewritten.select(id_col, text_col)
    return df.drop(text_col).join(rewritten, id_col)


@_stage("semantic_dedup")
def _semantic_dedup(df, p, id_col, text_col):
    """SemDeDup survivors (semantic.semantic_dedup): k-means cluster,
    within-cluster cosine pairs at ``threshold``, transitive closure,
    keep the min-id member — then a semi-join filters the corpus to
    survivors (ids only cross the join, full rows never shuffle
    twice).  Requires ``vec_col``: the recipe's frame must carry the
    embedding column alongside the text."""
    from scratchdata_spark.operators.semantic import semantic_dedup

    survivors = semantic_dedup(
        df,
        id_col=id_col,
        vec_col=p["vec_col"],
        k=p.get("k", 8),
        threshold=p.get("threshold", 0.9),
        max_iter=p.get("max_iter", 4),
        max_cluster_compare=p.get("max_cluster_compare", 4096),
    )
    return df.join(survivors.select(id_col), id_col, "semi")


@_stage("url_dedup")
def _url_dedup(df, p, id_col, text_col):
    """One row per normalized URL (urls.dedup_by_url: min-id
    survivor; NULL/malformed URLs pass through ungrouped) — the
    crawl-recipe step BEFORE text-level dedup."""
    from scratchdata_spark.operators.urls import dedup_by_url

    return dedup_by_url(
        df, url_col=p.get("url_col", "target_uri"), id_col=id_col
    )


@_stage("blocked_hosts")
def _blocked_hosts(df, p, id_col, text_col):
    """Drop rows under blocked hostnames (urls.filter_blocked_hosts:
    entry blocks itself + subdomains, broadcast anti-join)."""
    from scratchdata_spark.operators.urls import filter_blocked_hosts

    return filter_blocked_hosts(
        df, list(p["domains"]), url_col=p.get("url_col", "target_uri")
    )


@_stage("remove_boilerplate")
def _remove_boilerplate(df, p, id_col, text_col):
    """Paragraph-level boilerplate strip (text.remove_boilerplate,
    jusText-style, map-only column algebra) — slots between HTML
    extraction and quality filtering in a crawl recipe."""
    from scratchdata_spark.operators.text import remove_boilerplate

    return remove_boilerplate(
        df,
        text_col=text_col,
        min_words=int(p.get("min_words", 5)),
        min_stopword_fraction=float(p.get("min_stopword_fraction", 0.12)),
        max_digit_fraction=float(p.get("max_digit_fraction", 0.30)),
        max_punct_fraction=float(p.get("max_punct_fraction", 0.30)),
        stopwords=p.get("stopwords"),
        require_terminal_punct=bool(p.get("require_terminal_punct", False)),
        drop_repeated_paragraphs=bool(
            p.get("drop_repeated_paragraphs", False)
        ),
    )


@_stage("dsir_select")
def _dsir_select(df, p, id_col, text_col):
    """DSIR data selection (selection.dsir_select): keep the top-``k``
    documents by hashed n-gram importance against a ``target``
    reference corpus (a DataFrame parameter — the decontaminate
    stage's benchmark pattern).  Keeps the caller's full rows via a
    left-semi join on the selected ids."""
    from scratchdata_spark.operators.selection import dsir_select

    picked = dsir_select(
        df,
        p["target"],
        id_col,
        text_col,
        k=int(p["k"]),
        buckets=int(p.get("buckets", 8192)),
        alpha=float(p.get("alpha", 1.0)),
        portable=bool(p.get("portable", False)),
        # default OFF inside recipes: the operator's persisted feature
        # relation has no reachable unpersist handle from here, and a
        # long-lived session running many recipes would pin one cache
        # per run (r10 third review catch); opt in for one-shot runs
        # where the double tokenization matters more
        persist=bool(p.get("persist_features", False)),
    )
    return df.join(picked.select(id_col), id_col, "left_semi")


@_stage("paragraph_dedup")
def _paragraph_dedup(df, p, id_col, text_col):
    """Corpus-wide paragraph dedup (dedup.dedup_paragraphs, the CCNet
    step) — slots between boilerplate removal and doc-level dedup in
    a crawl recipe.  Adds the ``paragraphs_removed`` column."""
    from scratchdata_spark.operators.dedup import dedup_paragraphs

    return dedup_paragraphs(
        df,
        id_col=id_col,
        text_col=text_col,
        sep=p.get("sep", "\n"),
        min_chars=int(p.get("min_chars", 1)),
    )


@_stage("quality_model")
def _quality_model(df, p, id_col, text_col):
    """Model-based quality filter (selection.score_quality): keep
    documents whose classifier probability clears ``min_prob``.
    ``weights``/``bias`` are a trained model (selection.
    train_quality_classifier output) — the recipe applies it through
    score_quality's auto dispatch (r13: the map-only Arrow LUT tier
    for closure-sized weight tables, the broadcast-join plan above
    the cap).  Slots after the heuristic quality_filter in a crawl
    recipe (cheap rules first, model second — the CCNet ordering)."""
    from scratchdata_spark.operators.selection import score_quality

    scored = score_quality(
        df.select(id_col, text_col),  # scoring needs only (id, text)
        p["weights"],
        float(p["bias"]),
        id_col=id_col,
        text_col=text_col,
        buckets=int(p.get("buckets", 4096)),
        portable=bool(p.get("portable", False)),
    )
    return df.join(
        scored.filter(
            F.col("quality_prob") >= float(p.get("min_prob", 0.5))
        ).select(id_col),
        id_col,
        "left_semi",
    )


@_stage("global_shuffle")
def _global_shuffle(df, p, id_col, text_col):
    from scratchdata_spark.operators.pipeline import global_shuffle

    return global_shuffle(
        df,
        id_col=id_col,
        seed=p.get("seed", "epoch0"),
        n_shards=p.get("n_shards", 8),
    )


@_stage("chunk")
def _chunk(df, p, id_col, text_col):
    from scratchdata_spark.operators.pipeline import chunk_documents

    return chunk_documents(
        df,
        id_col=id_col,
        text_col=text_col,
        chunk_chars=p.get("chunk_chars", 512),
        overlap_chars=p.get("overlap_chars", 64),
    )


@_stage("pack")
def _pack(df, p, id_col, text_col):
    from scratchdata_spark.operators.pipeline import pack_sequences

    return pack_sequences(
        df,
        p["group_col"],
        id_col=id_col,
        text_col=text_col,
        context_tokens=p.get("context_tokens", 2048),
    )


@_stage("filter")
def _filter(df, p, id_col, text_col):
    """Escape hatch: an arbitrary SQL boolean expression over the
    current columns (stays Catalyst-side — this is ``F.expr``, not a
    Python predicate)."""
    return df.filter(F.expr(p["where"]))


@_stage("checkpoint")
def _checkpoint(df, p, id_col, text_col):
    """Explicit LINEAGE CUT at a phase boundary (localCheckpoint).

    The selection stages (paragraph_dedup, quality_model,
    dsir_select, decontaminate, …) each join the frame against a
    derivative of itself, DOUBLING the logical plan; a recipe that
    composes several of them makes Catalyst re-analyze an
    exponentially growing tree — the r11 crawl-chain soak measured
    49-75 s of pure PLANNING per action on a ten-stage chain against
    ~3 s once cut (persistence does not truncate lineage for
    analysis; a checkpoint does).  Slot one of these between the
    cleaning phase and the selection phase.  ``eager=True``
    materializes immediately; the default defers to the next action.
    Note localCheckpoint stores blocks on executors — on a cluster
    where executor loss must be survivable, materialize to a table
    instead (COPY TO + re-scan, the module-docstring note)."""
    return df.localCheckpoint(eager=bool(p.get("eager", False)))


# Parameters a stage cannot run without; validated up front so a
# config typo fails BEFORE any Spark job, not mid-recipe (every other
# key has a default in its stage function).
REQUIRED_PARAMS: dict[str, tuple[str, ...]] = {
    "langid_filter": ("langs",),
    "decontaminate": ("benchmark",),
    "cap_per_group": ("group_col", "cap"),
    "temperature": ("group_col",),
    "pack": ("group_col",),
    "filter": ("where",),
    "semantic_dedup": ("vec_col",),
    "blocked_hosts": ("domains",),
    "quality_model": ("weights", "bias"),
    "dsir_select": ("target", "k"),
}


def run_recipe(
    df: DataFrame,
    stages: list[dict[str, Any]],
    id_col: str = "doc_id",
    text_col: str = "text",
    counts: bool = True,
    persist_stages: bool | None = None,
) -> tuple[DataFrame, list[dict[str, Any]]]:
    """Apply ``stages`` in order; return ``(result, manifest)``.

    Each stage dict needs ``op`` (a key of :data:`STAGES`) plus that
    stage's parameters.  The manifest has one dict per stage —
    ``{stage, op, params, rows_in, rows_out, rows_dropped,
    rows_added}`` (``rows_dropped``/``rows_added`` are the one-sided
    deltas: an expanding stage like ``chunk`` reports added rows, a
    filter reports drops — never a negative count) — with counts
    filled only when ``counts=True`` (``rows_in`` of stage ``i+1``
    reuses ``rows_out`` of stage ``i``; one count job per stage
    total).  Unknown ops and missing required parameters raise
    immediately, BEFORE any Spark work.

    ``persist_stages`` defaults to ``counts``: each per-stage count
    is an action, and without persistence stage ``i``'s count would
    re-execute every shuffle of stages ``0..i`` — O(S²) stage work.
    Persisting each counted stage (and unpersisting its predecessor
    once the count has materialized it) keeps the whole recipe one
    pass per stage.  With ``counts=False`` nothing materializes
    between stages, so an explicit ``persist_stages=True`` leaves
    every stage registered for the session to evict lazily (the
    caller's terminal action materializes them); the returned frame
    stays persisted either way — ``result.unpersist()`` when done."""
    from pyspark import StorageLevel

    unknown = [s.get("op") for s in stages if s.get("op") not in STAGES]
    if unknown:
        raise ValueError(
            f"unknown recipe ops {unknown}; known: {sorted(STAGES)}"
        )
    missing = [
        (s["op"], k)
        for s in stages
        for k in REQUIRED_PARAMS.get(s["op"], ())
        if k not in s
    ]
    if missing:
        raise ValueError(
            "missing required recipe parameters: "
            + ", ".join(f"{op} needs {k!r}" for op, k in missing)
        )
    if persist_stages is None:
        persist_stages = counts
    manifest: list[dict[str, Any]] = []
    rows_in = df.count() if counts else None
    prev_persisted: DataFrame | None = None
    for i, s in enumerate(stages):
        op = s["op"]
        params = {
            k: v for k, v in s.items()
            if k != "op" and not isinstance(v, DataFrame)
        }
        df = STAGES[op](df, s, id_col, text_col)
        if persist_stages:
            df = df.persist(StorageLevel.MEMORY_AND_DISK)
        rows_out = df.count() if counts else None
        if prev_persisted is not None and counts:
            # safe only now: the count above materialized the current
            # stage, so dropping the predecessor cannot force a replay
            prev_persisted.unpersist()
        prev_persisted = df if persist_stages else None
        manifest.append(
            {
                "stage": i,
                "op": op,
                "params": params,
                "rows_in": rows_in,
                "rows_out": rows_out,
                "rows_dropped": (
                    max(rows_in - rows_out, 0) if counts else None
                ),
                "rows_added": (
                    max(rows_out - rows_in, 0) if counts else None
                ),
            }
        )
        rows_in = rows_out
    return df, manifest
