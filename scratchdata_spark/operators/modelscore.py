"""Batch model-inference seam for corpus scoring.

The last filtering stage of a production training-data pipeline runs
a learned model over every document — a fastText/BERT quality
classifier, a perplexity filter, an embedding or reward model. That
inference is Python-library territory, so this operator is the same
kind of seam as the multimodal codec layer (operators/multimodal.py):
the Spark-side plumbing — Arrow-batched ``mapInPandas``, schema
handling, partition-level batching — is real and tested, and the
model itself is pluggable:

* ``scorer=None`` uses :func:`default_scorer` — a deterministic
  linear quality score over interpretable features (token count,
  alphabetic fraction, length saturation) computed with RATIONAL
  arithmetic only (no exp/log), in a fixed operation order, so the
  identical formula evaluates bit-equal in Spark SQL and DuckDB and
  the registry entry is hash-checkable end to end THROUGH the Arrow
  batch path.
* A real model plugs in as any ``Callable[[pd.DataFrame],
  pd.Series]`` — or via the ``SPARK_GRAFT_SCORER`` env var
  (``module:function``), resolved lazily on the executor so the
  model library is imported per worker, never on the driver.

Scale (100 TB): mapInPandas streams Arrow record batches —
``spark.sql.execution.arrow.maxRecordsPerBatch`` (default 10k)
bounds executor memory regardless of partition size; heavy models
lower it to fit GPU memory. The scorer sees one pandas frame per
batch, the natural unit for ``model.predict``-style vectorized
inference. No shuffle: scoring is map-only, and downstream filters
on the score column push into the same stage.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField

# weights of the default (fallback) quality score — documented so the
# oracle SQL in inventory_extras.py can mirror them literally
W_TOKENS, W_ALPHA, W_BREVITY = 0.5, 0.3, 0.2
TOK_SAT, CHAR_SAT = 200.0, 4000.0


def default_scorer(batch) -> "object":
    """Deterministic quality score in [0, 1]: rewards token mass (to
    saturation), alphabetic density, and brevity. Rational arithmetic
    in fixed order — exactly reproducible in SQL (see the
    ``x_model_score`` oracle)."""
    text = batch["text"].fillna("")
    stripped = text.str.strip()
    n_tokens = stripped.str.split(r"\s+").str.len().where(stripped != "", 0)
    n_chars = text.str.len().astype("float64")
    n_alpha = text.str.lower().str.count("[a-z]").astype("float64")
    tok = n_tokens.astype("float64").clip(upper=TOK_SAT) / TOK_SAT
    alpha = (n_alpha / n_chars).where(n_chars > 0, 0.0)
    brevity = 1.0 - n_chars.clip(upper=CHAR_SAT) / CHAR_SAT
    score = W_TOKENS * tok + W_ALPHA * alpha + W_BREVITY * brevity
    # half-up at 6 dp via multiply-round-divide — the same shape SQL
    # ROUND(x, 6) computes; pandas' own .round is half-to-even and
    # would diverge from both engines on exact ties
    import numpy as np

    return np.floor(score * 1e6 + 0.5) / 1e6


def _resolve_scorer(scorer):
    """Executor-side resolution: explicit callable wins; else the
    ``SPARK_GRAFT_SCORER=module:function`` env hook; else the
    deterministic default."""
    if scorer is not None:
        return scorer
    spec = os.environ.get("SPARK_GRAFT_SCORER")
    if spec:
        import importlib

        mod, _, fn = spec.partition(":")
        return getattr(importlib.import_module(mod), fn)
    return default_scorer


def score_documents(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "model_score",
    scorer: Callable | None = None,
) -> DataFrame:
    """Append ``out_col`` (double) scored by a batch model over Arrow
    record batches. All input columns pass through unchanged, so the
    operator composes anywhere in a pipeline."""
    from pyspark.sql.types import StructType

    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType(), True)]
    )
    if text_col != "text":
        # the scorer contract reads batch["text"]
        def _gen_renamed(batches, _scorer=scorer, _src=text_col):
            fn = _resolve_scorer(_scorer)
            for pdf in batches:
                pdf[out_col] = fn(pdf.rename(columns={_src: "text"}))
                yield pdf

        return df.mapInPandas(_gen_renamed, schema)

    def _gen(batches, _scorer=scorer):
        fn = _resolve_scorer(_scorer)
        for pdf in batches:
            pdf[out_col] = fn(pdf)
            yield pdf

    return df.mapInPandas(_gen, schema)
