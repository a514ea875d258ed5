"""Skew-handling join: salting for hot keys that AQE can't fully fix.

A shuffle join partitions by key hash, so one hot key (a celebrity
user, an empty-string default, a null-ish sentinel) lands its entire
row set on ONE task — the straggler that dominates job wall-clock at
scale. AQE's skew-join splits oversized *partitions* of a sort-merge
join, but a single key still can't split across tasks without
changing the join key itself. Salting changes the key:

* fact side: append a deterministic salt in [0, n) derived from the
  row (hash of all columns), widening each hot key across n tasks;
* dim side: replicate each row n times, once per salt value
  (explode of a sequence — n× the SMALL side only);
* join on (key, salt) — an equi-join Catalyst treats normally.

Deterministic salt (xxhash64 of the row, not rand()) keeps reruns
and retried tasks stable — a retried task must produce the same
salt or shuffle files disagree.

Use when: the dim is too big to broadcast AND fact keys are skewed.
If the dim broadcasts, broadcast (no shuffle at all); if keys are
uniform, a plain shuffle join is strictly cheaper than n× dim
replication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join with the fact side's keys salted across ``n_salts``
    sub-keys and the dim side replicated to match. Result equals
    ``fact.join(dim, on, how)`` for inner/left joins (each fact row
    meets each dim row exactly once — at its own salt value).
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salted_fact = fact.withColumn(
        SALT, F.pmod(F.xxhash64(*fact.columns), F.lit(n_salts)).cast("int")
    )
    replicated_dim = dim.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_fact.join(replicated_dim, keys + [SALT], how).drop(SALT)


_HOT_SEP = "\x1f"


def salted_join_hot(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    hot: list[tuple] | list[str],
    how: str = "left",
    n_salts: int = 8,
) -> DataFrame:
    """:func:`salted_join`, but only the LISTED hot keys are salted
    and only the matching dim rows replicated — the shape for a
    Zipf-skewed probe against a large dim where the hot head is
    driver-known (e.g. LM count tables: the hottest unigrams/bigrams
    are exactly the top-count rows of the fitted model).

    Cold keys keep salt 0 on both sides (no replication), so the dim
    shuffle grows by only ``n_salts × |hot|`` rows instead of
    ``n_salts × |dim|``.  Membership is tested on the
    ``\\x1f``-joined key string (an ``isin`` → InSet, a hash-set
    probe, not a codegen-exploding literal chain); hot values are
    rendered with Python ``str()``, which matches Spark's string cast
    for string and integer keys — for other types (bool, float,
    date) a render mismatch only means that key is NOT salted, never
    a wrong join result, because classification is symmetric across
    fact and dim.  A cold key that collides INTO the hot set is
    likewise merely salted.  Same inner/left contract as
    :func:`salted_join`; NULL key components never match in either
    form.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join_hot supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    hot_strs = [
        _HOT_SEP.join(str(x) for x in t) if isinstance(t, tuple) else str(t)
        for t in hot
    ]
    if not hot_strs:
        return fact.join(dim, keys, how)

    def key_str():
        return F.concat_ws(_HOT_SEP, *[F.col(k) for k in keys])

    salted_fact = fact.withColumn(
        SALT,
        F.when(
            key_str().isin(hot_strs),
            F.pmod(F.xxhash64(*fact.columns), F.lit(n_salts)),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
    replicated_dim = dim.withColumn(
        SALT,
        F.explode(
            F.when(
                key_str().isin(hot_strs),
                F.sequence(F.lit(0), F.lit(n_salts - 1)),
            ).otherwise(F.array(F.lit(0)))
        ),
    ).withColumn(SALT, F.col(SALT).cast("int"))
    return salted_fact.join(replicated_dim, keys + [SALT], how).drop(SALT)
