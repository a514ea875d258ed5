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
