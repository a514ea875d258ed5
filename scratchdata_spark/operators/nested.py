"""Bulk DataFrame-native flatteners for nested data already in tables.

The per-request JSON flatteners (ingest path, plain Python over small
documents) live in :mod:`scratchdata_spark.flatten`. These are their
distributed equivalents for data that is *already* a nested DataFrame
(struct / array columns), re-expressed as pure column operations so
Catalyst plans them and they scale on-cluster:

* horizontal — parity with ``pkg/api/flattener.go:145-158``: struct
  fields become ``parent_child`` columns; array columns become indexed
  ``col_0 .. col_{n-1}`` columns where n is the max observed length
  (one aggregate scan per nesting level — the only job this triggers).
* vertical — parity with ``pkg/api/flattener.go:24-143``: array
  columns explode into rows via ``posexplode_outer``; sibling arrays
  cross-product by sequential explodes (``crossProduct``,
  flattener.go:34-45); each exploded column carries an
  ``__order_<path>`` index; an empty/null array yields one row with a
  null value and null order (flattener.go:83-90).
* multitable — parity with ``pkg/api/flattener.go:160-230``: nested
  object/array columns split into child DataFrames named by the
  column, linked by ``<parent>_id`` foreign keys. Deterministic (and
  oracle-checkable) when the caller supplies ``id_col``; otherwise a
  snowflake id is generated like the reference.

Scale notes: none of these shuffle — explodes and struct projections
are narrow; the only extra job is horizontal's max-array-length agg,
which reads just the array columns (column-pruned scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

from scratchdata_spark.ids import snowflake_column

SEP = "_"
ORDER_PREFIX = "__order_"


def _struct_cols(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if isinstance(f.dataType, StructType)]


def _array_cols(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if isinstance(f.dataType, ArrayType)]


def _expand_structs(df: DataFrame) -> DataFrame:
    """One pass: each struct column becomes ``parent_field`` columns."""
    while True:
        structs = set(_struct_cols(df))
        if not structs:
            return df
        cols = []
        for f in df.schema.fields:
            if f.name in structs:
                for sub in f.dataType.names:  # type: ignore[union-attr]
                    cols.append(F.col(f.name)[sub].alias(f"{f.name}{SEP}{sub}"))
            else:
                cols.append(F.col(f.name))
        df = df.select(*cols)


def flatten_horizontal(df: DataFrame, max_array_len: int | None = None) -> DataFrame:
    """Collapse all nesting into one wide row per input row.

    ``max_array_len`` caps the indexed columns per array (safety valve
    for ragged data); by default the max observed length is used,
    computed in a single agg job over the array columns only.
    """
    while True:
        df = _expand_structs(df)
        arrays = _array_cols(df)
        if not arrays:
            return df
        if max_array_len is not None:
            lens = {c: max_array_len for c in arrays}
        else:
            row = df.agg(
                *[F.max(F.size(F.col(c))).alias(c) for c in arrays]
            ).collect()[0]
            lens = {c: max(row[c] or 0, 0) for c in arrays}
        cols = []
        for f in df.schema.fields:
            if f.name in lens:
                for i in range(lens[f.name]):
                    # try_element_at: 1-based, out-of-range yields NULL
                    # (ANSI-safe), matching "missing keys are NULL"
                    # ingest semantics
                    cols.append(
                        F.try_element_at(F.col(f.name), F.lit(i + 1)).alias(
                            f"{f.name}{SEP}{i}"
                        )
                    )
            else:
                cols.append(F.col(f.name))
        df = df.select(*cols)


def flatten_vertical(df: DataFrame, order_prefix: str = ORDER_PREFIX) -> DataFrame:
    """Explode arrays into rows; sibling arrays cross-product.

    Each exploded array column keeps its name for the element value and
    gains ``__order_<name>`` with the element's index. Sequential
    ``posexplode_outer`` calls reproduce the reference's sibling-array
    cross product exactly, and its empty-array → one-null-row rule.
    """
    while True:
        df = _expand_structs(df)
        arrays = _array_cols(df)
        if not arrays:
            return df
        c = arrays[0]
        others = [F.col(n) for n in df.columns if n != c]
        df = df.select(
            *others, F.posexplode_outer(F.col(c)).alias(f"{order_prefix}{c}", c)
        )


def flatten_multitable(
    df: DataFrame, table: str, id_col: str | None = None
) -> dict[str, DataFrame]:
    """Normalize nested columns into parent/child tables.

    Returns ``{table: parent_df, <nested-col>: child_df, ...}``. Child
    rows carry ``<parent-table>_id``. With ``id_col`` the caller's
    unique key is the FK (deterministic); without, a snowflake ``id``
    column is synthesized per parent row as in the reference
    (pkg/api/flattener.go:173-179 — note reference ids are
    time-derived and thus nondeterministic too).
    """
    if id_col is None:
        df = df.withColumn("id", snowflake_column())
        id_col = "id"
    fk = f"{table}_id"
    out: dict[str, DataFrame] = {}
    scalar_cols = [
        f.name
        for f in df.schema.fields
        if not isinstance(f.dataType, (ArrayType, StructType))
    ]
    out[table] = df.select(*scalar_cols)
    for f in df.schema.fields:
        if isinstance(f.dataType, StructType):
            child = df.select(F.col(id_col).alias(fk), F.col(f"{f.name}.*"))
            out.update(_descend(child, f.name, fk))
        elif isinstance(f.dataType, ArrayType):
            # plain explode: an empty/null array contributes no child
            # rows (a child table has no "null member" concept)
            exploded = df.select(
                F.col(id_col).alias(fk), F.explode(F.col(f.name)).alias(f.name)
            )
            if isinstance(f.dataType.elementType, StructType):
                child = exploded.select(F.col(fk), F.col(f"{f.name}.*"))
            else:
                child = exploded
            out.update(_descend(child, f.name, fk))
    return out


def _descend(child: DataFrame, name: str, fk: str) -> dict[str, DataFrame]:
    """Recurse into a child table that may itself hold nested columns.

    A child that nests further gets its OWN per-row snowflake ``id``
    (id_col=None path), so grandchildren FK to the child row that
    actually contains them — matching the reference
    (pkg/api/flattener.go:210-215) and the per-request flattener
    (flatten.py walk(): fresh id at every level). Reusing the parent's
    FK here would stamp every grandchild with the GRANDPARENT's id,
    making sibling child rows' grandchildren indistinguishable.
    """
    if not _struct_cols(child) and not _array_cols(child):
        return {name: child}
    return flatten_multitable(child, name, id_col=None)
