"""Warehouse DML/DDL statements over the parquet catalog.

The reference forwards EVERY statement to its backend verbatim
(``pkg/destinations/duckdb/query.go``, trim at ``pkg/util/sql.go``),
so a reference user's saved scripts contain ``CREATE TABLE AS`` /
``INSERT INTO … SELECT`` / ``DELETE`` / ``UPDATE`` / ``DROP`` /
``TRUNCATE`` alongside their reads. Handing those to ``spark.sql``
is silently wrong here: Spark would route CREATE/DROP at its own
session catalog — invisible to this engine's schema registry,
``/api/tables``, and every other session — and DELETE/UPDATE fail
outright on parquet-backed views. These statements are therefore
intercepted BEFORE the passthrough and executed against the
TableCatalog.

Execution model (designed for 100 TB):

* CTAS / INSERT-SELECT: the source SELECT runs through ``query_df``
  (dialect fallback included), and the write is a distributed
  parquet append with snowflake ``__row_id`` assignment
  (ids.snowflake_column — JVM-side, no driver materialization).
* DELETE / UPDATE / TRUNCATE: copy-on-write into the next
  generation directory plus an atomic pointer flip — the same
  snapshot mechanism as compaction (engine.compact_table), holding
  the same per-table compaction lock so rewrites serialize; readers
  in flight finish on their pinned listing, inserts that land
  mid-rewrite are renamed into the new generation untouched (they
  are not part of the statement's snapshot). v1 rewrites the whole
  table like compaction does; file-level pruning (skip files whose
  min/max can't match the predicate, rename instead of rewrite —
  what Delta/Iceberg CoW does) is the marked optimization path.
* The API validates before it streams (api_server._run_query), so
  validation must NOT execute: ``validate_statement`` checks the
  statement shape, target-table rules, and the embedded SELECT's
  plan, with zero side effects; the single execution happens when
  the serializer calls ``query_df``.

DuckDB DML result parity: every statement returns a one-row
``count BIGINT`` DataFrame (rows written / deleted / updated;
0 for pure DDL), which serializes through the normal JSON/CSV path.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from scratchdata_spark.catalog import ROW_ID

_IDENT = r"[A-Za-z_]\w*"

_CTAS_RE = re.compile(
    rf"^\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+(IF\s+NOT\s+EXISTS\s+)?"
    rf"({_IDENT})\s+AS\s+(.+?)\s*;?\s*$",
    re.I | re.S,
)
_CREATE_DEF_RE = re.compile(
    rf"^\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?({_IDENT})\s*\((.+)\)\s*;?\s*$",
    re.I | re.S,
)
_INSERT_RE = re.compile(
    rf"^\s*INSERT\s+INTO\s+({_IDENT})\s*(?:\(\s*([^)]*?)\s*\))?\s*"
    rf"((?:SELECT|VALUES|WITH|FROM)\b.+?)\s*;?\s*$",
    re.I | re.S,
)
_DROP_RE = re.compile(
    rf"^\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?({_IDENT})\s*;?\s*$", re.I | re.S
)
_TRUNCATE_RE = re.compile(
    rf"^\s*TRUNCATE\s+(?:TABLE\s+)?({_IDENT})\s*;?\s*$", re.I | re.S
)
_DELETE_RE = re.compile(
    rf"^\s*DELETE\s+FROM\s+({_IDENT})(?:\s+WHERE\s+(.+?))?\s*;?\s*$",
    re.I | re.S,
)
_UPDATE_RE = re.compile(
    rf"^\s*UPDATE\s+({_IDENT})\s+SET\s+(.+?)\s*;?\s*$", re.I | re.S
)


def statement_kind(query: str) -> str | None:
    """Which warehouse statement this text is, or None (normal query
    → passthrough). Order matters: CTAS before column-def CREATE."""
    for kind, rx in (
        ("ctas", _CTAS_RE),
        ("create", _CREATE_DEF_RE),
        ("insert", _INSERT_RE),
        ("drop", _DROP_RE),
        ("truncate", _TRUNCATE_RE),
        ("delete", _DELETE_RE),
        ("update", _UPDATE_RE),
    ):
        if rx.match(query):
            return kind
    return None


def _count_df(dest, n: int):
    return dest.spark.createDataFrame(
        [(int(n),)], StructType([StructField("count", LongType(), False)])
    )


def _expr(dest, df, text: str):
    """Column from an expression fragment, analyzed EAGERLY against
    ``df`` (F.expr alone defers parsing to plan time, which would
    skip the fallback); DuckDB-dialect tokens fall back through the
    same rewriter the full-query path uses."""
    try:
        col = F.expr(text)
        df.select(col).schema  # force parse + analysis now
        return col
    except Exception:
        from scratchdata_spark.dialect import rewrite

        col = F.expr(rewrite(f"SELECT {text}")[len("SELECT ") :])
        df.select(col).schema
        return col


def _source_df(dest, select_text: str):
    """DataFrame for the statement's embedded SELECT/VALUES — through
    query_df, so the dialect fallback and plan cache apply."""
    body = select_text.strip()
    if re.match(r"(?is)^VALUES\b", body):
        body = f"SELECT * FROM {body}"
    return dest.query_df(body)


def _split_where(dest, set_clause: str) -> tuple[str, str | None]:
    """UPDATE's SET…WHERE split at the last depth-0 WHERE (a WHERE
    inside a scalar-subquery assignment stays with its expression).
    Splitting on MASKED text keeps literal contents out of the
    keyword scan; each side unmasks independently since the cut is a
    keyword boundary, never inside a placeholder."""
    from scratchdata_spark.dialect import (
        _d0_matches,
        _mask_literals,
        _unmask_literals,
    )

    masked, lits = _mask_literals(set_clause)
    hits = list(_d0_matches(masked, r"\bWHERE\b"))
    if not hits:
        return set_clause, None
    cut = hits[-1]
    return (
        _unmask_literals(masked[: cut.start()], lits),
        _unmask_literals(masked[cut.end() :], lits),
    )


# ------------------------------------------------------------ execute


def execute(dest, query: str):
    """Run a warehouse statement; returns the count DataFrame.
    Callers route here from query_df AFTER statement_kind matched."""
    kind = statement_kind(query)
    if kind == "ctas":
        return _exec_ctas(dest, query)
    if kind == "create":
        return _exec_create(dest, query)
    if kind == "insert":
        return _exec_insert(dest, query)
    if kind == "drop":
        return _exec_drop(dest, query)
    if kind == "truncate":
        return _exec_truncate(dest, query)
    if kind == "delete":
        return _exec_delete(dest, query)
    if kind == "update":
        return _exec_update(dest, query)
    raise ValueError(f"not a warehouse statement: {query!r}")


def validate(dest, query: str) -> None:
    """Zero-side-effect validation: statement shape, target rules, and
    the embedded SELECT's analysis. The API calls this before it
    commits to a 200; execution happens exactly once, later."""
    kind = statement_kind(query)
    if kind == "ctas":
        m = _CTAS_RE.match(query)
        _check_ident(dest, m.group(3))
        if (
            dest.catalog.get(dest.database, m.group(3)) is not None
            and not m.group(1)
            and not m.group(2)
        ):
            raise ValueError(f"table exists: {m.group(3)}")
        _source_df(dest, m.group(4))  # analyze only
    elif kind == "create":
        m = _CREATE_DEF_RE.match(query)
        _check_ident(dest, m.group(2))
        StructType.fromDDL(m.group(3))  # loud on bad column defs
    elif kind == "insert":
        m = _INSERT_RE.match(query)
        info = _require_table(dest, m.group(1))
        src = _source_df(dest, m.group(3))
        _insert_projection(info, src, m.group(2))  # arity/name checks
    elif kind == "drop":
        m = _DROP_RE.match(query)
        if not m.group(1):
            _require_table(dest, m.group(2))
    elif kind == "truncate":
        _require_table(dest, _TRUNCATE_RE.match(query).group(1))
    elif kind == "delete":
        m = _DELETE_RE.match(query)
        info = _require_table(dest, m.group(1))
        if m.group(2):
            _analyze_pred(dest, m.group(1), m.group(2))
    elif kind == "update":
        m = _UPDATE_RE.match(query)
        info = _require_table(dest, m.group(1))
        set_clause, pred = _split_where(dest, m.group(2))
        _update_assignments(info, set_clause)
        if pred:
            _analyze_pred(dest, m.group(1), pred)
    else:
        raise ValueError(f"not a warehouse statement: {query!r}")


def _check_ident(dest, name: str) -> str:
    if not re.fullmatch(_IDENT, name):
        raise ValueError(f"invalid table name: {name!r}")
    return name


def _require_table(dest, table: str):
    info = dest.catalog.get(dest.database, table)
    if info is None:
        raise KeyError(f"no such table: {table}")
    return info


def _analyze_pred(dest, table: str, pred: str) -> None:
    _expr(dest, dest.table_df(table), pred)  # analysis only


# ------------------------------------------------------ CREATE / CTAS


def _jsontype_of(dt) -> str | None:
    # integral/float widths widen to the ingest jsontypes (bigint /
    # double) — the written data is cast to match, see _exec_ctas
    return {
        "tinyint": "int",
        "smallint": "int",
        "int": "int",
        "bigint": "int",
        "float": "float",
        "double": "float",
        "string": "string",
        "boolean": "bool",
    }.get(dt.simpleString())


def _register_schema(dest, table: str, fields) -> None:
    """Register result columns ONE AT A TIME, in declaration order —
    a jsontype where one fits, a full Spark DDL string (catalog
    'sparktype' entry) for everything else (timestamps, arrays,
    decimals…). Order matters: positional INSERT maps onto the
    catalog's ALTER order."""
    for f in fields:
        if f.name == ROW_ID:
            continue
        jt = _jsontype_of(f.dataType)
        if jt is not None:
            dest.catalog.add_columns(dest.database, table, {f.name: jt})
        else:
            dest.catalog.add_spark_columns(
                dest.database, table, {f.name: f.dataType.simpleString()}
            )


def _exec_ctas(dest, query: str):
    m = _CTAS_RE.match(query)
    or_replace, if_not_exists, table, select_text = m.groups()
    _check_ident(dest, table)
    existing = dest.catalog.get(dest.database, table)
    if existing is not None:
        if if_not_exists:
            return _count_df(dest, 0)
        if not or_replace:
            raise ValueError(f"table exists: {table}")
        _exec_drop_table(dest, table)
    src = _source_df(dest, select_text)
    with dest.catalog.lock(dest.database, table):
        dest.catalog.create_empty_table(dest.database, table)
        _register_schema(dest, table, src.schema.fields)
        info = dest.catalog.get(dest.database, table)
        out = _with_row_id(src)
        # cast to the REGISTERED types (widened ints/floats): the
        # parquet files must match the catalog schema readers pass
        out = out.select(
            *[
                F.col(f"`{f.name}`").cast(f.dataType).alias(f.name)
                for f in info.struct().fields
            ]
        )
        out = out.persist()
        n = out.count()
        out.write.mode("append").parquet(
            dest.catalog.data_dir(dest.database, table)
        )
        out.unpersist()
    dest.plan_cache.invalidate()
    return _count_df(dest, n)


def _exec_create(dest, query: str):
    m = _CREATE_DEF_RE.match(query)
    if_not_exists, table, defs = m.groups()
    _check_ident(dest, table)
    if dest.catalog.get(dest.database, table) is not None:
        if if_not_exists:
            return _count_df(dest, 0)
        raise ValueError(f"table exists: {table}")
    struct = StructType.fromDDL(defs)
    with dest.catalog.lock(dest.database, table):
        dest.catalog.create_empty_table(dest.database, table)
        _register_schema(dest, table, struct.fields)
    dest.plan_cache.invalidate()
    return _count_df(dest, 0)


def _with_row_id(df):
    from scratchdata_spark.ids import snowflake_column

    if ROW_ID in df.columns:
        return df.withColumn(
            ROW_ID, F.coalesce(F.col(ROW_ID), snowflake_column())
        )
    return df.withColumn(ROW_ID, snowflake_column())


# -------------------------------------------------------------- INSERT


def _insert_projection(info, src, col_list: str | None):
    """Positional mapping (SQL/DuckDB semantics) of the source onto
    the target columns — the explicit column list when given, else
    every registered column except __row_id, in ALTER order. Unlisted
    columns fill with NULL; arity must match exactly."""
    target_fields = {f.name: f for f in info.struct().fields}
    if col_list and col_list.strip():
        names = [c.strip() for c in col_list.split(",")]
        for n in names:
            if n not in target_fields:
                raise ValueError(f"unknown column: {n}")
    else:
        names = [f.name for f in info.struct().fields if f.name != ROW_ID]
    src_cols = [c for c in src.columns]
    if len(src_cols) != len(names):
        raise ValueError(
            f"INSERT arity mismatch: {len(src_cols)} source columns for"
            f" {len(names)} target columns ({', '.join(names)})"
        )
    cols = []
    for f in info.struct().fields:
        if f.name in names:
            s = src_cols[names.index(f.name)]
            cols.append(F.col(f"`{s}`").cast(f.dataType).alias(f.name))
        elif f.name == ROW_ID:
            continue  # assigned after projection
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return cols


def _exec_insert(dest, query: str):
    m = _INSERT_RE.match(query)
    table, col_list, select_text = m.groups()
    info = _require_table(dest, table)
    src = _source_df(dest, select_text)
    cols = _insert_projection(info, src, col_list)
    out = _with_row_id(src.select(*cols))
    out = out.select(*[f.name for f in info.struct().fields])
    with dest.catalog.lock(dest.database, table):
        out = out.persist()
        n = out.count()
        writer = out.write.mode("append")
        if info.partition_col:
            writer = writer.partitionBy(info.partition_col)
        writer.parquet(dest.catalog.data_dir(dest.database, table))
        out.unpersist()
    dest.plan_cache.invalidate()
    return _count_df(dest, n)


# ------------------------------------------------- DROP / copy-on-write


def _exec_drop_table(dest, table: str) -> None:
    dest.catalog.drop_table(dest.database, table)
    # a stale temp view would keep resolving the deleted listing
    try:
        dest.spark.catalog.dropTempView(table)
    except Exception:
        pass
    dest.plan_cache.invalidate()


def _exec_drop(dest, query: str):
    m = _DROP_RE.match(query)
    if_exists, table = m.groups()
    if dest.catalog.get(dest.database, table) is None:
        if if_exists:
            return _count_df(dest, 0)
        raise KeyError(f"no such table: {table}")
    _exec_drop_table(dest, table)
    return _count_df(dest, 0)


def _cow_rewrite(dest, table: str, info, transform) -> None:
    """Copy-on-write generation flip — the compaction mechanism
    (engine._compact_locked) applied to a row transform: snapshot the
    current listing, rewrite it through ``transform`` into g{N+1},
    then under the table lock re-check the generation, rename
    late-arriving insert files over untouched, flip the pointer, and
    retire the grandparent generation."""
    comp_lock = dest._compaction_lock(table)
    with comp_lock:
        cur_dir = dest.catalog.data_dir(dest.database, table)
        snapshot = (
            dest._list_parquet(cur_dir) if os.path.isdir(cur_dir) else []
        )
        root = dest.catalog.table_root(dest.database, table)
        new_gen = info.generation + 1
        new_dir = os.path.join(root, f"g{new_gen}")
        if snapshot:
            src = (
                dest.spark.read.schema(info.struct())
                .option("basePath", cur_dir)
                .parquet(*[os.path.join(cur_dir, f) for f in snapshot])
            )
        else:
            src = dest.spark.createDataFrame([], info.struct())
        out = transform(src)
        writer = out.write.mode("overwrite")
        if info.partition_col:
            writer = writer.partitionBy(info.partition_col)
        writer.parquet(new_dir)
        with dest.catalog.lock(dest.database, table):
            now = dest.catalog.get(dest.database, table)
            if now is None or now.generation != info.generation:
                shutil.rmtree(new_dir, ignore_errors=True)
                raise RuntimeError(
                    f"table {table} changed during the rewrite; retry"
                )
            late = [
                f
                for f in (
                    dest._list_parquet(cur_dir)
                    if os.path.isdir(cur_dir)
                    else []
                )
                if f not in set(snapshot)
            ]
            for f in late:
                dst = os.path.join(
                    new_dir, os.path.dirname(f), "late-" + os.path.basename(f)
                )
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.replace(os.path.join(cur_dir, f), dst)
            dest.catalog.set_generation(dest.database, table, new_gen)
            dest.plan_cache.invalidate()
        # retire the grandparent; the parent stays for in-flight readers
        retire = new_gen - 2
        if retire == 0:
            for f in os.listdir(root):
                p = os.path.join(root, f)
                if f.endswith(".parquet") or f == "_SUCCESS":
                    os.remove(p)
                elif "=" in f and os.path.isdir(p):
                    shutil.rmtree(p, ignore_errors=True)
        elif retire > 0:
            shutil.rmtree(os.path.join(root, f"g{retire}"), ignore_errors=True)


def _exec_truncate(dest, query: str):
    table = _TRUNCATE_RE.match(query).group(1)
    info = _require_table(dest, table)
    _cow_rewrite(dest, table, info, lambda src: src.limit(0))
    return _count_df(dest, 0)


def _exec_delete(dest, query: str):
    m = _DELETE_RE.match(query)
    table, pred = m.groups()
    info = _require_table(dest, table)
    if pred is None:
        # DELETE without WHERE: count, then truncate via the same CoW
        n = dest.table_df(table).count()
        _cow_rewrite(dest, table, info, lambda src: src.limit(0))
        return _count_df(dest, n)
    cond = F.coalesce(_expr(dest, dest.table_df(table), pred), F.lit(False))
    deleted = {"n": 0}

    def transform(src):
        kept = src.filter(~cond)
        deleted["n"] = src.filter(cond).count()
        return kept

    _cow_rewrite(dest, table, info, transform)
    return _count_df(dest, deleted["n"])


# -------------------------------------------------------------- UPDATE


_ASSIGN_RE = re.compile(rf"^\s*({_IDENT})\s*=\s*(.+)\s*$", re.S)


def _update_assignments(info, set_clause: str) -> dict[str, str]:
    from scratchdata_spark.dialect import _split_top_level_commas_text

    fields = {f.name: f for f in info.struct().fields}
    out: dict[str, str] = {}
    for item in _split_top_level_commas_text(set_clause):
        am = _ASSIGN_RE.match(item)
        if am is None:
            raise ValueError(f"bad SET assignment: {item!r}")
        col, expr_text = am.group(1), am.group(2)
        if col not in fields or col == ROW_ID:
            raise ValueError(f"unknown column: {col}")
        out[col] = expr_text
    return out


def _exec_update(dest, query: str):
    m = _UPDATE_RE.match(query)
    table, rest = m.groups()
    info = _require_table(dest, table)
    set_clause, pred = _split_where(dest, rest)
    assigns = _update_assignments(info, set_clause)
    tdf = dest.table_df(table)
    cond = (
        F.coalesce(_expr(dest, tdf, pred), F.lit(False))
        if pred
        else F.lit(True)
    )
    fields = {f.name: f for f in info.struct().fields}
    updated = {"n": 0}

    def transform(src):
        updated["n"] = src.filter(cond).count()
        cols = []
        for f in info.struct().fields:
            if f.name in assigns:
                cols.append(
                    F.when(
                        cond,
                        _expr(dest, tdf, assigns[f.name]).cast(
                            fields[f.name].dataType
                        ),
                    )
                    .otherwise(F.col(f.name))
                    .alias(f.name)
                )
            else:
                cols.append(F.col(f.name))
        return src.select(*cols)

    _cow_rewrite(dest, table, info, transform)
    return _count_df(dest, updated["n"])
