"""Bulk DataFrame-native flatteners (operators/nested.py).

Mirrors the semantics the per-request flatteners implement
(flatten.py, parity-cited to pkg/api/flattener.go): struct collapse,
array index columns, sibling-array cross product, __order_* indexes,
empty-array null row, multitable FK linkage.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from scratchdata_spark.operators.nested import (
    flatten_horizontal,
    flatten_multitable,
    flatten_vertical,
)


def _nested_df(spark):
    return spark.createDataFrame(
        [
            Row(id=1, meta=Row(a=1, inner=Row(b="x")), nums=[10, 20], tags=["t1"]),
            Row(id=2, meta=Row(a=2, inner=Row(b="y")), nums=[30], tags=["t2", "t3"]),
            Row(id=3, meta=Row(a=3, inner=Row(b="z")), nums=[], tags=None),
        ]
    )


def test_horizontal_structs_and_arrays(spark):
    out = flatten_horizontal(_nested_df(spark))
    assert set(out.columns) == {
        "id", "meta_a", "meta_inner_b", "nums_0", "nums_1", "tags_0", "tags_1",
    }
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["meta_inner_b"] == "x" and rows[1]["nums_1"] == 20
    assert rows[2]["tags_1"] == "t3"
    # short/empty arrays pad with NULL
    assert rows[2]["nums_1"] is None
    assert rows[3]["nums_0"] is None and rows[3]["tags_0"] is None


def test_vertical_cross_product_and_order(spark):
    out = flatten_vertical(_nested_df(spark))
    assert "__order_nums" in out.columns and "__order_tags" in out.columns
    rows = out.collect()
    # id=2: 1 num x 2 tags = 2 rows (sibling-array cross product)
    id2 = [r for r in rows if r["id"] == 2]
    assert len(id2) == 2
    assert {(r["nums"], r["tags"], r["__order_tags"]) for r in id2} == {
        (30, "t2", 0), (30, "t3", 1),
    }
    # id=3: empty array and null array still yield exactly one row of nulls
    id3 = [r for r in rows if r["id"] == 3]
    assert len(id3) == 1
    assert id3[0]["nums"] is None and id3[0]["__order_nums"] is None


def test_multitable_fk_linkage(spark):
    tabs = flatten_multitable(_nested_df(spark), "events", id_col="id")
    # nested struct 'inner' recurses into its own table
    assert set(tabs) == {"events", "meta", "inner", "nums", "tags"}
    assert set(tabs["events"].columns) == {"id"}
    # struct child: one row per parent, FK carried
    meta = {r["events_id"]: r for r in tabs["meta"].collect()}
    assert meta[2]["a"] == 2
    # inner FKs to the meta ROW's minted snowflake id (not the event id);
    # attribution is checked by joining on it
    linked = (
        tabs["meta"]
        .join(tabs["inner"], tabs["meta"]["id"] == tabs["inner"]["meta_id"])
        .select("events_id", "b")
        .collect()
    )
    assert {(r["events_id"], r["b"]) for r in linked} == {
        (1, "x"), (2, "y"), (3, "z"),
    }
    # scalar-array child: one row per element, named after the column
    nums = tabs["nums"].collect()
    assert {(r["events_id"], r["nums"]) for r in nums} == {(1, 10), (1, 20), (2, 30)}
    tags = tabs["tags"].collect()
    assert {(r["events_id"], r["tags"]) for r in tags} == {
        (1, "t1"), (2, "t2"), (2, "t3"),
    }


def test_multitable_generates_snowflake_ids(spark):
    df = spark.createDataFrame([Row(v=1, arr=[1, 2])])
    tabs = flatten_multitable(df, "t")
    assert "id" in tabs["t"].columns
    child = tabs["arr"].collect()
    assert len(child) == 2 and all(r["t_id"] is not None for r in child)


def test_deep_nesting_recurses(spark):
    df = spark.createDataFrame(
        [Row(id=1, items=[Row(sku="a", opts=["x", "y"]), Row(sku="b", opts=[])])]
    )
    tabs = flatten_multitable(df, "orders", id_col="id")
    assert set(tabs) == {"orders", "items", "opts"}
    items = tabs["items"].collect()
    assert {r["sku"] for r in items} == {"a", "b"}
    opts = tabs["opts"].collect()
    assert {r["opts"] for r in opts} == {"x", "y"}


def test_snowflake_column_unique_past_4096(spark):
    """ADVICE fix: >4096 rows in ONE partition must not wrap into
    duplicate ids (virtual-ms advance on sequence overflow)."""
    from scratchdata_spark.ids import snowflake_column

    n = 10_000
    df = spark.range(n).coalesce(1).withColumn("rid", snowflake_column())
    assert df.select("rid").distinct().count() == n


def test_snowflake_column_unique_across_partitions(spark):
    from scratchdata_spark.ids import snowflake_column

    n = 20_000
    df = spark.range(n).repartition(8).withColumn("rid", snowflake_column())
    assert df.select("rid").distinct().count() == n


def test_deep_nesting_grandchildren_fk_to_their_child_row(spark):
    """Depth-2 FK parity (flattener.go:210-215): each item row mints
    its own id and opts rows FK to it — 'a' owns {x, y}, 'b' owns
    {z}; the parent-FK-reuse bug attributed every opt to both items."""
    df = spark.createDataFrame(
        [Row(id=1, items=[Row(sku="a", opts=["x", "y"]), Row(sku="b", opts=["z"])])]
    )
    tabs = flatten_multitable(df, "orders", id_col="id")
    items, opts = tabs["items"], tabs["opts"]
    assert "id" in items.columns  # minted per item row
    owned = (
        items.join(opts, items["id"] == opts["items_id"])
        .select("sku", "opts")
        .collect()
    )
    assert sorted((r["sku"], r["opts"]) for r in owned) == [
        ("a", "x"), ("a", "y"), ("b", "z"),
    ]
