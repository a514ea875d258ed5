"""Golden tests for the three flatteners (FIXTURES.md §4.1)."""

from __future__ import annotations

from scratchdata_spark.flatten import (
    flatten_horizontal,
    flatten_multitable,
    flatten_vertical,
)

DOC = {
    "name": "John Doe",
    "age": 30,
    "address": {"street": "123 Main St", "city": "Anytown"},
    "hobbies": [
        {"name": "Reading", "type": "Indoor"},
        {
            "name": "Cycling",
            "type": "Outdoor",
            "nested": {"scalar": "bar", "list": [1, 2], "obj": {"hello": "world"}},
        },
    ],
    "numbers": [11, 22, 33],
}


def test_horizontal_golden():
    [out] = flatten_horizontal("t", DOC)
    assert out.table == "t"
    assert out.row == {
        "name": "John Doe",
        "age": 30,
        "address_street": "123 Main St",
        "address_city": "Anytown",
        "hobbies_0_name": "Reading",
        "hobbies_0_type": "Indoor",
        "hobbies_1_name": "Cycling",
        "hobbies_1_type": "Outdoor",
        "hobbies_1_nested_scalar": "bar",
        "hobbies_1_nested_list_0": 1,
        "hobbies_1_nested_list_1": 2,
        "hobbies_1_nested_obj_hello": "world",
        "numbers_0": 11,
        "numbers_1": 22,
        "numbers_2": 33,
    }


def test_horizontal_empty_containers():
    [out] = flatten_horizontal("t", {"a": {}, "b": [], "c": 1})
    assert out.row == {"c": 1}


def test_vertical_cross_product():
    rows = [r.row for r in flatten_vertical("t", DOC)]
    # hobbies expands to 1 + 2 (nested list) = 3 combos; × 3 numbers = 9
    assert len(rows) == 9
    doc_ids = {r["___document_id"] for r in rows}
    assert len(doc_ids) == 1  # shared ULID per input document
    assert {r["__order_numbers"] for r in rows} == {0, 1, 2}
    assert all("__order_hobbies" in r for r in rows)
    # scalar fields replicate onto every row
    assert all(r["name"] == "John Doe" and r["address_city"] == "Anytown" for r in rows)
    reading = [r for r in rows if r.get("hobbies_name") == "Reading"]
    assert len(reading) == 3 and all(r["__order_hobbies"] == 0 for r in reading)
    cycling = [r for r in rows if r.get("hobbies_name") == "Cycling"]
    assert len(cycling) == 6  # 2 list elements × 3 numbers
    assert {r["hobbies_nested_list"] for r in cycling} == {1, 2}
    assert {r["__order_hobbies_nested_list"] for r in cycling} == {0, 1}


def test_vertical_empty_array_yields_null_row():
    rows = [r.row for r in flatten_vertical("t", {"a": [], "b": 1})]
    assert len(rows) == 1
    assert rows[0]["a"] is None and rows[0]["b"] == 1


def test_multitable_golden():
    out = flatten_multitable("t", DOC)
    by_table: dict[str, list[dict]] = {}
    for jd in out:
        by_table.setdefault(jd.table, []).append(jd.row)

    assert sorted(by_table) == ["address", "hobbies", "list", "nested", "numbers", "obj", "t"]
    [parent] = by_table["t"]
    assert parent["name"] == "John Doe" and parent["age"] == 30
    parent_id = parent["id"]
    [addr] = by_table["address"]
    assert addr["t_id"] == parent_id and addr["street"] == "123 Main St"
    hobbies = by_table["hobbies"]
    assert len(hobbies) == 2 and all(h["t_id"] == parent_id for h in hobbies)
    cycling = next(h for h in hobbies if h["name"] == "Cycling")
    [nested] = by_table["nested"]
    assert nested["hobbies_id"] == cycling["id"] and nested["scalar"] == "bar"
    lst = by_table["list"]
    assert sorted(r["list"] for r in lst) == [1, 2]
    assert all(r["nested_id"] == nested["id"] for r in lst)
    nums = by_table["numbers"]
    assert sorted(r["numbers"] for r in nums) == [11, 22, 33]
    assert all(r["t_id"] == parent_id for r in nums)
    # every generated id unique
    ids = [jd.row["id"] for jd in out]
    assert len(set(ids)) == len(ids)
