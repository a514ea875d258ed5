"""Type inference + precedence merge golden tests (FIXTURES.md §4.2)."""

from __future__ import annotations

from scratchdata_spark.jtypes import infer_types, merge_schemas, to_struct

NDJSON = [
    '{"a": 1, "b": 1,   "c": true,  "d": null, "e": "x"}',
    '{"a": 2.5, "b": 2, "c": false, "d": null, "e": 7}',
    '{"a": "x", "b": 3, "c": 1,     "d": null}',
]


def test_precedence_golden():
    types = infer_types(NDJSON)
    assert types == {"a": "string", "b": "int", "c": "int", "d": "string", "e": "string"}


def test_float_vs_int_token():
    assert infer_types(['{"x": 1.0}']) == {"x": "float"}
    assert infer_types(['{"x": 1}']) == {"x": "int"}
    assert infer_types(['{"x": 1e2}']) == {"x": "float"}


def test_all_null_is_string():
    assert infer_types(['{"x": null}', '{"x": null}']) == {"x": "string"}


def test_bool_only():
    assert infer_types(['{"x": true}', '{"x": false}']) == {"x": "bool"}


def test_missing_key_still_typed():
    types = infer_types(['{"x": 1}', '{"y": 2}'])
    assert types == {"x": "int", "y": "int"}


def test_merge_schemas_additive_no_retype():
    existing = to_struct({"a": "int", "b": "string"})
    batch = to_struct({"a": "string", "c": "float"})
    merged = merge_schemas(existing, batch)
    assert [(f.name, f.dataType.simpleString()) for f in merged.fields] == [
        ("a", "bigint"),  # existing type kept
        ("b", "string"),
        ("c", "double"),
    ]
