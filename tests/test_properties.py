"""Property-based invariants (hypothesis) for the pure-Python core:
flatteners and the type-inference precedence merge. These are the
functions every ingested byte passes through — worth adversarial
inputs, not just examples."""

from __future__ import annotations

import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from scratchdata_spark.flatten import (
    flatten_horizontal,
    flatten_multitable,
    flatten_vertical,
)
from scratchdata_spark.jtypes import (
    _PRECEDENCE,
    classify_value,
    infer_types,
    merge_type_counts,
)

# JSON scalar leaves; keys that stay distinct after path joining ('_'
# can alias paths — {"a":{"b":1}} vs {"a_b":2} — a reference-inherited
# ambiguity, so generated keys exclude '_')
_keys = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=6
)
_leaves = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=20),
)
_docs = st.recursive(
    _leaves,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(_keys, children, max_size=4),
    ),
    max_leaves=25,
).filter(lambda v: isinstance(v, dict))


def _leaf_multiset(value, acc):
    if isinstance(value, dict):
        for v in value.values():
            if v == {} or v == []:
                continue  # empty containers contribute nothing
            _leaf_multiset(v, acc)
    elif isinstance(value, list):
        for v in value:
            _leaf_multiset(v, acc)
    else:
        acc.append(value)
    return acc


def _norm(v):
    if isinstance(v, float) and math.isfinite(v) and v == int(v):
        return ("num", int(v))
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("num", v)
    return (type(v).__name__, v)


@settings(max_examples=200, deadline=None)
@given(_docs)
def test_horizontal_flatten_preserves_every_leaf(doc):
    """No leaf value is lost or invented, rows are JSON-serializable,
    and no nested containers survive."""
    rows = flatten_horizontal("t", doc)
    assert len(rows) == 1
    flat = rows[0].row
    json.dumps(flat)  # serializable
    assert not any(isinstance(v, (dict, list)) for v in flat.values())
    want = sorted(map(_norm, _leaf_multiset(doc, [])))
    got = sorted(map(_norm, flat.values()))
    assert got == want


@settings(max_examples=150, deadline=None)
@given(_docs)
def test_vertical_flatten_rows_cover_all_leaves(doc):
    """Every produced row is flat; the union of row values covers the
    document's leaf set (modulo the cross-product duplication and the
    injected ___document_id / __order_* bookkeeping)."""
    rows = flatten_vertical("t", doc)
    assert rows, "at least one row even for scalar-only docs"
    doc_ids = set()
    seen = []
    for r in rows:
        assert not any(isinstance(v, (dict, list)) for v in r.row.values())
        doc_ids.add(r.row["___document_id"])
        for k, v in r.row.items():
            if k == "___document_id" or k.startswith("__order_"):
                continue
            seen.append(v)
    assert len(doc_ids) == 1  # one shared ULID per input doc
    leaves = {(_norm(v)) for v in _leaf_multiset(doc, []) if v is not None}
    covered = {_norm(v) for v in seen if v is not None}
    assert leaves <= covered


@settings(max_examples=150, deadline=None)
@given(_docs)
def test_multitable_rows_are_flat_and_linked(doc):
    """Multitable output: flat rows only; every child table row carries
    a parent FK column."""
    rows = flatten_multitable("root", doc)
    tables = {}
    for r in rows:
        assert not any(isinstance(v, (dict, list)) for v in r.row.values())
        tables.setdefault(r.table, []).append(r.row)
    for name, trows in tables.items():
        if name == "root":
            continue
        assert all(
            any(k.endswith("_id") for k in row) for row in trows
        ), f"child table {name} missing FK"


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.dictionaries(
            _keys,
            st.one_of(
                st.none(), st.booleans(),
                st.integers(min_value=-(10**9), max_value=10**9),
                st.floats(allow_nan=False, allow_infinity=False, width=32),
                st.text(max_size=10),
            ),
            max_size=4,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_infer_types_matches_precedence_semantics(docs):
    """Batch inference must equal the per-value classification folded
    through the documented precedence (string > undefined > float >
    int > bool; all-null → string)."""
    lines = [json.dumps(d) for d in docs]
    got = infer_types(lines)
    counts: dict[str, dict[str, int]] = {}
    for d in docs:
        for k, v in d.items():
            t = classify_value(v)
            counts.setdefault(k, {})
            counts[k][t] = counts[k].get(t, 0) + 1
    want = {k: merge_type_counts(c) for k, c in counts.items()}
    assert got == want
    for t in got.values():
        assert t in ("string", "float", "int", "bool")


def test_precedence_order_is_the_documented_one():
    assert _PRECEDENCE == ("string", "undefined", "float", "int", "bool")


# ----------------------------------------------------- dialect scanner

_lit_body = st.text(
    # printable ASCII minus quote/backslash (those are injected
    # explicitly below via doubling, the escape both dialects share)
    alphabet=st.characters(
        codec="ascii", min_codepoint=32, max_codepoint=126,
        exclude_characters="'\\",
    ),
    max_size=40,
)


@given(_lit_body, _lit_body)
@settings(max_examples=200, deadline=None)
def test_dialect_rewrite_preserves_literals(a, b):
    """Whatever a string literal contains — rewrite trigger tokens
    (``//``, ``EXCLUDE``, ``list_sort(``, brackets), comment markers,
    placeholder bytes — the rewriter must never alter it, while still
    rewriting the code around it."""
    from scratchdata_spark.dialect import rewrite

    inner = (a + "'' // EXCLUDE ( [1] list_sort( /* -- " + b).replace(
        "'", "''"
    )
    sql = f"SELECT '{inner}' AS c, 4//2 FROM t"
    out = rewrite(sql)
    assert out == f"SELECT '{inner}' AS c, 4 DIV 2 FROM t"
