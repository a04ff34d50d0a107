"""Property-based tests: random filter expressions, Spark compilation
vs an independent Python evaluator of the reference semantics
(missing key never matches; NOT missing matches; type-strict ranges;
wildcard ``?`` = zero-or-one; list fields match on membership).

The evaluator is written directly from the documented semantics —
not from the compiler — so a shared bug can't cancel out.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from logprep_spark.filters import compile_filter

SCHEMA = (
    "id long, s string, n long, f double, arr array<string>, nested struct<c: string>"
)

ROWS = [
    {"id": 0, "s": "alpha", "n": 0, "f": 0.5, "arr": ["a", "b"], "nested": {"c": "x"}},
    {"id": 1, "s": "beta", "n": 1, "f": 1.5, "arr": ["b"], "nested": {"c": "y"}},
    {"id": 2, "s": "alpine", "n": 5, "f": None, "arr": [], "nested": {"c": None}},
    {"id": 3, "s": None, "n": None, "f": 2.5, "arr": None, "nested": {"c": "x"}},
    {"id": 4, "s": "gamma", "n": 7, "f": 0.1, "arr": ["a"], "nested": None},
]


# --- independent evaluator --------------------------------------------


def _get(event: dict, key: str):
    cur = event
    for part in key.split("."):
        if not isinstance(cur, dict) or cur.get(part) is None:
            return None
        cur = cur[part]
    return cur


def _wc_regex(pat: str) -> str:
    out = []
    for ch in pat:
        out.append(".*" if ch == "*" else ".?" if ch == "?" else re.escape(ch))
    return "^" + "".join(out) + "$"


def _ev_leaf(kind, key, arg, event) -> bool:
    v = _get(event, key)
    if kind == "exists":
        return v is not None
    if kind == "null":
        return v is None
    if v is None:
        return False
    if kind == "str_eq":
        if isinstance(v, list):
            return arg in v
        return str(v) == arg
    if kind == "num_eq":
        return isinstance(v, (int, float)) and not isinstance(v, bool) and v == arg
    if kind == "wildcard":
        vals = v if isinstance(v, list) else [v]
        return any(re.match(_wc_regex(arg), str(x)) is not None for x in vals)
    if kind == "regex":
        vals = v if isinstance(v, list) else [v]
        return any(re.match(f"^(?:{arg})$", str(x)) is not None for x in vals)
    if kind == "int_range":
        lo, hi, inc_lo, inc_hi = arg
        if not isinstance(v, int) or isinstance(v, bool):
            return False
        return (v >= lo if inc_lo else v > lo) and (v <= hi if inc_hi else v < hi)
    if kind == "float_range":
        lo, hi, inc_lo, inc_hi = arg
        if not isinstance(v, float):
            return False
        return (v >= lo if inc_lo else v > lo) and (v <= hi if inc_hi else v < hi)
    raise AssertionError(kind)


def _ev(node, event) -> bool:
    op = node[0]
    if op == "leaf":
        return _ev_leaf(node[1], node[2], node[3], event)
    if op == "not":
        return not _ev(node[1], event)
    if op == "and":
        return _ev(node[1], event) and _ev(node[2], event)
    if op == "or":
        return _ev(node[1], event) or _ev(node[2], event)
    raise AssertionError(op)


def _render(node) -> str:
    op = node[0]
    if op == "leaf":
        kind, key, arg = node[1], node[2], node[3]
        if kind == "exists":
            return f"{key}: *"
        if kind == "null":
            return f"{key}: null"
        if kind in ("str_eq", "wildcard"):
            return f"{key}: {arg}"
        if kind == "num_eq":
            return f"{key}: {arg}"
        if kind == "regex":
            return f"{key}: /{arg}/"
        if kind in ("int_range", "float_range"):
            lo, hi, inc_lo, inc_hi = arg
            return f"{key}: {'[' if inc_lo else '{'}{lo} TO {hi}{']' if inc_hi else '}'}"
    if op == "not":
        return f"NOT ({_render(node[1])})"
    if op == "and":
        return f"({_render(node[1])} AND {_render(node[2])})"
    if op == "or":
        return f"({_render(node[1])} OR {_render(node[2])})"
    raise AssertionError(op)


# --- strategies --------------------------------------------------------

_STR_KEYS = ["s", "nested.c", "missing.key"]
_WORDS = ["alpha", "beta", "alpine", "gamma", "x", "y", "zeta"]

_leaves = st.one_of(
    st.tuples(
        st.just("leaf"), st.just("str_eq"), st.sampled_from(_STR_KEYS + ["arr"]),
        st.sampled_from(_WORDS + ["a", "b"]),
    ),
    st.tuples(
        st.just("leaf"), st.just("wildcard"), st.sampled_from(_STR_KEYS),
        st.sampled_from(["al*", "*a", "alph?", "?eta", "*", "g?mma*"]),
    ),
    st.tuples(
        st.just("leaf"), st.just("regex"), st.sampled_from(_STR_KEYS),
        st.sampled_from(["al.*", ".*a", "(alpha|beta)", "[a-m]+"]),
    ),
    st.tuples(
        st.just("leaf"), st.just("num_eq"), st.sampled_from(["n", "f", "s"]),
        st.sampled_from([0, 1, 5, 7]),
    ),
    st.tuples(
        st.just("leaf"), st.just("exists"),
        st.sampled_from(["s", "n", "f", "arr", "nested.c", "missing.key"]), st.none(),
    ),
    st.tuples(
        st.just("leaf"), st.just("null"),
        st.sampled_from(["s", "n", "f", "nested.c"]), st.none(),
    ),
    st.tuples(
        st.just("leaf"), st.just("int_range"), st.sampled_from(["n", "f", "s"]),
        st.tuples(st.sampled_from([0, 1]), st.sampled_from([4, 5, 7]),
                  st.booleans(), st.booleans()),
    ),
    st.tuples(
        st.just("leaf"), st.just("float_range"), st.sampled_from(["f", "n"]),
        st.tuples(st.sampled_from([0.1, 0.4]), st.sampled_from([1.5, 2.5]),
                  st.booleans(), st.booleans()),
    ),
)

_filters = st.recursive(
    _leaves,
    lambda children: st.one_of(
        st.tuples(st.just("not"), children),
        st.tuples(st.just("and"), children, children),
        st.tuples(st.just("or"), children, children),
    ),
    max_leaves=6,
)


@pytest.fixture(scope="module")
def prop_df(spark):
    df = spark.createDataFrame(ROWS, SCHEMA).coalesce(1)
    df.persist().count()
    yield df
    df.unpersist()


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(node=_filters)
def test_filter_matches_reference_semantics(node, prop_df):
    expr = _render(node)
    expected = sorted(r["id"] for r in ROWS if _ev(node, r))
    cond = compile_filter(expr, prop_df)
    got = sorted(r.id for r in prop_df.filter(cond).collect())
    assert got == expected, f"filter {expr!r}: spark={got} expected={expected}"
