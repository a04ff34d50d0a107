"""Filter DSL semantics tests, modeled on the reference's
tests/unit/filter cases: missing key -> no match, NOT missing -> match,
wildcard ? = zero-or-one char, type-strict ranges, list membership."""

import pytest
from pyspark.sql import functions as F

from logprep_spark.filters import compile_filter, parse_filter
from logprep_spark.filters.parser import FilterParseError


@pytest.fixture(scope="module")
def df(spark):
    data = [
        (1, "error", 10, 1.5, None, ["a", "b"], ("sub1", 7)),
        (2, "warning", 20, 2.5, "x", ["c"], ("sub2", 8)),
        (3, "Error 42", 30, 3.5, None, [], (None, 9)),
    ]
    return spark.createDataFrame(
        data,
        "id int, message string, count int, ratio double, opt string, tags array<string>, "
        "nested struct<name:string, depth:int>",
    )


def ids(df, flt, **kw):
    cond = compile_filter(flt, df, **kw)
    return sorted(r.id for r in df.filter(cond).select("id").collect())


def test_string_eq(df):
    assert ids(df, "message: error") == [1]
    assert ids(df, 'message: "Error 42"') == [3]


def test_implicit_and_and_bool_ops(df):
    assert ids(df, "message: error AND count: 10") == [1]
    assert ids(df, "message: error count: 10") == [1]
    assert ids(df, "message: error OR message: warning") == [1, 2]
    assert ids(df, "NOT message: error") == [2, 3]
    assert ids(df, "(message: error OR message: warning) AND NOT count: 20") == [1]


def test_missing_key_never_matches(df):
    assert ids(df, "nope: 1") == []
    assert ids(df, "NOT nope: 1") == [1, 2, 3]
    assert ids(df, "nested.missing: 1") == []


def test_exists_and_null(df):
    assert ids(df, "opt") == [2]
    assert ids(df, "opt: *") == [2]
    assert ids(df, "opt: null") == [1, 3]
    assert ids(df, "nested.name") == [1, 2]
    assert ids(df, "*") == [1, 2, 3]


def test_numeric_eq(df):
    assert ids(df, "count: 10") == [1]
    assert ids(df, "ratio: 2.5") == [2]
    # string-typed field never matches a numeric literal the string way
    assert ids(df, "id: 1") == [1]


def test_wildcards(df):
    assert ids(df, "message: Err*") == [3]
    assert ids(df, "message: error?") == [1]  # ? is zero-or-one
    assert ids(df, "message: warnin?") == [2]
    assert ids(df, "message: *rror*") == [1, 3]


def test_sigma_case_insensitive(df):
    assert ids(df, "message: ERROR", sigma_fields=["message"]) == [1]
    assert ids(df, "message: err*", sigma_fields=["message"]) == [1, 3]


def test_regex(df):
    assert ids(df, "message: /[Ee]rror.*/") == [1, 3]
    assert ids(df, "message: error", regex_fields=["message"]) == [1]
    assert ids(df, "message: .*42", regex_fields=["message"]) == [3]


def test_ranges_type_strict(df):
    assert ids(df, "count: [10 TO 20]") == [1, 2]
    assert ids(df, "count: {10 TO 30]") == [2, 3]
    assert ids(df, "ratio: [1.0 TO 2.5}") == [1]
    # int range on a float field does not match (reference type-strictness)
    assert ids(df, "ratio: [1 TO 3]") == []
    assert ids(df, "message: [e TO f]") == [1]


def test_list_membership(df):
    assert ids(df, "tags: a") == [1]
    assert ids(df, "tags: c") == [2]
    assert ids(df, "tags: z") == []


def test_nested_access(df):
    assert ids(df, "nested.name: sub1") == [1]
    assert ids(df, "nested.depth: [8 TO 9]") == [2, 3]


def test_parse_errors():
    with pytest.raises(FilterParseError):
        parse_filter("(a: 1")


def test_pushdown_stays_catalyst(spark, df):
    """The compiled predicate must be a pure Catalyst expression —
    no Python UDF nodes in the optimized plan."""
    cond = compile_filter("message: Err* AND count: [10 TO 40]", df)
    plan = df.filter(cond)._jdf.queryExecution().optimizedPlan().toString()
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan


def test_negation_paths_r6(df, spark):
    """The r6 pushdown-eligible negation rewrite, all three branches:
    leaf (column-level Or(IsNull, Not)), array leaf (expression-level
    — exists() can be null with a non-null column), and composite
    child fallback (De-Morgan-free generic form). Semantics must
    match the reference: null/missing = no-match, so NOT matches."""
    # leaf: opt is null on ids 1 and 3 -> NOT opt: x keeps them
    assert ids(df, "NOT opt: x") == [1, 3]
    # leaf negation reaches the parquet reader in the Or(IsNull, Not) form
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(d)
    pq = spark.read.parquet(d)
    cond = compile_filter("NOT message: error", pq)
    scan = next(
        l
        for l in pq.filter(cond)._jdf.queryExecution().executedPlan().toString().split("\n")
        if "FileScan" in l
    )
    assert "Or(IsNull(message),Not(EqualTo(message,error)))" in scan
    # array leaf: tags contains 'a' only on id 1; NOT keeps 2 (non-match)
    # and 3 (empty array) — and a null-element array must still match NOT
    assert ids(df, "NOT tags: a") == [2, 3]
    # composite child: NOT (A OR B) keeps only rows matching neither
    assert ids(df, "NOT (message: error OR count: 20)") == [3]
    # composite with a null-valued leaf inside: null -> no-match -> NOT matches
    assert ids(df, "NOT (opt: x AND count: 20)") == [1, 3]
