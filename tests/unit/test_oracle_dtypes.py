"""Oracle dtype guard: every ``oracle_sql()`` entry must land in pandas
with the same dtype *class* per column as the Spark query's result.

The driver's correctness gate materializes BOTH engines through pandas
and hashes the rendered values, so a dtype-class mismatch (DuckDB
``sum(BIGINT)`` -> HUGEINT -> float64 vs Spark int64) hash-misses even
when every value is identical.  That exact failure shipped twice
(sessionize_events in r2, text_repetition in r4); this test runs the
whole catalog at sf0.001 through ``.toPandas()`` / ``.df()`` and fails
locally instead.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from logprep_spark.plans import catalog

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_ORACLES = catalog.oracle_sql()
_NAMES = [n for n in catalog.queries() if n in _ORACLES]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def _dtype_class(dtype) -> str:
    """Collapse a numpy/pandas dtype to the class that changes how a
    value renders: int widths are hash-equivalent (``str(1)`` either
    way), but int-vs-float is not (``1`` vs ``1.0``)."""
    kind = getattr(dtype, "kind", "O")
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind == "M":
        return "datetime"
    return "object"


@pytest.mark.parametrize("name", _NAMES)
def test_oracle_matches_spark_dtypes(name, spark, sf_dir, duck):
    spdf = catalog.queries()[name](spark, sf_dir).toPandas()
    opdf = duck.sql(_ORACLES[name]).df()

    assert sorted(spdf.columns) == sorted(opdf.columns), (
        f"{name}: column sets differ: spark={sorted(spdf.columns)} "
        f"oracle={sorted(opdf.columns)}"
    )
    mismatches = {
        col: (str(spdf[col].dtype), str(opdf[col].dtype))
        for col in spdf.columns
        if _dtype_class(spdf[col].dtype) != _dtype_class(opdf[col].dtype)
    }
    assert not mismatches, (
        f"{name}: dtype class mismatch (spark, oracle): {mismatches} — "
        "the driver hashes rendered values, so int-vs-float here means a "
        "hash miss even with identical values. CAST the oracle (DuckDB "
        "sum() returns HUGEINT -> pandas float64) or align the Spark type."
    )
