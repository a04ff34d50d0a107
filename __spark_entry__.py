"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the full catalog from
``logprep_spark.plans.catalog`` (one entry per SURVEY.md §2 gate; the
driver hash-compares each Spark plan against its DuckDB oracle at
sf0.01).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from logprep_spark.plans import catalog  # noqa: E402

_FLAGSHIP_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the end-to-end training-data pipeline (quality gate →
    language filter → exact dedup → PII redaction → token accounting)
    over sf0.001 — the engine's headline use case in one plan."""
    return catalog.queries()["pipeline_training_data"](spark, _FLAGSHIP_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
