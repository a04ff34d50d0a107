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
    """Flagship v3: the full pretraining-corpus pipeline as ONE
    composed plan — Gopher quality gate → near-dup cluster dedup →
    Bloom decontamination vs the benchmark's 13-grams → leakage-free
    group-aware split → BPE trained on the train-split survivors →
    per-split token budget, with the leakage and fp-collateral
    witnesses riding in-row (catalog: pipeline_pretrain_v3)."""
    return catalog.queries()["pipeline_pretrain_v3"](spark, _FLAGSHIP_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
