"""Partition-order independence guard: the integer-exact operators
claim bit-identical results under ANY partitioning (SURVEY §2 L31/
L37/A20 "micro-fixed longs — order-independent"). This test actually
re-plans representative queries under a different shuffle-partition
count and a pre-shuffled input and asserts set-identical rows — the
property that lets the DuckDB oracle (single-threaded, different
partitioning by construction) hash-match at all.
"""

import pytest

from logprep_spark.plans import catalog

QUERIES = ["graph_pagerank", "text_bigram_lm", "ml_kmeans", "text_dsir"]


@pytest.mark.parametrize("name", QUERIES)
def test_same_rows_under_different_partitioning(spark, sf_dir, name):
    fn = catalog.queries()[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        base = {tuple(r) for r in fn(spark, sf_dir).collect()}
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = {tuple(r) for r in fn(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == alt
