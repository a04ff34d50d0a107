"""Bucketed (pre-shuffled) tables for shuffle-free co-located joins.

At 100 TB the dominant cost of a fact⋈fact join is the shuffle of both
sides. If the tables are WRITTEN bucketed by the join key with the
same bucket count, Spark's scan is already hash-partitioned: the join
plans as a zero-Exchange sort-merge over co-located buckets — the
shuffle is paid once at write time and amortized over every
subsequent join/aggregation on that key.

This is the standing recommendation for the heavy recurring joins in
this engine (lineitem⋈orders on orderkey, events⋈sessions on
user_id): land the data bucketed, size ``n_buckets`` so each bucket
file stays in the 100-500 MB range at the target scale (e.g. ~25k
buckets for a 10 TB fact at 400 MB), and keep the bucket count equal
across tables joined together.

Guarded by ``tests/unit/test_plan_shapes.py::test_bucketed_join_no_
shuffle`` — the join of two bucketed tables must contain no Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str | list[str],
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) external table.

    Sorting within buckets lets the sort-merge join skip its sort step
    too (plan shows no Sort above the scan)."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.format("parquet").mode("overwrite").option("path", path)
    writer = writer.bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With equal
    bucket counts the physical plan has NO Exchange on either side —
    assert via ``.explain`` when adopting a new pair of tables."""
    on = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
