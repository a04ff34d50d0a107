"""Deterministic sketches: cross-engine-reproducible approximations.

Spark's builtin sketches (``approx_count_distinct`` = HLL++) are the
production path but can't hash-compare against another engine; these
md5-based sketches produce bit-identical results in any engine, so the
oracle gate can check the SKETCH itself, not just a tolerance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logprep_spark.functions.dedup import h60

#: h60 values are uniform in [0, 2^60)
_H_MAX = float(1 << 60)


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """K-minimum-values distinct-count estimate of ``col``.

    The k smallest 60-bit hashes of the distinct values estimate the
    cardinality as ``(k-1) * H_MAX / kth_min`` (exact count when fewer
    than k distinct values exist). Scale shape: hash → distinct →
    ``orderBy().limit(k)`` is TakeOrderedAndProject — per-partition
    top-k then a single merge of k rows per partition; nothing
    unbounded ever reaches one node. Deterministic: same md5 hashes in
    every engine, so the estimate itself hash-compares in the oracle.
    """
    h: Column = h60(F.col(col).cast("string"))
    topk = df.select(h.alias("h")).distinct().orderBy("h").limit(k)
    agg = topk.agg(F.max("h").alias("kth"), F.count(F.lit(1)).alias("n"))
    return agg.select(
        F.when(F.col("n") < k, F.col("n").cast("double"))
        .otherwise(F.round(F.lit(float(k - 1)) * F.lit(_H_MAX) / F.col("kth"), 2))
        .alias("distinct_estimate")
    )
