"""Similarity search over embedding columns.

Brute-force cosine top-k is the correctness baseline; the scale path
is random-hyperplane LSH bucketing (deterministic md5-derived planes)
so the join touches buckets, not the full n^2 cross product.

No UDFs: dot products are ``zip_with``/``aggregate`` higher-order
functions, fully JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from logprep_spark.functions.dedup import cosine_sim, h60


def hyperplane_bucket(vec: Column, n_planes: int = 8) -> Column:
    """Sign-bit bucket id from ``n_planes`` pseudo-random hyperplanes.

    Plane p's weight for dimension i is derived from md5(p:i) mapped
    into [-1, 1] — deterministic across engines and runs, no stored
    model. sign(dot(w_p, v)) becomes bit p of the bucket id."""
    def weight_times_v(p: int):
        # closure factory (NOT default-arg binding: Spark would feed a
        # third positional arg); weight(i) = (h60(p:i)%2001-1000)/1000
        return lambda v, i: v.cast("double") * (
            (h60(F.concat(F.lit(f"{p}:"), i.cast("string"))) % 2001 - 1000).cast("double")
            / 1000.0
        )

    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), F.size(vec) - 1), weight_times_v(p)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for bit in bits[1:]:
        out = out + bit
    return out


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Plan: broadcast the (small) query set against the corpus — a
    map-side nested loop with NO corpus shuffle and no corpus
    broadcast (the corpus is the unbounded side at 100 TB; only the
    query set must fit in a broadcast). After scoring, only narrow
    (query_id, nbr_id, cosine) tuples shuffle for the final per-query
    top-k window."""
    corpus = df.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("nbr_vec"))
    qs = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec"))
    sim = F.round(cosine_sim(F.col("query_vec"), F.col("nbr_vec")), 6)
    scored = (
        corpus.crossJoin(F.broadcast(qs))
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", sim.alias("cosine"))
    )
    window = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's hyperplane
    bucket, then exact cosine re-rank. The bucket join replaces the
    cross join — the 1000-executor path for big corpora.

    The query side is broadcast: an equi-join on ``bucket`` would
    otherwise shuffle the ENTIRE corpus on a ≤2^n_planes-cardinality
    key (massively skewed at scale). Broadcast keeps the corpus
    partition-local; bucket pruning happens map-side."""
    corpus = df.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("nbr_vec"),
        hyperplane_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        hyperplane_bucket(F.col(vec_col), n_planes).alias("bucket"),
    )
    sim = F.round(cosine_sim(F.col("query_vec"), F.col("nbr_vec")), 6)
    scored = (
        corpus.join(F.broadcast(qs), "bucket")
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", sim.alias("cosine"))
    )
    window = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )
