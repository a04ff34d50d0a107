"""Stage-time breakdown for dedup_cdc_chunks (r13 verdict ask #4 —
slowest headline row two rounds running; the sf1 line regressed +46%
in r13 with untouched code).

The query has four timeable regions, separated by its own eager
localCheckpoints: (1) orig chunking (normalize → codes → unrolled
16-term window sums → cuts → slice → posexplode → checkpoint),
(2) twin chunking (same over the 'zq9 '-prefixed text — deliberately
recomputed: deriving twin cuts from orig cuts would assume the
re-sync property the query exists to GATE), (3) the consumers
(chunk-hash agg, per-doc first-chunk window, witness join, source
agg). This tool times each region separately at the given sf dir,
min-of-N, and prints one JSON line.

Usage: SPARK_GRAFT_SF_DIR=... python tools/cdc_profile.py [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import functions as F

    from logprep_spark.plans import catalog
    from logprep_spark.session import get_spark, release_staging_cache

    spark = get_spark("cdc-profile")
    docs = catalog.tables(spark, SF_DIR)["documents"]
    cuts_e, chunks_e = catalog._cdc_spark_cols()

    def ready_frame():
        return (
            docs.select(
                "doc_id",
                "source",
                F.expr(
                    "substring(regexp_replace(lower(text),"
                    " '[^a-z0-9 ]', ''), 1, 512)"
                ).alias("t"),
            )
            .filter(F.length("t") >= 32)
        )

    def chunked(frame):
        return (
            frame.withColumn(
                "_codes",
                F.expr(
                    "transform(split(t, ''),"
                    " ch -> CAST(ascii(ch) AS BIGINT))"
                ),
            )
            .withColumn("_cuts", F.expr(cuts_e))
            .withColumn(
                "_starts",
                F.expr("concat(array(1), transform(_cuts, c -> c + 1))"),
            )
            .withColumn("_ends", F.expr("concat(_cuts, array(length(t)))"))
            .select(
                "doc_id",
                "source",
                F.posexplode(F.expr(chunks_e)).alias("idx0", "chunk"),
            )
        )

    # orig_chunk / twin_chunk time the PRE-r14 Catalyst expression
    # form (kept as the before-reference); vector_chunk times the r14
    # mapInPandas chunker that replaced both passes; full_query is the
    # committed query end to end.
    stages = {
        k: []
        for k in (
            "orig_chunk",
            "twin_chunk",
            "vector_chunk",
            "consumers",
            "full_query",
        )
    }
    qs = catalog.queries()
    for _ in range(runs):
        release_staging_cache(spark)
        t0 = time.time()
        orig = chunked(ready_frame()).localCheckpoint(eager=True)
        t1 = time.time()
        twin = chunked(
            ready_frame().select(
                "doc_id", "source",
                F.concat(F.lit("zq9 "), F.col("t")).alias("t"),
            )
        ).localCheckpoint(eager=True)
        t2 = time.time()
        from logprep_spark.functions import dedup as dd
        from logprep_spark.session import fan_out

        dd.cdc_chunk_hashes(
            fan_out(ready_frame()), catalog._CDC_W, twin_prefix="zq9 "
        ).localCheckpoint(eager=True)
        t2b = time.time()
        # consumers replicated from the catalog query body
        from pyspark.sql import Window

        orig_d = (
            orig.select(
                "doc_id", "source", F.md5("chunk").alias("h"),
                (F.col("idx0") + 1).alias("idx"),
            )
            .groupBy("doc_id", "source", "h")
            .agg(F.min("idx").alias("idx"))
            .withColumn(
                "is_first",
                F.col("idx") == F.min("idx").over(Window.partitionBy("doc_id")),
            )
        )
        twin_d = twin.select("doc_id", F.md5("chunk").alias("h")).distinct()
        matched = (
            orig_d.filter(~F.col("is_first"))
            .join(twin_d.withColumn("_hit", F.lit(1)), ["doc_id", "h"], "left")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("expected"),
                F.count("_hit").cast("long").alias("found"),
            )
        )
        stats = orig.groupBy("source").agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.countDistinct(F.md5("chunk")).cast("long").alias("n_distinct_chunks"),
        )
        stats.join(F.broadcast(matched), "source").write.format("noop").mode(
            "overwrite"
        ).save()
        t3 = time.time()
        # the committed query end-to-end for the same run context
        release_staging_cache(spark)
        t4 = time.time()
        qs["dedup_cdc_chunks"](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        t5 = time.time()
        stages["orig_chunk"].append(t1 - t0)
        stages["twin_chunk"].append(t2 - t1)
        stages["vector_chunk"].append(t2b - t2)
        stages["consumers"].append(t3 - t2b)
        stages["full_query"].append(t5 - t4)
    out = {
        k: {"min": round(min(v), 3), "med": round(sorted(v)[len(v) // 2], 3)}
        for k, v in stages.items()
    }
    out["sf_dir"] = SF_DIR
    out["runs"] = runs
    print(json.dumps(out))


if __name__ == "__main__":
    main()
