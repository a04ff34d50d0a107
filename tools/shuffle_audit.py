"""Shuffle-volume audit: measured data movement per headline query.

Runs each bench headline query once at sf0.1 and records the DELTA of
the session's cumulative shuffle-write bytes (from Spark's
AppStatusStore — the store backing the UI/REST API, live even with the
UI disabled). Shuffle bytes are the cost that dominates at 1000
executors: a query whose wall-time looks fine on local[32] but moves
10x the data it needs will fall over at 100 TB. Writes
SHUFFLE_AUDIT.md at the repo root.

Usage: python tools/shuffle_audit.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def shuffle_totals(sc) -> tuple[int, int]:
    store = sc._jsc.sc().statusStore()
    it = store.executorList(True).iterator()
    w = r = 0
    while it.hasNext():
        e = it.next()
        w += e.totalShuffleWrite()
        r += e.totalShuffleRead()
    return w, r


def main() -> None:
    import bench
    from logprep_spark.plans import catalog
    from logprep_spark.session import get_spark, release_staging_cache

    spark = get_spark("shuffle-audit")
    sc = spark.sparkContext
    qs = catalog.queries()
    catalog.tables(spark, SF_DIR)

    rows = []
    for name in bench.HEADLINE:
        release_staging_cache(spark)
        w0, _ = shuffle_totals(sc)
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        w1, _ = shuffle_totals(sc)
        rows.append((name, w1 - w0, dt))

    out = [
        "# SHUFFLE_AUDIT — measured data movement per headline query",
        "",
        f"sf dir: `{SF_DIR}`, local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}],",
        "single cold run per query (staging cache cleared first, so the",
        "numbers include every staging persist's one-time shuffle).",
        "Shuffle-write bytes are the scale-limiting cost: wall-time on",
        "local[32] hides data movement that dominates at 1000 executors.",
        "",
        "| query | shuffle write | wall (s) |",
        "|---|---:|---:|",
    ]
    for name, b, dt in rows:
        human = f"{b / 1024 / 1024:.1f} MiB" if b >= 1024 * 1024 else f"{b / 1024:.0f} KiB"
        out.append(f"| {name} | {human} | {dt:.2f} |")
    out.append("")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SHUFFLE_AUDIT.md"), "w") as f:
        f.write("\n".join(out))
    print("\n".join(out))


if __name__ == "__main__":
    main()
