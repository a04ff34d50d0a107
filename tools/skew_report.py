"""Key-skew report for join/groupBy columns: the data-time companion
to `query lint`'s plan-time checks. Per column: distinct count, the
top heavy keys with their milli share of all rows, and the derived
skew factor (heaviest key count / mean key count) — the number that
predicts a straggler task before you run the join.

Recommendation thresholds (heuristics, stated in the output):
- distinct small enough to broadcast (< ~1M keys and the dim side is
  the table being profiled): broadcast the other side's build.
- skew factor > 10 on a join/groupBy key: enable AQE skew join
  (spark.sql.adaptive.skewJoin.enabled, on by default) and/or salt
  the key by ceil(skew_factor / 10) — the salted two-stage agg shape
  (SURVEY X9).
- skew factor <= 10: plain hash partitioning is fine.

Usage: python tools/skew_report.py <parquet_dir_or_file> col [col...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def skew_stats(df, col: str, top_n: int = 10) -> dict:
    """Distributed skew profile of one column: ONE map-side-combining
    aggregation over the key space (never a collect of raw rows),
    then a top-n TakeOrdered and a 1-row moment agg — safe to run on
    a 100 TB table. NULLs are profiled as their own key (they hash to
    one partition in a join, the classic hidden-skew cause)."""
    from pyspark.sql import functions as F

    counts = df.groupBy(F.col(col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    moments = counts.agg(
        F.count(F.lit(1)).alias("distinct"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("total"),
        F.coalesce(F.max("n"), F.lit(0)).alias("max_n"),
    ).collect()[0]
    top = [
        (r["key"], r["n"])
        for r in counts.orderBy(F.desc("n"), "key").limit(top_n).collect()
    ]
    mean = moments["total"] / max(moments["distinct"], 1)
    skew_factor = moments["max_n"] / max(mean, 1e-12)
    return {
        "column": col,
        "distinct": moments["distinct"],
        "total_rows": moments["total"],
        "top_keys": [
            {
                "key": None if k is None else str(k),
                "count": n,
                "share_milli": 1000 * n // max(moments["total"], 1),
            }
            for k, n in top
        ],
        "skew_factor": round(skew_factor, 2),
        "recommendation": _recommend(moments["distinct"], skew_factor),
    }


def _recommend(distinct: int, skew_factor: float) -> str:
    if distinct < 1_000_000:
        side = (
            f"dim-sized key space ({distinct} keys): broadcast this side "
            "of the join if its rows fit the broadcast threshold"
        )
    else:
        side = f"fact-sized key space ({distinct} keys): shuffle join"
    if skew_factor > 10:
        salt = max(2, int(-(-skew_factor // 10)))
        return (
            f"{side}; skew_factor {skew_factor:.1f} > 10 — keep AQE "
            f"skew-join on and/or salt by {salt} (the X9 two-stage shape)"
        )
    return f"{side}; skew_factor {skew_factor:.1f} <= 10 — plain hash partitioning is fine"


def main() -> None:
    import json

    from logprep_spark.session import get_spark

    path, cols = sys.argv[1], sys.argv[2:]
    if not cols:
        print(__doc__)
        raise SystemExit(2)
    spark = get_spark("skew-report")
    df = spark.read.parquet(path)
    for c in cols:
        print(json.dumps(skew_stats(df, c)))


if __name__ == "__main__":
    main()
