"""Windowed streaming aggregations (SURVEY §2 A8).

Watermarks bound state: late events beyond the watermark are dropped
and closed windows are evicted, which is what makes these plans run
indefinitely at cluster scale. All are built-in window/session_window
aggregations — partial aggregation map-side, state keyed by
(window, group) in the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Per-type event counts in non-overlapping windows."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Overlapping-window counts (each event lands in window/slide
    windows)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    within: str = "10 minutes",
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_watermark: str = "10 minutes",
    right_watermark: str = "20 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with a bounded time interval: each left
    event pairs with right events for the same key whose timestamp
    falls in ``[left_ts - within, left_ts]`` (e.g. click ⋈ the login
    that preceded it). BOTH sides carry watermarks and the join
    condition bounds event-time distance — that's what lets Spark
    evict state and run the join indefinitely; an unconstrained
    stream-stream join would buffer both streams forever. The right
    watermark must cover the interval plus the left watermark (late
    left rows still need their right matches in state).

    When both sides use the same timestamp name (default ``ts``), the
    right side's is renamed to ``<right_ts>_right`` in the output —
    otherwise two identically-named columns would make any later
    ``select(left_ts)`` ambiguous.

    ``how='left_outer'`` (Spark also accepts right/full here, passed
    through) keeps unmatched left rows: they emit with NULL right
    columns only once the watermark proves no match can still arrive —
    the streaming semantics that make outer joins safe to run forever
    (a batch outer join has all the data; a stream has to WAIT).
    """
    lts, rts = f"__l_{left_ts}", f"__r_{right_ts}"
    lhs = left.withColumn(lts, F.col(left_ts)).withWatermark(lts, left_watermark)
    rhs = right.withColumnRenamed(key, f"__r_{key}")
    if right_ts in lhs.columns:
        rhs = rhs.withColumnRenamed(right_ts, f"{right_ts}_right")
        rhs = rhs.withColumn(rts, F.col(f"{right_ts}_right"))
    else:
        rhs = rhs.withColumn(rts, F.col(right_ts))
    rhs = rhs.withWatermark(rts, right_watermark)
    cond = (
        (F.col(key) == F.col(f"__r_{key}"))
        & (F.col(rts) <= F.col(lts))
        & (F.col(rts) >= F.col(lts) - F.expr(f"INTERVAL {within}"))
    )
    return lhs.join(rhs, on=cond, how=how).drop(f"__r_{key}", lts, rts)


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessions via native ``session_window`` — the
    streaming twin of the batch ``sessionize_events`` plan (which uses
    a lag-window over a shuffle-by-user; same session boundaries)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def psi_baseline(df, value_col: str = "value", buckets: int = 10):
    """Batch-side PSI baseline model: decile bounds + per-bucket
    add-1-smoothed milli fractions, collected driver-side (a ~20-
    number model, the broadcast-of-centroids pattern). Feed the
    result to :func:`drift_psi_stream`."""
    from pyspark.sql import functions as F

    qs = [i / buckets for i in range(1, buckets)]
    bounds = [
        float(x)
        for x in df.agg(
            F.percentile(value_col, F.array(*[F.lit(q) for q in qs]))
        ).first()[0]
    ]
    b = F.aggregate(
        F.array(*[F.lit(x) for x in bounds]),
        F.lit(0),
        lambda acc, bd: acc + F.when(F.col(value_col) > bd, 1).otherwise(0),
    )
    counts = {r["bucket"]: r["n"] for r in df.groupBy(b.alias("bucket")).count().withColumnRenamed("count", "n").collect()}
    total = sum(counts.values())
    fracs_milli = [
        round(1000 * (counts.get(i, 0) + 1) / (total + buckets)) for i in range(buckets)
    ]
    return bounds, fracs_milli


def drift_psi_stream(
    events,
    bounds: list[float],
    base_fracs_milli: list[int],
    ts_col: str = "ts",
    value_col: str = "value",
    window_duration: str = "10 minutes",
    watermark: str = "10 minutes",
):
    """Streaming PSI drift against a static baseline — the batch
    drift monitor (plans/analytics.drift_psi) as a live stream: each
    event-time window's value distribution is bucketed against the
    BASELINE bounds (plan literals — the stream never joins), and the
    window's PSI is emitted once the watermark closes it.

    This is a CHAINED stateful pipeline (Spark ≥3.4 append-mode
    multi-stateful support): windowed (window, bucket) counts →
    per-window assembly of the 10-bucket vector → PSI from the
    literal baseline fractions. State is bounded by open windows ×
    buckets; the watermark evicts both operators."""
    from pyspark.sql import functions as F

    n_buckets = len(base_fracs_milli)
    b = F.aggregate(
        F.array(*[F.lit(x) for x in bounds]),
        F.lit(0),
        lambda acc, bd: acc + F.when(F.col(value_col) > bd, 1).otherwise(0),
    )
    wcounts = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("win"), b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assembled = wcounts.groupBy("win").agg(
        F.sum("n").alias("total"),
        F.collect_list(F.struct("bucket", "n")).alias("_bn"),
    )
    def bucket_n(i: int):
        # real closure — a default-arg lambda has two parameters and
        # F.filter would silently pass (element, index) instead
        # F.get (0-based) returns NULL past the end; ANSI element_at
        # raises on the empty array an absent bucket produces
        return F.coalesce(
            F.get(F.filter("_bn", lambda x: x["bucket"] == F.lit(i)), 0)["n"],
            F.lit(0),
        )

    parts = []
    for i, f1_milli in enumerate(base_fracs_milli):
        nb = bucket_n(i)
        p2 = (nb + 1) / (F.col("total") + n_buckets)
        p1 = F.lit(f1_milli / 1000.0)
        parts.append((p2 - p1) * F.log(p2 / p1))
    psi = parts[0]
    for p in parts[1:]:
        psi = psi + p
    return assembled.select(
        F.col("win.start").alias("window_start"),
        "total",
        F.round(psi * 1_000_000).cast("long").alias("psi_micro"),
    )
