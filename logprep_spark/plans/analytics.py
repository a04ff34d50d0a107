"""Core analytics plans (SURVEY §2.5): scan/filter/agg, joins,
windows, sessionization over the driver's TPC-H-ish tables.

Each function takes pre-loaded table DataFrames and returns a lazy
DataFrame. Plans are written so Catalyst gets full latitude:
filters sit on base tables (pushdown to parquet), dimension joins are
explicitly ``broadcast``, aggregates are declared (map-side partial
agg for free), and no collect()/driver loops anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: multi-key hash agg with pushdown filter."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # rounding pins float-sum associativity differences so the
            # DuckDB oracle hash-matches bit-for-bit
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> broadcast -> fact join.

    Only the filtered customer key set is broadcast (a true dim);
    lineitem ⋈ orders is a shuffle join on orderkey — orders is a fact
    table and must never be broadcast at scale. AQE still converts to
    broadcast at runtime when the filtered orders side happens to be
    small, which is the right call to leave to the optimizer."""
    cust = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < F.lit("1997-06-30"))
    items = lineitem.filter(F.col("l_shipdate") > F.lit("1997-06-30"))
    return (
        items.join(ords.join(broadcast(cust), ords.o_custkey == cust.c_custkey),
                   F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q5 shape: star join — true dims (region⋈nation⋈customer
    filter, supplier projection) broadcast; lineitem ⋈ orders stays a
    shuffle join on orderkey because a year of orders is still a fact
    at 100 TB. AQE may downgrade it to broadcast at small SF."""
    nat = nation.join(
        broadcast(region.filter(F.col("r_name") == "ASIA")),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey", "n_name")
    cust = customer.join(
        broadcast(nat), customer.c_nationkey == nat.n_nationkey
    ).select("c_custkey", F.col("n_nationkey").alias("c_nat"), "n_name")
    supp = supplier.select("s_suppkey", F.col("s_nationkey").alias("s_nat"))
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderkey", "o_custkey")
    return (
        lineitem.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nat") == F.col("s_nat"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


def q6_forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6 shape: pure pushdown filter + single agg, no shuffle
    beyond the final partial-agg combine."""
    return lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


def nation_revenue(
    nation: DataFrame, customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """Broadcast-dim join: order revenue by customer nation."""
    cust = customer.join(
        broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "n_name")
    return (
        orders.join(broadcast(cust), orders.o_custkey == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def topk_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Window top-k: highest-value orders per customer."""
    window = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(window))
        .filter(F.col("rank") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


def customers_without_orders(
    customer: DataFrame, orders: DataFrame, min_totalprice: float = 400000.0
) -> DataFrame:
    """Anti join: customers with no order above ``min_totalprice``.
    Stays a hash anti join; the orders side is pre-filtered so only
    qualifying keys shuffle."""
    big = orders.filter(F.col("o_totalprice") > min_totalprice).select("o_custkey")
    return customer.join(
        big, customer.c_custkey == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: a session breaks after ``gap_minutes`` of
    inactivity per user. Window lag + running sum — one shuffle on
    user_id, scales with users not events-squared."""
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # timestamp_diff works on TIMESTAMP and TIMESTAMP_NTZ alike (the
    # driver's session reads the testdata's TIMESTAMP(NANOS) as NTZ)
    # and a *difference* is session-timezone-free either way.
    gap = F.timestamp_diff("MICROSECOND", F.lag("ts").over(by_user), F.col("ts"))
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    with_session = events.withColumn(
        "session_id", F.sum(new_session).over(by_user.rowsBetween(Window.unboundedPreceding, 0))
    )
    # Durations stay integer microseconds until ONE final double division:
    # engine-variant float epoch() / int128 promotion never enters the result.
    return (
        with_session.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.timestamp_diff("MICROSECOND", F.min("ts"), F.max("ts")).alias(
                "duration_us"
            ),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.round(
                F.sum("duration_us") / (F.count(F.lit(1)) * F.lit(1_000_000.0)), 3
            ).alias("avg_session_s"),
        )
    )


def event_type_stats(events: DataFrame) -> DataFrame:
    """Hash agg over the event stream: per-type volume/value stats."""
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


def event_rollup(events: DataFrame) -> DataFrame:
    """Hierarchical totals via ROLLUP — one shuffle produces every
    aggregation level (Spark expands grouping sets map-side)."""
    bucket = (F.col("user_id") % 10).alias("user_bucket")
    return (
        events.rollup(F.col("event_type"), bucket)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def event_percentiles(events: DataFrame) -> DataFrame:
    """Exact per-type percentiles. ``percentile`` (exact, linear
    interpolation) — the approx_percentile sketch is the 100 TB path,
    kept out of the oracle-gated query because approximations don't
    hash-compare."""
    return events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )


def salted_user_counts(events: DataFrame, n_salts: int = 8) -> DataFrame:
    """Two-stage skew-safe aggregation: a hot grouping key is first
    split across ``n_salts`` sub-keys (partial counts), then the salt
    is dropped in a second, tiny aggregation. Result is IDENTICAL to a
    direct groupBy — the oracle proves it — while the heavy shuffle
    spreads a skewed key over n_salts reducers."""
    salt = (F.col("event_id") % n_salts).alias("_salt")
    partial = (
        events.groupBy(F.col("event_type"), salt)
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum("value").alias("pv"),
        )
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n_events"),
            F.round(F.sum("pv"), 2).alias("total_value"),
        )
    )


def skewed_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: list | None = None,
    hot_threshold: int = 1_000_000,
    how: str = "inner",
) -> DataFrame:
    """Split-union join for a skewed fact key: rows with HOT key values
    broadcast-join (the handful of hot dim rows ship to every
    executor — no shuffle of the skewed partition at all), the cold
    remainder takes the normal shuffle join. Result == plain join;
    the plan swaps one monster reducer for two balanced jobs.

    ``hot_keys`` pins the hot values (the production shape: computed
    offline from key histograms, passed as config). Without it, the
    hot set is DISCOVERED fully distributed: an aggregated hot-key
    frame (``groupBy(key).count().filter(>= hot_threshold)`` —
    partial-agg shrinks it map-side, the filter bounds it to the
    pathological few) is persisted and broadcast-left-joined onto
    both sides as a marker column. No ``.collect()``: the histogram
    never lands on the driver, so a high-cardinality key column
    can't OOM it. AQE's skew-join handles moderate skew at runtime;
    this is for the pathological key that outgrows a single
    executor's spill space.
    """
    if hot_keys is not None:
        if not hot_keys:
            return fact.join(dim, key, how)
        # NULL-safe routing: isin() is NULL for NULL keys, and both
        # filter(hot) and filter(~hot) drop NULL predicates — an outer
        # join would silently lose NULL-key rows a plain join keeps.
        # coalesce(..., false) routes NULL keys to the cold branch,
        # where the join treats them exactly as the plain join would.
        hot = F.coalesce(
            F.col(key).isNotNull() & F.col(key).isin(hot_keys), F.lit(False)
        )
        hot_part = fact.filter(hot).join(F.broadcast(dim.filter(hot)), key, how)
        cold_part = fact.filter(~hot).join(dim.filter(~hot), key, how)
        return hot_part.unionByName(cold_part)

    from pyspark.storagelevel import StorageLevel

    hotk = (
        fact.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__hot_n"))
        .filter(F.col("__hot_n") >= hot_threshold)
        .select(key)
        .withColumn("__hot", F.lit(True))
        # persisted: the marker frame feeds four consumers (fact/dim x
        # hot/cold) — unpersisted, the full fact scan + agg would
        # re-run per consumer
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    fact_m = fact.join(F.broadcast(hotk), key, "left")
    dim_m = dim.join(F.broadcast(hotk), key, "left")
    # NULL keys never match the marker join -> __hot null -> cold
    is_hot = F.coalesce(F.col("__hot"), F.lit(False))
    hot_part = fact_m.filter(is_hot).drop("__hot").join(
        F.broadcast(dim_m.filter(is_hot).drop("__hot")), key, how
    )
    cold_part = fact_m.filter(~is_hot).drop("__hot").join(
        dim_m.filter(~is_hot).drop("__hot"), key, how
    )
    return hot_part.unionByName(cold_part)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join: each left row gets the right row with the greatest
    ``right_ts`` <= ``left_ts`` per key (inclusive, ASOF-join
    semantics).

    Scale shape: UNION + carry-forward window, not a range join — a
    range-join realization explodes to |left| x |right-per-key| before
    filtering, while the union sorts once per key partition and
    carries the latest right values forward in a single pass. One
    shuffle on the keys, state per row is one carried tuple. Right
    rows order BEFORE left rows at equal timestamps so a same-instant
    right row is visible (>= semantics, matching DuckDB ASOF JOIN).
    """
    value_cols = [c for c in right.columns if c not in set(keys) | {right_ts}]
    r = right.select(
        *keys,
        F.col(right_ts).alias("_event_ts"),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_event_ts"),
        F.lit(1).alias("_side"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_event_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [
        F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
        for c in [right_ts, *value_cols]
    ]
    out_cols = [c for c in left.columns]
    return (
        unioned.select(*out_cols, F.col("_side"), *carried)
        .filter(F.col("_side") == 1)
        .drop("_side")
    )


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    tolerance_us: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Nearest-neighbor as-of join with tolerance: each left row gets
    the right timestamp minimizing |right_ts − left_ts| per key, NULL
    when nothing lies within ``tolerance_us`` — the sensor-fusion /
    quote-matching variant of :func:`asof_join` (which is
    backward-only). Ties (equal distance both directions) prefer the
    backward match, DuckDB/pandas ``merge_asof(direction='nearest')``
    convention.

    Scale shape: ONE union + ONE key shuffle carrying BOTH directions
    — a backward pass (ascending carry-forward) and a forward pass
    (descending carry-forward) are two window specs over the same
    partition key, so Catalyst plans one exchange with two sorts; no
    range join, no |left|×|right-per-key| explosion. The nearest pick
    is a narrow integer-microsecond CASE."""
    r = right.select(
        *keys,
        F.col(right_ts).alias("_event_ts"),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_r_ts"),
    )
    l = left.select("*", F.col(left_ts).alias("_event_ts"), F.lit(1).alias("_side"))
    unioned = l.unionByName(r, allowMissingColumns=True)
    w_back = (
        Window.partitionBy(*keys)
        .orderBy("_event_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # right rows order before left at the same instant in BOTH
    # directions (ascending ts then side, descending ts then side) so
    # a same-instant right row is visible to each pass (inclusive).
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_event_ts").desc(), "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    staged = unioned.select(
        *left.columns,
        "_side",
        F.last("_r_ts", ignorenulls=True).over(w_back).alias("_back_ts"),
        F.last("_r_ts", ignorenulls=True).over(w_fwd).alias("_fwd_ts"),
    ).filter(F.col("_side") == 1)
    def _us(c: Column) -> Column:
        # NTZ-safe: differences are TZ-invariant under the same cast
        return F.unix_micros(c.cast("timestamp"))

    db = _us(F.col(left_ts)) - _us(F.col("_back_ts"))
    df_ = _us(F.col("_fwd_ts")) - _us(F.col(left_ts))
    tol = F.lit(tolerance_us)
    pick_back = F.col("_back_ts").isNotNull() & (db <= tol) & (
        F.col("_fwd_ts").isNull() | (df_ > tol) | (db <= df_)
    )
    pick_fwd = F.col("_fwd_ts").isNotNull() & (df_ <= tol)
    return staged.select(
        *left.columns,
        F.when(pick_back, F.col("_back_ts"))
        .when(pick_fwd, F.col("_fwd_ts"))
        .alias("ts_nearest"),
        F.when(pick_back, db).when(pick_fwd, df_).alias("diff_us"),
    )


def range_join(
    left: DataFrame,
    val_col: str,
    ranges: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: int = 1000,
) -> DataFrame:
    """Range join: match each left row to the range rows whose
    [lo, hi] interval contains ``val_col``.

    Scale shape: the BINNING rewrite, not a non-equi join. A naive
    range predicate forces BroadcastNestedLoopJoin (|left| x |ranges|
    comparisons); instead every range explodes into the fixed-width
    bins it covers (ranges are the small side — the explosion is
    bounded by range span / bin_width), the left side computes its
    single bin, and the join becomes a broadcast EQUI-join on bin_id
    plus a residual BETWEEN filter. Whole-stage-codegen hash join at
    any corpus size; bin_width trades range-table blowup against join
    fan-out."""
    binned_ranges = ranges.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (F.col(lo_col) / bin_width).cast("long"),
                (F.col(hi_col) / bin_width).cast("long"),
            )
        ),
    )
    val_bin = (F.col(val_col) / bin_width).cast("long")
    return (
        left.withColumn("_bin", val_bin)
        .join(broadcast(binned_ranges), "_bin")
        .filter(F.col(val_col).between(F.col(lo_col), F.col(hi_col)))
        .drop("_bin")
    )


def q14_promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a fact-dim join —
    the promo-revenue share of one ship month. The month filter pushes
    to the lineitem scan; part is the broadcast side (dim), so the
    fact never shuffles; the CASE sits inside the partial agg (both
    numerator and denominator combine map-side to one row)."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    ).join(
        broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    return joined.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev),
            4,
        ).alias("promo_revenue_pct"),
        F.round(F.sum(rev), 2).alias("total_revenue"),
    )


def touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple = ("view", "click", "signup"),
    window_days: int = 7,
) -> DataFrame:
    """FIRST-TOUCH vs LAST-TOUCH conversion attribution — the
    marketing-analytics staple (which channel gets credit for a
    purchase): for every conversion, the user's touch events inside
    the preceding ``window_days`` are ranked and the earliest
    (first-touch) and latest (last-touch) each credit their
    event_type; conversions with NO in-window touch land honestly in
    a ``(none)`` row instead of disappearing (the n_unreachable
    discipline). The two models genuinely disagree on real data —
    that disagreement is the readout's point.

    Deterministic: ranking ties break on (ts, event_id); revenue in
    exact cents. Returns one row per touch type (+ ``(none)``):
    (touch_type, first_touch_conversions, last_touch_conversions,
    last_touch_value_cents).

    Distributed shape: conversions ⋈ touches is a user-keyed
    equi-join with the time-window predicate as a residual (per-user
    event counts are bounded; AQE splits hot users), then two
    per-conversion argmin/argmax windows over the joined frame and
    one touch-type agg. No driver state; at 100 TB pre-bucket both
    sides by user_id to make the join shuffle-free."""
    from pyspark.sql import Window

    conv = events.filter(F.col("event_type") == conversion_type).select(
        F.col("event_id").alias("_cid"),
        F.col("user_id").alias("_u"),
        F.col("ts").alias("_cts"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("_cents"),
    )
    touch = events.filter(
        F.col("event_type").isin(*touch_types)
    ).select(
        F.col("user_id").alias("_u"),
        F.col("ts").alias("_tts"),
        F.col("event_type").alias("_ttype"),
        F.col("event_id").alias("_tid"),
    )
    j = conv.join(touch, "_u").filter(
        (F.col("_tts") < F.col("_cts"))
        & (
            F.col("_tts")
            >= F.col("_cts") - F.expr(f"INTERVAL {window_days} DAYS")
        )
    )
    w_last = Window.partitionBy("_cid").orderBy(
        F.col("_tts").desc(), F.col("_tid").desc()
    )
    w_first = Window.partitionBy("_cid").orderBy(
        F.col("_tts").asc(), F.col("_tid").asc()
    )
    ranked = j.select(
        "_cid",
        "_cents",
        "_ttype",
        F.row_number().over(w_last).alias("_rl"),
        F.row_number().over(w_first).alias("_rf"),
    )
    last = ranked.filter(F.col("_rl") == 1).groupBy(
        F.col("_ttype").alias("touch_type")
    ).agg(
        F.count(F.lit(1)).alias("last_touch_conversions"),
        F.sum("_cents").alias("last_touch_value_cents"),
    )
    first = ranked.filter(F.col("_rf") == 1).groupBy(
        F.col("_ttype").alias("touch_type")
    ).agg(F.count(F.lit(1)).alias("first_touch_conversions"))
    unattr = (
        conv.join(j.select("_cid").distinct(), "_cid", "left_anti")
        .agg(
            F.count(F.lit(1)).alias("last_touch_conversions"),
            F.sum("_cents").alias("last_touch_value_cents"),
        )
        .select(
            F.lit("(none)").alias("touch_type"),
            F.col("last_touch_conversions").alias(
                "first_touch_conversions"
            ),
            "last_touch_conversions",
            F.coalesce("last_touch_value_cents", F.lit(0)).alias(
                "last_touch_value_cents"
            ),
        )
    )
    return (
        first.join(last, "touch_type", "full")
        .select(
            "touch_type",
            F.coalesce("first_touch_conversions", F.lit(0)).alias(
                "first_touch_conversions"
            ),
            F.coalesce("last_touch_conversions", F.lit(0)).alias(
                "last_touch_conversions"
            ),
            F.coalesce("last_touch_value_cents", F.lit(0)).alias(
                "last_touch_value_cents"
            ),
        )
        .unionByName(unattr)
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    horizon_s: int | None = None,
) -> DataFrame:
    """Ordered funnel analysis (ClickHouse windowFunnel-style): per
    user, the deepest step reached by a strictly-increasing chain —
    step i+1 must occur after the EARLIEST completion of step i
    (greedy-earliest is optimal: taking the first possible timestamp
    at each step never shortens the reachable chain). Optional
    ``horizon_s`` bounds the whole chain to a window after step 1.

    Distributed shape: one shuffle on the user key; each step's
    timestamp is a filtered min over the same user-partition window,
    so the N step columns stack as window operators on ONE exchange
    (per-user state is bounded by that user's event count), then a
    per-user agg collapses to (user, funnel_depth).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col)
    df = events
    prev = None
    for i, step in enumerate(steps, 1):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
            if horizon_s is not None:
                cond = cond & (
                    F.col(ts_col)
                    <= F.col("_t1") + F.expr(f"INTERVAL {int(horizon_s)} SECONDS")
                )
        df = df.withColumn(f"_t{i}", F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = f"_t{i}"
    agg = df.groupBy(user_col).agg(
        *[F.max(f"_t{i}").alias(f"_t{i}") for i in range(1, len(steps) + 1)]
    )
    depth = None
    for i in range(1, len(steps) + 1):
        term = F.when(F.col(f"_t{i}").isNotNull(), 1).otherwise(0)
        depth = term if depth is None else depth + term
    return agg.select(user_col, depth.cast("long").alias("funnel_depth"))


def retention(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Cohort retention matrix — the funnel's companion report: users
    cohorted by first-active day, and for each (cohort_day,
    day_offset) the count of distinct users active that many days
    later (offset 0 = cohort size).

    Distributed shape: cohort assignment is a user-keyed partial agg
    (min day); the activity set is a distinct over (user, day) with
    map-side combine — per-user event volume collapses before any
    shuffle; the user-keyed join broadcasts the (small) cohort side
    or shuffles skew-splittably at scale; the final matrix agg is
    two-phase countDistinct over a bounded (cohorts x offsets) key
    space."""
    day = F.to_date(F.col(ts_col))
    cohorts = events.groupBy(user_col).agg(F.min(day).alias("cohort_day"))
    active = events.select(F.col(user_col), day.alias("active_day")).distinct()
    return (
        active.join(cohorts, user_col)
        .select(
            "cohort_day",
            F.datediff("active_day", "cohort_day").cast("long").alias("day_offset"),
            user_col,
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct(user_col).alias("n_users"))
        # ISO string, not DATE: Spark DATE arrives in pandas as
        # datetime.date objects, DuckDB DATE as datetime64 — same
        # values, different dtype class → driver hash miss
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
            "n_users",
        )
    )


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping_milli: int = 850,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 8,
    dangling: bool = False,
    weight_col: str | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list — the graph
    workload (host-graph ranking, near-dup authority scoring) that
    stresses ITERATIVE joins rather than one-shot aggregation.

    Exactness contract: ranks live in integer MICRO-units. Each
    iteration is new_r = (1000 - d)·1000 + (d · Σ(r_j div deg_j))
    div 1000 — pure long arithmetic (div = integer division), so the
    result is bit-identical in any engine / any partitioning; a
    float PageRank sums contributions in partition order and is not.
    Magnitudes: r ≤ ~10⁶·N, deg ≥ 1, Σ over in-degree ≤ 10⁴ terms →
    d·Σ ≤ ~10¹³, far inside int64.

    Distributed shape: edges are persisted once (every iteration
    re-reads them — the classic iterative-join pattern); each round
    is ONE shuffle: rank⋈edges on src (AQE-skew-splittable; the
    rank side is one row per node, partial agg collapses the
    contribution sum map-side before the dst shuffle). Lineage is cut
    every round with localCheckpoint — without it the plan doubles
    per iteration and round N replays rounds 1..N-1.

    General-graph semantics: the node set is distinct(src) ∪
    distinct(dst), computed once and persisted; each round the
    contribution stream is UNIONed with one zero-contribution row per
    node before the dst-keyed agg, so source-only nodes keep the
    (1-d) base rank and keep contributing — a groupBy(dst) alone
    silently drops them after round 1. The union rides the SAME
    single shuffle as the agg (N extra rows, collapsed map-side);
    a per-round join back to the node set was measured ~70% slower
    (3.5 s → 5.9 s at sf0.1, 3 iters) for identical values.

    ``dangling=True`` adds the standard dangling-mass term: nodes
    with no out-edges have their rank redistributed evenly — each
    round Σ r over dangling nodes is a 1-row aggregate broadcast-
    cross-joined onto the contribution frame, and the per-node share
    dm div N joins s inside the same integer recurrence:
    new_r = (1000-d)·1000 + (d · (s + dm div N)) div 1000. Off by
    default: it costs one extra 1-row agg per round and the
    both-direction graphs the catalog ranks have no sinks.

    ``weight_col`` turns on WEIGHTED PageRank (the TextRank
    recurrence, Mihalcea & Tarau 2004 eq. 2): deg becomes the long
    out-weight Σw, each contribution (w·r) div Σw — still pure long
    arithmetic, and weight 1 everywhere reduces bit-exactly to the
    unweighted form. Magnitude contract: w·r must stay inside int64
    (w ≤ ~10⁵ co-occurrence counts × r ≤ ~10¹² hub mass is fine;
    re-scale weights before ranking a graph that exceeds it)."""
    from pyspark.storagelevel import StorageLevel

    wt = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    # e pinned ONCE (r14): the projected edge frame feeds deg, the
    # edeg join, and both arms of the node union — unpinned, the edge
    # DERIVATION (for the trade graph: a fact-fact shuffle join +
    # distinct) re-ran per consumer during the first materialization
    # (52 Scan parquet nodes in the r14 baseline graph_pagerank plan;
    # guide §2.1). One bounded materialization, every downstream frame
    # reads it.
    from pyspark.storagelevel import StorageLevel

    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), wt.alias("wt")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    deg = e.groupBy("src").agg(F.sum("wt").alias("deg"))
    # Shuffle profile (measured via tools/shuffle_audit.py at sf0.1):
    # the 40 MiB total is ~all edge DERIVATION (fact-fact join +
    # distinct), not iteration traffic — AQE broadcasts the small rank
    # side each round, so the cached edge frame never re-shuffles. An
    # explicit repartition(src) before the persist was tried and
    # reverted: it adds a full edge shuffle while saving none.
    # At billion-node scale (ranks too big to broadcast) pre-bucketing
    # edges by src IS the right move — plans/bucketing.py shows the
    # zero-exchange pattern.
    edeg = e.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ranks = nodes.select("node", F.lit(1_000_000).cast("long").alias("r"))
    base = F.lit((1000 - damping_milli) * 1000).cast("long")
    if dangling:
        # dangling = nodes with no out-edges; their count and the node
        # total are fixed model scalars (one setup action, like the
        # k-means centroid fetches)
        dang = nodes.join(deg, nodes["node"] == deg["src"], "left_anti").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        n_nodes = nodes.count()
    for i in range(iters):
        # lineage cut every ``checkpoint_every`` rounds, not every
        # round: each round references the previous ranks exactly ONCE,
        # so the plan grows LINEARLY (unlike CC label propagation,
        # which reads its frame twice per round and doubles) — a
        # checkpoint per round would pay a full rank materialization
        # for nothing (measured: 3.6s -> 2s at sf0.1, 3 iters). Long
        # runs still get periodic cuts to bound planning time.
        if i > 0 and i % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
        contrib = ranks.join(edeg, ranks["node"] == edeg["src"]).select(
            F.col("dst"), F.expr("(wt * r) div deg").alias("c")
        )
        zero = nodes.select(
            F.col("node").alias("dst"), F.lit(0).cast("long").alias("c")
        )
        summed = (
            contrib.union(zero)
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .select(F.col("dst").alias("node"), "s")
        )
        if dangling:
            dm = ranks.join(dang, "node", "left_semi").agg(
                F.coalesce(F.sum("r"), F.lit(0).cast("long")).alias("dm")
            )
            summed = summed.crossJoin(F.broadcast(dm)).select(
                "node", (F.col("s") + F.expr(f"dm div {n_nodes}")).alias("s")
            )
        ranks = summed.select(
            "node",
            (base + F.expr(f"({damping_milli} * s) div 1000")).alias("r"),
        )
    return ranks.select("node", F.col("r").alias("rank_micro"))


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 3,
    damping_milli: int = 850,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Personalized PageRank — teleport to a SEED SET instead of
    uniformly (the "related to THESE items" / account-neighborhood
    ranking query; Page et al. 1999 §6 personalization vector):
    seeds start with rank 10⁶ micro and receive the (1−d) base each
    round, non-seeds start at 0 and earn rank only through walks
    from the seeds, so the scores ARE seed-proximity. Same integer
    recurrence discipline as :func:`pagerank` (pure long arithmetic,
    bit-identical in any engine / partitioning).

    Distributed shape per round: ONE shuffle — contributions union a
    zero row per node and the seed FLAG rides those zero rows, so the
    per-node base re-attaches inside the same dst-keyed agg (max of
    the flag) with no extra join; the early rounds where most ranks
    are 0 prune map-side (r > 0 filter). ``seeds`` is a 1-column
    (node) frame, broadcast. Returns (node, rank_micro, is_seed)."""
    from pyspark.storagelevel import StorageLevel

    # pinned for the same reason as pagerank's e: deg, edeg, and both
    # node-union arms re-derived the edge subtree per consumer
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edeg = e.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    flagged = nodes.join(
        F.broadcast(seeds.select(F.col("node"), F.lit(1).alias("_s"))),
        "node",
        "left",
    ).select(
        "node", F.coalesce("_s", F.lit(0)).cast("long").alias("_s")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    ranks = flagged.select(
        "node", (F.col("_s") * F.lit(1_000_000)).cast("long").alias("r")
    )
    base = (1000 - damping_milli) * 1000
    for _ in range(iters):
        contrib = (
            ranks.filter(F.col("r") > 0)
            .join(edeg, ranks["node"] == edeg["src"])
            .select(
                F.col("dst"),
                F.expr("r div deg").alias("c"),
                F.lit(0).cast("long").alias("_s"),
            )
        )
        zero = flagged.select(
            F.col("node").alias("dst"), F.lit(0).cast("long").alias("c"), "_s"
        )
        ranks = (
            contrib.union(zero)
            .groupBy("dst")
            .agg(F.sum("c").alias("s"), F.max("_s").alias("_sf"))
            .select(
                F.col("dst").alias("node"),
                (
                    F.col("_sf") * F.lit(base)
                    + F.expr(f"({damping_milli} * s) div 1000")
                ).cast("long").alias("r"),
                # the flag survives the agg, so the output needs no
                # join back to the node frame (which at 10^9 nodes
                # would be a real exchange, not a broadcast)
                F.col("_sf"),
            )
        )
    return ranks.select(
        "node",
        F.col("r").alias("rank_micro"),
        (F.col("_sf") == 1).alias("is_seed"),
    )


def customer_supplier_edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Undirected customer↔supplier trade graph from the fact tables,
    expressed as both-direction directed edges over a disjoint id
    space (customers even, suppliers odd). The edge derivation is a
    fact-fact shuffle join + distinct — itself a scale-relevant plan."""
    pairs = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("cust"),
            (F.col("l_suppkey") * 2 + 1).alias("supp"),
        )
        .distinct()
    )
    return pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst")).unionAll(
        pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    )


def q4_order_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape (adapted to the driver schema's columns):
    order-priority counts for a quarter of orders having at least one
    returned lineitem — the EXISTS correlated subquery expressed as a
    LEFT SEMI join. The semi join shuffles only the pre-filtered
    (returnflag = 'R') orderkey projection, never the full lineitem
    row; the agg is a tiny 5-group hash agg on top."""
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    returned = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        ords.join(returned, ords.o_orderkey == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q18_large_volume_customer(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, min_qty: float = 180.0
) -> DataFrame:
    """TPC-H Q18 shape: the IN-over-aggregated-subquery — orderkeys
    whose total quantity exceeds a threshold, joined back to
    customer/orders/lineitem for the report. The HAVING subquery is a
    partial-agg groupBy (map-side combine collapses each order's
    lines before the shuffle) and rejoins as a LEFT SEMI on
    orderkey; quantities are integral doubles, so the threshold
    compare and the reported sum are exact in either engine."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > min_qty)
        .select("l_orderkey")
    )
    li = lineitem.join(big, "l_orderkey", "left_semi")
    # customer stays a shuffle join: at 100 TB it is not a broadcast
    # dim; the semi-join has already shrunk the fact side, so AQE is
    # free to downgrade to broadcast when runtime sizes allow
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


def gap_fill_hourly(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Time-series resampling with forward fill — the warehouse
    gap-fill: per user, a dense hourly grid from first to last
    activity, each hour carrying the mean event value, empty hours
    forward-filled from the last observed hour (LOCF).

    Exactness: values are micro-fixed to longs before the per-hour
    mean (exact long sum + integer div) — a double AVG depends on
    partition order. The ±.5 rounding tie is engine-safe (both round
    half-away-from-zero; see functions/similarity.micro_vec).

    Distributed shape: per-hour means and per-user bounds are partial
    aggs (map-side combine); the grid EXPLODES FROM THE AGGREGATED
    bounds (one row per user → span/hour rows), never from raw
    events; the grid⋈hourly join is (user, hour)-keyed and
    AQE-splittable; the forward fill is ONE user-keyed window whose
    partitions are bounded by span hours, not event counts. Output
    hours are ISO strings (date dtype classes differ across engines).
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    vm = F.round(F.col(value_col).cast("double") * 1_000_000).cast("long")
    ev = events.select(F.col(user_col), hour.alias("h"), vm.alias("_vm"))
    hourly = ev.groupBy(user_col, "h").agg(
        F.expr("sum(_vm) div (count(1) * 1000)").alias("obs_milli")
    )
    bounds = hourly.groupBy(user_col).agg(F.min("h").alias("_h0"), F.max("h").alias("_h1"))
    grid = bounds.select(
        F.col(user_col),
        F.explode(F.sequence("_h0", "_h1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    win = (
        Window.partitionBy(user_col)
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(hourly, [user_col, "h"], "left")
        .select(
            F.col(user_col),
            F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
            F.last("obs_milli", ignorenulls=True).over(win).alias("value_milli"),
            F.col("obs_milli").isNull().alias("filled"),
        )
    )


def q10_returned_items(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, nation: DataFrame, k: int = 20
) -> DataFrame:
    """TPC-H Q10 shape: the returned-item revenue report — a quarter
    of orders joined to R-flagged lineitems and the customer/nation
    dims, grouped per customer, top-k by revenue. Both fact filters
    push to the scans; lineitem⋈orders stays a shuffle join (both
    facts at scale); nation broadcasts; customer joins AFTER the
    per-customer agg has shrunk the fact side to one row per customer
    — joining the dim pre-agg would carry c_name/c_acctbal through
    the fact shuffle for nothing. Top-k is TakeOrderedAndProject."""
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderkey", "o_custkey")
    items = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    rev = (
        items.join(ords, items.l_orderkey == ords.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return (
        rev.join(customer, rev.o_custkey == customer.c_custkey)
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(k)
    )


def ab_test(
    events: DataFrame,
    conversion_type: str = "purchase",
    min_events: int = 14,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Two-proportion z-test over an A/B split — the experiment
    readout next to the funnel/retention reports: variant = user
    parity (a deterministic stand-in for the assignment column a real
    experiment logs), conversion = the user emitted ``conversion_type``
    at least ``min_events`` times (the default 14 suits this fixture,
    where every user purchases and an at-least-once definition would
    degenerate — 100% conversion in both arms, pooled variance 0;
    callers with sparse conversion events should pass
    ``min_events=1`` for the usual at-least-once semantics).
    One row: exposures/conversions per variant,
    integer milli rates, and the pooled two-proportion z in milli.

    Determinism: all inputs to the float z are exact integers from
    distinct-count aggs; the z expression is a fixed operand-order
    IEEE computation, identical in any engine — only the final milli
    round is emitted. Distributed shape: per-user collapse is a
    user-keyed partial agg (max(converted) folds a user's events
    map-side); the final stats are a 2-row agg pivoted to one row."""
    per_user = (
        events.select(
            F.col(user_col),
            (F.col(user_col) % 2).alias("variant"),
            (F.col(type_col) == conversion_type).cast("int").alias("conv"),
        )
        .groupBy(user_col, "variant")
        .agg((F.sum("conv") >= min_events).cast("int").alias("converted"))
    )
    stats = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").alias("c"),
    )
    wide = stats.groupBy().agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("c"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("c"))).alias("c1"),
    )
    z = (
        (F.col("c1") / F.col("n1") - F.col("c0") / F.col("n0"))
        / F.sqrt(
            ((F.col("c0") + F.col("c1")) / (F.col("n0") + F.col("n1")))
            * (1 - (F.col("c0") + F.col("c1")) / (F.col("n0") + F.col("n1")))
            * (1 / F.col("n0") + 1 / F.col("n1"))
        )
    )
    return wide.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.expr("1000 * c0 div n0").alias("rate0_milli"),
        F.expr("1000 * c1 div n1").alias("rate1_milli"),
        F.round(z * 1000).cast("long").alias("z_milli"),
    )


def q17_small_quantity_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q17 shape: the correlated scalar subquery ("below 20% of
    this part's average quantity"), DECORRELATED the way Catalyst
    would — a per-part average computed once as a partial agg and
    joined back, never a per-row subquery execution. The brand filter
    broadcasts the surviving part keys; the per-part averages join
    the (brand-pruned) fact on partkey. Averages of integral-valued
    quantities are exact in IEEE (sum of integers < 2^53 / exact
    count), so the threshold compare is engine-stable."""
    brand_parts = part.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    li = lineitem.join(
        broadcast(brand_parts), lineitem.l_partkey == F.col("p_partkey")
    )
    avgs = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("_avg_qty"))
    return (
        li.join(avgs, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


def drift_psi(
    events: DataFrame,
    split_ts: str = "2024-01-16",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Population Stability Index between two time windows — the
    drift monitor an ML feature pipeline runs before retraining:
    decile bounds come from the BASELINE window's exact percentiles,
    both windows bucket against those bounds, PSI per bucket =
    (p2 − p1)·ln(p2/p1) with add-1 smoothing (a bucket emptying out
    is exactly the signal PSI must not NaN on).

    Determinism: exact interpolated percentiles (sort-based, engine-
    identical per the X8 event_percentiles precedent); bucket
    assignment is pure double compares against those bounds; PSI
    contributions are computed from exact integer counts in fixed
    operand order and fixed to MICRO longs per bucket. Distributed
    shape: the 9 bounds are a 1-row broadcast; bucket assignment is a
    narrow fold; the only shuffles are the two 10-key count aggs
    (map-side combine) and their tiny join."""
    from pyspark.sql.functions import broadcast

    w1 = events.filter(F.col(ts_col) < F.lit(split_ts))
    w2 = events.filter(F.col(ts_col) >= F.lit(split_ts))
    bounds = w1.agg(
        F.percentile(value_col, F.array(*[F.lit(i / 10.0) for i in range(1, 10)])).alias(
            "_bs"
        )
    )

    def bucketed(df: DataFrame) -> DataFrame:
        b = F.aggregate(
            "_bs",
            F.lit(0),
            lambda acc, bd: acc + F.when(F.col(value_col) > bd, 1).otherwise(0),
        )
        return (
            df.crossJoin(broadcast(bounds))
            # long, not int: the oracle's list_sum promotes to HUGEINT,
            # which pandas renders float64 against an int32 — same
            # values, dtype-class hash miss (the dtype guard catches it)
            .select(b.cast("long").alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    c1 = bucketed(w1).select("bucket", F.col("n").alias("n1"))
    c2 = bucketed(w2).select("bucket", F.col("n").alias("n2"))
    t1 = w1.agg(F.count(F.lit(1)).alias("_t1"))
    t2 = w2.agg(F.count(F.lit(1)).alias("_t2"))
    p1 = (F.col("n1") + 1) / (F.col("_t1") + 10)
    p2 = (F.col("n2") + 1) / (F.col("_t2") + 10)
    return (
        c1.join(c2, "bucket", "full")
        .select("bucket", F.coalesce("n1", F.lit(0)).alias("n1"), F.coalesce("n2", F.lit(0)).alias("n2"))
        .crossJoin(broadcast(t1))
        .crossJoin(broadcast(t2))
        .select(
            "bucket",
            "n1",
            "n2",
            F.round((p2 - p1) * F.log(p2 / p1) * 1_000_000).cast("long").alias("psi_micro"),
        )
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_event_counts(events: DataFrame) -> DataFrame:
    """PIVOT: per-user event-type counts as columns. The value list is
    EXPLICIT (the reference data's five types) — an unlisted pivot
    makes Spark run a distinct-scan pre-pass AND caps cardinality at
    spark.sql.pivotMaxValues; with literals the plan is exactly one
    user-keyed hash agg of conditional counts, map-side combined,
    identical to the CASE-WHEN SQL a warehouse would write."""
    return (
        events.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
    )


def q16_supplier_variety(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q16 shape (adapted to the driver schema): distinct
    supplier counts per part attribute group, with a negated dim
    predicate. The count-distinct runs as Spark's two-phase expand
    (partial distinct per map task before the shuffle); the part dim
    broadcasts after its filters prune it."""
    parts = part.filter(
        (F.col("p_brand") != "Brand#45") & (F.col("p_size") <= 20)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        lineitem.join(broadcast(parts), lineitem.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def user_lifetime(events: DataFrame) -> DataFrame:
    """Per-user lifetime mart — the dimension-build aggregation every
    event warehouse materializes: first/last activity, span, active
    days, event count, exact value cents. ONE user-keyed partial agg;
    active days via two-phase count distinct over (user, day)."""
    day = F.to_date("ts")
    return (
        events.groupBy("user_id")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_seen"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_seen"),
            F.datediff(F.max(day), F.min(day)).cast("long").alias("span_days"),
            F.count_distinct(day).alias("active_days"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value") * 100)).cast("long").alias("value_cents"),
        )
    )


def q19_discounted_revenue(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: the OR-of-conjunctions predicate — Catalyst
    must push the common l_quantity bounds and factor the disjunction
    rather than evaluate three scans; the part dim broadcasts and the
    residual OR evaluates post-join in one codegen stage."""
    j = lineitem.join(broadcast(part), lineitem.l_partkey == part.p_partkey)
    c1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    c2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    c3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(c1 | c2 | c3).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


def q22_global_sales_opportunity(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q22 shape (adapted): customers with above-average
    balances and no LARGE order (>450k — every synthetic customer has
    *some* order, so the plain never-ordered predicate is empty) —
    the scalar-subquery threshold (a 1-row broadcast, no driver
    action) combined with a LEFT ANTI join over the pre-filtered
    order keys, then a per-segment report agg."""
    from pyspark.sql.functions import broadcast as bc

    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg")
    )
    rich = (
        customer.crossJoin(bc(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )
    big_orders = orders.filter(F.col("o_totalprice") > 450_000).select("o_custkey")
    never_ordered = rich.join(
        big_orders, rich.c_custkey == F.col("o_custkey"), "left_anti"
    )
    return never_ordered.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


def _epoch_micros(col) -> F.Column:
    """Exact epoch microseconds, NTZ-safe: unix_micros rejects
    TIMESTAMP_NTZ (the driver session reads the testdata's
    TIMESTAMP(NANOS) as NTZ), so diff from an NTZ epoch literal after
    an NTZ cast — a no-op for NTZ inputs, the UTC wall clock for
    TIMESTAMP inputs (sessions here pin UTC), and the same number
    DuckDB's epoch_us produces either way."""
    return F.timestamp_diff(
        "MICROSECOND",
        F.expr("CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ)"),
        col.cast("timestamp_ntz"),
    )


def q13_customer_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 shape (adapted to the driver schema): the customer
    order-count distribution — how many customers placed exactly k
    (non-urgent) orders, INCLUDING the zero bucket, which is the whole
    point of the LEFT OUTER join (an inner join silently drops idle
    customers and the histogram lies about the base).

    Distributed shape: the join condition carries the o_orderpriority
    filter (pushed to the orders scan — filtering after an outer join
    would turn matched-but-filtered rows into fake zeros); per-customer
    counts partial-agg map-side on the join's customer-key exchange;
    the second agg groups the ALREADY-AGGREGATED per-customer frame
    (cardinality = |customers|) on the tiny count key."""
    joined = customer.join(
        orders,
        (customer["c_custkey"] == orders["o_custkey"])
        & (orders["o_orderpriority"] != "1-URGENT"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def q21_sole_return_supplier(
    supplier: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H Q21 shape (adapted): suppliers who were the ONLY supplier
    with a returned ('R') lineitem on a finished multi-supplier order
    — the classic EXISTS + NOT-EXISTS pair over the same fact table,
    DECORRELATED into one per-order statistics aggregate instead of
    two correlated probes per lineitem row:
      EXISTS(other supplier on the order)          ->  n_supp >= 2
      NOT EXISTS(other supplier with 'R' on it)    ->  n_supp_r = 1
    (the probing row itself has 'R', so "no OTHER R-supplier" is
    exactly one distinct R-supplier). The oracle keeps the correlated
    EXISTS/NOT-EXISTS SQL form to prove the rewrite's equivalence —
    the q17 discipline.

    Distributed shape: ONE orderkey-keyed agg over lineitem computes
    both distinct-supplier counts (two-phase count distinct, partial
    per map task); the R-rows then join it and the pre-filtered 'F'
    orderkeys on the same orderkey; supplier name attaches by
    broadcast at the end, after the fact rows have collapsed to a
    per-supplier count."""
    from pyspark.sql.functions import broadcast as bc

    ord_stats = lineitem.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_supp_r"),
    )
    finished = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    r_rows = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    waiting = (
        r_rows.join(finished, r_rows["l_orderkey"] == finished["o_orderkey"])
        .join(ord_stats, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_supp_r") == 1))
    )
    per_supp = waiting.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("numwait"))
    return per_supp.join(
        bc(supplier.select("s_suppkey", "s_name")),
        per_supp["l_suppkey"] == F.col("s_suppkey"),
    ).select("s_name", "numwait")


def moving_window_range(
    events: DataFrame,
    days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Trailing N-day per-user moving aggregate with a RANGE frame —
    the time-series smoothing shape ROWS frames cannot express (a
    user's events are irregularly spaced; "last 7 days" is a value
    range on the time axis, not a row count). Frame = (ts - (N-1)
    days, ts] inclusive of the current event, keyed on exact epoch
    MICROSECONDS so both engines bound the frame identically (casting
    to seconds would make events straddling a second boundary member
    of one engine's frame and not the other's).

    Output per event: events in window, exact cent sum, milli mean
    (integer division) — all long arithmetic. Distributed shape: ONE
    user-keyed exchange carries the range window; partitions are
    bounded by per-user volume. At 100 TB you'd bucket the window by
    (user, coarse time) first — same frame semantics per bucket with
    a boundary-overlap union, the standard stream-compaction trade."""
    from pyspark.sql import Window

    micros = _epoch_micros(F.col(ts_col))
    span = (days * 86_400_000_000) - 1  # (ts - N days, ts] inclusive
    win = (
        Window.partitionBy(user_col)
        .orderBy(F.col("ts_micros"))
        .rangeBetween(-span, 0)
    )
    cents = F.round(F.col(value_col) * 100).cast("long")
    return (
        events.select(
            F.col("event_id"),
            F.col(user_col),
            micros.alias("ts_micros"),
            cents.alias("_c"),
        )
        .select(
            "event_id",
            user_col,
            "ts_micros",
            F.count(F.lit(1)).over(win).alias("n_7d"),
            F.sum("_c").over(win).alias("sum_cents_7d"),
        )
        .withColumn("mean_cents_milli_7d", F.expr("1000 * sum_cents_7d div n_7d"))
    )


def funnel_conversion_lag(
    events: DataFrame,
    first_step: str = "signup",
    second_step: str = "purchase",
) -> DataFrame:
    """Time-to-convert distribution — the follow-up question every
    funnel report raises: of the users who did convert, HOW FAST?
    Per user: t1 = first ``first_step``, t2 = first ``second_step``
    strictly after t1 (the funnel_events chain semantics); lag =
    whole seconds (exact integer micros division). One summary row:
    converter count, min/max lag, exact interpolated quartiles
    (quantile_cont twin — the event_percentiles discipline).

    Distributed shape: one user-keyed conditional-min agg collapses
    each user's events map-side (the funnel exchange); the lag math is
    narrow; the final distribution agg is a 1-row fold over
    |converted users| rows."""
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == first_step, F.col("ts"))).alias("t1")
    )
    second = (
        events.join(per_user, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == second_step) & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).alias("t2"),
            F.any_value("t1").alias("t1"),
        )
    )
    lags = second.filter(F.col("t2").isNotNull()).select(
        F.timestamp_diff("MICROSECOND", F.col("t1"), F.col("t2")).alias("_lag_us")
    ).select(F.expr("_lag_us div 1000000").alias("lag_sec"))
    return lags.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("lag_sec").alias("min_sec"),
        F.round(F.percentile("lag_sec", F.lit(0.25)), 6).alias("p25_sec"),
        F.round(F.percentile("lag_sec", F.lit(0.5)), 6).alias("p50_sec"),
        F.round(F.percentile("lag_sec", F.lit(0.75)), 6).alias("p75_sec"),
        F.max("lag_sec").alias("max_sec"),
    )


def scd2_user_tier(events: DataFrame) -> DataFrame:
    """Slowly-changing-dimension (type 2) build from a change log —
    the warehouse move that turns an event stream into a validity-
    interval dimension table: per user, the props tier (k div 25)
    collapses into [valid_from, valid_to) intervals at change points;
    the open interval (valid_to NULL) is the current row.

    Distributed shape: change detection (lag) and interval close
    (lead over the CHANGE rows — a filter preserves partitioning, so
    the second window reuses the first's user-keyed exchange) ride one
    exchange; output is |changes| rows, far smaller than the input.
    Timestamps are exact epoch micros so the interval bounds hash
    cross-engine."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tiered = events.select(
        "user_id", "ts", "event_id", F.expr("CAST(get_json_object(props, '$.k') AS BIGINT) div 25").alias("tier")
    )
    changes = tiered.withColumn("_prev", F.lag("tier").over(w)).filter(
        F.col("_prev").isNull() | (F.col("_prev") != F.col("tier"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "tier",
        _epoch_micros(F.col("ts")).alias("valid_from_micros"),
        _epoch_micros(F.lead("ts").over(w2)).alias("valid_to_micros"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


def scd2_point_in_time(events: DataFrame) -> DataFrame:
    """Point-in-time (PIT) fact enrichment against the SCD2 tier
    dimension — THE warehouse join (every fact row reads the
    dimension attribute that was valid AT ITS OWN TIMESTAMP, not
    today's): purchases pick up the user tier in force when the
    purchase happened.

    Realization: NOT an interval join. Because SCD2 validity
    intervals partition each key's timeline, "interval containing
    ts" == "latest change <= ts" — an AS-OF join, so the union +
    carry-forward machinery (:func:`asof_join`: ONE key shuffle, no
    |facts| x |intervals-per-key| explosion) answers the PIT
    question the textbook BETWEEN-join shape cannot afford at
    100 TB. Change rows collapse to one per (user, ts) first — the
    LAST change at an instant (by event id) is the state after it —
    which also makes the carry deterministic under ties.
    Same-instant semantics are inclusive (a purchase at the exact
    change timestamp sees the NEW tier), matching DuckDB ASOF JOIN
    (the oracle)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tiered = events.select(
        "user_id", "ts", "event_id",
        F.expr(
            "CAST(get_json_object(props, '$.k') AS BIGINT) div 25"
        ).alias("tier"),
    )
    changes = tiered.withColumn("_prev", F.lag("tier").over(w)).filter(
        F.col("_prev").isNull() | (F.col("_prev") != F.col("tier"))
    )
    w_inst = Window.partitionBy("user_id", "ts").orderBy(
        F.col("event_id").desc()
    )
    per_instant = (
        changes.withColumn("_rn", F.row_number().over(w_inst))
        .filter(F.col("_rn") == 1)
        .select("user_id", "ts", "tier")
    )
    facts = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    enriched = asof_join(facts, per_instant, ["user_id"])
    return enriched.select(
        "event_id",
        "user_id",
        _epoch_micros(F.col("ts")).alias("ts_micros"),
        F.col("tier_asof").alias("tier_at_purchase"),
    )


def attribution_last_touch(
    events: DataFrame, conversion_type: str = "purchase"
) -> DataFrame:
    """Last-touch conversion attribution: every conversion event is
    credited to the user's most recent PRECEDING non-conversion event
    (the touch), with the touch type and the touch-to-conversion lag
    in whole seconds. The marketing-analytics join no equi-join
    expresses — an IGNORE NULLS last_value window over the event
    stream (the same machinery as LOCF gap-fill, pointed backwards).

    Two IGNORE NULLS windows share one user-keyed exchange and pick
    the same row by construction (identical CASE condition), so the
    (type, ts) pair stays consistent without a struct payload."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != conversion_type, F.col("event_type"))
    touch_ts = F.when(F.col("event_type") != conversion_type, F.col("ts"))
    return (
        events.select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            F.last(touch, ignorenulls=True).over(w).alias("touch_type"),
            F.last(touch_ts, ignorenulls=True).over(w).alias("_touch_ts"),
        )
        .filter(F.col("event_type") == conversion_type)
        .select(
            "event_id",
            "user_id",
            "touch_type",
            F.expr(
                "timestampdiff(MICROSECOND, _touch_ts, ts) div 1000000"
            ).alias("touch_lag_sec"),
        )
    )


def reconcile_orders_lineitems(
    orders: DataFrame, lineitem: DataFrame, tolerance_cents: int = 0
) -> DataFrame:
    """Order-vs-lineitem reconciliation — the data-quality FULL OUTER
    join every billing/warehouse pipeline runs: per orderkey, compare
    o_totalprice with the lineitem net sum; classify every key as
    matched / amount_mismatch / order_without_lineitems /
    lineitems_without_order and report counts plus the absolute cent
    discrepancy per class. Neither anti-join direction alone sees both
    orphan classes — that is what FULL OUTER is for.

    Distributed shape: lineitem collapses per orderkey FIRST (partial
    agg), so the full join carries |orders| + |distinct orderkeys|
    rows, never raw lineitems; the class report is a 4-row agg.
    Exact integer cents everywhere."""
    li = lineitem.groupBy("l_orderkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("long")
        ).alias("li_cents")
    )
    o = orders.select(
        "o_orderkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("o_cents")
    )
    joined = o.join(li, o["o_orderkey"] == li["l_orderkey"], "full_outer")
    cls = (
        F.when(F.col("o_orderkey").isNull(), F.lit("lineitems_without_order"))
        .when(F.col("l_orderkey").isNull(), F.lit("order_without_lineitems"))
        .when(
            F.abs(F.col("o_cents") - F.col("li_cents")) <= tolerance_cents,
            F.lit("matched"),
        )
        .otherwise(F.lit("amount_mismatch"))
    )
    diff = F.abs(F.coalesce("o_cents", F.lit(0)) - F.coalesce("li_cents", F.lit(0)))
    return joined.select(cls.alias("recon_class"), diff.alias("_d")).groupBy(
        "recon_class"
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("_d").alias("abs_diff_cents"),
    )


def grouping_sets_report(spark, events: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS — the lattice between ROLLUP (prefix
    hierarchy, A13) and CUBE (full 2^k, A13b): exactly the four
    groupings a dashboard wants — (type, day), (type), (day), () —
    in ONE shuffle of grouping-set-tagged partial aggs, with
    grouping_id() disambiguating NULL-as-ALL from genuine NULLs.
    Expressed in SQL because the DataFrame API exposes only
    rollup/cube; the view comes from load_tables' registration."""
    events.createOrReplaceTempView("_gs_events")
    return spark.sql(
        """
        SELECT event_type,
               date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day,
               CAST(grouping_id() AS BIGINT) AS gid,
               count(*) AS n_events,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM _gs_events
        GROUP BY GROUPING SETS (
            (event_type, date_format(date_trunc('day', ts), 'yyyy-MM-dd')),
            (event_type),
            (date_format(date_trunc('day', ts), 'yyyy-MM-dd')),
            ()
        )
        """
    )


def time_weighted_average(events: DataFrame) -> DataFrame:
    """Per-user time-weighted average value (TWAP) — the correct mean
    for irregularly sampled series (a plain avg over-weights bursts;
    monitoring and finance both weight each observation by how long it
    was current). Each event's value holds until the user's next
    event; weight = whole seconds until then; the last observation
    carries no interval and drops out (standard left-closed
    convention).

    Integer-exact: cents × seconds summed as longs, one final integer
    division to milli-cents. Magnitudes: ≤10⁵ cents × ≤2.6·10⁶ s per
    interval ≈ 2.6·10¹¹ per term — safe to ~10⁷ events per user.
    Distributed shape: ONE user-keyed exchange carries the lead window
    AND the final agg (same key, partial agg collapses map-side)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur_sec = F.expr(
        "timestampdiff(MICROSECOND, ts, _next_ts) div 1000000"
    )
    staged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("_cents"),
        F.lead("ts").over(w).alias("_next_ts"),
    ).filter(F.col("_next_ts").isNotNull())
    return (
        staged.select("user_id", "_cents", dur_sec.alias("_w"))
        .groupBy("user_id")
        .agg(
            F.sum(F.col("_cents") * F.col("_w")).alias("_num"),
            F.sum("_w").alias("total_sec"),
        )
        .filter(F.col("total_sec") > 0)
        .select(
            "user_id",
            "total_sec",
            F.expr("(_num * 1000) div total_sec").alias("twap_cents_milli"),
        )
    )


def week_over_week_users(spark, events: DataFrame) -> DataFrame:
    """INTERSECT / EXCEPT set-op shapes over weekly active-user sets —
    churn-and-retention counts (stayed, churned, new) between the
    first two ISO weeks of the window. Set ops compile to
    distinct + semi/anti joins — the ANSI operators a migrating
    analyst pastes in verbatim (the oracle keeps the literal
    INTERSECT/EXCEPT SQL).

    Scale shape (r6, found by `query lint`): the original
    `date_format(date_trunc('week', ts)) = '...'` predicate pushed
    NOTHING to parquet and the three scalar subqueries inlined each
    CTE thrice — SIX full unpushed scans. Week membership is a raw
    timestamp range (date_trunc('week') buckets are [Monday, next
    Monday) half-open intervals), which reaches the reader as a
    pushed range filter, and each weekly distinct-user set persists
    ONCE and feeds all three set ops from cache."""
    from pyspark.storagelevel import StorageLevel

    def week(start: str, end: str) -> DataFrame:
        return (
            events.filter((F.col("ts") >= F.lit(start)) & (F.col("ts") < F.lit(end)))
            .select("user_id")
            .distinct()
            .persist(StorageLevel.MEMORY_AND_DISK)
        )

    w1 = week("2024-01-01", "2024-01-08")
    w2 = week("2024-01-08", "2024-01-15")

    def count_as(df: DataFrame, cohort: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(cohort).alias("cohort"), "n_users"
        )

    return (
        count_as(w1.intersect(w2), "stayed")
        .unionAll(count_as(w1.subtract(w2), "churned"))
        .unionAll(count_as(w2.subtract(w1), "new"))
    )


def incremental_agg_merge(
    old_state: DataFrame, delta: DataFrame, key: str = "event_type"
) -> DataFrame:
    """Incremental view maintenance for an additive aggregate — the
    warehouse pattern that turns an O(history) nightly recompute into
    an O(delta) merge: yesterday's materialized (key, n, sum) state
    FULL OUTER joined with the new slice's aggregate, counters added.
    The catalog query's oracle is the DIRECT aggregate over the whole
    table, so the driver hash-check IS the proof that merge ==
    recompute (the invariant IVM lives or dies on).

    Only additive/mergeable metrics qualify: count and sum here;
    distinct-counts need sketch mergeability (see the HLL rows),
    and non-mergeable metrics (exact medians) force the recompute.
    Distributed shape: both inputs are already per-key aggregates
    (|keys| rows), so the merge join is trivially broadcastable at
    any corpus size — the whole point."""
    o = old_state.select(
        F.col(key), F.col("n_events").alias("_no"), F.col("total_cents").alias("_so")
    )
    d = delta.select(
        F.col(key), F.col("n_events").alias("_nd"), F.col("total_cents").alias("_sd")
    )
    return o.join(d, key, "full_outer").select(
        key,
        (F.coalesce("_no", F.lit(0)) + F.coalesce("_nd", F.lit(0))).alias("n_events"),
        (F.coalesce("_so", F.lit(0)) + F.coalesce("_sd", F.lit(0))).alias("total_cents"),
    )


def event_counts_state(events: DataFrame, key: str = "event_type") -> DataFrame:
    """The additive per-key aggregate state incremental_agg_merge
    maintains: exact counts + cent sums."""
    return events.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_cents"),
    )


def cdc_latest_state(
    events: DataFrame,
    key: str = "user_id",
    tombstone_type: str = "error",
) -> DataFrame:
    """Latest-row-per-key snapshot with tombstone semantics — the
    state a change stream compacts to: per key the most recent event
    (ts, then event_id) wins; a tombstone-typed winner DELETES the
    key from the snapshot."""
    w = Window.partitionBy(key).orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter(F.col("event_type") != tombstone_type)
        .select(
            key,
            "event_id",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        )
    )


def cdc_apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str = "user_id",
    tombstone_type: str = "error",
) -> DataFrame:
    """MERGE INTO / CDC upsert-apply — the keyed counterpart of
    incremental_agg_merge's additive IVM: yesterday's compacted
    snapshot plus today's change slice produce the new snapshot
    WITHOUT rereading history. Per key: the change slice's latest row
    (collapsed delta-side FIRST, so the merge join carries |delta
    keys| rows, never raw changes) upserts over the base row; a
    tombstone-typed latest change deletes the key; untouched base
    rows pass through.

    The catalog oracle is cdc_latest_state over the WHOLE table, so
    the driver hash gate proves apply(base, delta) == recompute — the
    exactly-once-compaction invariant every Delta/Iceberg-style MERGE
    relies on."""
    w = Window.partitionBy(key).orderBy(F.col("ts").desc(), F.col("event_id").desc())
    latest_change = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            key,
            F.col("event_id").alias("_c_event_id"),
            F.col("event_type").alias("_c_type"),
            F.round(F.col("value") * 100).cast("long").alias("_c_cents"),
        )
    )
    merged = base.join(latest_change, key, "full_outer")
    upserted = merged.select(
        key,
        F.coalesce("_c_event_id", "event_id").alias("event_id"),
        F.coalesce("_c_type", "event_type").alias("event_type"),
        F.coalesce("_c_cents", "value_cents").alias("value_cents"),
    )
    # a tombstone-typed winning change deletes the key (base rows are
    # already tombstone-free by construction)
    return upserted.filter(F.col("event_type") != tombstone_type)


def cumulative_distinct_users(events: DataFrame) -> DataFrame:
    """Running distinct users per day — the "cumulative uniques"
    growth curve every product dashboard wants, and a shape naive SQL
    gets catastrophically wrong (a per-day COUNT(DISTINCT) over an
    expanding window rescans history per day = O(days·events)). The
    right plan: each user collapses to their FIRST day (one user-keyed
    agg), per-day new-user counts ride a tiny |days|-row frame, and
    the running sum is a window over THOSE rows — the
    dedup-before-window discipline. Daily actives come from the same
    scan for contrast."""
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    first_seen = (
        events.select(F.col("user_id"), day.alias("_d"))
        .groupBy("user_id")
        .agg(F.min("_d").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    active = (
        events.select(day.alias("day"), "user_id")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        active.join(first_seen, "day", "left")
        .select("day", "n_active", F.coalesce("n_new", F.lit(0)).alias("n_new"))
        .withColumn("cumulative_users", F.sum("n_new").over(w))
    )


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-pass column profiling for ANY frame (the documents_profile
    catalog row generalized): per column — null count, exact distinct,
    milli average rendered length — every measure a conditional
    aggregate in ONE agg over one scan, inline-unpivoted to the
    report. N profiling queries = N full scans at 100 TB; this is
    always one. Swap count_distinct for HLL sketches at petabyte
    scale; the report shape is unchanged."""
    # every column is renamed to a positional safe name FIRST (toDF
    # is a plan-free projection), so no raw name ever reaches a
    # resolver or an expression string — a column named we`ird or
    # o'clock or dot.ted profiles fine; the original name survives
    # only as the report literal. Selection is by POSITION, not a
    # name->index dict, so duplicate column names each profile their
    # own column (one report row per position) instead of the last
    # duplicate winning twice.
    all_cols = df.columns
    safe = df.toDF(*[f"__c{j}" for j in range(len(all_cols))])
    wanted = None if cols is None else set(cols)
    picked = [
        (j, c)
        for j, c in enumerate(all_cols)
        if wanted is None or c in wanted
    ]
    if wanted is not None:
        missing = wanted - {c for _, c in picked}
        if missing:
            raise ValueError(f"profile_columns: unknown columns {sorted(missing)}")
    aggs = []
    for i, (j, c) in enumerate(picked):
        s = safe[f"__c{j}"]
        aggs += [
            F.sum(F.when(s.isNull(), 1).otherwise(0)).alias(f"__n{i}"),
            F.count_distinct(s).alias(f"__d{i}"),
            F.sum(F.length(s.cast("string"))).alias(f"__s{i}"),
        ]
    one = safe.agg(F.count(F.lit(1)).alias("__cnt"), *aggs)
    parts = [
        F.struct(
            F.lit(c).alias("col"),
            F.col(f"__n{i}").alias("n_null"),
            F.col(f"__d{i}").alias("n_distinct"),
            # integer div keeps the milli average exact at any scale
            # (a double divide drifts past 2^53 total chars)
            F.coalesce(
                F.expr(f"(__s{i} * 1000) div __cnt"), F.lit(0)
            ).alias("avg_len_milli"),
        )
        for i, (_, c) in enumerate(picked)
    ]
    return one.select(F.inline(F.array(*parts))).select(
        "col",
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("avg_len_milli").cast("long").alias("avg_len_milli"),
    )


def triangle_stats(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Exact triangle count + global clustering coefficient over an
    undirected graph (one row per unordered pair) — the cohesion
    workload (co-purchase cliques, community density) completing the
    graph family (components: dedup_clusters, ranking: pagerank).

    Algorithm: the degree-ordered edge iterator (Schank & Wagner
    2005; Cohen's MapReduce formulation 2009). Every edge orients
    from its lower (degree, id) endpoint to the higher; a triangle
    u<v<w (in that total order) is found EXACTLY once, as wedge
    u→v→w closed by oriented edge u→w. The orientation is the scale
    lever: out-degree is bounded by O(√m) on any graph (a hub's
    edges orient INTO it, so the hub never enumerates its neighbor
    pairs) — the wedge join stays near-linear where a naive
    neighbor-pairs expansion is quadratic in the hub degree.

    Distributed shape: degree attach + wedge join + closing
    LEFT-SEMI are equi-joins on edge keys (AQE-splittable); the
    oriented edge frame is persisted once and reused for all three
    roles; the readout is 1-row broadcast-scalar arithmetic.
    All-integer output (clustering coefficient in milli:
    3000·triangles div wedges, wedges = Σ d(d−1)/2)."""
    from pyspark.storagelevel import StorageLevel

    # the edge list is read three times (degrees, orientation, edge
    # count) — persist it so an expensive upstream derivation (e.g. a
    # basket-pair explode) runs ONCE, not per consumer (measured
    # 7.6 s -> ~3 s at sf0.1 on the co-purchase graph)
    e = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    und = e.select(F.col("a").alias("n")).unionAll(
        e.select(F.col("b").alias("n"))
    )
    deg = und.groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("_da"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("_db"))
    lower_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    o = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    wed = o.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).join(
        o.select(F.col("src").alias("v"), F.col("dst").alias("w")), "v"
    )
    closing = o.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    tri = wed.join(closing, ["u", "w"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges"),
    )
    ne = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        stats.crossJoin(F.broadcast(ne))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.expr(
                "3000 * n_triangles div greatest(n_wedges, 1)"
            ).alias("clustering_milli"),
        )
    )


def holt_winters_forecast(
    series: DataFrame,
    group_col: str,
    period_col: str,
    x_col: str,
    period: int = 7,
    alpha_milli: int = 300,
    beta_milli: int = 100,
    gamma_milli: int = 300,
) -> DataFrame:
    """Per-group Holt-Winters ADDITIVE triple smoothing (level +
    trend + ``period``-slot seasonal state) — holt_forecast grown a
    season: the forecast for the next step is l + t + s[next slot],
    and the seasonal amplitude max(s) - min(s) rides along as the
    one-scalar witness that the fit actually captured a cycle
    (compare events_dow_seasonality, which measures the cycle but
    cannot forecast with it).

    Same exactness contract as holt_forecast: the whole recurrence
    runs in integer MILLI units (both engines truncate integer
    division toward zero), standard zero-season init (l = x_0, t = 0,
    s = 0s; slot for step k is k mod period), so the fitted state is
    bit-identical cross-engine and under any partitioning.

    Catalyst shape: ONE ``aggregate`` fold per group, the seasonal
    array updated in place by an indexed ``transform`` — state is a
    struct carrying an array column, still a single whole-stage-
    codegen projection, no UDF, no per-step shuffle. The inlined
    l' expression (struct fields cannot reference siblings) appears
    3x instead of holt's 2x — a constant factor, once per plan."""
    a, b, g, p = alpha_milli, beta_milli, gamma_milli, period
    arr = series.groupBy(group_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(period_col), F.col(x_col)))
        ).alias("_s")
    ).select(
        group_col,
        F.expr(f"transform(_s, q -> CAST(q.{x_col} AS BIGINT))").alias(
            "_xs"
        ),
    )
    sl = f"((acc.i + 1) % {p})"
    sv = f"element_at(acc.s, CAST({sl} AS INT) + 1)"
    ln = f"(({a} * (x * 1000 - {sv}) + {1000 - a} * (acc.l + acc.t)) div 1000)"
    folded = arr.select(
        group_col,
        F.size("_xs").cast("long").alias("n_periods"),
        F.expr(
            f"""aggregate(
                slice(_xs, 2, greatest(size(_xs) - 1, 0)),
                struct(CAST(element_at(_xs, 1) * 1000 AS BIGINT) AS l,
                       CAST(0 AS BIGINT) AS t,
                       CAST(0 AS BIGINT) AS r,
                       CAST(0 AS BIGINT) AS i,
                       array_repeat(CAST(0 AS BIGINT), {p}) AS s),
                (acc, x) -> struct(
                    {ln} AS l,
                    (({b} * ({ln} - acc.l)
                      + {1000 - b} * acc.t) div 1000) AS t,
                    greatest(acc.r,
                             abs(x * 1000 - (acc.l + acc.t + {sv}))) AS r,
                    acc.i + 1 AS i,
                    transform(acc.s, (v, idx) -> IF(idx = {sl},
                        (({g} * (x * 1000 - {ln})
                          + {1000 - g} * {sv}) div 1000), v)) AS s))"""
        ).alias("_f"),
    )
    nxt = f"element_at(_f.s, CAST((_f.i + 1) % {p} AS INT) + 1)"
    return folded.select(
        group_col,
        "n_periods",
        F.col("_f.l").alias("level_milli"),
        F.col("_f.t").alias("trend_milli"),
        F.expr(f"_f.l + _f.t + {nxt}").alias("forecast_milli"),
        F.expr("array_max(_f.s) - array_min(_f.s)").alias(
            "season_amp_milli"
        ),
        F.col("_f.r").alias("max_resid_milli"),
    )


def sprt_ab(
    events: DataFrame,
    variant_col,
    success_col,
    order_cols: list[str],
    s_inc_micro: int,
    f_inc_micro: int,
    bound_micro: int,
) -> DataFrame:
    """Sequential probability ratio test (Wald 1945) per variant —
    the SEQUENTIAL member of the experimentation family (the
    fixed-horizon two-proportion z: ab_test; SPRT is the one that
    STOPS EARLY with guaranteed error rates, the always-valid way to
    peek): fold the ordered Bernoulli stream, llr += s_inc on
    success else f_inc, decide at the first crossing of
    ±bound (sticky — observations after the decision don't reopen
    it, Wald's stopping rule). The log-likelihood increments and the
    boundary arrive as INTEGER MICRO literals (the caller computes
    ln(p1/p0), ln((1−p1)/(1−p0)), ln((1−β)/α) once in Python — both
    engines consume identical constants), so the entire trajectory
    state is exact 64-bit arithmetic and hash-gates.

    Catalyst shape: the cusum_shift/holt discipline — one
    ``aggregate`` fold per variant over the sorted observation
    array; the only exchange is the variant pre-shuffle. Output per
    variant: n_obs, final llr, decision (1 accept H1, −1 accept H0,
    0 still undecided), the 1-based observation index of the
    decision, and the llr AT decision time."""
    obs = events.select(
        variant_col.alias("_variant"),
        F.struct(
            *[F.col(c) for c in order_cols], success_col.alias("_x")
        ).alias("_o"),
    )
    arr = obs.groupBy("_variant").agg(
        F.sort_array(F.collect_list("_o")).alias("_s")
    ).select(
        "_variant",
        F.expr("transform(_s, q -> CAST(q._x AS BIGINT))").alias("_xs"),
    )
    llr = f"(acc.llr + CASE WHEN x = 1 THEN {s_inc_micro} ELSE {f_inc_micro} END)"
    crossed = f"(({llr}) >= {bound_micro} OR ({llr}) <= -{bound_micro})"
    folded = arr.select(
        F.col("_variant").alias("variant"),
        F.size("_xs").cast("long").alias("n_obs"),
        F.expr(
            f"""aggregate(
                _xs,
                struct(CAST(0 AS BIGINT) AS llr, CAST(0 AS BIGINT) AS dec,
                       CAST(0 AS BIGINT) AS at, CAST(0 AS BIGINT) AS dllr,
                       CAST(0 AS BIGINT) AS i),
                (acc, x) -> struct(
                    {llr} AS llr,
                    CASE WHEN acc.dec <> 0 THEN acc.dec
                         WHEN ({llr}) >= {bound_micro} THEN CAST(1 AS BIGINT)
                         WHEN ({llr}) <= -{bound_micro} THEN CAST(-1 AS BIGINT)
                         ELSE CAST(0 AS BIGINT) END AS dec,
                    CASE WHEN acc.dec = 0 AND {crossed}
                         THEN acc.i + 1 ELSE acc.at END AS at,
                    CASE WHEN acc.dec = 0 AND {crossed}
                         THEN {llr} ELSE acc.dllr END AS dllr,
                    acc.i + 1 AS i))"""
        ).alias("_f"),
    )
    return folded.select(
        "variant",
        "n_obs",
        F.col("_f.llr").alias("final_llr_micro"),
        F.col("_f.dec").alias("decision"),
        F.col("_f.at").alias("decided_at_obs"),
        F.col("_f.dllr").alias("llr_at_decision_micro"),
    )


def gini_concentration(
    df: DataFrame, value_col: str = "x", id_col: str = "user_id"
) -> DataFrame:
    """Gini coefficient + top-decile share of a per-key value frame —
    the CONCENTRATION profile (spend inequality, traffic-per-key
    skew): the same number that tells a revenue analyst "whales" and
    a pipeline engineer "salt this key" (a Gini near 1 on
    bytes-per-key IS the skew_report warning, condensed to one row).

    Exactness: with x in integer units and rank i from a total order
    (value, id), Gini = (2·Σi·x − (n+1)·Σx) / (n·Σx) — every term an
    integer; the Σi·x and n·Σx products are carried in DECIMAL(38,0)
    (Spark) / HUGEINT (DuckDB) because at n ~ 10⁹ keys they overflow
    int64 — the milli readout casts back down. Small-n convention:
    with n < 10 keys the "top decile" is the single top key
    (greatest(n div 10, 1)), so top_decile_share_milli is never a
    silent NULL from an empty slice. The rank over the PER-KEY frame
    (aggregated first: |keys| ≪ |events|) is the r12 two-pass global
    rank (plans/ranks.py — range shuffle + broadcast partition-count
    model), so no single task ever holds the key frame even at 10⁹
    keys; two scalar aggs follow."""
    from logprep_spark.plans.ranks import with_global_rank

    # r12: the (value, id) rank rides the two-pass global rank
    # (plans/ranks.py) instead of a partition-less window — same
    # values (bit-parity pytest in tests/unit/test_global_rank.py's
    # module family), no single-task sort even at 10⁹ keys
    ranked, _n = with_global_rank(
        df.select(F.col(value_col).alias("_x"), F.col(id_col).alias("_id")),
        [F.col("_x"), F.col("_id")],
        rank_col="_i",
    )
    d38 = "decimal(38,0)"
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").cast(d38).alias("_tot"),
        F.sum(F.col("_i").cast(d38) * F.col("_x").cast(d38)).alias("_ix"),
    )
    # small-n convention: with n < 10 keys the "top decile" is the
    # single top key (greatest(n div 10, 1)) — never an empty slice
    # whose sum would surface as a silent NULL milli readout
    top = (
        ranked.crossJoin(F.broadcast(agg.select("n")))
        .filter(F.col("_i") > F.col("n") - F.expr("greatest(n div 10, 1)"))
        .agg(
            F.coalesce(
                F.sum("_x").cast(d38), F.lit(0).cast(d38)
            ).alias("_top")
        )
    )
    return (
        agg.crossJoin(F.broadcast(top))
        .select(
            F.col("n").alias("n_keys"),
            F.col("_tot").cast("long").alias("total_units"),
            F.expr(
                "CAST((1000 * (2 * _ix - (n + 1) * _tot))"
                " div (n * _tot) AS BIGINT)"
            ).alias("gini_milli"),
            F.expr("CAST(1000 * _top div _tot AS BIGINT)").alias(
                "top_decile_share_milli"
            ),
        )
    )


def isotonic_pools(
    bins: DataFrame,
    bin_col: str = "bin",
    pos_col: str = "s",
    n_col: str = "n",
    passes: int = 6,
) -> DataFrame:
    """Isotonic regression by pool-adjacent-violators (Ayer et al.
    1955 / Barlow-Brunk PAVA) over an ordered bin frame — the REPAIR
    for what the reliability diagram measures: the monotone rate fit
    that recalibrates a sharp-but-miscalibrated classifier (pools
    replace each decreasing run with its pooled rate; the result is
    the closest monotone fit in L2, the textbook guarantee).

    Realization: repeated LEFT-SCAN passes, each ONE Catalyst
    ``aggregate`` whose accumulator is the flat pool array —
    scan the pairs, merge into the last pool while its rate exceeds
    the incomer's (violation tested by integer CROSS-MULTIPLICATION:
    s_last·n > s·n_last — no rational means, ever). A single pass
    can leave violations to its left, so ``passes`` fixed rounds run
    (n-pass worst case; the measured data converges in 2) with the
    kcore-family ``converged`` witness (pass P == pass P−1) emitted
    on every row. Bin cardinality (~10) bounds everything after the
    one grouped count."""
    merge = (
        "CASE WHEN size(acc) = 0 THEN e"
        " WHEN element_at(acc, size(acc) - 1) * element_at(e, 2)"
        " > element_at(e, 1) * element_at(acc, size(acc))"
        " THEN concat(slice(acc, 1, size(acc) - 2),"
        " array(element_at(acc, size(acc) - 1) + element_at(e, 1),"
        " element_at(acc, size(acc)) + element_at(e, 2)))"
        " ELSE concat(acc, e) END"
    )
    one_pass = (
        "aggregate(transform(sequence(1, CAST(size({p}) div 2 AS INT)),"
        " i -> array(element_at({p}, 2 * i - 1),"
        " element_at({p}, 2 * i))),"
        " CAST(array() AS array<bigint>), (acc, e) -> " + merge + ")"
    )
    cur = bins.groupBy().agg(
        F.expr(
            f"flatten(transform(sort_array(collect_list(struct("
            f"{bin_col}, {pos_col}, {n_col}))),"
            f" q -> array(CAST(q.{pos_col} AS BIGINT),"
            f" CAST(q.{n_col} AS BIGINT))))"
        ).alias("_p0")
    )
    for r in range(1, passes + 1):
        cur = cur.withColumn(
            f"_p{r}", F.expr(one_pass.format(p=f"_p{r - 1}"))
        )
    last, prev = f"_p{passes}", f"_p{passes - 1}"
    return cur.select(
        F.posexplode(
            F.expr(
                f"transform(sequence(1, CAST(size({last}) div 2 AS INT)),"
                f" i -> struct(element_at({last}, 2 * i - 1) AS s,"
                f" element_at({last}, 2 * i) AS n))"
            )
        ).alias("_i", "_e"),
        (F.col(last) == F.col(prev)).alias("converged"),
    ).select(
        (F.col("_i") + 1).cast("long").alias("pool"),
        F.col("_e.n").alias("n_docs"),
        F.col("_e.s").alias("n_pos"),
        F.expr("1000 * _e.s div _e.n").alias("iso_rate_milli"),
        "converged",
    )


def cuped_adjusted_means(
    per_user: DataFrame,
    variant_col: str = "variant",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """CUPED variance reduction (Deng et al. WSDM 2013) — the
    experimentation-family member every modern A/B platform runs
    before the significance test: adjust the metric by the
    PRE-period covariate, y' = y − θ(x − x̄), θ = cov(x,y)/var(x);
    the variance shrinks by ρ² (reported as var_reduction_milli —
    the fraction of the experiment you no longer have to run).

    Exactness: all five moments (Σx, Σy, Σx², Σxy, Σy²) are exact
    integer sums over integer-unit inputs; θ and the adjusted means
    touch doubles only in the final readout, built from those exact
    integers with ORACLE-IDENTICAL term structure, floor-milli'd.
    Overflow: Σx² at 10⁹ users of 10⁶-unit spend needs
    DECIMAL(38,0) — the gini discipline, noted before it bites.

    Output one row per variant: n, raw mean, ADJUSTED mean (the
    number to run the t/z test on), with θ and the reduction
    alongside. Shape: one per-user pre-agg, one 5-moment global agg
    (map-side combining), one per-variant agg, broadcast readout."""
    m = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x_col).cast("long").alias("sx"),
        F.sum(y_col).cast("long").alias("sy"),
        F.sum(F.col(x_col) * F.col(x_col)).cast("long").alias("sxx"),
        F.sum(F.col(x_col) * F.col(y_col)).cast("long").alias("sxy"),
        F.sum(F.col(y_col) * F.col(y_col)).cast("long").alias("syy"),
    )
    v = per_user.groupBy(variant_col).agg(
        F.count(F.lit(1)).alias("nv"),
        F.sum(x_col).cast("long").alias("sxv"),
        F.sum(y_col).cast("long").alias("syv"),
    )
    return v.crossJoin(F.broadcast(m)).select(
        F.col(variant_col).alias("variant"),
        F.col("nv").alias("n_users"),
        F.expr("1000 * syv div nv").alias("mean_y_micro"),
        F.expr(
            "CAST(floor(1000.0 * syv / nv"
            " - (1.0 * (n * sxy - sx * sy)"
            " / greatest(n * sxx - sx * sx, 1))"
            " * (1000.0 * sxv / nv - 1000.0 * sx / n)) AS BIGINT)"
        ).alias("mean_adj_micro"),
        F.expr(
            "CAST(floor(1000000.0 * (n * sxy - sx * sy)"
            " / greatest(n * sxx - sx * sx, 1)) AS BIGINT)"
        ).alias("theta_micro"),
        F.expr(
            "CAST(floor(1000.0 * (n * sxy - sx * sy)"
            " * (n * sxy - sx * sy)"
            " / (greatest(CAST(n * sxx - sx * sx AS DOUBLE), 1.0d)"
            " * greatest(CAST(n * syy - sy * sy AS DOUBLE), 1.0d)))"
            " AS BIGINT)"
        ).alias("var_reduction_milli"),
    )


def chi_square_cells(
    df: DataFrame, row_col: str, col_col: str, densify: bool = False
) -> DataFrame:
    """Chi-square contingency cells for a two-way categorical table —
    the INDEPENDENCE member of the experimentation family (is event
    MIX independent of variant?): per cell the observed count, the
    milli expected count under independence (r·c/N exact to milli),
    and the cell's chi-square contribution in micro —
    (O·N − r·c)²/(N·r·c), one floor on a double built from exact
    integers, identical in both engines. Σ contributions = the chi²
    statistic; cells are emitted (not just the sum) because the
    CONTRIBUTIONS are the diagnosis — they point at which cell
    drives the dependence. Caveat, stated: cells with ZERO observed
    count emit no row (a groupBy cannot see them), so the summed
    statistic under-counts tables with structural zeros —
    ``densify=True`` closes it: the cell table becomes the full
    |R|×|C| domain cross (both sides bounded label-domain frames; the
    cross is a broadcast of the column domain, never corpus-sized)
    with absent cells at observed = 0, whose contribution is the
    textbook E = r·c/N term the sparse form drops. Margins are
    unchanged (zero cells add nothing to them). Zero-cell caveat
    applies only when BOTH labels appear somewhere — a label absent
    from the data entirely is absent from the domain too.
    Overflow: the margin products 1000·r·c and o·N − r·c are carried
    in DECIMAL(38,0) (the gini_concentration discipline) — at the
    100 TB scale margins reach ~5e10 and 1000·r·c would wrap int64.
    Shape: one grouped count + three window sums over the |R|x|C|
    TABLE (never the raw rows)."""
    tab = df.groupBy(row_col, col_col).agg(
        F.count(F.lit(1)).alias("o")
    )
    if densify:
        dense = (
            tab.select(row_col)
            .distinct()
            .crossJoin(broadcast(tab.select(col_col).distinct()))
        )
        tab = dense.join(tab, [row_col, col_col], "left").select(
            row_col,
            col_col,
            F.coalesce("o", F.lit(0)).alias("o"),
        )
    wr = Window.partitionBy(row_col)
    wc = Window.partitionBy(col_col)
    wall = Window.partitionBy()
    m = tab.select(
        row_col,
        col_col,
        "o",
        F.sum("o").over(wr).cast("decimal(38,0)").alias("_r"),
        F.sum("o").over(wc).cast("decimal(38,0)").alias("_c"),
        F.sum("o").over(wall).cast("decimal(38,0)").alias("_nn"),
    )
    return m.select(
        row_col,
        col_col,
        F.col("o").alias("observed"),
        F.expr("CAST(1000 * _r * _c div _nn AS BIGINT)").alias(
            "expected_milli"
        ),
        F.expr(
            "CAST(floor(1000000.0"
            " * CAST(o * _nn - _r * _c AS DOUBLE)"
            " * CAST(o * _nn - _r * _c AS DOUBLE)"
            " / CAST(_nn * _r * _c AS DOUBLE)) AS BIGINT)"
        ).alias("chi_contrib_micro"),
    )


def mann_whitney_u(
    obs: DataFrame, value_col: str = "vm", variant_col: str = "variant"
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) two-sample test — the
    NONPARAMETRIC member of the experimentation family (the
    two-proportion z tests a rate, SPRT stops early on a rate; this
    tests whether one variant's VALUE DISTRIBUTION is stochastically
    larger, immune to outliers and any monotone transform): midranks
    with ties carried as 2x-INTEGER ranks (2·avgrank of a tie group
    = 2·rank_before + cnt + 1 — no rationals), U doubled likewise
    (u_times_2 = ΣR1_2x − n1(n1+1)), the rank-biserial effect size
    in integer milli, and the tie-CORRECTED normal z in milli (the
    one sqrt, computed from exact integer moments identically in
    both engines, floor-milli'd).

    Catalyst shape: one tally agg on the (already integer-quantized)
    value, then the two-pass running sum (plans/ranks.py
    with_running_sums — range shuffle + broadcast partition-offset
    model) for the before-rank prefix, then a 1-row readout —
    rank-sum at any scale without ever sorting the raw rows AND
    without a partition-less window: the r12 verdict flagged that a
    continuous metric's distinct-value tally can approach row
    cardinality at 100×, so the cumulative pass must not funnel
    through one task.

    Eager: the running-sum pass executes Spark jobs at CONSTRUCTION
    time and snapshots the tally (plans/ranks.py eager-execution
    contract) — call once per source snapshot; rebuilding the frame
    re-runs the upstream."""
    from logprep_spark.plans.ranks import with_running_sums

    tally = obs.groupBy(value_col).agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum((F.col(variant_col) == 1).cast("long")).alias("_c1"),
    )
    cum, _tot = with_running_sums(
        tally, [F.col(value_col)], [("_cum", "_cnt")]
    )
    # exclusive prefix (rows strictly before this value) = inclusive
    # cumulative minus the value's own tally
    ranked = cum.withColumn(
        "_rb", (F.col("_cum") - F.col("_cnt")).cast("long")
    )
    agg = ranked.agg(
        F.sum("_cnt").cast("long").alias("_nn"),
        F.sum("_c1").cast("long").alias("_n1"),
        F.sum(
            F.col("_c1") * (2 * F.col("_rb") + F.col("_cnt") + 1)
        ).cast("long").alias("_r1"),
        F.sum(
            F.col("_cnt") * F.col("_cnt") * F.col("_cnt") - F.col("_cnt")
        ).cast("long").alias("_ties"),
    )
    return agg.select(
        (F.col("_nn") - F.col("_n1")).alias("n0"),
        F.col("_n1").alias("n1"),
        F.expr("_r1 - _n1 * (_n1 + 1)").alias("u_times_2"),
        F.expr(
            "(1000 * (_r1 - _n1 * (_n1 + 1)) - 1000 * (_nn - _n1) * _n1)"
            " div ((_nn - _n1) * _n1)"
        ).alias("rank_biserial_milli"),
        F.expr(
            "CASE WHEN _ties = _nn * _nn * _nn - _nn THEN CAST(0 AS BIGINT)"
            " ELSE CAST(floor(1000.0 * ((_r1 - _n1 * (_n1 + 1))"
            " - (_nn - _n1) * _n1)"
            " / (2.0 * sqrt((_nn - _n1) * _n1 / 12.0"
            " * ((_nn + 1) - _ties * 1.0 / (_nn * (_nn - 1))))))"
            " AS BIGINT) END"
        ).alias("z_milli"),
    )


def ks_two_sample(
    obs: DataFrame, value_col: str = "vm", variant_col: str = "variant"
) -> DataFrame:
    """Kolmogorov-Smirnov two-sample test — the DISTRIBUTION-SHAPE
    member of the experimentation family (the z test compares a rate,
    Mann-Whitney asks "stochastically larger"; KS asks whether the two
    samples come from the SAME distribution at all, sensitive to any
    difference — location, spread, shape): D = max_x |F0(x) − F1(x)|
    over the pooled empirical CDFs.

    Exactness: per distinct value, |cum0·n1 − cum1·n0| is the CDF gap
    CROSS-MULTIPLIED to an integer (no float CDF ever forms), carried
    in DECIMAL(38,0) — at multi-billion-row samples n0·n1 exceeds
    int64 and a BIGINT gap would wrap silently under non-ANSI mode
    (r12 advice; the DuckDB oracle mirrors with HUGEINT);
    ``ks_scaled`` = the max of that (D = ks_scaled / (n0·n1)), read
    out as BIGINT (diagnostic; the scale-safe readouts are d_milli
    and reject_05, whose products stay in DECIMAL(38,0) end-to-end),
    ``d_milli`` the truncated milli D, ``at_vm`` the smallest value
    attaining the max. The α=0.05 decision uses the large-sample
    critical value c(α)² = ln(2/α)/2, i.e. c(0.05)²·10⁶ =
    ln(40)/2·10⁶ = 1844439.73 → 1844440 (rounded to the integer
    micro constant; r12 advice corrected the earlier transposed-digit
    1844324): D > c·sqrt((n0+n1)/(n0·n1)), squared to the integer
    comparison d_milli²·n0·n1 > 1844440·(n0+n1) — evaluated on the
    milli-TRUNCATED D (convention stated: the boundary moves by < one
    milli unit, identically in both engines).

    Catalyst shape: one value tally (map-side combine), then the
    two-pass running sum (plans/ranks.py with_running_sums — range
    shuffle + broadcast partition-offset model; the r12 verdict
    de-globalization: a continuous metric's distinct tally can
    approach row cardinality at 100×, so no partition-less window)
    for both CDFs at once — n0/n1 fall out of its offset model as
    driver literals, saving the totals pass — + a broadcast 1-row
    readout. Eager: that pass runs Spark jobs at CONSTRUCTION time
    and snapshots the tally (plans/ranks.py eager-execution
    contract) — call once per source snapshot."""
    from logprep_spark.plans.ranks import with_running_sums

    tally = obs.groupBy(value_col).agg(
        F.sum((F.col(variant_col) == 0).cast("long")).alias("_c0"),
        F.sum((F.col(variant_col) == 1).cast("long")).alias("_c1"),
    )
    cum, totals = with_running_sums(
        tally,
        [F.col(value_col)],
        [("_f0", "_c0"), ("_f1", "_c1")],
    )
    n0, n1 = totals["_f0"], totals["_f1"]
    d38 = "decimal(38,0)"
    diff = cum.select(
        F.col(value_col).alias("_v"),
        F.abs(
            F.col("_f0").cast(d38) * F.lit(n1).cast(d38)
            - F.col("_f1").cast(d38) * F.lit(n0).cast(d38)
        ).cast(d38).alias("_d"),
    )
    peak = diff.agg(F.max("_d").alias("_dmax"))
    at = (
        diff.crossJoin(F.broadcast(peak))
        .filter(F.col("_d") == F.col("_dmax"))
        .agg(F.min("_v").cast("long").alias("at_vm"))
    )
    return (
        peak.crossJoin(F.broadcast(at))
        .select(
            F.lit(n0).cast("long").alias("n0"),
            F.lit(n1).cast("long").alias("n1"),
            F.col("_dmax").cast("long").alias("ks_scaled"),
            "at_vm",
            # 1000·_dmax stays DECIMAL(38,0); decimal div yields a
            # BIGINT milli D (≤ 1000, no wrap possible)
            F.expr(
                f"1000 * _dmax div CAST({n0 * n1} AS DECIMAL(38,0))"
            ).alias("d_milli"),
            F.expr(
                f"CAST(1000 * _dmax div CAST({n0 * n1} AS DECIMAL(38,0))"
                " AS DECIMAL(38,0))"
                f" * CAST(1000 * _dmax div CAST({n0 * n1} AS DECIMAL(38,0))"
                " AS DECIMAL(38,0))"
                f" * CAST({n0} AS DECIMAL(38,0)) * CAST({n1} AS DECIMAL(38,0))"
                " > CAST(1844440 AS DECIMAL(38,0))"
                f" * CAST({n0 + n1} AS DECIMAL(38,0))"
            ).alias("reject_05"),
        )
    )


def km_survival(
    obs: DataFrame, t_col: str = "t", event_col: str = "event"
) -> DataFrame:
    """Kaplan-Meier survival estimator with right-censoring (Kaplan
    & Meier 1958) — the time-to-event member of the analytics family
    (retention counts cohorts at fixed lags; KM answers "what
    fraction survives past t" when many subjects are still censored,
    the statistically honest way): S(t) = Π_{t_i <= t}
    (1 − d_i/r_i) over EVENT times, where r_i counts every
    observation (event or censored) with T >= t_i.

    Exactness: the product is folded stepwise in integer MICRO —
    S' = (S·(r_i − d_i)) div r_i, truncating — so the whole curve is
    bit-identical cross-engine (a float product is not
    associativity-safe under reordering); at_risk comes from one
    descending cumulative sum over the per-t tally.

    Catalyst shape: tally agg (|distinct t| rows), one window for
    at_risk, one sorted collect, then ONE ``aggregate`` whose
    accumulator CARRIES THE CURVE (struct of running S + the
    emitted array) — the holt-family fold grown an output tape;
    explode at the end. Event-time cardinality, not row cardinality,
    bounds every post-tally step."""
    tidy = obs.groupBy(t_col).agg(
        F.sum(F.col(event_col).cast("long")).alias("_d"),
        F.count(F.lit(1)).alias("_ending"),
    )
    w = Window.orderBy(F.col(t_col).desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = tidy.withColumn(
        "_r", F.sum("_ending").over(w).cast("long")
    ).filter(F.col("_d") > 0)
    arr = risk.groupBy().agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(t_col).cast("long").alias("t"), "_d", "_r"
                )
            )
        ).alias("_s")
    )
    folded = arr.select(
        F.expr(
            """aggregate(
                _s,
                struct(CAST(1000000 AS BIGINT) AS s,
                       CAST(array() AS
                            array<struct<t:bigint,d:bigint,r:bigint,
                                         sv:bigint>>) AS out),
                (acc, e) -> struct(
                    (acc.s * (e._r - e._d)) div e._r AS s,
                    array_append(acc.out,
                        struct(e.t AS t, e._d AS d, e._r AS r,
                               (acc.s * (e._r - e._d)) div e._r AS sv))
                        AS out))"""
        ).alias("_f")
    )
    return folded.select(F.explode("_f.out").alias("_o")).select(
        F.col("_o.t").alias("t"),
        F.col("_o.r").alias("at_risk"),
        F.col("_o.d").alias("n_events"),
        F.col("_o.sv").alias("surv_micro"),
    )


def mann_kendall_trend(
    series: DataFrame,
    group_col: str,
    period_col: str,
    y_col: str,
) -> DataFrame:
    """Mann-Kendall monotonic-trend TEST per group (Mann 1945;
    Kendall 1975) — Theil-Sen's significance twin (theil_sen_trend
    gives the robust slope MAGNITUDE; this answers whether a
    monotonic trend exists at all, distribution-free — the pairing
    every hydrology/ops-monitoring handbook prescribes):
    S = Σ_{i<j} sign(y_j − y_i), and the tie-corrected variance
    18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) over tie groups of
    size t, with the continuity-corrected normal approximation
    z = (S − sign(S)) / √Var.

    Exactness: S and 18·Var are EXACT integers (in-array pair signs
    and tie multiplicities — no float until the final z, whose one
    double chain on exact ints is identical cross-engine and rounds
    to milli). ``trend`` calls it at the 5% two-sided level
    (|z| ≥ 1.96). All-tied series (Var = 0) read z = 0 / no_trend
    rather than dividing by zero.

    Catalyst shape: the theil_sen array discipline — one sorted
    collect per group, then the n(n−1)/2 pair signs, tie counts, and
    the z all inside ONE projection; pre-aggregate multi-year series
    to weeks before folding. Returns
    (group, n_periods, s_stat, var_s18, z_milli, trend)."""
    arr = series.groupBy(group_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(period_col), F.col(y_col)))
        ).alias("_s")
    ).select(
        group_col,
        F.expr(f"transform(_s, q -> CAST(q.{y_col} AS BIGINT))").alias(
            "_ys"
        ),
    ).select(
        group_col, "_ys", F.size("_ys").cast("long").alias("_n")
    ).filter(F.col("_n") >= 2)
    s_expr = (
        "aggregate(flatten(transform(sequence(1, CAST(_n - 1 AS INT)),"
        " i -> transform(sequence(i + 1, CAST(_n AS INT)),"
        " j -> CASE WHEN element_at(_ys, j) > element_at(_ys, i)"
        " THEN 1 WHEN element_at(_ys, j) < element_at(_ys, i)"
        " THEN -1 ELSE 0 END))),"
        " CAST(0 AS BIGINT), (a, x) -> a + x)"
    )
    ties = (
        "aggregate(transform(array_distinct(_ys),"
        " v -> CAST(size(filter(_ys, y -> y = v)) AS BIGINT)),"
        " CAST(0 AS BIGINT), (a, t) -> a + t * (t - 1) * (2 * t + 5))"
    )
    staged = arr.select(
        group_col,
        F.col("_n").alias("n_periods"),
        F.expr(s_expr).alias("s_stat"),
        (
            F.col("_n") * (F.col("_n") - 1) * (2 * F.col("_n") + 5)
            - F.expr(ties)
        ).alias("var_s18"),
    )
    cc = (
        "CASE WHEN s_stat > 0 THEN s_stat - 1"
        " WHEN s_stat < 0 THEN s_stat + 1 ELSE 0 END"
    )
    z = (
        f"CASE WHEN var_s18 <= 0 THEN CAST(0 AS BIGINT)"
        f" ELSE CAST(round({cc} / sqrt(var_s18 / 18.0) * 1000)"
        f" AS BIGINT) END"
    )
    return staged.select(
        group_col,
        "n_periods",
        "s_stat",
        "var_s18",
        F.expr(z).alias("z_milli"),
        F.expr(
            f"CASE WHEN {z} >= 1960 THEN 'increasing'"
            f" WHEN {z} <= -1960 THEN 'decreasing'"
            " ELSE 'no_trend' END"
        ).alias("trend"),
    )


def theil_sen_trend(
    series: DataFrame,
    group_col: str,
    period_col: str,
    y_col: str,
) -> DataFrame:
    """Theil-Sen robust slope per group, side by side with the
    closed-form least-squares slope — the ROBUST member of the trend
    family (A62's LS slope has breakdown point 0: one bad day drags
    it anywhere; the median of pairwise slopes survives ~29%
    contamination). On this data the two genuinely disagree (view:
    TS negative, LS positive — the outlier influence, visible).

    Exactness: y in integer milli units, x the 1-based rank of the
    period; per pair, slope_micro = (1e6·Δy) div Δx (truncating —
    both engines); the MEDIAN is element (m+1) div 2 of the sorted
    slope array (lower-middle convention, deterministic); LS is the
    all-integer closed form (1e6·(nΣxy−ΣxΣy)) div (nΣx²−(Σx)²).
    Everything hash-gates.

    Catalyst shape: one sorted collect per group, then pair slopes +
    sort + median + LS moments ALL inside one projection (n days →
    n(n−1)/2 in-array slopes; at n=365 that is 66k array cells per
    group — fine; for multi-year series pre-aggregate to weeks, the
    array discipline of the holt family)."""
    arr = series.groupBy(group_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(period_col), F.col(y_col)))
        ).alias("_s")
    ).select(
        group_col,
        F.expr(f"transform(_s, q -> CAST(q.{y_col} AS BIGINT))").alias(
            "_ys"
        ),
    ).select(
        group_col, "_ys", F.size("_ys").cast("long").alias("_n")
    ).filter(F.col("_n") >= 2)
    slopes = (
        "array_sort(flatten(transform(sequence(1, CAST(_n - 1 AS INT)),"
        " i -> transform(sequence(i + 1, CAST(_n AS INT)),"
        " j -> (1000000 * (element_at(_ys, j) - element_at(_ys, i)))"
        " div (j - i)))))"
    )
    staged = arr.select(
        group_col,
        "_ys",
        "_n",
        F.expr(slopes).alias("_sl"),
        F.expr(
            "aggregate(sequence(1, CAST(_n AS INT)), CAST(0 AS BIGINT),"
            " (a, i) -> a + i * element_at(_ys, i))"
        ).alias("_sxy"),
        F.expr(
            "aggregate(_ys, CAST(0 AS BIGINT), (a, y) -> a + y)"
        ).alias("_sy"),
    )
    return staged.select(
        group_col,
        F.col("_n").alias("n_periods"),
        F.size("_sl").cast("long").alias("n_pairs"),
        F.expr(
            "element_at(_sl, CAST((size(_sl) + 1) div 2 AS INT))"
        ).alias("ts_slope_micro"),
        F.expr(
            "(1000000 * (_n * _sxy - (_n * (_n + 1) div 2) * _sy))"
            " div (_n * (_n * (_n + 1) * (2 * _n + 1) div 6)"
            " - (_n * (_n + 1) div 2) * (_n * (_n + 1) div 2))"
        ).alias("ls_slope_micro"),
    )


def acf_lags(
    series: DataFrame,
    period_col: str,
    x_col: str,
    max_lag: int = 14,
    group_col: str | None = None,
) -> DataFrame:
    """Integer-EXACT autocorrelation function over an ordered series
    — the periodicity SCANNER of the time-series family (the dow
    row measures a cycle you already suspect; ACF finds which lag to
    suspect): for each lag k, the centered products are computed
    WITHOUT a rational mean via the n-scaling identity
    Σ(n·x_t − S)(n·x_{t+k} − S) / Σ(n·x_t − S)² (S = Σx) — every
    term 64-bit integer, acf_milli = the 1000-scaled truncating
    quotient, so the whole correlogram hash-gates cross-engine
    (a float ACF's summation order does not). Magnitudes: |n·x − S|
    <= n·max|x|; products n²·max|x|² — at 10⁶ periods of counts
    ~10⁶ this overflows int64: pre-aggregate to coarser periods or
    demote units first (same discipline as gini_concentration,
    written down before it bites).

    Catalyst shape: one sorted collect per group (the holt family's
    array fold), then max_lag `aggregate` expressions in ONE
    projection — no self-join per lag, no shuffle beyond the
    grouping pre-agg."""
    gcol = group_col or "_g"
    base = series if group_col else series.withColumn(gcol, F.lit(1))
    arr = base.groupBy(gcol).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(period_col), F.col(x_col)))
        ).alias("_s")
    ).select(
        gcol,
        F.expr(f"transform(_s, q -> CAST(q.{x_col} AS BIGINT))").alias(
            "_xs"
        ),
    ).select(
        gcol,
        "_xs",
        F.size("_xs").cast("long").alias("_n"),
        F.expr(
            "aggregate(_xs, CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("_sum"),
    )
    den = (
        "aggregate(sequence(1, CAST(_n AS INT)), CAST(0 AS BIGINT),"
        " (a, i) -> a + (_n * element_at(_xs, i) - _sum)"
        " * (_n * element_at(_xs, i) - _sum))"
    )
    def num(k: int) -> str:
        return (
            f"aggregate(sequence(1, CAST(_n - {k} AS INT)),"
            f" CAST(0 AS BIGINT),"
            f" (a, i) -> a + (_n * element_at(_xs, i) - _sum)"
            f" * (_n * element_at(_xs, i + {k}) - _sum))"
        )
    pairs = ", ".join(
        f"struct(CAST({k} AS BIGINT) AS lag,"
        f" 1000 * ({num(k)}) div ({den}) AS acf_milli)"
        for k in range(1, max_lag + 1)
    )
    out = arr.filter(F.col("_n") > max_lag).select(
        gcol, F.explode(F.expr(f"array({pairs})")).alias("_l")
    ).select(
        gcol,
        F.col("_l.lag").alias("lag"),
        F.col("_l.acf_milli").alias("acf_milli"),
    )
    return out.drop("_g") if not group_col else out


def cusum_shift(
    series: DataFrame,
    group_col: str,
    period_col: str,
    x_col: str,
    baseline_periods: int = 7,
) -> DataFrame:
    """Two-sided CUSUM level-shift detector (Page 1954) per group —
    the CHANGE-POINT member of the time-series family (outliers:
    MAD flags single points, forecast: Holt/HW track smoothly; CUSUM
    is the one that catches a small PERSISTENT shift fast, the
    canary for "the pipeline silently started dropping 5%").

    Baseline μ = milli mean of the first ``baseline_periods``
    ordered values; slack κ = μ div 20 (5%), threshold h = μ div 2 —
    the classic κ = δ/2 sizing for a 10% shift. Over the remaining
    periods: S⁺ = max(0, S⁺ + x·1000 − μ − κ), S⁻ = max(0, S⁻ + μ −
    x·1000 − κ); an alarm is either side crossing h. Output per
    group: μ, max S, the 1-based period index of the FIRST alarm
    (0 = clean), alarm count. All integer milli — both engines fold
    the identical recurrence, so the detector state hash-gates.

    Catalyst shape: same as holt_forecast — ONE ``aggregate``
    expression per group over the sorted period array (the μ slice
    and the fold share it), no UDF, no per-step shuffle; the daily
    pre-agg is the only exchange."""
    b = baseline_periods
    arr = series.groupBy(group_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(period_col), F.col(x_col)))
        ).alias("_s")
    ).select(
        group_col,
        F.expr(f"transform(_s, q -> CAST(q.{x_col} AS BIGINT))").alias(
            "_xs"
        ),
    )
    staged = arr.select(
        group_col,
        "_xs",
        F.size("_xs").cast("long").alias("n_periods"),
        F.expr(
            f"1000 * aggregate(slice(_xs, 1, least(size(_xs), {b})),"
            f" CAST(0 AS BIGINT), (a, x) -> a + x)"
            f" div least(size(_xs), {b})"
        ).alias("mu_milli"),
    )
    kappa = "(mu_milli div 20)"
    h = "(mu_milli div 2)"
    shi = f"greatest(CAST(0 AS BIGINT), acc.hi + x * 1000 - mu_milli - {kappa})"
    slo = f"greatest(CAST(0 AS BIGINT), acc.lo + mu_milli - x * 1000 - {kappa})"
    alarm = f"(({shi}) > {h} OR ({slo}) > {h})"
    folded = staged.select(
        group_col,
        "n_periods",
        "mu_milli",
        F.expr(
            f"""aggregate(
                slice(_xs, {b} + 1, greatest(size(_xs) - {b}, 0)),
                struct(CAST(0 AS BIGINT) AS hi, CAST(0 AS BIGINT) AS lo,
                       CAST(0 AS BIGINT) AS mx, CAST(0 AS BIGINT) AS first,
                       CAST({b} AS BIGINT) AS i,
                       CAST(0 AS BIGINT) AS n_alarms),
                (acc, x) -> struct(
                    {shi} AS hi,
                    {slo} AS lo,
                    greatest(acc.mx, {shi}, {slo}) AS mx,
                    CASE WHEN acc.first = 0 AND {alarm}
                         THEN acc.i + 1 ELSE acc.first END AS first,
                    acc.i + 1 AS i,
                    acc.n_alarms + CASE WHEN {alarm} THEN 1 ELSE 0 END
                        AS n_alarms))"""
        ).alias("_f"),
    )
    return folded.select(
        group_col,
        "n_periods",
        "mu_milli",
        F.col("_f.mx").alias("max_cusum_milli"),
        F.col("_f.first").alias("first_alarm_period"),
        F.col("_f.n_alarms").alias("n_alarm_periods"),
    )


def assortativity_stats(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Degree assortativity (Newman 2002, Phys. Rev. Lett. 89) over
    an undirected graph (one row per unordered pair) — the mixing
    diagnostic completing the graph family (components, ranking,
    cohesion): r > 0 means hubs attach to hubs (social cores),
    r < 0 means hubs attach to leaves (hub-and-spoke) — and for a
    100 TB edge dump it is the one-row profile that tells you
    whether the pagerank/triangle stages face a correlated-hub
    topology (broadcast the hub list) or a star topology (salt the
    hub keys).

    r is the Pearson correlation of endpoint degrees over DIRECTED
    stubs (each edge in both orientations). By stub symmetry
    Sx = Sy and Sxx = Syy, so r = (M·Sxy − Sx²) / (M·Sxx − Sx²) —
    every term an INTEGER sum (no sqrt), formed here with exact
    64-bit arithmetic; only the final milli ratio touches doubles,
    identically in both engines (floor(1000·num/den)).

    Distributed shape: one degree agg (map-side partial), one
    equi-join of stubs to the degree table per endpoint, one global
    agg — no window, no driver loop; the readout is 1-row scalar
    arithmetic. Degenerate den = 0 (regular graph: every stub sees
    the same degree pair) reports r = 0 like a correlation of a
    constant."""
    from pyspark.storagelevel import StorageLevel

    e = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    stubs = e.select("a", "b").unionAll(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = stubs.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    dx = deg.select(F.col("a"), F.col("d").alias("_dx"))
    dy = deg.select(F.col("a").alias("b"), F.col("d").alias("_dy"))
    sums = (
        stubs.join(dx, "a")
        .join(dy, "b")
        .agg(
            F.count(F.lit(1)).alias("_m"),
            F.sum("_dx").alias("_sx"),
            F.sum(F.col("_dx") * F.col("_dy")).alias("_sxy"),
            F.sum(F.col("_dx") * F.col("_dx")).alias("_sxx"),
        )
    )
    nn = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"), F.max("d").alias("max_degree")
    )
    return (
        sums.crossJoin(F.broadcast(nn))
        .select(
            "n_nodes",
            F.expr("_m div 2").alias("n_edges"),
            "max_degree",
            F.expr("1000 * _m div n_nodes").alias("mean_degree_milli"),
            F.expr(
                "CASE WHEN _m * _sxx - _sx * _sx = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST(floor(1000.0 * (_m * _sxy - _sx * _sx)"
                " / (_m * _sxx - _sx * _sx)) AS BIGINT) END"
            ).alias("assortativity_milli"),
        )
    )


def kcore_stats(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 12,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """k-core of an undirected graph by FIXED-ROUND peeling (Seidman
    1983; Batagelj-Zaversnik peels sequentially, the distributed
    form peels in synchronized rounds): each round drops every node
    with degree < k and every edge touching one, ``rounds`` times.
    The maximal k-core is the fixpoint; running a FIXED round count
    keeps the computation engine-exact (both engines run the same
    12 unrolled rounds), and the ``converged`` column WITNESSES the
    fixpoint in-query (last round removed nothing) — if a graph ever
    needed more rounds the row would say so instead of lying.
    Completes the graph family: components (dedup_clusters), ranking
    (pagerank), cohesion (triangles), mixing (assortativity),
    engagement shells (k-core — "the subgraph where everyone has
    >= k engaged neighbors", the community-core/bot-ring screen).

    Distributed shape per round: one degree agg + two semi-joins on
    the edge endpoints — all equi-joins on node ids, AQE-splittable,
    no window, no driver-side data. Each round's frame references the
    previous THREE times (degrees + both semi-joins), so lineage
    grows 3^rounds without a cut — unlike pagerank's every-8 cadence
    this loop must localCheckpoint EVERY round (the per-round edge
    frame is needed materialized anyway for the convergence count,
    so the checkpoint costs nothing extra). Peel rounds needed in
    practice ~ O(log n) for real degree distributions; 12 covers
    sf0.01-sf1 with the witness proving it."""
    cur = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).localCheckpoint()
    n_prev = cur.count()
    converged = False
    for _ in range(rounds):
        und = cur.select(F.col("a").alias("n")).unionAll(
            cur.select(F.col("b").alias("n"))
        )
        keep = (
            und.groupBy("n")
            .agg(F.count(F.lit(1)).alias("_d"))
            .filter(F.col("_d") >= k)
            .select("n")
        )
        nxt = (
            cur.join(keep.withColumnRenamed("n", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("n", "b"), "b", "left_semi")
            .localCheckpoint()
        )
        n_now = nxt.count()
        cur = nxt
        if n_now == n_prev:
            converged = True
            break
        n_prev = n_now
    und = cur.select(F.col("a").alias("n")).unionAll(
        cur.select(F.col("b").alias("n"))
    )
    deg = und.groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    stats = deg.agg(
        F.count(F.lit(1)).alias("core_nodes"),
        F.coalesce(F.min("d"), F.lit(0)).cast("long").alias(
            "core_min_degree"
        ),
    )
    ne = cur.agg(F.count(F.lit(1)).alias("core_edges"))
    return (
        stats.crossJoin(F.broadcast(ne))
        .select(
            F.lit(k).cast("long").alias("k"),
            "core_nodes",
            "core_edges",
            "core_min_degree",
            F.lit(converged).alias("converged"),
        )
    )


def bfs_hops(
    edges: DataFrame,
    rounds: int = 12,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Single-source BFS hop distances by synchronized frontier
    expansion — the reachability/distance member of the graph family
    (components answer WHETHER two nodes connect; this answers HOW
    FAR), and the recursive-query capability a warehouse user reaches
    for with WITH RECURSIVE: the oracle IS DuckDB's recursive CTE,
    the distributed form is the level-synchronous loop. Source =
    min node id (deterministic, in-plan — no driver-side choice).

    Per round: frontier ⋈ edges (equi-join on node id,
    AQE-splittable) → distinct neighbors → anti-join the visited set
    → the new level. Visited and frontier localCheckpoint every
    round (visited is referenced by the anti-join AND the next
    union — the kcore lineage discipline). Early-exit when a level
    comes back empty is SAFE for determinism (BFS levels are
    contiguous: an empty level means the fixpoint), and ``converged``
    witnesses it: TRUE iff some level ≤ rounds was empty, which by
    contiguity equals "no node sits at exactly level ``rounds``" —
    the same predicate the SQL replica checks. Unreached nodes are
    counted, not dropped (disconnected components are data, not
    noise).

    Returns one row per hop level: (hop, n_nodes, source_node,
    n_unreachable, converged, n_rounds_run). ``n_rounds_run`` counts
    the expansion rounds actually EXECUTED (including the final empty
    probe round when converged) — the budget-honesty witness the r9
    verdict asked for: a skewed graph that eats the whole 12-round
    budget without converging shows up in the row (n_rounds_run =
    rounds, converged FALSE), not just in the wall clock. By level
    contiguity the replica derives it: max_hop + 1 when converged
    (the empty probe), else the full budget (= max_hop). Scale: each
    round shuffles only the frontier-adjacent edges; the visited set
    stays partitioned by node id; total work O(E · diameter / p)
    with diameter ~O(log n) for real co-occurrence graphs — the
    witness proves the budget."""
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionAll(
            edges.select(
                F.col(dst_col).alias("a"), F.col(src_col).alias("b")
            )
        )
        .distinct()
        .localCheckpoint()
    )
    nodes = sym.select(F.col("a").alias("n")).distinct()
    total = nodes.agg(F.count(F.lit(1)).alias("_n_total"))
    source = nodes.agg(F.min("n").alias("n"))
    visited = source.select(
        "n", F.lit(0).cast("int").alias("hop")
    ).localCheckpoint()
    frontier = visited.select("n")
    converged = False
    rounds_run = 0
    for r in range(1, rounds + 1):
        new = (
            frontier.join(sym, frontier["n"] == sym["a"])
            .select(F.col("b").alias("n"))
            .distinct()
            .join(visited, "n", "left_anti")
            .select("n", F.lit(r).cast("int").alias("hop"))
            .localCheckpoint()
        )
        rounds_run = r
        if new.isEmpty():
            converged = True
            break
        visited = visited.unionAll(new).localCheckpoint()
        frontier = new.select("n")
    hist = visited.groupBy("hop").agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
    meta = visited.agg(
        F.min(F.when(F.col("hop") == 0, F.col("n"))).alias("source_node"),
        F.count(F.lit(1)).alias("_n_reached"),
    )
    return (
        hist.crossJoin(F.broadcast(meta))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("hop").cast("long").alias("hop"),
            "n_nodes",
            "source_node",
            (F.col("_n_total") - F.col("_n_reached")).alias(
                "n_unreachable"
            ),
            F.lit(converged).alias("converged"),
            F.lit(rounds_run).cast("long").alias("n_rounds_run"),
        )
    )


def weighted_sssp(
    edges: DataFrame,
    rounds: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    top_n: int = 20,
) -> DataFrame:
    """Weighted single-source shortest paths by synchronized
    Bellman-Ford relaxation — the WEIGHTED member beside
    :func:`bfs_hops` (hop counts answer reachability distance; this
    answers cost distance over integer edge weights — association
    distance on a co-occurrence graph, latency on a service graph):
    per round every node takes the min of its own distance and each
    in-neighbor's distance plus the edge weight. Source = min node
    id (deterministic, in-plan). Integer weights → integer min —
    bit-identical anywhere.

    Witnesses ride in-row: ``converged`` (no distance changed in the
    final round — TRUE iff ``rounds`` ≥ the shortest-path tree
    depth) and ``n_rounds_run`` (the BFS budget-honesty discipline:
    relaxation stops early when a round changes nothing).

    Per round: ONE dist ⋈ edges equi-join + a node-keyed min agg
    (map-side combining), dist localCheckpoint'ed (referenced by the
    next union AND the change count — the kcore lineage discipline).
    Returns the ``top_n`` nearest nodes by (dist, node) plus
    (n_reached, converged, n_rounds_run) on every row."""
    sym = (
        edges.select(
            F.col(src_col).alias("a"),
            F.col(dst_col).alias("b"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .unionAll(
            edges.select(
                F.col(dst_col).alias("a"),
                F.col(src_col).alias("b"),
                F.col(weight_col).cast("long").alias("w"),
            )
        )
        .localCheckpoint()
    )
    source = sym.agg(F.min("a").alias("n"))
    dist = source.select(
        "n", F.lit(0).cast("long").alias("d")
    ).localCheckpoint()
    converged = False
    rounds_run = 0
    for r in range(1, rounds + 1):
        relaxed = (
            dist.join(sym, dist["n"] == sym["a"])
            .select(F.col("b").alias("n"), (F.col("d") + F.col("w")).alias("d"))
            .unionAll(dist.select("n", "d"))
            .groupBy("n")
            .agg(F.min("d").alias("d"))
            .localCheckpoint()
        )
        rounds_run = r
        changed = (
            relaxed.alias("x")
            .join(dist.alias("y"), "n", "left")
            .filter(
                F.col("y.d").isNull() | (F.col("x.d") != F.col("y.d"))
            )
            .isEmpty()
        )
        dist = relaxed
        if changed:
            converged = True
            break
    nr = dist.agg(F.count(F.lit(1)).alias("n_reached"))
    # top-N via TakeOrderedAndProject (orderBy+limit), not a global
    # rank window — the lint's uncut-global-sort shape; (dist, node)
    # is a total order so the selected SET is deterministic and the
    # driver hash is order-insensitive
    return (
        dist.orderBy(F.col("d").asc(), F.col("n").asc())
        .limit(top_n)
        .crossJoin(F.broadcast(nr))
        .select(
            F.col("n").alias("node"),
            F.col("d").alias("dist"),
            "n_reached",
            F.lit(converged).alias("converged"),
            F.lit(rounds_run).cast("long").alias("n_rounds_run"),
        )
    )


def random_walks(
    edges: DataFrame,
    steps: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Deterministic random walks over an undirected graph — the
    node2vec/DeepWalk TRAINING-DATA generator (walks are the corpus a
    graph-embedding model trains on), derandomized the engine way:
    step t from node v moves to ``nbrs[h60(v || ':' || t) % degree]``
    over the SORTED neighbor list, so the "random" choice is a pure
    function of (node, step) — bit-identical across engines, runs,
    partitionings, and exactly replicable in SQL (the same h60/sort/
    mod the weighted-sampling family uses: reproducibility is a
    feature, an A-Res-style rerun yields the same corpus).

    Distributed shape: adjacency aggregates once to (node, sorted
    neighbor array); each step is ONE equi-join of the walk frontier
    against adjacency (shuffle on node id, AQE-splittable) + a narrow
    element_at pick — walk state is one row wide, never an
    accumulating array, so a billion walks cost `steps` joins
    regardless of walk count. More walks per node = more start rows
    with a walk-index salt in the hash. Returns one row per start
    node: (start, s1..s{steps})."""
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionAll(
            edges.select(
                F.col(dst_col).alias("a"), F.col(src_col).alias("b")
            )
        )
        .distinct()
    )
    adj = sym.groupBy(F.col("a").alias("n")).agg(
        F.array_sort(F.collect_set("b")).alias("nbrs")
    )
    from logprep_spark.functions.dedup import h60

    walks = adj.select(F.col("n").alias("start"), F.col("n").alias("_cur"))
    for t in range(1, steps + 1):
        pick = (
            h60(
                F.concat(
                    F.col("_cur").cast("string"), F.lit(f":{t}")
                )
            )
            % F.size("nbrs")
        ).cast("int") + 1
        walks = (
            walks.join(adj, walks["_cur"] == adj["n"])
            .select(
                "start",
                *[f"s{i}" for i in range(1, t)],
                F.element_at("nbrs", pick).alias(f"s{t}"),
            )
            .withColumn("_cur", F.col(f"s{t}"))
        )
    return walks.select("start", *[f"s{i}" for i in range(1, steps + 1)])


def _lpa_labels(
    edges: DataFrame,
    rounds: int,
    src_col: str,
    dst_col: str,
):
    """Shared damped-LPA label loop (see :func:`lpa_communities` for
    semantics and the per-round plan shape) — factored out so the
    modularity readout (:func:`lpa_modularity`) scores the SAME label
    assignment the community readout reports. Returns
    (edges_pinned, stubs, labels, prev_round_labels).

    r14 loop shape — the SELF-STUB fold: the damped self-vote used to
    ride a per-round ``unionAll(labels)``, i.e. TWO references to the
    previous round's frame, which is why every round needed its own
    eager localCheckpoint (the plan doubles per round otherwise).
    Folding the self-vote into ONE (n, n) self-stub row per node in
    ``stubs_loop`` (built once, outside the loop) yields the
    IDENTICAL vote multiset — each node's own label arrives via its
    self-stub exactly the way a neighbor's does — with exactly ONE
    labels reference per round: the plan grows LINEARLY (the
    pagerank posture), so rounds 1..rounds-1 run LAZILY as one
    chained AQE query and only TWO frames pin per construction
    (``prev`` = round rounds-1, referenced by the final round and
    the changed_last_round witness; ``labels`` = the final round,
    referenced 3x by the readouts) instead of one blocking
    driver job per round — 8 eager jobs down to 4.

    Pin types are deliberate (both measured, r14): eager
    localCheckpoint (flat LogicalRDD leaf), NOT persist — a persist
    keeps its child plan nested inside the InMemoryRelation, and
    chaining 8 of them (edges→stubs→labels0→rounds) compounds
    per-nesting-level plan processing: the 6-round all-persist
    variant produced a 15 MB executed-plan tree (4169
    InMemoryTableScan prints) and ran 15-20 s at sf0.1 vs ~4 s for
    the flat form, with even a warm readout over the materialized
    top cache paying ~4 s of driver-side tree walking. ``edges``
    stays a persist: it is ONE level deep, parquet-rooted and
    deterministic, so the two LPA queries (and repeated
    constructions) share its materialization via CacheManager
    canonical dedup — an unpinned co-purchase derivation (lineitem
    scan → basket collect_set → pair explode → count filter) re-ran
    per reference: 6 parquet scans / 4 explode subtrees in the r14
    baseline plan, 5.1 s vs 2.8 s r13 at sf0.1 (guide §2.1)."""
    from pyspark.storagelevel import StorageLevel

    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    stubs = (
        edges.select(F.col(src_col).alias("x"), F.col(dst_col).alias("y"))
        .unionAll(
            edges.select(
                F.col(dst_col).alias("x"), F.col(src_col).alias("y")
            )
        )
        .localCheckpoint()
    )
    labels = (
        stubs.select(F.col("x").alias("n"))
        .distinct()
        .select("n", F.col("n").alias("lbl"))
        .localCheckpoint()
    )
    # self-vote as a self-stub: one (n, n) row per node — the loop
    # join then delivers each node its own current label exactly the
    # way it delivers a neighbor's (see docstring). Both arms are
    # checkpointed leaves, so the 6 references the lazy loop makes
    # re-read RDD blocks, never recompute.
    stubs_loop = stubs.unionAll(
        labels.select(F.col("n").alias("x"), F.col("n").alias("y"))
    )
    prev = labels
    w = Window.partitionBy("n").orderBy(F.desc("cnt"), F.col("lbl"))

    def _round(lbl_frame):
        votes = stubs_loop.join(
            lbl_frame.select(F.col("n").alias("y"), "lbl"), "y"
        ).select(F.col("x").alias("n"), "lbl")
        counted = votes.groupBy("n", "lbl").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        return (
            counted.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("n", "lbl")
        )

    if rounds > 0:
        for _ in range(rounds - 1):
            prev = _round(prev)  # lazy: linear single-reference chain
        if rounds > 1:
            # one job runs rounds 1..r-1; at rounds == 1 ``prev`` IS
            # the already-checkpointed initial labels frame — a second
            # pin would pay a redundant eager job (r14 ADVICE)
            prev = prev.localCheckpoint()
        labels = _round(prev).localCheckpoint()
    return edges, stubs, labels, prev


def lpa_communities(
    edges: DataFrame,
    rounds: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Community detection by synchronized label propagation
    (Raghavan et al. 2007), DAMPED with a self-vote — the clustering
    member of the graph family that finds DENSE communities where
    connected components (dedup_clusters) only finds reachability:
    every node starts labeled with itself and each round adopts the
    most frequent label among its neighbors PLUS ITSELF (the
    self-vote is the determinism-preserving damping: pure
    synchronous LPA two-cycles on dense/bipartite structure — 96% of
    this graph's labels still churning at round 6 without it, 0.1%
    with it), ties to the SMALLEST label. Fixed ``rounds`` keeps
    both engines on the identical computation; ``changed_last_round``
    is the honest convergence witness (kcore's discipline).

    Distributed shape per round: one (node, label) count agg over
    the self-stub-augmented stubs + a per-node argmax window — both
    shuffle on node id, AQE-splittable; labels persist every round
    with a single reference per round (the self-stub fold — see
    _lpa_labels), so the plan grows linearly and warm constructions
    share the cached rounds. Hub damping is inherited from the
    co-purchase edge derivation; label counts per node are bounded
    by degree."""
    _, stubs, labels, prev = _lpa_labels(edges, rounds, src_col, dst_col)
    comm = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("sz"))
    stats = comm.agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.max("sz").cast("long").alias("largest_community"),
    )
    nn = labels.agg(F.count(F.lit(1)).alias("n_nodes"))
    chg = (
        labels.alias("a")
        .join(prev.alias("b"), "n")
        .filter(F.col("a.lbl") != F.col("b.lbl"))
        .agg(F.count(F.lit(1)).alias("changed_last_round"))
    )
    return (
        nn.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(chg))
        .select(
            "n_nodes", "n_communities", "largest_community",
            "changed_last_round",
        )
    )


def lpa_modularity(
    edges: DataFrame,
    rounds: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Newman MODULARITY of the LPA partition — the cluster-quality
    eval the graph family was missing (the kmeans_silhouette
    discipline applied to communities: LPA reports counts, this
    MEASURES whether the labels are denser-than-chance):
    Q = Σ_c (e_c/m − (d_c/2m)²) over the final LPA labels, where m =
    |edges|, e_c = intra-community edges, d_c = degree sum of c
    (Newman & Girvan 2004). Computed EXACTLY as integers first —
    Q = N / 4m² with N = Σ_c (4·m·e_c − d_c²) carried in
    DECIMAL(38,0) (the gini discipline: d_c² wraps int64 once a
    community's degree sum passes ~3·10⁹ stubs) — then ONE floor on
    a double built from the exact terms (the CUPED discipline;
    identical term structure in the oracle). ``q_null_milli`` is the
    in-row null baseline: the same formula over the all-singletons
    partition (e_c = 0, so N_null = −Σ_n deg_n²) — a partition no
    better than chance reads ≈ 0, so Q ≫ Q_null is the quality
    witness riding in the row itself.

    Distributed shape: the LPA loop is shared (:func:`_lpa_labels`);
    the readout adds one degree agg over stubs (node-keyed), one
    label join + lbl-keyed agg for d_c, one edges⋈labels⋈labels
    equi-join chain + lbl-keyed agg for e_c — every shuffle is
    node- or label-keyed and AQE-splittable; the three 1-row frames
    (m, N, null-N) attach as broadcasts. Returns one row:
    (n_nodes, n_communities, m_edges, intra_edges, q_milli,
    q_null_milli)."""
    edges, stubs, labels, _ = _lpa_labels(edges, rounds, src_col, dst_col)
    d38 = "decimal(38,0)"
    m = edges.agg(F.count(F.lit(1)).cast("long").alias("m_edges"))
    deg = stubs.groupBy(F.col("x").alias("n")).agg(
        F.count(F.lit(1)).cast("long").alias("_dg")
    )
    dc = (
        labels.join(deg, "n")
        .groupBy("lbl")
        .agg(F.sum("_dg").cast(d38).alias("_d_c"))
    )
    ec = (
        edges.select(
            F.col(src_col).alias("_a"), F.col(dst_col).alias("_b")
        )
        .join(labels.select(F.col("n").alias("_a"), F.col("lbl").alias("_la")), "_a")
        .join(labels.select(F.col("n").alias("_b"), F.col("lbl").alias("_lb")), "_b")
        .filter(F.col("_la") == F.col("_lb"))
        .groupBy(F.col("_la").alias("lbl"))
        .agg(F.count(F.lit(1)).cast("long").alias("_e_c"))
    )
    percomm = dc.join(ec, "lbl", "left").select(
        "lbl",
        "_d_c",
        F.coalesce(F.col("_e_c"), F.lit(0)).cast(d38).alias("_e_c"),
    )
    num = percomm.crossJoin(F.broadcast(m)).agg(
        F.sum(
            F.lit(4).cast(d38) * F.col("m_edges").cast(d38) * F.col("_e_c")
            - F.col("_d_c") * F.col("_d_c")
        ).cast(d38).alias("_num"),
        F.sum("_e_c").cast("long").alias("intra_edges"),
    )
    null_num = deg.agg(
        (-F.sum(F.col("_dg").cast(d38) * F.col("_dg").cast(d38)))
        .cast(d38)
        .alias("_null_num")
    )
    counts = labels.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.count_distinct("lbl").cast("long").alias("n_communities"),
    )
    q = "floor(1000.0 * CAST({n} AS DOUBLE) / (4.0 * m_edges * m_edges))"
    return (
        counts.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(num))
        .crossJoin(F.broadcast(null_num))
        .select(
            "n_nodes",
            "n_communities",
            "m_edges",
            "intra_edges",
            F.expr(q.format(n="_num")).cast("long").alias("q_milli"),
            F.expr(q.format(n="_null_num")).cast("long").alias(
                "q_null_milli"
            ),
        )
    )


def holt_forecast(
    series: DataFrame,
    group_col: str,
    period_col: str,
    x_col: str,
    alpha_milli: int = 300,
    beta_milli: int = 100,
) -> DataFrame:
    """Per-group Holt double-exponential smoothing (level + trend)
    over an ordered series — the FORECASTING member of the
    time-series family (trend fit: events_value_trend, seasonality:
    events_dow_seasonality, outliers: events_anomaly_mad): one row
    per group with the final level/trend state, the one-step-ahead
    forecast, and the largest one-step-ahead absolute residual seen
    while fitting (the in-query anomaly witness).

    The recurrence l' = (α·1000·x + (1000−α)(l+t)) div 1000,
    t' = (β(l'−l) + (1000−β)t) div 1000 runs in integer MILLI units
    (both engines truncate integer division toward zero), so the
    fitted state is bit-identical cross-engine — a float EWMA is not.

    Catalyst shape: the fold is ONE ``aggregate`` higher-order
    expression over the per-group period array — the sequential
    recurrence stays inside a single whole-stage-codegen projection,
    no UDF, no per-step shuffle; the only exchange is the group agg
    that builds the array (map-side combining, |groups|·|periods|
    bounded). Inlining l' into the t' slot doubles the lambda's
    expression tree ONCE (struct fields cannot reference siblings),
    not per element — the documented higher-order-function CSE
    caveat, bounded here."""
    a, b = alpha_milli, beta_milli
    arr = series.groupBy(group_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(period_col), F.col(x_col)))
        ).alias("_s")
    ).select(
        group_col,
        F.expr(f"transform(_s, p -> CAST(p.{x_col} AS BIGINT))").alias(
            "_xs"
        ),
    )
    lnew = f"(({a} * x * 1000 + {1000 - a} * (acc.l + acc.t)) div 1000)"
    folded = arr.select(
        group_col,
        F.size("_xs").cast("long").alias("n_periods"),
        F.expr(
            f"""aggregate(
                slice(_xs, 2, greatest(size(_xs) - 1, 0)),
                struct(CAST(element_at(_xs, 1) * 1000 AS BIGINT) AS l,
                       CAST(0 AS BIGINT) AS t,
                       CAST(0 AS BIGINT) AS r),
                (acc, x) -> struct(
                    {lnew} AS l,
                    (({b} * ({lnew} - acc.l)
                      + {1000 - b} * acc.t) div 1000) AS t,
                    greatest(acc.r,
                             abs(x * 1000 - (acc.l + acc.t))) AS r))"""
        ).alias("_f"),
    )
    return folded.select(
        group_col,
        "n_periods",
        F.col("_f.l").alias("level_milli"),
        F.col("_f.t").alias("trend_milli"),
        (F.col("_f.l") + F.col("_f.t")).alias("forecast_milli"),
        F.col("_f.r").alias("max_resid_milli"),
    )


def hits_scores(
    edges: DataFrame,
    iters: int = 3,
    topk: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over a directed edge
    list — the second classical link-analysis algorithm beside
    :func:`pagerank` (PageRank ranks by global random-surfer mass;
    HITS separates "points at good things" from "is pointed at by
    good things" — on a bipartite trade graph the two sides get
    DIFFERENT scores, which one PageRank vector cannot express).

    Integer-exact variant: scores live in milli-units; each round
    computes raw sums (a_raw(i) = Σ h over in-edges, then h_raw(j) =
    Σ a over out-edges) and re-normalizes by the round's MAX — new =
    1000·raw div max — pure long arithmetic, so the fixed-iteration
    trajectory is bit-identical cross-engine (the pagerank exactness
    contract; the textbook L2 norm would put a sqrt inside the
    iteration). Max-norm is a standard HITS normalization — the
    PRINCIPAL-eigenvector direction is what iteration converges to,
    and any per-round positive rescaling preserves it.

    Distributed shape: edges persist once; each round is two keyed
    aggs (dst then src — partial agg collapses map-side) plus two
    1-row max broadcasts; lineage cut per round (localCheckpoint —
    the pagerank discipline, round N must not replay rounds 1..N-1).
    Output: top-``topk`` hubs and authorities (TakeOrdered, never a
    global sort), role-tagged, with the in-frame rank."""
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    hubs = (
        e.select("src").distinct()
        .select(F.col("src").alias("node"), F.lit(1000).cast("long").alias("h"))
    )
    auth = None
    for _ in range(iters):
        a_raw = (
            e.join(hubs.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("h").alias("ar"))
        )
        amax = a_raw.agg(F.max("ar").alias("am"))
        auth = (
            a_raw.crossJoin(F.broadcast(amax))
            .selectExpr("dst AS node", "CAST(1000 * ar div am AS BIGINT) AS a")
            .localCheckpoint(eager=True)
        )
        h_raw = (
            e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum("a").alias("hr"))
        )
        hmax = h_raw.agg(F.max("hr").alias("hm"))
        hubs = (
            h_raw.crossJoin(F.broadcast(hmax))
            .selectExpr("src AS node", "CAST(1000 * hr div hm AS BIGINT) AS h")
            .localCheckpoint(eager=True)
        )

    def top(df, score, role):
        win = Window.orderBy(F.col(score).desc(), F.col("node").asc())
        return (
            df.orderBy(F.col(score).desc(), F.col("node").asc())
            .limit(topk)
            .select(
                F.lit(role).alias("role"),
                F.col("node").cast("long").alias("node"),
                F.col(score).cast("long").alias("score_milli"),
                F.row_number().over(win).cast("long").alias("rank"),
            )
        )

    return top(hubs, "h", "hub").unionByName(top(auth, "a", "authority"))


def welch_ttest(
    obs: DataFrame, value_col: str = "vm", variant_col: str = "variant"
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test — the MEAN-difference
    member of the experimentation family (z: rate; Mann-Whitney:
    stochastic order; KS: distribution shape; CUPED reduces variance
    BEFORE this test; Welch asks whether the mean value differs
    without assuming equal variances — the default over Student's t,
    Welch 1947): t = (m1 − m0) / sqrt(s0²/n0 + s1²/n1) with the
    Welch–Satterthwaite df.

    Exactness: per variant only n, Σx, Σx² are aggregated — Σx² in
    DECIMAL(38,0) (milli values square past int64 at corpus scale —
    the gini overflow discipline); means in integer milli (Σx div n);
    t and df form as doubles from those exact integers in a FIXED
    operand order, floor-milli'd identically in both engines (the
    mann_whitney z_milli convention). ``reject_05`` compares
    t_milli² > 3841459 = round(1.959964²·10⁶), the large-sample
    normal critical value (df here is thousands; stated convention,
    same class as the KS constant).

    Degenerate-arm convention, stated and GATED: an arm with n < 2
    has no sample variance (the n−1 divisor is 0), and two
    constant arms have se² = 0 (t is x/0) — in both cases
    ``t_milli``, ``df_milli``, and ``reject_05`` read NULL via an
    explicit CASE gate (Spark 4's ANSI mode makes ÷0 an ERROR, so
    the gate is required, not just documentation; DuckDB's ÷0 →
    NULL yields the identical readout), the same flag-by-NULL
    posture as an empty frame: an A/B readout on a one-observation
    or zero-variance sample is not a test result.

    Catalyst shape: ONE map-side-combinable aggregate over the
    observations, then a 1-row projection — no window, no shuffle
    beyond the agg."""
    d38 = "decimal(38,0)"
    agg = obs.groupBy().agg(
        F.sum((F.col(variant_col) == 0).cast("long")).alias("n0"),
        F.sum((F.col(variant_col) == 1).cast("long")).alias("n1"),
        F.sum(
            F.when(F.col(variant_col) == 0, F.col(value_col)).otherwise(0)
        ).cast("long").alias("_sx0"),
        F.sum(
            F.when(F.col(variant_col) == 1, F.col(value_col)).otherwise(0)
        ).cast("long").alias("_sx1"),
        F.sum(
            F.when(
                F.col(variant_col) == 0,
                F.col(value_col).cast(d38) * F.col(value_col).cast(d38),
            ).otherwise(F.lit(0).cast(d38))
        ).alias("_sxx0"),
        F.sum(
            F.when(
                F.col(variant_col) == 1,
                F.col(value_col).cast(d38) * F.col(value_col).cast(d38),
            ).otherwise(F.lit(0).cast(d38))
        ).alias("_sxx1"),
    )
    v0 = "((CAST(_sxx0 AS DOUBLE) - CAST(_sx0 AS DOUBLE) * _sx0 / n0) / (n0 - 1))"
    v1 = "((CAST(_sxx1 AS DOUBLE) - CAST(_sx1 AS DOUBLE) * _sx1 / n1) / (n1 - 1))"
    se2 = f"({v0} / n0 + {v1} / n1)"
    # degenerate gate (docstring convention): n<2 arm or zero
    # variance -> NULL; CASE short-circuits, so the guarded branch's
    # divisions never evaluate under ANSI mode
    guard = f"CASE WHEN n0 < 2 OR n1 < 2 OR {se2} = 0 THEN NULL ELSE "
    t = f"((CAST(_sx1 AS DOUBLE) / n1 - CAST(_sx0 AS DOUBLE) / n0) / sqrt({se2}))"
    df_ = (
        f"({se2} * {se2} / (({v0} / n0) * ({v0} / n0) / (n0 - 1)"
        f" + ({v1} / n1) * ({v1} / n1) / (n1 - 1)))"
    )
    return agg.select(
        "n0",
        "n1",
        F.expr("_sx0 div n0").alias("mean0_milli"),
        F.expr("_sx1 div n1").alias("mean1_milli"),
        F.expr(
            "(CAST(_sx1 AS DECIMAL(38,0)) * n0 - CAST(_sx0 AS DECIMAL(38,0))"
            " * n1) div (CAST(n0 AS DECIMAL(38,0)) * n1)"
        ).alias("mean_diff_milli"),
        F.expr(f"CAST({guard}floor(1000.0 * {t}) END AS BIGINT)").alias(
            "t_milli"
        ),
        F.expr(f"CAST({guard}floor(1000.0 * {df_}) END AS BIGINT)").alias(
            "df_milli"
        ),
        F.expr(
            f"{guard}CAST(floor(1000.0 * {t}) AS BIGINT)"
            f" * CAST(floor(1000.0 * {t}) AS BIGINT) > 3841459 END"
        ).alias("reject_05"),
    )


def mutual_info_cells(
    df: DataFrame, row_col: str, col_col: str
) -> DataFrame:
    """Mutual-information cells for a two-way categorical table — the
    INFORMATION-theoretic sibling of chi_square_cells (chi² tests
    whether dependence EXISTS; MI measures how many nats it carries,
    and the per-cell PMI says which co-occurrences drive it — the
    standard feature-dependence screen before model training): per
    cell the observed count, pointwise mutual information
    ln(n·N/(n_r·n_c)) in micro-nats, and the cell's MI contribution
    (n/N)·ln(n·N/(n_r·n_c)) in micro-nats; Σ contributions = MI.

    Exactness: counts are exact longs; the single ln forms from them
    in a FIXED operand order and rounds to micro identically in both
    engines (the text_dsir log discipline). Zero-count cells emit no
    row (their MI contribution is 0 by the x·ln x limit, stated).

    Catalyst shape: one grouped count + two PARTITIONED margin
    windows over the |R|×|C| cell table + a 1-row total broadcast —
    no partition-less window (the r13 KS/MW discipline), no raw-row
    pass after the tally."""
    tab = df.groupBy(row_col, col_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    wr = Window.partitionBy(row_col)
    wc = Window.partitionBy(col_col)
    tot = tab.agg(F.sum("n").cast("long").alias("nn"))
    m = (
        tab.withColumn("nr", F.sum("n").over(wr).cast("long"))
        .withColumn("nc", F.sum("n").over(wc).cast("long"))
        .crossJoin(broadcast(tot))
    )
    pmi = "ln((CAST(n AS DOUBLE) * nn) / (CAST(nr AS DOUBLE) * nc))"
    return m.select(
        row_col,
        col_col,
        F.col("n").cast("long").alias("observed"),
        F.expr(f"CAST(round(1000000 * {pmi}) AS BIGINT)").alias(
            "pmi_micro"
        ),
        F.expr(
            f"CAST(round(1000000 * (CAST(n AS DOUBLE) / nn) * {pmi})"
            " AS BIGINT)"
        ).alias("mi_contrib_micro"),
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k_milli: int = 4448,
) -> DataFrame:
    """Median/MAD robust outlier profile per group — the BATCH sibling
    of the streaming Hampel despiker (events_hampel_despike runs the
    same rule over a moving window; this profiles a whole column per
    key, the data-quality screen that survives the outliers it hunts,
    unlike mean/stddev which the outliers themselves corrupt):
    flag x iff 1000·|x − median| > k_milli·MAD, k_milli = 4448 ≈
    1000·3·1.4826 (three normal-consistent sigmas, the Hampel
    convention).

    Exactness: median is the LOWER median — the value at rank
    ⌈n/2⌉ of a row_number over the group-partitioned value order
    (ties share a value, so the read is deterministic even though
    rank assignment among ties is not); the MAD repeats the same
    trick on |x − median|; the flag comparison is pure integer milli.
    Bit-identical cross-engine with no percentile-interpolation
    convention to align.

    Catalyst shape: two group-partitioned window passes (never
    partition-less) + one grouped readout; bounded by the group's
    row count per task — salt wide groups at 100× (the skew_report
    escape, stated)."""
    x = df.select(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    )
    wg = Window.partitionBy("g")
    wv = Window.partitionBy("g").orderBy("v")
    med = (
        x.withColumn("_rn", F.row_number().over(wv))
        .withColumn("_n", F.count(F.lit(1)).over(wg))
        .filter(F.col("_rn") == F.expr("(_n + 1) div 2"))
        .select("g", F.col("v").alias("_med"))
    )
    dev = x.join(med, "g").withColumn(
        "_ad", F.abs(F.col("v") - F.col("_med"))
    )
    wd = Window.partitionBy("g").orderBy("_ad")
    mad = (
        dev.withColumn("_rn", F.row_number().over(wd))
        .withColumn("_n", F.count(F.lit(1)).over(wg))
        .filter(F.col("_rn") == F.expr("(_n + 1) div 2"))
        .select("g", F.col("_ad").alias("_mad"))
    )
    return (
        dev.join(mad, "g")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("_med").cast("long").alias("median_milli"),
            F.max("_mad").cast("long").alias("mad_milli"),
            F.sum(
                (1000 * F.col("_ad") > k_milli * F.col("_mad")).cast("long")
            ).cast("long").alias("n_outliers"),
        )
        .select(
            F.col("g").alias(group_col),
            "n",
            "median_milli",
            "mad_milli",
            "n_outliers",
            F.expr("1000 * n_outliers div n").alias("outlier_share_milli"),
        )
    )


def theil_decomposition(
    spend: DataFrame, group_col: str = "g", value_col: str = "x"
) -> DataFrame:
    """Theil-T inequality index with its exact between/within-group
    decomposition (Theil 1967) — the DECOMPOSABLE member of the
    concentration family: gini_concentration reads total inequality
    but cannot attribute it; Theil-T splits exactly as T = Σ_g s_g·T_g
    (within) + Σ_g s_g·ln(μ_g/μ) (between), the question a marketplace
    or shard-balance analysis actually asks ("is the skew BETWEEN
    nations or INSIDE them?").

    Exactness discipline: every ln forms from exact integer sums with
    explicit DOUBLE casts in a fixed operand order (a bare SQL `1.0`
    parses as DECIMAL with engine-specific division scales — the r13
    dq_mutual_info lesson) and is micro-rounded PER ROW before any
    sum, so every aggregate is an exact integer sum — deterministic
    under any partitioning, bit-identical cross-engine (a double sum
    would be order-dependent). The rounded paths make the exact-real
    identity T = B + W hold only to accumulated rounding;
    ``decomp_gap_micro`` reads that residue honestly instead of
    gating a float equality.

    Catalyst shape: one per-key agg feeds one group agg + one 1-row
    global broadcast; per-row terms are narrow projections; NO
    windows, no sort — at 10⁹ keys the only shuffles are the two
    keyed aggs."""
    glob = spend.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum(value_col).cast("long").alias("tot"),
    )
    grp = spend.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(value_col).cast("long").alias("tot_g"),
    )
    x = f"CAST({value_col} AS DOUBLE)"
    rows = (
        spend.join(broadcast(grp), group_col)
        .crossJoin(broadcast(glob))
        .select(
            group_col,
            "n_g",
            "tot_g",
            "nn",
            "tot",
            F.expr(
                f"CAST(round(1000000 * ({x} / tot)"
                f" * ln({x} * nn / tot)) AS BIGINT)"
            ).alias("_tt"),
            F.expr(
                f"CAST(round(1000000 * ({x} / tot_g)"
                f" * ln({x} * n_g / tot_g)) AS BIGINT)"
            ).alias("_tw"),
        )
    )
    per_g = rows.groupBy(group_col).agg(
        F.max("n_g").alias("n_users"),
        F.max("tot_g").alias("spend_milli"),
        F.max("nn").alias("_nn"),
        F.max("tot").alias("_tot"),
        F.sum("_tt").cast("long").alias("_t_total_part"),
        F.sum("_tw").cast("long").alias("theil_within_g_micro"),
    ).select(
        group_col,
        "n_users",
        "spend_milli",
        F.expr("1000 * spend_milli div _tot").alias("share_milli"),
        "theil_within_g_micro",
        F.expr(
            "CAST(CAST(spend_milli AS DECIMAL(38,0))"
            " * theil_within_g_micro div _tot AS BIGINT)"
        ).alias("within_contrib_micro"),
        F.expr(
            "CAST(round(1000000 * (CAST(spend_milli AS DOUBLE) / _tot)"
            " * ln(CAST(spend_milli AS DOUBLE) * _nn / (_tot * CAST(n_users"
            " AS DOUBLE)))) AS BIGINT)"
        ).alias("between_contrib_micro"),
        F.col("_t_total_part"),
    )
    tot_row = per_g.agg(
        F.sum("_t_total_part").cast("long").alias("theil_total_micro"),
        F.sum("within_contrib_micro").cast("long").alias(
            "theil_within_micro"
        ),
        F.sum("between_contrib_micro").cast("long").alias(
            "theil_between_micro"
        ),
    )
    return (
        per_g.drop("_t_total_part")
        .crossJoin(broadcast(tot_row))
        .withColumn(
            "decomp_gap_micro",
            F.expr(
                "theil_total_micro - theil_between_micro"
                " - theil_within_micro"
            ),
        )
    )


def lorenz_deciles(
    df: DataFrame, value_col: str = "x", id_col: str = "user_id"
) -> DataFrame:
    """Lorenz-curve decile points of a per-key value frame — the CURVE
    the concentration family's scalars summarize (gini = 1 − 2·area
    under it; Theil attributes it; THIS is the readout an analyst
    plots and a shard planner thresholds: "the bottom 70% of users
    carry 31% of spend"): keys ranked ascending by (value, id), the
    running value share read at each population decile boundary.

    Catalyst shape: ONE with_running_sums pass over the per-key frame
    attaches rank AND cumulative value together — the inclusive
    running count of a 1-litcolumn IS the rank, so the rank and the
    cumulative sum share a single range shuffle (the r13 two-pass
    primitive composing with itself for free); deciles then come from
    ntile_from_rank's exact driver-side arithmetic (bit-parity with
    window ntile, pytest-gated in test_global_rank.py) and one
    grouped readout. No partition-less window anywhere. Eager: the
    running-sums pass executes Spark jobs at CONSTRUCTION time and
    snapshots the per-key frame (plans/ranks.py eager-execution
    contract) — call once per source snapshot.
    """
    from logprep_spark.plans.ranks import ntile_from_rank, with_running_sums

    base = df.select(
        F.col(value_col).alias("_x"), F.col(id_col).alias("_id")
    ).withColumn("_one", F.lit(1).cast("long"))
    cum, totals = with_running_sums(
        base,
        [F.col("_x"), F.col("_id")],
        [("_cum_x", "_x"), ("_rank", "_one")],
    )
    n, tot = totals["_rank"], totals["_cum_x"]
    tiled = cum.withColumn("decile", ntile_from_rank("_rank", n, 10))
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("_rank").cast("long").alias("_r_hi"),
            F.max("_cum_x").cast("long").alias("_cx_hi"),
        )
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_keys",
            F.expr(f"1000 * _r_hi div {max(n, 1)}").alias(
                "cum_keys_share_milli"
            ),
            F.expr(
                f"CAST(1000 * CAST(_cx_hi AS DECIMAL(38,0))"
                f" div {max(tot, 1)} AS BIGINT)"
            ).alias("cum_value_share_milli"),
        )
    )


def cramers_v(df: DataFrame, row_col: str, col_col: str) -> DataFrame:
    """Cramér's V association strength — the NORMALIZED readout of the
    chi-square family (chi_square_cells says whether and where the
    dependence is; MI says how many nats; V = sqrt(χ²/(N·(min(R,C)−1)))
    maps it to [0,1] so tables of different shapes compare — the
    number a feature-screening dashboard actually thresholds):
    one row with N, dof, the summed χ² in micro, and V in milli.

    Exactness: χ² comes from chi_square_cells' integer micro
    contributions (exact-count products in DECIMAL(38,0)), summed as
    integers; the one sqrt forms from those exact integers in fixed
    operand order and floors to milli. Shape: the cell table's aggs
    only — one grouped count + bounded windows (chi_square_cells) +
    one 1-row readout."""
    cells = chi_square_cells(df, row_col, col_col)
    return cells.agg(
        F.sum("observed").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.countDistinct(row_col).cast("long").alias("_r"),
        F.countDistinct(col_col).cast("long").alias("_c"),
        F.sum("chi_contrib_micro").cast("long").alias("chi2_micro"),
    ).select(
        "n",
        "n_cells",
        F.expr("(_r - 1) * (_c - 1)").cast("long").alias("dof"),
        "chi2_micro",
        F.expr(
            "CAST(floor(1000.0 * sqrt((CAST(chi2_micro AS DOUBLE)"
            " / 1000000.0) / (n * (least(_r, _c) - 1)))) AS BIGINT)"
        ).alias("cramers_v_milli"),
    )


def entropy_profile(
    df: DataFrame, cols: list, id_hint: str | None = None
) -> DataFrame:
    """Per-column Shannon-entropy profile over categorical columns —
    the single-column sibling of mutual_info_cells in the dq family
    (profile_columns counts distincts; entropy says how EVENLY the
    mass spreads — a near-zero normalized entropy flags a
    constant-in-practice column, a 1000-milli one a uniform key; the
    screen that catches degenerate partition keys and skewed labels
    before a shuffle or a training run inherits them): per column the
    distinct count, H in micro-nats, its ln(K) ceiling, and
    H/ln(K) in milli.

    Exactness: per-value terms round(1e6·(n_v/N)·ln(N/n_v)) form from
    exact counts with explicit DOUBLE casts (the dq_mutual_info
    decimal-literal lesson) and sum as exact integers. Shape: one
    grouped count per column (map-side combinable) unioned into one
    |values|-bounded frame, then a per-column agg — the raw table
    scans once per column, never shuffles on rows."""
    if not cols:
        raise ValueError("entropy_profile: cols must name at least one column")
    parts = []
    for c in cols:
        parts.append(
            df.groupBy(F.col(c).cast("string").alias("_v"))
            .agg(F.count(F.lit(1)).alias("_n"))
            .select(F.lit(c).alias("column"), "_v", "_n")
        )
    tallies = parts[0]
    for p in parts[1:]:
        tallies = tallies.unionByName(p)
    tot = df.agg(F.count(F.lit(1)).cast("long").alias("nn"))
    terms = tallies.crossJoin(broadcast(tot)).select(
        "column",
        F.expr(
            "CAST(round(1000000 * (CAST(_n AS DOUBLE) / nn)"
            " * ln(CAST(nn AS DOUBLE) / _n)) AS BIGINT)"
        ).alias("_h"),
    )
    return (
        terms.groupBy("column")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_values"),
            F.sum("_h").cast("long").alias("entropy_micro"),
        )
        .select(
            "column",
            "n_values",
            "entropy_micro",
            F.expr(
                "CAST(round(1000000 * ln(CAST(n_values AS DOUBLE)))"
                " AS BIGINT)"
            ).alias("max_entropy_micro"),
            # K = 1 convention: H/ln(K) is 0/0; a constant column is
            # the degenerate case this screen exists to FLAG, so it
            # reads 0 (the flag value), stated here
            F.expr(
                "CASE WHEN n_values = 1 THEN CAST(0 AS BIGINT)"
                " ELSE CAST(floor(1000.0 * entropy_micro"
                " / round(1000000 * ln(CAST(n_values AS DOUBLE))))"
                " AS BIGINT) END"
            ).alias("normalized_milli"),
        )
    )
