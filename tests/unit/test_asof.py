"""asof_join semantics: inclusive match, carry-forward, null before first."""

from datetime import datetime

from pyspark.sql import functions as F

from logprep_spark.plans.analytics import asof_join


def _t(m):
    return datetime(2024, 1, 1, 10, m)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 1, _t(0)), (2, 1, _t(5)), (3, 1, _t(10)), (4, 2, _t(5))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _t(5), "cfg-a"), (1, _t(9), "cfg-b"), (3, _t(1), "cfg-z")],
        "user_id long, ts timestamp, cfg string",
    )
    out = {r.event_id: (r.ts_asof, r.cfg_asof) for r in
           asof_join(left, right, ["user_id"]).collect()}
    assert out[1] == (None, None)            # before any right row
    assert out[2] == (_t(5), "cfg-a")        # same-instant row IS visible (>=)
    assert out[3] == (_t(9), "cfg-b")        # latest prior, carried forward
    assert out[4] == (None, None)            # user 2 has no right rows
    # left row count preserved, original columns intact
    res = asof_join(left, right, ["user_id"])
    assert res.count() == 4 and set(left.columns) <= set(res.columns)


def test_scd2_point_in_time_semantics(spark):
    """Hand-built change history: a purchase between changes reads
    the OLD tier, a purchase at the exact change instant reads the
    NEW tier (inclusive), two same-instant changes resolve to the
    later event id, and a user's very first event (itself the first
    change) still enriches its own purchase."""
    import json as _json

    from logprep_spark.plans.analytics import scd2_point_in_time

    def ev(eid, uid, ts, etype, k):
        return (eid, ts, uid, etype, float(eid), _json.dumps({"k": k}))

    rows = [
        # user 1: tier 0 at 10:00, purchase 10:30 (old tier), tier 2
        # change at 11:00 with a SAME-INSTANT purchase (new tier)
        ev(1, 1, "2024-01-01 10:00:00", "view", 0),
        ev(2, 1, "2024-01-01 10:30:00", "purchase", 0),
        ev(3, 1, "2024-01-01 11:00:00", "view", 50),
        ev(4, 1, "2024-01-01 11:00:00", "purchase", 50),
        # user 2: TWO changes at the same instant (event 6 wins),
        # purchase after reads the later one's tier
        ev(5, 2, "2024-01-02 09:00:00", "view", 0),
        ev(6, 2, "2024-01-02 09:00:00", "view", 75),
        ev(7, 2, "2024-01-02 09:30:00", "purchase", 75),
        # user 3: first event IS the purchase
        ev(8, 3, "2024-01-03 08:00:00", "purchase", 25),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["event_id"]: r["tier_at_purchase"]
        for r in scd2_point_in_time(df).collect()
    }
    assert got == {2: 0, 4: 2, 7: 3, 8: 1}

    # repartition invariance
    again = {
        r["event_id"]: r["tier_at_purchase"]
        for r in scd2_point_in_time(df.repartition(5)).collect()
    }
    assert again == got
