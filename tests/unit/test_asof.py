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
