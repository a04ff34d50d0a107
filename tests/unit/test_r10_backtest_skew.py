"""Property tests: events_forecast_backtest (trend series beats naive,
fold replica, temporal discipline), dq_skew_advisor (planted hot key,
uniform key read, arithmetic bounds).
"""

from __future__ import annotations

import os
import tempfile
from datetime import datetime, timedelta

from logprep_spark.plans import catalog


def _trunc_div(y: int, d: int) -> int:
    q = abs(y) // d
    return q if y >= 0 else -q


def _holt(xs, a=300, b=100):
    l, t = xs[0] * 1000, 0
    for x in xs[1:]:
        l_new = _trunc_div(a * x * 1000 + (1000 - a) * (l + t), 1000)
        t = _trunc_div(b * (l_new - l) + (1000 - b) * t, 1000)
        l = l_new
    return l, t


def test_backtest_beats_naive_on_linear_trend(spark):
    # a clean linear trend: Holt extrapolates it, last-value cannot
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(60):
        for _ in range(10 + 2 * d):
            eid += 1
            rows.append(
                (eid, base + timedelta(days=d), 1, "login", 1.0, "{}")
            )
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        ).write.parquet(os.path.join(tmp, "events.parquet"))
        out = catalog.queries()["events_forecast_backtest"](
            spark, tmp
        ).collect()
    assert len(out) == 4
    for r in out:
        assert r["mae_holt_milli"] < r["mae_naive_milli"], r
        assert r["skill_permille"] > 0, r
    # replicate fold 4 by hand: train on first n-7 days
    xs = [10 + 2 * d for d in range(60)]
    l, t = _holt(xs[:53])
    mae = (
        sum(abs(l + h * t - xs[52 + h] * 1000) for h in range(1, 8)) // 7
    )
    f4 = next(r for r in out if r["fold"] == 4)
    assert f4["n_train_days"] == 53
    assert f4["mae_holt_milli"] == mae


def test_backtest_trains_strictly_before_horizon(spark, sf_dir):
    out = catalog.queries()["events_forecast_backtest"](
        spark, sf_dir
    ).collect()
    assert len(out) > 0
    by_type = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    for rows in by_type.values():
        folds = sorted(r["fold"] for r in rows)
        ps = [r["n_train_days"] for r in sorted(rows, key=lambda x: x["fold"])]
        # each later origin trains on exactly 7 more days
        assert all(b - a == 7 for a, b in zip(ps, ps[1:])), ps
        assert folds == list(range(folds[0], folds[0] + len(folds)))


def test_skew_advisor_planted_hot_key(spark):
    # events with one user owning half the rows -> salt suggested > 1
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for _ in range(500):
        eid += 1
        rows.append((eid, base, 1, "login", 1.0, "{}"))
    for u in range(2, 502):
        eid += 1
        rows.append((eid, base, u, "login", 1.0, "{}"))
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        ).write.parquet(os.path.join(tmp, "events.parquet"))
        # the advisor also profiles tpch keys; give it tiny stand-ins
        for tbl, schema, row in [
            ("orders", "o_orderkey long, o_custkey long", (1, 1)),
            ("lineitem",
             "l_orderkey long, l_partkey long, l_suppkey long", (1, 1, 1)),
        ]:
            spark.createDataFrame([row], schema).write.parquet(
                os.path.join(tmp, f"{tbl}.parquet")
            )
        out = {
            r["key_col"]: r.asDict()
            for r in catalog.queries()["dq_skew_advisor"](
                spark, tmp
            ).collect()
        }
    ev = out["events.user_id"]
    assert ev["max_freq"] == 500
    assert ev["p99_freq"] == 1
    assert ev["salt_suggested"] == 500
    assert ev["skew_ratio_milli"] > 100_000  # hot key ~250x the mean


def test_skew_advisor_real_corpus_bounds(spark, sf_dir):
    out = catalog.queries()["dq_skew_advisor"](spark, sf_dir).collect()
    assert len(out) == 5
    for r in out:
        assert r["max_freq"] >= r["p99_freq"] >= 1
        assert r["salt_suggested"] >= 1
        assert r["n_keys"] <= r["n_rows"]
        assert r["skew_ratio_milli"] >= 1000  # max >= mean always
