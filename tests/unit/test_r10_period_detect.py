"""events_period_detect: planted period recovered, harmonic ties to
the fundamental, cycle cap honored, adjustment arithmetic exact.
"""

from __future__ import annotations

import os
import tempfile
from datetime import datetime, timedelta

from logprep_spark.plans import catalog


def _run(spark, day_counts):
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d, n in enumerate(day_counts):
        for _ in range(n):
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
        return catalog.queries()["events_period_detect"](
            spark, tmp
        ).collect()


def test_planted_period_five_detected(spark):
    # 90 days of a clean period-5 pattern: 5 divides the candidate
    # range, 10 is its harmonic — the tie must resolve to 5
    counts = [30 if d % 5 == 0 else 5 for d in range(90)]
    out = _run(spark, counts)
    best = [r for r in out if r["is_best"]]
    assert len(best) == 1
    assert best[0]["p"] == 5, best
    assert best[0]["adj_permille"] > 900
    # the harmonic p=10 explains the same variance (raw), but loses
    # the argmax to the smaller fundamental
    r5 = next(r for r in out if r["p"] == 5)
    r10 = next(r for r in out if r["p"] == 10)
    assert r10["ratio_permille"] >= r5["ratio_permille"] - 1
    assert not r10["is_best"]


def test_cycle_cap_limits_candidates(spark):
    # 24 days -> candidates capped at p <= 8; p in [9, 14] absent
    counts = [10 + (d % 3) for d in range(24)]
    out = _run(spark, counts)
    ps = sorted({r["p"] for r in out})
    assert ps == list(range(2, 9)), ps


def test_adjustment_arithmetic(spark, sf_dir):
    out = catalog.queries()["events_period_detect"](spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        n, p = r["n_days"], r["p"]
        expect = 1000 - (1000 - r["ratio_permille"]) * (n - 1) // (n - p)
        # both engines truncate toward zero; python // floors — they
        # agree whenever the dividend is non-negative, which holds
        # because ratio_permille <= 1000
        assert r["adj_permille"] == expect or r["ratio_permille"] > 1000
    for typ in {r["event_type"] for r in out}:
        assert sum(1 for r in out if r["event_type"] == typ and r["is_best"]) == 1
