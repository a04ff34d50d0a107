"""events_burst_kleinberg: planted episode labeled exactly, quiet
series stays quiet, Python Viterbi replica equality.
"""

from __future__ import annotations

import math
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
        return catalog.queries()["events_burst_kleinberg"](
            spark, tmp
        ).collect()[0].asDict()


def _round_half_away(x: float) -> int:
    # Spark and DuckDB round() round half AWAY from zero; Python's
    # built-in round() is banker's half-even — an exact .5 input
    # would silently diverge the replica (ADVICE-r10).
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _viterbi(xs):
    n, s = len(xs), sum(xs)
    r0u = _round_half_away(1_000_000 * s / n)
    lr0 = _round_half_away(1_000_000 * math.log(s / n))
    lr1 = _round_half_away(1_000_000 * math.log(2 * s / n))
    G = 1_000_000
    c0, c1 = r0u - xs[0] * lr0, G + 2 * r0u - xs[0] * lr1
    p0, p1 = "0", "1"
    for x in xs[1:]:
        c0, c1, p0, p1 = (
            min(c0, c1) + r0u - x * lr0,
            min(c0 + G, c1) + 2 * r0u - x * lr1,
            (p0 if c0 <= c1 else p1) + "0",
            (p0 if c0 + G <= c1 else p1) + "1",
        )
    return p0 if c0 <= c1 else p1


def test_burst_planted_episode_exact(spark):
    # baseline 10/day, days 20-24 burst at 40/day (4x the base rate)
    counts = [10] * 40
    for d in range(20, 25):
        counts[d] = 40
    r = _run(spark, counts)
    path = _viterbi(counts)
    want_days = path.count("1")
    assert r["n_burst_days"] == want_days
    assert r["n_episodes"] == 1
    # the labeled days are exactly the planted window (replica agrees)
    assert path[20:25] == "11111"
    assert r["first_burst_day"] == "2024-01-21"
    d0 = (datetime(2024, 1, 1) - datetime(1970, 1, 1)).days
    assert r["burst_day_checksum"] == sum(
        d0 + i for i, c in enumerate(path) if c == "1"
    )


def test_burst_quiet_series_no_episodes(spark):
    counts = [10 + (d % 2) for d in range(40)]
    r = _run(spark, counts)
    assert r["n_burst_days"] == 0
    assert r["n_episodes"] == 0
    assert r["first_burst_day"] is None
    assert r["burst_day_checksum"] == 0


def test_burst_two_episodes_counted(spark):
    counts = [10] * 50
    for d in list(range(10, 14)) + list(range(35, 39)):
        counts[d] = 45
    r = _run(spark, counts)
    assert r["n_episodes"] == 2, r
    path = _viterbi(counts)
    assert r["n_burst_days"] == path.count("1")
