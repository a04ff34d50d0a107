"""events_runs_test (planted clustered vs alternating series, exact z
replica) and join_asof_tolerance (within / stale / no-prior split)."""

from __future__ import annotations

import math
import os
import tempfile
from datetime import datetime, timedelta

from logprep_spark.plans import catalog


def _write_events(spark, tmp, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(os.path.join(tmp, "events.parquet"))


def _z(n1, n2, runs):
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1.0))
    )
    return round(1000.0 * (runs - mu) / math.sqrt(var))


def test_runs_test_clustered_vs_alternating(spark):
    base = datetime(2024, 1, 1)
    rows, eid = [], 0
    # 21 days each; the single 5-day is the lower median and drops
    # out of the dichotomy, leaving a balanced 10/10 sign series.
    # 'clustered': 10 low days then 10 high days -> 2 runs (z << 0)
    counts_c = [1] * 10 + [9] * 10 + [5]
    # 'alt': perfectly alternating 1,9 -> 20 runs (z >> 0)
    counts_a = [1 if i % 2 == 0 else 9 for i in range(20)] + [5]
    for d, (nc, na) in enumerate(zip(counts_c, counts_a)):
        for _ in range(nc):
            eid += 1
            rows.append((eid, base + timedelta(days=d, minutes=eid % 60),
                         1, "clustered", 1.0, "{}"))
        for _ in range(na):
            eid += 1
            rows.append((eid, base + timedelta(days=d, minutes=eid % 60),
                         2, "alt", 1.0, "{}"))
    with tempfile.TemporaryDirectory() as tmp:
        _write_events(spark, tmp, rows)
        out = {
            r["event_type"]: r.asDict()
            for r in catalog.queries()["events_runs_test"](
                spark, tmp
            ).collect()
        }
    c = out["clustered"]
    assert (c["n1"], c["n2"], c["n_runs"]) == (10, 10, 2)
    assert c["z_milli"] < -1960 and c["random_ok"] is False
    a = out["alt"]
    assert (a["n1"], a["n2"], a["n_runs"]) == (10, 10, 20)
    assert a["z_milli"] > 1960 and a["random_ok"] is False
    # exact replica of the reported z
    for r in (c, a):
        assert r["z_milli"] == _z(r["n1"], r["n2"], r["n_runs"])


def test_asof_tolerance_three_way_split(spark):
    base = datetime(2024, 1, 1)
    rows = [
        # user 1 logs in day 0; purchase day 3 (within), day 30 (stale)
        (1, base, 1, "login", 0.0, "{}"),
        (2, base + timedelta(days=3), 1, "purchase", 5.0, "{}"),
        (3, base + timedelta(days=30), 1, "purchase", 5.0, "{}"),
        # user 2 never logs in
        (4, base + timedelta(days=1), 2, "purchase", 5.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write_events(spark, tmp, rows)
        out = {
            r["event_type"]: r.asDict()
            for r in catalog.queries()["join_asof_tolerance"](
                spark, tmp
            ).collect()
        }
    p = out["purchase"]
    assert p["n_events"] == 3
    assert p["n_matched_within"] == 1
    assert p["n_stale"] == 1
    assert p["n_no_prior"] == 1
    assert p["match_permille"] == 333
    # the login event matches itself at-or-before (within tolerance)
    lg = out["login"]
    assert lg["n_matched_within"] == 1 and lg["n_stale"] == 0
