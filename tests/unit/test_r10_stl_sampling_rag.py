"""Property tests for the r10 fourth-wave rows: events_stl_decompose
(planted weekly rhythm recovered, anomaly localized),
sample_consistent_join (referential closure by construction vs naive
breakage), rag_context_recall (stage separability + bounds).
"""

from __future__ import annotations

import os
import tempfile
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from logprep_spark.plans import catalog


def test_stl_recovers_planted_weekly_rhythm(spark):
    # 20 weeks of a pure weekly pattern (high on slot 0, low elsewhere)
    # plus one planted spike -> seasonal strength near 1000, anomaly on
    # the spike day
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    spike_day = 77
    for d in range(140):
        n = 20 if d % 7 == 0 else 5
        if d == spike_day:
            n += 40
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, base + timedelta(days=d), 1, "login", 1.0, "{}")
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "events.parquet"))
        out = catalog.queries()["events_stl_decompose"](spark, tmp).collect()
    r = out[0].asDict()
    # the spike itself inflates residual variance; even so the weekly
    # rhythm dominates
    assert r["seasonal_strength_permille"] > 700, r
    # and the anomaly is localized EXACTLY on the planted spike day
    assert r["anomaly_day"] == (
        base + timedelta(days=spike_day)
    ).strftime("%Y-%m-%d"), r


def test_stl_pure_rhythm_near_perfect_strength(spark):
    # without any spike the weekly pattern explains almost everything
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(140):
        n = 20 if d % 7 == 0 else 5
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, base + timedelta(days=d), 1, "login", 1.0, "{}")
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "events.parquet"))
        out = catalog.queries()["events_stl_decompose"](spark, tmp).collect()
    assert out[0]["seasonal_strength_permille"] > 950, out[0]


def test_stl_strengths_bounded(spark, sf_dir):
    out = catalog.queries()["events_stl_decompose"](spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert 0 <= r["seasonal_strength_permille"] <= 1000
        assert 0 <= r["trend_strength_permille"] <= 1000
        assert r["n_days_core"] > 0


def test_consistent_sampling_referential_closure(spark, sf_dir):
    out = catalog.queries()["sample_consistent_join"](spark, sf_dir).collect()
    tot_c = tot_cc = tot_n = tot_nc = 0
    for r in out:
        # the whole point: consistent sampling is closed under the FK
        assert r["n_consistent_closed"] == r["n_consistent"], r
        tot_c += r["n_consistent"]
        tot_cc += r["n_consistent_closed"]
        tot_n += r["n_naive"]
        tot_nc += r["n_naive_closed"]
    # naive sampling breaks closure massively (~10% of naive rows
    # find their order at a 10% rate)
    assert tot_nc < tot_n * 0.3, (tot_nc, tot_n)
    # both sample at roughly the configured 10% of lineitems
    tot = sum(r["n_lineitems"] for r in out)
    assert 0.05 < tot_c / tot < 0.2
    assert 0.05 < tot_n / tot < 0.2


def test_rag_context_recall_stage_bounds(spark, sf_dir):
    out = catalog.queries()["rag_context_recall"](spark, sf_dir).collect()
    assert len(out) == 5
    for r in out:
        assert r["n_gold"] == 3
        # budget can only LOSE gold relative to the pick set
        assert r["n_gold_in_context"] <= r["n_gold_in_picks"] <= 3
        assert 0 <= r["n_kept"] <= 5
        assert (
            r["context_recall_milli"] == 1000 * r["n_gold_in_context"] // 3
        )
