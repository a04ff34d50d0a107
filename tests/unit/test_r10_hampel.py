"""events_hampel_despike: planted spike caught, level shift NOT
poisoned (the global-MAD failure mode), constant-window convention.
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
        return catalog.queries()["events_hampel_despike"](
            spark, tmp
        ).collect()[0].asDict()


def test_hampel_catches_planted_spike(spark):
    # noisy-ish series with one 10x spike on day 30
    counts = [10 + (d % 3) for d in range(60)]
    counts[30] = 100
    r = _run(spark, counts)
    assert r["n_anomalies"] >= 1
    assert r["first_anomaly_day"] == "2024-01-31", r  # day 30 0-based
    assert r["max_deviation_ratio_milli"] > 3000


def test_hampel_survives_level_shift(spark):
    # a clean step change 10 -> 30: after the window rolls past the
    # boundary, the LOCAL median adapts — only the transition days
    # near the step can flag, not the entire post-shift regime (which
    # is what a global-MAD detector would do)
    counts = [10] * 30 + [30] * 30
    r = _run(spark, counts)
    # at most the 6 windows straddling the boundary flag
    assert r["n_anomalies"] <= 6, r


def test_hampel_constant_series_flags_nothing(spark):
    r = _run(spark, [7] * 30)
    assert r["n_anomalies"] == 0
    assert r["first_anomaly_day"] is None
