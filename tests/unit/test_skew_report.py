"""Skew report: exact profile on synthetic skew, NULL-as-key, and the
recommendation thresholds."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "tools"))

from skew_report import skew_stats  # noqa: E402


def test_skew_stats_profiles_a_hot_key(spark):
    # key 0: 900 rows; keys 1..99: 1 row each -> mean ~9.99, factor ~90
    rows = [(0,)] * 900 + [(i,) for i in range(1, 100)]
    df = spark.createDataFrame(rows, ["user_id"])
    s = skew_stats(df, "user_id", top_n=3)
    assert s["distinct"] == 100 and s["total_rows"] == 999
    assert s["top_keys"][0] == {
        "key": "0",
        "count": 900,
        "share_milli": 1000 * 900 // 999,
    }
    assert s["skew_factor"] == round(900 / (999 / 100), 2)
    assert "salt by" in s["recommendation"]
    assert "broadcast" in s["recommendation"]  # 100 keys = dim-sized


def test_skew_stats_uniform_and_null_key(spark):
    rows = [(i % 10,) for i in range(100)] + [(None,)] * 5
    df = spark.createDataFrame(rows, "k int")
    s = skew_stats(df, "k", top_n=2)
    assert s["distinct"] == 11  # NULL profiled as its own key
    assert s["total_rows"] == 105
    assert s["skew_factor"] < 10
    assert "plain hash partitioning is fine" in s["recommendation"]
    # the NULL key surfaces in top keys when heavy enough
    heavy_null = [(None,)] * 80 + [(i,) for i in range(20)]
    s2 = skew_stats(spark.createDataFrame(heavy_null, "k int"), "k", top_n=1)
    assert s2["top_keys"][0]["key"] is None
    assert s2["top_keys"][0]["count"] == 80
