"""Property tests: graph_link_prediction (hand graph with a known
best non-edge), events_entropy_rate (deterministic vs uniform hand
chains), split_temporal_holdout (ordering witness + naive leakage).
"""

from __future__ import annotations

import os
import tempfile
from datetime import datetime, timedelta

from logprep_spark.plans import catalog


def _write_lineitem(spark, tmp, baskets):
    rows = []
    for ok, parts in baskets:
        for i, p in enumerate(parts, 1):
            rows.append(
                (ok, p, 1, i, 1.0, 1.0, 0.0, 0.0, "N", "O",
                 datetime(2024, 1, 1))
            )
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.parquet(os.path.join(tmp, "lineitem.parquet"))


def test_link_prediction_hand_graph(spark):
    # edges (co-occur >= 2 baskets): 1-2, 1-3, 2-4, 3-4 (a 4-cycle).
    # non-edges: (1,4) with common {2,3} cn=2, (2,3) with common {1,4}
    # cn=2 — both score jaccard 2/(2+2-2) = 1000 milli.
    baskets = [
        (100, [1, 2]), (101, [1, 2]),
        (102, [1, 3]), (103, [1, 3]),
        (104, [2, 4]), (105, [2, 4]),
        (106, [3, 4]), (107, [3, 4]),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write_lineitem(spark, tmp, baskets)
        out = catalog.queries()["graph_link_prediction"](spark, tmp)
        got = sorted(
            [(r["u"], r["v"], r["n_common"], r["jaccard_milli"])
             for r in out.collect()]
        )
    assert got == [(1, 4, 2, 1000), (2, 3, 2, 1000)]


def test_link_prediction_excludes_existing_edges(spark, sf_dir):
    out = catalog.queries()["graph_link_prediction"](spark, sf_dir)
    rows = out.collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r["u"] < r["v"]
        assert 0 < r["jaccard_milli"] <= 1000
        assert r["n_common"] <= min(r["deg_u"], r["deg_v"])


def _write_events(spark, tmp, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(os.path.join(tmp, "events.parquet"))


def test_entropy_rate_deterministic_vs_uniform(spark):
    # user 1: a->b always (deterministic: H(next|a)=0)
    # user 2: c alternates to d and e evenly (H(next|c)=1 bit)
    base = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for k in range(8):
        eid += 1
        rows.append((eid, base + timedelta(minutes=eid), 1,
                     "a" if k % 2 == 0 else "b", 1.0, "{}"))
    nxt = ["d", "e"] * 4
    for k in range(16):
        eid += 1
        rows.append((eid, base + timedelta(minutes=1000 + eid), 2,
                     "c" if k % 2 == 0 else nxt[k // 2], 1.0, "{}"))
    with tempfile.TemporaryDirectory() as tmp:
        _write_events(spark, tmp, rows)
        out = {
            r["cur_type"]: r.asDict()
            for r in catalog.queries()["events_entropy_rate"](
                spark, tmp
            ).collect()
        }
    assert out["a"]["h_cond_micro"] == 0  # fully predictable
    # c -> {d, e} evenly = exactly 1 bit
    assert out["c"]["h_cond_micro"] == 1000000
    assert out["c"]["predictability_loss_permille"] == 1000


def test_temporal_holdout_ordering_and_leakage(spark, sf_dir):
    out = catalog.queries()["split_temporal_holdout"](spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    n_train = sum(r["n_train"] for r in rows)
    n_test = sum(r["n_test"] for r in rows)
    for r in rows:
        assert r["ordering_ok"] is True
        assert r["max_train_ts"] < r["min_test_ts"]
        # a random split trains on a large share of the future
        assert r["naive_future_leaks"] > 0
    # roughly 80/20 by count
    frac = n_train / (n_train + n_test)
    assert 0.7 < frac < 0.9, frac
