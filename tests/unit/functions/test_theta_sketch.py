"""Theta-sketch set algebra: accuracy bounds + determinism.

The hll_audience_overlap docstring documents the inclusion–exclusion
limitation (error scales with the union, swamping small overlaps) and
names theta sketches as the fix; these tests pin that down: the
direct-intersection estimate is exact in exact mode, accurate in
estimate mode, bit-stable under repartitioning, and matches a pure-
Python replica of the KMV construction (same md5 hashes — the
cross-engine determinism the oracle gate relies on).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from logprep_spark.functions.sketch import (
    _H_MAX_LONG,
    theta_audience_overlap,
    theta_sketch_slices,
)


def _h60(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def _df(spark, slices: dict):
    rows = [(s, v) for s, vals in slices.items() for v in vals]
    return spark.createDataFrame(rows, ["slice", "val"])


def test_sketch_matches_python_replica(spark):
    """theta + estimate agree with a brute-force KMV in Python —
    including with the cardinality-hint prefilter engaged
    (1000 distinct ≫ 8·k for k=16)."""
    k = 16
    vals = list(range(1000))
    df = _df(spark, {"a": vals})
    (row,) = theta_sketch_slices(df, "slice", "val", k=k).collect()
    hs = sorted(_h60(v) for v in vals)
    assert row._theta == hs[k - 1]
    assert row._n_kept == k
    assert list(row._sample) == hs[: k - 1]


def test_exact_mode_is_exact(spark):
    """Slices under k distinct values intersect exactly."""
    df = _df(spark, {"a": list(range(40)), "b": list(range(30, 70))})
    (row,) = theta_audience_overlap(
        df, "slice", "val", "a", "b", k=64
    ).collect()
    assert row.est_intersection == 10.0 == row.exact_intersection
    assert row.err_milli == 0
    assert row.est_a == 40.0 and row.est_b == 40.0


def test_estimate_mode_accuracy(spark):
    """Moderate overlap, estimate mode: per-slice estimates within
    3/√k relative; the intersection (effective sample ≈ k·overlap/
    slice ≈ 51) within 4/√51 ≈ 56%. md5 is fixed, so these are
    deterministic assertions, not flaky statistics."""
    k = 256
    a = list(range(10_000))
    b = list(range(8_000, 18_000))  # overlap 2000
    df = _df(spark, {"a": a, "b": b})
    (row,) = theta_audience_overlap(
        df, "slice", "val", "a", "b", k=k
    ).collect()
    assert row.exact_intersection == 2000
    for est in (row.est_a, row.est_b):
        assert abs(est - 10_000) / 10_000 < 3 / (k - 1) ** 0.5
    assert abs(row.est_intersection - 2000) / 2000 < 0.56


def test_repartitioning_never_changes_the_estimate(spark):
    a = list(range(5_000))
    b = list(range(4_000, 9_000))
    df = _df(spark, {"a": a, "b": b})
    ref = theta_audience_overlap(df, "slice", "val", "a", "b", k=128).collect()
    got = theta_audience_overlap(
        df.repartition(13), "slice", "val", "a", "b", k=128
    ).collect()
    assert ref == got


def test_prefilter_never_loses_the_kth_hash(spark):
    """The 8× margin: with and without the hint prefilter the sketch
    is identical (force no-prefilter by keeping the slice under 8k)."""
    vals = list(range(500))
    df = _df(spark, {"a": vals})
    # k=64: 500 < 8·64 → no prefilter; k=16: 500 > 128 → prefilter on.
    # Both must agree with the brute hash order on their prefix.
    hs = sorted(_h60(v) for v in vals)
    for k in (16, 64):
        (row,) = theta_sketch_slices(df, "slice", "val", k=k).collect()
        assert row._theta == hs[k - 1]
        assert list(row._sample) == hs[: k - 1]
        assert row._theta < _H_MAX_LONG
