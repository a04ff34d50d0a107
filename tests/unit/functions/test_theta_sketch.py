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
    theta_audience_diff,
    theta_audience_overlap,
    theta_sketch_slices,
    theta_stored_union_range,
    theta_union_range,
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


def test_empty_slice_yields_one_zero_row(spark):
    """A week constant matching no data must still produce ONE row
    estimating 0.0 — the SQL oracle always emits a row, so an empty
    crossJoin would be a latent row-count FAIL (ADVICE r7)."""
    df = _df(spark, {"a": list(range(20))})
    (row,) = theta_audience_overlap(
        df, "slice", "val", "a", "missing", k=64
    ).collect()
    assert row.est_a == 20.0
    assert row.est_b == 0.0
    assert row.est_intersection == 0.0
    assert row.exact_intersection == 0
    (row,) = theta_audience_overlap(
        df, "slice", "val", "gone", "also_gone", k=64
    ).collect()
    assert row.est_a == row.est_b == row.est_intersection == 0.0


def test_diff_exact_mode_is_exact(spark):
    df = _df(spark, {"a": list(range(40)), "b": list(range(30, 70))})
    (row,) = theta_audience_diff(df, "slice", "val", "a", "b", k=64).collect()
    assert row.est_diff_ab == 30.0 == row.exact_diff_ab
    assert row.est_diff_ba == 30.0 == row.exact_diff_ba
    assert row.err_ab_milli == 0


def test_diff_matches_python_replica(spark):
    """Estimate mode: the A\\B estimate equals the pure-Python KMV
    replica exactly (md5-deterministic), and is within ~4/√k of
    truth."""
    k = 256
    a = list(range(10_000))
    b = list(range(8_000, 18_000))
    df = _df(spark, {"a": a, "b": b})
    (row,) = theta_audience_diff(df, "slice", "val", "a", "b", k=k).collect()
    ha = sorted(_h60(v) for v in set(a))
    hb = sorted(_h60(v) for v in set(b))
    theta_ab = min(ha[k - 1], hb[k - 1])
    sa, sb = set(ha[: k - 1]), set(hb[: k - 1])
    n = sum(1 for h in sa - sb if h < theta_ab)
    assert row.est_diff_ab == round(n * float(_H_MAX_LONG) / theta_ab, 2)
    assert row.exact_diff_ab == 8_000
    assert abs(row.est_diff_ab - 8_000) / 8_000 < 4 / (k - 1) ** 0.5


def test_union_range_matches_python_replica(spark):
    """3-of-4 slices selected: the union estimate equals the Python
    θ-union replica (pool = distinct sample hashes < min θ) and is
    within ~3/√k of the exact union."""
    k = 128
    slices = {
        "2024-01-01": list(range(5_000)),
        "2024-01-08": list(range(3_000, 9_000)),
        "2024-01-15": list(range(8_000, 12_000)),
        "2024-01-22": list(range(90_000, 99_000)),  # outside range
    }
    df = _df(spark, slices)
    (row,) = theta_union_range(
        df, "slice", "val", "2024-01-01", "2024-01-15", k=k
    ).collect()
    assert row.n_slices == 3
    sel = ["2024-01-01", "2024-01-08", "2024-01-15"]
    hs = {s: sorted(_h60(v) for v in set(slices[s])) for s in sel}
    theta_u = min(hs[s][k - 1] for s in sel)
    pool = {h for s in sel for h in hs[s][: k - 1] if h < theta_u}
    assert row.est_union == round(
        len(pool) * float(_H_MAX_LONG) / theta_u, 2
    )
    assert row.exact_union == 12_000
    assert abs(row.est_union - 12_000) / 12_000 < 3 / (k - 1) ** 0.5


def test_union_range_exact_mode_and_empty_range(spark):
    df = _df(spark, {"2024-01-01": list(range(30)), "2024-01-08": list(range(20, 50))})
    (row,) = theta_union_range(
        df, "slice", "val", "2024-01-01", "2024-01-08", k=64
    ).collect()
    assert row.est_union == 50.0 == row.exact_union
    assert row.err_milli == 0
    (row,) = theta_union_range(
        df, "slice", "val", "2030-01-01", "2030-12-31", k=64
    ).collect()
    assert row.n_slices == 0
    assert row.est_union == 0.0 and row.exact_union == 0


def test_union_range_repartition_invariant(spark):
    df = _df(
        spark,
        {"a": list(range(4_000)), "b": list(range(2_000, 7_000))},
    )
    ref = theta_union_range(df, "slice", "val", "a", "b", k=128).collect()
    got = theta_union_range(
        df.repartition(17), "slice", "val", "a", "b", k=128
    ).collect()
    assert ref == got


def test_stored_round_trip_matches_direct_union(spark, tmp_path):
    """build → write parquet → read → merge → estimate: the stored
    path's estimate columns are bit-identical to theta_union_range
    over the same selection (a parquet round trip of bigint +
    array<bigint> must be value-exact), n_slices_stored counts ALL
    slices (the write-once store covers slices outside the range),
    and a second run overwrites idempotently."""
    slices = {
        "2024-01-01": list(range(5_000)),
        "2024-01-08": list(range(3_000, 9_000)),
        "2024-01-15": list(range(90_000, 94_000)),  # outside range
    }
    df = _df(spark, slices)
    store = str(tmp_path / "theta_store")
    (got,) = theta_stored_union_range(
        df, "slice", "val", "2024-01-01", "2024-01-08", k=128,
        store_path=store,
    ).collect()
    (ref,) = theta_union_range(
        df.filter(F.col("slice") <= "2024-01-08"),
        "slice", "val", "2024-01-01", "2024-01-08", k=128,
    ).collect()
    assert got.n_slices_stored == 3
    assert (got.n_slices, got.est_union, got.exact_union, got.err_milli) == (
        ref.n_slices, ref.est_union, ref.exact_union, ref.err_milli
    )
    # the store is a readable sketch table holding every slice
    stored = spark.read.parquet(store)
    assert sorted(r["slice"] for r in stored.collect()) == sorted(slices)
    (again,) = theta_stored_union_range(
        df, "slice", "val", "2024-01-01", "2024-01-08", k=128,
        store_path=store,
    ).collect()
    assert again == got


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


def test_retention_matrix_exact_mode_and_witnesses(spark):
    """Small slices (exact mode): every cell's estimates equal the
    exact counts, retention millis agree, err 0 — and the ordered
    pairing covers exactly the upper triangle."""
    from logprep_spark.functions.sketch import theta_retention_matrix

    slices = {
        "w1": [f"u{i}" for i in range(20)],
        "w2": [f"u{i}" for i in range(10, 25)],   # 10 of w1 retained
        "w3": [f"u{i}" for i in range(18, 30)],   # 2 of w1, 7 of w2
    }
    df = _df(spark, slices)
    rows = {(r.cohort, r.week): r for r in
            theta_retention_matrix(df, "slice", "val", k=64).collect()}
    assert set(rows) == {("w1", "w2"), ("w1", "w3"), ("w2", "w3")}
    want = {
        ("w1", "w2"): (20, 10),
        ("w1", "w3"): (20, 2),
        ("w2", "w3"): (15, 7),
    }
    for key, (nc, nb) in want.items():
        r = rows[key]
        assert r.exact_cohort == nc and r.exact_both == nb
        assert r.est_cohort == float(nc) and r.est_both == float(nb)
        assert r.exact_retention_milli == 1000 * nb // nc
        assert r.est_retention_milli == r.exact_retention_milli
        assert r.err_milli == 0


def test_retention_matrix_estimate_mode_replica_and_accuracy(spark):
    """k=16 over 300-user slices with a 150-user overlap: each cell
    equals the pure-Python KMV pairwise math bit-for-bit, and the
    estimate lands within the 3/sqrt(k-1) band."""
    from logprep_spark.functions.sketch import theta_retention_matrix

    k = 16
    slices = {
        "w1": [f"u{i}" for i in range(300)],
        "w2": [f"u{i}" for i in range(150, 450)],
    }
    df = _df(spark, slices)
    (r,) = theta_retention_matrix(df, "slice", "val", k=k).collect()

    def kmv(vals):
        hs = sorted(_h60(v) for v in set(vals))
        if len(hs) < k:
            return (1 << 60), set(hs), len(hs)
        return hs[k - 1], set(hs[: k - 1]), k

    t1, s1, n1 = kmv(slices["w1"])
    t2, s2, n2 = kmv(slices["w2"])
    tab = min(t1, t2)
    n_int = sum(1 for h in s1 & s2 if h < tab)
    est_c = n1 if t1 == (1 << 60) else round((k - 1) * float(1 << 60) / t1, 2)
    est_b = round(n_int * float(1 << 60) / tab, 2)
    assert r.est_cohort == est_c and r.est_both == est_b
    assert r.exact_cohort == 300 and r.exact_both == 150
    import math
    assert abs(r.est_both - 150) / 150 < 3 / math.sqrt(k - 1)


def test_hll_own_registers_merge_and_both_regimes(spark):
    """Deterministic HLL (m=512): (1) per-register MAX merge of two
    disjoint batches equals the registers of the union — the HLL
    mergeability law, bit-exact here because registers are pure h60
    integer arithmetic; (2) the small-range (linear counting) regime
    reads near-exact at tiny cardinality; (3) the raw-estimator
    regime (E > 2.5m, v_zero shrinking) stays within ~3 rsd of a 5000
    true distinct; (4) repartition invariance."""
    from logprep_spark.functions.sketch import (
        hll_own_union_range,
        hll_register_slices,
    )

    big = spark.createDataFrame(
        [("d1", f"u{i}") for i in range(5000)], ["s", "v"]
    )
    small = spark.createDataFrame(
        [("d1", f"u{i}") for i in range(40)], ["s", "v"]
    )
    # regime 2: tiny cardinality -> linear counting, near exact
    (r_small,) = hll_own_union_range(
        hll_register_slices(small, "s", "v"), "s", "d1", "d1"
    ).collect()
    assert r_small["v_zero"] > 0
    assert abs(r_small["est_distinct"] - 40) <= 4
    # regime 3: 5000 distinct over 512 registers -> raw estimator
    (r_big,) = hll_own_union_range(
        hll_register_slices(big, "s", "v"), "s", "d1", "d1"
    ).collect()
    assert abs(r_big["est_distinct"] - 5000) / 5000 <= 3 * 1.04 / (512 ** 0.5)
    # (1) merge law: two disjoint halves, registers max-merged via
    # the range union, equal the all-at-once build's estimate
    halves = spark.createDataFrame(
        [("a" if i % 2 == 0 else "b", f"u{i}") for i in range(5000)],
        ["s", "v"],
    )
    (r_merged,) = hll_own_union_range(
        hll_register_slices(halves, "s", "v"), "s", "a", "b"
    ).collect()
    assert r_merged["est_distinct"] == r_big["est_distinct"]
    assert r_merged["n_regs_present"] == r_big["n_regs_present"]
    # (4) determinism under partitioning
    (again,) = hll_own_union_range(
        hll_register_slices(big.repartition(13), "s", "v"), "s", "d1", "d1"
    ).collect()
    assert tuple(again) == tuple(r_big)
