"""Sample-quantile sketch (bottom-k-by-hash uniform row sample):
determinism, replica equality, exact mode, KMV mergeability, and the
Hoeffding rank-error band — the guarantees that make stored per-slice
pools answer "p99 over any ad-hoc range" without raw data.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from logprep_spark.functions.sketch import (
    sq_quantiles,
    sq_sketch_slices,
    sq_stored_union_range,
    sq_union_range,
)


def _h60(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def _py_pool(rows, k):
    """rows = [(key, value)] -> k smallest (h, v) pairs by h."""
    pairs = sorted((_h60(f"sq:{key}"), v) for key, v in rows)
    return pairs[:k]


def _py_select(pool, p_milli):
    byv = sorted((v, h) for h, v in pool)
    n = len(byv)
    if n == 0:
        return None
    idx = max((p_milli * n + 999) // 1000, 1)
    return byv[idx - 1][0]


def _df(spark, rows, slice_v="a"):
    return spark.createDataFrame(
        [(slice_v, key, v) for key, v in rows], ["slice", "key", "v"]
    )


def test_sq_sketch_matches_python_replica_and_exact_mode(spark):
    rows = [(i, float(i * 7 % 101)) for i in range(200)]
    df = _df(spark, rows)
    (r,) = sq_sketch_slices(df, "slice", "key", "v", k=32).collect()
    assert r["_n_rows"] == 200
    assert r["_n_kept"] == 32
    assert [(p["_h"], p["_v"]) for p in r["_pool"]] == _py_pool(rows, 32)

    # exact mode: slice smaller than k -> the pool IS the slice
    small = rows[:10]
    (e,) = sq_sketch_slices(_df(spark, small), "slice", "key", "v", k=32).collect()
    assert e["_n_kept"] == 10 == e["_n_rows"]
    assert [(p["_h"], p["_v"]) for p in e["_pool"]] == _py_pool(small, 32)
    # exact-mode quantiles ARE the population nearest-rank quantiles
    (q,) = sq_quantiles(
        sq_sketch_slices(_df(spark, small), "slice", "key", "v", k=32), "slice"
    ).collect()
    vals = sorted(v for _, v in small)
    assert q["q500"] == vals[max((500 * 10 + 999) // 1000, 1) - 1]
    assert q["q990"] == vals[-1]


def test_sq_quantile_selection_matches_replica(spark):
    rows = [(i, float((i * 37 + 11) % 997)) for i in range(500)]
    df = _df(spark, rows)
    (q,) = sq_quantiles(
        sq_sketch_slices(df, "slice", "key", "v", k=64), "slice"
    ).collect()
    pool = _py_pool(rows, 64)
    for p in (500, 900, 990):
        assert q[f"q{p}"] == _py_select(pool, p)


def test_sq_merge_is_bottom_k_of_union(spark):
    """KMV mergeability: the k smallest pairs of the union of two
    slices' pools == the pool built over the union — per-day stored
    pools answer range queries exactly as a fresh build would."""
    rows_a = [(i, float(i % 53)) for i in range(300)]
    rows_b = [(i + 1000, float(i % 71)) for i in range(300)]
    k = 48
    pool_u = _py_pool(rows_a + rows_b, k)
    merged = sorted(_py_pool(rows_a, k) + _py_pool(rows_b, k))[:k]
    assert merged == pool_u  # the property itself, in the replica

    both = _df(spark, rows_a, "d1").unionAll(_df(spark, rows_b, "d2"))
    sketch = sq_sketch_slices(both, "slice", "key", "v", k=k)
    (got,) = sq_union_range(sketch, "slice", "d1", "d2", k=k).collect()
    assert got["n_slices"] == 2 and got["n_rows"] == 600
    assert got["n_kept"] == k
    for p in (500, 900, 990):
        assert got[f"q{p}"] == _py_select(pool_u, p)


def test_sq_union_range_filters_slices_and_handles_empty(spark):
    rows = [(i, float(i)) for i in range(100)]
    df = _df(spark, rows, "d1").unionAll(_df(spark, [(200, 5.0)], "d9"))
    sketch = sq_sketch_slices(df, "slice", "key", "v", k=16)
    (only_d1,) = sq_union_range(sketch, "slice", "d0", "d5", k=16).collect()
    assert only_d1["n_slices"] == 1 and only_d1["n_rows"] == 100
    (empty,) = sq_union_range(sketch, "slice", "x0", "x9", k=16).collect()
    assert empty["n_slices"] == 0 and empty["n_rows"] == 0
    assert empty["n_kept"] == 0 and empty["q500"] is None


def test_sq_repartition_invariance_and_null_safety(spark):
    rows = [(i, float(i * 13 % 37)) for i in range(150)]
    df = _df(spark, rows)
    withnulls = df.unionAll(
        spark.createDataFrame(
            [("a", None, 1.0), ("a", 999, None)],
            df.schema,
        )
    )
    ref = sq_quantiles(
        sq_sketch_slices(df, "slice", "key", "v", k=24), "slice"
    ).collect()
    got = sq_quantiles(
        sq_sketch_slices(withnulls.repartition(11), "slice", "key", "v", k=24),
        "slice",
    ).collect()
    assert ref == got  # null key/value rows sketch nowhere


def test_sq_rank_error_within_hoeffding_band(spark):
    """Statistical sanity at k=256 over 5000 skewed values: the exact
    rank of each estimate stays inside the 3-sigma band (+1 sample
    granularity) used by the catalog witnesses."""
    rows = [(i, float((i * i) % 1009)) for i in range(5000)]
    df = _df(spark, rows)
    (q,) = sq_quantiles(
        sq_sketch_slices(df, "slice", "key", "v", k=256), "slice"
    ).collect()
    vals = sorted(v for _, v in rows)
    for p, band in ((500, 94), (900, 56), (990, 19)):
        est = q[f"q{p}"]
        rank_milli = 1000 * sum(1 for v in vals if v <= est) // 5000
        assert abs(rank_milli - p) <= band + 1000 // 256 + 1


def test_sq_stored_pools_drive_range_queries(spark, tmp_path):
    """Stored-artifact round trip: per-slice pools written to parquet
    and read back answer range quantiles identically to the live
    frames — build once, store, query any range forever."""
    rows = [(i, float(i * 3 % 211)) for i in range(400)]
    df = _df(spark, rows[:200], "d1").unionAll(_df(spark, rows[200:], "d2"))
    sketch = sq_sketch_slices(df, "slice", "key", "v", k=32)
    p = str(tmp_path / "sq_pools")
    sketch.write.parquet(p)
    stored = spark.read.parquet(p)
    live = sq_union_range(sketch, "slice", "d1", "d2", k=32).collect()
    from_disk = sq_union_range(stored, "slice", "d1", "d2", k=32).collect()
    assert live == from_disk


def test_sq_stored_union_range_round_trip(spark, tmp_path):
    """The one-call round trip (build → write → read → merge →
    select): matches sq_union_range on the live sketch for the same
    range, reports the FULL store's slice count, and overwrites
    idempotently."""
    rows = [(i, float(i * 3 % 211)) for i in range(600)]
    df = (
        _df(spark, rows[:200], "d1")
        .unionAll(_df(spark, rows[200:400], "d2"))
        .unionAll(_df(spark, rows[400:], "d5"))  # outside range
    )
    store = str(tmp_path / "sq_store")
    (got,) = sq_stored_union_range(
        df, "slice", "key", "v", "d1", "d2", k=32, store_path=store
    ).collect()
    live_sketch = sq_sketch_slices(df, "slice", "key", "v", k=32)
    (ref,) = sq_union_range(live_sketch, "slice", "d1", "d2", k=32).collect()
    assert got["n_slices_stored"] == 3
    for c in ("n_slices", "n_rows", "n_kept", "q500", "q900", "q990"):
        assert got[c] == ref[c], c
    (again,) = sq_stored_union_range(
        df, "slice", "key", "v", "d1", "d2", k=32, store_path=store
    ).collect()
    assert again == got


def test_sq_merge_late_equals_full_build(spark):
    """KMV merge closure, end to end: per-slice pools built from two
    UNEVEN batches and merged land bit-identical on the from-scratch
    build — quantiles equal and the merge_exact witness TRUE — for
    both estimate-mode (big slice, k truncates) and exact-mode
    (small slice) rows."""
    from logprep_spark.functions.sketch import sq_merge_late

    rows = [("d1", i, float(i * 7 % 211)) for i in range(300)] + [
        ("d2", 1000 + i, float(i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["slice", "key", "v"])
    a = df.filter(F.col("key") % 3 == 0)  # uneven 1/3 vs 2/3 split
    b = df.filter(F.col("key") % 3 != 0)
    got = {
        r["slice"]: r
        for r in sq_merge_late(a, b, "slice", "key", "v", k=32).collect()
    }
    full = {
        r["slice"]: r
        for r in sq_quantiles(
            sq_sketch_slices(df, "slice", "key", "v", k=32), "slice"
        ).collect()
    }
    assert set(got) == {"d1", "d2"}
    for s in got:
        assert bool(got[s]["merge_exact"]), s
        assert got[s]["n_rows"] == full[s]["n_rows"]
        for p in (500, 900, 990):
            assert got[s][f"q{p}"] == full[s][f"q{p}"], (s, p)


def test_sq_drift_psi_detects_a_shift(spark):
    """Baseline days hold values 0..99; current days hold 100..199 —
    every current sample lands past the top decile boundary, so the
    top bucket's PSI contribution dominates. Identical ranges yield
    symmetric counts and ~zero PSI."""
    from logprep_spark.functions.sketch import sq_drift_psi

    base_rows = [(i, float(i % 100)) for i in range(400)]
    cur_rows = [(i + 10_000, 100.0 + (i % 100)) for i in range(400)]
    df = (
        _df(spark, base_rows[:200], "d1")
        .unionAll(_df(spark, base_rows[200:], "d2"))
        .unionAll(_df(spark, cur_rows[:200], "d8"))
        .unionAll(_df(spark, cur_rows[200:], "d9"))
    )
    sketch = sq_sketch_slices(df, "slice", "key", "v", k=64)
    rows = sq_drift_psi(
        sketch, "slice", "d1", "d2", "d8", "d9", k=64
    ).collect()
    assert len(rows) == 10
    by_bucket = {r["bucket"]: r for r in rows}
    assert sum(r["n_base"] for r in rows) == 64
    assert sum(r["n_cur"] for r in rows) == 64
    # all current mass in the top bucket; its contribution dominates
    assert by_bucket[9]["n_cur"] == 64
    assert by_bucket[9]["psi_micro"] == max(r["psi_micro"] for r in rows)
    assert by_bucket[9]["psi_micro"] > 1_000_000  # PSI >> 0.25 alarm line

    # no drift: same range on both sides -> identical counts, psi ~ 0
    flat = sq_drift_psi(sketch, "slice", "d1", "d2", "d1", "d2", k=64).collect()
    assert all(r["n_base"] == r["n_cur"] for r in flat)
    assert all(r["psi_micro"] == 0 for r in flat)


def test_sq_merge_late_deterministic_with_shared_keys(spark):
    """ADVICE-r9 regression: when the SAME key (hence an identical
    h60 hash) appears in both batches, the merge window's old
    hash-only ordering tie-broke nondeterministically and could
    falsify the bit-identical merge_exact witness. The full-struct
    order fix must keep merge_exact TRUE and the pool equal to the
    from-scratch build across reruns."""
    from logprep_spark.functions.sketch import sq_merge_late

    rows = [("d1", i, float(i)) for i in range(80)]
    df = spark.createDataFrame(rows, ["slice", "key", "v"])
    a = df  # every key in BOTH batches: maximal hash ties
    b = df.filter(F.col("key") < 50)
    for _ in range(2):
        (got,) = sq_merge_late(a, b, "slice", "key", "v", k=16).collect()
        assert bool(got["merge_exact"])
        assert got["n_kept"] == 16
