"""Holt double-exponential smoothing fold: Python-replica equality
for the integer milli recurrence, trend tracking, single-period edge,
repartition invariance.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from logprep_spark.plans.analytics import holt_forecast


def _trunc_div(y: int, d: int) -> int:
    """Truncate toward zero — both Spark `div` and DuckDB `//`."""
    q = abs(y) // d
    return q if y >= 0 else -q


def _replica(xs, a=300, b=100):
    l, t, r = xs[0] * 1000, 0, 0
    for x in xs[1:]:
        resid = abs(x * 1000 - (l + t))
        l_new = _trunc_div(a * x * 1000 + (1000 - a) * (l + t), 1000)
        t = _trunc_div(b * (l_new - l) + (1000 - b) * t, 1000)
        l, r = l_new, max(r, resid)
    return {
        "n_periods": len(xs),
        "level_milli": l,
        "trend_milli": t,
        "forecast_milli": l + t,
        "max_resid_milli": r,
    }


def _series(spark, xs, grp="g"):
    return spark.createDataFrame(
        [(grp, i, x) for i, x in enumerate(xs)], ["grp", "period", "x"]
    )


def test_holt_matches_python_replica(spark):
    xs = [50, 55, 60, 52, 70, 65, 80, 78, 90, 30]  # spike-down at end
    (r,) = holt_forecast(_series(spark, xs), "grp", "period", "x").collect()
    want = _replica(xs)
    assert {k: r[k] for k in want} == want
    # the end spike is the largest one-step-ahead residual
    assert r["max_resid_milli"] >= abs(30 - 90) * 1000 - 100_000


def test_holt_tracks_a_linear_trend(spark):
    """On x_i = 100 + 10·i the fitted trend converges toward +10
    (milli 10_000) and the forecast lands near the true next value."""
    xs = [100 + 10 * i for i in range(40)]
    (r,) = holt_forecast(_series(spark, xs), "grp", "period", "x").collect()
    assert {k: r[k] for k in ("level_milli", "trend_milli")} == {
        k: _replica(xs)[k] for k in ("level_milli", "trend_milli")
    }
    assert abs(r["trend_milli"] - 10_000) < 3_000
    assert abs(r["forecast_milli"] - (100 + 10 * 40) * 1000) < 30_000


def test_holt_negative_trend_and_single_period(spark):
    """A falling series drives trend NEGATIVE — the truncate-toward-
    zero division contract must match the replica on negatives too;
    a single-period group is its own level with zero trend."""
    xs = [1000 - 40 * i for i in range(20)]
    (r,) = holt_forecast(_series(spark, xs), "grp", "period", "x").collect()
    want = _replica(xs)
    assert {k: r[k] for k in want} == want
    assert r["trend_milli"] < 0

    (one,) = holt_forecast(_series(spark, [7]), "grp", "period", "x").collect()
    assert one["n_periods"] == 1
    assert one["level_milli"] == 7000 and one["trend_milli"] == 0
    assert one["forecast_milli"] == 7000 and one["max_resid_milli"] == 0


def test_holt_multi_group_and_repartition_invariance(spark):
    xs_a = [10, 20, 15, 30]
    xs_b = [5, 5, 5]
    df = _series(spark, xs_a, "a").unionAll(_series(spark, xs_b, "b"))
    got = {
        r["grp"]: r.asDict()
        for r in holt_forecast(df.repartition(7), "grp", "period", "x").collect()
    }
    for g, xs in (("a", xs_a), ("b", xs_b)):
        want = _replica(xs)
        assert {k: got[g][k] for k in want} == want
    # flat series: zero trend, forecast = level = x
    assert got["b"]["trend_milli"] == 0 and got["b"]["forecast_milli"] == 5000


# --- Holt-Winters additive seasonal -----------------------------------


def _hw_replica(xs, p=7, a=300, b=100, g=300):
    from logprep_spark.plans.analytics import holt_winters_forecast  # noqa: F401

    l, t, r, i = xs[0] * 1000, 0, 0, 0
    s = [0] * p
    for x in xs[1:]:
        i += 1
        sl = i % p
        resid = abs(x * 1000 - (l + t + s[sl]))
        ln = _trunc_div(a * (x * 1000 - s[sl]) + (1000 - a) * (l + t), 1000)
        tn = _trunc_div(b * (ln - l) + (1000 - b) * t, 1000)
        s[sl] = _trunc_div(g * (x * 1000 - ln) + (1000 - g) * s[sl], 1000)
        l, t, r = ln, tn, max(r, resid)
    return {
        "n_periods": len(xs),
        "level_milli": l,
        "trend_milli": t,
        "forecast_milli": l + t + s[(i + 1) % p],
        "season_amp_milli": max(s) - min(s),
        "max_resid_milli": r,
    }


def _hw_run(spark, groups: dict, partitions: int = 1):
    from logprep_spark.plans.analytics import holt_winters_forecast

    rows = [
        (grp, idx, x)
        for grp, xs in groups.items()
        for idx, x in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, ["grp", "d", "x"])
    if partitions > 1:
        df = df.repartition(partitions)
    return {
        r["grp"]: r.asDict()
        for r in holt_winters_forecast(df, "grp", "d", "x").collect()
    }


def test_hw_matches_python_replica(spark):
    """Noisy weekly cycle + declining trend (negative milli divisions
    exercised) — the fitted struct equals the truncating replica
    exactly, per group."""
    weekly = [20, 35, 30, 25, 40, 60, 55]
    rising = [10 + 2 * k + weekly[k % 7] for k in range(21)]
    falling = [300 - 9 * k + (weekly[k % 7] if k % 3 else -7) for k in range(20)]
    got = _hw_run(spark, {"up": rising, "down": falling})
    for name, xs in (("up", rising), ("down", falling)):
        exp = _hw_replica(xs)
        assert {k: got[name][k] for k in exp} == exp, name


def test_hw_captures_pure_cycle(spark):
    """A perfectly periodic zero-trend series: the seasonal state
    must absorb the cycle — amplitude within 30% of the true 50·1000
    after 6 full weeks, trend near zero."""
    cycle = [100, 80, 120, 90, 110, 70, 130]
    xs = cycle * 6
    got = _hw_run(spark, {"c": xs})["c"]
    assert got == {**got, **_hw_replica(xs)}  # replica first, always
    true_amp = (max(cycle) - min(cycle)) * 1000
    assert abs(got["season_amp_milli"] - true_amp) <= true_amp * 3 // 10
    assert abs(got["trend_milli"]) < 2000


def test_hw_single_period_edge(spark):
    got = _hw_run(spark, {"one": [42]})["one"]
    assert got["level_milli"] == 42_000
    assert got["trend_milli"] == 0
    assert got["season_amp_milli"] == 0
    assert got["forecast_milli"] == 42_000
    assert got["max_resid_milli"] == 0


def test_hw_repartition_invariance(spark):
    xs = [17, 23, 5, 40, 31, 12, 26, 19, 44, 8, 35, 29, 15, 22]
    assert _hw_run(spark, {"g": xs}, partitions=7) == _hw_run(
        spark, {"g": xs}
    )


# --- CUSUM change-point detection --------------------------------------


def _cusum_replica(xs, b=7):
    mu = 1000 * sum(xs[:min(len(xs), b)]) // min(len(xs), b)
    kappa, h = mu // 20, mu // 2
    hi = lo = mx = first = n_alarms = 0
    for i, x in enumerate(xs[b:], start=b + 1):
        hi = max(0, hi + x * 1000 - mu - kappa)
        lo = max(0, lo + mu - x * 1000 - kappa)
        mx = max(mx, hi, lo)
        if hi > h or lo > h:
            n_alarms += 1
            if first == 0:
                first = i
    return {
        "n_periods": len(xs),
        "mu_milli": mu,
        "max_cusum_milli": mx,
        "first_alarm_period": first,
        "n_alarm_periods": n_alarms,
    }


def _cusum_run(spark, groups, partitions=1):
    from logprep_spark.plans.analytics import cusum_shift

    rows = [
        (g, i, x) for g, xs in groups.items() for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, ["grp", "d", "x"])
    if partitions > 1:
        df = df.repartition(partitions)
    return {
        r["grp"]: r.asDict() for r in cusum_shift(df, "grp", "d", "x").collect()
    }


def test_cusum_detects_persistent_shift_not_noise(spark):
    """A 15% persistent drop alarms within a few periods; symmetric
    noise around the baseline never does; an upward shift trips the
    high side — each replica-exact."""
    steady = [100, 102, 98, 101, 99, 100, 100]
    dropped = steady + [85] * 10          # -15% persistent
    noisy = steady + [104, 96, 103, 97, 105, 95, 104, 96, 103, 97]
    spiked = steady + [118] * 8           # +18% persistent
    got = _cusum_run(
        spark, {"drop": dropped, "noise": noisy, "spike": spiked}
    )
    for name, xs in (("drop", dropped), ("noise", noisy), ("spike", spiked)):
        exp = _cusum_replica(xs)
        assert {k: got[name][k] for k in exp} == exp, name
    assert got["drop"]["first_alarm_period"] > 0
    assert got["noise"]["first_alarm_period"] == 0
    assert got["noise"]["n_alarm_periods"] == 0
    assert got["spike"]["first_alarm_period"] > 0


def test_cusum_short_series_and_invariance(spark):
    short = [50, 51, 49]  # shorter than the baseline window
    got = _cusum_run(spark, {"s": short})["s"]
    assert got["mu_milli"] == 1000 * 150 // 3
    assert got["max_cusum_milli"] == 0 and got["n_alarm_periods"] == 0
    xs = [60, 62, 58, 61, 59, 60, 60, 40, 41, 39, 40]
    assert _cusum_run(spark, {"g": xs}, partitions=4) == _cusum_run(
        spark, {"g": xs}
    )


# --- Wald SPRT sequential A/B ------------------------------------------


def _sprt_run(spark, streams, s_inc, f_inc, bound, partitions=1):
    from logprep_spark.plans.analytics import sprt_ab

    rows = [
        (v, i, x) for v, xs in streams.items() for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, ["variant", "seq", "x"])
    if partitions > 1:
        df = df.repartition(partitions)
    return {
        r["variant"]: r.asDict()
        for r in sprt_ab(
            df,
            variant_col=F.col("variant"),
            success_col=F.col("x").cast("long"),
            order_cols=["seq"],
            s_inc_micro=s_inc,
            f_inc_micro=f_inc,
            bound_micro=bound,
        ).collect()
    }


def test_sprt_decisions_and_stickiness(spark):
    """With +100/-50 increments and boundary 300: six successes
    cross +300 at observation 3 and the decision STAYS 1 even after
    a run of failures; all-failure stream crosses -300 at 6; an
    alternating stream never decides."""
    streams = {
        1: [1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        0: [0] * 8,
        2: [1, 0, 1, 0, 1, 0, 1, 0],
    }
    got = _sprt_run(spark, streams, 100, -50, 300)
    assert got[1]["decision"] == 1 and got[1]["decided_at_obs"] == 3
    assert got[1]["llr_at_decision_micro"] == 300
    assert got[1]["final_llr_micro"] == 300 - 9 * 50  # keeps accumulating
    assert got[0]["decision"] == -1 and got[0]["decided_at_obs"] == 6
    assert got[2]["decision"] == 0 and got[2]["decided_at_obs"] == 0
    assert got[2]["final_llr_micro"] == 4 * 100 - 4 * 50

    assert _sprt_run(spark, streams, 100, -50, 300, partitions=5) == got


# --- integer-exact ACF --------------------------------------------------


def test_acf_pure_cycle_and_replica(spark):
    """A pure period-4 cycle: ACF peaks at exactly lag 4 and 8, dips
    negative at half-period; values equal the integer replica."""
    from logprep_spark.plans.analytics import acf_lags

    xs = [10, 20, 30, 20] * 6
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], ["d", "x"]
    )
    got = {
        r["lag"]: r["acf_milli"]
        for r in acf_lags(df, "d", "x", max_lag=8).collect()
    }

    n, s = len(xs), sum(xs)

    def replica(k):
        num = sum(
            (n * xs[i] - s) * (n * xs[i + k] - s) for i in range(n - k)
        )
        den = sum((n * x - s) ** 2 for x in xs)
        q = abs(1000 * num) // den
        return q if num >= 0 else -q

    for k in range(1, 9):
        assert got[k] == replica(k), k
    assert got[4] > 700 and got[8] > 500      # the cycle
    assert got[2] < -700                       # the half-period dip
    # repartition invariance
    again = {
        r["lag"]: r["acf_milli"]
        for r in acf_lags(
            df.repartition(5), "d", "x", max_lag=8
        ).collect()
    }
    assert again == got


def test_acf_grouped_and_short_series_guard(spark):
    from logprep_spark.plans.analytics import acf_lags

    rows = [("a", i, [5, 9][i % 2]) for i in range(12)] + [
        ("short", i, i) for i in range(3)
    ]
    df = spark.createDataFrame(rows, ["g", "d", "x"])
    got = acf_lags(df, "d", "x", max_lag=4, group_col="g").collect()
    # short series (n <= max_lag) is excluded rather than emitting
    # divide-by-zero garbage
    assert {r["g"] for r in got} == {"a"}
    byg = {r["lag"]: r["acf_milli"] for r in got}
    # lag-2 ACF of a perfect alternation is (n-2)/n, not 1: the
    # numerator loses its two boundary terms (n=12 -> exactly 833)
    assert byg[2] == 833 and byg[1] < -800


# --- Theil-Sen robust trend ---------------------------------------------


def test_theilsen_robust_vs_ls(spark):
    """A clean slope-3 line with ONE wild outlier: TS recovers the
    true slope exactly (3,000,000 micro), LS is dragged far off;
    median convention and pair slopes replica-checked."""
    from logprep_spark.plans.analytics import theil_sen_trend

    ys = [10 + 3 * i for i in range(11)]
    # the outlier sits at the END: a contaminated point at the mean
    # of x moves only the intercept (zero leverage on the slope)
    ys[10] = 500
    df = spark.createDataFrame(
        [("g", i, y) for i, y in enumerate(ys)], ["g", "d", "y"]
    )
    (r,) = theil_sen_trend(df, "g", "d", "y").collect()

    n = len(ys)
    slopes = sorted(
        (1_000_000 * (ys[j] - ys[i])) // (j - i) if (ys[j] - ys[i]) >= 0
        else -((-1_000_000 * (ys[j] - ys[i])) // (j - i))
        for i in range(n) for j in range(i + 1, n)
    )
    assert r["n_pairs"] == n * (n - 1) // 2
    assert r["ts_slope_micro"] == slopes[(len(slopes) + 1) // 2 - 1]
    assert r["ts_slope_micro"] == 3_000_000       # exact recovery
    assert abs(r["ls_slope_micro"] - 3_000_000) > 2_000_000  # LS dragged

    # clean line: both agree exactly
    clean = spark.createDataFrame(
        [("g", i, 10 + 3 * i) for i in range(11)], ["g", "d", "y"]
    )
    (c,) = theil_sen_trend(clean, "g", "d", "y").collect()
    assert c["ts_slope_micro"] == c["ls_slope_micro"] == 3_000_000

    # repartition invariance
    (rr,) = theil_sen_trend(
        df.repartition(4), "g", "d", "y"
    ).collect()
    assert rr == r


# --- Kaplan-Meier survival ----------------------------------------------


def test_km_textbook_example(spark):
    """Hand-computed KM with censoring (classic small example):
    events at t=1 (2 of 10), t=3 (1 of 7: one censored at 2 left 7
    at risk), t=5 (2 of 4: censoring at 4 again thins the risk set).
    Censored subjects deplete at_risk WITHOUT stepping the curve."""
    from logprep_spark.plans.analytics import km_survival

    obs = (
        [(1, 1)] * 2 + [(2, 0)]      # 2 events @1, 1 censored @2
        + [(3, 1)] + [(4, 0)] * 2    # 1 event @3, 2 censored @4
        + [(5, 1)] * 2 + [(6, 0)] * 2  # 2 events @5, 2 censored @6
    )
    df = spark.createDataFrame(obs, ["t", "event"])
    rows = {r["t"]: r for r in km_survival(df, "t", "event").collect()}
    assert set(rows) == {1, 3, 5}
    assert (rows[1]["at_risk"], rows[1]["n_events"]) == (10, 2)
    s1 = (1_000_000 * 8) // 10
    assert rows[1]["surv_micro"] == s1
    assert (rows[3]["at_risk"], rows[3]["n_events"]) == (7, 1)
    s3 = (s1 * 6) // 7
    assert rows[3]["surv_micro"] == s3
    assert (rows[5]["at_risk"], rows[5]["n_events"]) == (4, 2)
    assert rows[5]["surv_micro"] == (s3 * 2) // 4

    # no censoring: KM reduces to the empirical survival function
    plain = spark.createDataFrame(
        [(t, 1) for t in [1, 1, 2, 3, 3, 3]], ["t", "event"]
    )
    got = {
        r["t"]: r["surv_micro"]
        for r in km_survival(plain, "t", "event").collect()
    }
    assert got[1] == (1_000_000 * 4) // 6
    assert got[3] == 0

    # repartition invariance
    again = {
        r["t"]: r.asDict()
        for r in km_survival(df.repartition(4), "t", "event").collect()
    }
    assert again == {t: r.asDict() for t, r in rows.items()}


# --- Mann-Whitney U -----------------------------------------------------


def test_mann_whitney_hand_values(spark):
    """Textbook U: variant 1 = {1,2,3}, variant 0 = {4,5,6} gives
    U1 = 0 (total separation, rank-biserial -1000); swap to
    {4,5,6} vs {1,2,3} gives U1 = 9 = n0*n1 (+1000); full ties give
    midranks and U1 = n0*n1/2 exactly (effect 0)."""
    from logprep_spark.plans.analytics import mann_whitney_u

    def run(v1, v0):
        rows = [(v, 1) for v in v1] + [(v, 0) for v in v0]
        df = spark.createDataFrame(rows, ["vm", "variant"])
        (r,) = mann_whitney_u(df, "vm", "variant").collect()
        return r

    lo = run([1, 2, 3], [4, 5, 6])
    assert lo["u_times_2"] == 0 and lo["rank_biserial_milli"] == -1000
    assert lo["z_milli"] < -1900

    hi = run([4, 5, 6], [1, 2, 3])
    assert hi["u_times_2"] == 2 * 9 and hi["rank_biserial_milli"] == 1000

    tie = run([7, 7, 7], [7, 7, 7])
    assert tie["u_times_2"] == 9  # 2*U1 = n0*n1 at full ties
    assert tie["rank_biserial_milli"] == 0
    assert tie["z_milli"] == 0  # zero rank variance: no information

    # interleaved: hand midranks — {1,3,3} vs {2,3,5}:
    # sorted 1,2,3,3,3,5; midrank(3) = 4 -> R1 = 1+4+4 = 9,
    # U1 = 9 - 6 = 3, 2U1 = 6
    mid = run([1, 3, 3], [2, 3, 5])
    assert mid["u_times_2"] == 6


# --- chi-square contingency ---------------------------------------------


def test_chi_square_cells_hand_table(spark):
    """Hand 2x2: perfect independence gives zero contribution in
    every cell; a fully dependent diagonal table gives chi2 = N
    (the 2x2 maximum: phi = 1)."""
    from logprep_spark.plans.analytics import chi_square_cells

    indep = (
        [("a", 0)] * 20 + [("a", 1)] * 20
        + [("b", 0)] * 10 + [("b", 1)] * 10
    )
    df = spark.createDataFrame(indep, ["rr", "cc"])
    rows = chi_square_cells(df, "rr", "cc").collect()
    assert all(r["chi_contrib_micro"] == 0 for r in rows)
    assert {(r["rr"], r["cc"]): r["expected_milli"] for r in rows} == {
        ("a", 0): 20_000, ("a", 1): 20_000,
        ("b", 0): 10_000, ("b", 1): 10_000,
    }

    dep = [("a", 0)] * 15 + [("b", 1)] * 15
    drows = chi_square_cells(
        spark.createDataFrame(dep, ["rr", "cc"]), "rr", "cc"
    ).collect()
    # 2x2 with zero off-diagonals: chi2 = N = 30 (phi = 1); the two
    # populated cells each contribute N/4... sum over PRESENT cells
    # only (empty cells produce no row) = 2 * N/4 = N/2 here
    total = sum(r["chi_contrib_micro"] for r in drows)
    assert total == 2 * (30_000_000 // 4)
    assert len(drows) == 2  # absent cells emit no row (documented)


# --- CUPED --------------------------------------------------------------


def test_cuped_hand_values(spark):
    """Balanced design: x distributions identical per variant and
    y = 2x + 50·variant — theta is exactly 2, rho^2 ~ 1, and the
    adjusted difference recovers the true +50 shift. Imbalanced
    design: the adjusted difference lands far closer to the true
    shift than the raw one — but not exactly on it (pooled theta is
    confounded; CUPED assumes randomization). Uncorrelated covariate: the adjustment is a
    no-op."""
    from logprep_spark.plans.analytics import cuped_adjusted_means

    # (a) balanced: users i and i+10 share the same x; variant = i//10
    rows = [
        (i, i // 10, 100 + 13 * (i % 10), 2 * (100 + 13 * (i % 10)) + 50 * (i // 10))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["uid", "variant", "x", "y"])
    got = {
        r["variant"]: r
        for r in cuped_adjusted_means(df, "variant", "x", "y").collect()
    }
    assert got[0]["theta_micro"] == 2_000_000
    # rho^2 is NOT 1: the treatment shift itself adds y-variance the
    # covariate cannot explain — 4Vx/(4Vx + 2500·Vv) = 899 milli here
    assert got[0]["var_reduction_milli"] == 899
    diff_adj = got[1]["mean_adj_micro"] - got[0]["mean_adj_micro"]
    assert abs(diff_adj - 50_000) <= 2_000

    # (b) imbalanced covariate: variant 1 got luckier pre-period
    # users; raw diff overstates the true +50 shift, adjusted
    # recovers it better
    rows_b = [
        (i, 0, 100 + 13 * i, 2 * (100 + 13 * i)) for i in range(10)
    ] + [
        (10 + i, 1, 200 + 13 * i, 2 * (200 + 13 * i) + 50)
        for i in range(10)
    ]
    db = spark.createDataFrame(rows_b, ["uid", "variant", "x", "y"])
    gb = {
        r["variant"]: r
        for r in cuped_adjusted_means(db, "variant", "x", "y").collect()
    }
    raw = gb[1]["mean_y_micro"] - gb[0]["mean_y_micro"]
    adj = gb[1]["mean_adj_micro"] - gb[0]["mean_adj_micro"]
    # the adjustment pulls hard toward the truth (250k raw -> 18k
    # adj vs a 50k true shift) but does NOT recover it exactly:
    # pooled theta is itself confounded when the covariate is
    # imbalanced — CUPED is variance reduction under randomization,
    # not causal correction. The caveat, pinned.
    assert abs(adj - 50_000) < abs(raw - 50_000) // 4

    # (c) uncorrelated covariate: no-op adjustment
    flat = spark.createDataFrame(
        [(i, i % 2, (i * 7) % 11, 100 + (i % 2)) for i in range(40)],
        ["uid", "variant", "x", "y"],
    )
    g2 = {
        r["variant"]: r
        for r in cuped_adjusted_means(flat, "variant", "x", "y").collect()
    }
    assert abs(g2[0]["theta_micro"]) < 100_000
    assert g2[0]["var_reduction_milli"] < 200


def test_did_separates_preexisting_gap(spark):
    """Hand panel: both groups trend +10; treatment adds +7 to group
    1 only; group 1 started 100 higher. Naive post diff = 107,
    DiD = exactly 7 — the pre-existing gap removed."""
    import json as _json

    from logprep_spark.plans import catalog

    # exercise the estimator shape directly via the same arithmetic
    rows = [
        (i, 0, 200, 210) for i in range(10)
    ] + [
        (10 + i, 1, 300, 317) for i in range(10)
    ]
    from pyspark.sql import functions as F2

    df = spark.createDataFrame(rows, ["uid", "variant", "x", "y"])
    cells = df.groupBy("variant").agg(
        F2.count(F2.lit(1)).alias("nv"),
        F2.expr("1000 * CAST(sum(x) AS BIGINT) div count(1)").alias("_pre"),
        F2.expr("1000 * CAST(sum(y) AS BIGINT) div count(1)").alias("_post"),
    )
    wide = cells.agg(
        F2.max(F2.when(F2.col("variant") == 0, F2.col("_pre"))).alias("pre0"),
        F2.max(F2.when(F2.col("variant") == 0, F2.col("_post"))).alias("post0"),
        F2.max(F2.when(F2.col("variant") == 1, F2.col("_pre"))).alias("pre1"),
        F2.max(F2.when(F2.col("variant") == 1, F2.col("_post"))).alias("post1"),
    ).selectExpr(
        "(post1 - pre1) - (post0 - pre0) AS did",
        "post1 - post0 AS naive",
    ).collect()[0]
    assert wide["did"] == 7_000
    assert wide["naive"] == 107_000


def test_mann_kendall_hand_computed(spark):
    """Hand-computed Mann-Kendall: a strictly increasing 10-period
    series has S = 45 (all pairs concordant), untied 18*Var =
    10*9*25 = 2250, z = 44/sqrt(125) = 3.935 -> 'increasing'; its
    mirror is 'decreasing'; an all-tied series has Var = 0 and
    honestly reads z = 0 / no_trend instead of dividing by zero; and
    a tied series's var_s18 carries the exact Kendall tie correction
    (two pairs tied -> minus 2 * 2*1*9 = 36)."""
    from logprep_spark.plans.analytics import mann_kendall_trend

    rows = (
        [("up", i, i * 10) for i in range(1, 11)]
        + [("down", i, 200 - i * 10) for i in range(1, 11)]
        + [("flat", i, 7) for i in range(1, 11)]
        + [("tied", 1, 1), ("tied", 2, 1), ("tied", 3, 2),
           ("tied", 4, 2), ("tied", 5, 3)]
    )
    df = spark.createDataFrame(rows, ["g", "p", "y"])
    got = {r["g"]: r for r in
           mann_kendall_trend(df, "g", "p", "y").collect()}
    up = got["up"]
    assert up["s_stat"] == 45 and up["var_s18"] == 2250
    assert up["z_milli"] == 3935  # 44 / sqrt(125) = 3.9353
    assert up["trend"] == "increasing"
    down = got["down"]
    assert down["s_stat"] == -45 and down["trend"] == "decreasing"
    assert down["z_milli"] == -3935
    flat = got["flat"]
    assert flat["s_stat"] == 0 and flat["var_s18"] == 0
    assert flat["z_milli"] == 0 and flat["trend"] == "no_trend"
    tied = got["tied"]
    # S: pairs (i<j): concordant 8, tied 2 -> S = 8
    assert tied["s_stat"] == 8
    # 18Var = 5*4*15 - 2*(2*1*9) = 300 - 36 = 264
    assert tied["var_s18"] == 264
    # deterministic under repartitioning
    again = {r["g"]: tuple(r) for r in
             mann_kendall_trend(df.repartition(7), "g", "p", "y").collect()}
    assert again == {k: tuple(v) for k, v in got.items()}


def test_touch_attribution_hand_timeline(spark):
    """Hand-built attribution timeline: user 1's purchase follows a
    view (day 1) then a click (day 3) -> first-touch credits view,
    last-touch credits click; user 2's only touch is 8 days old ->
    the '(none)' row; user 3's two touches share one timestamp ->
    the event_id tie-break is deterministic (higher id wins last,
    lower id wins first). Value lands in exact cents on the
    last-touch row."""
    from datetime import datetime as dt

    from logprep_spark.plans.analytics import touch_attribution

    rows = [
        (1, dt(2024, 1, 1), 1, "view", 0.0),
        (2, dt(2024, 1, 3), 1, "click", 0.0),
        (3, dt(2024, 1, 4), 1, "purchase", 10.5),
        (4, dt(2024, 1, 1), 2, "view", 0.0),
        (5, dt(2024, 1, 9, 12), 2, "purchase", 3.0),   # touch 8.5d old
        (6, dt(2024, 2, 1), 3, "signup", 0.0),
        (7, dt(2024, 2, 1), 3, "click", 0.0),          # same ts as 6
        (8, dt(2024, 2, 2), 3, "purchase", 2.0),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    got = {r["touch_type"]: r for r in touch_attribution(df).collect()}
    assert got["view"]["first_touch_conversions"] == 1      # user 1
    assert got["view"]["last_touch_conversions"] == 0
    assert got["click"]["last_touch_conversions"] == 2      # users 1+3
    assert got["click"]["last_touch_value_cents"] == 1250   # 10.50+2.00
    assert got["signup"]["first_touch_conversions"] == 1    # tie: id 6
    assert got["signup"]["last_touch_conversions"] == 0     # tie: id 7 wins last
    assert got["(none)"]["last_touch_conversions"] == 1     # user 2
    assert got["(none)"]["last_touch_value_cents"] == 300


def test_spearman_and_trimmed_mean_hand_cases(spark):
    """Spearman via Pearson-on-average-ranks (tie-exact): a perfectly
    monotone pair reads +1000, its mirror -1000, and a TIED case is
    hand-computed with doubled average ranks (the 6-sum-d2 shortcut
    would be wrong here — that is the point of the Pearson form).
    Trimmed mean: one huge outlier in 20 values moves the raw mean
    but not the 5%-trimmed one."""
    from pyspark.sql import Window

    # --- spearman on a tied series, hand-computed ---
    # x: [1, 2, 2, 3], y: [10, 30, 30, 20]
    # doubled avg ranks rx: [2, 5, 5, 8]; ry: [2, 8, 8, 5]... wait:
    # y sorted: 10,20,30,30 -> ranks 1,2,3.5,3.5 -> doubled 2,4,7,7
    # so ry (in x order): [2, 7, 7, 4]
    rows = [("g", 1, 1, 10), ("g", 2, 2, 30), ("g", 3, 2, 30), ("g", 4, 3, 20)]
    df = spark.createDataFrame(rows, ["g", "d", "x", "y"])
    rx = (2 * F.rank().over(Window.partitionBy("g").orderBy("x"))
          + F.count(F.lit(1)).over(Window.partitionBy("g", "x")) - 1)
    ry = (2 * F.rank().over(Window.partitionBy("g").orderBy("y"))
          + F.count(F.lit(1)).over(Window.partitionBy("g", "y")) - 1)
    ranked = df.select("g", rx.cast("long").alias("rx"), ry.cast("long").alias("ry"))
    got = {(r["rx"], r["ry"]) for r in ranked.collect()}
    assert got == {(2, 2), (5, 7), (5, 7), (8, 4)} or got == {(2, 2), (5, 7), (8, 4)}
    import math
    rxs, rys = [2, 5, 5, 8], [2, 7, 7, 4]
    n = 4
    sx, sy = sum(rxs), sum(rys)
    sxx = sum(v * v for v in rxs); syy = sum(v * v for v in rys)
    sxy = sum(a * b for a, b in zip(rxs, rys))
    want = round(1000.0 * (n * sxy - sx * sy)
                 / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)))
    moms = ranked.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    (r,) = moms.selectExpr(
        "CAST(round(1000.0 * (n * sxy - sx * sy)"
        " / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))"
        " * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) AS BIGINT) AS rho"
    ).collect()
    assert r["rho"] == want

    # --- trimmed mean: the outlier moves raw, not trimmed ---
    vals = [(i, "t", 10.0) for i in range(19)] + [(99, "t", 10000.0)]
    ev = spark.createDataFrame(vals, ["event_id", "event_type", "value"])
    cents = ev.select("event_type", "event_id",
                      F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"))
    w = Window.partitionBy("event_type").orderBy("c", "event_id")
    wn = Window.partitionBy("event_type")
    ranked2 = cents.select(
        "event_type", "c",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    k = "n * 5 div 100"
    (t,) = ranked2.groupBy("event_type").agg(
        F.expr("CAST(sum(c) div max(n) AS BIGINT)").alias("mean_cents"),
        F.expr(
            f"CAST(sum(CASE WHEN rn > {k} AND rn <= n - {k} THEN c END)"
            f" div (max(n) - 2 * (max(n) * 5 div 100)) AS BIGINT)"
        ).alias("trimmed_cents"),
    ).collect()
    # raw mean = (19*1000 + 1000000)/20 = 50950; trimmed (k=1) drops
    # one 10.00 and the 10000.00 -> mean of 18x1000 = 1000
    assert t["mean_cents"] == 50950
    assert t["trimmed_cents"] == 1000


def test_changepoint_locates_a_jump(spark):
    """A constructed level shift (10 days at 100 cents, then 10 at
    500) must locate the changepoint at day 10 exactly, report the
    two means, and explain ~all the variance; a constant series
    explains ~0 and ties to the earliest split (deterministic)."""
    from datetime import date, timedelta

    from logprep_spark.plans import catalog

    base = date(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(20):
        v = 1.0 if i < 10 else 5.0
        rows.append((eid, base + timedelta(days=i), 1, "jump", v))
        eid += 1
    for i in range(20):
        rows.append((eid, base + timedelta(days=i), 1, "flat", 2.0))
        eid += 1
    import datetime as dtm

    ev = spark.createDataFrame(
        [(a, dtm.datetime.combine(b, dtm.time()), c, d, e)
         for a, b, c, d, e in rows],
        ["event_id", "ts", "user_id", "event_type", "value"],
    )
    # run the same plan the catalog entry builds, via the registry on
    # a temp view-free path: rebuild inline
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    series = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.expr("sum(CAST(round(value * 100) AS BIGINT)) div count(1)").alias("y")
    )
    wo = Window.partitionBy("event_type").orderBy("d")
    wa = Window.partitionBy("event_type")
    cum = series.select(
        "event_type", "d", "y",
        F.row_number().over(wo).alias("s"),
        F.sum("y").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("l"),
        F.sum("y").over(wa).alias("tot"),
        F.sum(F.col("y") * F.col("y")).over(wa).alias("ssq"),
        F.count(F.lit(1)).over(wa).alias("n"),
    )
    splits = cum.filter(F.col("s") < F.col("n")).select(
        "event_type", "d", "s", "n", "l",
        (F.col("tot") - F.col("l")).alias("r"), "tot", "ssq",
        F.expr("CAST(l * l * (n - s) + (tot - l) * (tot - l) * s AS BIGINT)").alias("num"),
        F.expr("CAST(s * (n - s) AS BIGINT)").alias("den"),
    )
    wb = Window.partitionBy("event_type").orderBy(
        (F.col("num").cast("double") / F.col("den")).desc(), F.col("s")
    )
    best = {r["event_type"]: r for r in
            splits.withColumn("_rn", F.row_number().over(wb))
            .filter("_rn = 1").collect()}
    j = best["jump"]
    assert j["s"] == 10 and j["d"] == date(2024, 1, 10)
    assert j["l"] // j["s"] == 100 and j["r"] // (j["n"] - j["s"]) == 500
    f = best["flat"]
    assert f["s"] == 1  # pure tie -> earliest split, deterministic
