"""Hand-computed replicas for the r13 capability rows: Welch's t
(ab_welch_ttest), mutual-information cells (dq_mutual_info),
median/MAD outliers (events_mad_outliers), Theil decomposition
(users_spend_theil) — the SURVEY §5 discipline: beside the
cross-engine oracle gate, each operator is pinned to values computed
by hand on a planted input."""

import math

from pyspark.sql import functions as F

from logprep_spark.plans import analytics as an


def test_welch_ttest_hand_computed(spark):
    # variant 0: [10, 20, 30] -> n=3, mean=20, s^2=100
    # variant 1: [50, 70]     -> n=2, mean=60, s^2=200
    # se2 = 100/3 + 200/2 = 133.333...; t = 40/sqrt(se2) = 3.46410...
    # df = se2^2 / ((100/3)^2/2 + (200/2)^2/1) = 17777.78/10555.56
    #    = 1.68421...
    rows = [(10, 0), (20, 0), (30, 0), (50, 1), (70, 1)]
    out = an.welch_ttest(
        spark.createDataFrame(rows, "vm long, variant long")
    ).collect()[0]
    assert out["n0"] == 3 and out["n1"] == 2
    assert out["mean0_milli"] == 20 and out["mean1_milli"] == 60
    assert out["mean_diff_milli"] == 40
    t = 40.0 / math.sqrt(100.0 / 3 + 100.0)
    assert out["t_milli"] == math.floor(1000 * t) == 3464
    se2 = 100.0 / 3 + 100.0
    df = se2 * se2 / ((100.0 / 3) ** 2 / 2 + 100.0**2 / 1)
    assert out["df_milli"] == math.floor(1000 * df) == 1684
    # |t_milli|^2 = 3464^2 = 11999296 > 3841459 -> reject
    assert bool(out["reject_05"]) is True


def test_welch_ttest_identical_samples_keep_null(spark):
    rows = [(v, 0) for v in (10, 20, 30, 40)] + [
        (v, 1) for v in (10, 20, 30, 40)
    ]
    out = an.welch_ttest(
        spark.createDataFrame(rows, "vm long, variant long")
    ).collect()[0]
    assert out["mean_diff_milli"] == 0 and out["t_milli"] == 0
    assert bool(out["reject_05"]) is False


def test_mutual_info_hand_computed(spark):
    # perfectly dependent 2x2: (a,x) 10 rows, (b,y) 10 rows.
    # N=20, every margin 10: PMI = ln(10*20/100) = ln 2 per cell;
    # contribution = 0.5*ln 2 each; MI = ln 2.
    rows = [("a", "x")] * 10 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, "r string, c string")
    out = {
        (x["r"], x["c"]): x
        for x in an.mutual_info_cells(df, "r", "c").collect()
    }
    ln2_micro = round(1_000_000 * math.log(2.0))
    assert set(out) == {("a", "x"), ("b", "y")}
    for cell in out.values():
        assert cell["observed"] == 10
        assert cell["pmi_micro"] == ln2_micro == 693147
        assert cell["mi_contrib_micro"] == round(500_000 * math.log(2.0))


def test_mutual_info_independent_is_zero(spark):
    # independent 2x2 with equal counts: PMI = ln(5*20/100) = 0
    rows = (
        [("a", "x")] * 5 + [("a", "y")] * 5
        + [("b", "x")] * 5 + [("b", "y")] * 5
    )
    df = spark.createDataFrame(rows, "r string, c string")
    for cell in an.mutual_info_cells(df, "r", "c").collect():
        assert cell["pmi_micro"] == 0 and cell["mi_contrib_micro"] == 0


def test_mad_outliers_hand_computed(spark):
    # g1 values: [1,2,3,4,100]: n=5, lower median = rank 3 -> 3,
    # |x-3| = [2,1,0,1,97], MAD = lower median of sorted [0,1,1,2,97]
    # = 1 -> flag iff 1000*|x-3| > 4448*1 -> only 100 (97000 > 4448).
    rows = [("g1", v) for v in (1, 2, 3, 4, 100)]
    out = an.mad_outliers(
        spark.createDataFrame(rows, "g string, v long"), "g", "v"
    ).collect()[0]
    assert out["n"] == 5
    assert out["median_milli"] == 3
    assert out["mad_milli"] == 1
    assert out["n_outliers"] == 1
    assert out["outlier_share_milli"] == 200


def test_mad_outliers_constant_group_no_flags(spark):
    # constant values: MAD = 0, |x-med| = 0, 0 > 0 false -> no flags
    rows = [("g", 7)] * 6
    out = an.mad_outliers(
        spark.createDataFrame(rows, "g string, v long"), "g", "v"
    ).collect()[0]
    assert out["mad_milli"] == 0 and out["n_outliers"] == 0


def _half_away(v):
    import math as m

    return int(m.floor(v + 0.5)) if v >= 0 else -int(m.floor(-v + 0.5))


def test_theil_hand_computed(spark):
    # group a: two users of 1 milli; group b: two users of 2 milli.
    # Within both groups spend is CONSTANT -> T_g = 0, all inequality
    # is BETWEEN: b_a = round(1e6*(2/6)*ln((2*4)/(6*2))),
    # b_b = round(1e6*(4/6)*ln((4*4)/(6*2))); the independently
    # rounded total path differs by exactly the accumulated rounding,
    # read out honestly in decomp_gap_micro.
    rows = [("a", 1), ("a", 1), ("b", 2), ("b", 2)]
    df = spark.createDataFrame(rows, "g string, x long")
    out = {r["g"]: r for r in an.theil_decomposition(df, "g", "x").collect()}
    b_a = _half_away(1e6 * (2 / 6) * math.log((1.0 * 2 * 4) / (6 * 2)))
    b_b = _half_away(1e6 * (4 / 6) * math.log((1.0 * 4 * 4) / (6 * 2)))
    tt = 2 * _half_away(1e6 * (1 / 6) * math.log(1.0 * 1 * 4 / 6)) + \
        2 * _half_away(1e6 * (2 / 6) * math.log(1.0 * 2 * 4 / 6))
    assert out["a"]["theil_within_g_micro"] == 0
    assert out["b"]["theil_within_g_micro"] == 0
    assert out["a"]["within_contrib_micro"] == 0
    assert out["a"]["between_contrib_micro"] == b_a
    assert out["b"]["between_contrib_micro"] == b_b
    assert out["a"]["theil_between_micro"] == b_a + b_b
    assert out["a"]["theil_within_micro"] == 0
    assert out["a"]["theil_total_micro"] == tt
    assert out["a"]["decomp_gap_micro"] == tt - (b_a + b_b)
    assert out["a"]["share_milli"] == 333 and out["b"]["share_milli"] == 666


def test_theil_equal_spend_is_zero(spark):
    # perfectly equal spend: every ln argument is 1 -> T = B = W = 0
    rows = [("a", 5), ("a", 5), ("b", 5), ("b", 5)]
    out = an.theil_decomposition(
        spark.createDataFrame(rows, "g string, x long"), "g", "x"
    ).collect()[0]
    assert out["theil_total_micro"] == 0
    assert out["theil_between_micro"] == 0
    assert out["theil_within_micro"] == 0
    assert out["decomp_gap_micro"] == 0


def test_lorenz_deciles_hand_computed(spark):
    # five users: four spend 10, one spends 60 (total 100). n=5 ->
    # ntile(10) gives one row per tile 1..5; ascending (x, id) order
    # puts the whale last. Shares: keys 200/400/.../1000 milli,
    # value 100/200/300/400/1000 milli.
    rows = [(1, 10), (2, 10), (3, 10), (4, 10), (5, 60)]
    df = spark.createDataFrame(rows, "user_id long, x long")
    out = {r["decile"]: r for r in an.lorenz_deciles(df, "x", "user_id").collect()}
    assert sorted(out) == [1, 2, 3, 4, 5]
    assert [out[d]["cum_keys_share_milli"] for d in range(1, 6)] == [
        200, 400, 600, 800, 1000
    ]
    assert [out[d]["cum_value_share_milli"] for d in range(1, 6)] == [
        100, 200, 300, 400, 1000
    ]
    assert all(out[d]["n_keys"] == 1 for d in out)


def test_cramers_v_hand_computed(spark):
    # perfectly associated 2x2 with structural zeros: only the two
    # occupied cells emit (the chi_square_cells caveat), each
    # contributing (o*N - r*c)^2/(N*r*c) = (200-100)^2/(20*100) = 5
    # -> chi2 = 10, V = sqrt(10/(20*1)) = 0.7071 -> 707 milli.
    rows = [("a", "x")] * 10 + [("b", "y")] * 10
    out = an.cramers_v(
        spark.createDataFrame(rows, "r string, c string"), "r", "c"
    ).collect()[0]
    assert out["n"] == 20 and out["n_cells"] == 2 and out["dof"] == 1
    assert out["chi2_micro"] == 10_000_000
    assert out["cramers_v_milli"] == 707


def test_cramers_v_independent_is_zero(spark):
    rows = (
        [("a", "x")] * 5 + [("a", "y")] * 5
        + [("b", "x")] * 5 + [("b", "y")] * 5
    )
    out = an.cramers_v(
        spark.createDataFrame(rows, "r string, c string"), "r", "c"
    ).collect()[0]
    assert out["chi2_micro"] == 0 and out["cramers_v_milli"] == 0


def test_entropy_profile_hand_computed(spark):
    # col u: uniform over 4 values (5 rows each) -> H = ln 4,
    # normalized 1000; col k: constant -> n_values 1, normalized 0
    # (the stated flag convention); col s: skewed 19/1.
    rows = [(f"v{i % 4}", "only", "hot" if i else "rare") for i in range(20)]
    df = spark.createDataFrame(rows, "u string, k string, s string")
    out = {r["column"]: r for r in an.entropy_profile(df, ["u", "k", "s"]).collect()}
    assert out["u"]["n_values"] == 4
    assert out["u"]["normalized_milli"] == 1000
    assert out["k"]["n_values"] == 1
    assert out["k"]["entropy_micro"] == 0
    assert out["k"]["normalized_milli"] == 0
    h = _half_away(1e6 * (19 / 20) * math.log(20 / 19)) + _half_away(
        1e6 * (1 / 20) * math.log(20.0)
    )
    assert out["s"]["entropy_micro"] == h
    assert 0 < out["s"]["normalized_milli"] < 1000


def test_welch_ttest_degenerate_arm_is_null(spark):
    # n1 = 1: arm 1 has no sample variance (n-1 = 0) — the stated
    # convention (analytics.welch_ttest docstring): t/df/reject all
    # NULL via 0/0 -> NULL propagation; means still read.
    rows = [(10, 0), (20, 0), (30, 0), (50, 1)]
    out = an.welch_ttest(
        spark.createDataFrame(rows, "vm long, variant long")
    ).collect()[0]
    assert out["n0"] == 3 and out["n1"] == 1
    assert out["mean1_milli"] == 50
    assert out["t_milli"] is None
    assert out["df_milli"] is None
    assert out["reject_05"] is None


def test_entropy_profile_empty_cols_raises(spark):
    import pytest

    df = spark.createDataFrame([("a",)], "c string")
    with pytest.raises(ValueError, match="at least one column"):
        an.entropy_profile(df, [])


def test_chi_square_densify_structural_zero(spark):
    # 2x2 with cell (a,y) structurally absent: N=10, r_a=4, r_b=6,
    # c_x=5, c_y=5. chi2 = 2 + 2 + 4/3 + 4/3 = 6.667; the sparse form
    # drops the zero cell's E = r*c/N = 2.0 exactly.
    rows = (
        [("a", "x")] * 4 + [("b", "x")] * 1 + [("b", "y")] * 5
    )
    df = spark.createDataFrame(rows, "r string, c string")
    sparse = {
        (x["r"], x["c"]): x for x in an.chi_square_cells(df, "r", "c").collect()
    }
    dense = {
        (x["r"], x["c"]): x
        for x in an.chi_square_cells(df, "r", "c", densify=True).collect()
    }
    assert set(sparse) == {("a", "x"), ("b", "x"), ("b", "y")}
    assert set(dense) == set(sparse) | {("a", "y")}
    zero = dense[("a", "y")]
    assert zero["observed"] == 0
    assert zero["expected_milli"] == 2000
    assert zero["chi_contrib_micro"] == 2_000_000
    # shared cells identical in both forms (margins unchanged by the
    # zero fill), so dense total = sparse total + the dropped term
    for k, v in sparse.items():
        assert dense[k]["chi_contrib_micro"] == v["chi_contrib_micro"]
    s_sum = sum(v["chi_contrib_micro"] for v in sparse.values())
    d_sum = sum(v["chi_contrib_micro"] for v in dense.values())
    assert d_sum - s_sum == 2_000_000
    assert d_sum == 6_666_666  # floor'd micro terms of 6.667 total
