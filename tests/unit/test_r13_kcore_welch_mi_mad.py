"""Hand-computed replicas for the r13 capability rows: k-core
(graph_k_core), Welch's t (ab_welch_ttest), mutual-information cells
(dq_mutual_info), median/MAD outliers (events_mad_outliers) — the
SURVEY §5 discipline: beside the cross-engine oracle gate, each
operator is pinned to values computed by hand on a planted input."""

import math

from pyspark.sql import functions as F

from logprep_spark.plans import analytics as an


def test_k_core_hand_computed(spark):
    # K4 on {1,2,3,4} (every degree 3) + a tail 4-5-6 + pendant 7 on 1.
    # 2-core: round 1 peels 7 and 6 (both deg 1), round 2 peels 5
    # (deg 1 once 6 is gone) -> survivors K4, every core degree 3,
    # two active rounds.
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (4, 5), (5, 6), (1, 7)],
        "src long, dst long",
    )
    out = {r["node"]: r for r in an.k_core(edges, k=2, rounds=8).collect()}
    assert sorted(out) == [1, 2, 3, 4]
    assert all(out[n]["core_degree"] == 3 for n in out)
    assert out[1]["n_rounds_active"] == 2
    assert bool(out[1]["converged"]) is True


def test_k_core_everything_peels(spark):
    # a path graph has no 2-core: output empty, converged after the
    # cascade eats the whole path from both ends
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 7)], "src long, dst long"
    )
    got = an.k_core(edges, k=2, rounds=8)
    assert got.count() == 0


def test_k_core_budget_too_small_is_honest(spark):
    # same path graph with rounds=1: one round removes the two
    # endpoints and the budget ends -> converged False, survivors left
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 7)], "src long, dst long"
    )
    rows = an.k_core(edges, k=2, rounds=1).collect()
    assert len(rows) > 0
    assert all(bool(r["converged"]) is False for r in rows)
    assert all(r["n_rounds_active"] == 1 for r in rows)


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
