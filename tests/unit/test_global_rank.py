"""Equality witnesses for the r12 two-pass global rank
(logprep_spark/plans/ranks.py) and the fixed global-window lint check.

The r11 verdict found (a) the lint's global-window detector was dead
code — Spark omits the empty partition list from Window's plan text,
so the old `Window [fns], [], [order]` regex never matched — and
(b) three corpus-scale queries shipped partition-less windows behind
that false negative. These tests pin both fixes:

* `with_global_rank` / `ntile_from_rank` are bit-identical to the
  `row_number()` / `ntile()` global-window forms they replace, on the
  real sf0.001 frames the three rewritten queries rank;
* the fixed lint check FIRES on synthetic partition-less windows (the
  exact renderings Spark produces, with and without ORDER BY) and
  stays silent on partitioned ones — including the 2-bracket-group
  partitioned-no-order rendering that naive group counting misreads;
* the three rewritten queries' physical plans carry no partition-less
  window any more.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from logprep_spark.plans import catalog
from logprep_spark.plans.lint import _count_global_windows, lint_plan
from logprep_spark.plans.ranks import ntile_from_rank, with_global_rank


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- rank


def test_global_rank_matches_row_number_window(spark):
    df = spark.range(2000).select(
        (F.col("id") * 37 % 501).alias("v"), F.col("id").alias("tid")
    )
    ranked, n = with_global_rank(
        df, [F.col("v").desc(), F.col("tid")], rank_col="r"
    )
    assert n == 2000
    ref = df.withColumn(
        "r_ref",
        F.row_number().over(Window.orderBy(F.col("v").desc(), "tid")),
    )
    assert ranked.join(ref, ["v", "tid"]).filter("r <> r_ref").count() == 0
    # the rank plan itself must not smuggle a global window back in
    assert _count_global_windows(_plan(ranked)) == 0


@pytest.mark.parametrize("n_tiles", [2, 3, 4, 7])
def test_ntile_from_rank_matches_window_ntile(spark, n_tiles):
    # 1003 rows: exercises a non-zero remainder for every tile count
    df = spark.range(1003).select(
        (F.col("id") * 17 % 97).alias("v"), F.col("id").alias("tid")
    )
    ranked, n = with_global_rank(df, [F.col("v"), F.col("tid")], rank_col="r")
    got = ranked.withColumn("ph", ntile_from_rank("r", n, n_tiles))
    want = df.withColumn(
        "ph_ref",
        F.ntile(n_tiles).over(Window.orderBy("v", "tid")),
    )
    assert got.join(want, ["v", "tid"]).filter("ph <> ph_ref").count() == 0


def test_ntile_from_rank_degenerate_fewer_rows_than_tiles(spark):
    df = spark.range(3).select(F.col("id").alias("v"), F.col("id").alias("tid"))
    ranked, n = with_global_rank(df, [F.col("v"), F.col("tid")])
    got = {
        (r["v"], r["ph"])
        for r in ranked.withColumn("ph", ntile_from_rank("r", n, 5)).collect()
    }
    assert got == {(0, 1), (1, 2), (2, 3)}


def test_global_rank_empty_frame(spark):
    df = spark.range(5).filter("id < 0").select(F.col("id").alias("v"))
    ranked, n = with_global_rank(df, [F.col("v")])
    assert n == 0 and ranked.count() == 0


# ------------------------------------------------- the fixed lint check


def test_lint_fires_on_global_window_with_order(spark):
    df = spark.range(50).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    assert "global-window" in {f.code for f in lint_plan(_plan(df))}


def test_lint_fires_on_global_window_without_order(spark):
    df = spark.range(50).withColumn(
        "s", F.sum("id").over(Window.partitionBy())
    )
    assert "global-window" in {f.code for f in lint_plan(_plan(df))}


def test_lint_silent_on_partitioned_windows(spark):
    base = spark.range(50).withColumn("k", F.col("id") % 3)
    ordered = base.withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("id"))
    )
    # partitioned-no-order renders with TWO bracket groups, like a
    # global-with-order window — the detector must tell them apart
    unordered = base.withColumn(
        "s", F.sum("id").over(Window.partitionBy("k"))
    )
    assert "global-window" not in {f.code for f in lint_plan(_plan(ordered))}
    assert "global-window" not in {f.code for f in lint_plan(_plan(unordered))}


def test_lint_counts_plan_text_not_live_session():
    # the r11-verdict repro, frozen as literal plan text: the exact
    # rendering Spark emitted while itself warning about the single
    # partition, which the old regex scored at 0 hits
    global_line = (
        "Window [row_number() windowspecdefinition(id#0L ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "currentrow$())) AS rn#2], [id#0L ASC NULLS FIRST]"
    )
    partitioned_line = (
        "Window [row_number() windowspecdefinition(k#1L, id#0L ASC NULLS "
        "FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "currentrow$())) AS rn#4], [k#1L], [id#0L ASC NULLS FIRST]"
    )
    assert _count_global_windows(global_line) == 1
    assert _count_global_windows(partitioned_line) == 0


# ------------------------- the three de-globalized corpus-scale queries


@pytest.mark.parametrize(
    "name",
    ["shard_balance_tokens", "curriculum_order", "split_temporal_holdout"],
)
def test_rewritten_queries_have_no_global_window(spark, sf_dir, name):
    df = catalog.queries()[name](spark, sf_dir)
    assert _count_global_windows(_plan(df)) == 0


def test_shard_rank_matches_old_window_shape(spark, sf_dir):
    docs = catalog.tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"),
                lambda w: w != "",
            )
        ).cast("long").alias("n_tokens"),
    )
    ranked, _ = with_global_rank(
        toks, [F.col("n_tokens").desc(), F.col("doc_id")], rank_col="r"
    )
    old = toks.withColumn(
        "r_old",
        F.row_number().over(
            Window.orderBy(F.col("n_tokens").desc(), F.col("doc_id"))
        ),
    )
    assert ranked.join(old, "doc_id").filter("r <> r_old").count() == 0


def test_temporal_cutoff_matches_old_window_shape(spark, sf_dir):
    ev = catalog.tables(spark, sf_dir)["events"]
    ranked, n = with_global_rank(
        ev.select("ts", "event_id"), [F.col("ts"), F.col("event_id")],
        rank_col="rn",
    )
    new_cut = ranked.filter(F.col("rn") > F.lit(n * 8 // 10)).agg(
        F.min("ts")
    ).collect()[0][0]
    old = ev.select(
        "ts",
        F.row_number().over(Window.orderBy("ts", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    old_cut = old.filter(F.expr("rn > n * 8 div 10")).agg(
        F.min("ts")
    ).collect()[0][0]
    assert new_cut == old_cut


# ------------------- the r13 two-pass running sum (with_running_sums)


def test_running_sums_match_cumulative_window(spark):
    from logprep_spark.plans.ranks import with_running_sums

    # a tally-shaped frame: unique order key, two summed columns
    df = spark.range(1500).select(
        (F.col("id") * 31 % 4001).alias("v"),
        (F.col("id") % 7 + 1).alias("a"),
        (F.col("id") % 3).alias("b"),
    ).groupBy("v").agg(
        F.sum("a").alias("a"), F.sum("b").alias("b")
    )
    got, totals = with_running_sums(
        df, [F.col("v")], [("ca", "a"), ("cb", "b")]
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ref = df.select(
        "v",
        F.sum("a").over(w).cast("long").alias("ra"),
        F.sum("b").over(w).cast("long").alias("rb"),
    )
    assert (
        got.join(ref, "v").filter("ca <> ra OR cb <> rb").count() == 0
    )
    row = df.agg(F.sum("a"), F.sum("b")).collect()[0]
    assert totals == {"ca": int(row[0]), "cb": int(row[1])}
    # the cumulative plan itself must not smuggle a global window in
    assert _count_global_windows(_plan(got)) == 0


def test_running_sums_empty_frame(spark):
    from logprep_spark.plans.ranks import with_running_sums

    df = spark.range(5).filter("id < 0").select(
        F.col("id").alias("v"), F.lit(1).alias("c")
    )
    got, totals = with_running_sums(df, [F.col("v")], [("cc", "c")])
    assert got.count() == 0 and totals == {"cc": 0}


@pytest.mark.parametrize("name", ["ab_mann_whitney", "ab_ks_test"])
def test_deglobalized_ab_tests_have_no_global_window(spark, sf_dir, name):
    # r12 verdict item 2: the continuous-metric cumulative windows in
    # mann_whitney_u / ks_two_sample must not plan a single-task funnel
    df = catalog.queries()[name](spark, sf_dir)
    assert _count_global_windows(_plan(df)) == 0


def test_mann_whitney_matches_old_window_shape(spark, sf_dir):
    # equality witness: the two-pass prefix produces the identical
    # exclusive before-rank the old Window.orderBy form computed
    from logprep_spark.plans import analytics as an

    ev = catalog.tables(spark, sf_dir)["events"]
    obs = ev.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        F.round(F.col("value") * 1000).cast("long").alias("vm"),
        (F.col("user_id") % 2).cast("long").alias("variant"),
    )
    new = an.mann_whitney_u(obs, "vm", "variant").collect()[0]
    tally = obs.groupBy("vm").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum((F.col("variant") == 1).cast("long")).alias("_c1"),
    )
    w = Window.orderBy("vm").rowsBetween(Window.unboundedPreceding, -1)
    old = (
        tally.withColumn(
            "_rb", F.coalesce(F.sum("_cnt").over(w), F.lit(0)).cast("long")
        )
        .agg(
            F.sum("_cnt").cast("long").alias("_nn"),
            F.sum("_c1").cast("long").alias("_n1"),
            F.sum(F.col("_c1") * (2 * F.col("_rb") + F.col("_cnt") + 1))
            .cast("long")
            .alias("_r1"),
        )
        .collect()[0]
    )
    assert new["n0"] == old["_nn"] - old["_n1"]
    assert new["n1"] == old["_n1"]
    assert new["u_times_2"] == old["_r1"] - old["_n1"] * (old["_n1"] + 1)


def test_ks_matches_old_window_shape(spark, sf_dir):
    from logprep_spark.plans import analytics as an

    ev = catalog.tables(spark, sf_dir)["events"]
    obs = ev.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        F.round(F.col("value") * 1000).cast("long").alias("vm"),
        (F.col("user_id") % 2).cast("long").alias("variant"),
    )
    new = an.ks_two_sample(obs, "vm", "variant").collect()[0]
    tally = obs.groupBy("vm").agg(
        F.sum((F.col("variant") == 0).cast("long")).alias("_c0"),
        F.sum((F.col("variant") == 1).cast("long")).alias("_c1"),
    )
    w = Window.orderBy("vm").rowsBetween(Window.unboundedPreceding, 0)
    cum = tally.select(
        F.col("vm").alias("_v"),
        F.sum("_c0").over(w).cast("long").alias("_f0"),
        F.sum("_c1").over(w).cast("long").alias("_f1"),
    )
    tot = tally.agg(
        F.sum("_c0").cast("long").alias("n0"),
        F.sum("_c1").cast("long").alias("n1"),
    ).collect()[0]
    old_dmax = (
        cum.agg(
            F.max(
                F.abs(
                    F.col("_f0") * F.lit(int(tot["n1"]))
                    - F.col("_f1") * F.lit(int(tot["n0"]))
                )
            )
        ).collect()[0][0]
    )
    assert new["n0"] == tot["n0"] and new["n1"] == tot["n1"]
    assert new["ks_scaled"] == old_dmax
