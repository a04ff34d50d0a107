"""Physical-plan shape guards (SURVEY §4): these assert the *plan*,
not the result — a correct-but-mis-planned query is a perf regression
at 100 TB even when every row matches.

Plans are inspected pre-execution (AQE initial plan): broadcast hints
and pushdown decisions are already visible there.
"""

import pytest

from logprep_spark.plans import catalog


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    qs = catalog.queries()

    def plan_of(name: str) -> str:
        return qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()

    return plan_of


def filescan_line(plan: str) -> str:
    return next(line for line in plan.split("\n") if "FileScan" in line)


def test_compiled_filter_pushes_to_parquet(plans):
    scan = filescan_line(plans("filter_lucene_bool"))
    assert "PushedFilters: [I" in scan or "PushedFilters: [E" in scan  # non-empty
    assert "EqualTo(event_type,error)" in scan


def test_filter_prunes_columns(plans):
    scan = filescan_line(plans("filter_lucene_bool"))
    # props (the widest column) must not be read for this projection
    assert "props" not in scan.split("ReadSchema")[-1]


def test_dim_joins_broadcast(plans):
    plan = plans("tpch_q5")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan  # at this SF everything broadcasts


def test_salted_agg_two_stage(plans):
    plan = plans("agg_salted_user_counts")
    assert plan.count("Exchange") == 2
    assert plan.count("HashAggregate") >= 4  # partial+final per stage


def test_q1_single_shuffle(plans):
    plan = plans("tpch_q1")
    assert plan.count("Exchange") == 1  # one shuffle: the groupBy


def test_minhash_signature_zero_shuffle(spark, sf_dir):
    """The signature stage is per-row narrow: hashes stay in an array
    column, each permutation min is an array_min — no explode, no
    groupBy, therefore no Exchange (see minhash_signature_df)."""
    from logprep_spark.functions import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for df in (dd.minhash_signature_df(docs), dd.simhash_df(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Generate" not in plan  # explode re-derives its child


def test_processor_pipeline_is_one_projection(spark, sf_dir):
    """N chained processors must stay narrow: no Exchange at all."""
    df = catalog.queries()["pipeline_compose"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "FileScan" in plan
