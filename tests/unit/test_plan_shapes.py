"""Physical-plan shape guards (SURVEY §4): these assert the *plan*,
not the result — a correct-but-mis-planned query is a perf regression
at 100 TB even when every row matches.

Plans are inspected pre-execution (AQE initial plan): broadcast hints
and pushdown decisions are already visible there.
"""

import pytest

from tests.conftest import slow_tier

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


@pytest.fixture()
def no_auto_broadcast(spark):
    """Disable statistics-based broadcast so the plan shows only
    EXPLICIT broadcast() hints — i.e. what the plan would look like at
    a SF where nothing fits the threshold. At sf0.001 Catalyst happily
    broadcasts a whole year of orders from size stats; that's fine (and
    adaptive), but the hint structure must not force it at 100 TB."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_q5_dims_broadcast_fact_join_shuffles(spark, sf_dir, no_auto_broadcast):
    plan = (
        catalog.queries()["tpch_q5"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # hinted true dims: customer⋈nation(⋈region) and supplier
    assert plan.count("BroadcastHashJoin") >= 3
    # the lineitem⋈orders fact join must be a shuffle join, not a hint
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)


def test_q3_fact_join_shuffles(spark, sf_dir, no_auto_broadcast):
    plan = (
        catalog.queries()["tpch_q3"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 1  # filtered customer keys
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)


def test_ann_broadcasts_queries_not_corpus(spark, sf_dir):
    """brute_force_topk: the corpus is the unbounded side — the ONLY
    broadcast allowed is the small query set (corpus side would OOM the
    moment it exceeds the broadcast limit)."""
    from logprep_spark.functions import similarity as sim
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 5)
    plan = (
        sim.brute_force_topk(emb, qs, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastExchange") == 1
    # corpus.crossJoin(broadcast(qs)) → query set is the build (right) side
    assert "BroadcastNestedLoopJoin BuildRight" in plan

    lsh_plan = (
        sim.lsh_topk(emb, qs, k=3, n_planes=6)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # bucket equi-join: query side broadcast, corpus never shuffled on
    # the low-cardinality bucket key
    assert lsh_plan.count("BroadcastExchange") == 1
    assert "BroadcastHashJoin" in lsh_plan and "BuildRight" in lsh_plan
    assert "SortMergeJoin" not in lsh_plan


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


def test_q6_pushdown_prune_single_shuffle(plans):
    """q6: all three predicates reach the parquet scan, only the 4
    needed columns are read, and the single Exchange is the final
    single-partition agg combine."""
    plan = plans("tpch_q6")
    assert plan.count("Exchange") == 1
    scan = filescan_line(plan)
    pushed = scan.split("PushedFilters: ")[-1]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed
    schema = scan.split("ReadSchema: ")[-1]
    assert "l_orderkey" not in schema and "l_comment" not in schema


def test_sessionize_single_shuffle(plans):
    """Sessionization: window + two-level agg all reuse ONE user_id
    hash partitioning — exactly one Exchange for the whole query."""
    plan = plans("sessionize_events")
    assert plan.count("Exchange") == 1
    assert plan.count("Window") >= 1


def test_text_quality_zero_shuffle(plans):
    """Quality scoring is pure narrow column math — no Exchange."""
    plan = plans("text_quality")
    assert "Exchange" not in plan


def test_minhash_dedup_stages_persisted(spark, sf_dir):
    """The signature AND candidate-pair stages are persisted: each
    feeds multiple consumers, and unpersisted the band-self-join
    subtree replicates per consumer (measured ~1.4x end-to-end)."""
    from logprep_spark.functions import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        dd.minhash_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("InMemoryTableScan") >= 3  # sig x2 sides? + pairs x3


def test_planes_for_scaling():
    from logprep_spark.functions.similarity import planes_for

    assert planes_for(1_000) == 4          # tiny corpus floor
    assert planes_for(10_000) == 4
    assert planes_for(1_000_000_000) == 18  # 1B vectors
    assert planes_for(25_000_000_000) > 20  # ~100 TB of 1k-dim floats


def _shuffle_count(plan: str) -> int:
    return (
        plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange RoundRobin")
        + plan.count("Exchange SinglePartition")
    )


def test_all_processor_queries_stay_narrow(spark, sf_dir):
    """Sweeping §2.2 guard: every processor/filter/source catalog query
    is a narrow projection chain — ZERO shuffle exchanges (broadcast
    exchanges for enrichment dims are fine) and no Generate. The one
    designed exception: the pseudonymizer side output deduplicates
    (pseudonym, origin) pairs, which is a real distinct shuffle."""
    qs = catalog.queries()
    allowed_shuffles = {"proc_pseudonymizer_pseudonyms": 1}
    # geoip_table/_v6 explode range bins on the TINY broadcast dim
    # side (2 rows -> a few k bins), never on the event stream
    allowed_generates = {
        "proc_pseudonymizer_pseudonyms",
        "proc_geoip_table",
        "proc_geoip_v6",
    }
    offenders = {}
    for name, fn in qs.items():
        if not name.startswith(("proc_", "filter_", "source_")):
            continue
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        shuffles = _shuffle_count(plan)
        generates = plan.count("Generate")
        budget = allowed_shuffles.get(name, 0)
        if shuffles > budget or (generates and name not in allowed_generates):
            offenders[name] = f"shuffles={shuffles} generates={generates}"
    assert not offenders, offenders


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path, no_auto_broadcast):
    """Same-bucketed tables join with ZERO Exchange: the write-time
    bucketing pre-pays the shuffle, every later join/agg on the key is
    co-located (the 100 TB recurring-join strategy in plans/bucketing)."""
    from logprep_spark.plans.bucketing import bucketed_join, write_bucketed

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    try:
        write_bucketed(orders, "bt_orders", str(tmp_path / "o"), "o_orderkey", 4)
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "bt_lineitem", str(tmp_path / "l"), "o_orderkey", 4,
        )
        joined = bucketed_join(spark, "bt_orders", "bt_lineitem", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # (a per-bucket Sort can remain: with more than one file per
        # bucket Spark can't trust the write-time sort order — the
        # shuffle elimination is the property that matters at scale)
        assert joined.count() == lineitem.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_lineitem")


def test_skewed_join_splits_hot_keys(spark, sf_dir, no_auto_broadcast):
    """skewed_join: hot-key rows take a broadcast join (no shuffle of
    the skewed partition), cold rows take the shuffle join, and the
    union equals the plain join exactly."""
    from pyspark.sql import functions as F

    from logprep_spark.plans.analytics import skewed_join

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    ).withColumnRenamed("c_custkey", "o_custkey")
    hot = [r.o_custkey for r in orders.groupBy("o_custkey").count()
           .orderBy(F.col("count").desc()).limit(3).collect()]

    out = skewed_join(orders, customer, "o_custkey", hot_keys=hot)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # hot branch
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)  # cold branch
    assert "Union" in plan

    plain = orders.join(customer, "o_custkey")
    assert out.count() == plain.count()
    assert out.exceptAll(plain).count() == 0 and plain.exceptAll(out).count() == 0


def test_skewed_join_discovery_no_driver_collect(spark, sf_dir, no_auto_broadcast):
    """hot_keys=None discovery path: the hot-key histogram stays a
    broadcast frame — never a driver .collect() (a high-cardinality
    key would OOM the driver). Result still equals the plain join."""
    from unittest import mock

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from logprep_spark.plans.analytics import skewed_join

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    with mock.patch.object(
        DataFrame, "collect", side_effect=AssertionError("driver collect in plan path")
    ):
        out = skewed_join(orders, customer, "o_custkey", hot_keys=None, hot_threshold=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # hot branch + marker joins
    assert "Union" in plan
    plain = orders.join(customer, "o_custkey")
    assert out.count() == plain.count()
    assert out.exceptAll(plain).count() == 0 and plain.exceptAll(out).count() == 0


def test_skewed_join_keeps_null_keys_on_outer(spark):
    """NULL fact keys must survive an outer skewed_join: isin() is
    NULL for NULL keys, so an un-coalesced hot predicate would drop
    them from BOTH branches — result must equal the plain join for
    every `how`."""
    from logprep_spark.plans.analytics import skewed_join

    fact = spark.createDataFrame(
        [(1, "a"), (1, "b"), (None, "c"), (2, "d")], "k int, fv string"
    )
    dim = spark.createDataFrame([(1, "x"), (3, "y")], "k int, dv string")
    for how in ("inner", "left", "full"):
        out = skewed_join(fact, dim, "k", hot_keys=[1], how=how)
        plain = fact.join(dim, "k", how)
        assert out.count() == plain.count(), how
        assert out.exceptAll(plain).count() == 0, how
        assert plain.exceptAll(out).count() == 0, how


def test_tfidf_no_window_over_term(plans):
    """tfidf_topk: the doc-frequency must come from a partial-agg
    groupBy + term-keyed join — NEVER a count-over-Window.partitionBy
    (term). A window has no map-side combine, so one stop-word-grade
    term would put billions of (doc, term) rows into a single task at
    100 TB. Exactly one Window is allowed: the bounded per-doc top-k."""
    plan = plans("text_tfidf")
    # exactly one Window node (WindowGroupLimit = top-k pushdown, fine)
    assert plan.count("Window [") == 1
    # the surviving window partitions by doc_id, never term
    win_line = next(line for line in plan.split("\n") if "Window [" in line)
    assert "windowspecdefinition(doc_id" in win_line
    # df_count derives from a hash agg (partial+final) on term
    assert plan.count("HashAggregate") >= 2
    # the persisted tf frame feeds both consumers
    assert "InMemoryTableScan" in plan


def test_substring_spans_staged_and_islands_windowed_by_doc(plans):
    """dedup_substring_spans: the positional-window frame is persisted
    (two consumers — dup-hash agg and mark-join — would otherwise each
    re-run the scan+tokenize+posexplode subtree), the dup detection is
    a two-phase hash agg (map-side partial), and the only Window is
    the per-doc gaps-and-islands row_number (bounded by doc length)."""
    plan = plans("dedup_substring_spans")
    assert "InMemoryTableScan" in plan
    assert plan.count("Window [") == 1
    win_line = next(line for line in plan.split("\n") if "Window [" in line)
    assert "windowspecdefinition(doc_id" in win_line
    assert plan.count("HashAggregate") >= 2


def test_repetition_agg_cascade_no_window_no_join(plans):
    """text_repetition: one Generate (the tagged gram explode), an agg
    cascade whose every shuffle key is prefixed by doc_id (a globally
    hot gram can never concentrate on one task), and neither windows
    nor joins anywhere."""
    plan = plans("text_repetition")
    assert plan.count("Generate") == 1
    assert "Window [" not in plan
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final per stage
    # every hash shuffle carries doc_id as the leading key
    for line in plan.split("\n"):
        if "Exchange hashpartitioning" in line:
            assert "doc_id" in line.split("hashpartitioning(")[1].split(",")[0]


def test_contamination_broadcasts_benchmark_never_shuffles_corpus_on_hash(plans):
    """dedup_contamination: the benchmark hash set is the broadcast
    side; the corpus probe is a broadcast-hash-join so corpus windows
    never shuffle on the window hash — the only corpus shuffle is the
    final per-doc count."""
    plan = plans("dedup_contamination")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # no shuffle keyed by window_hash on the probe side (the benchmark
    # side's distinct agg may shuffle its own tiny frame)
    corpus_shuffles = [
        line for line in plan.split("\n")
        if "Exchange hashpartitioning(doc_id" in line
    ]
    assert corpus_shuffles  # the per-doc count


def test_self_join_dedup_stages_persisted(plans):
    """simhash_pairs and ngram_jaccard self-join the signature /
    shingle frame under different aliases — exchange reuse can't kick
    in, so both stages must be persisted or the expensive narrow
    subtree (bit-votes / tokenize+shingle) runs once per side."""
    for name in ("dedup_simhash", "dedup_ngram_jaccard"):
        plan = plans(name)
        assert plan.count("InMemoryTableScan") >= 2, name


def test_surprisal_stages_persisted(plans):
    """text_surprisal: tok_rows (vocab agg + re-join) and vocab
    (totals + join) each feed two consumers — both persisted so the
    scan+explode subtree executes once, not three times."""
    plan = plans("text_surprisal")
    assert plan.count("InMemoryTableScan") >= 2


def test_asof_join_no_nested_loop(plans):
    """As-of join is union + carry-forward window: never a
    BroadcastNestedLoopJoin on the inequality (which is O(n*m) and
    OOMs the moment the build side outgrows the broadcast limit),
    and exactly one per-key Window pass."""
    plan = plans("join_asof_last_login")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Window") == 1


def test_range_join_is_binned_equi_join(plans):
    """Binned range join: the bands explode into fixed-width bins and
    the join is an EQUI-join on the bin id (hashable, partitionable)
    with a residual BETWEEN filter — not a nested-loop range scan."""
    plan = plans("join_range_value_bands")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_gopher_rules_zero_shuffle(plans):
    """text_gopher: every rule is a narrow expression over one scan —
    any Exchange here means a rule leaked into an aggregation."""
    plan = plans("text_gopher")
    assert "Exchange" not in plan


def test_line_dedup_partial_agg_no_hash_window(plans):
    """dedup_lines: per-line stats must come from a partial-agg
    groupBy(_h) + skew-splittable equi-join — NEVER a window over the
    line hash. A window partition cannot be AQE-split, so one
    billion-fold boilerplate line would land on a single task; the
    groupBy combines it map-side to one row per task instead. Plan:
    no Window at all, >= 2 HashAggregate (partial+final on _h), and
    2-3 hash exchanges — at small SF the stats side broadcasts (2:
    stats agg + doc reassembly); at scale the join shuffles (3), and
    either shape is skew-safe."""
    plan = plans("dedup_lines")
    assert "Window [" not in plan
    assert plan.count("HashAggregate") >= 2
    assert 2 <= plan.count("Exchange hashpartitioning") <= 3


def test_url_canonical_no_hash_window(plans):
    """text_url_canonical: canonicalization itself is narrow, and the
    per-canonical count must come from a partial-agg groupBy + join
    back — never a count-over-window on the canonical URL (a popular
    URL is a hot key; window partitions can't be AQE-split)."""
    plan = plans("text_url_canonical")
    assert "Window [" not in plan
    assert plan.count("HashAggregate") >= 2
    assert 1 <= plan.count("Exchange hashpartitioning") <= 2


def test_stratified_sample_filter_is_narrow(plans):
    """split_stratified_sample: the sampling decision is a pure filter
    (no sampling state, no shuffle); the single exchange belongs to
    the reporting groupBy."""
    plan = plans("split_stratified_sample")
    assert plan.count("Exchange hashpartitioning") == 1


def test_heavy_hitters_broadcasts_candidates(plans):
    """sketch_heavy_hitters: candidates and the 1-row total are the
    broadcast sides; the corpus items are never broadcast and shuffle
    only for the tiny candidate-distinct and the post-semi-join count."""
    plan = plans("sketch_heavy_hitters")
    assert plan.count("BroadcastExchange") == 2
    assert plan.count("Exchange hashpartitioning") == 2


def test_q14_broadcasts_dim_no_fact_shuffle(plans):
    """tpch_q14: part is the broadcast side; the filtered fact feeds a
    single-row partial agg — zero hash exchanges."""
    plan = plans("tpch_q14")
    assert plan.count("BroadcastExchange") == 1
    assert plan.count("Exchange hashpartitioning") == 0


def test_funnel_steps_share_one_user_exchange(plans):
    """funnel_events: the four step-timestamp windows and the final
    per-user agg must all ride ONE user-keyed exchange — a shuffle per
    step would be 4x the data movement for the same answer."""
    plan = plans("funnel_events")
    assert plan.count("Exchange hashpartitioning") == 1
    win_lines = [l for l in plan.split("\n") if "Window [" in l]
    assert win_lines and all("windowspecdefinition(user_id" in l for l in win_lines)


def test_q4_exists_is_semi_join(plans):
    """tpch_q4: the EXISTS subquery must compile to a LEFT SEMI hash
    join on the pre-filtered returnflag projection — never a full
    join + distinct, never a nested loop."""
    plan = plans("tpch_q4")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    scan = next(l for l in plan.split("\n") if "FileScan" in l and "lineitem" in l)
    assert "l_returnflag" in scan  # flag filter pushed to the lineitem scan


def test_q18_having_subquery_is_partial_agg_semi_join(plans):
    """tpch_q18: the HAVING-qty subquery is a partial-agg groupBy
    (map-side combine before its shuffle) re-joined LEFT SEMI; no
    window, no sort in the agg pipeline."""
    plan = plans("tpch_q18")
    assert "LeftSemi" in plan
    assert "Window [" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final for both aggs


def test_bigram_lm_no_window_staged_counts(plans):
    """text_bigram_lm: the model counts must be hash aggs (map-side
    combine) with the bigram stream persisted for its two consumers —
    never a count-over-window on the gram (hot bigrams like 'of the'
    would concentrate into one un-splittable window partition)."""
    plan = plans("text_bigram_lm")
    assert "Window [" not in plan
    assert plan.count("InMemoryTableScan") >= 3  # grams x2 + c2 reuse
    assert plan.count("HashAggregate") >= 4


def test_zipf_topn_is_take_ordered_not_global_sort(plans):
    """corpus_zipf: the top-N cut must plan TakeOrderedAndProject
    (per-partition heaps) over the AGGREGATED vocab; the only window
    ranks the <= N surviving rows."""
    plan = plans("corpus_zipf")
    assert "TakeOrdered" in plan
    assert plan.count("Window [") == 1


def test_semantic_dedup_assignment_is_narrow(plans):
    """dedup_semantic: centroid assignment must be a zero-shuffle map
    against plan-literal centroids (no exchange between the scan and
    the bucket self-join) and pairs must be bucket-confined — no
    cartesian product anywhere."""
    plan = plans("dedup_semantic")
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    # only the keeper groupBy may hash-shuffle at small SF (the bucket
    # join broadcasts); at scale the join adds one more — never more
    assert plan.count("Exchange hashpartitioning") <= 2


def test_pagerank_edges_persisted_no_cartesian(plans):
    """graph_pagerank: the edge+degree frame is persisted once and
    re-read per iteration (InMemoryTableScan), every iteration is an
    equi-join + partial-agg groupBy — no cartesian/nested-loop, no
    window."""
    plan = plans("graph_pagerank")
    assert plan.count("InMemoryTableScan") >= 1
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert "Window [" not in plan


def test_dsir_models_broadcast_corpus_never_shuffles_on_feature(plans):
    """text_dsir: both bucket-count models (bounded by n_buckets) and
    the totals row are broadcast; the raw feature stream is persisted
    and consumed in place — no window, no corpus shuffle keyed by
    feature (the doc-keyed final agg and the model-side aggs own the
    hash exchanges)."""
    plan = plans("text_dsir")
    assert "Window [" not in plan
    assert plan.count("BroadcastExchange") >= 3
    assert plan.count("InMemoryTableScan") >= 3


def test_kmeans_final_assignment_zero_shuffle(plans):
    """ml_kmeans: centroids are a driver-fetched model baked in as
    plan literals, so the returned assignment pass is a pure narrow
    map — NO exchange, no join, no window anywhere in the final plan
    (iteration-update aggs run at build time, not in this plan)."""
    plan = plans("ml_kmeans")
    assert "Exchange" not in plan
    assert "Join" not in plan and "Window [" not in plan


def test_gap_fill_grid_explodes_from_aggregated_bounds(plans):
    """events_gap_fill: the hour grid must Generate from the per-user
    BOUNDS agg (one row per user), never from raw events, and the
    forward fill is a single user-keyed window."""
    plan = plans("events_gap_fill")
    gen = [l for l in plan.split("\n") if "Generate explode" in l]
    assert len(gen) == 1
    win_lines = [l for l in plan.split("\n") if "Window [" in l]
    assert len(win_lines) == 1 and "windowspecdefinition(user_id" in win_lines[0]


def test_q10_aggregates_before_dim_join_takeordered(plans):
    """tpch_q10: the per-customer agg runs BEFORE the customer/nation
    joins (dims never ride the fact shuffle), the returnflag filter
    pushes to the lineitem scan, and top-k is TakeOrderedAndProject."""
    plan = plans("tpch_q10")
    assert "TakeOrdered" in plan
    scan = next(l for l in plan.split("\n") if "FileScan" in l and "lineitem" in l)
    assert "l_returnflag" in scan
    # the aggregate's grouping key is the fact-side custkey — the agg
    # happens before c_name/c_acctbal exist in the stream
    agg_lines = [l for l in plan.split("\n") if "HashAggregate" in l and "o_custkey" in l]
    assert agg_lines and all("c_name" not in l for l in agg_lines)


@slow_tier
def test_no_cartesian_or_row_udf_anywhere_in_catalog(spark, sf_dir):
    """Catalog-wide anti-pattern audit: NO query may plan a
    CartesianProduct (a non-broadcast cross join is quadratic data
    movement at scale; the deliberate 1-row/model attachments and the
    broadcast-query ANN baseline plan BroadcastNestedLoopJoin, which
    is allowed) and none may plan BatchEvalPython (row-at-a-time
    Python UDF — the Arrow-batched ArrowEvalPython / MapInPandas /
    FlatMapGroupsInPandas nodes are the sanctioned Python paths)."""
    qs = catalog.queries()
    offenders = {}
    for name, fn in qs.items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        bad = []
        if "CartesianProduct" in plan:
            bad.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            bad.append("BatchEvalPython")
        if bad:
            offenders[name] = bad
    assert not offenders, f"anti-patterns in catalog plans: {offenders}"


def test_incremental_dedup_anti_join_then_window(plans):
    """dedup_incremental: history enters as a LEFT ANTI join on the
    fingerprint; the keep-first window runs on the anti-join
    SURVIVORS only (history-matched rows never enter its shuffle)."""
    plan = plans("dedup_incremental")
    assert plan.count("LeftAnti") == 1
    assert plan.count("Window [") == 1


def test_pack_sequences_single_group_window(plans):
    """split_pack_sequences: exactly one group-keyed exchange + window
    (per-group packing); everything else narrow."""
    plan = plans("split_pack_sequences")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window [") == 1


def test_bpe_pairs_takeordered_bounded_shuffle(plans):
    """text_bpe_pairs: pair-keyed hash agg (bounded by charset²) then
    TakeOrderedAndProject — no global sort of the pair stream."""
    plan = plans("text_bpe_pairs")
    assert "TakeOrdered" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_winnow_single_fingerprint_shuffle_no_gram_explode(plans):
    """dedup_winnow: gram hashing and window minima stay inside array
    columns — exactly ONE Generate (the selected minima) and ONE
    fingerprint-keyed shuffle."""
    plan = plans("dedup_winnow")
    assert plan.count("Generate") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window [" not in plan


def test_q17_decorrelated_no_window_no_cartesian(plans):
    """tpch_q17: the correlated subquery must run as a per-part agg
    joined back — bounded exchanges, no per-row subquery artifacts."""
    plan = plans("tpch_q17")
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "CartesianProduct" not in plan and "Window [" not in plan


def test_bm25_zero_corpus_shuffle_takeordered(plans):
    """search_bm25: corpus stats are a 1-row broadcast; per-doc
    scoring is narrow; top-k is TakeOrderedAndProject — the only
    acceptable exchanges are the stats agg's single-partition combine
    and the bounded 20-row rank window."""
    plan = plans("search_bm25")
    assert "TakeOrdered" in plan
    assert plan.count("Exchange hashpartitioning") == 0


def test_transitions_single_window_pass(plans):
    """event_transitions: the corpus-sized lead-window subtree runs
    ONCE — pairs is persisted and BOTH consumers (totals, the join)
    read the cache. (The plan TEXT prints the cached subtree per
    occurrence, so the guard counts InMemoryTableScans, not Window
    strings.)"""
    plan = plans("event_transitions")
    assert plan.count("InMemoryTableScan") >= 2


def test_cube_single_expand_single_shuffle(plans):
    """event_cube: the 2^k lattice rides ONE Expand + ONE hash
    exchange of grouping-set-tagged partials — never a union of
    per-set scans."""
    plan = plans("event_cube")
    assert plan.count("Expand") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Union") == 0


def test_q19_single_stage_no_shuffle(plans):
    """tpch_q19: broadcast dim + OR-of-conjunctions residual + 1-row
    agg — zero hash exchanges."""
    plan = plans("tpch_q19")
    assert plan.count("Exchange hashpartitioning") == 0
    assert plan.count("BroadcastExchange") == 1


def test_q22_anti_join_broadcast_threshold(plans):
    """tpch_q22: the scalar avg is a 1-row broadcast (no driver
    action), NOT EXISTS is a LEFT ANTI."""
    plan = plans("tpch_q22")
    assert plan.count("LeftAnti") == 1
    assert plan.count("BroadcastExchange") >= 1


def test_error_streaks_share_one_user_exchange(plans):
    """events_error_streaks: both island windows (user and
    user+type partitioning share the user prefix) plus the two
    bounded aggs ride ONE user-keyed exchange."""
    plan = plans("events_error_streaks")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window [") == 2


def test_domain_sampling_one_corpus_window_exchange(plans):
    """corpus_domain_sampling: ONE window pass (the per-domain
    running-token order) over ONE corpus-sized domain exchange; the
    budget frame attaches by broadcast, never by shuffling the corpus
    a second time on a non-domain key."""
    plan = plans("corpus_domain_sampling")
    assert plan.count("Window [") == 1
    assert "CartesianProduct" not in plan
    # every hash exchange is domain-keyed (window + tiny agg) — no
    # shuffle on doc_id or any other corpus-wide key
    import re
    for line in plan.splitlines():
        m = re.search(r"Exchange hashpartitioning\(([a-zA-Z_0-9#]+)", line)
        if m:
            assert m.group(1).startswith("domain"), line


def test_q13_left_outer_keeps_zero_bucket(plans):
    """tpch_q13: the priority filter rides the LEFT JOIN condition
    (post-join filtering would fake zero-order customers); two hash
    aggs, no cartesian."""
    plan = plans("tpch_q13")
    assert "LeftOuter" in plan
    assert "CartesianProduct" not in plan


def test_q21_decorrelated_single_order_stats_agg(plans):
    """tpch_q21: EXISTS/NOT-EXISTS decorrelated into ONE per-order
    distinct-supplier agg — every corpus-sized hash exchange is keyed
    on the orderkey (the supplier name attaches by broadcast after the
    per-supplier collapse)."""
    import re

    plan = plans("tpch_q21")
    assert "CartesianProduct" not in plan
    keys = re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
    assert keys, plan
    assert all(k in ("l_orderkey", "l_suppkey") for k in keys), keys
    # count_distinct over two metrics in one agg: expand writes 2 rows
    assert "Expand" in plan


def test_moving_range_window_single_user_exchange(plans):
    """window_moving_avg_range: both range aggregates ride ONE
    user-keyed exchange and one Window node."""
    plan = plans("window_moving_avg_range")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window [") == 1


def test_funnel_lag_user_keyed_aggs_only(plans):
    """funnel_time_to_convert: the heavy exchanges are user-keyed
    conditional-min aggs; the distribution fold is a single-partition
    agg over the tiny converter set."""
    import re

    plan = plans("funnel_time_to_convert")
    keys = re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
    assert all(k == "user_id" for k in keys), keys


def test_c4_filter_zero_shuffle(plans):
    """text_c4_filters: synthesis + line retention + doc gates are one
    narrow codegen stage — no exchange at all."""
    plan = plans("text_c4_filters")
    assert "Exchange hashpartitioning" not in plan


def test_pmi_takeordered_single_gram_shuffle(plans):
    """text_pmi_collocations: the bigram hash agg is the only
    corpus-sized shuffle (marginals re-aggregate the persisted count
    table); the top-N cut is TakeOrderedAndProject, never a global
    sort."""
    plan = plans("text_pmi_collocations")
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan.replace("TakeOrderedAndProject", "")


def test_scd2_both_windows_one_user_exchange(plans):
    """scd2_user_tier: change-detect lag and interval-close lead ride
    ONE user-keyed exchange (the filter between them preserves
    partitioning)."""
    plan = plans("scd2_user_tier")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window [") == 2


def test_attribution_one_user_exchange(plans):
    """attribution_last_touch: both IGNORE NULLS windows share one
    user-keyed exchange; the conversion filter happens after."""
    plan = plans("attribution_last_touch")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window [") == 1  # both last_values in one node


def test_recon_full_outer_preaggregated(plans):
    """recon_orders_lineitems: lineitems collapse per order BEFORE the
    FULL OUTER join — the join input is the aggregated frame."""
    plan = plans("recon_orders_lineitems")
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan


def test_top_component_no_corpus_shuffle(plans):
    """embed_top_component: the corpus never hash-shuffles — every
    round is a map-side-collapsing per-dim agg plus 1-row broadcast
    cross joins (the iterate and the mean are 1-row frames)."""
    plan = plans("embed_top_component")
    assert "Exchange hashpartitioning" not in plan


def test_grouping_sets_single_expand_shuffle(plans):
    """event_grouping_sets: the 4-set lattice is ONE Expand over one
    grouping-key shuffle — not four scans."""
    plan = plans("event_grouping_sets")
    assert plan.count("Expand") == 1
    assert plan.count("FileScan") == 1


def test_twap_one_user_exchange(plans):
    """events_twap: lead window and the weighted agg ride one
    user-keyed exchange."""
    plan = plans("events_twap")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window [") == 1


def test_cdc_apply_delta_collapses_before_merge(plans):
    """cdc_apply_upserts: the change slice collapses to latest-per-key
    BEFORE the merge join (windows over the two slices, then one keyed
    full-outer merge) — raw changes never ride the merge."""
    plan = plans("cdc_apply_upserts")
    assert plan.count("Window [") == 2
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan


def test_vocab_divergence_takeordered_tiny_join(plans):
    """corpus_vocab_divergence: per-corpus vocab cuts are
    TakeOrderedAndProject on the AGGREGATED vocab; the JS join touches
    only the two ≤2k-row frames."""
    plan = plans("corpus_vocab_divergence")
    # pre-materialization the persisted joined frame's subtree prints
    # once per consumer, so count >= 2 (exactly 2 distinct cuts)
    assert plan.count("TakeOrderedAndProject(limit=2000") >= 2
    assert "CartesianProduct" not in plan


def test_cumulative_users_no_expanding_rescan(plans):
    """users_cumulative_distinct: the running sum windows over the
    per-day frame (single tiny partition) — exactly one Window, and
    the events table scans at most twice (first-seen + actives), not
    once per day."""
    plan = plans("users_cumulative_distinct")
    assert plan.count("Window [") == 1
    assert plan.count("FileScan") <= 2


def test_basket_pairs_no_fact_self_join(plans):
    """basket_part_pairs: pairs generate INSIDE the per-order array
    (one orderkey agg + Generate) — the fact table never self-joins
    on orderkey, and the cut is TakeOrderedAndProject."""
    import re

    plan = plans("basket_part_pairs")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    # the only orderkey-keyed exchange is the basket agg; every join
    # in the plan is broadcast (marginals + 1-row count)
    assert "SortMergeJoin" not in plan


def test_rfm_threshold_broadcast_no_global_window(plans):
    """customers_rfm: quintile assignment must NOT be a global NTILE
    window (single-task serialization at scale) — thresholds broadcast
    and the bucket fold is narrow."""
    plan = plans("customers_rfm")
    assert "Window [" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_fuzzy_match_blocking_is_equi_join(plans):
    """match_fuzzy_entities: candidates must come from the pigeonhole
    EQUI-join on (half_index, half_text) — never a nested-loop /
    cartesian all-pairs with a levenshtein predicate (the O(n·m)
    trap); the verify runs post-join in codegen."""
    plan = plans("match_fuzzy_entities")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan
    assert "BatchEvalPython" not in plan


def test_runtime_bloom_filter_injects_for_selective_join(spark, tmp_path):
    """100 TB anti-join/join acceleration evidence: with a selective
    creation side, Catalyst's InjectRuntimeFilter plants a
    bloom_filter_agg on the dim side and a might_contain probe on the
    fact scan — rows that cannot match are dropped BEFORE the shuffle.
    The production default applicationSideScanSizeThreshold (10 GB) is
    correct at fleet scale; this test lowers it to 0 only because the
    fixture scan is tiny, proving the engine's session leaves the
    injection pipeline enabled."""
    from pyspark.sql import functions as F

    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    )
    spark.range(0, 50000).withColumn("k", F.col("id") % 10000).withColumn(
        "pay", F.md5(F.col("id").cast("string"))
    ).write.parquet(str(tmp_path / "fact"))
    spark.range(0, 10000).withColumn(
        "cat", (F.col("id") % 100).cast("string")
    ).write.parquet(str(tmp_path / "dim"))
    prev_scan = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fact = spark.read.parquet(str(tmp_path / "fact"))
        dim = (
            spark.read.parquet(str(tmp_path / "dim"))
            .filter(F.col("cat") == "7")
            .select(F.col("id").alias("k2"))
        )
        j = fact.join(dim, fact.k == F.col("k2"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
        # probe sits on the fact side BEFORE its exchange
        fact_scan_side = plan.split("might_contain")[1]
        assert "FileScan" in fact_scan_side
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            prev_scan,
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)


def test_week_over_week_pushed_ranges_cached_sets(plans):
    """users_week_over_week: week membership must reach parquet as a
    pushed ts range (the date_trunc-equality form pushed nothing),
    and each weekly distinct set feeds all three set ops from cache —
    no scan may plan with empty PushedFilters."""
    plan = plans("users_week_over_week")
    assert "InMemoryTableScan" in plan
    scans = [l for l in plan.split("\n") if "FileScan" in l]
    assert scans and all("PushedFilters: []" not in l for l in scans)


def test_deleter_negation_pushes_to_parquet(plans):
    """proc_deleter: the null-safe negation must reach the reader as
    Or(IsNull, Not(EqualTo)) — the ~coalesce(cond, false) form pushed
    nothing (query-lint finding), silently re-reading every row group
    of a 100 TB table to delete from it."""
    scan = filescan_line(plans("proc_deleter"))
    assert "PushedFilters: []" not in scan
    assert "Or(IsNull(event_type),Not(EqualTo(event_type,click)))" in scan


def test_cdc_ivm_cutoffs_push_to_parquet(plans):
    """cdc_apply_upserts / ivm_merge_event_counts: both slice cutoffs
    are raw ts ranges at the scan (the day-truncated compare pushed
    nothing on either side of the cutoff)."""
    for name in ("cdc_apply_upserts", "ivm_merge_event_counts"):
        plan = plans(name)
        scans = [l for l in plan.split("\n") if "FileScan" in l]
        assert scans and all("PushedFilters: []" not in l for l in scans), name


def test_peak_concurrency_two_phase_prefix(plans):
    """events_peak_concurrency: the global running sum must decompose —
    ONE hour-partitioned window over the boundary stream plus one
    window over the bounded per-hour frame (the naive form is a single
    empty-PARTITION-BY window dragging the whole corpus through one
    task); offsets attach by broadcast."""
    plan = plans("events_peak_concurrency")
    assert plan.count("Window [") == 2
    # the corpus-sized window is hour-partitioned; the global-ordered
    # one runs over the |hours| aggregate only (after a HashAggregate)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_asof_nearest_one_exchange_no_range_join(plans):
    """join_asof_nearest: both directions ride ONE union + ONE
    user-keyed exchange (two window sorts over the same partition) —
    never a range/nested-loop join."""
    plan = plans("join_asof_nearest")
    assert plan.count("Window [") == 2
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    # one exchange for the union'd frame (plus at most the scans')
    assert plan.count("Exchange hashpartitioning") == 1
