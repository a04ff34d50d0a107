"""Hand-computed replicas for the r12 capability rows: KS two-sample
(A113), HITS (A114), k-center coreset (L142) — the SURVEY §5
discipline: beside the cross-engine oracle gate, each operator is
pinned to values computed by hand on a planted input."""

from pyspark.sql import functions as F

from logprep_spark.plans import analytics as an


def test_ks_two_sample_hand_computed(spark):
    # variant 0: [1, 2, 3, 4]; variant 1: [3, 4, 5, 6]
    # n0 = n1 = 4. CDF gaps (scaled by n0*n1 = 16) at v=1..6:
    #   v=1: |1*4 - 0*4| = 4     v=2: |2*4 - 0| = 8
    #   v=3: |3*4 - 1*4| = 8     v=4: |4*4 - 2*4| = 8
    #   v=5: |16 - 12| = 4       v=6: 0
    # max = 8 first attained at v=2 -> D = 8/16 = 0.5, d_milli = 500
    rows = [(v, 0) for v in (1, 2, 3, 4)] + [(v, 1) for v in (3, 4, 5, 6)]
    obs = spark.createDataFrame(rows, "vm long, variant long")
    out = an.ks_two_sample(obs).collect()[0]
    assert out["n0"] == 4 and out["n1"] == 4
    assert out["ks_scaled"] == 8
    assert out["at_vm"] == 2
    assert out["d_milli"] == 500
    # critical: D > 1.358*sqrt(8/16) = 0.960 ? 0.5 < 0.960 -> keep null
    assert bool(out["reject_05"]) is False


def test_ks_two_sample_disjoint_rejects(spark):
    # fully separated samples, 30 each: D = 1.0 > 1.358*sqrt(60/900)
    rows = [(v, 0) for v in range(30)] + [(v + 100, 1) for v in range(30)]
    obs = spark.createDataFrame(rows, "vm long, variant long")
    out = an.ks_two_sample(obs).collect()[0]
    assert out["d_milli"] == 1000
    assert bool(out["reject_05"]) is True


def test_hits_hand_computed(spark):
    # bipartite: hubs {1, 2}, authorities {10, 20}
    #   1 -> 10, 1 -> 20, 2 -> 10
    # round 1: a_raw(10) = h1+h2 = 2000, a_raw(20) = 1000; max 2000
    #   a(10) = 1000, a(20) = 500
    #   h_raw(1) = a10+a20 = 1500, h_raw(2) = 1000; max 1500
    #   h(1) = 1000, h(2) = 1000*1000 div 1500 = 666
    # round 2: a_raw(10) = 1666, a_raw(20) = 1000 -> a(10)=1000,
    #   a(20) = 1000000 div 1666 = 600
    #   h_raw(1) = 1600, h_raw(2) = 1000 -> h(1)=1000, h(2)=625
    # round 3: a_raw(10) = 1625, a_raw(20) = 1000 -> a(10)=1000,
    #   a(20) = 1000000 div 1625 = 615
    #   h_raw(1) = 1615, h_raw(2) = 1000 -> h(1)=1000,
    #   h(2) = 1000000 div 1615 = 619
    edges = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10)], "src long, dst long"
    )
    got = {
        (r["role"], r["node"]): (r["score_milli"], r["rank"])
        for r in an.hits_scores(edges, iters=3, topk=10).collect()
    }
    assert got[("hub", 1)] == (1000, 1)
    assert got[("hub", 2)] == (619, 2)
    assert got[("authority", 10)] == (1000, 1)
    assert got[("authority", 20)] == (615, 2)


def test_kcenter_selects_farthest_points(spark):
    """The greedy traversal on planted 1-D points (as 2-dim vectors):
    ids 1..4 at x = 0, 1, 10, 30 (micro-scaled by micro_vec). Seed =
    min id (x=0); next = farthest (x=30, d² = 30²·1e12); then x=10
    (min(10², 20²)·1e12); then x=1. Coverage after k=3 is x=1's
    min-dist² = 1e12."""
    from logprep_spark.plans.catalog import sample_coreset_kcenter  # noqa: F401
    from logprep_spark.functions import similarity as sim

    emb = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [10.0, 0.0]),
         (4, [30.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    vm = emb.select("vec_id", sim.micro_vec(F.col("embedding")).alias("_v"))
    rows = {r["vec_id"]: list(r["_v"]) for r in vm.collect()}
    assert rows[4] == [30_000_000, 0]
    # replicate the greedy loop exactly as the catalog row runs it
    # (center literals + TakeOrdered argmax), k=3
    def d2(center):
        arr = "array(" + ",".join(str(int(x)) for x in center) + ")"
        return (
            f"aggregate(zip_with(_v, {arr}, (x, y) -> (x - y) * (x - y)),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )

    first = vm.orderBy("vec_id").limit(1).collect()[0]
    sel = [int(first["vec_id"])]
    centers = [list(first["_v"])]
    d2s = []
    for _ in range(2):
        dmin = (
            d2(centers[0]) if len(centers) == 1
            else "least(" + ",".join(d2(c) for c in centers) + ")"
        )
        nxt = (
            vm.selectExpr("vec_id", "_v", f"CAST({dmin} AS BIGINT) AS d")
            .orderBy(F.col("d").desc(), "vec_id")
            .limit(1)
            .collect()[0]
        )
        sel.append(int(nxt["vec_id"]))
        centers.append(list(nxt["_v"]))
        d2s.append(int(nxt["d"]))
    assert sel == [1, 4, 3]
    assert d2s == [900 * 10**12, 100 * 10**12]
    dmin_all = "least(" + ",".join(d2(c) for c in centers) + ")"
    cov = (
        vm.selectExpr(f"CAST({dmin_all} AS BIGINT) AS d")
        .agg(F.max("d"))
        .collect()[0][0]
    )
    assert cov == 1 * 10**12  # x=1's distance² to the selected x=0
