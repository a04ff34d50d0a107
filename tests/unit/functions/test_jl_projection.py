"""JL sign projection: Python-replica bit-equality, expectation
centering, and partitioning invariance — the all-integer determinism
the embed_jl_distortion oracle row relies on."""

from __future__ import annotations

import hashlib
import itertools

from logprep_spark.functions.similarity import (
    jl_distortion_report,
    jl_project,
    jl_signs,
)

D, M = 8, 4

VECS = [
    (0, [0.5, -1.25, 2.0, 0.125, -0.375, 1.5, -2.25, 0.75]),
    (1, [1.0, 1.0, -1.0, 0.5, 0.25, -0.125, 2.0, -0.5]),
    (2, [-0.75, 0.375, 1.125, -2.0, 0.625, 0.875, -1.375, 0.25]),
    (3, [2.25, -0.625, 0.0, 1.75, -1.125, 0.5, 0.375, -2.5]),
]


def _replica_project(vec):
    signs = jl_signs(M, D)
    v = [round(x * 1_000_000) for x in vec]
    return [sum(s * x for s, x in zip(row, v)) for row in signs]


def test_signs_are_md5_derived():
    s = jl_signs(2, 3)
    for k in range(2):
        for j in range(3):
            h = int(
                hashlib.md5(f"jl:{k}:{j}".encode()).hexdigest()[:15], 16
            )
            assert s[k][j] == (1 if h % 2 == 0 else -1)


def test_projection_matches_python_replica(spark):
    df = spark.createDataFrame(VECS, ["vec_id", "embedding"])
    got = {
        r["vec_id"]: list(r["_p"])
        for r in jl_project(df, m=M, d=D).collect()
    }
    for vid, vec in VECS:
        assert got[vid] == _replica_project(vec)


def test_projection_raises_on_dim_mismatch(spark):
    """A vector whose dim differs from d must fail loudly, not
    null-poison the fold into silent NULL projections."""
    import pytest

    df = spark.createDataFrame(
        [("bad", [0.5] * (D - 1))], ["vec_id", "embedding"]
    )
    with pytest.raises(Exception, match="jl_project"):
        jl_project(df, m=M, d=D).collect()


def test_distortion_report_replica_and_invariance(spark):
    df = spark.createDataFrame(VECS, ["vec_id", "embedding"])
    (row,) = jl_distortion_report(
        df, m=M, d=D, sample_mod=1
    ).collect()
    # full pair set (sample_mod=1 keeps all ids)
    micro = {i: [round(x * 1e6) for x in v] for i, v in VECS}
    proj = {i: _replica_project(v) for i, v in VECS}
    ratios = []
    for a, b in itertools.combinations(sorted(micro), 2):
        d0 = sum((x - y) ** 2 for x, y in zip(micro[a], micro[b]))
        dp = sum((x - y) ** 2 for x, y in zip(proj[a], proj[b]))
        ratios.append(1000 if d0 == 0 else 1000 * dp // (M * d0))
    assert row["n_pairs"] == len(ratios) == 6
    assert row["mean_ratio_milli"] == sum(ratios) // len(ratios)
    assert row["min_ratio_milli"] == min(ratios)
    assert row["max_ratio_milli"] == max(ratios)
    assert row["n_within_20pct"] == sum(
        1 for r in ratios if abs(r - 1000) <= 200
    )

    shuffled = spark.createDataFrame(VECS[::-1], ["vec_id", "embedding"]).repartition(3)
    assert jl_distortion_report(
        shuffled, m=M, d=D, sample_mod=1
    ).collect() == [row]


# --- NDCG@k ------------------------------------------------------------


def test_ndcg_hand_values(spark):
    """Hand-checked gradings at k=3: perfect ranking = 1000, a
    disjoint list = 0, and a REVERSED ranking's DCG computed by hand
    from the integer weight table."""
    from logprep_spark.functions.similarity import (
        ndcg_at_k,
        ndcg_weights_micro,
    )

    k = 3
    w = ndcg_weights_micro(k)
    idcg = sum((k + 1 - i) * w[i] for i in range(1, k + 1))

    truth = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        ["query_id", "nbr_id", "rank"],
    )
    perfect = truth
    (r,) = ndcg_at_k(perfect, truth, k=k).collect()
    assert r["ndcg_milli"] == 1000 and r["n_overlap"] == 3

    disjoint = spark.createDataFrame(
        [(1, 90, 1), (1, 91, 2), (1, 92, 3)],
        ["query_id", "nbr_id", "rank"],
    )
    (d,) = ndcg_at_k(disjoint, truth, k=k).collect()
    assert d["ndcg_milli"] == 0 and d["n_overlap"] == 0

    reverse = spark.createDataFrame(
        [(1, 12, 1), (1, 11, 2), (1, 10, 3)],
        ["query_id", "nbr_id", "rank"],
    )
    (v,) = ndcg_at_k(reverse, truth, k=k).collect()
    dcg = 1 * w[1] + 2 * w[2] + 3 * w[3]
    assert v["ndcg_milli"] == 1000 * dcg // idcg
    assert 0 < v["ndcg_milli"] < 1000


def test_ndcg_ignores_beyond_k(spark):
    """rank > k rows on either side must not contribute."""
    from logprep_spark.functions.similarity import ndcg_at_k

    truth = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 99, 7)],
        ["query_id", "nbr_id", "rank"],
    )
    approx = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 99, 3), (1, 10, 9)],
        ["query_id", "nbr_id", "rank"],
    )
    (r,) = ndcg_at_k(approx, truth, k=2).collect()
    assert r["n_overlap"] == 2 and r["ndcg_milli"] == 1000


# --- all-but-the-top ----------------------------------------------------


def test_remove_top_component_kills_the_direction(spark):
    """Anisotropic fixture: vectors dominated by a shared direction
    plus small noise. After removal (a) every residual dot with the
    component is truncation-noise-sized, (b) the variance along the
    dominant axis collapses, and (c) the result is repartition-
    invariant."""
    from logprep_spark.functions.similarity import (
        remove_top_component,
        top_component,
    )

    d = 8
    base = [1.0, 2.0, -1.0, 0.5, 0.25, -0.75, 1.5, -0.5]
    vecs = []
    for i in range(16):
        scale = (i - 8) * 2.0                     # strong shared axis
        noise = [((i * 7 + j * 3) % 5 - 2) * 0.01 for j in range(d)]
        vecs.append((i, [scale * b + z for b, z in zip(base, noise)]))
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])

    rows = remove_top_component(df, iters=3, sample_mod=1).collect()
    assert len(rows) == 16 * d
    # (a) residual dot is tiny vs the pre-removal magnitude (~1e9+)
    assert max(abs(r["resid_dot"]) for r in rows) <= d * 1000
    # (b) variance along the component collapses: reconstruct per-vec
    # projections onto u from the removed frame
    (comp,) = top_component(df, iters=3).collect()
    u = comp["component_milli"]
    per_vec = {}
    for r in rows:
        per_vec.setdefault(r["vec_id"], [0] * d)[r["dim"] - 1] = r["value_micro"]
    dots = [
        sum(v[j] * u[j] for j in range(d)) for v in per_vec.values()
    ]
    assert max(map(abs, dots)) <= d * 1_000_000   # vs ~1e12 before

    again = remove_top_component(
        df.repartition(5), iters=3, sample_mod=1
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))
