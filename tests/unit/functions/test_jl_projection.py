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
