"""Efraimidis-Spirtakis A-Res weighted sampling: replica equality,
weight preference, determinism, domain guard."""

from __future__ import annotations

import hashlib
import math

from logprep_spark.functions.sampling import weighted_sample


def _pri(doc_id, weight):
    h = int(hashlib.md5(f"ws:{doc_id}".encode()).hexdigest()[:15], 16)
    return math.log((h + 1) / float(1 << 60)) / weight


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "w"])


def test_matches_python_replica(spark):
    """Uniform weights: the selected set equals the Python A-Res
    replica (pure hash order when weights are equal)."""
    rows = [(i, 10) for i in range(200)]
    got = {r.doc_id for r in weighted_sample(_df(spark, rows), "w", 15).collect()}
    want = {i for i, _ in sorted(rows, key=lambda r: -_pri(r[0], r[1]))[:15]}
    assert got == want and len(got) == 15


def test_heavy_weights_dominate(spark):
    """Weight-1000 items vs weight-1 items: all ten heavy items make a
    top-20 sample (P(miss) ~ (1/1000)-ish per item; md5 is fixed so
    this is a deterministic assertion verified by the replica)."""
    rows = [(i, 1000) for i in range(10)] + [(i, 1) for i in range(10, 1000)]
    got = {r.doc_id for r in weighted_sample(_df(spark, rows), "w", 20).collect()}
    want = {i for i, w in sorted(rows, key=lambda r: -_pri(r[0], r[1]))[:20]}
    assert got == want
    assert set(range(10)) <= got


def test_repartition_invariant_and_domain_guard(spark):
    rows = [(i, (i % 7) + 1) for i in range(300)] + [(900, 0), (901, -3)]
    a = {r.doc_id for r in weighted_sample(_df(spark, rows), "w", 25).collect()}
    b = {
        r.doc_id
        for r in weighted_sample(
            _df(spark, rows).repartition(13), "w", 25
        ).collect()
    }
    assert a == b and len(a) == 25
    assert 900 not in a and 901 not in a  # non-positive weights excluded


def test_per_group_matches_python_replica(spark):
    """Per-stratum A-Res: each group independently keeps its n
    largest ln(u)/w priorities — replica equality per group, heavy
    weights dominate within their own stratum only."""
    import math

    from logprep_spark.functions.sampling import (
        _WS_H_MAX,
        weighted_sample_per_group,
    )
    from logprep_spark.functions.dedup import _perm_const  # noqa: F401
    import hashlib

    rows = [
        (i, "g%d" % (i % 3), float(w))
        for i, w in enumerate([5, 1, 50, 3, 8, 2, 40, 1, 9, 7, 60, 4])
    ]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "w"])
    got = {
        (r.grp, r.doc_id)
        for r in weighted_sample_per_group(
            df, "w", "grp", 2, id_col="doc_id"
        ).collect()
    }

    def pri(i, w):
        h = int(hashlib.md5(f"ws:{i}".encode()).hexdigest()[:15], 16)
        return math.log((h + 1) / _WS_H_MAX) / w

    want = set()
    for g in ("g0", "g1", "g2"):
        members = [(i, w) for i, gg, w in rows if gg == g]
        top = sorted(members, key=lambda t: (-pri(*t), t[0]))[:2]
        want |= {(g, i) for i, _ in top}
    assert got == want
    # every group contributes exactly 2
    for g in ("g0", "g1", "g2"):
        assert sum(1 for gg, _ in got if gg == g) == 2

    # repartition invariance
    again = {
        (r.grp, r.doc_id)
        for r in weighted_sample_per_group(
            df.repartition(5), "w", "grp", 2, id_col="doc_id"
        ).collect()
    }
    assert again == got


def test_per_group_excludes_nonpositive_weights(spark):
    from logprep_spark.functions.sampling import weighted_sample_per_group

    df = spark.createDataFrame(
        [(1, "g", 0.0), (2, "g", -3.0), (3, "g", 1.0)],
        ["doc_id", "grp", "w"],
    )
    got = weighted_sample_per_group(df, "w", "grp", 5).collect()
    assert [r.doc_id for r in got] == [3]


# --- Poisson bootstrap --------------------------------------------------


def test_poisson_bootstrap_replica_and_coverage(spark):
    """The weights are hash-deterministic (Python replica equality),
    Poisson(1)-shaped (mean weight ~1), the band brackets the point
    mean, and the whole readout is repartition-invariant."""
    import hashlib
    import math

    from logprep_spark.functions.sampling import (
        poisson_bootstrap_mean,
        poisson_bootstrap_thresholds,
    )

    rows = [(i, 1000 + 37 * (i % 19)) for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "vm"])
    (r,) = poisson_bootstrap_mean(df, "vm", "id", n_resamples=20).collect()

    th = poisson_bootstrap_thresholds()

    def w(i, b):
        h = int(
            hashlib.md5(f"pb:{i}:{b}".encode()).hexdigest()[:15], 16
        )
        for k, t in enumerate(th):
            if h < t:
                return k
        return 7

    means = sorted(
        sum(w(i, b) * v for i, v in rows)
        // max(sum(w(i, b) for i, _ in rows), 1)
        for b in range(20)
    )
    assert r["point_mean_milli"] == sum(v for _, v in rows) // len(rows)
    assert r["boot_lo_milli"] == means[0]
    assert r["boot_hi_milli"] == means[-1]
    assert r["boot_lo_milli"] <= r["point_mean_milli"] <= r["boot_hi_milli"]
    # Poisson(1) sanity: total weight over 300x20 draws ~ 6000 ± 5%
    total_w = sum(w(i, b) for i, _ in rows for b in range(20))
    assert abs(total_w - 6000) < 300

    (again,) = poisson_bootstrap_mean(
        df.repartition(7), "vm", "id", n_resamples=20
    ).collect()
    assert again == r


def test_mix_materialize_epochs_and_prefix(spark):
    """Hand-checkable materialization: a domain with 3x5-token docs
    and 20 allocated tokens gives every doc 1 full epoch plus one
    extra copy to the hash-prefix doc covering the 5-token remainder;
    a downsampled domain (alloc < corpus) gives the prefix 1 copy and
    the tail 0. Total materialized tokens never undershoot the
    allocation by more than the boundary doc, never overshoot by more
    than one doc, and the schedule is repartition-invariant."""
    from pyspark.sql import functions as F

    from logprep_spark.functions.sampling import mix_materialize

    df = spark.createDataFrame(
        [(i, "up", "w " * 5) for i in range(3)]
        + [(10 + i, "down", "w " * 10) for i in range(4)],
        ["doc_id", "source", "text"],
    )
    alloc = spark.createDataFrame(
        [("up", 15, 20), ("down", 40, 25)],
        ["domain", "n_tokens", "allocated_tokens"],
    )
    rows = mix_materialize(df, alloc).collect()
    got = {r["doc_id"]: r["n_copies"] for r in rows}
    up = {i: got[i] for i in range(3)}
    down = {10 + i: got[10 + i] for i in range(4)}
    # up: 1 full epoch everywhere, exactly one doc at 2
    assert sorted(up.values()) == [1, 1, 2]
    # down: no full epoch; the 25-token remainder covers the first
    # 3 hash-ordered docs (cum-t < 25 holds through the 3rd: 20 < 25)
    assert sorted(down.values()) == [0, 1, 1, 1]
    for dom, alloc_t, tok in (("up", 20, 5), ("down", 25, 10)):
        tot = sum(
            r["n_copies"] * r["n_tokens"] for r in rows
            if r["domain"] == dom
        )
        assert alloc_t - tok < tot <= alloc_t + tok
    again = {r["doc_id"]: r["n_copies"] for r in
             mix_materialize(df.repartition(5), alloc).collect()}
    assert again == got
