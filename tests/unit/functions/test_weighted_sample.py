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
