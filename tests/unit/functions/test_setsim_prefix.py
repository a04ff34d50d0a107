"""Prefix-filter set-similarity join: completeness vs brute force,
threshold edge behavior, repartition invariance.

The catalog row's oracle IS the O(n^2) brute force, so these tests
pin the same guarantee on controlled inputs where the expected pair
set is known by hand: the prefix filter must find EVERY pair with
Jaccard >= tau (pigeonhole completeness), never a sub-threshold one.
"""

from __future__ import annotations

import itertools

from logprep_spark.functions.dedup import setsim_prefix_join


DOCS = [
    # two heavy near-dups (one word swapped out of 12)
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"),
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa lam nu"),
    # an exact duplicate of doc 0
    (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"),
    # unrelated docs sharing vocabulary but not shingles
    (3, "mu lam kappa iota theta eta zeta epsilon delta gamma beta alpha"),
    (4, "one two three four five six seven eight nine ten eleven twelve"),
    (5, "one two three four five six SEVEN eight nine ten eleven twelve"),
]


def _shingles(text: str, k: int = 3) -> set:
    w = text.split()
    if len(w) <= k:
        return {" ".join(w)}
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}


def _brute(tau_milli: int) -> list:
    out = []
    for (ia, ta), (ib, tb) in itertools.combinations(DOCS, 2):
        sa, sb = _shingles(ta), _shingles(tb)
        i, u = len(sa & sb), len(sa | sb)
        if 1000 * i >= tau_milli * u:
            out.append((ia, ib, i, u, 1000 * i // u))
    return sorted(out)


def _run(spark, tau_milli: int, partitions: int = 1) -> list:
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    if partitions > 1:
        df = df.repartition(partitions)
    rows = setsim_prefix_join(df, tau_milli=tau_milli).collect()
    return sorted(
        (r.id_a, r.id_b, r.n_inter, r.n_union, r.jaccard_milli) for r in rows
    )


def test_matches_brute_force(spark):
    assert _run(spark, 500) == _brute(500)
    # the hand-known pair set: 0-1 and 0-2 (dup), 1-2, 4-5
    got = {(a, b) for a, b, *_ in _run(spark, 500)}
    assert (0, 2) in got and (0, 1) in got and (4, 5) in got


def test_exact_duplicate_scores_1000(spark):
    rows = {(a, b): jm for a, b, _, _, jm in _run(spark, 500)}
    assert rows[(0, 2)] == 1000


def test_tau_is_inclusive_floor(spark):
    # raising tau above a pair's jaccard drops it; at the exact
    # threshold (integer-milli comparison) it is kept
    for tau in (200, 700, 900, 1000):
        assert _run(spark, tau) == _brute(tau)


def test_repartition_invariance(spark):
    assert _run(spark, 500, partitions=5) == _run(spark, 500)


# --- asymmetric containment join --------------------------------------


CONTAIN_DOCS = DOCS + [
    # doc 6 contains doc 4 verbatim inside a much longer text:
    # containment(4 in 6) = 1.0 but Jaccard is far below 0.5
    (
        6,
        "prefix words before the quote one two three four five six "
        "seven eight nine ten eleven twelve and then a long tail of "
        "extra unrelated filler tokens stretching the set much "
        "further out",
    ),
]


def _brute_containment(tau_milli: int) -> list:
    out = []
    for ia, ta in CONTAIN_DOCS:
        for ib, tb in CONTAIN_DOCS:
            if ia == ib:
                continue
            sa, sb = _shingles(ta), _shingles(tb)
            i = len(sa & sb)
            if 1000 * i >= tau_milli * len(sa):
                out.append((ia, ib, i, len(sa), 1000 * i // len(sa)))
    return sorted(out)


def _run_containment(spark, tau_milli: int, partitions: int = 1) -> list:
    from logprep_spark.functions.dedup import containment_prefix_join

    df = spark.createDataFrame(CONTAIN_DOCS, ["doc_id", "text"])
    if partitions > 1:
        df = df.repartition(partitions)
    rows = containment_prefix_join(df, tau_milli=tau_milli).collect()
    return sorted(
        (r.id_a, r.id_b, r.n_inter, r.n_a, r.containment_milli)
        for r in rows
    )


def test_containment_matches_brute_force(spark):
    for tau in (500, 800, 1000):
        assert _run_containment(spark, tau) == _brute_containment(tau)


def test_containment_sees_what_jaccard_cannot(spark):
    """Doc 4 inside doc 6: containment(4->6) = 1000 (every shingle of
    4 appears in 6) while their Jaccard is under the 0.5 setsim gate
    — and the pair is ASYMMETRIC (6->4 fails the 0.8 threshold)."""
    got = {(a, b): cm for a, b, _, _, cm in _run_containment(spark, 800)}
    assert got[(4, 6)] == 1000
    assert (6, 4) not in got
    setsim = {(a, b) for a, b, *_ in _run(spark, 500)}
    assert (4, 6) not in setsim and (6, 4) not in setsim


def test_containment_repartition_invariance(spark):
    assert _run_containment(spark, 800, partitions=5) == _run_containment(
        spark, 800
    )


# --- incremental (hash-order prefix) -----------------------------------


def _brute_incremental(batch_ids, tau_milli):
    out = []
    docs = dict(DOCS)
    for ib in batch_ids:
        for ih, th in DOCS:
            if ih in batch_ids:
                continue
            sa, sb = _shingles(docs[ib]), _shingles(th)
            i, u = len(sa & sb), len(sa | sb)
            if 1000 * i >= tau_milli * u:
                out.append((ib, ih, i, u, 1000 * i // u))
    return sorted(out)


def test_incremental_matches_brute_force(spark):
    """Batch {0, 4} against history {1, 2, 3, 5}: the hash-order
    prefix index finds every qualifying cross pair at several taus
    — completeness does not depend on the rarity order."""
    from logprep_spark.functions.dedup import setsim_incremental

    batch_ids = {0, 4}
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    batch = df.filter(df.doc_id.isin(*batch_ids))
    hist = df.filter(~df.doc_id.isin(*batch_ids))
    for tau in (500, 700, 1000):
        rows = setsim_incremental(batch, hist, tau_milli=tau).collect()
        got = sorted(
            (r.id_batch, r.id_hist, r.n_inter, r.n_union, r.jaccard_milli)
            for r in rows
        )
        assert got == _brute_incremental(batch_ids, tau), tau


def test_incremental_stored_index_stability(spark):
    """The hash order is corpus-independent: history's prefix rows
    are IDENTICAL whether computed against a 4-doc or a 400-doc
    corpus (rarity order would reshuffle them) — the property that
    makes the stored index write-once."""
    from logprep_spark.functions.dedup import setsim_incremental

    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    small_hist = df.filter(df.doc_id.isin(1, 2))
    big_hist = df.filter(df.doc_id != 0)
    batch = df.filter(df.doc_id == 0)
    small = {
        (r.id_batch, r.id_hist)
        for r in setsim_incremental(batch, small_hist, tau_milli=700).collect()
    }
    big = {
        (r.id_batch, r.id_hist)
        for r in setsim_incremental(batch, big_hist, tau_milli=700).collect()
    }
    # pairs found against the small history are a subset found
    # against the big one (nothing lost as the corpus grows)
    assert small <= big
    assert (0, 2) in small  # the exact duplicate is always caught
