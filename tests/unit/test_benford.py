"""Benford screen: digit extraction is integer-exact, a genuinely
Benford-distributed sample passes, a uniform one fails."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _screen(spark, values):
    from logprep_spark.plans.catalog import dq_benford  # noqa: F401 — row uses lineitem
    # exercise the same expression shape directly
    df = spark.createDataFrame([(v,) for v in values], ["l_extendedprice"])
    digits = df.filter(F.col("l_extendedprice") > 0).select(
        F.substring(
            F.round(F.col("l_extendedprice") * 100).cast("long").cast("string"),
            1, 1,
        ).cast("long").alias("digit")
    )
    return {
        r["digit"]: r["n"]
        for r in digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_digit_extraction_integer_safe(spark):
    # powers of ten and near-boundary cents: no log10 ulp flips
    got = _screen(spark, [10.00, 9.99, 100.0, 0.01, 0.09, 19.95, 0.10, 29.50])
    assert got == {1: 5, 9: 2, 2: 1}


def test_benford_vs_uniform(spark):
    # log-uniform sample follows Benford; uniform does not
    import itertools

    logu = [10 ** (i / 200 % 3) for i in range(600)]   # log-spaced
    freq = _screen(spark, logu)
    tot = sum(freq.values())
    for d in range(1, 10):
        expect = math.log10(1 + 1 / d)
        assert abs(freq.get(d, 0) / tot - expect) < 0.02, d

    uni = [1.0 + 8.0 * i / 600 for i in range(600)]    # uniform 1..9
    ufreq = _screen(spark, uni)
    utot = sum(ufreq.values())
    # digit 1 massively under Benford's 30.1% under uniformity
    assert ufreq[1] / utot < 0.2


# --- Flesch readability -------------------------------------------------


def test_readability_hand_values(spark):
    """Hand-counted: 'The cat sat. It ran.' = 5 whitespace tokens
    ('sat.' is one token), 2 sentences, 5 vowel runs -> wps=2500,
    spw=1000."""
    from logprep_spark.functions.text import readability_scores

    df = spark.createDataFrame(
        [
            (1, "The cat sat. It ran."),
            (2, "Antidisestablishmentarianism!"),
            (3, ""),  # degenerate: zero words
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r.asDict() for r in readability_scores(df).collect()}
    r1 = got[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (5, 2, 5)
    assert r1["flesch_milli"] == 206835 - (1015 * 2500) // 1000 - (84600 * 1000) // 1000

    # one long word: a(1) i(1) i(1) e(1) a(1) i(1) i(1) a(1) i(1) a(1) i(1)...
    r2 = got[2]
    assert r2["n_words"] == 1 and r2["n_sentences"] == 1
    assert r2["n_syllables"] == len(
        __import__("re").findall(r"[aeiouy]+", "antidisestablishmentarianism")
    )

    r3 = got[3]
    assert r3["n_words"] == 0 and r3["flesch_milli"] == 206835 - 0 - 0


# --- Gini concentration -------------------------------------------------


def test_gini_known_distributions(spark):
    """Hand-checked: perfect equality = 0; one key owning everything
    approaches (n-1)/n; a hand-computed mixed case matches the exact
    integer formula; repartition-invariant."""
    from logprep_spark.plans.analytics import gini_concentration

    eq = spark.createDataFrame([(i, 100) for i in range(10)], ["user_id", "x"])
    (r,) = gini_concentration(eq, "x", "user_id").collect()
    assert r["gini_milli"] == 0
    assert r["top_decile_share_milli"] == 100  # 1 of 10 keys = 1/10 of total

    mono = spark.createDataFrame(
        [(i, 1) for i in range(9)] + [(9, 991)], ["user_id", "x"]
    )
    (m,) = gini_concentration(mono, "x", "user_id").collect()
    # exact: n=10, tot=1000, sorted xs -> sum i*x = 45*1 - ... compute
    xs = sorted([1] * 9 + [991])
    ix = sum((i + 1) * x for i, x in enumerate(xs))
    want = (1000 * (2 * ix - 11 * 1000)) // (10 * 1000)
    assert m["gini_milli"] == want and want > 850
    assert m["top_decile_share_milli"] == 991

    (m2,) = gini_concentration(
        mono.repartition(4), "x", "user_id"
    ).collect()
    assert m2 == m


def test_gini_small_n_top_decile_is_top_key(spark):
    """With n < 10 keys, the "top decile" collapses to the single top
    key (greatest(n div 10, 1)) — never a NULL from an empty slice."""
    from logprep_spark.plans.analytics import gini_concentration

    small = spark.createDataFrame(
        [(0, 100), (1, 300), (2, 600)], ["user_id", "x"]
    )
    (r,) = gini_concentration(small, "x", "user_id").collect()
    assert r["n_keys"] == 3
    assert r["top_decile_share_milli"] == 600  # top key = 600/1000


# --- hashed-feature normal equations ------------------------------------


def test_gram_stats_solve_matches_dense_lstsq(spark):
    """The distributed sufficient statistics reconstruct the SAME
    least-squares solution as dense numpy lstsq on the raw design
    matrix — the whole point of the one-pass Gram accumulation —
    and the statistics themselves equal a Python replica exactly."""
    import hashlib

    import numpy as np

    from logprep_spark.functions.text import hashed_gram_stats

    D = 4
    docs = [
        (i, f"alpha beta gamma {'delta ' * (i % 3)}word{i % 5}", 50 + 7 * i)
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text", "n_chars"])
    rows = hashed_gram_stats(df, "text", "n_chars", d=D).collect()
    got = {(r["i"], r["j"]): r["v"] for r in rows}

    def h(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16)

    X, y = [], []
    for _, text, n in docs:
        toks = [t for t in text.split() if t]
        x = [sum(1 for t in toks if h(t) % D == b) for b in range(D)]
        X.append(x)
        y.append(n)
    X, yv = np.array(X, dtype=float), np.array(y, dtype=float)

    # exact statistics
    G = (X.T @ X).astype(int)
    b = (X.T @ yv).astype(int)
    for i in range(D):
        assert got[(i, -1)] == b[i]
        for j in range(i, D):
            assert got[(i, j)] == G[i][j], (i, j)
    assert got[(-1, -1)] == len(docs)
    assert got[(-1, -2)] == sum(y)

    # the solve: ridge with tiny lambda from the frame == dense lstsq
    lam = 1e-9
    Gf = np.zeros((D, D))
    for i in range(D):
        for j in range(i, D):
            Gf[i][j] = Gf[j][i] = got[(i, j)]
    w_frame = np.linalg.solve(Gf + lam * np.eye(D),
                              np.array([got[(i, -1)] for i in range(D)]))
    w_dense, *_ = np.linalg.lstsq(X, yv, rcond=None)
    assert np.allclose(w_frame, w_dense, atol=1e-4)


def test_calibration_bins_structure(spark, sf_dir):
    """The reliability frame's invariants on real data: bins within
    0..9, midpoints = 100*bin+50, gap consistent with obs vs mid,
    and Σn_docs equals the corpus size."""
    from logprep_spark.plans import catalog

    rows = catalog.queries()["model_calibration_bins"](
        spark, sf_dir
    ).collect()
    assert rows and all(0 <= r["bin"] <= 9 for r in rows)
    total = 0
    for r in rows:
        total += r["n_docs"]
        assert r["pred_mid_milli"] == 100 * r["bin"] + 50
        assert r["obs_rate_milli"] == 1000 * r["n_pos"] // r["n_docs"]
        assert r["gap_milli"] == abs(
            r["pred_mid_milli"] - r["obs_rate_milli"]
        )
    n_docs = catalog.tables(spark, sf_dir)["documents"].count()
    assert total == n_docs


# --- isotonic (PAVA) ----------------------------------------------------


def test_isotonic_pools_textbook(spark):
    """Classic PAVA fixtures: already-monotone input is untouched; a
    strictly decreasing sequence collapses to ONE pool at the global
    rate; the standard violation-in-the-middle case pools exactly
    the violating pair; output rates are always non-decreasing."""
    from logprep_spark.plans.analytics import isotonic_pools

    def run(triples, passes=6):
        df = spark.createDataFrame(triples, ["bin", "s", "n"])
        rows = isotonic_pools(df, passes=passes).collect()
        return [(r["n_docs"], r["n_pos"], r["iso_rate_milli"]) for r in rows], rows

    mono, rows = run([(1, 0, 10), (2, 5, 10), (3, 9, 10)])
    assert mono == [(10, 0, 0), (10, 5, 500), (10, 9, 900)]
    assert all(r["converged"] for r in rows)

    dec, _ = run([(1, 9, 10), (2, 5, 10), (3, 1, 10)])
    assert dec == [(30, 15, 500)]

    mid, _ = run([(1, 1, 10), (2, 8, 10), (3, 6, 10), (4, 9, 10)])
    # 0.8 > 0.6 pools to 14/20 = 0.7; result 0.1, 0.7, 0.9 monotone
    assert mid == [(10, 1, 100), (20, 14, 700), (10, 9, 900)]
    rates = [r for _, _, r in mid]
    assert rates == sorted(rates)

    # a case needing >1 pass: merge creates a NEW violation leftward
    multi, rows2 = run([(1, 5, 10), (2, 1, 10), (3, 2, 10), (4, 2, 10)])
    # pass1: 5/10 > 1/10 -> pool (6,20)=0.3 > 0.2 etc; final single pool
    assert multi == [(40, 10, 250)]
    assert all(r["converged"] for r in rows2)


def test_k_anonymity_flags_small_and_homogeneous_classes(spark):
    """Hand-built privacy audit: a singleton class (one person with a
    unique QI pair = re-identified) fails k; a large class whose
    members all share one sensitive band fails l even though k
    passes — the leak k-anonymity alone cannot see."""
    rows = (
        # class (1, 'A'): 12 members, 6 distinct bands -> both pass
        [(i, f"c{i}", 1, float(1000 * (i % 6)), "A") for i in range(12)]
        # class (2, 'B'): singleton -> k fails
        + [(100, "c100", 2, 500.0, "B")]
        # class (3, 'C'): 15 members, ONE band -> k ok, l fails
        + [(200 + i, f"d{i}", 3, 1500.0, "C") for i in range(15)]
    )
    df = spark.createDataFrame(
        rows, ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    )
    # the same plan the catalog entry builds, on the fixture
    from pyspark.sql import functions as F

    banded = df.select(
        "c_nationkey", "c_mktsegment",
        F.expr("CAST(round(c_acctbal * 100) AS BIGINT) div 100000").alias("_band"),
    )
    out = banded.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("class_size"),
        F.count_distinct("_band").alias("l_diversity"),
    ).select(
        "c_nationkey", "c_mktsegment", "class_size", "l_diversity",
        (F.col("class_size") >= 10).alias("k_ok"),
        (F.col("l_diversity") >= 5).alias("l_ok"),
    )
    got = {r["c_nationkey"]: r for r in out.collect()}
    assert got[1]["k_ok"] and got[1]["l_ok"]
    assert not got[2]["k_ok"]            # the singleton
    assert got[3]["k_ok"] and not got[3]["l_ok"]  # homogeneous leak
