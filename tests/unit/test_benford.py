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
