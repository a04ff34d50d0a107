"""Hand-computed and property tests for the r10 third-wave rows:
shard_balance_tokens (snake beats naive on imbalance), curriculum_order
(phase difficulty monotonicity + permutation pinning), dq_dp_counts
(Laplace inverse-CDF replica + unbiasedness of the release arithmetic),
join_interval_overlap (binned equi-join == brute-force overlap join),
text_bpe_roundtrip (ids+vocab reconstruct every word),
dedup_cdc_chunks (boundary-shift invariance + known-cut hand case).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from logprep_spark.plans import catalog


def _rows(df, key):
    return sorted([r.asDict() for r in df.collect()], key=lambda r: r[key])


# ---------------------------------------------------------------- shard


def test_shard_snake_beats_naive_and_covers_all_docs(spark, sf_dir):
    out = _rows(
        catalog.queries()["shard_balance_tokens"](spark, sf_dir), "shard"
    )
    assert [r["shard"] for r in out] == list(range(8))
    # every doc lands exactly once in each assignment
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in out) == n_docs
    snake = out[0]["imbalance_snake_permille"]
    naive = out[0]["imbalance_naive_permille"]
    # the whole point of size-aware assignment
    assert snake <= naive
    # snake imbalance should be tiny: each pass deals one doc per shard
    assert snake < 100, f"snake imbalance {snake} permille is not balanced"


def test_shard_snake_hand_case(spark):
    # 16 docs, token counts 16..1: snake pass 0 deals 16..9 to shards
    # 0..7, pass 1 deals 8..1 to shards 7..0 -> every shard sums to 17.
    df = spark.createDataFrame(
        [(i, "x " * (16 - i)) for i in range(16)],
        "doc_id long, text string",
    ).withColumn("n_chars", F.length("text"))
    # feed through the same plan body via a temp sf_dir-like frame:
    # reuse the catalog function's logic by monkey-writing parquet
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.select(
            "doc_id",
            "text",
            F.lit("en").alias("lang"),
            F.lit("src0").alias("source"),
            "n_chars",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = _rows(
            catalog.queries()["shard_balance_tokens"](spark, d), "shard"
        )
    assert all(r["tokens_snake"] == 17 for r in out)
    assert out[0]["imbalance_snake_permille"] == 0


# ----------------------------------------------------------- curriculum


def test_curriculum_phases_monotonic_and_pinned(spark, sf_dir):
    out = _rows(catalog.queries()["curriculum_order"](spark, sf_dir), "phase")
    assert [r["phase"] for r in out] == [1, 2, 3, 4]
    means = [r["mean_difficulty_milli"] for r in out]
    assert means == sorted(means), f"phase means not monotonic: {means}"
    # phases partition on difficulty: phase k's max <= phase k+1's min
    for a, b in zip(out, out[1:]):
        assert a["max_difficulty_milli"] <= b["min_difficulty_milli"]
    # deterministic: a second run pins the identical permutation
    again = _rows(
        catalog.queries()["curriculum_order"](spark, sf_dir), "phase"
    )
    assert [r["order_checksum"] for r in out] == [
        r["order_checksum"] for r in again
    ]


# ------------------------------------------------------------------- dp


def test_dp_counts_replicates_inverse_cdf(spark, sf_dir):
    import hashlib

    out = _rows(catalog.queries()["dq_dp_counts"](spark, sf_dir), "event_type")
    for r in out:
        v = int(
            hashlib.md5(f"dp:{r['event_type']}".encode()).hexdigest()[:8], 16
        )
        u = (v + 0.5) / 2**32
        lap = -2.0 * math.copysign(1.0, u - 0.5) * math.log(
            1.0 - 2.0 * abs(u - 0.5)
        )
        assert r["noise_deterministic_milli"] == round(1000 * lap)
        assert (
            r["noisy_count_milli"] == 1000 * r["true_n"] + r["noise_deterministic_milli"]
        )
        assert r["epsilon_milli"] == 500


def test_dp_laplace_mechanism_shape():
    # the release arithmetic is the textbook Laplace inverse CDF:
    # median 0, symmetric, P(|noise| > t) = exp(-t/b)
    import hashlib

    b = 2.0
    noises = []
    for i in range(20000):
        v = int(hashlib.md5(f"dp:{i}".encode()).hexdigest()[:8], 16)
        u = (v + 0.5) / 2**32
        noises.append(
            -b * math.copysign(1.0, u - 0.5) * math.log(1 - 2 * abs(u - 0.5))
        )
    mean = sum(noises) / len(noises)
    assert abs(mean) < 0.1  # symmetric around 0
    frac_gt = sum(1 for n in noises if abs(n) > b) / len(noises)
    assert abs(frac_gt - math.exp(-1)) < 0.02  # CDF shape


# ------------------------------------------------------- interval overlap


def test_interval_overlap_matches_bruteforce(spark, sf_dir):
    out = catalog.queries()["join_interval_overlap"](spark, sf_dir)
    got = {r["month"]: r.asDict() for r in out.collect()}
    # brute force in plain python on the same parquet
    import duckdb

    con = duckdb.connect()
    bf = con.execute(
        f"""
        WITH transit AS (
            SELECT o.o_custkey AS ck, l.l_orderkey AS lk,
                   l.l_linenumber AS ln,
                   (l.l_shipdate::DATE - DATE '1970-01-01') AS s,
                   (l.l_shipdate::DATE - DATE '1970-01-01')
                       + 1 + (l.l_partkey % 21) AS e
            FROM '{sf_dir}/lineitem.parquet' l
            JOIN '{sf_dir}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        ), urgent AS (
            SELECT o_custkey AS ck, o_orderkey AS ok,
                   (o_orderdate::DATE - DATE '1970-01-01') AS s,
                   (o_orderdate::DATE - DATE '1970-01-01') + 30 AS e
            FROM '{sf_dir}/orders.parquet'
            WHERE o_orderpriority = '1-URGENT'
        )
        SELECT strftime(DATE '1970-01-01'
                   + greatest(t.s, u.s) * INTERVAL 1 DAY, '%Y-%m') AS m,
               count(*) AS n
        FROM transit t JOIN urgent u
          ON t.ck = u.ck AND t.lk != u.ok AND t.s <= u.e AND u.s <= t.e
        GROUP BY m
        """
    ).fetchall()
    assert {m: n for m, n in bf} == {
        m: r["n_pairs"] for m, r in got.items()
    }


def test_interval_overlap_ownership_bin_no_duplicates(spark):
    # a pair spanning several bins must be emitted exactly once:
    # craft intervals 100 days long (4 shared bins at W=32)
    from pyspark.sql import Row

    a = spark.createDataFrame(
        [Row(custkey=1, l_orderkey=10, l_linenumber=1, s_a=0, e_a=100)]
    )
    b = spark.createDataFrame(
        [Row(custkey=1, o_orderkey=20, s_b=5, e_b=105)]
    )
    W = 32
    abin = a.withColumn(
        "bin", F.explode(F.sequence(F.expr(f"s_a div {W}"), F.expr(f"e_a div {W}")))
    )
    bbin = b.withColumn(
        "bin", F.explode(F.sequence(F.expr(f"s_b div {W}"), F.expr(f"e_b div {W}")))
    )
    pairs = abin.join(bbin, ["custkey", "bin"]).filter(
        (F.col("s_a") <= F.col("e_b"))
        & (F.col("s_b") <= F.col("e_a"))
        & (F.col("bin") == F.expr(f"greatest(s_a, s_b) div {W}"))
    )
    assert pairs.count() == 1


# ---------------------------------------------------------- bpe roundtrip


def test_bpe_roundtrip_is_lossless(spark, sf_dir):
    out = catalog.queries()["text_bpe_roundtrip"](spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r["n_exact_roundtrip"] == r["n_vocab_words"], (
            f"group {r['grp']}: {r['n_vocab_words'] - r['n_exact_roundtrip']}"
            " words failed to reconstruct from (ids, vocab)"
        )
        assert r["n_ids"] >= r["n_vocab_words"]  # >=1 token per word


# ------------------------------------------------------------ cdc chunks


def test_cdc_known_cut_position(spark):
    # the prototype string has exactly one cut, at position 34 — both
    # the weights and the mod-64 rule are pinned by this hand case
    t = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the night forest"
    )
    B, M = 131, 1 << 25
    W = [pow(B, 15 - j, M) for j in range(16)]
    cuts = [
        c
        for c in range(16, len(t))
        if sum(ord(t[c - 16 + j]) * W[j] for j in range(16)) % 64 == 0
    ]
    assert cuts == [34]
    cuts_e, _ = catalog._cdc_spark_cols()
    got = (
        spark.createDataFrame([(t,)], "t string")
        .withColumn(
            "_codes",
            F.expr(
                "transform(sequence(1, length(t)),"
                " i -> CAST(ascii(substring(t, i, 1)) AS BIGINT))"
            ),
        )
        .select(F.expr(cuts_e).alias("cuts"))
        .head()["cuts"]
    )
    assert got == [34]


def test_cdc_shift_invariance_witness(spark, sf_dir):
    out = catalog.queries()["dedup_cdc_chunks"](spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r["shift_matched"] == r["shift_expected"], (
            f"source {r['source']}: a 4-char prefix broke "
            f"{r['shift_expected'] - r['shift_matched']} chunk boundaries"
        )
        assert r["n_distinct_chunks"] <= r["n_chunks"]


def test_cdc_finds_planted_duplication(spark):
    # two docs sharing a long middle section dedupe at chunk level
    import os
    import tempfile

    shared = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi "
        "psi omega one two three four five six seven eight nine ten "
        "eleven twelve thirteen fourteen fifteen sixteen seventeen "
    )
    docs = [
        (1, "unique head one " + shared + " unique tail one"),
        (2, "a different beginning " + shared + " and another ending"),
        (3, "entirely unrelated text with no shared content at all "
            "just filler words repeated filler words repeated again"),
    ]
    df = [
        (i, t, "en", "src0", len(t)) for i, t in docs
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            df, "doc_id long, text string, lang string, source string,"
            " n_chars long"
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = catalog.queries()["dedup_cdc_chunks"](spark, d).collect()
    r = out[0].asDict()
    assert r["n_dup_occurrences"] >= 1, (
        "chunk-level dedup failed to find the planted shared section"
    )


def test_cdc_chunk_hashes_matches_expression_form(spark):
    """r14: the vectorized mapInPandas chunker (cdc_chunk_hashes) must
    emit bit-identical (variant, idx0, md5) rows to the Catalyst
    expression form it replaced — covering the no-cut short text, the
    exactly-window-sized text, and the hand-case string."""
    from logprep_spark.functions import dedup as dd

    rows = [
        (1, "s0", "the quick brown fox jumps over the lazy dog and "
                   "then runs far away into the night forest"),
        (4, "s1", "0123456789abcdef0123456789abcdef0123456789"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, t string")
    got = sorted(
        (r["doc_id"], r["variant"], r["idx0"], r["h"])
        for r in dd.cdc_chunk_hashes(
            df, catalog._CDC_W, twin_prefix="zq9 "
        ).collect()
    )

    # short strings (L <= window): the expression form cannot run them
    # (sequence(16, L-1) descends below index 1), so pin the function's
    # convention directly — one chunk, the whole string
    import hashlib

    short = spark.createDataFrame(
        [(2, "s0", "abcdefghijklmnop"), (3, "s1", "tiny")],
        "doc_id long, source string, t string",
    )
    srows = sorted(
        (r["doc_id"], r["variant"], r["idx0"], r["h"])
        for r in dd.cdc_chunk_hashes(short, catalog._CDC_W).collect()
    )
    assert srows == [
        (2, 0, 0, hashlib.md5(b"abcdefghijklmnop").hexdigest()),
        (3, 0, 0, hashlib.md5(b"tiny").hexdigest()),
    ]
    cuts_e, chunks_e = catalog._cdc_spark_cols()

    def expr_form(frame):
        return (
            frame.withColumn(
                "_codes",
                F.expr(
                    "transform(split(t, ''), ch -> CAST(ascii(ch) AS BIGINT))"
                ),
            )
            .withColumn("_cuts", F.expr(cuts_e))
            .withColumn(
                "_starts",
                F.expr("concat(array(1), transform(_cuts, c -> c + 1))"),
            )
            .withColumn("_ends", F.expr("concat(_cuts, array(length(t)))"))
            .select(
                "doc_id",
                F.posexplode(F.expr(chunks_e)).alias("idx0", "chunk"),
            )
        )

    want = []
    for variant, frame in (
        (0, df),
        (1, df.withColumn("t", F.concat(F.lit("zq9 "), F.col("t")))),
    ):
        for r in expr_form(frame).select(
            "doc_id", "idx0", F.md5("chunk").alias("h")
        ).collect():
            want.append((r["doc_id"], variant, r["idx0"], r["h"]))
    assert got == sorted(want)
