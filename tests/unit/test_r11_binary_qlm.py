"""r11 wave: binary quantization search (hand-vector bits + Hamming
ranking + recall sanity) and Dirichlet query-likelihood retrieval
(exact Python replica, length normalization, OOV smoothing)."""

from __future__ import annotations

import math
import os
import tempfile

from pyspark.sql import functions as F

from logprep_spark.functions import similarity as sim
from logprep_spark.functions import text as tx
from logprep_spark.plans import catalog


def test_quantize_binary_hand_bits(spark):
    # dims means: d1 = 0.5, d2 = 0.0, d3 = -0.5 -> bits strictly
    # above the mean
    df = spark.createDataFrame(
        [
            (1, [1.0, 1.0, 0.0]),
            (2, [0.0, -1.0, -1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: (list(r["bits"]), r["n_set"])
           for r in sim.quantize_binary(df).collect()}
    assert got[1] == ([1, 1, 1], 3)
    assert got[2] == ([0, 0, 0], 0)


def test_binary_topk_hand_ranking(spark):
    # corpus bits (vs per-dim means): a cluster near q and one far
    df = spark.createDataFrame(
        [
            (0, [1.0, 1.0, -1.0, -1.0]),   # query
            (1, [0.9, 0.9, -0.9, -0.9]),   # same orthant -> hamming 0
            (2, [1.0, -1.0, -1.0, 1.0]),   # differs in dims 2,4
            (3, [-1.0, -1.0, 1.0, 1.0]),   # opposite -> hamming 4
        ],
        "vec_id long, embedding array<double>",
    )
    qs = df.filter(F.col("vec_id") == 0)
    got = [
        (r["nbr_id"], r["hamming"])
        for r in sim.binary_topk(df, qs, k=3).orderBy("rank").collect()
    ]
    assert got == [(1, 0), (2, 2), (3, 4)]


def test_ann_binary_recall_gated_shape(spark, sf_dir):
    rows = catalog.queries()["ann_binary_recall"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["n_hits"] <= 3
        assert r["recall_milli"] == 1000 * r["n_hits"] // 3
        # synthetic embeddings are roughly centered
        assert 300 <= r["bit_balance_milli"] <= 700


def _qlm_score(toks, terms, cf, total_len, mu=2000.0):
    dl = float(len(toks))
    s = 0.0
    for t in terms:
        tf = float(toks.count(t))
        p_c = (cf[t] + 1.0) / (total_len + 1.0)
        s += math.log((tf + mu * p_c) / (dl + mu))
    return round(s * 1_000_000)


def test_qlm_search_replica_and_length_norm(spark):
    docs = {
        1: "the spark engine runs a shuffle and a join every day",
        2: "spark spark spark join hash hash",
        # same tf profile as doc 2 but padded 4x longer
        3: "spark spark spark join hash hash " + "filler words here "* 9,
        4: "nothing relevant at all in this one",
    }
    terms = ["spark", "shuffle", "join", "hash"]
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["score_micro"], r["rank"])
        for r in tx.qlm_search(df, terms, k=10).collect()
    }
    # exact replica
    toked = {i: t.lower().split() for i, t in docs.items()}
    total_len = sum(len(v) for v in toked.values())
    cf = {t: sum(v.count(t) for v in toked.values()) for t in terms}
    for i in docs:
        assert got[i][0] == _qlm_score(toked[i], terms, cf, total_len), i
    # term-rich short doc beats everything; its padded twin scores
    # lower (Dirichlet length normalization); the short irrelevant
    # doc beats the long padded one on pure smoothing mass — the LM
    # length prior, correct if initially surprising — but never the
    # similar-length doc with real term hits
    assert got[2][1] == 1
    assert got[2][0] > got[3][0]
    assert got[1][0] > got[4][0]


def test_qlm_oov_term_smoothed(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], "doc_id long, text string"
    )
    # 'zzz' never occurs: Laplace floor keeps ln finite, both docs
    # still ranked
    rows = tx.qlm_search(df, ["a", "zzz"], k=10).collect()
    assert len(rows) == 2 and all(r["score_micro"] < 0 for r in rows)


def test_logreg_learns_on_planted_separable_corpus(spark):
    """The ml_logreg_gd honesty witness (the ml_naive_bayes
    discipline): the corpus row reports ~prior accuracy because the
    synthetic lang labels carry no signal; HERE the same trainer on a
    genuinely separable corpus reaches perfect per-class accuracy —
    proof the gradient loop learns when signal exists."""
    import tempfile as _tf

    en = "the cat and the dog of the house went to the market in town"
    de = "der hund und die katze ist nicht ein tier mit über auf von"
    rows = []
    for i in range(100):
        rows.append((2 * i, en + f" extra{i}", "en", "web", 60))
        rows.append((2 * i + 1, de + f" wort{i}", "de", "web", 60))
    with _tf.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).write.parquet(os.path.join(tmp, "documents.parquet"))
        got = {
            r["y_true"]: r.asDict()
            for r in catalog.queries()["ml_logreg_gd"](spark, tmp).collect()
        }
    assert got[0]["accuracy_milli"] == 1000, got
    assert got[1]["accuracy_milli"] == 1000, got
    assert got[0]["weights_l1_micro"] > 0
    assert got[0]["n_train"] + got[0]["n_test"] + got[1]["n_test"] == 200
