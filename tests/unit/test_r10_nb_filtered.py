"""Property tests: ml_naive_bayes (planted separable corpus reaches
1000 milli; sparse-identity replica), ann_filtered_recall (post ≤ pre,
recall collapse on the real corpus).
"""

from __future__ import annotations

import os
import tempfile

from logprep_spark.plans import catalog


def test_naive_bayes_learns_planted_classes(spark):
    # three classes with disjoint topical vocabularies; enough docs
    # that the 80/20 hash split leaves test docs in each class
    words = {
        "sport": "goal match team score player league win coach",
        "tech": "server code deploy cluster compile kernel cache",
        "food": "recipe bake flour oven sauce spice roast butter",
    }
    rows = []
    did = 0
    for label, vocab in words.items():
        toks = vocab.split()
        for i in range(30):
            did += 1
            text = " ".join(toks[(i + j) % len(toks)] for j in range(12))
            rows.append((did, text, "en", label, len(text)))
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).write.parquet(os.path.join(tmp, "documents.parquet"))
        out = catalog.queries()["ml_naive_bayes"](spark, tmp).collect()
    assert len(out) == 3
    for r in out:
        assert r["n_test"] > 0, "hash split left a class without test docs"
        assert r["accuracy_milli"] == 1000, r


def test_naive_bayes_counts_consistent(spark, sf_dir):
    out = catalog.queries()["ml_naive_bayes"](spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert 0 <= r["n_correct"] <= r["n_test"]
        assert r["accuracy_milli"] == 1000 * r["n_correct"] // r["n_test"]


def test_filtered_recall_post_collapses(spark, sf_dir):
    out = catalog.queries()["ann_filtered_recall"](spark, sf_dir).collect()
    assert len(out) == 5
    for r in out:
        assert r["pre_recall_milli"] == 1000
        assert 0 <= r["post_recall_milli"] <= 1000
        assert r["n_post_filter_hits"] <= r["n_gold"]
    # ~10% label selectivity: an unfiltered top-10 holds ≈1 qualifying
    # row, so post-filter recall collapses well below pre-filter
    mean_post = sum(r["post_recall_milli"] for r in out) / len(out)
    assert mean_post < 700, mean_post
