"""pipeline_pretrain_incremental: planted base/delta corpus proving
the history stores actually kill (exact + near), the merge==recompute
witness, and X30 factory parity for the store-probing steps."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from logprep_spark.functions import dedup as dd
from logprep_spark.functions import sketch as sk
from logprep_spark.plans import catalog

_VOCAB = [
    "data", "model", "train", "batch", "corpus", "token", "learning",
    "scale", "shard", "filter", "sample", "metric", "signal", "window",
    "vector", "weight", "layer", "epoch", "merge", "store", "probe",
    "clean", "split", "audit", "graph", "table", "query", "plan",
]


def _mk_text(seed: int, n: int = 55) -> str:
    # deterministic pseudo-random word sequence; 'the' sprinkled in so
    # every doc passes the Gopher stop-word rule (min_stop_hits=1)
    words = []
    x = seed * 2654435761 % (1 << 32)
    for k in range(n):
        x = (x * 1103515245 + 12345) % (1 << 31)
        words.append("the" if k % 11 == 0 else _VOCAB[x % len(_VOCAB)])
    return " ".join(words)


def _planted_docs(spark, tmp):
    """16 base ids (%5!=0, all <= 19), delta ids 21,22,23,24; bench
    id 25 (%5==0). d21 exact-dups b3, d22 near-dups b4 (one word
    changed), d24 shares a 13-gram window with the bench doc, d23 is
    clean. cut: n=20 corpus docs -> rank_cut = (8*20+9)//10 = 16 ->
    the 16th smallest id = 19 -> base = ids <= 19, delta = 21..24."""
    base_ids = [1, 2, 3, 4, 6, 7, 8, 9, 11, 12, 13, 14, 16, 17, 18, 19]
    delta_ids = [21, 22, 23, 24]
    texts = {i: _mk_text(i) for i in base_ids + delta_ids}
    texts[21] = texts[3]  # exact dup of history
    w4 = texts[4].split(" ")
    w4[30] = "changed"  # near dup of history (1 of 55 words)
    texts[22] = " ".join(w4)
    bench_text = _mk_text(900)
    # d24: verbatim 13-token run from the benchmark doc
    w24 = _mk_text(24).split(" ")
    w24[20:33] = bench_text.split(" ")[10:23]
    texts[24] = " ".join(w24)
    rows = [
        (i, t, "en", "web", len(t))
        for i, t in sorted(texts.items())
    ] + [(25, bench_text, "en", "web", len(bench_text))]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(os.path.join(tmp, "documents.parquet"))
    return base_ids, delta_ids, texts, bench_text


def test_incremental_planted_history_kills(spark):
    with tempfile.TemporaryDirectory() as tmp:
        base_ids, delta_ids, _, _ = _planted_docs(spark, tmp)
        rows = catalog.queries()["pipeline_pretrain_incremental"](
            spark, tmp
        ).collect()
    assert len(rows) == 3
    by = {r["split"]: r.asDict() for r in rows}
    assert set(by) == {"train", "val", "test"}
    for r in by.values():
        assert r["cut_id"] == 19
        assert r["survivors_match"] is True
        assert r["budgets_match"] is True
        assert r["n_merged_final"] == r["n_recompute_final"]
        assert r["tok_merged"] == r["tok_recompute"]
        # the planted kills, witnessed in-row
        assert r["n_hist_exact_kills"] == 1  # d21 == b3
        assert r["n_hist_near_kills"] == 1  # d22 ~ b4
    # base corpus has no internal dups and no contamination
    assert sum(r["n_base_final"] for r in by.values()) == len(base_ids)
    # of the 4 delta docs: d21 exact-killed, d22 near-killed,
    # d24 bloom-suppressed (13-gram overlap with the bench doc),
    # d23 admitted
    assert sum(r["n_delta_final"] for r in by.values()) == 1


def test_incremental_factory_parity(spark):
    """The X30 factory expresses the delta pass with the PERSISTED
    stores (fingerprint parquet, band+shingle parquet, Bloom position
    parquet) and admits exactly the docs the catalog row admits."""
    from logprep_spark.corpus import CorpusPipeline
    from logprep_spark.plans.catalog import _V3_BLOOM_J, _V3_BLOOM_M

    with tempfile.TemporaryDirectory() as tmp:
        base_ids, delta_ids, _, _ = _planted_docs(spark, tmp)
        docs = spark.read.parquet(os.path.join(tmp, "documents.parquet"))
        corpus = docs.filter(F.col("doc_id") % 5 != 0)
        bench = docs.filter(F.col("doc_id") % 5 == 0)
        base = corpus.filter(F.col("doc_id") <= 19)
        delta = corpus.filter(F.col("doc_id") > 19)

        from logprep_spark.functions import text as tx

        base_g = tx.gopher_filter(base, min_stop_hits=1)
        # persist the three store artifacts the way a daily run would
        fp_path = os.path.join(tmp, "fp_store")
        base_g.select(
            F.md5(F.array_join(tx.tokens(F.col("text")), " ")).alias("fp")
        ).distinct().write.parquet(fp_path)
        base_exact = dd.exact_dedup(base_g)
        bands_path = os.path.join(tmp, "band_store")
        dd.minhash_bands(base_exact).select(
            F.col("doc_id").alias("hist_id"), "band_id", "band_key"
        ).write.parquet(bands_path)
        sh_path = os.path.join(tmp, "shingle_store")
        dd.shingle_arrays(base_exact).select(
            F.col("doc_id").alias("hist_id"), "sh"
        ).write.parquet(sh_path)
        bloom_path = os.path.join(tmp, "bloom_store")
        sk.bloom_bits(
            dd.window_hashes(bench, 13).select("window_hash").distinct(),
            "window_hash",
            m=_V3_BLOOM_M,
            j=_V3_BLOOM_J,
        ).write.parquet(bloom_path)

        pipe = CorpusPipeline(
            [
                {"op": "gopher_filter", "min_stop_hits": 1},
                {"op": "exact_dedup_vs_store", "path": fp_path},
                {"op": "near_dedup", "threshold_milli": 700},
                {
                    "op": "neardup_vs_store",
                    "bands_path": bands_path,
                    "shingles_path": sh_path,
                    "threshold_milli": 700,
                },
                {
                    "op": "decontaminate",
                    "path": bloom_path,
                    "k": 13,
                    "m": _V3_BLOOM_M,
                    "j": _V3_BLOOM_J,
                },
            ]
        )
        admitted = sorted(
            r["doc_id"] for r in pipe.transform(delta).collect()
        )
    # d21 killed by the fingerprint store, d22 by the band store,
    # d24 by the Bloom filter; only the clean doc survives
    assert admitted == [23]
