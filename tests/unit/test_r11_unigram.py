"""text_unigram_tokenize: hand-corpus segmentations, reconstruction
property, and an independent Python Viterbi replica (exact costs)."""

from __future__ import annotations

import math
import os
import tempfile

from logprep_spark.functions import text as tx
from logprep_spark.plans import catalog


def _replica(texts, top_multi=10, max_piece=4, max_word=16):
    """Independent unigram trainer + Viterbi, plain Python ints."""
    words = {}
    for t in texts:
        for w in __import__("re").split("[^a-z]+", t.lower()):
            if w and len(w) <= max_word:
                words[w] = words.get(w, 0) + 1
    subs = {}
    for w, n in words.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece, len(w) - i) + 1):
                p = w[i : i + l]
                subs[p] = subs.get(p, 0) + n
    singles = {p: c for p, c in subs.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in subs.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[:top_multi]
    vocab = dict(singles)
    vocab.update(dict(multi))
    total = sum(vocab.values())
    cost = {p: round(1e6 * math.log(total / c)) for p, c in vocab.items()}
    segs = {}
    for w in words:
        L = len(w)
        b = [0]  # keys: cost*100 + len
        for e in range(1, L + 1):
            keys = []
            for l in range(1, min(max_piece, e) + 1):
                p = w[e - l : e]
                if p in cost:
                    keys.append((b[e - l] // 100 + cost[p]) * 100 + l)
            b.append(min(keys))
        pieces = []
        pos = L
        while pos > 0:
            l = b[pos] % 100
            pieces.append(w[pos - l : pos])
            pos -= l
        segs[w] = (list(reversed(pieces)), b[L] // 100)
    return words, vocab, cost, segs


def test_unigram_hand_corpus_matches_replica(spark):
    texts = [
        "the theory of the theatre",
        "the theory and the theory",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["w"]: (list(reversed(r["pieces"])), r["cost_micro"], r["n_pieces"])
        for r in tx.unigram_segment_frame(df, top_multi=10).collect()
    }
    _, _, _, segs = _replica(texts, top_multi=10)
    assert set(got) == set(segs)
    for w, (pieces, cost) in segs.items():
        assert got[w][0] == pieces, (w, got[w][0], pieces)
        assert got[w][1] == cost, w
        # reconstruction: the pieces concatenate back to the word
        assert "".join(pieces) == w
    # the classic unigram win: 'theory' segments as [the, ory], not
    # char-by-char, and 'the' is a single piece
    assert got["the"][0] == ["the"]
    assert got["theory"][0] == ["the", "ory"]


def test_unigram_corpus_row_properties(spark, sf_dir):
    rows = catalog.queries()["text_unigram_tokenize"](
        spark, sf_dir
    ).collect()
    assert len(rows) == 30
    r0 = rows[0]
    # compression: pieces never exceed chars (singles path worst case)
    assert 0 < r0["compression_permille"] <= 1000
    assert r0["vocab_size"] > 26
    usages = [r["usage"] for r in rows]
    assert usages == sorted(usages, reverse=True)
    for r in rows:
        # every vocabulary piece's cost is the micro-rounded -ln p
        assert r["cost_micro"] > 0
        assert r["usage"] <= r["total_pieces"]


def _replica_em(texts, top_multi=10, max_piece=4, max_word=16):
    """One EM round on top of _replica: usage -> add-one re-estimated
    costs -> re-segmentation; returns (u1, cost2, segs2, gain)."""
    words, vocab, cost, segs1 = _replica(texts, top_multi, max_piece,
                                         max_word)
    u1 = {p: 0 for p in vocab}
    for w, (pieces, _) in segs1.items():
        for p in pieces:
            u1[p] += words[w]
    t2 = sum(u + 1 for u in u1.values())
    cost2 = {p: round(1e6 * math.log(t2 / (u1[p] + 1))) for p in vocab}
    segs2 = {}
    for w in words:
        L = len(w)
        b = [0]
        for e in range(1, L + 1):
            keys = []
            for l in range(1, min(max_piece, e) + 1):
                p = w[e - l : e]
                if p in cost2:
                    keys.append((b[e - l] // 100 + cost2[p]) * 100 + l)
            b.append(min(keys))
        pieces = []
        pos = L
        while pos > 0:
            l = b[pos] % 100
            pieces.append(w[pos - l : pos])
            pos -= l
        segs2[w] = (list(reversed(pieces)), b[L] // 100)
    r1_under2 = sum(
        words[w] * sum(cost2[p] for p in segs1[w][0]) for w in words
    )
    r2 = sum(words[w] * segs2[w][1] for w in words)
    return u1, cost2, segs2, r1_under2 - r2


def test_unigram_em_matches_replica_and_theorem(spark):
    texts = [
        "the theory of the theatre",
        "the theory and the theory",
    ]
    import tempfile as _tf

    with _tf.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        ).write.parquet(os.path.join(tmp, "documents.parquet"))
        # the catalog row uses the full 200-multi vocab; replicate
        # with the same params
        rows = catalog.queries()["text_unigram_em"](spark, tmp).collect()
    u1, cost2, segs2, gain = _replica_em(
        texts, top_multi=tx.UNIGRAM_TOP_MULTI
    )
    u2 = {}
    words, _, _, _ = _replica(texts, top_multi=tx.UNIGRAM_TOP_MULTI)
    for w, (pieces, _) in segs2.items():
        for p in pieces:
            u2[p] = u2.get(p, 0) + words[w]
    got = {r["piece"]: r.asDict() for r in rows}
    for p, r in got.items():
        assert r["usage_r1"] == u1[p], p
        assert r["usage_r2"] == u2[p], p
        assert r["cost2_micro"] == cost2[p], p
        # the EM theorem, gated in-row: re-segmenting under the
        # learned model never costs more than keeping round-1 pieces
        assert r["reseg_gain_micro"] == gain
        assert r["reseg_gain_micro"] >= 0


def test_unigram_em_gain_positive_on_corpus(spark, sf_dir):
    rows = catalog.queries()["text_unigram_em"](spark, sf_dir).collect()
    assert len(rows) == 20
    r = rows[0]
    assert r["reseg_gain_micro"] >= 0
    # the learned model genuinely moves on real text
    assert r["total_pieces_r2"] <= r["total_pieces_r1"]
