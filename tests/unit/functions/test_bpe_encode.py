"""BPE merge-table encoder (functions/text.py bpe_encode_words /
bpe_token_counts): known-vocabulary encodings hand-computed against
the documented semantics (rank-order exhaustive passes, fixed rounds,
converged witness), including the out-of-dependency-order rule
("r","ing") that only fires on the second round."""

from pyspark.sql import functions as F

from logprep_spark.functions.text import (
    BPE_MERGES,
    bpe_encode_words,
    bpe_fertility,
    bpe_token_counts,
    bpe_train,
)


def _python_pass(symbols, merges):
    """Reference replica of one rank-order round: each rule applied
    exhaustively left-to-right (the fused symbol re-pairs with the
    next incomer)."""
    out = list(symbols)
    for a, b in merges:
        acc = []
        for x in out:
            if acc and acc[-1] == a and x == b:
                acc[-1] = a + b
            else:
                acc.append(x)
        out = acc
    return out


def _python_encode(word, rounds=3):
    t = list(word)
    for _ in range(rounds):
        t = _python_pass(t, BPE_MERGES)
    return t


def test_hand_computed_sequences(spark):
    """Literal hand-computed expectations — not just replica parity."""
    df = spark.createDataFrame(
        [("the ring string interesting",)], ["text"]
    )
    got = {
        r["w"]: (list(r["tokens"]), r["converged"])
        for r in bpe_encode_words(df).collect()
    }
    # the: t+h -> th (rank 1), th+e -> the (rank 2), round 1
    assert got["the"] == (["the"], True)
    # ring: i+n (rank 3) -> [r, in, g]; in+g (rank 15) -> [r, ing];
    # r+ing (rank 8) is OUT of order — only fires in round 2
    assert got["ring"] == (["ring"], True)
    # string: i+n -> [s,t,r,in,g]; s+t (rank 14) -> [st,r,in,g];
    # in+g -> [st,r,ing]; round 2: r+ing -> [st, ring]
    assert got["string"] == (["st", "ring"], True)
    assert got["interesting"] == (
        ["in", "t", "er", "es", "t", "ing"],
        True,
    )


def test_matches_python_replica_and_weights(spark):
    words = [
        "hello", "world", "and", "another", "tokenization",
        "round", "bpe", "xyz", "aaa", "the", "the", "ring",
    ]
    df = spark.createDataFrame([(" ".join(words),)], ["text"])
    enc = {r["w"]: (list(r["tokens"]), r["n_w"]) for r in bpe_encode_words(df).collect()}
    for w in set(words):
        assert enc[w][0] == _python_encode(w), w
        assert enc[w][1] == words.count(w)


def test_token_counts_weighted_and_converged(spark):
    df = spark.createDataFrame([("the the the ring",)], ["text"])
    rows = bpe_token_counts(df, top_n=5).collect()
    got = {r["token"]: r["n_occurrences"] for r in rows}
    assert got == {"the": 3, "ring": 1}
    assert all(r["converged"] for r in rows)


def test_fertility_hand_computed_per_domain(spark):
    """Two domains with hand-countable encodings: 'the ring' encodes
    to 1 token per word (fertility 1000); 'xyz xyz' stays 3 chars
    (fertility 3000, chars/token 1000). WeIGHTS are occurrence
    counts, chars/token divides exact integer products."""
    df = spark.createDataFrame(
        [("merged", "the ring the"), ("frag", "xyz xyz")],
        ["source", "text"],
    )
    rows = {r["source"]: r for r in bpe_fertility(df).collect()}
    m = rows["merged"]
    # the(1 tok) x2 + ring(1 tok) x1 -> 3 words, 3 tokens
    assert (m["n_words"], m["n_tokens"]) == (3, 3)
    assert m["fertility_milli"] == 1000
    # chars: the(3)x2 + ring(4) = 10 over 3 tokens -> 3333
    assert m["chars_per_token_milli"] == 3333
    assert m["converged"] is True
    f = rows["frag"]
    # xyz never merges: 2 words, 6 tokens, 6 chars
    assert (f["n_words"], f["n_tokens"]) == (2, 6)
    assert f["fertility_milli"] == 3000
    assert f["chars_per_token_milli"] == 1000
    assert f["converged"] is True


def test_train_hand_computed_merges_and_early_stop(spark):
    """Hand-run the trainer: 'abab'x3 + 'cd' + single chars. Round 1
    adopts (a,b) with weighted count 6 (two occurrences per 'abab' —
    the exhaustive left-to-right count), round 2 (ab,ab)=3, round 3
    (c,d)=1; round 4 finds NO pair left and the trainer stops early
    with 3 rows instead of padding. Single-char words exercise the
    empty-pair guard."""
    df = spark.createDataFrame(
        [("abab abab abab cd c d",)], ["text"]
    )
    rows = bpe_train(df, n_merges=4).collect()
    assert [(r["rank"], r["lhs"], r["rhs"], r["pair_count"]) for r in rows] == [
        (1, "a", "b", 6),
        (2, "ab", "ab", 3),
        (3, "c", "d", 1),
    ]
    # determinism: rerun is bit-identical
    again = bpe_train(df, n_merges=4).collect()
    assert again == rows


def test_learned_table_is_dependency_ordered(spark):
    """A greedily-learned table is dependency-ordered by
    construction (every composite operand formed at an earlier
    rank), so encoding with it converges in ONE rank-order round —
    round 2 reproduces round 1 and the witness is TRUE everywhere;
    tokens match the trainer's own final state (here 'abab' fully
    merged)."""
    df = spark.createDataFrame([("abab abab abab cd c d",)], ["text"])
    learned = [
        (r["lhs"], r["rhs"]) for r in bpe_train(df, n_merges=4).collect()
    ]
    enc = {
        r["w"]: (list(r["tokens"]), r["converged"])
        for r in bpe_encode_words(df, merges=learned, rounds=2).collect()
    }
    assert enc["abab"] == (["abab"], True)
    assert enc["cd"] == (["cd"], True)
    assert all(conv for _, conv in enc.values())


def test_unconverged_witness_with_starved_rounds(spark):
    """rounds=1 cannot fire the out-of-order ("r","ing") rule; the
    witness must say so instead of silently emitting the truncation.
    (rounds=2 completes the merge but compares against round 1, so
    the witness honestly reports non-convergence until round 3.)"""
    df = spark.createDataFrame([("ring",)], ["text"])
    (r1,) = bpe_encode_words(df, rounds=2).collect()
    assert list(r1["tokens"]) == ["ring"]
    assert r1["converged"] is False
    (r3,) = bpe_encode_words(df, rounds=3).collect()
    assert list(r3["tokens"]) == ["ring"]
    assert r3["converged"] is True


def test_train_oracle_tolerates_degenerate_corpus(spark):
    """ADVICE-r9 regression: on a corpus with fewer learnable pairs
    than n_merges, Spark stops early and returns the learned PREFIX;
    the unrolled DuckDB replica used to cross-join each t{r} with its
    1-row m{r}, so one empty tail round annihilated every later token
    CTE and the oracle returned ZERO rows. The LEFT JOIN fix makes
    the fold pass through NULL-merge rounds — both engines must now
    return the same 1-row prefix for n_merges=6."""
    import duckdb

    from logprep_spark.plans.catalog import _sql_bpe_train

    corpus = "ab ab b a"
    df = spark.createDataFrame([(corpus,)], ["text"])
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_train(df, n_merges=6).collect()
    ]
    assert got == [(1, "a", "b", 2)]

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT '{corpus}' AS text")
    oracle = [
        tuple(r) for r in con.sql(_sql_bpe_train(n_merges=6)).fetchall()
    ]
    con.close()
    assert oracle == [(1, "a", "b", 2)]
