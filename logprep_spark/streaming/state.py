"""Custom stateful streaming operators.

Two state strategies, chosen per op:
- built-in state (``dropDuplicatesWithinWatermark``) when Spark
  already has the semantics — state store managed by the engine;
- ``applyInPandasWithState`` (Arrow-batched, grouped state) when the
  semantics are genuinely custom (running totals with per-key
  timeout). Per-key state is a tiny tuple, so state store pressure is
  bounded by cardinality, not traffic.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedupe_stream(
    events: DataFrame,
    keys: list[str],
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of the reference deduplicator applied across
    events: keep the first event per key within the watermark horizon.
    Built-in stateful op — state evicted at the watermark, so memory
    is bounded no matter the stream length."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


_TOTALS_SCHEMA = "user_id long, n_events long, sum_value double"
_STATE_SCHEMA = "n long, s double"


def _totals_fn(
    key: Tuple[Any], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})


def running_totals(events: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """Per-user running (count, sum) maintained across micro-batches —
    the ``applyInPandasWithState`` pattern for operators Spark's
    built-ins can't express. Emits one updated row per key per batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _totals_fn,
        outputStructType=_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout, GroupStateTimeout.NoTimeout),
    )


def dedupe_near_stream(
    docs: DataFrame,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming NEAR-duplicate suppression: drop documents whose full
    MinHash signature matches an earlier document's within the
    watermark horizon (signature-identical ⇒ Jaccard ≈ 1, i.e.
    boilerplate/reposts). The signature stage is the same zero-shuffle
    narrow map as batch (functions/dedup.py minhash_signature_df), so
    it composes with streaming state directly; state is one
    fingerprint per distinct doc, evicted at the watermark.

    Exact-match-on-signature is deliberately the streaming semantics:
    the batch LSH band self-join needs the full corpus on both sides
    and belongs in a periodic batch pass — the stream pass catches the
    (dominant) signature-identical duplicates with bounded state.
    """
    from pyspark.sql import functions as F

    from logprep_spark.functions.dedup import (
        MERSENNE_P,
        NUM_PERM,
        PERM_A,
        PERM_B,
        h60,
        shingles_of,
    )
    from logprep_spark.functions.text import tokens

    # same staged-projection discipline as minhash_signature_df (each
    # derived array in its OWN select so Catalyst neither re-inlines
    # nor re-derives it), but keeping the doc columns alongside —
    # a join of the stream to its own signature would be a
    # stream-stream join; this stays one narrow projection chain.
    staged = (
        docs.withColumn("_toks", tokens(F.col(text_col)))
        .withColumn("_sh", shingles_of(F.col("_toks")))
        .withColumn("_hb", F.transform("_sh", lambda s: h60(s) % MERSENNE_P))
    )
    def perm(i: int):
        # closure factory, NOT default-arg binding: transform inspects
        # lambda arity and would feed the element INDEX into a defaulted
        # second parameter
        a, b = PERM_A[i], PERM_B[i]
        return lambda x: (F.lit(a) * x + F.lit(b)) % MERSENNE_P

    mins = [
        F.array_min(F.transform("_hb", perm(i))).cast("string") for i in range(NUM_PERM)
    ]
    keyed = staged.withColumn("_sig_fp", F.md5(F.concat_ws("-", *mins)))
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_sig_fp"])
        .drop("_sig_fp", "_toks", "_sh", "_hb")
    )
