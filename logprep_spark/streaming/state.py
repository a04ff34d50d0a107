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
