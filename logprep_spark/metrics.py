"""Pipeline metrics (reference: ``logprep/metrics/metrics.py`` —
per-component processed/filtered counters exported to Prometheus).

Spark-first: counters ride the query itself via ``df.observe`` —
aggregated on executors during the SAME pass, no second job and no
driver-side row counting. Batch uses ``pyspark.sql.Observation``;
streaming reads ``observedMetrics`` from each micro-batch's progress
(or live via ``MetricsListener``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.streaming.listener import StreamingQueryListener


def counters(cond: Column | None = None) -> list[Column]:
    """Standard counter set: total events, plus matched/filtered split
    when a rule condition is given."""
    out = [F.count(F.lit(1)).alias("n_events")]
    if cond is not None:
        out.append(F.sum(F.when(cond, 1).otherwise(0)).alias("n_matched"))
    return out


def observe_batch(
    df: DataFrame, cond: Column | None = None, name: str = "logprep_metrics"
) -> tuple[DataFrame, Observation]:
    """Attach counters to a batch plan. After any action on the
    returned frame, ``observation.get`` yields the counts."""
    obs = Observation(name)
    return df.observe(obs, *counters(cond)), obs


def observe_stream(
    df: DataFrame, cond: Column | None = None, name: str = "logprep_metrics"
) -> DataFrame:
    """Attach counters to a streaming plan; values surface per
    micro-batch in ``query.lastProgress['observedMetrics'][name]`` and
    in MetricsListener callbacks."""
    return df.observe(name, *counters(cond))


def progress_metrics(query, name: str = "logprep_metrics") -> dict:
    """Read observed counters from a StreamingQuery's last progress."""
    progress = query.lastProgress
    if not progress:
        return {}
    observed = progress.get("observedMetrics", {}).get(name)
    if observed is None:
        return {}
    return observed.asDict() if hasattr(observed, "asDict") else dict(observed)


class MetricsListener(StreamingQueryListener):
    """Accumulates observed counters across micro-batches — the
    export hook where the reference pushes to Prometheus. Register
    with ``spark.streams.addListener(listener)``."""

    def __init__(self, name: str = "logprep_metrics"):
        self.name = name
        self.totals: dict[str, int] = {}

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        observed = event.progress.observedMetrics.get(self.name)
        if observed is None:
            return
        for key, value in observed.asDict().items():
            if isinstance(value, (int, float)) and value is not None:
                self.totals[key] = self.totals.get(key, 0) + value

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass
