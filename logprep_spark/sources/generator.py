"""Synthetic event generator (reference: ``logprep/generator/`` —
batcher.py, manipulator.py, controller.py).

The reference cycles sample events from files, optionally shuffles and
re-timestamps them, batches, and pushes to Kafka/HTTP for load tests.
Spark-first: ``spark.range(n)`` is the distributed driver — each index
row picks its sample via modulo against a broadcast sample table, so
generating 10^10 events is embarrassingly parallel and never
materializes events on the driver. The streaming variant rides the
``rate`` source for sustained events/sec load.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class EventGenerator:
    """Replays ``sample_events`` (list of dicts) ``events`` times.

    ``shuffle``/``seed`` mirror the reference Batcher's deterministic
    shuffle: sample choice is ``xxhash64(idx, seed) % n_samples``
    instead of sequential cycling, so any executor can compute row i
    without coordination.
    ``replace_timestamp`` stamps a ``@timestamp`` column at generation
    time (manipulator.py behavior).
    """

    def __init__(
        self,
        sample_events: list[dict],
        events: int,
        shuffle: bool = False,
        seed: int = 42,
        replace_timestamp: bool = True,
        target_partitions: int | None = None,
    ):
        if not sample_events:
            raise ValueError("need at least one sample event")
        self.samples = sample_events
        self.events = events
        self.shuffle = shuffle
        self.seed = seed
        self.replace_timestamp = replace_timestamp
        self.target_partitions = target_partitions

    def _sample_df(self, spark: SparkSession) -> DataFrame:
        rows = [(i, json.dumps(e)) for i, e in enumerate(self.samples)]
        return spark.createDataFrame(rows, "sample_id long, raw string")

    def _pick(self, idx_col):
        n = len(self.samples)
        if self.shuffle:
            return F.abs(F.xxhash64(idx_col, F.lit(self.seed))) % n
        return idx_col % n

    def _assemble(self, ids: DataFrame, spark: SparkSession) -> DataFrame:
        picked = ids.withColumn("sample_id", self._pick(F.col("event_index")))
        out = picked.join(F.broadcast(self._sample_df(spark)), "sample_id").select(
            "event_index", "raw"
        )
        if self.replace_timestamp:
            out = out.withColumn("@timestamp", F.current_timestamp())
        return out

    def generate(self, spark: SparkSession) -> DataFrame:
        parts = self.target_partitions or spark.sparkContext.defaultParallelism
        ids = spark.range(0, self.events, 1, parts).withColumnRenamed(
            "id", "event_index"
        )
        return self._assemble(ids, spark)

    def generate_stream(self, spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
        """Unbounded generator at a target rate (load-test mode)."""
        rate = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second)
            .load()
            .select(F.col("value").alias("event_index"))
        )
        return self._assemble(rate, spark)
