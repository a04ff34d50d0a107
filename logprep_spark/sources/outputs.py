"""Output connectors (reference: ``logprep/connector/*`` outputs).

Batch outputs are ``df.write`` variants; streaming outputs are
``writeStream`` sinks. Service-backed sinks (OpenSearch, Kafka) are
expressed through ``foreachBatch``/kafka-sink so each micro-batch
ships as a bulk write from the executors — never a driver-side loop.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class JsonlOutput:
    """reference ``connector/jsonl`` output: one JSON doc per line."""

    def __init__(self, path: str, mode: str = "overwrite"):
        self.path = path
        self.mode = mode

    def write(self, df: DataFrame) -> None:
        df.write.mode(self.mode).json(self.path)

    def write_stream(self, df: DataFrame, checkpoint: str, **trigger):
        return (
            df.writeStream.format("json")
            .option("path", self.path)
            .option("checkpointLocation", checkpoint)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )


class ParquetOutput:
    """Columnar archive output — the 100 TB default. ``partition_by``
    (e.g. event date) gives partition pruning to every downstream
    reader."""

    def __init__(self, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"):
        self.path = path
        self.partition_by = partition_by or []
        self.mode = mode

    def write(self, df: DataFrame) -> None:
        writer = df.write.mode(self.mode)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(self.path)


class ConsoleOutput:
    """reference ``connector/console``."""

    def write(self, df: DataFrame) -> None:
        df.show(truncate=False)

    def write_stream(self, df: DataFrame, **trigger):
        return (
            df.writeStream.format("console")
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )


class DummyOutput:
    """reference ``connector/dummy`` — collect to memory (tests)."""

    def __init__(self):
        self.events: list[dict] = []

    def write(self, df: DataFrame) -> None:
        self.events.extend(r.asDict(recursive=True) for r in df.collect())

    def write_stream(self, df: DataFrame, query_name: str = "dummy_out", **trigger):
        return (
            df.writeStream.format("memory")
            .queryName(query_name)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )


class KafkaOutput:
    """reference ``connector/confluent_kafka`` output. Events are
    serialized to a JSON ``value`` column; the kafka sink fans writes
    out from every executor. Plan construction is broker-free."""

    def __init__(self, bootstrap_servers: str, topic: str):
        self.bootstrap_servers = bootstrap_servers
        self.topic = topic

    def options(self) -> dict[str, str]:
        return {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "topic": self.topic,
        }

    @staticmethod
    def serialize(df: DataFrame) -> DataFrame:
        return df.select(F.to_json(F.struct(*df.columns)).alias("value"))

    def writer(self, df: DataFrame):
        return self.serialize(df).write.format("kafka").options(**self.options())

    def stream_writer(self, df: DataFrame, checkpoint: str):
        return (
            self.serialize(df)
            .writeStream.format("kafka")
            .options(**self.options())
            .option("checkpointLocation", checkpoint)
        )


class OpensearchOutput:
    """reference ``connector/opensearch`` — bulk indexer.

    The cluster client isn't in this container, so the transport is an
    injectable callable; the Spark-side shape is real: ``foreachBatch``
    → per-partition bulk payload assembly on executors. The default
    transport spools bulk bodies to a local directory so tests can
    assert exact payloads.
    """

    def __init__(self, index: str, spool_dir: str | None = None, transport=None):
        self.index = index
        self.spool_dir = spool_dir
        self.transport = transport

    def _bulk_lines(self, rows) -> str:
        lines = []
        for r in rows:
            lines.append(json.dumps({"index": {"_index": self.index}}))
            lines.append(json.dumps(r.asDict(recursive=True), default=str))
        return "\n".join(lines) + "\n" if lines else ""

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        """Executor-side bulk assembly: each partition builds and ships
        its own bulk body (``foreachPartition``) — rows never funnel
        through the driver."""
        spool, transport, bulk = self.spool_dir, self.transport, self._bulk_lines

        def send_partition(rows_iter):
            from pyspark import TaskContext

            body = bulk(rows_iter)
            if not body:
                return
            if transport is not None:
                transport(body)
            elif spool is not None:
                pid = TaskContext.get().partitionId() if TaskContext.get() else 0
                os.makedirs(spool, exist_ok=True)
                with open(os.path.join(spool, f"bulk-{batch_id}-{pid}.ndjson"), "w") as fh:
                    fh.write(body)
            else:
                raise NotImplementedError("no opensearch client in container; pass transport=")

        df.foreachPartition(send_partition)

    def write_stream(self, df: DataFrame, checkpoint: str, **trigger):
        return (
            df.writeStream.foreachBatch(self.write_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )


class S3Output:
    """reference ``connector/s3`` — object-store writer. Identical
    writer plan as ParquetOutput/JsonlOutput against an ``s3a://``
    URI; credentials/endpoint come from hadoop conf. Local paths work
    verbatim in tests (the hadoop-aws jars aren't shipped here)."""

    def __init__(self, base_uri: str, fmt: str = "json"):
        self.base_uri = base_uri
        self.fmt = fmt

    def write(self, df: DataFrame, prefix: str = "events") -> None:
        df.write.mode("append").format(self.fmt).save(f"{self.base_uri}/{prefix}")
