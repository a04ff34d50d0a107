"""Injectable in-memory Kafka broker for end-to-end stream tests.

The spark-sql-kafka package (and any broker) is absent from this
container, so ``KafkaInput`` can only be option-validated against the
real source. This fake implements the READER CONTRACT instead: it
assigns monotonically increasing offsets per (topic, partition),
records producer timestamps, and exposes every record in Spark's
kafka wire schema (key/value binary, topic, partition, offset,
timestamp, timestampType) through a file-backed streaming source —
each produce() is one atomically-renamed json file, so a running
micro-batch stream picks up later produces exactly like new broker
records. ``KafkaInput(broker=...)`` swaps this in for
``format("kafka")`` while every downstream step (value decode,
from_json parsing, preprocessors) stays the production code path.
"""

from __future__ import annotations

import base64
import json
import os
import uuid

from pyspark.sql import types as T

#: Spark's kafka source output schema, mirrored by the fake.
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


class FakeKafkaBroker:
    def __init__(self, base_dir: str):
        self.base_dir = base_dir
        self._next_offset: dict[tuple[str, int], int] = {}

    def topic_dir(self, topic: str) -> str:
        path = os.path.join(self.base_dir, topic)
        os.makedirs(path, exist_ok=True)
        return path

    def topics(self) -> set[str]:
        """Topics that have received at least one produce()."""
        return {t for t, _ in self._next_offset}

    def produce(
        self,
        topic: str,
        value: bytes | str,
        key: bytes | str | None = None,
        partition: int = 0,
        timestamp: str | None = None,
    ) -> int:
        """Append one record; returns its assigned offset."""
        if isinstance(value, str):
            value = value.encode("utf-8")
        if isinstance(key, str):
            key = key.encode("utf-8")
        slot = (topic, partition)
        offset = self._next_offset.get(slot, 0)
        self._next_offset[slot] = offset + 1
        record = {
            "key": base64.b64encode(key).decode() if key is not None else None,
            "value": base64.b64encode(value).decode(),
            "topic": topic,
            "partition": partition,
            "offset": offset,
            "timestamp": timestamp,
            "timestampType": 0,
        }
        path = self.topic_dir(topic)
        tmp = os.path.join(path, f".{uuid.uuid4().hex}.tmp")
        final = os.path.join(path, f"rec-{partition}-{offset:012d}.json")
        with open(tmp, "w") as fh:
            fh.write(json.dumps(record))
        os.rename(tmp, final)  # atomic: the stream never sees partials
        return offset

    def wire_frame(self, spark, topic: str):
        """Batch view of everything produced (wire schema) — for
        asserting offset/partition bookkeeping in tests."""
        return spark.read.schema(KAFKA_WIRE_SCHEMA).json(self.topic_dir(topic))
