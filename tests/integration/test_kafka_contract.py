"""Broker contract conformance, one test body for BOTH implementations.

The fake broker (sources/fake_kafka.py) stands in for confluent-kafka
in this sandbox; this suite pins the CONTRACT the fake must mirror —
per-(topic, partition) monotonically increasing offsets assigned in
produce order, byte-exact key/value round-trip, topic/partition echo,
None keys preserved — and runs the SAME body against the real
``confluent_kafka`` package whenever it is importable and a broker is
reachable (``LOGPREP_SPARK_KAFKA_BOOTSTRAP``). An environment that
gains the package gets real-broker coverage with zero test changes;
here the real leg skip-marks cleanly.

Reference: logprep/connector/confluent_kafka/input.py (offset/partition
semantics the reference consumer relies on).
"""

from __future__ import annotations

import os
import uuid

import pytest


class FakeAdapter:
    """Contract adapter over sources/fake_kafka.FakeKafkaBroker."""

    def __init__(self, tmp_path, spark):
        from logprep_spark.sources.fake_kafka import FakeKafkaBroker

        self.spark = spark
        self.broker = FakeKafkaBroker(str(tmp_path / "broker"))

    def produce(self, topic, value, key=None, partition=0):
        return self.broker.produce(topic, value, key=key, partition=partition)

    def fetch_all(self, topic):
        """[(partition, offset, key bytes|None, value bytes)] sorted."""
        rows = self.broker.wire_frame(self.spark, topic).collect()
        return sorted(
            (r["partition"], r["offset"], bytes(r["key"]) if r["key"] is not None else None,
             bytes(r["value"]))
            for r in rows
        )


class RealAdapter:
    """Same contract over the real confluent_kafka package."""

    def __init__(self, bootstrap):
        import confluent_kafka

        self.bootstrap = bootstrap
        self._producer = confluent_kafka.Producer({"bootstrap.servers": bootstrap})
        self._offsets: list = []

    def produce(self, topic, value, key=None, partition=0):
        if isinstance(value, str):
            value = value.encode()
        if isinstance(key, str):
            key = key.encode()
        holder = {}

        def cb(err, msg):
            assert err is None, err
            holder["offset"] = msg.offset()

        self._producer.produce(topic, value=value, key=key, partition=partition, on_delivery=cb)
        self._producer.flush(10)
        return holder["offset"]

    def fetch_all(self, topic):
        import confluent_kafka

        consumer = confluent_kafka.Consumer(
            {
                "bootstrap.servers": self.bootstrap,
                "group.id": f"contract-{uuid.uuid4().hex}",
                "auto.offset.reset": "earliest",
            }
        )
        consumer.subscribe([topic])
        rows = []
        empties = 0
        while empties < 5:
            msg = consumer.poll(1.0)
            if msg is None:
                empties += 1
                continue
            if msg.error():
                continue
            rows.append((msg.partition(), msg.offset(), msg.key(), msg.value()))
        consumer.close()
        return sorted(rows)


@pytest.fixture(params=["fake", "real"])
def adapter(request, tmp_path, spark):
    if request.param == "fake":
        return FakeAdapter(tmp_path, spark)
    try:
        import confluent_kafka  # noqa: F401
    except ImportError:
        pytest.skip("confluent_kafka not installed in this environment")
    bootstrap = os.environ.get("LOGPREP_SPARK_KAFKA_BOOTSTRAP")
    if not bootstrap:
        pytest.skip("LOGPREP_SPARK_KAFKA_BOOTSTRAP not set (no reachable broker)")
    return RealAdapter(bootstrap)


def test_broker_contract_offsets_keys_roundtrip(adapter):
    """Offsets are per-partition monotonic from 0 in produce order;
    key/value bytes round-trip exactly; None keys stay None."""
    topic = f"contract-{uuid.uuid4().hex[:8]}"
    assert adapter.produce(topic, b"v0-p0", key=b"k0", partition=0) == 0
    assert adapter.produce(topic, b"v1-p0", partition=0) == 1
    assert adapter.produce(topic, "v0-p1 \xe9", key="cl\xe9", partition=1) == 0
    assert adapter.produce(topic, b"v2-p0", key=b"k2", partition=0) == 2

    rows = adapter.fetch_all(topic)
    assert rows == [
        (0, 0, b"k0", b"v0-p0"),
        (0, 1, None, b"v1-p0"),
        (0, 2, b"k2", b"v2-p0"),
        (1, 0, "cl\xe9".encode(), "v0-p1 \xe9".encode()),
    ]


def test_broker_contract_independent_topics(adapter):
    """Offset counters are per (topic, partition): a second topic
    starts at 0 regardless of traffic on the first."""
    t1 = f"contract-a-{uuid.uuid4().hex[:8]}"
    t2 = f"contract-b-{uuid.uuid4().hex[:8]}"
    assert adapter.produce(t1, b"x") == 0
    assert adapter.produce(t1, b"y") == 1
    assert adapter.produce(t2, b"z") == 0
