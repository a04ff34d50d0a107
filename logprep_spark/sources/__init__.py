"""Connectors: inputs/outputs re-expressed as Spark readers/writers.

Reference surface (``/root/reference/logprep/connector/``):
confluent_kafka, console, dummy, file, http, json, jsonl, opensearch,
s3 — each re-expressed as ``spark.read``/``readStream`` (inputs) or
``df.write``/``writeStream``/``foreachBatch`` (outputs), not as a
row-at-a-time client loop.
"""

from logprep_spark.sources.inputs import (
    DummyInput,
    FileInput,
    HttpInput,
    JsonInput,
    JsonlInput,
    KafkaInput,
    PreprocessingConfig,
    apply_preprocessors,
)
from logprep_spark.sources.outputs import (
    ConsoleOutput,
    IdempotentBatchOutput,
    DummyOutput,
    HttpOutput,
    JsonlOutput,
    KafkaOutput,
    OpensearchOutput,
    ParquetOutput,
    S3Output,
)

__all__ = [
    "ConsoleOutput",
    "IdempotentBatchOutput",
    "DummyInput",
    "DummyOutput",
    "FileInput",
    "HttpInput",
    "HttpOutput",
    "JsonInput",
    "JsonlInput",
    "JsonlOutput",
    "KafkaInput",
    "KafkaOutput",
    "OpensearchOutput",
    "ParquetOutput",
    "PreprocessingConfig",
    "S3Output",
    "apply_preprocessors",
]
