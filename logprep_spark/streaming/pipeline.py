"""Streaming pipeline: source → processor chain → sink(s).

The reference's pipeline (``logprep/framework/pipeline.py``) pulls one
event at a time through every processor. Here the SAME ``Processor``
objects (narrow column transforms — see ``operators/base.py``) are
applied to an unbounded DataFrame; Catalyst fuses them into one
projection per micro-batch, so per-event Python never runs.

Extra-event emitters (pre_detector alerts, selective_extractor,
pseudonymizer pseudonyms) become additional sinks fed from the same
source stream — Spark runs them as independent queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from logprep_spark.operators.base import Pipeline, Processor


class StreamingPipeline:
    """Compose input connector, processors, and output connector.

    ``input`` needs ``read_stream(spark)``; ``output`` needs
    ``write_stream(df, ...)`` (see ``sources/``). ``run`` wires them
    and returns the started StreamingQuery.
    """

    def __init__(self, input_connector, processors: list[Processor], output_connector):
        self.input = input_connector
        self.pipeline = Pipeline(processors)
        self.output = output_connector

    def transform(self, df: DataFrame) -> DataFrame:
        return self.pipeline.transform(df)

    def run(self, spark, **sink_kwargs):
        events = self.transform(self.input.read_stream(spark))
        return self.output.write_stream(events, **sink_kwargs)
