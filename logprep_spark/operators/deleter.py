"""Deleter — drop whole events from the pipeline.

Reference: /root/reference/logprep/processor/deleter/processor.py
(rule ``delete: true`` removes matching events). Realized as a native
anti-filter, which Catalyst pushes down to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logprep_spark.operators.base import Processor


class Deleter(Processor):
    rule_type = "deleter"

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        if cfg.get("delete", True):
            # null cond = no-match: keep the event (null-safe negate)
            return df.filter(~F.coalesce(cond, F.lit(False)))
        return df
