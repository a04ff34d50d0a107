"""Deduplicator — remove duplicate values inside list fields.

Reference: /root/reference/logprep/processor/deduplicator/processor.py
(``fields`` list; de-dups each field's list value preserving first
occurrence). Realized with ``array_distinct`` (order-preserving).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor


class Deduplicator(Processor):
    rule_type = "deduplicator"

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        for path in cfg["fields"]:
            col = fld.get_field(df, path)
            if col is None:
                continue
            dtype = fld.field_type(df.schema, path)
            if not isinstance(dtype, T.ArrayType):
                continue
            df = self.set_when(df, path, cond, F.array_distinct(col))
        return df
