"""Labeler — attach categorized labels to matching events.

Reference: /root/reference/logprep/processor/labeler/processor.py
(rule ``label: {category: [values]}``; labels union into
``label.<category>`` sorted). Realized as conditional array unions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor


class Labeler(Processor):
    rule_type = "labeler"

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        for category, values in cfg["label"].items():
            path = f"label.{category}"
            new = F.array(*[F.lit(v) for v in sorted(values)])
            existing = fld.get_field(df, path)
            if existing is None:
                value = F.when(cond, new)
            else:
                value = F.when(
                    cond, F.array_sort(F.array_distinct(F.concat(F.coalesce(existing, F.array()), new)))
                ).otherwise(existing)
            df = fld.set_field(df, path, value)
        return df
