"""Concatenator — join source fields into one target string.

Reference: /root/reference/logprep/processor/concatenator/processor.py
(source_fields + separator -> target_field; optional
delete_source_fields / overwrite_target). Realized as ``concat_ws``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor


class Concatenator(Processor):
    rule_type = "concatenator"

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        cols = [fld.get_field(df, f) for f in cfg["source_fields"]]
        present = [c.cast("string") for c in cols if c is not None]
        value = F.concat_ws(cfg.get("separator", "-"), *present)
        df = self.set_when(
            df, cfg["target_field"], cond, value, overwrite=cfg.get("overwrite_target", True)
        )
        if cfg.get("delete_source_fields", False):
            for f in cfg["source_fields"]:
                if f != cfg["target_field"]:
                    df = fld.delete_field(df, f)
        return df
