"""StringSplitter — split a string field into a list.

Reference: /root/reference/logprep/processor/string_splitter/
processor.py (``delimiter`` default whitespace; result list to
``target_field``). Realized with native ``split``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor


class StringSplitter(Processor):
    rule_type = "string_splitter"

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        src = fld.get_field(df, cfg["source_fields"][0])
        if src is None:
            return df
        delim = cfg.get("delimiter")
        pattern = "\\s+" if delim is None else re.escape(delim)
        parts = F.split(src.cast("string"), pattern)
        if cfg.get("drop_empty", False) or delim is None:
            parts = F.filter(parts, lambda x: x != "")
        return self.set_when(df, cfg["target_field"], cond, parts)
