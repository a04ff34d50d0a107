"""KeyChecker — record which required fields are missing.

Reference: /root/reference/logprep/processor/key_checker/processor.py
(``source_fields`` key list; missing keys land as a list in
``target_field``). With a static schema, keys absent from the schema
are compile-time constants; present-but-null values are checked
per-row with ``isNull`` — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor


class KeyChecker(Processor):
    rule_type = "key_checker"

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        missing_exprs = []
        for key in cfg["source_fields"]:
            col = fld.get_field(df, key)
            if col is None:
                missing_exprs.append(F.lit(key))
            else:
                missing_exprs.append(F.when(col.isNull(), F.lit(key)))
        missing = F.array_compact(F.array(*missing_exprs)) if missing_exprs else F.array()
        value = F.when(F.size(missing) > 0, F.array_sort(missing))
        return self.set_when(df, cfg["target_field"], cond, value)
