"""Dropper — remove fields from events.

Reference: /root/reference/logprep/processor/dropper/processor.py
(``drop`` list of dotted fields; ``drop_full`` prunes emptied parent
objects). With a static schema a drop is unconditional column removal;
when the rule filter is narrower than ``*`` the field is nulled where
matched instead (schema must stay uniform across rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor


class Dropper(Processor):
    rule_type = "dropper"

    def transform(self, df: DataFrame) -> DataFrame:
        for rule in self.rules:
            unconditional = rule.filter.strip() == "*"
            cond = None if unconditional else self.condition(df, rule)
            for path in rule.config["drop"]:
                if not fld.has_field(df.schema, path):
                    continue
                if unconditional:
                    df = fld.delete_field(df, path)
                else:
                    existing = fld.get_field(df, path)
                    # null cond = no-match: keep the field (null-safe negate)
                    df = fld.set_field(
                        df, path, F.when(~F.coalesce(cond, F.lit(False)), existing)
                    )
        return df
