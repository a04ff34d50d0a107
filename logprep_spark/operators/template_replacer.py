"""TemplateReplacer — replace a text field using a template table.

Reference: /root/reference/logprep/processor/template_replacer/
processor.py (template file keyed by provider_name/event_id-style
fields; matching events get ``target_field`` replaced by the
template).

Spark realization: the template mapping is a small table →
``broadcast`` hash join on the key fields (the 100 TB-correct plan:
map-side, no shuffle of the fact stream), then a conditional
column rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor


class TemplateReplacer(Processor):
    rule_type = "template_replacer"

    def __init__(
        self,
        rules=None,
        template: dict[tuple, str] | None = None,
        pattern_keys: list[str] | None = None,
        target_field: str = "message",
        **kw,
    ):
        """``template``: {(key_value, ...) -> replacement}; keys match
        ``pattern_keys`` event fields in order."""
        super().__init__(rules, **kw)
        self.template = template or {}
        self.pattern_keys = pattern_keys or []
        self.target_field = target_field

    def transform(self, df: DataFrame) -> DataFrame:
        if not self.template or not self.pattern_keys:
            return df
        spark = df.sparkSession
        rows = [tuple(str(p) for p in key) + (repl,) for key, repl in self.template.items()]
        key_cols = [f"__tr_k{i}" for i in range(len(self.pattern_keys))]
        schema = ", ".join(f"{c} string" for c in key_cols) + ", __tr_replacement string"
        lookup = broadcast(spark.createDataFrame(rows, schema))
        on = None
        for key_col, path in zip(key_cols, self.pattern_keys):
            field = fld.get_field(df, path)
            clause = (
                F.lit(False) if field is None else field.cast("string") == F.col(key_col)
            )
            on = clause if on is None else (on & clause)
        df = df.join(lookup, on=on, how="left")
        existing = fld.get_field(df, self.target_field)
        replaced = F.when(F.col("__tr_replacement").isNotNull(), F.col("__tr_replacement"))
        if existing is not None:
            replaced = replaced.otherwise(existing.cast("string"))
        df = fld.set_field(df, self.target_field, replaced)
        return df.drop("__tr_replacement", *key_cols)
