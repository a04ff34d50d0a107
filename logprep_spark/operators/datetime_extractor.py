"""DatetimeExtractor — split a timestamp into named parts.

Reference: /root/reference/logprep/processor/datetime_extractor/
processor.py — writes a struct of year/month/day/hour/minute/second/
microsecond/weekday under ``target_field``. Realized with native
``year()``/``month()``/... extractors over one ``to_timestamp``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor


class DatetimeExtractor(Processor):
    rule_type = "datetime_extractor"

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        src = fld.get_field(df, cfg["source_fields"][0])
        if src is None:
            return df
        dtype = fld.field_type(df.schema, cfg["source_fields"][0])
        ts = src if isinstance(dtype, T.TimestampType) else F.to_timestamp(src)
        parts = F.struct(
            F.year(ts).alias("year"),
            F.month(ts).alias("month"),
            F.dayofmonth(ts).alias("day"),
            F.hour(ts).alias("hour"),
            F.minute(ts).alias("minute"),
            F.second(ts).alias("second"),
            (F.unix_micros(ts) % 1_000_000).alias("microsecond"),
            F.date_format(ts, "EEEE").alias("weekday"),
        )
        return self.set_when(df, cfg["target_field"], cond, parts)
