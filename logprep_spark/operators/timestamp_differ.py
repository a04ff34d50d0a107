"""TimestampDiffer — time difference between two timestamp fields.

Reference: /root/reference/logprep/processor/timestamp_differ/
processor.py (``diff: ${field1} - ${field2}`` with per-field formats,
``output_format`` seconds|milliseconds|nanoseconds, ``show_unit``).
Realized as native timestamp arithmetic.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor

_DIFF = re.compile(r"\$\{([^}]+)\}\s*-\s*\$\{([^}]+)\}")

_UNIT_DIV = {"seconds": 1.0, "milliseconds": 1e-3, "nanoseconds": 1e-9}
_UNIT_SUFFIX = {"seconds": " s", "milliseconds": " ms", "nanoseconds": " ns"}


class TimestampDiffer(Processor):
    rule_type = "timestamp_differ"

    def _as_ts(self, df: DataFrame, path_spec: str):
        path, _, fmt = path_spec.partition(":")
        col = fld.get_field(df, path)
        if col is None:
            return None
        dtype = fld.field_type(df.schema, path)
        if isinstance(dtype, T.TimestampType):
            return col
        if fmt:
            return F.to_timestamp(col.cast("string"), fmt)
        return F.to_timestamp(col.cast("string"))

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        match = _DIFF.match(cfg["diff"].strip())
        if match is None:
            raise ValueError(f"bad diff spec: {cfg['diff']!r}")
        end = self._as_ts(df, match.group(1))
        start = self._as_ts(df, match.group(2))
        if end is None or start is None:
            return df
        unit = cfg.get("output_format", "seconds")
        micros = F.unix_micros(end) - F.unix_micros(start)
        value = (micros.cast("double") / F.lit(1e6)) / F.lit(_UNIT_DIV[unit])
        if cfg.get("show_unit", False):
            value = F.concat(value.cast("string"), F.lit(_UNIT_SUFFIX[unit]))
        return self.set_when(df, cfg["target_field"], cond, value)
