"""Timestamper — normalize timestamps to ISO-8601.

Reference: /root/reference/logprep/processor/timestamper/processor.py
(source_fields, source_format list incl. ISO8601/UNIX, source/target
timezones, target_field default @timestamp). Realized with
``to_timestamp`` / ``from_unixtime`` + ``date_format`` —
codegen'd datetime kernels, no Python parsing per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"


class Timestamper(Processor):
    rule_type = "timestamper"

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        source = cfg["source_fields"][0]
        src = fld.get_field(df, source)
        if src is None:
            return df
        dtype = fld.field_type(df.schema, source)
        formats = cfg.get("source_format", ["ISO8601"])
        if isinstance(formats, str):
            formats = [formats]
        src_tz = cfg.get("source_timezone", "UTC")
        tgt_tz = cfg.get("target_timezone", "UTC")

        # source_timezone applies ONLY to naive parsed datetimes
        # (reference util/time.py:187-192): UNIX epochs are absolute
        # instants, ISO strings may carry their own offset/Z, and
        # custom formats with a zone directive parse zone-aware —
        # shifting any of those would double-apply the zone. So the
        # shift is decided per-candidate, not on the coalesced result.
        shift = src_tz != "UTC"
        # explicit ISO offset at end of string: Z / +01 / +0100 / +01:00
        # — but only AFTER a time component: a date-only string like
        # '2024-06-01' ends in '-01' and must still count as naive.
        has_offset = src.cast("string").rlike(
            r"\d{2}:\d{2}(:\d{2}(\.\d+)?)?(Z|[+-]\d{2}(:?\d{2})?)$"
        )

        candidates = []
        for fmt in formats:
            if isinstance(dtype, T.TimestampType):
                candidates.append(src)
            elif fmt == "UNIX":
                # try_cast, not cast: under ANSI (Spark 4 default) a
                # non-numeric string would FAIL THE JOB instead of
                # falling through to the next format / failure tag
                num = src.cast("string").try_cast("double")
                secs = F.when(num > 1e11, num / 1000.0).otherwise(num)
                candidates.append(F.timestamp_seconds(secs))
            elif fmt == "ISO8601":
                parsed = F.try_to_timestamp(src.cast("string"))
                if shift:
                    parsed = F.when(has_offset, parsed).otherwise(
                        F.to_utc_timestamp(parsed, src_tz)
                    )
                candidates.append(parsed)
            else:
                parsed = F.try_to_timestamp(src.cast("string"), F.lit(fmt))
                # zone-aware pattern letters (X/x/Z/z/O/V) outside
                # quoted literals mean the parse already yields an
                # instant; only naive formats get the source-tz shift
                import re as _re

                naive = not _re.search(r"[XxZzOV]", _re.sub(r"'[^']*'", "", fmt))
                if shift and naive:
                    parsed = F.to_utc_timestamp(parsed, src_tz)
                candidates.append(parsed)
        ts = F.coalesce(*candidates) if len(candidates) > 1 else candidates[0]
        if tgt_tz != "UTC":
            ts = F.from_utc_timestamp(ts, tgt_tz)
        value = F.date_format(ts, ISO_FMT)
        target = cfg.get("target_field", "@timestamp")
        df = self.set_when(df, target, cond, value, overwrite=cfg.get("overwrite_target", True))
        # unparseable under every configured format -> failure tag
        return self.tag_failure(df, cond & src.isNotNull() & ts.isNull())
