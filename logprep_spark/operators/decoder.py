"""Decoder — parse field values from json / base64 / CLF / nginx.

Reference: /root/reference/logprep/processor/decoder/processor.py
(source_format: json | base64 | clf | nginx-ingress). Realized with
``from_json`` (schema-driven), ``unbase64``, and one combined-log-
format regex via ``regexp_extract`` — all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor

# Common Log Format:  host ident user [ts] "request" status size
CLF_REGEX = r'^(\S+) (\S+) (\S+) \[([^\]]+)\] "([^"]*)" (\d{3}) (\S+)'
_CLF_FIELDS = ["host", "ident", "user", "timestamp", "request", "status", "size"]

# nginx ingress:  CLF prefix + "referer" "agent" req_len req_time ...
NGINX_REGEX = CLF_REGEX + r' "([^"]*)" "([^"]*)"'
_NGINX_FIELDS = _CLF_FIELDS + ["referer", "agent"]


class Decoder(Processor):
    rule_type = "decoder"

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        fmt = cfg.get("source_format", "json")
        for source in cfg["source_fields"]:
            src = fld.get_field(df, source)
            if src is None:
                continue
            target = cfg.get("target_field", source)
            if fmt == "json":
                schema = cfg.get("json_schema")
                if schema is None:
                    schema = "map<string,string>"
                parsed = F.from_json(src.cast("string"), schema)
                df = self.set_when(df, target, cond, parsed)
                df = self.tag_failure(df, cond & src.isNotNull() & parsed.isNull())
            elif fmt == "base64":
                df = self.set_when(df, target, cond, F.unbase64(src).cast("string"))
            elif fmt in ("clf", "nginx"):
                regex = CLF_REGEX if fmt == "clf" else NGINX_REGEX
                names = _CLF_FIELDS if fmt == "clf" else _NGINX_FIELDS
                struct = F.struct(
                    *[
                        F.regexp_extract(src.cast("string"), regex, i + 1).alias(name)
                        for i, name in enumerate(names)
                    ]
                )
                df = self.set_when(df, target, cond, struct)
                df = self.tag_failure(
                    df, cond & src.isNotNull() & ~src.cast("string").rlike(regex)
                )
            else:
                raise ValueError(f"unknown source_format {fmt!r}")
        return df
