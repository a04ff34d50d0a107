"""Clusterer — log signature extraction for grouping similar logs.

Reference: /root/reference/logprep/processor/clusterer/processor.py
(rules carry substitution regexes that strip the dynamic parts of a
message; the remaining constant skeleton is the cluster signature,
prefixed with syslog facility/severity when present).

Realized as a chain of ``regexp_replace`` ops producing a
``cluster_signature`` column — then grouping by signature is a normal
hash aggregation that AQE handles at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor

# default dynamic-part scrubbers (numbers, hex ids, ips, quoted data)
DEFAULT_SUBSTITUTIONS: list[tuple[str, str]] = [
    (r"(?:\d{1,3}\.){3}\d{1,3}(?::\d+)?", "<ip>"),
    (r"\b0x[0-9a-fA-F]+\b", "<hex>"),
    (r"\b[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}\b", "<uuid>"),
    (r"\b\d+\b", "<num>"),
    (r'"[^"]*"', "<str>"),
    (r"\s+", " "),
]


class Clusterer(Processor):
    rule_type = "clusterer"

    def __init__(self, rules=None, source_field: str = "message", **kw):
        super().__init__(rules, **kw)
        self.source_field = source_field

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        source = cfg.get("source_fields", [self.source_field])[0]
        src = fld.get_field(df, source)
        if src is None:
            return df
        sig = src.cast("string")
        if "pattern" in cfg:
            # reference rule syntax (rule.py:129-132): one pattern/repl
            # pair applied with re.sub semantics; the signature engine
            # loops subn until stable (signature_phase.py:96-101), so a
            # second pass covers matches the first pass creates.
            import re as _re

            repl = _re.sub(r"\\(\d)", r"$\1", cfg.get("repl", ""))
            substitutions = [(cfg["pattern"], repl)] * 2
        else:
            substitutions = cfg.get("substitutions") or DEFAULT_SUBSTITUTIONS
        for pattern, repl in substitutions:
            sig = F.regexp_replace(sig, pattern, repl)
        sig = F.trim(sig)
        # prefix with syslog facility / severity when the event has them
        facility = fld.get_field(df, "syslog.facility")
        severity = fld.get_field(df, "event.severity")
        if facility is not None and severity is not None:
            sig = F.concat_ws(
                " ", facility.cast("string"), severity.cast("string"), sig
            )
        target = cfg.get("target_field", "cluster_signature")
        return self.set_when(df, target, cond, sig)

    @staticmethod
    def clusters(df: DataFrame, signature_field: str = "cluster_signature") -> DataFrame:
        """Aggregate events per signature (count + example)."""
        return df.groupBy(signature_field).agg(
            F.count(F.lit(1)).alias("cluster_size"),
        )
