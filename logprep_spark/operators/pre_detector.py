"""PreDetector — emit detection alerts for matching events.

Reference: /root/reference/logprep/processor/pre_detector/processor.py
(rule carries id/title/severity/mitre/case_condition; matching events
produce an alert event with those fields plus the event's timestamp
and a ``pre_detection_id``; the original event gets the id too).

Realized as: alerts = filtered projection with rule constants as
literal columns; ``pre_detection_id`` is a deterministic sha2 of the
rule id + event identity (the reference uses a random uuid — a
deterministic id is the distributed-friendly equivalent and keeps
retries idempotent at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor


class PreDetector(Processor):
    rule_type = "pre_detector"

    def __init__(self, rules=None, id_fields: list[str] | None = None, **kw):
        super().__init__(rules, **kw)
        self.id_fields = id_fields or []

    def _detection_id(self, df: DataFrame, rule_id):
        ids = [fld.get_field(df, f) for f in self.id_fields]
        ids = [c.cast("string") for c in ids if c is not None]
        return F.sha2(F.concat_ws("|", F.lit(str(rule_id)), *ids), 256)

    def transform(self, df: DataFrame) -> DataFrame:
        for rule in self.rules:
            cond = self.condition(df, rule)
            df = self.set_when(
                df, "pre_detection_id", cond, self._detection_id(df, rule.config.get("id"))
            )
        return df

    def detections_bulk(
        self, df: DataFrame, timestamp_field: str = "@timestamp"
    ) -> DataFrame:
        """Alert side-output through the many-rules dispatch table
        (operators/dispatch.py): ONE scan + explode(matched ids) + one
        broadcast join against the N-row rule-payload table, where
        ``detections`` unions N filtered projections (N FileScans — a
        1000-branch plan at SIEM rule counts). Same rows/columns as
        ``detections`` (pytest witness in test_rule_dispatch.py)."""
        from logprep_spark.operators.dispatch import pre_detector_alerts

        return pre_detector_alerts(self, df, timestamp_field)

    def detections(self, df: DataFrame, timestamp_field: str = "@timestamp") -> DataFrame:
        """Side-output alert stream."""
        outs = []
        for rule in self.rules:
            cond = self.condition(df, rule)
            cfg = rule.config
            ts = fld.get_field(df, timestamp_field)
            cols = [
                self._detection_id(df, cfg.get("id")).alias("pre_detection_id"),
                F.lit(str(cfg.get("id", ""))).alias("rule_id"),
                F.lit(cfg.get("title", "")).alias("title"),
                F.lit(cfg.get("severity", "")).alias("severity"),
                F.lit(cfg.get("case_condition", "directly")).alias("case_condition"),
                F.array(*[F.lit(m) for m in cfg.get("mitre", [])]).alias("mitre"),
            ]
            # reference rule.py `link`: a case-documentation URL carried
            # into every detection event of the rule
            if cfg.get("link"):
                cols.append(F.lit(str(cfg["link"])).alias("link"))
            if ts is not None:
                cols.append(ts.cast("string").alias("@timestamp"))
            for host_field in cfg.get("ip_fields", []):
                col = fld.get_field(df, host_field)
                if col is not None:
                    cols.append(col.alias(host_field.replace(".", "_")))
            # reference rule.py copy_fields_to_detection_event:
            # {event_field: detection_field} copied verbatim
            for src_field, det_field in (cfg.get("copy_fields_to_detection_event") or {}).items():
                col = fld.get_field(df, src_field)
                if col is not None:
                    cols.append(col.alias(det_field))
            outs.append(df.filter(cond).select(*cols))
        if not outs:
            raise ValueError("pre_detector has no rules")
        out = outs[0]
        for other in outs[1:]:
            out = out.unionByName(other, allowMissingColumns=True)
        return out
