"""SelectiveExtractor — project chosen fields to a side output.

Reference: /root/reference/logprep/processor/selective_extractor/
processor.py (source_fields extracted into a new event sent to a
configured output/topic; original event unchanged). Realized as a
filtered projection DataFrame — Catalyst prunes the scan to exactly
those columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor


class SelectiveExtractor(Processor):
    rule_type = "selective_extractor"

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        return df  # original events pass through untouched

    def extracted(self, df: DataFrame) -> dict[str, DataFrame]:
        """Per-output side DataFrames keyed by output name/topic."""
        outputs: dict[str, list[DataFrame]] = {}
        for rule in self.rules:
            cond = self.condition(df, rule)
            cfg = rule.config
            sources = list(cfg.get("source_fields", []))
            # reference rule.py extract_from_file: newline-separated
            # field list file, merged with source_fields
            extract_file = cfg.get("extract_from_file")
            if extract_file:
                import os

                if os.path.exists(extract_file):
                    with open(extract_file, encoding="utf-8") as fh:
                        sources.extend(
                            ln.strip() for ln in fh if ln.strip() and not ln.startswith("#")
                        )
            cols = []
            for path in sources:
                col = fld.get_field(df, path)
                if col is not None:
                    cols.append(col.alias(path.replace(".", "_")))
            if not cols:
                continue
            projected = df.filter(cond).select(*cols)
            for out in cfg.get("outputs", [{"default": "extracted"}]):
                for _, topic in out.items():
                    outputs.setdefault(topic, []).append(projected)
        merged = {}
        for topic, dfs in outputs.items():
            out = dfs[0]
            for other in dfs[1:]:
                out = out.unionByName(other, allowMissingColumns=True)
            merged[topic] = out
        return merged
