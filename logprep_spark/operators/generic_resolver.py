"""GenericResolver — map field values to outputs via a regex list.

Reference: /root/reference/logprep/processor/generic_resolver/
processor.py (``field_mapping`` source->target plus ``resolve_list``
{pattern: resolved} and/or ``resolve_from_file`` with templated
patterns). Realized as a ``CASE WHEN rlike`` chain — one codegen'd
expression; first matching pattern wins, like the reference's ordered
dict iteration.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor


class GenericResolver(Processor):
    rule_type = "generic_resolver"

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        resolve = dict(cfg.get("resolve_list", {}))
        from_file = cfg.get("resolve_from_file")
        if from_file:
            path = from_file["path"] if isinstance(from_file, dict) else from_file
            template = from_file.get("template", "^(.*)$") if isinstance(from_file, dict) else "^(.*)$"
            if os.path.exists(path):
                with open(path, "r", encoding="utf-8") as fh:
                    mapping = json.load(fh)
                for key, value in mapping.items():
                    resolve[template.replace("\\1", key)] = value
        # reference rule.py ignore_case: patterns match case-insensitively
        prefix = "(?i)" if cfg.get("ignore_case", False) else ""
        for source, target in cfg["field_mapping"].items():
            src = fld.get_field(df, source)
            if src is None:
                continue
            expr = None
            for pattern, resolved in resolve.items():
                clause = src.cast("string").rlike(prefix + pattern)
                expr = (
                    F.when(clause, F.lit(resolved))
                    if expr is None
                    else expr.when(clause, F.lit(resolved))
                )
            if expr is None:
                continue
            df = self.set_when(
                df, target, cond, expr, overwrite=cfg.get("overwrite_target", True)
            )
        return df
