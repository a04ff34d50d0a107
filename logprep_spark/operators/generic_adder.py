"""GenericAdder — add constant fields/values to matching events.

Reference: /root/reference/logprep/processor/generic_adder/processor.py
(``add`` mapping and/or ``add_from_file`` yaml lists). Constants are
Catalyst literals; a large enrichment table would instead become a
``broadcast`` join (see template_replacer.py for that pattern).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logprep_spark.operators.base import Processor


def _load_add_file(path: str) -> dict:
    with open(path, "r", encoding="utf-8") as fh:
        text = fh.read()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        # minimal "key: value" per-line yaml subset (no yaml lib dependency)
        out = {}
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith("#") or ":" not in line:
                continue
            key, _, value = line.partition(":")
            out[key.strip()] = value.strip().strip("'\"")
        return out


class GenericAdder(Processor):
    rule_type = "generic_adder"

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        add = dict(cfg.get("add", {}))
        for path in cfg.get("add_from_file", []) if isinstance(cfg.get("add_from_file"), list) else (
            [cfg["add_from_file"]] if cfg.get("add_from_file") else []
        ):
            if os.path.exists(path):
                add.update(_load_add_file(path))
                if cfg.get("only_first_existing_file", False):
                    break
        overwrite = bool(cfg.get("overwrite_target", cfg.get("merge_with_target", False)))
        for target, value in add.items():
            df = self.set_when(df, target, cond, F.lit(value), overwrite=overwrite or True)
        return df
