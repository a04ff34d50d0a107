"""ListComparison — check field values against allow/deny lists.

Reference: /root/reference/logprep/processor/list_comparison/
processor.py (source field value compared against named list files;
result written as ``target_field.in_list`` / ``not_in_list``).

Realized with ``isin`` for in-rule lists (becomes a codegen'd IN /
InSet). At 100 TB a huge list would be a ``broadcast`` join instead —
``as_join`` exposes that path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor


def _load_list(path: str) -> list[str]:
    with open(path, "r", encoding="utf-8") as fh:
        return [ln.strip() for ln in fh if ln.strip() and not ln.startswith("#")]


class ListComparison(Processor):
    rule_type = "list_comparison"

    def __init__(self, rules=None, list_search_base_path: str = "", **kw):
        super().__init__(rules, **kw)
        self.base_path = list_search_base_path

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        src = fld.get_field(df, cfg["check_field"]) if "check_field" in cfg else fld.get_field(
            df, cfg["source_fields"][0]
        )
        if src is None:
            return df
        target = cfg["target_field"]
        lists: dict[str, list[str]] = {}
        for item in cfg.get("list_file_paths", []):
            path = item if os.path.isabs(item) else os.path.join(self.base_path, item)
            name = os.path.splitext(os.path.basename(path))[0]
            lists[name] = _load_list(path) if os.path.exists(path) else []
        for name, values in cfg.get("lists", {}).items():
            lists[name] = list(values)

        in_list_names = []
        for name, values in lists.items():
            in_list_names.append(F.when(src.cast("string").isin(values), F.lit(name)))
        matched = F.array_compact(F.array(*in_list_names)) if in_list_names else F.array()
        df = self.set_when(df, f"{target}.in_list", cond, F.when(F.size(matched) > 0, matched))
        all_names = F.array(*[F.lit(n) for n in lists])
        df = self.set_when(
            df,
            f"{target}.not_in_list",
            cond,
            F.when(F.size(matched) < len(lists), F.array_except(all_names, matched)),
        )
        return df
