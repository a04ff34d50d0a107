"""NetworkComparison — match IPs against CIDR network lists.

Reference: /root/reference/logprep/processor/network_comparison/
processor.py (source field IPs vs network lists from files/inline;
result to ``target_field.in_network``/``not_in_network``). Realized as
native shift/compare bit math per CIDR — an OR chain of codegen'd
comparisons (list files are small; a huge feed would become a
broadcast range join on (net_start, net_end)).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logprep_spark import fields as fld
from logprep_spark.operators import ip_utils
from logprep_spark.operators.base import Processor


class NetworkComparison(Processor):
    rule_type = "network_comparison"

    def __init__(self, rules=None, list_search_base_path: str = "", **kw):
        super().__init__(rules, **kw)
        self.base_path = list_search_base_path

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        src = fld.get_field(df, cfg["source_fields"][0])
        if src is None:
            return df
        networks: dict[str, list[str]] = dict(cfg.get("networks", {}))
        for item in cfg.get("list_file_paths", []):
            path = item if os.path.isabs(item) else os.path.join(self.base_path, item)
            name = os.path.splitext(os.path.basename(path))[0]
            if os.path.exists(path):
                with open(path, "r", encoding="utf-8") as fh:
                    networks[name] = [
                        ln.strip() for ln in fh if ln.strip() and not ln.startswith("#")
                    ]
        matched_names = []
        for name, cidrs in networks.items():
            hit = None
            for cidr in cidrs:
                # family-dispatching: v6 CIDRs match v6 addresses via
                # the hex-key BETWEEN, v4 via bit math
                test = ip_utils.in_cidr_any(src, cidr)
                hit = test if hit is None else (hit | test)
            if hit is not None:
                matched_names.append(F.when(hit, F.lit(name)))
        matched = F.array_compact(F.array(*matched_names)) if matched_names else F.array()
        target = cfg["target_field"]
        df = self.set_when(df, f"{target}.in_network", cond, F.when(F.size(matched) > 0, matched))
        all_names = F.array(*[F.lit(n) for n in networks])
        df = self.set_when(
            df,
            f"{target}.not_in_network",
            cond,
            F.when(F.size(matched) < len(networks), F.array_except(all_names, matched)),
        )
        return df
