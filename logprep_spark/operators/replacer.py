"""Replacer — replace parts of strings by template.

Reference: /root/reference/logprep/processor/replacer/processor.py
(rule ``mapping: {field: "prefix %{replacement} suffix"}`` — the
``%{...}`` marks what the wildcard region is replaced WITH; ``%{}``
deletes the region; ``*`` inside keeps original). Core subset realized
with ``regexp_replace``: the template's literal context is compiled to
a regex with a wildcard gap, and the gap is rewritten to the
replacement.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor

_GAP = re.compile(r"%\{([^}]*)\}")


def compile_replacement(template: str) -> tuple[str, str]:
    """Compile a replacer template into (match_regex, rewrite)."""
    pos = 0
    group = 0
    pattern_parts: list[str] = []
    rewrite_parts: list[str] = []
    for seg in _GAP.finditer(template):
        literal = template[pos : seg.start()]
        pattern_parts.append(re.escape(literal))
        rewrite_parts.append(literal.replace("\\", "\\\\").replace("$", "\\$"))
        pattern_parts.append("(.*?)" if seg.end() < len(template) else "(.*)")
        group += 1
        repl = seg.group(1)
        rewrite_parts.append(
            f"${group}" if repl == "*" else repl.replace("\\", "\\\\").replace("$", "\\$")
        )
        pos = seg.end()
    tail = template[pos:]
    pattern_parts.append(re.escape(tail))
    rewrite_parts.append(tail.replace("\\", "\\\\").replace("$", "\\$"))
    return "^" + "".join(pattern_parts) + "$", "".join(rewrite_parts)


class Replacer(Processor):
    rule_type = "replacer"

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        for path, template in cfg["mapping"].items():
            src = fld.get_field(df, path)
            if src is None:
                continue
            pattern, rewrite = compile_replacement(template)
            value = F.regexp_replace(src.cast("string"), pattern, rewrite)
            target = cfg.get("target_field", path)
            df = self.set_when(df, target, cond, value)
        return df
