r"""Dissector — tokenize strings by dissect patterns (no user regex).

Reference: /root/reference/logprep/processor/dissector/processor.py and
rule.py: pattern ``%{target}SEP%{other}`` splits a source string at the
literal separators; ``%{}`` skips; ``%{field-( )}`` strips padding;
``convert_datatype`` casts extracted values.

Spark realization: the dissect pattern compiles ONCE into a single
anchored regex (separators escaped, captures non-greedy, final capture
greedy); each target field is one ``regexp_extract`` over that regex —
all inside codegen. This keeps logstash-dissect's "no user regex"
ergonomics while using the engine's native regex executor.

Not yet covered from the reference: append (``+``) and indirect-field
(``?``/``&``) notations.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor

_SEGMENT = re.compile(r"%\{([^}]*)\}")

_CASTS = {"int": "long", "float": "double", "string": "string", "bool": "boolean"}


def compile_dissect(pattern: str) -> tuple[str, list[tuple[str, int, str | None]]]:
    """Compile a dissect pattern to ``(regex, [(target, group_idx,
    append_sep)])``. ``append_sep`` is None for plain assignment, the
    separator for ``%{+field}`` / ``%{+(sep)field}`` appends. Indirect
    notation (``?``/``&``) implies per-row dynamic column names —
    unrepresentable in a static schema — and is rejected."""
    regex_parts = ["^"]
    targets: list[tuple[str, int, str | None]] = []
    group = 0
    pos = 0
    segments = list(_SEGMENT.finditer(pattern))
    for i, seg in enumerate(segments):
        literal = pattern[pos : seg.start()]
        regex_parts.append(re.escape(literal))
        spec = seg.group(1)
        append_sep = None
        if spec.startswith("+"):
            spec = spec[1:]
            sep_match = re.match(r"^\((.*?)\)(.*)$", spec)
            if sep_match:
                append_sep, spec = sep_match.group(1), sep_match.group(2)
            else:
                append_sep = ""
        if spec.startswith(("?", "&")):
            raise ValueError(
                "dissect indirect notation (?/&) needs per-row dynamic "
                "column names; not supported in a static schema"
            )
        pad = None
        pad_match = re.match(r"^(.*?)-\((.)\)$", spec)
        if pad_match:
            spec, pad = pad_match.group(1), pad_match.group(2)
        greedy = i == len(segments) - 1 and seg.end() == len(pattern)
        capture = "(.*)" if greedy else "(.*?)"
        if spec == "":
            regex_parts.append(capture.replace("(", "(?:", 1))
        else:
            group += 1
            regex_parts.append(capture)
            targets.append((spec, group, append_sep))
        if pad is not None:
            regex_parts.append(re.escape(pad) + "*")
        pos = seg.end()
    regex_parts.append(re.escape(pattern[pos:]))
    regex_parts.append("$")
    return "".join(regex_parts), targets


class Dissector(Processor):
    rule_type = "dissector"

    @staticmethod
    def _append(df: DataFrame, target: str, cond, value, sep: str) -> DataFrame:
        """``%{+field}``: list targets get the value appended as an
        element; scalar targets get string-concatenated with ``sep``;
        absent targets are plain assignments."""
        from pyspark.sql import types as T

        existing = fld.get_field(df, target)
        etype = fld.field_type(df.schema, target)
        if existing is None:
            out = F.when(cond, value)
        elif isinstance(etype, T.ArrayType):
            appended = F.concat(
                F.coalesce(existing, F.array()),
                F.array(value.cast(etype.elementType)),
            )
            out = F.when(cond, appended).otherwise(existing)
        else:
            joined = F.concat_ws(sep, existing.cast("string"), value.cast("string"))
            out = F.when(cond, joined).otherwise(existing)
        return fld.set_field(df, target, out)

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        converts = {k: _CASTS[v] for k, v in cfg.get("convert_datatype", {}).items()}
        extracted: set[str] = set()
        for source, pattern in cfg.get("mapping", {}).items():
            src = fld.get_field(df, source)
            if src is None:
                continue
            regex, targets = compile_dissect(pattern)
            for target, group, append_sep in targets:
                value = F.regexp_extract(src.cast("string"), regex, group)
                if target in converts:
                    value = value.cast(converts[target])
                extracted.add(target)
                if append_sep is not None:
                    df = self._append(df, target, cond, value, append_sep)
                else:
                    df = self.set_when(df, target, cond, value)
        # convert_datatype may also apply to existing (non-extracted) fields
        for target, cast_to in converts.items():
            if target in extracted:
                continue
            col = fld.get_field(df, target)
            if col is not None:
                df = self.set_when(df, target, cond, col.cast(cast_to))
        return df
