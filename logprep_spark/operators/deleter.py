"""Deleter — drop whole events from the pipeline.

Reference: /root/reference/logprep/processor/deleter/processor.py
(rule ``delete: true`` removes matching events). Realized as a native
anti-filter, which Catalyst pushes down to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logprep_spark.operators.base import Processor


class Deleter(Processor):
    rule_type = "deleter"

    def transform(self, df: DataFrame) -> DataFrame:
        # Deleter never mutates fields, so it skips the base class's
        # staged-cond column (whose coalesce(cond, false) wrapper is
        # there to freeze match decisions against self-mutation — and
        # which blocks parquet pushdown). The raw filter in
        # isNull-OR-negation form keeps null-safe semantics (null
        # cond = no-match = keep) AND stays pushdown-eligible:
        # Or(IsNull(col), Not(EqualTo(col, v))) reaches the reader
        # where NOT coalesce(...) pushes nothing (query-lint finding).
        from logprep_spark.filters import ast as fast
        from logprep_spark.filters.compiler import compile_filter
        from logprep_spark.filters.parser import parse_filter

        for rule in self.rules:
            if rule.config.get("delete", True):
                node = parse_filter(rule.filter, rule.regex_fields, rule.sigma_fields)
                # negate at the AST level so the compiler's leaf
                # peephole emits the column-level Or(IsNull, Not(=))
                df = df.filter(compile_filter(fast.Not(node), df))
        return df

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        if cfg.get("delete", True):
            return df.filter(cond.isNull() | ~cond)
        return df
