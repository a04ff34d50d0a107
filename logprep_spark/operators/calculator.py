"""Calculator — arithmetic over field-templated expressions.

Reference: /root/reference/logprep/processor/calculator/processor.py and
rule.py (``calc: ${duration} * 10e5``). The reference evaluates the
expression per event in Python; here the template compiles once into a
native Catalyst arithmetic ``Column`` (codegen, no Python per row).

Supported: + - * / % ^ (power), unary minus, parens, numeric literals,
``${dotted.field}`` references (cast to double).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor

_TOKEN = re.compile(
    r"\s*(?:(?P<num>\d+\.?\d*(?:[eE][+-]?\d+)?)|(?P<field>\$\{[^}]+\})|(?P<op>[-+*/%^()]))"
)


class CalcParseError(ValueError):
    pass


def _tokenize(expr: str):
    pos, out = 0, []
    while pos < len(expr):
        m = _TOKEN.match(expr, pos)
        if not m or m.end() == pos:
            if expr[pos:].strip():
                raise CalcParseError(f"bad calc expression at {expr[pos:]!r}")
            break
        pos = m.end()
        if m.lastgroup == "num":
            out.append(("num", float(m.group("num"))))
        elif m.lastgroup == "field":
            out.append(("field", m.group("field")[2:-1]))
        else:
            out.append(("op", m.group("op")))
    return out


def compile_calc(expr: str, df: DataFrame) -> Column:
    """Compile a ``calc`` template into a Column (fields cast to double)."""
    tokens = _tokenize(expr)
    pos = 0

    def peek():
        return tokens[pos] if pos < len(tokens) else (None, None)

    def eat():
        nonlocal pos
        tok = peek()
        pos += 1
        return tok

    def atom() -> Column:
        kind, val = eat()
        if kind == "num":
            return F.lit(val)
        if kind == "field":
            col = fld.get_field(df, val)
            if col is None:
                return F.lit(None).cast("double")
            return col.cast("double")
        if (kind, val) == ("op", "("):
            node = add_sub()
            if peek() != ("op", ")"):
                raise CalcParseError("unbalanced parens")
            eat()
            return node
        if (kind, val) == ("op", "-"):
            return -atom()
        raise CalcParseError(f"unexpected token {val!r}")

    def power() -> Column:
        base = atom()
        if peek() == ("op", "^"):
            eat()
            return F.pow(base, power())  # right-assoc
        return base

    def mul_div() -> Column:
        node = power()
        while peek()[0] == "op" and peek()[1] in "*/%":
            _, op = eat()
            rhs = power()
            node = node * rhs if op == "*" else node / rhs if op == "/" else node % rhs
        return node

    def add_sub() -> Column:
        node = mul_div()
        while peek()[0] == "op" and peek()[1] in "+-":
            _, op = eat()
            rhs = mul_div()
            node = node + rhs if op == "+" else node - rhs
        return node

    out = add_sub()
    if pos != len(tokens):
        raise CalcParseError(f"trailing tokens in calc: {tokens[pos:]}")
    return out


class Calculator(Processor):
    rule_type = "calculator"

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        value = compile_calc(cfg["calc"], df)
        return self.set_when(
            df, cfg["target_field"], cond, value, overwrite=cfg.get("overwrite_target", True)
        )
