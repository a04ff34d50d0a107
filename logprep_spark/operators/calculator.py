"""Calculator — arithmetic over field-templated expressions.

Reference: /root/reference/logprep/processor/calculator/processor.py
and fourFn.py (``calc: ${duration} * 10e5``). The reference evaluates
each event's expression in Python; here the template compiles once
into a native Catalyst ``Column`` (codegen, no Python per row).

Grammar parity with fourFn.py: + - * / ^ (power, right-assoc), one
optional comparison (> < >= <= == !=, not chained), unary minus,
parens, PI/E constants, functions sin cos tan exp abs trunc round
(half-even, like Python) sgn (epsilon-banded) from_hex multiply hypot
all, ``${dotted.field}`` references. ``%`` modulo is a superset
extension.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor

_EPSILON = 1e-12

_TOKEN = re.compile(
    r"\s*(?:"
    r"(?P<num>\d+\.?\d*(?:[eE][+-]?\d+)?)"
    r"|(?P<field>\$\{[^}]+\})"
    r"|(?P<cmp>>=|<=|==|!=|>|<)"
    r"|(?P<name>[A-Za-z_][A-Za-z_0-9]*)"
    r"|(?P<op>[-+*/%^(),])"
    r")"
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
        elif m.lastgroup == "cmp":
            out.append(("cmp", m.group("cmp")))
        elif m.lastgroup == "name":
            out.append(("name", m.group("name")))
        else:
            out.append(("op", m.group("op")))
    return out


def _sgn(col: Column) -> Column:
    return (
        F.when(col < -_EPSILON, F.lit(-1))
        .when(col > _EPSILON, F.lit(1))
        .otherwise(F.lit(0))
    )


_FN_1 = {
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,
    "exp": F.exp,
    "abs": F.abs,
    # int() truncates toward zero; double->long cast does too
    "trunc": lambda c: c.cast("long"),
    # Python round() is banker's rounding -> HALF_EVEN
    "round": lambda c: F.bround(c).cast("long"),
    "sgn": _sgn,
}

_CMP = {
    ">": lambda a, b: a > b,
    "<": lambda a, b: a < b,
    ">=": lambda a, b: a >= b,
    "<=": lambda a, b: a <= b,
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
}


def compile_calc(expr: str, df: DataFrame) -> Column:
    """Compile a ``calc`` template into a Column (fields cast to
    double, except string-consuming functions like from_hex)."""
    tokens = _tokenize(expr)
    pos = 0

    def peek():
        return tokens[pos] if pos < len(tokens) else (None, None)

    def eat():
        nonlocal pos
        tok = peek()
        pos += 1
        return tok

    def field_col(path: str, as_string: bool = False) -> Column:
        col = fld.get_field(df, path)
        if col is None:
            return F.lit(None).cast("string" if as_string else "double")
        return col.cast("string") if as_string else col.cast("double")

    def fn_call(name: str) -> Column:
        if peek() != ("op", "("):
            if name == "PI":
                return F.lit(math.pi)
            if name == "E":
                return F.lit(math.e)
            raise CalcParseError(f"unknown constant {name!r}")
        eat()
        args: list[Column] = []
        if peek() != ("op", ")"):
            args.append(comparison())
            while peek() == ("op", ","):
                eat()
                args.append(comparison())
        if peek() != ("op", ")"):
            raise CalcParseError(f"unbalanced parens in {name}()")
        eat()
        if name in _FN_1:
            if len(args) != 1:
                raise CalcParseError(f"{name}() takes one argument")
            return _FN_1[name](args[0])
        if name == "from_hex":
            raise CalcParseError("from_hex handled in atom")  # pragma: no cover
        if name == "multiply":
            if len(args) != 2:
                raise CalcParseError("multiply() takes two arguments")
            return args[0] * args[1]
        if name == "hypot":
            if len(args) != 2:
                raise CalcParseError("hypot() takes two arguments")
            return F.hypot(args[0], args[1])
        if name == "all":
            if not args:
                raise CalcParseError("all() needs arguments")
            out = args[0].cast("boolean")
            for a in args[1:]:
                out = out & a.cast("boolean")
            return out
        raise CalcParseError(f"unknown function {name!r}")

    def from_hex_call() -> Column:
        # from_hex consumes its field/literal as a STRING
        if eat() != ("op", "("):
            raise CalcParseError("from_hex needs parens")
        kind, val = eat()
        if kind == "field":
            arg = field_col(val, as_string=True)
        elif kind == "num":
            arg = F.lit(str(int(val)))
        else:
            raise CalcParseError("from_hex takes a field or literal")
        if eat() != ("op", ")"):
            raise CalcParseError("unbalanced parens in from_hex()")
        return F.conv(F.regexp_replace(arg, r"^0[xX]", ""), 16, 10).cast("long")

    def atom() -> Column:
        kind, val = eat()
        if kind == "num":
            return F.lit(val)
        if kind == "field":
            return field_col(val)
        if kind == "name":
            if val == "from_hex":
                return from_hex_call()
            return fn_call(val)
        if (kind, val) == ("op", "("):
            node = comparison()
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

    def comparison() -> Column:
        node = add_sub()
        if peek()[0] == "cmp":  # at most one; not chained (fourFn parity)
            _, op = eat()
            node = _CMP[op](node, add_sub())
        return node

    out = comparison()
    if pos != len(tokens):
        raise CalcParseError(f"trailing tokens in calc: {tokens[pos:]}")
    return out


class Calculator(Processor):
    rule_type = "calculator"

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        from pyspark.sql import types as T

        value = compile_calc(cfg["calc"], df)
        target = cfg["target_field"]
        etype = fld.field_type(df.schema, target)
        merge = cfg.get("merge_with_target") or cfg.get("extend_target_list")
        if merge and isinstance(etype, T.ArrayType):
            existing = fld.get_field(df, target)
            value = F.concat(
                F.coalesce(existing, F.array()),
                F.array(value.cast(etype.elementType)),
            )
        # missing source field -> null result -> skip the write (the
        # reference tags a missing-field warning and leaves the event)
        df = self.set_when(
            df,
            target,
            cond & value.isNotNull(),
            value,
            overwrite=cfg.get("overwrite_target", True),
        )
        if cfg.get("delete_source_fields"):
            for path in re.findall(r"\$\{([^}]+)\}", cfg["calc"]):
                if path != target:
                    df = self.delete_when(df, path, cond)
        return df
