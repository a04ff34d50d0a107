"""AST nodes for the Lucene-style rule filter language.

Semantics follow the reference's expression set
(``/root/reference/logprep/filter/expression/filter_expression.py``):
Always, Not, And, Or, string/int/float equality, wildcard, sigma
(case-insensitive wildcard), regex, typed ranges, Exists, Null.
The realization differs: these nodes compile to Catalyst ``Column``
predicates (see compiler.py), not per-document Python matching.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Node:
    pass


@dataclass
class Always(Node):
    value: bool


@dataclass
class Not(Node):
    child: Node


@dataclass
class And(Node):
    children: list[Node] = field(default_factory=list)


@dataclass
class Or(Node):
    children: list[Node] = field(default_factory=list)


@dataclass
class Exists(Node):
    key: str


@dataclass
class Null(Node):
    key: str


@dataclass
class StringEq(Node):
    key: str
    value: str


@dataclass
class IntEq(Node):
    key: str
    value: int


@dataclass
class FloatEq(Node):
    key: str
    value: float


@dataclass
class Wildcard(Node):
    key: str
    pattern: str  # raw pattern containing * / ?
    case_insensitive: bool = False


@dataclass
class Regex(Node):
    key: str
    pattern: str


@dataclass
class Range(Node):
    key: str
    low: int | float | str
    high: int | float | str
    include_low: bool = True
    include_high: bool = True
