r"""Recursive-descent parser for the Lucene-style filter language.

Grammar (reference behavior documented in
``/root/reference/logprep/filter/lucene_filter.py`` module docstring):

    expr      := or_expr
    or_expr   := and_expr ( OR and_expr )*
    and_expr  := unary ( AND unary )*          # adjacency == AND
    unary     := NOT unary | '(' expr ')' | term
    term      := '*'                            -> Always(True)
               | key                            -> Exists
               | key ':' value

    value     := '*'                            -> Exists
               | 'null' / 'NULL'               -> Null
               | range '[..]' / '{..}'         -> typed Range
               | quoted string                  -> StringEq / Wildcard
               | bare token                     -> Int/Float/StringEq/Wildcard

Keys are dotted paths; ``\``-escapes in keys/values are honored
(``\*`` is a literal asterisk, not a wildcard). Keys listed in
``regex_fields`` parse their value as a regex; ``sigma_fields`` get
case-insensitive wildcard matching — mirroring the reference's
``special_fields`` handling.
"""

from __future__ import annotations

import re

from logprep_spark.filters import ast


def _special(key, fields) -> bool:
    return fields is True or key in fields


class FilterParseError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<colon>:)
      | (?P<quoted>"(?:\\.|[^"\\])*")
      | (?P<range>[\[{](?:\\.|[^\]}])*?\s+TO\s+(?:\\.|[^\]}])*?[\]}])
      | (?P<regexval>/(?:\\.|[^/\\])*/)
      | (?P<word>(?:\\.|[^\s:()\[\]{}"])+)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "NOT", "TO"}


def _tokenize(text: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        match = _TOKEN_RE.match(text, pos)
        if match is None or match.end() == pos:
            remainder = text[pos:].strip()
            if not remainder:
                break
            raise FilterParseError(f"cannot tokenize filter at: {remainder!r}")
        pos = match.end()
        kind = match.lastgroup
        if kind is None:
            continue
        tokens.append((kind, match.group(kind)))
    return tokens


def _unescape(value: str) -> str:
    return re.sub(r"\\(.)", r"\1", value)


_HAS_WILDCARD = re.compile(r"(?<!\\)[*?]")


class _Parser:
    def __init__(self, tokens, regex_fields, sigma_fields):
        self.tokens = tokens
        self.pos = 0
        # True -> every field is special (reference boolean form)
        self.regex_fields = regex_fields if regex_fields is True else set(regex_fields or [])
        self.sigma_fields = sigma_fields if sigma_fields is True else set(sigma_fields or [])

    def peek(self):
        return self.tokens[self.pos] if self.pos < len(self.tokens) else (None, None)

    def next(self):
        tok = self.peek()
        self.pos += 1
        return tok

    def parse(self) -> ast.Node:
        node = self.or_expr()
        if self.pos != len(self.tokens):
            raise FilterParseError(f"trailing tokens: {self.tokens[self.pos:]}")
        return node

    def or_expr(self) -> ast.Node:
        children = [self.and_expr()]
        while self.peek() == ("word", "OR"):
            self.next()
            children.append(self.and_expr())
        return children[0] if len(children) == 1 else ast.Or(children)

    def and_expr(self) -> ast.Node:
        children = [self.unary()]
        while True:
            kind, val = self.peek()
            if (kind, val) == ("word", "AND"):
                self.next()
                children.append(self.unary())
            elif kind in ("word", "quoted", "lparen") and val != "OR":
                # implicit AND on adjacency
                children.append(self.unary())
            else:
                break
        return children[0] if len(children) == 1 else ast.And(children)

    def unary(self) -> ast.Node:
        kind, val = self.peek()
        if (kind, val) == ("word", "NOT"):
            self.next()
            return ast.Not(self.unary())
        if kind == "lparen":
            self.next()
            node = self.or_expr()
            if self.peek()[0] != "rparen":
                raise FilterParseError("unbalanced parenthesis")
            self.next()
            return node
        return self.term()

    def term(self) -> ast.Node:
        kind, val = self.next()
        if kind == "quoted":
            raise FilterParseError(f"quoted token {val} cannot start a term")
        if kind != "word":
            raise FilterParseError(f"unexpected token {val!r}")
        if val == "*":
            return ast.Always(True)
        if val in _KEYWORDS:
            raise FilterParseError(f"unexpected keyword {val}")
        key = _unescape(val)
        if self.peek()[0] != "colon":
            return ast.Exists(key)
        self.next()
        return self.value_term(key)

    def value_term(self, key: str) -> ast.Node:
        kind, val = self.next()
        if kind == "range":
            return self._range(key, val)
        if kind == "regexval" or _special(key, self.regex_fields):
            pattern = val[1:-1] if kind == "regexval" else self._raw_value(kind, val)
            return ast.Regex(key, pattern)
        if kind == "quoted":
            inner = _unescape(val[1:-1])
            raw = val[1:-1]
            if _HAS_WILDCARD.search(raw) or _special(key, self.sigma_fields):
                return self._wildcard(key, raw)
            return ast.StringEq(key, inner)
        if kind == "word":
            if val == "*":
                return ast.Exists(key)
            if val in ("null", "NULL"):
                return ast.Null(key)
            if _HAS_WILDCARD.search(val) or _special(key, self.sigma_fields):
                return self._wildcard(key, val)
            text = _unescape(val)
            if re.fullmatch(r"[+-]?\d+", text):
                return ast.IntEq(key, int(text))
            if re.fullmatch(r"[+-]?(\d+\.\d*|\.\d+)([eE][+-]?\d+)?", text):
                return ast.FloatEq(key, float(text))
            return ast.StringEq(key, text)
        raise FilterParseError(f"unexpected value token {val!r}")

    def _raw_value(self, kind, val):
        if kind == "quoted":
            return _unescape(val[1:-1])
        return _unescape(val)

    def _wildcard(self, key: str, raw: str) -> ast.Node:
        return ast.Wildcard(key, raw, case_insensitive=_special(key, self.sigma_fields))

    def _range(self, key: str, val: str) -> ast.Node:
        include_low = val[0] == "["
        include_high = val[-1] == "]"
        body = val[1:-1]
        match = re.match(r"^\s*(.+?)\s+TO\s+(.+?)\s*$", body)
        if match is None:
            raise FilterParseError(f"bad range: {val}")
        low_s, high_s = match.group(1), match.group(2)

        def typed(s: str):
            if re.fullmatch(r"[+-]?\d+", s):
                return int(s)
            if re.fullmatch(r"[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?", s):
                return float(s)
            return _unescape(s.strip('"'))

        low, high = typed(low_s), typed(high_s)
        if type(low) is not type(high):
            if isinstance(low, (int, float)) and isinstance(high, (int, float)):
                low, high = float(low), float(high)
            else:
                raise FilterParseError(f"mixed-type range not supported: {val}")
        return ast.Range(key, low, high, include_low, include_high)


def parse_filter(
    text: str,
    regex_fields: list[str] | None = None,
    sigma_fields: list[str] | None = None,
) -> ast.Node:
    """Parse a rule filter string into an AST.

    ``regex_fields`` / ``sigma_fields`` mirror the reference's
    ``special_fields`` (lucene_filter.py:343-349).
    """
    text = text.strip()
    if not text:
        return ast.Always(False)
    tokens = _tokenize(text)
    return _Parser(tokens, regex_fields, sigma_fields).parse()
