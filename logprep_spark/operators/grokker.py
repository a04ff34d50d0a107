r"""Grokker — named-pattern extraction (logstash grok semantics).

Reference: /root/reference/logprep/processor/grokker/processor.py and
/root/reference/logprep/util/grok_pattern_loader.py. Rules map a
source field to grok expressions ``%{PATTERN:target}``; patterns are
recursively expanded from a library into one regex.

Spark realization: the grok expression is expanded ONCE at plan build
into a plain regex; every target becomes one ``regexp_extract`` with
its group index — the row path is entirely the JVM regex engine.
The builtin library below is the standard public grok core set
(logstash's grok-patterns file is the de-facto public spec).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor

BUILTIN_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?(?:[0-9]+)",
    "NONNEGINT": r"[0-9]+",
    "BASE10NUM": r"[+-]?(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+)",
    "NUMBER": r"[+-]?(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+)",
    "POSINT": r"\b[1-9][0-9]*\b",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"[a-zA-Z0-9._-]+",
    "EMAILLOCALPART": r"[a-zA-Z0-9!#$%&'*+\-/=?^_`{|}~]{1,64}(?:\.[a-zA-Z0-9!#$%&'*+\-/=?^_`{|}~]{1,62}){0,63}",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "IPV4": r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)",
    "IPV6": r"(?:[0-9A-Fa-f]{0,4}:){2,7}(?:[0-9A-Fa-f]{0,4})",
    "IP": r"(?:%{IPV6}|%{IPV4})",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "EMAILADDRESS": r"%{EMAILLOCALPART}@%{HOSTNAME}",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    "UNIXPATH": r"(?:/[\w_%!$@:.,+~-]*)+",
    "URIPROTO": r"[A-Za-z](?:[A-Za-z0-9+\-.]+)+",
    "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "URIQUERY": r"[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPARAM": r"\?%{URIQUERY}",
    "URIPATHPARAM": r"%{URIPATH}(?:\?%{URIQUERY})?",
    "URI": r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME": r"%{HOUR}:%{MINUTE}(?::%{SECOND})?",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "TIMESTAMP_ISO8601": r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?",
    "LOGLEVEL": r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo?(?:rmation)?|INFO?(?:RMATION)?|[Ww]arn?(?:ing)?|WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|[Cc]rit?(?:ical)?|CRIT?(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "MONTH": r"\b(?:[Jj]an(?:uary|uar)?|[Ff]eb(?:ruary|ruar)?|[Mm](?:a|ä)?r(?:ch|z)?|[Aa]pr(?:il)?|[Mm]a(?:y|i)?|[Jj]un(?:e|i)?|[Jj]ul(?:y|i)?|[Aa]ug(?:ust)?|[Ss]ep(?:tember)?|[Oo](?:c|k)?t(?:ober)?|[Nn]ov(?:ember)?|[Dd]e(?:c|z)(?:ember)?)\b",
    "QS": r'(?>"(?>\\.|[^\\"]+)+"|""|(?>\'(?>\\.|[^\\\']+)+\')|\'\'|(?>`(?>\\.|[^\\`]+)+`)|``)',
    "QUOTEDSTRING": r'(?:"(?:\\.|[^\\"])*"|\'(?:\\.|[^\\\'])*\')',
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "MAC": r"(?:[A-Fa-f0-9]{2}[:-]){5}[A-Fa-f0-9]{2}",
    "PATH": r"(?:%{UNIXPATH}|%{WINPATH})",
    "WINPATH": r"(?:[A-Za-z]+:|\\)(?:\\[^\\?*]*)+",
    "COMBINEDAPACHELOG": r'%{IPORHOST:clientip} %{USER:ident} %{USER:auth} \[%{HTTPDATE:timestamp}\] "(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})" %{NUMBER:response} (?:%{NUMBER:bytes}|-) %{QUOTEDSTRING:referrer} %{QUOTEDSTRING:agent}',
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "DAY": r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
    "JAVACLASS": r"(?:[a-zA-Z$_][a-zA-Z$_0-9]*\.)*[a-zA-Z$_][a-zA-Z$_0-9]*",
    "JAVAFILE": r"(?:[a-zA-Z$_0-9. -]+)",
    "JAVAMETHOD": r"(?:(?:<(?:cl)?init>)|[a-zA-Z$_][a-zA-Z$_0-9]*)",
    "JAVASTACKTRACEPART": r"\s*at %{JAVACLASS:class}\.%{JAVAMETHOD:method}\(%{JAVAFILE:file}(?::%{NUMBER:line})?\)",
    "SYSLOGHOST": r"%{IPORHOST}",
    "SYSLOGPROG": r"%{PROG:program}(?:\[%{POSINT:pid}\])?",
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    "SYSLOGBASE": r"%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?%{SYSLOGHOST:logsource} %{SYSLOGPROG}:",
    "SYSLOGFACILITY": r"<%{NONNEGINT:facility}.%{NONNEGINT:priority}>",
}


def load_pattern_file(path: str) -> dict[str, str]:
    """Parse a logstash-format pattern file: ``NAME regex`` per line,
    ``#`` comments (reference: logprep/util/grok_pattern_loader.py)."""
    out: dict[str, str] = {}
    with open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line.strip() or line.lstrip().startswith("#"):
                continue
            name, _, pattern = line.partition(" ")
            if name and pattern:
                out[name] = pattern
    return out


def load_pattern_dir(path: str) -> dict[str, str]:
    import os

    out: dict[str, str] = {}
    for root, _dirs, files in os.walk(path):
        for fname in sorted(files):
            out.update(load_pattern_file(os.path.join(root, fname)))
    return out

_VENDORED_CACHE: dict[str, str] | None = None


def vendored_patterns() -> dict[str, str]:
    """The shipped pattern library: logstash-format files under
    ``operators/grok_patterns/`` (hand-authored subset of the public
    logstash-patterns-core / Elastic ecs-v1 spec — the same sets the
    reference vendors under logprep/util/grok/patterns/). Loaded once
    per process."""
    global _VENDORED_CACHE
    if _VENDORED_CACHE is None:
        import os

        pat_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "grok_patterns")
        _VENDORED_CACHE = load_pattern_dir(pat_dir) if os.path.isdir(pat_dir) else {}
    return _VENDORED_CACHE


_GROK_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]@]+))?(?::(\w+))?\}")

_TYPE_CASTS = {"int": "long", "long": "long", "float": "double", "double": "double"}


def neutralize_groups(regex: str, on_named=None) -> str:
    """Rewrite every LITERAL capturing group in a raw regex segment to
    non-capturing, so the only capturing groups in the expanded grok
    regex are the ones expand_grok itself inserts — group indices are
    then exactly insertion order. Community pattern files are full of
    literal ``(...)`` groups; counting by %{}-ref alone silently shifts
    every subsequent regexp_extract index.

    Handles: escapes (``\\(``), character classes (``(`` inside
    ``[...]`` is literal), ``(?:``/``(?=``/``(?!``/``(?>``/lookbehind
    (kept — non-capturing), and Java named groups ``(?<name>...)``
    (capturing! rewritten to ``(?:`` with the name dropped — unless
    ``on_named`` is given, in which case the group is KEPT as a plain
    capturing group and ``on_named(name)`` is called so the caller can
    assign it the next index: grok expressions use ``(?<field>...)`` as
    inline capture syntax)."""
    out: list[str] = []
    i, n = 0, len(regex)
    in_class = False
    while i < n:
        c = regex[i]
        if c == "\\" and i + 1 < n:
            out.append(regex[i : i + 2])
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            out.append(c)
            i += 1
            continue
        if c == "[":
            in_class = True
            out.append(c)
            i += 1
            continue
        if c == "(":
            if i + 1 < n and regex[i + 1] == "?":
                # (?<name>...) is a CAPTURING named group unless the
                # char after '<' is '=' or '!' (lookbehind)
                if (
                    i + 2 < n
                    and regex[i + 2] == "<"
                    and i + 3 < n
                    and regex[i + 3] not in "=!"
                ):
                    close = regex.index(">", i + 3)
                    if on_named is not None:
                        on_named(regex[i + 3 : close])
                        out.append("(")
                    else:
                        out.append("(?:")
                    i = close + 1
                    continue
                out.append(c)
                i += 1
                continue
            out.append("(?:")
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def expand_grok(expression: str, patterns: dict[str, str] | None = None):
    """Expand a grok expression to ``(regex, [(target, group, cast)])``.

    Named refs ``%{PAT:field}`` become capture groups (index tracked);
    bare refs ``%{PAT}`` become non-capturing; literal capture groups
    in raw segments and library bodies are neutralized (see
    ``neutralize_groups``) so indices never shift.
    """
    # precedence: rule-supplied > builtin > vendored files. Builtins
    # stay authoritative for names they define (existing rules/oracles
    # pin their exact semantics); the vendored library widens coverage.
    library = dict(vendored_patterns())
    library.update(BUILTIN_PATTERNS)
    if patterns:
        library.update(patterns)
    targets: list[tuple[str, int, str | None]] = []
    counter = {"group": 0}

    def _expand(expr: str, depth: int, capture_targets: bool) -> str:
        if depth > 20:
            raise ValueError("grok pattern recursion too deep")

        def sub(match: re.Match) -> str:
            name, target, typ = match.group(1), match.group(2), match.group(3)
            if name not in library:
                raise ValueError(f"unknown grok pattern %{{{name}}}")
            if target and capture_targets:
                counter["group"] += 1
                group = counter["group"]
                targets.append((target, group, typ))
                inner = _expand(library[name], depth + 1, capture_targets)
                return f"({inner})"
            inner = _expand(library[name], depth + 1, capture_targets)
            return f"(?:{inner})"

        def register_named(name: str) -> None:
            counter["group"] += 1
            targets.append((name, counter["group"], None))

        # inline (?<field>...) capture syntax is only honored in the
        # top-level rule expression; inside library bodies the names
        # are dropped (they'd collide across refs)
        on_named = register_named if depth == 0 and capture_targets else None

        out = []
        pos = 0
        for match in _GROK_REF.finditer(expr):
            out.append(neutralize_groups(expr[pos : match.start()], on_named))
            out.append(sub(match))
            pos = match.end()
        out.append(neutralize_groups(expr[pos:], on_named))
        return "".join(out)

    regex = _expand(expression, 0, True)
    return regex, targets


class Grokker(Processor):
    rule_type = "grokker"

    def __init__(
        self,
        rules=None,
        custom_patterns: dict[str, str] | None = None,
        custom_patterns_dir: str | None = None,
        **kw,
    ):
        super().__init__(rules, **kw)
        self.custom_patterns = dict(custom_patterns or {})
        if custom_patterns_dir:
            self.custom_patterns.update(load_pattern_dir(custom_patterns_dir))

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        patterns = dict(self.custom_patterns)
        patterns.update(cfg.get("patterns", {}))
        for source, groks in cfg["mapping"].items():
            src = fld.get_field(df, source)
            if src is None:
                continue
            if isinstance(groks, str):
                groks = [groks]
            any_matched = F.lit(False)
            for grok in groks:
                regex, targets = expand_grok(grok, patterns)
                for target, group, typ in targets:
                    # ECS-style [a][b] targets → dotted path (strip the
                    # leading dot the bracket rewrite leaves behind)
                    target = target.replace("[", ".").replace("]", "").strip(".")
                    value = F.regexp_extract(src.cast("string"), regex, group)
                    if typ in _TYPE_CASTS:
                        value = value.cast(_TYPE_CASTS[typ])
                    matched = src.cast("string").rlike(regex)
                    df = self.set_when(df, target, cond & matched, value)
                any_matched = any_matched | src.cast("string").rlike(regex)
            # reference: event had the field but NO grok of the rule
            # matched -> tag_on_failure (default _grokker_failure)
            df = self.tag_failure(df, cond & src.isNotNull() & ~any_matched)
        return df
