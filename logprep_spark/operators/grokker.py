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

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]@]+))?(?::(\w+))?\}")

_TYPE_CASTS = {"int": "long", "long": "long", "float": "double", "double": "double"}


def expand_grok(expression: str, patterns: dict[str, str] | None = None):
    """Expand a grok expression to ``(regex, [(target, group, cast)])``.

    Named refs ``%{PAT:field}`` become capture groups (index tracked);
    bare refs ``%{PAT}`` become non-capturing.
    """
    library = dict(BUILTIN_PATTERNS)
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

        out = []
        pos = 0
        for match in _GROK_REF.finditer(expr):
            out.append(expr[pos : match.start()])
            before = counter["group"]
            replaced = sub(match)
            # count literal capture groups inside raw regex segments
            out.append(replaced)
            pos = match.end()
            del before
        out.append(expr[pos:])
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
            for grok in groks:
                regex, targets = expand_grok(grok, patterns)
                for target, group, typ in targets:
                    target = target.replace("[", ".").replace("]", "")
                    value = F.regexp_extract(src.cast("string"), regex, group)
                    if typ in _TYPE_CASTS:
                        value = value.cast(_TYPE_CASTS[typ])
                    matched = src.cast("string").rlike(regex)
                    df = self.set_when(df, target, cond & matched, value)
        return df
