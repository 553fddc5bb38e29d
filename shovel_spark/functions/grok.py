"""Grok pattern compiler — logstash-style ``%{PATTERN:field}`` parsing as
native Column expressions.

The reference's syslog input runs nsyslog-parser per message and splits
fields into headers (reference: src/inputs/syslog.js:44-56); the general
form of that capability is grok. Here a grok expression compiles ONCE at
plan time to a single Java regex; each named capture becomes a struct field
via ``regexp_extract`` — whole-stage codegen, no Python, no per-row
interpretation.

    compile_grok("%{IP:client} - %{WORD:method} %{NUMBER:bytes:int}")
    → struct<client:string, method:string, bytes:int>

Types: ``:int`` / ``:long`` / ``:double`` suffix casts the capture.
Unmatched lines yield a null struct (dead-letter them downstream — per-row
error isolation, never a task failure).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Base pattern library (logstash-compatible names, Java-regex bodies).
PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "INT": r"[+-]?\d+",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "IPORHOST": r"[\w.\-]+",
    "HOSTNAME": r"[\w.\-]+",
    "USER": r"[\w.\-]+",
    "USERNAME": r"[\w.\-]+",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "SYSLOGTIMESTAMP": r"[A-Z][a-z]{2} +\d{1,2} \d{2}:\d{2}:\d{2}",
    "LOGLEVEL": r"TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERROR|CRIT(?:ICAL)?|FATAL|SEVERE",
    "URIPATH": r"/[^\s?#]*",
    "QS": r'"[^"]*"',
}

_GROK_TOKEN = re.compile(r"%\{(\w+)(?::(\w+))?(?::(\w+))?\}")


class GrokError(ValueError):
    pass


def grok_to_regex(expression: str, patterns: dict[str, str] | None = None) -> tuple[str, list[tuple[str, str]]]:
    """Compile a grok expression to (java_regex, [(field, type), ...]).

    Literal text between tokens is regex-escaped; each named token becomes a
    capturing group, unnamed tokens become non-capturing.
    """
    patterns = {**PATTERNS, **(patterns or {})}
    fields: list[tuple[str, str]] = []
    out: list[str] = []
    pos = 0
    for m in _GROK_TOKEN.finditer(expression):
        out.append(re.escape(expression[pos : m.start()]))
        name, field, typ = m.group(1), m.group(2), m.group(3) or "string"
        if name not in patterns:
            raise GrokError(f"unknown grok pattern %{{{name}}}")
        body = patterns[name]
        if field:
            fields.append((field, typ))
            out.append(f"({body})")
        else:
            out.append(f"(?:{body})")
        pos = m.end()
    out.append(re.escape(expression[pos:]))
    if not fields:
        raise GrokError("grok expression captures no fields")
    return "".join(out), fields


def compile_grok(
    expression: str, line: Column | str = "line", patterns: dict[str, str] | None = None
) -> Column:
    """Grok a line column into ``struct<field, ..., ok boolean>``.

    One shared regex string across all extracts; ``ok`` distinguishes
    no-match from genuinely-empty captures (``regexp_extract`` returns ''
    for both).
    """
    col = F.col(line) if isinstance(line, str) else line
    regex, fields = grok_to_regex(expression, patterns)
    anchored = regex if regex.startswith("^") else "^" + regex
    ok = col.rlike(anchored)
    parts = []
    for i, (field, typ) in enumerate(fields, start=1):
        v = F.when(ok, F.regexp_extract(col, anchored, i))
        if typ != "string":
            v = v.cast(typ)
        parts.append(v.alias(field))
    return F.struct(*parts, ok.alias("ok"))
