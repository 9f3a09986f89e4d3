"""Grok-pattern parser (the embulk-parser-grok ecosystem plugin).

Grok is the logstash pattern language: ``%{NAME:field:type}`` aliases
expand to regexes, so operators write ``%{COMMONAPACHELOG}`` instead of
a 300-char regex. The plugin's contract is public (logstash/grok docs);
the base pattern set below is the commonly-shipped core, re-derived
from its published definitions.

Spark-first shape: grok compiles ONCE on the driver to a plain Java
regex + ordered typed columns, then parsing is the same codegen'd
``regexp_extract`` chain the regexp parser uses
(sources/files.py::parse_regexp_column) — no per-row Python, no grok
interpreter in the data path. Reference parity: ecosystem plugin
``embulk-parser-grok`` (the distribution itself ships none —
build.gradle:17-22 — but SURVEY §2.11 tracks ecosystem surface).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: core pattern aliases (logstash grok-patterns core set, re-derived).
#: Values are plain Java-compatible regexes WITHOUT capture groups —
#: named fields add the groups during expansion.
BASE_PATTERNS: dict[str, str] = {
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"[a-zA-Z0-9._-]+",
    "INT": r"[+-]?\d+",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "NUMBER": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "POSINT": r"\d+",
    "NONNEGINT": r"\d+",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r'"[^"]*"|\'[^\']*\'',
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "HOSTNAME": r"\b[0-9A-Za-z][0-9A-Za-z-]{0,62}(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\.?",
    "IPORHOST": r"(?:(?:\d{1,3}\.){3}\d{1,3}|\b[0-9A-Za-z][0-9A-Za-z-]{0,62}(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\.?)",
    "MONTH": r"\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\b",
    "MONTHDAY": r"(?:0[1-9]|[12]\d|3[01]|[1-9])",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?\d)",
    "MINUTE": r"(?:[0-5]\d)",
    "SECOND": r"(?:[0-5]?\d)(?:\.\d+)?",
    "TIME": r"(?:2[0123]|[01]?\d):(?:[0-5]\d):(?:[0-5]?\d)(?:\.\d+)?",
    "HTTPDATE": r"(?:0[1-9]|[12]\d|3[01]|[1-9])/\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\b/(?:\d\d){1,2}:(?:2[0123]|[01]?\d):(?:[0-5]\d):(?:[0-5]?\d)(?:\.\d+)? [+-]\d{4}",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+(?:\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*)?",
    "LOGLEVEL": r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn?(?:ing)?|WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|[Cc]rit?(?:ical)?|CRIT?(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
}

#: composite patterns (carry their own named fields)
BASE_PATTERNS["COMMONAPACHELOG"] = (
    r"%{IPORHOST:clientip} %{USER:ident} %{USER:auth} "
    r"\[%{HTTPDATE:timestamp}\] \"%{WORD:verb} %{NOTSPACE:request}"
    r"(?: HTTP/%{NUMBER:httpversion})?\" %{NUMBER:response:long} "
    r"(?:%{NUMBER:bytes:long}|-)"
)

_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+))?(?::(\w+))?\}")

#: grok type tags → engine types (grok says int/float; Embulk says
#: long/double — accept both spellings)
_GROK_TYPES = {
    "int": "long",
    "long": "long",
    "float": "double",
    "double": "double",
    "string": "string",
    "timestamp": "timestamp",
    "boolean": "boolean",
}


def grok_compile(
    pattern: str, extra_patterns: dict[str, str] | None = None
) -> tuple[str, list[dict]]:
    """Expand a grok expression into ``(java_regex, columns)``.

    Named references ``%{NAME:field[:type]}`` become capture groups, in
    left-to-right order; unnamed references inline as non-capturing.
    Nested composites expand recursively (cycle-guarded). Columns carry
    the engine types for the string-setter coercion downstream."""
    defs = dict(BASE_PATTERNS)
    defs.update(extra_patterns or {})
    columns: list[dict] = []

    def expand(p: str, seen: frozenset[str]) -> str:
        def repl(m: re.Match) -> str:
            name, field, tag = m.group(1), m.group(2), m.group(3)
            if name not in defs:
                raise ValueError(f"unknown grok pattern %{{{name}}}")
            if name in seen:
                raise ValueError(f"grok pattern cycle through %{{{name}}}")
            if field:
                # append BEFORE expanding the body: a named composite's
                # outer "(" opens before any inner groups, and columns
                # must follow regex group numbering
                columns.append(
                    {"name": field, "type": _GROK_TYPES.get(tag or "string", "string")}
                )
                return f"({expand(defs[name], seen | {name})})"
            return f"(?:{expand(defs[name], seen | {name})})"

        return _GROK_REF.sub(repl, p)

    regex = expand(pattern, frozenset())
    return regex, columns


def parse_grok_column(
    df: DataFrame,
    col: F.Column,
    pattern: str,
    extra_patterns: dict[str, str] | None = None,
    timestamp_formats: dict[str, str] | None = None,
) -> DataFrame:
    """Parse a string Column with a grok expression → typed columns.
    Non-matching lines skip (the plugin's invalid-line default); numeric
    captures coerce with setter semantics. ``timestamp_formats`` maps a
    field name to its strptime format (grok itself is untyped about
    dates)."""
    from .files import parse_regexp_column

    regex, columns = grok_compile(pattern, extra_patterns)
    for c in columns:
        fmt = (timestamp_formats or {}).get(c["name"])
        if fmt:
            c["type"], c["format"] = "timestamp", fmt
    if not columns:
        raise ValueError("grok pattern captures no fields (no %{NAME:field})")
    # grok semantics anchor the whole line
    return parse_regexp_column(df, col, f"^{regex}$", columns)


def read_grok(spark: SparkSession, paths: list[str], parser: dict) -> DataFrame:
    """Parser ``type: grok``: one record per matching line.

    Config mirrors the plugin: ``grok_pattern`` (the expression),
    ``grok_pattern_files``-style inline ``patterns`` (name → regex),
    ``timestamp_formats`` (field → strptime)."""
    df = spark.read.text(paths)
    return parse_grok_column(
        df,
        F.col("value"),
        parser["grok_pattern"],
        parser.get("patterns"),
        parser.get("timestamp_formats"),
    )
