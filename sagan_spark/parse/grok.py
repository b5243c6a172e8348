"""Grok / liblognorm "normalize" re-expression (SURVEY.md §2.3 M9;
[U] upstream src/liblognormalize.c + sagan-rules ``*.rulebase`` files).

The reference extracts structured fields from unstructured messages via
rulebase templates like ``%src-ip:ipv4%`` — this module compiles the
same ``%field:type%`` template syntax into a single anchored regex with
one capture group per field, applied with builtin ``regexp_extract``
(JVM-side, whole-stage codegen; no UDF).  The north-rule invariant —
**byte-identical extracted text per url** — is pinned by
``tests/test_pages_parity.py`` (pages scan vs oracle CTE) and the
``normalize_grok`` correctness query comparing the extracted message
against the source document text via the DuckDB oracle running the
identical pattern (RE2 ∩ Java-regex common subset: lazy quantifiers,
character classes, no lookaround).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TYPE_RES = {
    "ipv4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "int": r"\d+",
    "word": r"\S+",
    "string": r".*?",  # non-greedy — first-match-wins like liblognorm
    "rest": r".*",
}

_FIELD = re.compile(r"%([a-zA-Z_][a-zA-Z0-9_]*):([a-z0-9]+)%")


@dataclass(frozen=True)
class GrokPattern:
    regex: str
    fields: tuple[tuple[str, str], ...]  # (name, type) in group order


def compile_rulebase(template: str, anchored: bool = True) -> GrokPattern:
    """``'%msg:string% src=%ip:ipv4%'`` → anchored numbered-group regex."""
    out: list[str] = ["^"] if anchored else []
    fields: list[tuple[str, str]] = []
    pos = 0
    for m in _FIELD.finditer(template):
        out.append(re.escape(template[pos : m.start()]))
        name, typ = m.group(1), m.group(2)
        if typ not in TYPE_RES:
            raise ValueError(f"unknown grok type {typ!r}")
        out.append(f"({TYPE_RES[typ]})")
        fields.append((name, typ))
        pos = m.end()
    out.append(re.escape(template[pos:]))
    return GrokPattern(regex="".join(out), fields=tuple(fields))


def grok_columns(pat: GrokPattern, text: str = "text") -> dict[str, Column]:
    """One builtin regexp_extract per field (group i+1); int fields cast.
    No-match yields NULL (nullif of regexp_extract's '' sentinel)."""
    cols: dict[str, Column] = {}
    for i, (name, typ) in enumerate(pat.fields):
        c = F.nullif(F.regexp_extract(F.col(text), pat.regex, i + 1), F.lit(""))
        if typ == "int":
            c = c.cast("long")
        cols[name] = c
    return cols


def with_grok(df: DataFrame, pat: GrokPattern, text: str = "text") -> DataFrame:
    for name, col in grok_columns(pat, text).items():
        df = df.withColumn(name, col)
    return df


def grok_sql(pat: GrokPattern, text: str = "text") -> dict[str, str]:
    """DuckDB twin (same pattern string; RE2 semantics match the common
    subset).  Standard-SQL literal: only single quotes need escaping."""
    out = {}
    for i, (name, typ) in enumerate(pat.fields):
        lit = pat.regex.replace("'", "''")
        e = f"nullif(regexp_extract({text}, '{lit}', {i + 1}), '')"
        if typ == "int":
            e = f"TRY_CAST({e} AS BIGINT)"
        out[name] = e
    return out


# The pages-table rulebase ([U] analog: sagan-rules *.rulebase for the
# syslog corpus).  `message` captures the original document body —
# the byte-identical-per-url invariant target.
PAGES_RULEBASE = "%message:string% src=%nsrc_ip:ipv4% dst=%ndst_ip:ipv4%%tail:rest%"


def pages_grok() -> GrokPattern:
    return compile_rulebase(PAGES_RULEBASE)
