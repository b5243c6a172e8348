"""Property test (SURVEY.md §7 step 3): the compiler's dialect-SQL
content-chain conditions agree with a direct Python reference
implementation on random rules × random strings.

DuckDB evaluates the generated SQL (fast, no Spark session needed);
the Spark dialect is pinned to DuckDB by test_rules.py parity, so
DuckDB-vs-naive covers both engines transitively."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from sagan_spark.rules.compiler import DUCKDB, builtin_sql
from sagan_spark.rules.model import ContentMatch, Rule

ALPHA = "abX "


def naive_contents(contents: list[ContentMatch], text: str) -> bool:
    """Direct reimplementation of the documented chain semantics
    (1-based positions; negated contents don't advance)."""
    prev_end = 1
    for c in contents:
        hay = text.lower() if c.nocase else text
        pat = c.pattern.lower() if c.nocase else c.pattern
        if c.offset is not None or c.depth is not None:
            start = (c.offset or 0) + 1
            rel = hay[start - 1 :].find(pat) + 1
            ok = rel > 0 and (c.depth is None or rel <= c.depth)
        elif c.distance is not None or c.within is not None:
            start = prev_end + (c.distance or 0)
            rel = hay[start - 1 :].find(pat) + 1 if start >= 1 else 0
            ok = rel > 0 and (c.within is None or rel <= c.within)
        else:
            start = 1
            rel = hay.find(pat) + 1
            ok = rel > 0
        if c.negated:
            if ok:
                return False
        else:
            if not ok:
                return False
            prev_end = start + rel - 1 + len(pat)
    return True


content_st = st.builds(
    ContentMatch,
    pattern=st.text(ALPHA, min_size=1, max_size=3),
    negated=st.booleans(),
    nocase=st.booleans(),
    offset=st.one_of(st.none(), st.integers(0, 5)),
    depth=st.one_of(st.none(), st.integers(1, 10)),
    distance=st.one_of(st.none(), st.integers(0, 4)),
    within=st.one_of(st.none(), st.integers(1, 10)),
)


@st.composite
def chain_and_text(draw):
    contents = tuple(draw(st.lists(content_st, min_size=1, max_size=3)))
    text = draw(st.text(ALPHA, min_size=0, max_size=24))
    return contents, text


@settings(max_examples=300, deadline=None)
@given(chain_and_text())
def test_content_chain_matches_naive(case):
    contents, text = case
    # a content can't be both absolute and relative; absolute wins in
    # the compiler — normalize the random case the same way
    norm = []
    for c in contents:
        if c.offset is not None or c.depth is not None:
            c = ContentMatch(
                c.pattern, c.negated, c.nocase, c.offset, c.depth, None, None
            )
        norm.append(c)
    rule = Rule(sid=1, contents=tuple(norm))
    sql = builtin_sql(rule, DUCKDB)
    got = duckdb.sql(
        f"SELECT {sql} FROM (SELECT ? AS text)", params=[text]
    ).fetchone()[0]
    exp = naive_contents(norm, text)
    assert bool(got) == exp, (norm, text, sql)
