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
    (1-based positions; negated contents don't advance; a link with
    alt_patterns matches if ANY alternative matches and the chain
    advances past the FIRST matching alternative)."""
    prev_end = 1
    for c in contents:
        hay = text.lower() if c.nocase else text
        if c.offset is not None or c.depth is not None:
            start, bound = (c.offset or 0) + 1, c.depth
        elif c.distance is not None or c.within is not None:
            start, bound = prev_end + (c.distance or 0), c.within
        else:
            start, bound = 1, None
        any_ok, matched_end = False, None
        for p in (c.pattern, *c.alt_patterns):
            pat = p.lower() if c.nocase else p
            rel = hay[start - 1 :].find(pat) + 1 if start >= 1 else 0
            ok = rel > 0 and (bound is None or rel <= bound)
            if ok:
                any_ok = True
                if matched_end is None:
                    matched_end = start + rel - 1 + len(pat)
        if c.negated:
            if any_ok:
                return False
        else:
            if not any_ok:
                return False
            prev_end = matched_end
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
    alt_patterns=st.lists(
        st.text(ALPHA, min_size=1, max_size=3), max_size=2
    ).map(tuple),
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
    import dataclasses

    norm = []
    for c in contents:
        if c.offset is not None or c.depth is not None:
            c = dataclasses.replace(c, distance=None, within=None)
        norm.append(c)
    rule = Rule(sid=1, contents=tuple(norm))
    sql = builtin_sql(rule, DUCKDB)
    got = duckdb.sql(
        f"SELECT {sql} FROM (SELECT ? AS text)", params=[text]
    ).fetchone()[0]
    exp = naive_contents(norm, text)
    assert bool(got) == exp, (norm, text, sql)
