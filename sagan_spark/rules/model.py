"""Rule IR — dataclasses produced by the parser, consumed by the compiler.

Mirrors the fields of the reference's in-memory rule struct
(NetWatcher/sagan upstream ``src/rules.c`` ``Load_Rules()`` →
``_Rule_Struct``; reference dir is empty in this sandbox, citations are
upstream-path [U] per SURVEY.md notice).  Only the keyword subset from
FIXTURES.md F2 is modeled; everything here is a plain value object —
compilation to Spark expressions lives in :mod:`sagan_spark.rules.compiler`.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ContentMatch:
    """``content:"lit"`` with positional modifiers.

    [U] src/content.c — literal byte-substring match; ``nocase``
    lowercases both sides; ``offset``/``depth`` constrain the absolute
    search window, ``distance``/``within`` the window relative to the
    previous content match's end (chained).
    """

    pattern: str
    negated: bool = False
    nocase: bool = False
    offset: int | None = None  # absolute: match must start at pos >= offset (0-based)
    depth: int | None = None  # absolute: match must start within first `depth` bytes window
    distance: int | None = None  # relative: gap >= distance from prev match end
    within: int | None = None  # relative: match must start within `within` of prev end
    # meta_content expansion ([U] src/meta-content.c): when non-empty,
    # this chain link matches if ANY of (pattern, *alt_patterns) matches
    # inside the window; the chain advances past the FIRST (declaration
    # order) alternative that matched.  meta_offset/meta_depth/
    # meta_distance/meta_within bind to the same window fields above.
    alt_patterns: tuple[str, ...] = ()


@dataclass(frozen=True)
class PcreMatch:
    """``pcre:"/re/flags"`` — [U] src/rules.c (pcre_compile), engine.c.

    Evaluated with Python ``re`` inside an Arrow pandas UDF (single
    semantics everywhere — SURVEY.md §7 risk list). Fixture rulesets
    stay inside the RE2 ∩ Python-``re`` ∩ Java-regex common subset so
    the DuckDB oracle agrees.
    """

    pattern: str
    flags: str = ""  # subset: i (ignorecase), s (dotall), m (multiline)
    negated: bool = False


@dataclass(frozen=True)
class JsonContent:
    """``json_content:".path","val"`` — [U] src/json-content.c."""

    path: str  # dotted path without leading $
    value: str
    negated: bool = False
    nocase: bool = False


@dataclass(frozen=True)
class JsonPcre:
    """``json_pcre:".path","/re/"`` — [U] src/json-pcre.c."""

    path: str
    pattern: str
    flags: str = ""


@dataclass(frozen=True)
class JsonMetaContent:
    """``json_meta_content:".path",v1,v2`` — [U] src/json-meta-content.c."""

    path: str
    values: tuple[str, ...]
    negated: bool = False


@dataclass(frozen=True)
class ThresholdGate:
    """``threshold: type limit|suppress|threshold, track ..., count N, seconds S``

    [U] engine.c + ipc counters.  Semantics (ours, fixture-defining —
    upstream ships no tests, SURVEY.md §5.1):
      * ``limit``    — emit only the first N events per key per tumbling
        S-second window aligned to the epoch (row_number <= N).
      * ``suppress`` — drop events once the rolling-S count exceeds N.
      * ``threshold``— emit only every event where rolling count == k*N
        (classic snort "threshold") — modeled as rolling count % N == 0.
    """

    ttype: str  # limit | suppress | threshold
    track: str  # by_src | by_dst | by_domain | by_username (maps to key col)
    count: int
    seconds: int


@dataclass(frozen=True)
class AfterGate:
    """``after: track ..., count N, seconds S`` — fire only once more
    than N events with the same key landed within a rolling S-second
    window (inclusive boundary: an event exactly S seconds old still
    counts).  [U] engine.c after-counter path."""

    track: str
    count: int
    seconds: int


@dataclass(frozen=True)
class XbitOp:
    """``xbits: set|unset|isset|isnotset, name, track ..., expire S``

    [U] src/xbit.c / src/xbit-mmap.c.  Batch re-expression: set/unset
    become rows of a bit-event state table; isset/isnotset become a
    join-back against the latest bit event at-or-before the tester's
    event time (strictly-before expiry boundary: a tester at exactly
    ``set_ts + expire`` sees the bit as NOT set — FIXTURES.md F4).
    ``flexbits`` parse into the same op with ``flex=True`` (wider key).
    """

    op: str  # set | unset | isset | isnotset | count
    name: str
    track: str  # by_src | by_dst | by_domain | ip_pair
    expire: int | None = None  # seconds; None = never expires (set ops only)
    flex: bool = False
    # ``flexbits: count, name, track ..., gt|lt|eq N`` ([U] src/flexbit.c
    # counter comparisons).  Batch semantics (fixture-defining — upstream
    # ships no tests): the counter value at a tester's event time is the
    # number of UNEXPIRED ``set`` events for (name, key) at-or-before it
    # under the total order (warc_epoch, url); ``unset`` does not
    # decrement (documented simplification of the mmap counter).
    cmp: str | None = None  # gt | lt | eq (count op only)
    value: int | None = None


@dataclass
class Rule:
    """One parsed rule.  [U] src/rules.c ``_Rule_Struct``."""

    sid: int
    rev: int = 1
    msg: str = ""
    classtype: str | None = None
    references: tuple[str, ...] = ()

    # prefilters (P1/P2/P4 analogs per SURVEY.md §2.2: program→lang,
    # facility→source, alert_time on warc_ts)
    lang: tuple[str, ...] = ()  # empty = any; supports ! negation via lang_negated
    lang_negated: bool = False
    source: tuple[str, ...] = ()
    source_negated: bool = False
    # P6 analogs: ``syslog_tag`` is a substring match against the tag
    # (our ``source`` column); ``append_program`` appends the program to
    # the message haystack before content/pcre matching ([U] engine.c
    # Sagan_Check_Content / append_program path)
    syslog_tag: tuple[str, ...] = ()
    syslog_tag_negated: bool = False
    append_program: bool = False
    alert_hours: tuple[int, int] | None = None  # [start_hour, end_hour) UTC
    alert_days: tuple[int, ...] = ()  # ISO dow 1=Mon..7=Sun; empty = any

    # matchers
    contents: tuple[ContentMatch, ...] = ()
    pcres: tuple[PcreMatch, ...] = ()
    json_contents: tuple[JsonContent, ...] = ()
    json_pcres: tuple[JsonPcre, ...] = ()
    json_meta_contents: tuple[JsonMetaContent, ...] = ()

    # extraction config (X1-X4; 1-based occurrence index like the reference)
    parse_src_ip: int | None = None
    parse_dst_ip: int | None = None
    parse_port: bool = False
    parse_proto: bool = False
    parse_proto_program: bool = False
    parse_hash: str | None = None  # md5 | sha1 | sha256
    normalize: bool = False
    default_proto: str | None = None
    default_src_port: int | None = None
    default_dst_port: int | None = None

    # enrichment predicates (E1)
    country_track: str | None = None  # by_src | by_dst
    country_is: tuple[str, ...] = ()
    country_isnot: tuple[str, ...] = ()

    # stateful gates (A1-A5)
    threshold: ThresholdGate | None = None
    after: AfterGate | None = None
    xbits: tuple[XbitOp, ...] = ()

    # routing — from the tabular twin (FIXTURES.md F2) or `sink` option
    sink: str = "fast"

    def has_regex(self) -> bool:
        return bool(self.pcres or self.json_pcres)

    def needs_json(self) -> bool:
        return bool(self.json_contents or self.json_pcres or self.json_meta_contents)

    def bit_tests(self) -> tuple[XbitOp, ...]:
        return tuple(x for x in self.xbits if x.op in ("isset", "isnotset"))

    def bit_writes(self) -> tuple[XbitOp, ...]:
        return tuple(x for x in self.xbits if x.op in ("set", "unset"))

    def bit_counts(self) -> tuple[XbitOp, ...]:
        return tuple(x for x in self.xbits if x.op == "count")
