"""Snort/Sagan-syntax rule parser → :class:`~sagan_spark.rules.model.Rule`.

Grammar subset per FIXTURES.md F2 (upstream grammar: [U] src/rules.c
``Load_Rules()`` — tokenizes ``action proto sip sport -> dip dport
( key:val; ... )``).  Supports ``$VAR`` substitution, ``#`` comments,
trailing ``\\`` line continuation, and per-content modifier attachment
(a modifier keyword binds to the most recent ``content``/``pcre``, as
in the reference).
"""

from __future__ import annotations

import dataclasses
import re

from sagan_spark.rules.model import (
    AfterGate,
    ContentMatch,
    JsonContent,
    JsonMetaContent,
    JsonPcre,
    PcreMatch,
    Rule,
    ThresholdGate,
    XbitOp,
)

_HEADER_RE = re.compile(
    r"^(?P<action>alert|drop|pass)\s+(?P<proto>\S+)\s+\S+\s+\S+\s*->\s*\S+\s+\S+\s*\((?P<body>.*)\)\s*$",
    re.S,
)


def _split_options(body: str) -> list[str]:
    """Split the option body on ``;`` outside double quotes, honoring
    backslash escapes inside quoted strings."""
    out, cur, in_q, esc = [], [], False, False
    for ch in body:
        if esc:
            cur.append(ch)
            esc = False
        elif ch == "\\" and in_q:
            cur.append(ch)
            esc = True
        elif ch == '"':
            in_q = not in_q
            cur.append(ch)
        elif ch == ";" and not in_q:
            tok = "".join(cur).strip()
            if tok:
                out.append(tok)
            cur = []
        else:
            cur.append(ch)
    tok = "".join(cur).strip()
    if tok:
        out.append(tok)
    return out


def _unquote(v: str) -> tuple[str, bool]:
    """Strip surrounding quotes and a leading ``!`` (negation).
    Returns (value, negated)."""
    v = v.strip()
    neg = False
    if v.startswith("!"):
        neg = True
        v = v[1:].strip()
    if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
        v = v[1:-1]
    v = v.replace('\\"', '"').replace("\\\\", "\\").replace("\\;", ";")
    return v, neg


def _parse_pcre(v: str) -> tuple[str, str, bool]:
    raw, neg = _unquote(v)
    m = re.match(r"^/(?P<pat>.*)/(?P<flags>[ismx]*)$", raw, re.S)
    if not m:
        raise ValueError(f"bad pcre: {v!r}")
    return m.group("pat"), m.group("flags"), neg


# --- regex portability enforcement (r4; VERDICT r3 item 5) ------------------
# The engine evaluates patterns with Python `re` (Arrow UDF batches) while
# the DuckDB oracle uses RE2 and upstream uses PCRE ([U] rules.c
# pcre_compile fails fast on bad patterns).  A pattern outside the
# RE2 ∩ PCRE ∩ Python-`re` common subset would SILENTLY diverge between
# engine and oracle/upstream, so the parser rejects those constructs
# loudly at load time instead of relying on ruleset discipline.
# Detectors are conservative (`(?<!\\)` guards the escaped-literal case).
_NON_PORTABLE: list[tuple[re.Pattern, str, str]] = [
    (re.compile(r"(?<!\\)\(\?<[=!]"), "lookbehind (?<=/(?<!",
     "unsupported by RE2 — restructure the match"),
    (re.compile(r"(?<!\\)\(\?[=!]"), "lookahead (?=/(?!",
     "unsupported by RE2 — restructure the match"),
    (re.compile(r"(?<!\\)\(\?>"), "atomic group (?>",
     "PCRE-only — use a plain group"),
    (re.compile(r"(?<!\\)[*+?}]\+"), "possessive quantifier",
     "PCRE-only — use a greedy quantifier"),
    (re.compile(r"(?<!\\)\\K"), r"\K reset",
     "PCRE-only — use a capture group"),
    (re.compile(r"(?<!\\)\(\?(?:R\)|[0-9]+\)|&|P>)"), "recursion/subroutine call",
     "PCRE-only — inline the subpattern"),
    (re.compile(r"(?<!\\)\(\?\("), "conditional (?(",
     "PCRE-only — split into separate rules"),
    (re.compile(r"(?<!\\)\\[1-9]"), "backreference",
     "unsupported by RE2 — repeat the subpattern"),
    (re.compile(r"(?<!\\)\(\?P=|(?<!\\)\\[gk]<"), "named backreference",
     "unsupported by RE2 — repeat the subpattern"),
    (re.compile(r"(?<!\\)\\[Zz]"), r"\Z/\z anchor",
     "spelled differently in RE2 vs Python re — use $"),
]


def check_regex_portable(pattern: str, sid: int | None, where: str) -> None:
    """Raise ValueError (naming the offending rule sid) if `pattern`
    uses a construct outside the RE2 ∩ PCRE ∩ Python-`re` subset, or
    does not compile under Python `re` at all."""
    tag = f"rule sid {sid}" if sid is not None else "rule"
    for det, label, hint in _NON_PORTABLE:
        if det.search(pattern):
            raise ValueError(
                f"{tag}: non-portable regex construct [{label}] in {where} "
                f"pattern {pattern!r} — {hint} (engine=Python re, "
                f"oracle=RE2, upstream=PCRE must all agree)"
            )
    try:
        re.compile(pattern)
    except re.error as e:
        raise ValueError(f"{tag}: invalid {where} pattern {pattern!r}: {e}") from e


def _parse_kv_list(v: str) -> dict[str, str]:
    """Parse ``track by_src, count 3, seconds 3600`` style lists."""
    out: dict[str, str] = {}
    for part in v.split(","):
        part = part.strip()
        if not part:
            continue
        bits = part.split(None, 1)
        out[bits[0]] = bits[1].strip() if len(bits) > 1 else ""
    return out


def parse_rule(line: str, variables: dict[str, str] | None = None) -> Rule:
    for k, val in (variables or {}).items():
        line = line.replace(f"${k}", val)
    m = _HEADER_RE.match(line.strip())
    if not m:
        raise ValueError(f"bad rule header: {line[:80]!r}")

    r = Rule(sid=0)
    contents: list[ContentMatch] = []
    pcres: list[PcreMatch] = []
    jcs: list[JsonContent] = []
    jps: list[JsonPcre] = []
    jmcs: list[JsonMetaContent] = []
    xbits: list[XbitOp] = []
    last: str | None = None  # 'content' | 'json_content' — modifier target

    def _mod_content(**kw) -> None:
        if last not in ("content", "meta_content") or not contents:
            raise ValueError(f"modifier without preceding content in sid body: {kw}")
        contents[-1] = dataclasses.replace(contents[-1], **kw)

    for opt in _split_options(m.group("body")):
        if ":" in opt:
            key, val = opt.split(":", 1)
            key, val = key.strip(), val.strip()
        else:
            key, val = opt.strip(), ""

        if key == "msg":
            r.msg = _unquote(val)[0]
        elif key == "sid":
            r.sid = int(val)
        elif key == "rev":
            r.rev = int(val)
        elif key == "classtype":
            r.classtype = val
        elif key == "reference":
            r.references = (*r.references, val)
        elif key == "sink":
            r.sink = _unquote(val)[0]
        elif key in ("lang", "program"):
            v, neg = _unquote(val)
            r.lang = tuple(s.strip() for s in v.split("|") if s.strip())
            r.lang_negated = neg
        elif key in ("source", "facility"):
            v, neg = _unquote(val)
            r.source = tuple(s.strip() for s in v.split("|") if s.strip())
            r.source_negated = neg
        elif key == "syslog_tag":
            v, neg = _unquote(val)
            r.syslog_tag = tuple(s.strip() for s in v.split("|") if s.strip())
            r.syslog_tag_negated = neg
        elif key == "append_program":
            r.append_program = True
        elif key == "alert_time":
            # "hours 8-18" and/or "days 1-5" (ISO dow), comma separated
            kv = _parse_kv_list(val)
            if "hours" in kv:
                a, b = kv["hours"].split("-")
                r.alert_hours = (int(a), int(b))
            if "days" in kv:
                a, b = kv["days"].split("-")
                r.alert_days = tuple(range(int(a), int(b) + 1))
        elif key == "content":
            v, neg = _unquote(val)
            contents.append(ContentMatch(pattern=v, negated=neg))
            last = "content"
        elif key == "nocase":
            _mod_content(nocase=True)
        elif key == "offset":
            _mod_content(offset=int(val))
        elif key == "depth":
            _mod_content(depth=int(val))
        elif key == "distance":
            _mod_content(distance=int(val))
        elif key == "within":
            _mod_content(within=int(val))
        elif key == "pcre":
            pat, flags, neg = _parse_pcre(val)
            pcres.append(PcreMatch(pattern=pat, flags=flags, negated=neg))
            last = "pcre"
        elif key == "meta_content":
            # meta_content:"%sagan% tmpl", v1, v2 — expands to a set of
            # literal patterns that joins the content chain as ONE link
            # with "any alternative matches" semantics; positional
            # meta_* modifiers bind to it like content's offset/depth/
            # distance/within ([U] src/meta-content.c).
            parts = [p.strip() for p in val.split(",")]
            tmpl, neg = _unquote(parts[0])
            vals = [_unquote(p)[0] for p in parts[1:]]
            pats = tuple(tmpl.replace("%sagan%", v) for v in vals)
            if not pats:
                raise ValueError(f"meta_content without values: {val!r}")
            contents.append(
                ContentMatch(pattern=pats[0], negated=neg, alt_patterns=pats[1:])
            )
            last = "meta_content"
        elif key in ("meta_nocase", "meta_offset", "meta_depth", "meta_distance", "meta_within"):
            if last != "meta_content" or not contents:
                raise ValueError(f"{key} without preceding meta_content")
            if key == "meta_nocase":
                _mod_content(nocase=True)
            else:
                _mod_content(**{key.removeprefix("meta_"): int(val)})
        elif key == "json_content":
            path, rest = val.split(",", 1)
            p = _unquote(path)[0].lstrip(".")
            v, neg = _unquote(rest)
            jcs.append(JsonContent(path=p, value=v, negated=neg))
            last = "json_content"
        elif key == "json_nocase":
            if last != "json_content" or not jcs:
                raise ValueError("json_nocase without json_content")
            jcs[-1] = dataclasses.replace(jcs[-1], nocase=True)
        elif key == "json_pcre":
            path, rest = val.split(",", 1)
            p = _unquote(path)[0].lstrip(".")
            pat, flags, _neg = _parse_pcre(rest)
            jps.append(JsonPcre(path=p, pattern=pat, flags=flags))
        elif key == "json_meta_content":
            parts = [s.strip() for s in val.split(",")]
            p = _unquote(parts[0])[0].lstrip(".")
            vals = tuple(_unquote(s)[0] for s in parts[1:])
            jmcs.append(JsonMetaContent(path=p, values=vals))
        elif key == "parse_src_ip":
            r.parse_src_ip = int(val or 1)
        elif key == "parse_dst_ip":
            r.parse_dst_ip = int(val or 1)
        elif key == "parse_port":
            r.parse_port = True
        elif key == "parse_proto":
            r.parse_proto = True
        elif key == "parse_proto_program":
            r.parse_proto_program = True
        elif key == "parse_hash":
            r.parse_hash = val.strip()
        elif key == "normalize":
            r.normalize = True
        elif key == "default_proto":
            r.default_proto = val.strip()
        elif key == "default_src_port":
            r.default_src_port = int(val)
        elif key == "default_dst_port":
            r.default_dst_port = int(val)
        elif key == "country_code":
            # country_code: track by_src, is|isnot CC,CC,...
            kv_parts = [p.strip() for p in val.split(",")]
            for p in kv_parts:
                if p.startswith("track "):
                    r.country_track = p.split(None, 1)[1]
                elif p.startswith("isnot "):
                    r.country_isnot = tuple(p.split(None, 1)[1].split())
                elif p.startswith("is "):
                    r.country_is = tuple(p.split(None, 1)[1].split())
                elif p and r.country_is:
                    r.country_is = (*r.country_is, p)
                elif p and r.country_isnot:
                    r.country_isnot = (*r.country_isnot, p)
        elif key == "threshold":
            kv = _parse_kv_list(val)
            r.threshold = ThresholdGate(
                ttype=kv.get("type", "limit"),
                track=kv.get("track", "by_src"),
                count=int(kv.get("count", 1)),
                seconds=int(kv.get("seconds", 3600)),
            )
        elif key == "after":
            kv = _parse_kv_list(val)
            r.after = AfterGate(
                track=kv.get("track", "by_src"),
                count=int(kv.get("count", 1)),
                seconds=int(kv.get("seconds", 3600)),
            )
        elif key in ("xbits", "flexbits"):
            parts = [p.strip() for p in val.split(",")]
            op, name = parts[0], parts[1] if len(parts) > 1 else ""
            track, expire, cmp, value = "by_src", None, None, None
            _CMP = {"gt": "gt", ">": "gt", "lt": "lt", "<": "lt", "eq": "eq", "=": "eq"}
            for p in parts[2:]:
                if p.startswith("track "):
                    track = p.split(None, 1)[1]
                elif p.startswith("expire "):
                    expire = int(p.split(None, 1)[1])
                elif p.split(None, 1)[0] in _CMP:
                    cmp = _CMP[p.split(None, 1)[0]]
                    value = int(p.split(None, 1)[1])
            if op == "count":
                # counter comparison form ([U] src/flexbit.c) — only
                # valid on flexbits, and the comparator is mandatory:
                # a count test without one would pass-all silently
                if key != "flexbits":
                    raise ValueError("count op is a flexbits form, not xbits")
                if cmp is None or value is None:
                    raise ValueError("flexbits count needs 'gt|lt|eq N'")
            xbits.append(
                XbitOp(
                    op=op,
                    name=name,
                    track=track,
                    expire=expire,
                    flex=key == "flexbits",
                    cmp=cmp,
                    value=value,
                )
            )
        elif key in ("noalert", "flowbits"):
            pass  # accepted, no-op in the batch model
        else:
            raise ValueError(f"unknown rule option {key!r}")

    r.contents = tuple(contents)
    r.pcres = tuple(pcres)
    r.json_contents = tuple(jcs)
    r.json_pcres = tuple(jps)
    r.json_meta_contents = tuple(jmcs)
    r.xbits = tuple(xbits)
    if not r.sid:
        raise ValueError("rule missing sid")
    # portability gate runs AFTER sid assignment so the error names the
    # offending rule ([U] rules.c pcre_compile fails fast the same way)
    for p in r.pcres:
        check_regex_portable(p.pattern, r.sid, "pcre")
    for jp in r.json_pcres:
        check_regex_portable(jp.pattern, r.sid, "json_pcre")
    return r


def parse_rules(text: str, variables: dict[str, str] | None = None) -> list[Rule]:
    """Parse a ``.rules`` file body: # comments, blank lines, trailing
    backslash continuations."""
    lines: list[str] = []
    pending = ""
    for raw in text.splitlines():
        s = raw.strip()
        if not s or s.startswith("#"):
            continue
        if s.endswith("\\"):
            pending += s[:-1] + " "
            continue
        lines.append(pending + s)
        pending = ""
    if pending.strip():
        lines.append(pending)
    rules = [parse_rule(ln, variables) for ln in lines]
    sids = [r.sid for r in rules]
    if len(set(sids)) != len(sids):
        raise ValueError("duplicate sids in ruleset")
    return rules
