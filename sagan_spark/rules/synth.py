"""Deterministic synthetic ruleset generator for at-scale stress tests
and benchmarks ([U] upstream deployments run thousands of rules —
engine.c iterates the full list per message; our compiler must survive
the same operating point without codegen blowups).

The mix mirrors a realistic distribution: mostly plain content rules
(cheap JVM instr), a slice of positional chains, a slice of pcre rules
(Arrow-batched), a slice of windowed/offset rules.  Patterns reference
the pages trigger vocabulary so a deterministic fraction actually
matches (dead rules would understate the explode/downstream cost).
"""

from __future__ import annotations

from functools import lru_cache

from sagan_spark.rules.model import Rule
from sagan_spark.rules.parser import parse_rules

SYNTH_BASE_SID = 6_000_000


def synth_ruleset_text(n: int) -> str:
    lines = []
    for i in range(n):
        sid = SYNTH_BASE_SID + i
        mode = i % 4
        if mode == 0:
            # mostly-dead vocabulary probe (terms not in the corpus)
            opt = f'content:"term{i % 499}x";'
        elif mode == 1:
            # positional chain on a live trigger
            opt = f'content:"proto"; content:"c"; distance:0; within:{3 + i % 8};'
        elif mode == 2:
            # pcre slice (25% of rules) on the port trigger
            opt = f'content:"port "; pcre:"/port {i % 10}[0-9]{{2}}/";'
        else:
            # absolute window over document prose
            opt = f'content:"e"; offset:{i % 50}; depth:120;'
        lines.append(
            f'alert syslog any any -> any any (msg:"synth {i}"; {opt} '
            f'classtype:web-anomaly; sink:"fast"; sid:{sid};)'
        )
    return "\n".join(lines)


@lru_cache(maxsize=4)
def synth_rules(n: int) -> tuple[Rule, ...]:
    return tuple(parse_rules(synth_ruleset_text(n)))
