"""Same-build flagship A/B: r2's 32-rule composition vs r3/r4's 34-rule
composition (VERDICT r3 item 2 — decompose the 17.8k→8.7k ev/s artifact
regression into composition vs code).

Each cell is subprocess-isolated and taskset-pinned exactly like
bench.py's flagship cells; the ONLY variable across the two arms is the
ruleset (sids 5000033/5000034 present or absent — 5000034's
`content:"port "` matches ~1/3 of pages and routes them through the
full sink path; 5000032's flexbits-count gate is in BOTH arms, as it
was in r3).  Prints one JSON line per (arm, cores) cell plus a summary.

Usage: python scripts/ab_flagship.py [cores ...]   (default: 8 32)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_REP (default 64), SPARK_GRAFT_AB_REPS (default 4).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

CHILD = r"""
import json, sys, time
sys.path.insert(0, ".")
cores, rep, sf_dir, reps, arm = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4]), sys.argv[5]
)
from sagan_spark.pages import pages_table
from sagan_spark.pipeline import Pipeline
from sagan_spark.rules.fixture_rules import fixture_rules
from sagan_spark.session import build_session

spark = build_session(f"ab_{arm}_c{cores}", master=f"local[{cores}]",
                      shuffle_partitions=cores * 2)
pages = pages_table(spark, sf_dir, rep=rep)
n = pages.count()
rules = list(fixture_rules())
if arm == "r2":
    rules = [r for r in rules if r.sid not in (5000033, 5000034)]
pipe = Pipeline(spark, rules=rules)
walls = []
for _ in range(reps):
    spark.catalog.clearCache()
    t0 = time.time()
    pipe.sink_counts(pages).collect()
    walls.append(round(time.time() - t0, 3))
spark.stop()
print("@@AB@@" + json.dumps({"pages": n, "walls": walls, "rules": len(rules)}))
"""


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return round(s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0, 3)


def cell(arm: str, cores: int, sf_dir: str, rep: int, reps: int):
    ncpu = os.cpu_count() or cores
    lo, hi = max(0, ncpu - cores), ncpu - 1
    p = subprocess.run(
        ["taskset", "-c", f"{lo}-{hi}", sys.executable, "-c", CHILD,
         str(cores), str(rep), sf_dir, str(reps), arm],
        capture_output=True, text=True, timeout=3600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    for line in p.stdout.splitlines():
        if line.startswith("@@AB@@"):
            return json.loads(line[len("@@AB@@"):])
    raise RuntimeError(f"ab cell {arm} c{cores} failed:\n{p.stderr[-2000:]}")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rep = int(os.environ.get("SPARK_GRAFT_REP", "64"))
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "4"))
    cores_list = [int(c) for c in sys.argv[1:]] or [8, 32]
    out = {}
    for cores in cores_list:
        # arms interleaved back-to-back so they share the host's
        # interference epoch (the bench.py pairing lesson)
        for arm in ("r2", "full"):
            t0 = time.time()
            r = cell(arm, cores, sf_dir, rep, reps)
            walls = r["walls"][1:]  # drop JIT-warmup rep
            med = _median(walls)
            out[f"{arm}_c{cores}"] = {
                "rules": r["rules"], "pages": r["pages"], "walls": walls,
                "median": med, "events_per_sec": round(r["pages"] / med, 1),
                "cell_elapsed": round(time.time() - t0, 1),
            }
            print(json.dumps({f"{arm}_c{cores}": out[f"{arm}_c{cores}"]}),
                  flush=True)
    for cores in cores_list:
        a, b = out[f"r2_c{cores}"], out[f"full_c{cores}"]
        print(json.dumps({
            "cores": cores,
            "r2_32rule_evps": a["events_per_sec"],
            "full_34rule_evps": b["events_per_sec"],
            "composition_ratio": round(a["median"] / b["median"], 3),
        }), flush=True)


if __name__ == "__main__":
    main()
