"""Scaling profiler: flagship wall time at several core counts, each
measurement in a FRESH subprocess (own JVM — driver memory/GC flags
actually apply; no cross-contamination of JIT/GC state between core
counts).  Prints one JSON line per measurement + a summary.

Usage: python scripts/profile_scaling.py [rep] [cores_csv] [n_meas]
Env:   PROF_STAGES=1 adds per-stage counts (match/enrich/window).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
cores, rep, sf_dir, reps, stages = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4]), sys.argv[5] == "1"
)
from pyspark.sql import functions as F
from sagan_spark.pages import pages_table
from sagan_spark.pipeline import Pipeline
from sagan_spark.session import build_session

spark = build_session(f"prof_c{cores}", master=f"local[{cores}]",
                      shuffle_partitions=cores * 2)
pages = pages_table(spark, sf_dir, rep=rep)
n = pages.count()
pipe = Pipeline(spark)
out = {"cores": cores, "rep": rep, "pages": n, "walls": []}
for _ in range(reps):
    spark.catalog.clearCache()
    t0 = time.time()
    pipe.sink_counts(pages).collect()
    out["walls"].append(round(time.time() - t0, 2))
out["wall"] = min(out["walls"])
out["eps"] = round(n / out["wall"], 0)
if stages:
    for nm, fn in (("match", pipe.matched), ("enrich", pipe.enriched),
                   ("window", pipe.window_gated)):
        spark.catalog.clearCache()
        t0 = time.time()
        fn(pages).select(F.count(F.lit(1))).collect()
        out[f"s_{nm}"] = round(time.time() - t0, 2)
spark.stop()
print("@@RESULT@@" + json.dumps(out))
"""


def measure(cores: int, rep: int, sf_dir: str, reps: int, stages: bool) -> dict:
    # taskset pins the WHOLE process tree (JVM task threads + forked
    # Python UDF workers + GC threads) to `cores` CPUs — without it a
    # "local[8]" cell borrows extra cores for its 8 Python workers and
    # the N-vs-4N comparison undercounts the baseline's real CPU.
    p = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}",
         sys.executable, "-c", CHILD, str(cores), str(rep), sf_dir, str(reps),
         "1" if stages else "0"],
        capture_output=True, text=True, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("@@RESULT@@"):
            return json.loads(line[len("@@RESULT@@"):])
    raise RuntimeError(f"child failed (cores={cores}):\n{p.stderr[-3000:]}")


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cores_list = [int(c) for c in (sys.argv[2].split(",") if len(sys.argv) > 2 else ["8", "32"])]
    n_meas = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    stages = os.environ.get("PROF_STAGES", "0") == "1"
    results = [measure(c, rep, sf_dir, n_meas, stages) for c in cores_list]
    for r in results:
        print(json.dumps(r))
    if len(results) == 2:
        a, b = results
        ratio = b["cores"] / a["cores"]
        eff = (b["eps"] / a["eps"]) / ratio
        print(json.dumps({"speedup": round(b["eps"] / a["eps"], 2),
                          "efficiency": round(eff, 3)}))
