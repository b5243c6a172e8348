"""GC-config experiment matrix for the flagship (subprocess per cell).
Usage: python scripts/gc_matrix.py [rep] [reps_per_cell]"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cores, rep, sf_dir, reps = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
from sagan_spark.pages import pages_table
from sagan_spark.pipeline import Pipeline
from sagan_spark.session import build_session
spark = build_session(f"gcm_c{cores}", master=f"local[{cores}]", shuffle_partitions=cores * 2)
pages = pages_table(spark, sf_dir, rep=rep)
n = pages.count()
pipe = Pipeline(spark)
walls = []
for _ in range(reps):
    spark.catalog.clearCache()
    t0 = time.time()
    pipe.sink_counts(pages).collect()
    walls.append(round(time.time() - t0, 2))
spark.stop()
print("@@R@@" + json.dumps({"cores": cores, "pages": n, "walls": walls}))
"""

CONFIGS = {
    "parallel48": "-XX:+UseParallelGC -XX:+UnlockDiagnosticVMOptions -XX:+UseCountedLoopSafepoints -XX:LoopStripMiningIter=1000",
    "g1_48": "-XX:+UseG1GC -XX:+UnlockDiagnosticVMOptions -XX:+UseCountedLoopSafepoints -XX:LoopStripMiningIter=1000",
    "zgc48": "-XX:+UseZGC -XX:+UnlockDiagnosticVMOptions -XX:+UseCountedLoopSafepoints -XX:LoopStripMiningIter=1000",
}


def run_cell(jvm: str, cores: int, rep: int, sf_dir: str, reps: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_JVM_OPTS=jvm)
    p = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), str(rep), sf_dir, str(reps)],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    for line in p.stdout.splitlines():
        if line.startswith("@@R@@"):
            return json.loads(line[5:])
    return {"error": p.stderr[-800:]}


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else list(CONFIGS)
    for name in only:
        for cores in (8, 32):
            r = run_cell(CONFIGS[name], cores, rep, sf_dir, reps)
            print(json.dumps({"config": name, "cores": cores, **r}), flush=True)
