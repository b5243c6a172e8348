"""Standalone peak-RSS audit of the heavy DuckDB oracle twins
(VERDICT r4 item 6: no oracle should need >2 GB standalone).

Each oracle runs in its OWN subprocess so ru_maxrss is per-query, with
the same memory_limit/temp_directory the test harness sets
(tests/conftest.py) so the number reflects the harness contract.

Usage: python scripts/oracle_rss.py [sf_dir] [query ...]
Prints one JSON line per query: {"query", "wall_s", "peak_rss_mb", "rows"}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, resource, sys, time
import duckdb
sys.path.insert(0, {repo!r})
from __spark_entry__ import oracle_sql

sf_dir, q = {sf_dir!r}, {query!r}
con = duckdb.connect()
con.execute("SET memory_limit='4GB'")
con.execute("SET temp_directory='/tmp/duckdb_spill'")
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    con.execute(f"CREATE VIEW {{t}} AS SELECT * FROM '{{sf_dir}}/{{t}}.parquet'")
t0 = time.time()
rows = con.execute(oracle_sql()[q]).fetchall()
wall = time.time() - t0
peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
print("@@RSS@@" + json.dumps(
    {{"query": q, "wall_s": round(wall, 2),
      "peak_rss_mb": round(peak_mb, 1), "rows": len(rows)}}))
"""

HEAVY = [
    "ann_ivf_topk",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "ann_lsh_multiprobe",
    "ann_lsh_bucketed",
    "dedup_minhash_lsh_pairs",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    queries = sys.argv[2:] or HEAVY
    for q in queries:
        p = subprocess.run(
            [sys.executable, "-c", CHILD.format(repo=REPO, sf_dir=sf_dir, query=q)],
            capture_output=True, text=True, timeout=600, cwd=REPO,
        )
        out = [l for l in p.stdout.splitlines() if l.startswith("@@RSS@@")]
        if out:
            print(out[0][len("@@RSS@@"):], flush=True)
        else:
            print(json.dumps({"query": q, "error": p.stderr[-500:]}), flush=True)


if __name__ == "__main__":
    main()
