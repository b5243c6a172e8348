"""dedup_clusters scale hygiene (VERDICT r2 item 4): lineage stays
O(1)-deep via per-round localCheckpoint, so a ≥50-round chain (path
graph, diameter = n-1) converges without planning-time blowup; exiting
via max_iter while labels still move raises instead of silently
returning wrong clusters."""

from __future__ import annotations

import time

import pytest

from sagan_spark.datapipe.dedup import dedup_clusters

CHAIN_N = 55


def _chain(spark):
    corpus = spark.range(CHAIN_N).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(CHAIN_N - 1)], schema="a long, b long"
    )
    return corpus, pairs


def test_long_chain_converges_fast(spark):
    corpus, pairs = _chain(spark)
    t0 = time.time()
    out = dedup_clusters(corpus, pairs, max_iter=CHAIN_N + 5).collect()
    wall = time.time() - t0
    assert {r["cluster"] for r in out} == {0}
    assert sum(r["is_keeper"] for r in out) == 1
    assert len(out) == CHAIN_N
    # ~54 rounds of 2 tiny joins each: without lineage truncation the
    # k-deep plan re-analysis alone blows far past this bound
    assert wall < 240, f"chain propagation took {wall:.0f}s — lineage likely deepening"


def test_unconverged_raises(spark):
    corpus, pairs = _chain(spark)
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(corpus, pairs, max_iter=3)
