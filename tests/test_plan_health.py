"""Physical-plan health pins (SURVEY.md §4): the properties that make
the 100 TB story true are asserted on the actual executed plans, not
just claimed in docstrings.

  * column pruning: the match stage never scans the wide ``html``
    binary column (only plans that reference it may);
  * join strategy: no BroadcastNestedLoopJoin / CartesianProduct
    anywhere in the flagship — every dimension join must stay a
    broadcast HASH join (the geo range join carries an equality
    conjunct precisely so it hash-joins);
  * the only Python crossings are the gated Arrow regex batches
    (ArrowEvalPython), never row-at-a-time BatchEvalPython.
"""

from __future__ import annotations

from sagan_spark.pages import pages_table
from sagan_spark.pipeline import Pipeline

from .conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_match_scan_prunes_html(spark):
    pipe = Pipeline(spark)
    pages = pages_table(spark, SF_DIR, rep=1)
    plan = _plan(pipe.hits(pages))
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines, "no FileScan in match plan"
    for ln in scan_lines:
        assert "html" not in ln, f"match stage scans the wide html column: {ln}"


def test_flagship_no_nested_loop_join(spark):
    pipe = Pipeline(spark)
    pages = pages_table(spark, SF_DIR, rep=1)
    plan = _plan(pipe.sink_counts(pages))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the dimension joins


def test_ivf_corpus_side_no_shuffle(spark):
    """IVF cell assignment must be a pure projection on the corpus
    side: the centroid set rides in as a one-row broadcast (nested-loop
    is FINE there — one row), and no Exchange may touch the corpus
    stream.  The only shuffle in the whole plan is the single-row
    collect_list aggregate on the centroid side."""
    from sagan_spark.datapipe.similarity import ivf_cells, load_embeddings

    plan = _plan(ivf_cells(load_embeddings(spark, SF_DIR)))
    # corpus scan feeds the broadcast join directly — no Exchange between
    # the embeddings FileScan and the BroadcastNestedLoopJoin
    corpus_branch = plan.split("BroadcastExchange")[0]
    assert "embeddings.parquet" in corpus_branch
    assert "Exchange" not in corpus_branch, (
        "corpus side of IVF assignment shuffles:\n" + corpus_branch
    )


def test_python_crossings_are_arrow_only(spark):
    pipe = Pipeline(spark)
    pages = pages_table(spark, SF_DIR, rep=1)
    # sink_counts' own plan starts at the staged-parquet scan (the
    # staging write runs as its own job), so the Python crossing is
    # checked on the pre-staging match plan
    match_plan = _plan(pipe.hits(pages))
    assert "BatchEvalPython" not in match_plan, "row-at-a-time Python UDF in hot path"
    assert "ArrowEvalPython" in match_plan  # the gated regex batches
    assert "BatchEvalPython" not in _plan(pipe.sink_counts(pages))
