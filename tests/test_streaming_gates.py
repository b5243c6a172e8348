"""Streaming stateful gates agree with the batch window gates
(VERDICT r1 item 9): the after-gated and suppress-gated row sets for
fixture sids 5000017/5000018 match the batch pipeline exactly under an
in-order availableNow drain."""

from __future__ import annotations

from pyspark.sql import functions as F

from sagan_spark.pages import pages_table
from sagan_spark.pipeline import Pipeline
from sagan_spark.streaming.gates import after_gate_stream, suppress_gate_stream
from sagan_spark.streaming.stream import read_pages_stream, streaming_hits

from .conftest import SF_DIR


def _drain(spark, gated, tmp_path, name):
    q = (
        gated.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {r["url"] for r in spark.table(name).collect()}


def test_streaming_after_and_suppress_match_batch(spark, tmp_path):
    pages = pages_table(spark, SF_DIR, rep=2)
    src = str(tmp_path / "pages_src")
    # one file → one micro-batch → event-time order within groups is
    # establishable; the agreement contract is documented for this case
    pages.coalesce(1).write.mode("overwrite").parquet(src)

    hits = streaming_hits(read_pages_stream(spark, src))
    got_after = _drain(
        spark,
        after_gate_stream(hits, 5000017, "by_domain", 3, 3600),
        tmp_path,
        "after_stream",
    )
    got_supp = _drain(
        spark,
        suppress_gate_stream(hits, 5000018, "by_domain", 5, 3600),
        tmp_path,
        "supp_stream",
    )

    pipe = Pipeline(spark)
    batch = pipe.window_gated(spark.read.parquet(src))
    exp_after = {
        r["url"] for r in batch.where(F.col("sid") == 5000017).select("url").collect()
    }
    exp_supp = {
        r["url"] for r in batch.where(F.col("sid") == 5000018).select("url").collect()
    }
    assert got_after == exp_after and len(exp_after) > 0
    assert got_supp == exp_supp and len(exp_supp) > 0
