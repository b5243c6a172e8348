"""Sink fan-out writes (K7) and EVE JSON structure (K3)."""

from __future__ import annotations

import json
import os

from sagan_spark.pages import pages_table
from sagan_spark.pipeline import Pipeline
from sagan_spark.route.formats import eve_json

from .conftest import SF_DIR


def test_write_sinks_partitioned(spark, tmp_path):
    pipe = Pipeline(spark)
    pages = pages_table(spark, SF_DIR, rep=2)
    out = str(tmp_path / "sinks")
    counts = pipe.write_sinks(pages, out)
    assert set(counts) == {"fast", "alert", "eve", "external", "syslog", "smtp"}
    # single-pass layout: out/sink=<s>/signature_id=<n>/, readable back
    # per sink with the same totals
    for sink, n in counts.items():
        back = spark.read.parquet(f"{out}/sink={sink}")
        assert back.count() == n
        parts = [
            d for d in os.listdir(f"{out}/sink={sink}") if d.startswith("signature_id=")
        ]
        # one subdir per distinct signature routed to this sink (the
        # syslog/smtp sinks carry a single rule each)
        assert len(parts) == back.select("signature_id").distinct().count()


def test_eve_json_parses(spark):
    pipe = Pipeline(spark)
    pages = pages_table(spark, SF_DIR, rep=2)
    rows = eve_json(pipe.routed(pages)).limit(50).collect()
    assert rows
    for r in rows:
        ev = json.loads(r["event"])
        assert ev["event_type"] == "alert"
        assert ev["alert"]["signature_id"] >= 5000001
        assert "url" in ev and "timestamp" in ev
