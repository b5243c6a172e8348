"""YAML config loader (sagan.yaml analog) drives a full pipeline."""

from __future__ import annotations

from sagan_spark.config import load_config, pipeline_from_config
from sagan_spark.pages import pages_table

from .conftest import SF_DIR

EX = "/root/repo/examples/sagan.yaml"


def test_load_config_parses_everything():
    cfg = load_config(EX)
    assert [r.sid for r in cfg.rules] == [6000001, 6000002, 6000003, 6000004]
    assert cfg.rules[0].lang == ("en",)  # $VAR substitution didn't break parsing
    assert [r.sink for r in cfg.rules] == ["fast", "eve", "syslog", "smtp"]
    assert ("web-anomaly", "Anomalous web page", 2) in cfg.classifications
    assert len(cfg.geo_ranges) == 3 and cfg.geo_ranges[0][3] == "US"
    assert cfg.program_proto == [("src0", "tcp"), ("src1", "udp")]
    assert cfg.outputs == ["fast", "eve"]


def test_pipeline_from_config_runs(spark):
    pipe = pipeline_from_config(spark, EX)
    pages = pages_table(spark, SF_DIR, rep=2)
    counts = {r["signature_id"]: r["n"] for r in pipe.sink_counts(pages).collect()}
    # 6000004 (flexbits count gt 2) may legitimately pass nowhere at rep=2
    assert {6000001, 6000002, 6000003} <= set(counts) <= {
        6000001,
        6000002,
        6000003,
        6000004,
    }
    assert counts[6000001] > 0
    # limit gate: at most 3 per domain per 2h window → bounded well below
    # the raw udp-match count
    raw = pipe.hits(pages).where("sid = 6000002").count()
    assert 0 < counts[6000002] < raw
