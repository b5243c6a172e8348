"""DuckDB oracle assembly — the SQL twin of :mod:`sagan_spark.pipeline`.

Every stage module emits its own DuckDB fragment (written next to the
Spark builder it mirrors); this module chains them into one WITH-CTE
pipeline so each ``queries()`` entry in ``__spark_entry__.py`` has a
full ANSI-SQL oracle.  The oracle intentionally takes *independent*
implementation routes where possible (e.g. GeoIP longest-prefix via
ORDER BY prefix_len instead of the engine's pre-flattened dimension) so
it verifies logic, not just mirrors it.
"""

from __future__ import annotations

from sagan_spark.enrich.enrich import country_gate_sql, geo_sql
from sagan_spark.gates.windows import gates_cfg_values_sql, window_gates_sql
from sagan_spark.gates.xbits import bit_tests_sql
from sagan_spark.pages import pages_cte
from sagan_spark.parse.extract import extraction_sql, shared_extracts_sql
from sagan_spark.rules.compiler import CompiledRules
from sagan_spark.rules.fixture_rules import (
    PROGRAM_PROTO,
    classification_values_sql,
    fixture_rules,
    geo_values_sql,
)
from sagan_spark.rules.model import Rule


def pipeline_ctes(rules: list[Rule] | None = None, rep: int = 8) -> str:
    """``WITH pages AS (...), ..., routed AS (...)`` chain."""
    rules = list(rules) if rules is not None else list(fixture_rules())
    comp = CompiledRules(rules)
    ref_rows = [(r.sid, "|".join(r.references)) for r in rules if r.references]
    if ref_rows:
        refs_vals = ", ".join(f"({sid}, '{s}')" for sid, s in ref_rows)
        refs_join = (
            f"LEFT JOIN (VALUES {refs_vals}) AS refs(sid, refs) ON bgated.sid = refs.sid"
        )
        refs_col = "refs.refs"
    else:
        refs_join, refs_col = "", "CAST(NULL AS VARCHAR) AS refs"
    # cgated/wgated are AS MATERIALIZED: bit_tests_sql references wgated
    # ~7 times and DuckDB re-evaluates inlined CTEs per reference —
    # measured 7.6 s / 2.73 GB inlined vs 2.8 s / 1.85 GB materialized
    # for sink_alert_blocks at sf0.01 (VERDICT r4 item 6).  extracted/
    # enriched stay inlined: materializing them changes DuckDB's type
    # inference for the empty-VALUES list literals inside and trips a
    # list_position binder error.
    return f"""
WITH pages AS (
{pages_cte(rep)}
),
matched AS (
{comp.matched_sql()}
),
shared AS (
  SELECT m.*, {shared_extracts_sql()} FROM matched m
),
extracted AS (
{extraction_sql(rules, PROGRAM_PROTO)}
),
enriched AS (
  SELECT e.*,
    gcfg.after_track, gcfg.after_count, gcfg.after_seconds,
    gcfg.th_type, gcfg.th_track, gcfg.th_count, gcfg.th_seconds,
    {geo_sql("e.src_ip", "src_cc", geo_values_sql())},
    {geo_sql("e.dst_ip", "dst_cc", geo_values_sql())},
    classification.priority, classification.description
  FROM extracted e
  LEFT JOIN {gates_cfg_values_sql(rules)} ON e.sid = gcfg.sid
  LEFT JOIN {classification_values_sql()} ON e.classtype = classification.classtype
),
cgated AS MATERIALIZED (
  SELECT * FROM enriched WHERE {country_gate_sql()}
),
wgated AS MATERIALIZED (
{window_gates_sql(rules, "cgated")}
),
bgated AS (
{bit_tests_sql(rules, "wgated")}
),
routed AS (
  SELECT sink, bgated.sid AS signature_id, url, domain, warc_epoch, src_ip, dst_ip,
         port, dst_port, proto, hash, src_cc, dst_cc, classtype, priority, rev, {refs_col}
  FROM bgated {refs_join}
)
""".strip()


def oracle_query(select_sql: str, rules: list[Rule] | None = None, rep: int = 8) -> str:
    return pipeline_ctes(rules, rep) + "\n" + select_sql
