"""Output sink formats (SURVEY.md §2.1 K1-K3; [U] upstream
src/output-plugins/{fast,alert,eve}.c).

``fast_lines`` renders the one-line Snort "fast" alert format with
builtin string expressions (dual-dialect, oracle-checked);
``eve_json`` renders Suricata-style EVE records via ``to_json`` —
engine-native JSON serialization differs cosmetically between engines,
so its test asserts structure (parse-back), not byte equality."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# [U] fast.c format: "ts  [**] [gid:sid:rev] msg [**] [Classification: x]
# [Priority: n] {proto} src:port -> dst:port".  Ours keys on url/domain.


def fast_lines(routed: DataFrame) -> DataFrame:
    line = F.concat(
        F.col("warc_epoch").cast("string"),
        F.lit("  [**] [1:"),
        F.col("signature_id").cast("string"),
        F.lit(":1] [Classification: "),
        F.coalesce("classtype", F.lit("unknown")),
        F.lit("] [Priority: "),
        F.coalesce(F.col("priority").cast("string"), F.lit("0")),
        F.lit("] {"),
        F.coalesce("proto", F.lit("none")),
        F.lit("} "),
        F.coalesce("src_ip", F.lit("-")),
        F.lit(" -> "),
        F.coalesce("dst_ip", F.lit("-")),
        F.lit(" "),
        F.col("url"),
    )
    return routed.select("sink", F.col("signature_id"), F.col("url"), line.alias("line"))


def fast_lines_sql() -> str:
    """DuckDB twin over the oracle `routed` CTE."""
    return """
SELECT sink, signature_id, url,
  CAST(warc_epoch AS VARCHAR) || '  [**] [1:' || CAST(signature_id AS VARCHAR)
  || ':1] [Classification: ' || coalesce(classtype, 'unknown')
  || '] [Priority: ' || coalesce(CAST(priority AS VARCHAR), '0')
  || '] {' || coalesce(proto, 'none') || '} ' || coalesce(src_ip, '-')
  || ' -> ' || coalesce(dst_ip, '-') || ' ' || url AS line
FROM routed
""".strip()


def eve_json(routed: DataFrame) -> DataFrame:
    """EVE-style JSON event per alert ([U] eve.c: timestamp, event_type,
    alert{...}, plus the original record)."""
    rec = F.struct(
        F.col("warc_epoch").alias("timestamp"),
        F.lit("alert").alias("event_type"),
        F.struct(
            F.col("signature_id").alias("signature_id"),
            F.col("classtype").alias("category"),
            F.col("priority").alias("severity"),
            F.split(F.col("refs"), r"\|").alias("references"),
        ).alias("alert"),
        F.col("url"),
        F.col("domain"),
        F.col("src_ip"),
        F.col("dst_ip"),
        F.col("proto"),
    )
    return routed.select("sink", F.to_json(rec).alias("event"))
