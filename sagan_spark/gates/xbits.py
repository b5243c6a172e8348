"""xbits / flexbits as join-back state tables (SURVEY.md §2.6 A4-A5,
§3.3; [U] upstream src/xbit.c, src/xbit-mmap.c, src/flexbit.c).

Batch re-expression of the mmap bit store:

  * ``set`` / ``unset`` matches become rows of a **bit-event table**
    ``(name, key, warc_epoch, url, op, expire)``.
  * ``isset`` / ``isnotset`` testers LEFT-join back to the latest bit
    event at-or-before their own event time, under the deterministic
    total order ``(warc_epoch, url)`` (same-page set-then-test is
    visible, mirroring the reference's in-message rule ordering).
  * The bit is *set* iff that latest event is a ``set`` AND the tester
    is strictly inside the expiry window
    (``t.epoch < set.epoch + expire`` — a tester exactly at the expiry
    boundary sees the bit cleared, FIXTURES.md F4).

Scale: the join is equi on (name, key) with a range residual — a
shuffled hash join; hot keys ride on AQE skew splitting.  At 10^12
rows the bit-event table is partition-pruned by the same warc_ts
partitioning as the pages table (events can only affect testers within
max-expire of their partition, so per-partition processing carries a
bounded look-back tail — see runner/ checkpoint notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sagan_spark.gates.windows import track_key_col, track_key_sql
from sagan_spark.rules.model import Rule


def bit_ops_rows(rules: list[Rule]) -> tuple[list[tuple], list[tuple]]:
    """(writes, tests): (sid, name, track, op, expire) rows."""
    writes, tests = [], []
    for r in rules:
        for x in r.bit_writes():
            writes.append((r.sid, x.name, x.track, x.op, x.expire))
        for x in r.bit_tests():
            tests.append((r.sid, x.name, x.track, x.op))
    return writes, tests


def bit_events(df: DataFrame, writes_df: DataFrame) -> DataFrame:
    """Gated rows of writer rules → bit-event table."""
    ev = df.join(F.broadcast(writes_df), "sid", "inner")
    return ev.select(
        F.col("name"),
        track_key_col("track").alias("key"),
        F.col("warc_epoch"),
        F.col("url"),
        F.col("sid").alias("esid"),
        F.col("op"),
        F.col("expire"),
    )


def apply_bit_tests(df: DataFrame, rules: list[Rule], spark: SparkSession) -> DataFrame:
    """Filter tester-rule rows by their isset/isnotset conditions;
    non-tester rows pass through untouched."""
    writes, tests = bit_ops_rows(rules)
    if not tests:
        return df
    # df feeds three branches (events, testers, pass-through) — without
    # materialization each branch would recompute the entire upstream
    # match+window plan.  At cluster scale this is a staging write of
    # the (small) gated alert stream; locally MEMORY_AND_DISK persist.
    df = df.persist()
    writes_df = spark.createDataFrame(
        writes, schema="sid long, name string, track string, op string, expire int"
    )
    tests_df = spark.createDataFrame(
        tests, schema="sid long, name string, track string, test_op string"
    )
    events = bit_events(df, writes_df)

    tester_sids = {t[0] for t in tests}
    testers = df.where(F.col("sid").isin(list(tester_sids)))
    rest = df.where(~F.col("sid").isin(list(tester_sids)))

    t = testers.join(F.broadcast(tests_df), "sid", "inner").withColumn(
        "tkey", track_key_col("track")
    )
    e = events.select(
        F.col("name").alias("ename"),
        F.col("key").alias("ekey"),
        F.col("warc_epoch").alias("eepoch"),
        F.col("url").alias("eurl"),
        F.col("esid"),
        F.col("op").alias("eop"),
        F.col("expire").alias("eexpire"),
    )
    joined = t.join(
        e,
        (F.col("ename") == F.col("name"))
        & (F.col("ekey") == F.col("tkey"))
        & (
            (F.col("eepoch") < F.col("warc_epoch"))
            | ((F.col("eepoch") == F.col("warc_epoch")) & (F.col("eurl") <= F.col("url")))
        ),
        "left",
    )
    # total order over bit events: (epoch, url, writer sid) — the sid
    # tiebreak mirrors the reference's in-order rule evaluation on one
    # message (a later rule's unset overrides an earlier rule's set)
    w = Window.partitionBy("url", "sid", "name").orderBy(
        F.col("eepoch").desc_nulls_last(),
        F.col("eurl").desc_nulls_last(),
        F.col("esid").desc_nulls_last(),
    )
    latest = joined.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    isset = (
        F.col("eop").isNotNull()
        & (F.col("eop") == "set")
        & (
            F.col("eexpire").isNull()
            | (F.col("warc_epoch") < F.col("eepoch") + F.col("eexpire"))
        )
    )
    ok = F.when(F.col("test_op") == "isset", isset).otherwise(~isset)
    passed = latest.where(ok).drop(
        "_rn", "name", "track", "test_op", "tkey", "ename", "ekey", "eepoch", "eurl",
        "esid", "eop", "eexpire",
    )
    return rest.unionByName(passed)


def bit_values_sql(rules: list[Rule]) -> tuple[str, str]:
    writes, tests = bit_ops_rows(rules)

    def lit(v):
        return "NULL" if v is None else (str(v) if isinstance(v, int) else f"'{v}'")

    w = ", ".join("(" + ", ".join(lit(v) for v in row) + ")" for row in writes) or "(NULL, NULL, NULL, NULL, NULL)"
    t = ", ".join("(" + ", ".join(lit(v) for v in row) + ")" for row in tests) or "(NULL, NULL, NULL, NULL)"
    return (
        f"(VALUES {w}) AS bw(sid, name, track, op, expire)",
        f"(VALUES {t}) AS bt(sid, name, track, test_op)",
    )


def bit_tests_sql(rules: list[Rule], rel: str = "wgated") -> str:
    """DuckDB twin of :func:`apply_bit_tests`: returns the full SQL for
    the bit-gated relation (non-testers UNION passing testers)."""
    writes, tests = bit_ops_rows(rules)
    if not tests:
        return f"SELECT * FROM {rel}"
    wv, tv = bit_values_sql(rules)
    tester_sids = ", ".join(str(t[0]) for t in tests)
    ekey = track_key_sql("bw.track", prefix="g.")
    tkey = track_key_sql("bt.track", prefix="t.")
    cols = (
        "url, domain, warc_epoch, text, lang, source, sid, ips, port_x, proto_x, "
        "md5_x, sha1_x, sha256_x, src_ip, dst_ip, port, proto, hash, classtype, "
        "country_track, country_is, country_isnot, sink, rev, after_track, "
        "after_count, after_seconds, th_type, th_track, th_count, th_seconds, "
        "src_cc, dst_cc, priority, description"
    )
    return f"""
SELECT {cols} FROM {rel} WHERE sid NOT IN ({tester_sids})
UNION ALL
SELECT {cols} FROM (
  SELECT t.*, ev.eop, ev.eexpire, ev.eepoch,
    row_number() OVER (PARTITION BY t.url, t.sid, bt.name
                       ORDER BY ev.eepoch DESC NULLS LAST, ev.eurl DESC NULLS LAST,
                                ev.esid DESC NULLS LAST) AS _rn,
    bt.test_op AS _test_op
  FROM {rel} t
  JOIN {tv} ON t.sid = bt.sid
  LEFT JOIN (
    SELECT bw.name AS ename, {ekey} AS ekey, g.warc_epoch AS eepoch,
           g.url AS eurl, g.sid AS esid, bw.op AS eop, bw.expire AS eexpire
    FROM {rel} g JOIN {wv} ON g.sid = bw.sid
  ) ev ON ev.ename = bt.name AND ev.ekey = {tkey}
      AND (ev.eepoch < t.warc_epoch
           OR (ev.eepoch = t.warc_epoch AND ev.eurl <= t.url))
) q
WHERE _rn = 1 AND (
  CASE WHEN _test_op = 'isset'
    THEN (eop = 'set' AND (eexpire IS NULL OR warc_epoch < eepoch + eexpire))
    ELSE NOT coalesce(eop = 'set' AND (eexpire IS NULL OR warc_epoch < eepoch + eexpire), FALSE)
  END)
""".strip()
