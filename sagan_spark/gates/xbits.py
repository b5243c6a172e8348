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


def bit_count_rows(rules: list[Rule]) -> list[tuple]:
    """flexbits ``count`` testers: (sid, name, track, cmp, value)."""
    return [
        (r.sid, x.name, x.track, x.cmp, x.value)
        for r in rules
        for x in r.bit_counts()
    ]


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


def apply_bit_tests(
    df: DataFrame, rules: list[Rule], spark: SparkSession, persist: bool = True
) -> DataFrame:
    """Filter tester-rule rows by their isset/isnotset conditions;
    non-tester rows pass through untouched.

    Scale-critical formulation: a naive (events × testers) join on
    (name, key) is O(E·T) **per key** and melts down on hot Zipf
    domains (measured: a 3-task straggler stage at 80k pages).
    Instead, events and testers are UNIONed into one stream per
    (name, key), sorted once by the deterministic total order
    (epoch, url, kind, writer-sid), and each tester reads the latest
    bit event via ``last(..., ignorenulls)`` over the running window —
    one shuffle + sort, linear per key, hot keys are just longer sorted
    runs (no pairwise blowup).  The DuckDB oracle keeps the join+
    row_number formulation as an independent cross-check."""
    writes, tests = bit_ops_rows(rules)
    counts = bit_count_rows(rules)
    if not tests and not counts:
        return df
    # df feeds three branches (events, testers, pass-through) — without
    # materialization each branch would recompute the entire upstream
    # match+window plan.  At cluster scale this is a staging write of
    # the (small) gated alert stream; locally MEMORY_AND_DISK persist.
    # The pipeline passes persist=False: its window stage already
    # persists the pre-window base, and every branch's sid filter
    # pushes through the Window operators (sid is a partition key of
    # all of them) down to that persisted frame — a second
    # materialization of the same ~10×-exploded stream buys nothing.
    if persist:
        from sagan_spark.gates.windows import stage_frame

        df = stage_frame(df, "bitbase")
    writes_df = spark.createDataFrame(
        writes, schema="sid long, name string, track string, op string, expire int"
    )
    tester_sids = {t[0] for t in tests}
    count_sids = {c[0] for c in counts}
    rest = df.where(~F.col("sid").isin(list(tester_sids | count_sids)))
    if counts:
        rest = rest.unionByName(
            _apply_count_tests(df, counts, writes_df, spark)
        )
    if not tests:
        return rest
    tests_df = spark.createDataFrame(
        tests, schema="sid long, name string, track string, test_op string"
    )

    payload_cols = df.columns
    events = bit_events(df, writes_df).select(
        F.col("name").alias("bname"),
        F.col("key").alias("bkey"),
        "warc_epoch",
        "url",
        F.lit(0).alias("kind"),  # events sort before same-(epoch,url) testers
        F.struct(
            F.col("warc_epoch").alias("eepoch"),
            F.col("esid"),
            F.col("op").alias("eop"),
            F.col("expire").alias("eexpire"),
        ).alias("bev"),
        F.lit(None).cast("string").alias("test_op"),
    )

    testers = (
        df.where(F.col("sid").isin(list(tester_sids)))
        .join(F.broadcast(tests_df), "sid", "inner")
        .select(
            F.col("name").alias("bname"),
            track_key_col("track").alias("bkey"),
            F.col("warc_epoch"),
            F.col("url"),
            F.lit(1).alias("kind"),
            F.lit(None)
            .cast("struct<eepoch: long, esid: long, eop: string, eexpire: int>")
            .alias("bev"),
            F.col("test_op"),
            F.struct(*[F.col(c) for c in payload_cols]).alias("payload"),
        )
    )
    events = events.withColumn(
        "payload", F.lit(None).cast(testers.schema["payload"].dataType)
    )

    stream = events.unionByName(testers)
    w = (
        Window.partitionBy("bname", "bkey")
        .orderBy(
            "warc_epoch", "url", "kind", F.col("bev.esid").asc_nulls_last()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    latest = stream.withColumn("lev", F.last("bev", ignorenulls=True).over(w))

    isset = (
        F.col("lev").isNotNull()
        & (F.col("lev.eop") == "set")
        & (
            F.col("lev.eexpire").isNull()
            | (F.col("warc_epoch") < F.col("lev.eepoch") + F.col("lev.eexpire"))
        )
    )
    ok = F.when(F.col("test_op") == "isset", isset).otherwise(~isset)
    passed = (
        latest.where((F.col("kind") == 1) & ok)
        .select("payload.*")
    )
    return rest.unionByName(passed)


def _apply_count_tests(
    df: DataFrame, counts: list[tuple], writes_df: DataFrame, spark: SparkSession
) -> DataFrame:
    """flexbits ``count`` testers ([U] src/flexbit.c counter form).

    Semantics (fixture-defining, mirrored in :func:`bit_tests_sql`):
    the counter value at a tester's event time is the number of
    UNEXPIRED ``set`` events for (name, key) at-or-before it under the
    total order (warc_epoch, url); ``unset`` does not decrement.  The
    tester passes iff ``count <cmp> value`` for ALL of its count tests.

    Scale shape (r3 fix): the first cut was a LEFT equi-join on
    (name, key) with time/expiry residuals + a per-tester count.  That
    join's output is O(sets × testers) **per key** — on the fixture's
    hot Zipf domain at 320k pages it emits ~10^9 rows inside one key
    group and a 2-core bench cell ran 6 minutes per rep (correct at
    rep=4, melted at rep=64: the exact hot-key pathology the isset path
    already avoids).  Count needs the event multiset, but a COUNT over
    a multiset is a RUNNING SUM over a sorted stream: union set(+1) /
    expiry(-1) / tester(read) rows per (name, key), sort once by the
    deterministic total order, take sum(delta) over the running window.
    One shuffle + sort, linear per key — hot keys are longer sorted
    runs, never a pairwise blowup.  Ordering encodes the exact
    semantics: at equal epoch, expiries (k0=0) precede everything
    (expired iff t ≥ eepoch+expire), then sets/testers interleave by
    url with set-before-tester at equal url (counted iff eurl ≤ url).
    Sets with expire ≤ 0 can never be counted ((eepoch ≤ t) ∧
    (t < eepoch) is empty) and are dropped from both streams.

    Stage economy (the flagship's 2→8-core efficiency pays for every
    extra stage): tester rows carry their full payload struct through
    the sweep (same trick as the isset path), and a set row emits its
    optional expiry row via one explode — so the whole operator is two
    scans of the staged base, ONE window shuffle, and ONE aggregation
    over tester rows (ALL-tests-pass via min over the payload group).
    No join-backs.  The DuckDB oracle keeps the join+filter formulation
    as an independent cross-check."""
    cdf = spark.createDataFrame(
        counts, schema="sid long, name string, track string, cmp string, cval int"
    )
    payload_cols = df.columns
    tester_rows = df.join(F.broadcast(cdf), "sid", "inner").select(
        F.col("name").alias("cname"),
        track_key_col("track").alias("ckey"),
        F.col("warc_epoch").alias("epoch"),
        F.lit(1).alias("k0"),
        F.col("url").alias("surl"),
        F.lit(1).alias("k1"),
        F.lit(0).alias("delta"),
        "cmp",
        "cval",
        F.struct(*[F.col(c) for c in payload_cols]).alias("payload"),
    )
    sets = (
        bit_events(df, writes_df)
        .where(F.col("op") == "set")
        .where(F.col("name").isin([c[1] for c in counts]))
        .where(F.col("expire").isNull() | (F.col("expire") > 0))
    )
    # one scan → (+1 at the set position) and (-1 at its expiry) rows
    ev_pair = F.array(
        F.struct(
            F.col("warc_epoch").cast("long").alias("epoch"),
            F.lit(1).alias("k0"),
            F.col("url").alias("surl"),
            F.lit(0).alias("k1"),
            F.lit(1).alias("delta"),
        ),
        F.when(
            F.col("expire").isNotNull(),
            F.struct(
                (F.col("warc_epoch") + F.col("expire")).cast("long").alias("epoch"),
                F.lit(0).alias("k0"),
                F.lit("").alias("surl"),
                F.lit(0).alias("k1"),
                F.lit(-1).alias("delta"),
            ),
        ),
    )
    event_rows = (
        sets.select(
            F.col("name").alias("cname"),
            F.col("key").alias("ckey"),
            F.explode(ev_pair).alias("e"),
        )
        .where(F.col("e").isNotNull())
        .select(
            "cname",
            "ckey",
            F.col("e.epoch").alias("epoch"),
            F.col("e.k0").alias("k0"),
            F.col("e.surl").alias("surl"),
            F.col("e.k1").alias("k1"),
            F.col("e.delta").alias("delta"),
            F.lit(None).cast("string").alias("cmp"),
            F.lit(None).cast("int").alias("cval"),
            F.lit(None).cast(tester_rows.schema["payload"].dataType).alias("payload"),
        )
    )
    stream = event_rows.unionByName(tester_rows)
    w = (
        Window.partitionBy("cname", "ckey")
        .orderBy("epoch", "k0", "surl", "k1")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.sum("delta").over(w)
    ok = (
        F.when(F.col("cmp") == "gt", n > F.col("cval"))
        .when(F.col("cmp") == "lt", n < F.col("cval"))
        .otherwise(n == F.col("cval"))
    )
    return (
        stream.withColumn("_ok", ok)
        .where(F.col("k1") == 1)
        .groupBy("payload")
        .agg(F.min(F.col("_ok").cast("int")).alias("_all_ok"))
        .where(F.col("_all_ok") == 1)
        .select("payload.*")
    )


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
    the bit-gated relation (non-testers UNION passing isset/isnotset
    testers UNION passing flexbits-count testers)."""
    writes, tests = bit_ops_rows(rules)
    counts = bit_count_rows(rules)
    if not tests and not counts:
        return f"SELECT * FROM {rel}"
    wv, tv = bit_values_sql(rules)
    all_tester_sids = ", ".join(
        str(s) for s in sorted({t[0] for t in tests} | {c[0] for c in counts})
    )
    ekey = track_key_sql("bw.track", prefix="g.")
    tkey = track_key_sql("bt.track", prefix="t.")
    cols = (
        "url, domain, warc_epoch, text, lang, source, sid, ips, port_x, proto_x, "
        "md5_x, sha1_x, sha256_x, src_ip, dst_ip, port, proto, hash, classtype, "
        "country_track, country_is, country_isnot, sink, rev, after_track, "
        "after_count, after_seconds, th_type, th_track, th_count, th_seconds, "
        "src_cc, dst_cc, priority, description"
    )
    count_branch = ""
    if counts:
        cvals = ", ".join(
            f"({sid}, '{name}', '{track}', '{cmp}', {val})"
            for sid, name, track, cmp, val in counts
        )
        cv = f"(VALUES {cvals}) AS bc(sid, name, track, cmp, cval)"
        ckey = track_key_sql("bc.track", prefix="t2.")
        count_branch = f"""
UNION ALL
SELECT {cols} FROM {rel} t
WHERE t.sid IN ({", ".join(str(c[0]) for c in counts)})
  AND (t.url, t.sid) IN (
    SELECT (url, sid) FROM (
      SELECT t2.url, t2.sid, bc.cmp, bc.cval, count(ev.eurl) AS n
      FROM {rel} t2 JOIN {cv} ON t2.sid = bc.sid
      LEFT JOIN (
        SELECT bw.name AS ename, {ekey} AS ekey, g.warc_epoch AS eepoch,
               g.url AS eurl, bw.expire AS eexpire
        FROM {rel} g JOIN {wv} ON g.sid = bw.sid WHERE bw.op = 'set'
      ) ev ON ev.ename = bc.name AND ev.ekey = {ckey}
          AND (ev.eepoch < t2.warc_epoch
               OR (ev.eepoch = t2.warc_epoch AND ev.eurl <= t2.url))
          AND (ev.eexpire IS NULL OR t2.warc_epoch < ev.eepoch + ev.eexpire)
      GROUP BY t2.url, t2.sid, bc.name, bc.cmp, bc.cval
    ) GROUP BY url, sid
    HAVING bool_and(CASE cmp WHEN 'gt' THEN n > cval
                             WHEN 'lt' THEN n < cval
                             ELSE n = cval END))
""".rstrip()
    if not tests:
        return (
            f"SELECT {cols} FROM {rel} WHERE sid NOT IN ({all_tester_sids})"
            + count_branch
        )
    return f"""
SELECT {cols} FROM {rel} WHERE sid NOT IN ({all_tester_sids}){count_branch}
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
