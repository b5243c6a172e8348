"""Stateful streaming gates (SURVEY.md §2.6 A1/A3 on the §2.7
streaming path): ``after`` and ``threshold suppress`` as
``applyInPandasWithState`` over (sid, gate_key) groups — the streaming
re-expression of the batch keyed-window aggregates in
``gates/windows.py`` ([U] upstream holds the same per-key counters in
mmap; here the rolling-event buffer is Spark-managed state).

State = the rolling list of event epochs within the last S seconds for
the group; each micro-batch's rows are processed in (warc_epoch, url)
order within the group.  Agreement with the batch gates is exact when
micro-batches arrive in event-time order (the availableNow file-drain
case, pinned by tests/test_streaming_gates.py); under out-of-order
arrival the watermarked batch path remains the source of truth —
SURVEY.md §2.7 note.

Scale: state per (sid, key) is O(events in S window) — bounded by the
gate's own window; groups shard across executors by the same
(sid, key) hash as the batch exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = "url string, domain string, warc_epoch long, sid long"
STATE_SCHEMA = "epochs array<long>"


def gate_key_col(track: str) -> Column:
    if track == "by_src":
        return F.col("src_ip")
    if track == "by_dst":
        return F.col("dst_ip")
    if track == "by_username":
        return F.col("source")
    if track == "ip_pair":
        return F.concat_ws(">", "src_ip", "dst_ip")
    return F.col("domain")  # by_domain / by_string


def _rolling_fn(count: int, seconds: int, mode: str):
    """mode='after': emit once rolling count > N (boundary-inclusive,
    same as batch rangeBetween(-S, 0)); mode='suppress': emit while
    rolling count <= N."""
    import pandas as pd

    def fn(key, pdf_iter, state):
        buf = list(state.get()[0]) if state.exists else []
        frames = list(pdf_iter)
        rows = pd.concat(frames, ignore_index=True)
        rows = rows.sort_values(["warc_epoch", "url"], ignore_index=True)
        keep = []
        for t in rows["warc_epoch"]:
            t = int(t)
            buf.append(t)
            buf = [x for x in buf if x >= t - seconds]
            n = len(buf)
            keep.append(n > count if mode == "after" else n <= count)
        state.update((buf,))
        out = rows[pd.Series(keep)]
        yield out[["url", "domain", "warc_epoch", "sid"]]

    return fn


def _apply(
    hits: DataFrame, sid: int, track: str, fn, state_schema: str = STATE_SCHEMA
) -> DataFrame:
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = hits.where(F.col("sid") == sid).withColumn("gate_key", gate_key_col(track))
    return keyed.groupBy("sid", "gate_key").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


BIT_STATE_SCHEMA = "eepoch long, eop string, eexpire long, expiries array<long>"

# sentinel expiry for `set` events with no expire: effectively never
_NEVER = 1 << 62


def _bit_fn():
    """Per-(name, key) streaming bit store ([U] src/xbit.c latest-bit
    slot + src/flexbit.c counter form — the mmap slot becomes group
    state).  State carries BOTH views of the event history:

      * (eepoch, eop, eexpire) — the LATEST bit event, for
        isset/isnotset testers (set + strictly-inside expiry — same
        boundary as gates/xbits.py);
      * ``expiries`` — the expiry min-multiset of UNEXPIRED ``set``
        events, for ``count`` testers: counter value at tester time t =
        number of entries > t (an entry expiring exactly at t is dead,
        matching the batch sweep's expiry-before-tester ordering;
        ``unset`` does not decrement — documented counter semantics).

    Rows are processed in the batch path's total order (warc_epoch,
    url, kind, sid): writer rows (kind=0) update the state — same-url
    set-before-tester matches the batch (epoch, k0, surl, k1) order —
    tester rows (kind=1) evaluate against it."""
    import pandas as pd

    def fn(key, pdf_iter, state):
        expiries: list[int] = []
        if state.exists:
            eepoch, eop, eexpire, stored = state.get()
            expiries = sorted(stored or [])
            if eepoch < 0:
                eepoch, eop, eexpire = None, None, None
            elif eexpire < 0:
                eexpire = None
        else:
            eepoch, eop, eexpire = None, None, None
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        rows = rows.sort_values(
            ["warc_epoch", "url", "kind", "sid"], ignore_index=True
        )
        keep = []
        for r in rows.itertuples():
            t = int(r.warc_epoch)
            if r.kind == 0:
                eepoch, eop = t, r.op
                eexpire = None if pd.isna(r.expire) else int(r.expire)
                keep.append(False)
                if r.op == "set":
                    # expire <= 0 can never be counted (dead on arrival)
                    if eexpire is None:
                        expiries.append(_NEVER)
                    elif eexpire > 0:
                        expiries.append(t + eexpire)
            elif r.test_op == "count":
                expiries = [x for x in expiries if x > t]
                n = len(expiries)
                ok = True
                for spec in str(r.cmps).split("|"):
                    cmp_, val = spec.split(":")
                    v = int(val)
                    ok = ok and (
                        n > v if cmp_ == "gt" else n < v if cmp_ == "lt" else n == v
                    )
                keep.append(ok)
            else:
                isset = (
                    eop == "set"
                    and eepoch is not None
                    and (eexpire is None or t < eepoch + eexpire)
                )
                keep.append(isset if r.test_op == "isset" else not isset)
        # entries at-or-before the last processed event time are dead for
        # every future tester (in-order arrival contract) — pruning here
        # bounds the state by the sets inside the max expire window
        t_last = int(rows["warc_epoch"].iloc[-1])
        state.update(
            (
                -1 if eepoch is None else eepoch,
                eop or "",
                -1 if eexpire is None else eexpire,
                sorted(x for x in expiries if x > t_last),
            )
        )
        out = rows[pd.Series(keep)]
        yield out[["url", "domain", "warc_epoch", "sid"]]

    return fn


def xbits_gate_stream(hits: DataFrame, rules) -> DataFrame:
    """Streaming xbits/flexbits set/unset/isset/isnotset/**count**
    (SURVEY §2.6 A4-A5 on the streaming path; r4 closes the last gap —
    ``count`` testers previously raised NotImplementedError here).

    Writer- and tester-rule rows are unioned into one (name, key)
    stream; ``applyInPandasWithState`` holds the latest bit event AND
    the unexpired-set expiry multiset per group ([U] src/xbit.c,
    src/flexbit.c counter form).  A rule's multiple count tests ride in
    one ``cmps`` spec string ("gt:2|lt:5" — ALL must pass).  Agreement
    with the batch join-back (gates/xbits.py) is exact under in-order
    arrival (availableNow drain — pinned by
    tests/test_streaming_gates.py)."""
    from functools import reduce

    from sagan_spark.gates.xbits import bit_count_rows, bit_ops_rows

    writes, tests = bit_ops_rows(rules)
    counts = bit_count_rows(rules)
    if not tests and not counts:
        return hits.where(F.lit(False)).select(
            "url", "domain", "warc_epoch", "sid"
        )
    branches = []
    for sid, name, track, op, expire in writes:
        branches.append(
            hits.where(F.col("sid") == sid).select(
                F.lit(name).alias("bname"),
                gate_key_col(track).alias("bkey"),
                "warc_epoch",
                "url",
                "domain",
                "sid",
                F.lit(0).alias("kind"),
                F.lit(op).alias("op"),
                F.lit(expire).cast("long").alias("expire"),
                F.lit(None).cast("string").alias("test_op"),
                F.lit(None).cast("string").alias("cmps"),
            )
        )
    for sid, name, track, op in tests:
        branches.append(
            hits.where(F.col("sid") == sid).select(
                F.lit(name).alias("bname"),
                gate_key_col(track).alias("bkey"),
                "warc_epoch",
                "url",
                "domain",
                "sid",
                F.lit(1).alias("kind"),
                F.lit(None).cast("string").alias("op"),
                F.lit(None).cast("long").alias("expire"),
                F.lit(op).alias("test_op"),
                F.lit(None).cast("string").alias("cmps"),
            )
        )
    # one tester row per (rule, name, key) event; a rule's count tests
    # on the SAME bit name fold into one cmps spec (ALL must pass)
    by_rule_name: dict[tuple[int, str, str], list[str]] = {}
    for sid, name, track, cmp_, val in counts:
        by_rule_name.setdefault((sid, name, track), []).append(f"{cmp_}:{val}")
    per_sid: dict[int, set[tuple[str, str]]] = {}
    for sid, name, track in by_rule_name:
        per_sid.setdefault(sid, set()).add((name, track))
    multi = sorted(s for s, groups in per_sid.items() if len(groups) > 1)
    if multi:
        # ALL-tests-pass across DIFFERENT (name, key) state groups needs
        # a cross-group join the streaming store doesn't have — batch
        # handles it (groupBy payload); reject loudly, don't mis-emit
        raise NotImplementedError(
            f"streaming flexbits count across multiple bit names "
            f"(sids {multi}) is batch-only"
        )
    for (sid, name, track), specs in by_rule_name.items():
        branches.append(
            hits.where(F.col("sid") == sid).select(
                F.lit(name).alias("bname"),
                gate_key_col(track).alias("bkey"),
                "warc_epoch",
                "url",
                "domain",
                "sid",
                F.lit(1).alias("kind"),
                F.lit(None).cast("string").alias("op"),
                F.lit(None).cast("long").alias("expire"),
                F.lit("count").alias("test_op"),
                F.lit("|".join(specs)).alias("cmps"),
            )
        )
    stream = reduce(lambda a, b: a.unionByName(b), branches)
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("bname", "bkey").applyInPandasWithState(
        _bit_fn(),
        outputStructType=OUT_SCHEMA,
        stateStructType=BIT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def after_gate_stream(
    hits: DataFrame, sid: int, track: str, count: int, seconds: int
) -> DataFrame:
    """Streaming ``after: track T, count N, seconds S`` for one rule."""
    return _apply(hits, sid, track, _rolling_fn(count, seconds, "after"))


def suppress_gate_stream(
    hits: DataFrame, sid: int, track: str, count: int, seconds: int
) -> DataFrame:
    """Streaming ``threshold: type suppress`` for one rule."""
    return _apply(hits, sid, track, _rolling_fn(count, seconds, "suppress"))


LIMIT_STATE_SCHEMA = "win long, n long"


def _limit_fn(count: int, seconds: int):
    """``threshold: type limit``: keep the first N per (sid, key) per
    tumbling S-second window aligned to the epoch (win = epoch // S —
    identical anchoring and (warc_epoch, url) order as the batch
    row_number in gates/windows.py).  State is O(1): (window id,
    emitted count)."""
    import pandas as pd

    def fn(key, pdf_iter, state):
        win, n = state.get() if state.exists else (-1, 0)
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        rows = rows.sort_values(["warc_epoch", "url"], ignore_index=True)
        keep = []
        for t in rows["warc_epoch"]:
            w = int(t) // seconds
            if w != win:
                win, n = w, 0
            ok = n < count
            if ok:
                n += 1
            keep.append(ok)
        state.update((win, n))
        yield rows[pd.Series(keep)][["url", "domain", "warc_epoch", "sid"]]

    return fn


def limit_gate_stream(
    hits: DataFrame, sid: int, track: str, count: int, seconds: int
) -> DataFrame:
    """Streaming ``threshold: type limit`` for one rule (A2 on the
    streaming path — completes the window-gate trio there)."""
    return _apply(
        hits, sid, track, _limit_fn(count, seconds), state_schema=LIMIT_STATE_SCHEMA
    )
