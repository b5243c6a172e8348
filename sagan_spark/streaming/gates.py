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


BIT_STATE_SCHEMA = "eepoch long, eop string, eexpire long"


def _bit_fn():
    """Per-(name, key) streaming bit store ([U] src/xbit.c — the mmap
    slot becomes group state holding the LATEST bit event).  Rows are
    processed in the batch path's total order (warc_epoch, url, kind,
    sid): writer rows update the state, tester rows evaluate
    isset/isnotset against it (set + strictly-inside expiry — same
    boundary as gates/xbits.py)."""
    import pandas as pd

    def fn(key, pdf_iter, state):
        if state.exists:
            eepoch, eop, eexpire = state.get()
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
            else:
                isset = (
                    eop == "set"
                    and eepoch is not None
                    and (eexpire is None or t < eepoch + eexpire)
                )
                keep.append(isset if r.test_op == "isset" else not isset)
        state.update(
            (
                -1 if eepoch is None else eepoch,
                eop or "",
                -1 if eexpire is None else eexpire,
            )
        )
        out = rows[pd.Series(keep)]
        yield out[["url", "domain", "warc_epoch", "sid"]]

    return fn


def xbits_gate_stream(hits: DataFrame, rules) -> DataFrame:
    """Streaming xbits/flexbits set/unset/isset/isnotset (SURVEY §2.6
    A4-A5 on the streaming path; closes the r2 gap where a streaming
    deployment of an xbits ruleset silently lost those rules).

    Writer- and tester-rule rows are unioned into one (name, key)
    stream; ``applyInPandasWithState`` holds the latest bit event per
    group.  Agreement with the batch join-back (gates/xbits.py) is
    exact under in-order arrival (availableNow drain — pinned by
    tests/test_streaming_gates.py); ``count`` testers are rejected
    loudly rather than silently dropped."""
    from functools import reduce

    from sagan_spark.gates.xbits import bit_count_rows, bit_ops_rows

    writes, tests = bit_ops_rows(rules)
    if bit_count_rows(rules):
        raise NotImplementedError(
            "flexbits count is batch-only (needs the event multiset, "
            "not the latest bit) — run those rules through the batch path"
        )
    if not tests:
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
