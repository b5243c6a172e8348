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


def _apply(hits: DataFrame, sid: int, track: str, fn) -> DataFrame:
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = hits.where(F.col("sid") == sid).withColumn("gate_key", gate_key_col(track))
    return keyed.groupBy("sid", "gate_key").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
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
