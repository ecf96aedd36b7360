"""Custom stateful sessionizer with EVENT-TIME TIMEOUTS.

``streaming/windows.py`` sessionizes with the built-in ``session_window``;
this module re-implements the operator on the raw state API
(applyInPandasWithState + GroupStateTimeout.EventTimeTimeout) -- the shape
a pipeline needs when session CLOSE must run custom logic (emit a summary,
fire a side effect) the declarative form can't express. Two emission
paths, both exercised by the stream==batch test:

  * in-batch close: a later event arrives past the inactivity gap, so the
    open session closes and a new one starts in the same update call;
  * timeout close: no further events arrive; the state store fires the
    group callback once the WATERMARK passes last_ts + gap, and the open
    session flushes without any new input rows.

State is (session_start_us, last_ts_us, last_event_id, n_events) per
user -- a few int64s per key in the state store, partitioned across
executors; nothing grows with history. The reference has no session
concept at all (its state is a process-local dict keyed by message id,
etl_service/main.py:158-214); this is the Spark-native upgrade path.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

GAP_MIN = 30

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("last_eid", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _emit(user_id: Any, sessions: list[tuple[int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(sessions),
            "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in sessions],
            "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in sessions],
            "n_events": [n for _, _, n in sessions],
        }
    )


def _update(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    gap_us = GAP_MIN * 60 * 1_000_000
    closed: list[tuple[int, int, int]] = []

    if state.hasTimedOut:
        # Watermark passed last_ts + gap with no new events: flush the open
        # session and drop the key from the state store entirely.
        start_us, last_us, _eid, n = state.get
        closed.append((start_us, last_us, n))
        state.remove()
        yield _emit(key[0], closed)
        return

    if state.exists:
        start_us, last_us, last_eid, n = state.get
    else:
        start_us = last_us = last_eid = None
        n = 0

    # Chunk ARRIVAL order from applyInPandasWithState is not guaranteed,
    # so sorting each chunk alone is not enough: a group whose chunks
    # arrive newest-first would shunt whole older chunks into the
    # conservative fold below and merge sessions batch truth keeps
    # separate. Concatenate the batch's chunks and sort ONCE globally by
    # (ts, event_id); after that, any row still older than state is a
    # genuinely cross-batch late arrival.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        ordered = (
            pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        ).sort_values(["ts", "event_id"])
        ts_us = (ordered["ts"].astype("int64") // 1_000).tolist()
        eids = ordered["event_id"].astype("int64").tolist()
        for t, eid in zip(ts_us, eids):
            if last_us is not None and (t, eid) < (last_us, last_eid):
                # Cross-batch late row (within the watermark): fold it
                # into the open session conservatively rather than
                # reordering already-emitted state.
                n += 1
                start_us = min(start_us, t)
                continue
            if last_us is None:
                start_us, last_us, last_eid, n = t, t, eid, 1
            elif t - last_us > gap_us:
                closed.append((start_us, last_us, n))
                start_us, last_us, last_eid, n = t, t, eid, 1
            else:
                last_us, last_eid = t, eid
                n += 1

    state.update((start_us, last_us, last_eid, n))
    # Event-time timeout fires when the watermark passes this (ms) instant.
    state.setTimeoutTimestamp(last_us // 1_000 + gap_us // 1_000)
    yield _emit(key[0], closed)


def sessionize_stream(
    events: DataFrame, watermark_delay: str = "30 minutes"
) -> DataFrame:
    """Closed sessions (user_id, session_start, session_end, n_events) in
    append mode: one output row per session, emitted on in-batch close or
    event-time timeout."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def batch_sessions(events: DataFrame) -> DataFrame:
    """The batch twin: gaps-and-islands sessionization producing the same
    (user_id, session_start, session_end, n_events) rows."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    tagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > GAP_MIN * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("new_s"),
    )
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sess = tagged.withColumn("seq", F.sum("new_s").over(wrun))
    return sess.groupBy("user_id", "seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    ).drop("seq")
