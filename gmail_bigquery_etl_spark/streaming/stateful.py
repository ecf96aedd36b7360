"""Custom stateful streaming operator: per-user running aggregates.

The reference accumulates per-user state in plain dicts inside one process
(email_data keyed by msg id, counters -- etl_service/main.py:158-214). The
Spark-native equivalent is applyInPandasWithState: state lives in the state
store, partitioned by key across executors, Arrow-batched in and out of
Python -- the same logic survives a 1000-executor cluster because Spark owns
the partitioning and fault tolerance, not a process-local dict.

Emits, per user and micro-batch, the updated running totals (update mode).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_event_type", StringType()),
    ]
)

# total_value is carried in state as VALUE * 10^4 in int64: integer
# accumulation is associative/exact, so the emitted double equals a
# DECIMAL(18,4) sum regardless of row order or micro-batch boundaries
# (the registry's determinism rule, applied to streaming state).
_SCALE = 10_000

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_scaled", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("last_event_id", LongType()),
        StructField("last_event_type", StringType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total_scaled, last_ts, last_eid, last = state.get
    else:
        n, total_scaled, last_ts, last_eid, last = 0, 0, None, None, None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        # "last" = max (ts, event_id) seen so far, carried IN STATE and
        # compared per Arrow chunk: a user's rows may span several chunks
        # in one micro-batch (chunk order is nondeterministic after the
        # shuffle) and later micro-batches may replay older data -- taking
        # the final chunk's tail would silently depend on both. event_id
        # tiebreaks equal timestamps.
        order_cols = ["ts", "event_id"] if "event_id" in pdf.columns else ["ts"]
        ordered = pdf.sort_values(order_cols)
        n += len(ordered)
        # Round HALF-AWAY-FROM-ZERO (trunc(x + copysign(.5, x))), matching
        # DuckDB's CAST(.. AS DECIMAL(18,4)) semantics. pandas .round()
        # rounds half-to-even and would diverge from the oracle on any
        # double product landing exactly on .5 at the 4th decimal. (trunc,
        # not floor: floor(-2.4 - 0.5) = -3 would over-round negatives.)
        scaled = ordered["value"].to_numpy(dtype="float64") * _SCALE
        total_scaled += int(
            np.trunc(scaled + np.copysign(0.5, scaled)).astype("int64").sum()
        )
        tail = ordered.iloc[-1]
        ts_us = int(pd.Timestamp(tail["ts"]).value // 1_000)
        eid = int(tail["event_id"]) if "event_id" in pdf.columns else 0
        if last_ts is None or (ts_us, eid) > (last_ts, last_eid):
            last_ts, last_eid, last = ts_us, eid, str(tail["event_type"])
    state.update((n, total_scaled, last_ts, last_eid, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total_scaled / _SCALE],
            "last_event_type": [last],
        }
    )


def running_user_counts(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value, last_event_type); one output
    row per user per micro-batch in update mode."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ewma", DoubleType()),
    ]
)

# deque of the last <=16 scaled values (newest last) + the (ts, event_id)
# high-water mark for the cross-chunk ordering defense _update uses.
EWMA_STATE_SCHEMA = StructType(
    [
        StructField("recent_scaled", ArrayType(LongType())),
        StructField("last_ts_us", LongType()),
        StructField("last_event_id", LongType()),
    ]
)

_EWMA_WINDOW = 16


def _ewma_update(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Streaming twin of queries/events.events_ewma_halflife: per event,
    the dyadic EWMA over the trailing 16 values, carried in state as
    exact 1e4-scaled int64s (the registry determinism rule applied to
    streaming state -- integer num/den, one float division at emit).

    Ordering contract: rows are sorted within each micro-batch (chunk
    order from applyInPandasWithState is not guaranteed -- all chunks
    concatenate and sort ONCE globally, the sessionizer lesson), and
    event time is assumed per-key non-decreasing ACROSS batches (the
    log-replay/ingestion shape); a genuinely late cross-batch row would
    need watermark buffering, which the windowed aggs in
    streaming/windows.py own."""
    if state.exists:
        recent, last_ts, last_eid = state.get
        recent = list(recent)
    else:
        recent, last_ts, last_eid = [], None, None
    frames = [pdf for pdf in pdfs if len(pdf)]
    if frames:
        allp = pd.concat(frames, ignore_index=True)
        ordered = allp.sort_values(["ts", "event_id"])
        eids, ewmas = [], []
        vals = ordered["value"].to_numpy(dtype="float64") * _SCALE
        scaled = np.trunc(vals + np.copysign(0.5, vals)).astype("int64")
        for eid, v in zip(ordered["event_id"], scaled):
            recent.append(int(v))
            if len(recent) > _EWMA_WINDOW:
                recent.pop(0)
            n = len(recent)
            num = sum(x << (15 - (n - 1 - j)) for j, x in enumerate(recent))
            den = (1 << 16) - (1 << (16 - n))
            eids.append(int(eid))
            ewmas.append((num / _SCALE) / den)
        tail = ordered.iloc[-1]
        last_ts = int(pd.Timestamp(tail["ts"]).value // 1_000)
        last_eid = int(tail["event_id"])
        state.update((recent, last_ts, last_eid))
        yield pd.DataFrame(
            {
                "user_id": np.full(len(eids), key[0], dtype="int64"),
                "event_id": np.asarray(eids, dtype="int64"),
                "ewma": np.asarray(ewmas, dtype="float64"),
            }
        )
    else:
        state.update((recent, last_ts, last_eid))


def running_ewma(events: DataFrame) -> DataFrame:
    """Per-event dyadic EWMA over a stream; append mode (each event's
    smoothed value is final the moment it is computed)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _ewma_update,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
