"""Streaming deduplication: exactly-once event delivery from a source
that retransmits.

The reference's read-side dedup is a batch anti-join against the sink
(etl_service/main.py:216-236, re-queried per run); the streaming-native
form is ``dropDuplicatesWithinWatermark``: keep the FIRST arrival per
key, drop any duplicate that arrives within the watermark horizon of it.
Spark owns the dedup state (state store, partitioned by key across
executors) and the watermark BOUNDS it -- per-key state is dropped once
the watermark passes, so state is O(keys per horizon), not O(all keys
ever). The unbounded variant (plain ``dropDuplicates`` on a stream)
never frees state and dies at 100 TB; this module deliberately does not
offer it for streams.

Same code path batch vs stream (the windows.py pattern): on a batch
frame the watermark is a no-op and exact ``dropDuplicates`` applies, so
tests can replay a duplicated corpus and diff stream output against the
batch result on the deduplicated fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_DEDUP_HORIZON = "2 hours"


def dedup_events(
    events: DataFrame,
    key: str = "event_id",
    horizon: str = DEFAULT_DEDUP_HORIZON,
) -> DataFrame:
    """First-arrival-wins dedup on ``key``.

    Streaming input: ``withWatermark(ts) + dropDuplicatesWithinWatermark``
    -- duplicates separated by more than ``horizon`` of event time MAY
    both survive (the documented trade that keeps state bounded; size the
    horizon to the source's retransmission window, e.g. the reference
    API's retry window). Batch input: exact ``dropDuplicates``.
    """
    if events.isStreaming:
        return events.withWatermark("ts", horizon).dropDuplicatesWithinWatermark(
            [key]
        )
    return events.dropDuplicates([key])
