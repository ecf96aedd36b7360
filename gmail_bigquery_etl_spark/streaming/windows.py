"""Watermarked window aggregations.

Each function takes ANY events-shaped DataFrame (streaming or batch) and
returns the same logical aggregation; ``withWatermark`` is applied only when
the input is streaming, so the tests can run the identical code path on the
static fixture and diff the results (SURVEY.md §5 item 5).

Late-data semantics: watermark = max(event time) - delay; in append mode a
window emits once the watermark passes its end, and later-than-watermark rows
are dropped. The reference has no event-time story at all (it keeps the Date
header as a raw string, etl_service/main.py:202) -- this module is the
idiomatic upgrade, exercised against the ``events`` fixture.

Scale: windowed aggregation state is partitioned by (window, keys); at
100 TB the state store shards across executors (RocksDB state store in
production), and the watermark bounds state size -- without it, session
state grows forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "30 minutes"


def _with_watermark(events: DataFrame, delay: str) -> DataFrame:
    return events.withWatermark("ts", delay) if events.isStreaming else events


def tumbling_counts(
    events: DataFrame,
    width: str = "1 hour",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Per event_type counts + value sum in tumbling windows of ``width``."""
    return (
        _with_watermark(events, watermark)
        .groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "6 hours",
    slide: str = "3 hours",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Sliding-window event counts (each event lands in width/slide windows)."""
    return (
        _with_watermark(events, watermark)
        .groupBy(F.window("ts", width, slide).alias("win"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Per-user session windows (30 min inactivity gap) via session_window --
    the streaming-native form of the batch gaps-and-islands query
    (queries/events.py events_sessionization)."""
    return (
        _with_watermark(events, watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )
