"""Watermarked stream-stream interval join.

The reference never joins two live feeds (its one join is the batch
anti-join against the sink id set, etl_service/main.py:175); a streaming
engine needs the two-stream form: pair each purchase with the clicks that
preceded it within an hour, while BOTH sides are unbounded.

Shape: inner equi-join on user_id with an event-time range residual, a
watermark on each side so the state store can evict rows once no future
match is possible. State per key is bounded by (watermark + interval) --
the plan that survives an unbounded feed. The batch twin
(queries/events.events_interval_join) runs the identical condition on the
static table; tests assert stream == batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_pairs(
    events: DataFrame,
    interval: str = "1 hour",
    watermark: str = "2 hours",
    join_type: str = "inner",
) -> DataFrame:
    """Pair purchases with same-user clicks in (p_ts - interval, p_ts].

    ``events`` may be a streaming OR batch DataFrame with columns
    (user_id, ts, event_type, value); the same plan compiles either way,
    which is how the tests cross-check.

    ``join_type="left_outer"`` keeps purchases with no qualifying click as
    null-click rows. In the streaming form those rows are emitted only once
    the watermark passes the purchase's match window (no earlier click can
    still arrive) -- so a run over a finite source leaves the final
    ``watermark`` span of purchases unemitted; the tests compare against
    the batch twin on the watermark-closed region only.
    """
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            "value",
        )
        .withWatermark("c_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr(f"INTERVAL {interval}"))
        & (F.col("c_ts") <= F.col("p_ts")),
        join_type,
    ).select("user_id", "p_ts", "c_ts", "value")


def enrich_with_dim(stream: DataFrame, dim: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-STATIC enrichment: join an unbounded stream against a
    bounded dimension -- the third join shape next to the batch
    anti-join and the watermarked stream-stream interval join, and the
    one every event pipeline runs first (attach the user/account
    attributes to each event). No watermark and no state store are
    needed: the static side is broadcast to every micro-batch, so the
    join is stateless per batch and left-outer keeps events whose key is
    missing from the dimension (late dimension arrival must not drop
    facts)."""
    return stream.join(F.broadcast(dim), key, "left")
