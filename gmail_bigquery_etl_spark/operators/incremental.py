"""Incremental-ingest operators: the reference's semantic core.

The load-bearing operator of the whole reference pipeline is one anti-join:
``[m for m in messages if m["id"] not in existing_email_ids]``
(reference etl_service/main.py:175, build side main.py:94-104). Here it is a
broadcast LEFT ANTI join -- the id set is shipped once per executor instead
of once per thread.

Scale posture (100 TB): the broadcast is only correct while the distinct-id
projection fits the broadcast threshold. ``incremental_anti_join`` takes a
``broadcast_hint`` flag; when the sink's id set outgrows it, pass False and
Catalyst plans a shuffle/sort-merge anti-join, which AQE converts back to
broadcast at runtime if stats allow. For a date-partitioned sink, pass a
pre-filtered ``existing`` (partition-pruned id scan) rather than the full
``SELECT id`` -- the reference's full-table id scan (main.py:97) is exactly
what does NOT survive 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.headers import (
    flatten_labels,
    header_value,
    label_predicate,
    parse_rfc2822,
)


def incremental_anti_join(
    incoming: DataFrame,
    existing: DataFrame,
    key: str = "id",
    broadcast_hint: bool = True,
) -> DataFrame:
    """Keep only incoming rows whose ``key`` is absent from ``existing``.

    Parity: reference etl_service/main.py:175 (set-membership anti-join).
    """
    ids = existing.select(key).distinct()
    if broadcast_hint:
        ids = F.broadcast(ids)
    return incoming.join(ids, key, "left_anti")


def extract_email_records(messages: DataFrame, rich: bool = False) -> DataFrame:
    """Gmail-shaped message rows -> flat email records.

    Reproduces the record build at reference etl_service/main.py:196-204:
    first-match case-insensitive header extraction with NULL default,
    threadId defaulting to '' (not NULL), labels flattened to a CSV string.
    Everything is a codegen'd expression; no UDFs, no shuffle.
    """
    cols = [
        F.col("id"),
        F.coalesce(F.col("threadId"), F.lit("")).alias("threadId"),
        header_value("headers", "subject").alias("subject"),
        header_value("headers", "from").alias("sender"),
        header_value("headers", "to").alias("recipient"),
        header_value("headers", "date").alias("timestamp"),
        flatten_labels("labelIds").alias("combined_labels"),
    ]
    if rich:
        cols += [
            F.coalesce(F.col("labelIds"), F.array().cast("array<string>")).alias(
                "labels"
            ),
            parse_rfc2822(header_value("headers", "date")).alias("ts"),
        ]
    return messages.select(*cols)


def ingest_increment(
    messages: DataFrame,
    existing: DataFrame,
    broadcast_hint: bool = True,
) -> DataFrame:
    """The reference /fetch dataflow as one lazy plan:

    source predicate (main.py:160) -> anti-join vs sink (main.py:175) ->
    record build (main.py:196-204) -> per-id dedup (main.py:205).

    The anti-join is placed BEFORE record extraction, mirroring the
    reference's manual plan-shape decision to anti-join before the expensive
    detail fetch (main.py:175 precedes :179-206) -- at scale this is what
    keeps already-ingested rows out of every downstream stage.

    Dedup note: the reference dict is last-writer-wins (main.py:205);
    ``dropDuplicates`` keeps an arbitrary first row. For identical payloads
    (the only duplicates the source produces) the results agree; the
    divergence is documented in SURVEY.md §7.3.
    """
    fresh = messages.filter(label_predicate("labelIds"))
    fresh = incremental_anti_join(fresh, existing, "id", broadcast_hint)
    records = extract_email_records(fresh)
    return records.dropDuplicates(["id"])
