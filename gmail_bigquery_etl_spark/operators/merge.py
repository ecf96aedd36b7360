"""CDC merge (upsert/delete) and SCD2 versioning operators.

The reference pipeline only ever APPENDS (BigQuery ``insert_rows_json``,
etl_service/main.py:240-253) and relies on the anti-join to avoid
re-inserting; a production warehouse additionally needs the other half of
that contract: applying a batch of upserts/deletes onto an existing table,
and keeping history when a dimension changes (SCD type 2). Both are
expressed as shuffle-on-key joins so they scale like every other keyed
operator in this repo.

Scale posture (100 TB):
  * ``merge_upsert`` is one anti-join (base vs change keys) + a union.
    The change set of a CDC batch is normally orders of magnitude smaller
    than the base table, so the key projection is broadcast by default --
    the same J1 shape as operators/incremental.py. For a huge change set,
    pass ``broadcast_hint=False`` and Catalyst plans a shuffle anti-join
    (AQE may still demote it back to broadcast at runtime).
  * On a partitioned base table, pre-filter ``base`` to the partitions the
    change keys can touch before calling this -- the merge itself never
    requires a full-table rewrite, only the touched partitions.
  * ``scd2_from_events`` is a single window over the key -- one shuffle,
    no self-join; the classic LEAD() formulation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    delete_col: str | None = None,
    broadcast_hint: bool = True,
) -> DataFrame:
    """Apply a CDC batch onto ``base``: every base row whose key appears in
    ``changes`` is displaced; change rows not flagged as deletes are the new
    versions. Semantics match ``MERGE INTO base USING changes ON key WHEN
    MATCHED [AND is_delete] THEN DELETE / WHEN MATCHED THEN UPDATE SET * /
    WHEN NOT MATCHED [AND NOT is_delete] THEN INSERT *``.

    ``changes`` must be key-unique (one post-image per key per batch) --
    standard CDC-batch contract; enforce upstream with a last-write-wins
    window if the feed can contain multiple images.
    """
    key_list = list(keys)
    change_keys = changes.select(*key_list).distinct()
    if broadcast_hint:
        change_keys = F.broadcast(change_keys)
    kept = base.join(change_keys, on=key_list, how="left_anti")
    if delete_col is not None:
        upserts = changes.filter(~F.col(delete_col)).drop(delete_col)
    else:
        upserts = changes
    return kept.unionByName(upserts.select(*base.columns))


def scd2_from_events(
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Build SCD2 version intervals from a change stream: each row becomes a
    version effective from its own timestamp until the key's next change
    (NULL for the current version). One window shuffle, no self-join.

    ``(key, ts_col, *tiebreakers)`` must totally order the feed within each
    key or the interval chain is indeterminate; pass an id column as the
    tiebreaker when timestamps can collide.
    """
    key_list = list(keys)
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreakers]
    w = Window.partitionBy(*key_list).orderBy(*order)
    return (
        changes.withColumn("effective_from", F.col(ts_col))
        .withColumn("effective_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("effective_to").isNull())
    )


def compile_merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    update_set: dict[str, str] | None = None,
    update_cond: str | None = None,
    delete_cond: str | None = None,
    insert_cond: str | None = None,
) -> DataFrame:
    """Compile Delta-style conditional MERGE INTO clauses to a CDC
    post-image batch -- the missing half between ``merge_upsert`` (which
    applies unconditional post-images) and full MERGE semantics:

        MERGE INTO target t USING source s ON <keys>
        WHEN MATCHED AND <delete_cond> THEN DELETE
        WHEN MATCHED AND <update_cond> THEN UPDATE SET <update_set>
        WHEN NOT MATCHED AND <insert_cond> THEN INSERT *

    Returns a batch with the TARGET's columns plus ``is_delete``,
    consumable verbatim by apply_merge_batch / apply_merge_batch_bucketed
    -- so conditional MERGE lowers onto the same partition-scoped commit
    path as plain CDC, touching only the buckets the produced post-images
    hash into. Matched rows captured by NO clause produce NO post-image
    (the sink keeps them untouched -- exactly Delta's semantics, and the
    property that makes the lowering partition-scoped rather than a
    table rewrite).

    Conditions / SET expressions are SQL strings over aliases ``t``
    (target) and ``s`` (source); clause order is DELETE before UPDATE
    (first-match-wins). ``insert_cond`` defaults to all; INSERT takes the
    source's values for the target's columns, so ``source`` must carry
    every target column (post-image contract). The compile itself is one
    inner join + one anti join, both shuffle-on-key; the source is a CDC
    batch, so Catalyst/AQE broadcast it when small.
    """
    key_list = list(keys)
    data_cols = target.columns
    t, s = target.alias("t"), source.alias("s")
    on = [F.col(f"t.{k}") == F.col(f"s.{k}") for k in key_list]
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    matched = t.join(s, cond, "inner")
    parts = []
    not_deleted = (
        ~F.expr(delete_cond) if delete_cond is not None else F.lit(True)
    )
    if delete_cond is not None:
        parts.append(
            matched.where(F.expr(delete_cond)).select(
                *[F.col(f"t.{c}") for c in data_cols],
                F.lit(True).alias("is_delete"),
            )
        )
    if update_set is not None:
        upd = matched.where(
            not_deleted
            & (F.expr(update_cond) if update_cond is not None else F.lit(True))
        )
        parts.append(
            upd.select(
                *[
                    (
                        F.expr(update_set[c]).alias(c)
                        if c in update_set
                        else F.col(f"t.{c}").alias(c)
                    )
                    for c in data_cols
                ],
                F.lit(False).alias("is_delete"),
            )
        )
    inserts = s.join(t, cond, "left_anti")
    if insert_cond is not None:
        inserts = inserts.where(F.expr(insert_cond))
    parts.append(
        inserts.select(
            *[F.col(c) for c in data_cols], F.lit(False).alias("is_delete")
        )
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
