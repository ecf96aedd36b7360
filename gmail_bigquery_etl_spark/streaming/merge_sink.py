"""Streaming CDC apply: MERGE INTO a parquet sink, one micro-batch at a time.

The batch operator (operators/merge.merge_upsert) covers a one-shot change
batch; a CDC FEED needs the streaming form: each micro-batch of
upserts/deletes merges into the sink under foreachBatch. This is the
raw-parquet analog of Delta/Iceberg's streaming MERGE INTO: read the
current snapshot, merge, rewrite atomically (write new snapshot dir, then
swap a pointer file).

Scale posture: with a real table format the rewrite is partition-scoped
(only partitions the batch's keys touch are rewritten) and the swap is a
metadata commit. Here the sink is a single snapshot directory because the
fixtures are one partition; the operator composition (anti-join + union)
is the part that carries to 100 TB unchanged. Batches must be key-unique
(standard CDC post-image contract); later batches win over earlier ones by
construction (sequential merges).

Restart semantics: the snapshot pointer advances only after the new
snapshot is fully written, and foreachBatch re-delivers an uncommitted
batch on restart -- re-merging the same post-images is idempotent, so the
sink is effectively-once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.merge import merge_upsert

_POINTER = "_CURRENT"


def current_snapshot_dir(sink_root: str) -> str | None:
    ptr = os.path.join(sink_root, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        name = f.read().strip()
    return os.path.join(sink_root, name) if name else None


def start_merge_apply(
    changes_stream: DataFrame,
    sink_root: str,
    checkpoint_path: str,
    keys: list[str],
    delete_col: str = "is_delete",
    available_now: bool = True,
) -> StreamingQuery:
    """Apply a stream of CDC post-images onto the sink. Returns the query
    handle; read the result via ``current_snapshot_dir``."""
    spark = changes_stream.sparkSession
    data_cols = [c for c in changes_stream.columns if c != delete_col]

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(sink_root, exist_ok=True)
        cur = current_snapshot_dir(sink_root)
        if cur is not None:
            base = spark.read.parquet(cur)
        else:
            base = spark.createDataFrame([], batch_df.select(*data_cols).schema)
        merged = merge_upsert(base, batch_df, keys, delete_col=delete_col)
        new_dir = os.path.join(sink_root, f"snap_{batch_id}")
        # The write both READS the current snapshot and writes the new one,
        # so the new dir must differ from cur (it does: batch_id advances);
        # the pointer swaps only after the write fully succeeds.
        merged.write.mode("overwrite").parquet(new_dir)
        tmp = os.path.join(sink_root, _POINTER + ".tmp")
        with open(tmp, "w") as f:
            f.write(f"snap_{batch_id}")
        os.replace(tmp, os.path.join(sink_root, _POINTER))

    writer = changes_stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
