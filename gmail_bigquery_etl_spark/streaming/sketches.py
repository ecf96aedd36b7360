"""Streaming sketch maintenance: a count-min sketch kept current over a
stream, one micro-batch merge at a time.

Sketches are the streaming-native aggregate: a CMS increment is additive,
so maintaining one over a stream is ``merge(current, build(batch))`` per
micro-batch -- no retraction, no watermark, O(depth x width) state no
matter how many items flow through. This module wires operators/cms.py's
build/merge (whose mergeability contract -- build(X ∪ Y) ==
merge(build(X), build(Y)) -- pytest already pins) into the same
snapshot-pointer sink discipline as the CDC merge sink: write the new
cell table, then atomically swap the pointer, so readers always see a
complete sketch. Unlike the CDC merge (whose post-image upserts are
idempotent), a CMS merge is ADDITIVE, so replay needs an explicit
dedup: the pointer records the id of the last merged batch and
``apply_batch`` no-ops on any batch id <= it. A crash before the swap
replays onto the previous snapshot (correct); a crash after the swap
but before the checkpoint commit replays a batch the pointer already
recorded, and the guard drops it instead of double-counting.

The parity test asserts the operational claim end-to-end: the streamed
sketch's cells equal a batch build over the whole fixture, bit for bit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.cms import cms_build, cms_merge
from .merge_sink import _POINTER, current_snapshot_dir

_CELL_SCHEMA = "i int, col bigint, c bigint"


def read_sketch(spark, sink_root: str) -> DataFrame:
    """The current committed sketch (empty, well-typed, before the first
    commit)."""
    cur = current_snapshot_dir(sink_root)
    if cur is None:
        return spark.createDataFrame([], _CELL_SCHEMA)
    return spark.read.schema(_CELL_SCHEMA).parquet(cur)


def apply_cms_batch(
    spark,
    batch_df: DataFrame,
    batch_id: int,
    item_col: str,
    sink_root: str,
    depth: int = 4,
    width: int = 1024,
) -> None:
    """One micro-batch merge (module-level so the replay guard is
    directly testable). Replay guard: CMS merge is ADDITIVE, so a batch
    whose id the pointer already records (crash between pointer swap
    and checkpoint commit, then foreachBatch redelivery) must be
    dropped, not re-merged. foreachBatch ids are monotonically
    increasing and pointer names are snap_{batch_id}, so id <= last
    recorded id identifies a replayed (already-applied) batch."""
    os.makedirs(sink_root, exist_ok=True)
    cur = current_snapshot_dir(sink_root)
    if cur is not None:
        last_id = int(os.path.basename(cur).removeprefix("snap_"))
        if batch_id <= last_id:
            return
    batch_cells = cms_build(batch_df, item_col, depth=depth, width=width)
    merged = cms_merge(read_sketch(spark, sink_root), batch_cells)
    new_dir = os.path.join(sink_root, f"snap_{batch_id}")
    merged.write.mode("overwrite").parquet(new_dir)
    tmp = os.path.join(sink_root, _POINTER + ".tmp")
    with open(tmp, "w") as f:
        f.write(f"snap_{batch_id}")
    os.replace(tmp, os.path.join(sink_root, _POINTER))


def start_cms_maintenance(
    items_stream: DataFrame,
    item_col: str,
    sink_root: str,
    checkpoint_path: str,
    depth: int = 4,
    width: int = 1024,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain the sketch over a stream of items. Returns the query
    handle; read the live sketch via ``read_sketch``."""
    spark = items_stream.sparkSession

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_cms_batch(
            spark, batch_df, batch_id, item_col, sink_root,
            depth=depth, width=width,
        )

    writer = items_stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
