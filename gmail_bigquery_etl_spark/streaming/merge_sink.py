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


def list_versions(sink_root: str) -> list[int]:
    """Snapshot versions retained on disk, ascending. Every committed
    merge generation keeps its ``snap_{batch_id}`` directory until
    ``vacuum`` removes it, so the sink is a full version history -- the
    raw-parquet analog of a Delta/Iceberg commit log."""
    if not os.path.isdir(sink_root):
        return []
    out = []
    for name in os.listdir(sink_root):
        if name.startswith("snap_") and os.path.isdir(
            os.path.join(sink_root, name)
        ):
            out.append(int(name.removeprefix("snap_")))
    return sorted(out)


def read_as_of(spark, sink_root: str, version: int | None = None) -> DataFrame:
    """Time-travel read: the sink's state as of snapshot ``version``
    (exact id, like Delta's versionAsOf); None reads the current
    pointer. Raises ValueError for a version that was never committed
    or has been vacuumed -- a silent fallback to a different version
    would be a correctness bug in any downstream backfill."""
    if version is None:
        cur = current_snapshot_dir(sink_root)
        if cur is None:
            raise ValueError(f"no committed snapshot in {sink_root}")
        return spark.read.parquet(cur)
    d = os.path.join(sink_root, f"snap_{version}")
    if not os.path.isdir(d):
        have = list_versions(sink_root)
        raise ValueError(
            f"version {version} not retained in {sink_root} "
            f"(have {have})"
        )
    return spark.read.parquet(d)


def vacuum(sink_root: str, keep_last: int = 2) -> list[int]:
    """Retention: drop all but the newest ``keep_last`` snapshot
    directories (the CURRENT pointer target is always kept regardless).
    Returns the removed versions. Old generations free their storage;
    time-travel reads older than the horizon start raising, which is
    the honest contract (same as Delta VACUUM breaking versionAsOf)."""
    import shutil

    keep_last = max(1, keep_last)
    versions = list_versions(sink_root)
    cur = current_snapshot_dir(sink_root)
    cur_name = os.path.basename(cur) if cur else None
    removed = []
    for v in versions[:-keep_last]:
        name = f"snap_{v}"
        if name == cur_name:
            continue
        shutil.rmtree(os.path.join(sink_root, name))
        removed.append(v)
    return removed


def apply_merge_batch(
    spark,
    batch_df: DataFrame,
    batch_id: int,
    sink_root: str,
    keys: list[str],
    delete_col: str = "is_delete",
) -> None:
    """One CDC merge generation (module-level so batch callers and tests
    drive the exact code path the streaming sink runs): read the current
    snapshot, merge the post-images, write ``snap_{batch_id}``, swap the
    pointer atomically. Re-applying the same post-image batch is
    idempotent (unlike the additive CMS sink, no replay guard needed):
    the merge keyed on ``keys`` produces the same snapshot content."""
    data_cols = [c for c in batch_df.columns if c != delete_col]
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

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_merge_batch(
            spark, batch_df, batch_id, sink_root, keys, delete_col=delete_col
        )

    writer = changes_stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
