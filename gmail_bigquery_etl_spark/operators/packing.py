"""Token-budget shard packing: a distributed prefix sum.

A training pipeline packs documents into fixed-token-budget shards in a
deterministic corpus order (here: by id). The naive formulation is a
running ``SUM() OVER (ORDER BY id)`` -- a GLOBAL window that Spark plans
as a single-partition sort, serializing the whole corpus through one
task. The scale shape is the classic two-pass distributed prefix sum:

  1. range-partition by the order key (partition i holds smaller keys
     than partition i+1),
  2. cumulative-sum WITHIN each partition in parallel (window partitioned
     by the physical partition id),
  3. compute each partition's starting offset from the per-partition
     totals -- one row per partition, so the only serial window runs over
     O(num_partitions) rows -- and add it back via a broadcast join.

The assignment is partition-boundary-independent in the sense that ANY
range split yields the same global cumsum -- but only while the totals
branch and the row branch observe the SAME split. RangePartitioner
samples its boundaries with an RDD-id-derived seed, so two separate
evaluations of the range exchange may legally pick different boundaries;
the ranged frame is therefore materialized (localCheckpoint) before
either branch reads it, rather than relying on ReuseExchange to
deduplicate two plan subtrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def assign_token_shards(
    df: DataFrame,
    size_col: str,
    budget: int,
    order_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a ``shard`` column: floor(start_offset / budget), where
    start_offset is the running total of ``size_col`` over all rows with
    a smaller ``order_col``. Greedy sequential packing: a shard may exceed
    the budget by at most one document's tokens (the straddling document
    belongs to the shard where it starts)."""
    sess = df.sparkSession
    n = num_partitions or sess.sparkContext.defaultParallelism
    # localCheckpoint pins ONE physical range partitioning that both the
    # totals branch and the row branch below read. Without it the two
    # branches are separate plan subtrees whose boundary samples (seeded by
    # RDD id) could diverge whenever ReuseExchange doesn't kick in, and the
    # _pid->offset map would be applied to rows split differently --
    # silently corrupting shard ids.
    ranged = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w_local = (
        W.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = ranged.withColumn(
        "_local_cum", F.sum(F.col(size_col)).over(w_local)
    )
    # Partition offsets: the one serial window, over num_partitions rows.
    # Totals come from summing size_col directly (NOT max of the running
    # cumsum, which would silently diverge if any size were negative).
    totals = local.groupBy("_pid").agg(
        F.sum(F.col(size_col)).alias("_ptotal")
    )
    w_prefix = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid",
        F.coalesce(F.sum("_ptotal").over(w_prefix), F.lit(0).cast("bigint")).alias(
            "_offset"
        ),
    )
    start = F.col("_offset") + F.col("_local_cum") - F.col(size_col)
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("shard", F.floor(start / F.lit(budget)))
        .drop("_pid", "_local_cum", "_offset")
    )


def grouped_row_number(
    df: DataFrame,
    order_cols: list[str],
    group_cols: list[str] | None = None,
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ROW_NUMBER() OVER (PARTITION BY group ORDER BY order) with
    NO single-partition sort -- the ranking twin of the distributed
    prefix sum above. A plain global (or few-groups) rank window plans
    as one sort task per window partition, serializing the corpus
    through <= |groups| cores; this form is the classic two-pass shape:
    range-partition by (group, order), row_number WITHIN each physical
    partition in parallel, then add each (group, partition) slice's
    starting offset back via a broadcast of O(partitions x groups) rows.
    Range partitioning puts every row of a group in partition i ahead of
    its rows in partition j > i, so offset + local rank IS the exact
    per-group global rank; ties are impossible when order_cols is a
    total order (callers must pass one -- same contract as the plain
    window form). The ranged frame is localCheckpointed for the same
    boundary-stability reason as assign_token_shards."""
    group_cols = list(group_cols or [])
    sess = df.sparkSession
    n = num_partitions or sess.sparkContext.defaultParallelism
    keys = [F.col(c) for c in group_cols + list(order_cols)]
    ranged = (
        df.repartitionByRange(n, *keys)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w_local = W.partitionBy("_pid", *group_cols).orderBy(*order_cols)
    local = ranged.withColumn("_lrn", F.row_number().over(w_local))
    counts = local.groupBy("_pid", *group_cols).agg(
        F.count("*").alias("_pcnt")
    )
    w_prefix = (
        W.partitionBy(*group_cols)
        .orderBy("_pid")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_pid",
        *group_cols,
        F.coalesce(F.sum("_pcnt").over(w_prefix), F.lit(0))
        .cast("bigint")
        .alias("_off"),
    )
    return (
        local.join(F.broadcast(offsets), ["_pid", *group_cols])
        .withColumn(out_col, (F.col("_off") + F.col("_lrn")).cast("bigint"))
        .drop("_pid", "_lrn", "_off")
    )
