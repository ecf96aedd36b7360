"""Bucketed tables: shuffle-free co-located joins and aggregations.

A fact-fact join (orders x lineitem on orderkey) shuffles BOTH sides on
every query. Bucketing pays that shuffle once at write time: both tables
hash-partitioned into the same bucket count on the join key, so Catalyst
plans the join with NO Exchange on either side -- at 100 TB this is the
difference between re-shuffling terabytes per query and a local merge per
bucket. The same layout makes groupBy(key) exchange-free.

Rules encoded here (and asserted in tests/test_bucketing.py):
* both sides bucketed on the SAME key with compatible bucket counts;
* sortBy on the bucket key lets SortMergeJoin skip the per-task sort;
* bucket pruning applies to equality filters on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Materialize ``df`` as a bucketed (and bucket-sorted) table in the
    session catalog. ``path`` makes it external (parquet files there)."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
