"""DSAR over the bucketed manifest sink: the probe must SKIP I/O.

The gate (oracle parity) proves the report's values; these tests pin
the claim that makes the variant worth existing -- the reads touch
strictly fewer bucket files than the sink holds (Bloom skipping at the
inputFiles level) while returning exactly the plain filter's rows.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.catalog import load_table
from gmail_bigquery_etl_spark.queries import ALL_QUERIES
from gmail_bigquery_etl_spark.streaming.merge_manifest import (
    apply_merge_batch_bucketed,
    build_bloom_index,
    current_manifest,
    read_manifest_bloom_lookup_many,
)

SF = "/root/testdata/sf0.001"


def _all_sink_files(root: str) -> set[str]:
    m = current_manifest(root)
    files = set()
    for d in m["buckets"].values():
        full = os.path.join(root, d)
        for f in os.listdir(full):
            if f.endswith(".parquet"):
                files.add(os.path.realpath(os.path.join(full, f)))
    return files


def test_multi_value_bloom_lookup_skips_files_and_is_exact(
    spark, tmp_path
):
    root = str(tmp_path / "dsar_orders_sink")
    orders = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.col("o_custkey").cast("bigint").alias("o_custkey"),
    )
    apply_merge_batch_bucketed(
        spark,
        orders.withColumn("is_delete", F.lit(False)),
        0,
        root,
        ["o_orderkey"],
        n_buckets=16,
        commit_ts=1000.0,
    )
    build_bloom_index(spark, root, "o_custkey")
    probe = read_manifest_bloom_lookup_many(
        spark, root, "o_custkey", [7, 14, 21]
    )
    got = {(r.o_orderkey, r.o_custkey) for r in probe.collect()}
    want = {
        (r.o_orderkey, r.o_custkey)
        for r in orders.where(F.col("o_custkey").isin([7, 14, 21])).collect()
    }
    assert got == want and got
    # the skipped-I/O fact itself: the probe plan reads a strict subset
    # of the sink's bucket files
    touched = {os.path.realpath(p.replace("file:", "")) for p in probe.inputFiles()}
    all_files = _all_sink_files(root)
    assert touched, "probe read no files but returned rows?"
    assert touched < all_files, (len(touched), len(all_files))


def test_dsar_bucketed_matches_flat_report(spark):
    """The production-shaped variant must emit EXACTLY the flat
    report's three rows -- same subjects, same counts, same checksums."""
    flat = {
        r.table_name: (r.n_rows, r.key_checksum)
        for r in ALL_QUERIES["warehouse_subject_access_report"](
            spark, SF
        ).collect()
    }
    bucketed = {
        r.table_name: (r.n_rows, r.key_checksum)
        for r in ALL_QUERIES["warehouse_dsar_bucketed"](spark, SF).collect()
    }
    assert bucketed == flat
    assert set(flat) == {"customer", "orders", "lineitem"}
    assert flat["orders"][0] > 0 and flat["lineitem"][0] > 0


def test_bloom_lookup_many_empty_probe_list(spark, tmp_path):
    root = str(tmp_path / "dsar_empty_sink")
    orders = load_table(spark, SF, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.col("o_custkey").cast("bigint").alias("o_custkey"),
    )
    apply_merge_batch_bucketed(
        spark,
        orders.withColumn("is_delete", F.lit(False)),
        0,
        root,
        ["o_orderkey"],
        n_buckets=4,
        commit_ts=1000.0,
    )
    build_bloom_index(spark, root, "o_custkey")
    assert (
        read_manifest_bloom_lookup_many(
            spark, root, "o_custkey", []
        ).count()
        == 0
    )
