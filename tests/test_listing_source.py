"""Folder-listing DataSource tests (reference S3 as a literal source):
name/ext predicates push into the directory scan, projection prunes, and
the listed set matches os.listdir truth."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, StringEndsWith

from gmail_bigquery_etl_spark.sources.listing import (
    FolderListingReader,
    register,
)

SMOKE_SF = "/root/testdata/sf0.001"


def test_listing_matches_os_truth(spark):
    register(spark)
    got = {
        (r["name"], r["size"])
        for r in spark.read.format("folder_listing")
        .option("path", SMOKE_SF)
        .load()
        .collect()
    }
    want = {
        (e.name, e.stat().st_size)
        for e in os.scandir(SMOKE_SF)
        if e.is_file()
    } | {(e.name, 0) for e in os.scandir(SMOKE_SF) if e.is_dir()}
    assert got == want and len(got) > 0


def test_listing_suffix_filter_pushes_into_scan(spark):
    register(spark)
    df = (
        spark.read.format("folder_listing")
        .option("path", SMOKE_SF)
        .load()
        .filter(F.col("name").endswith(".parquet"))
        .select("name")
    )
    names = sorted(r["name"] for r in df.collect())
    want = sorted(
        n for n in os.listdir(SMOKE_SF) if n.endswith(".parquet")
    )
    assert names == want
    # acceptance of the pushed predicate is proven at the reader level in
    # test_reader_accepts_and_applies_pushed_filters


def test_reader_accepts_and_applies_pushed_filters(tmp_path):
    for n in ("a.parquet", "b.parquet", "c.json", "prefix_d.parquet"):
        (tmp_path / n).write_bytes(b"x" * len(n))
    reader = FolderListingReader({"path": str(tmp_path)})
    rest = reader.pushFilters(
        [StringEndsWith(("name",), ".parquet"), EqualTo(("ext",), "parquet")]
    )
    assert rest == []  # both accepted
    assert len(reader.pushed) == 2
    rows = list(reader.read(reader.partitions()[0]))
    assert [r[0] for r in rows] == ["a.parquet", "b.parquet", "prefix_d.parquet"]
    # ext + size columns are real
    assert all(r[1] == "parquet" for r in rows)
    assert all(r[2] > 0 for r in rows)


def test_reader_prefix_option_prunes(tmp_path):
    for n in ("tok_1.json", "tok_2.json", "other.json"):
        (tmp_path / n).write_text("{}")
    reader = FolderListingReader({"path": str(tmp_path), "prefix": "tok_"})
    rows = list(reader.read(reader.partitions()[0]))
    assert [r[0] for r in rows] == ["tok_1.json", "tok_2.json"]
