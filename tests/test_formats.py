"""File-format coverage: the flat email-record table round-trips through
every batch format Spark ships (parquet/orc/json/csv) without loss.

The reference's only formats are remote APIs + local JSON token files
(SURVEY.md §2.1); our engine inherits the full format matrix from Spark --
this locks in that the record schema survives each one (CSV degrades types
to string unless the schema is re-imposed, which the test does, as a real
pipeline would)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.operators.incremental import extract_email_records
from gmail_bigquery_etl_spark.sources.synthetic import gmail_messages_from_events

SMOKE_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def records(spark):
    msgs = gmail_messages_from_events(spark, SMOKE_SF)
    return extract_email_records(msgs).dropDuplicates(["id"]).cache()


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, records, tmp_path, fmt):
    path = str(tmp_path / fmt)
    writer = records.write.format(fmt).mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true").option("quoteAll", "true")
    writer.save(path)

    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true").schema(records.schema)
    elif fmt == "json":
        reader = reader.schema(records.schema)
    back = reader.load(path)

    # nullability flags legitimately widen on re-read; names+types must hold
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in records.schema
    ]
    assert _sorted_rows(back.select(sorted(back.columns))) == _sorted_rows(
        records.select(sorted(records.columns))
    )


def test_json_null_vs_empty_distinction(spark, records, tmp_path):
    """subject NULL (dropped header) and threadId '' (defaulted) must both
    survive JSON -- the reference's NULL-vs-empty distinction
    (etl_service/main.py:198-199)."""
    path = str(tmp_path / "j")
    records.write.mode("overwrite").json(path)
    back = spark.read.schema(records.schema).json(path)
    assert back.filter(F.col("subject").isNull()).count() == records.filter(
        F.col("subject").isNull()
    ).count()
    assert back.filter(F.col("threadId") == "").count() == records.filter(
        F.col("threadId") == ""
    ).count()


def test_parquet_schema_evolution_merge_schema(spark, tmp_path):
    """Schema evolution on a landed dataset: a later writer adds a column;
    mergeSchema reads the union schema with NULLs for the old files --
    the append-only contract a long-lived sink depends on (the reference
    simply relies on BigQuery's schema for this)."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "evolving")
    spark.range(0, 10).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).write.parquet(p)
    spark.range(10, 20).select(
        F.col("id"), (F.col("id") * 2).alias("v"), F.lit("en").alias("lang")
    ).write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "v", "lang"}
    assert merged.count() == 20
    assert merged.filter(F.col("lang").isNull()).count() == 10
    assert merged.filter(F.col("lang") == "en").count() == 10
    # predicate on the evolved column still prunes/pushes cleanly
    assert merged.filter(F.col("lang").isNotNull()).agg(
        F.sum("v")
    ).collect()[0][0] == sum(i * 2 for i in range(10, 20))
