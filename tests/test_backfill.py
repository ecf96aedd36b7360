"""Idempotent partition backfill (operators/backfill.py)."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.operators.backfill import overwrite_partitions


def _rows(spark, path):
    return sorted(
        (r.id, str(r.ingest_date), r.v)
        for r in spark.read.parquet(path).collect()
    )


def test_backfill_replaces_exactly_one_day(spark, tmp_path):
    sink = str(tmp_path / "sink")
    full = spark.createDataFrame(
        [
            (1, date(2024, 1, 1), 10),
            (2, date(2024, 1, 1), 20),
            (3, date(2024, 1, 2), 30),
            (4, date(2024, 1, 3), 40),
        ],
        "id bigint, ingest_date date, v int",
    )
    overwrite_partitions(sink, full)
    base = _rows(spark, sink)

    # backfill day 2 with corrected data (one row dropped, one changed,
    # one added)
    day2 = spark.createDataFrame(
        [(3, date(2024, 1, 2), 99), (5, date(2024, 1, 2), 50)],
        "id bigint, ingest_date date, v int",
    )
    overwrite_partitions(sink, day2)
    after = _rows(spark, sink)
    assert after == sorted(
        [
            (1, "2024-01-01", 10),
            (2, "2024-01-01", 20),
            (3, "2024-01-02", 99),
            (5, "2024-01-02", 50),
            (4, "2024-01-03", 40),
        ]
    )
    assert after != base

    # idempotence: the same backfill twice leaves the same sink
    overwrite_partitions(sink, day2)
    assert _rows(spark, sink) == after


def test_backfill_restores_conf(spark, tmp_path):
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    df = spark.createDataFrame(
        [(1, date(2024, 1, 1), 1)], "id bigint, ingest_date date, v int"
    )
    overwrite_partitions(str(tmp_path / "s2"), df)
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        == prev
    )
