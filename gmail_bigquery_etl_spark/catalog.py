"""Fixture-table loading and temp-view registration.

All declared queries take (spark, sf_dir); this module centralizes parquet
loading so predicate pushdown / column pruning happen at the scan (verified
in tests via .explain -- PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .schemas import FIXTURE_TABLES

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table.

    ``events.ts`` has shipped as both parquet TIMESTAMP(NANOS) (which
    Spark's vectorized reader rejects -- read as int64 nanos via the legacy
    conf and truncate to micros, bit-identical to DuckDB's TIMESTAMP read)
    and plain TIMESTAMP(MICROS) (native read). Branch on the landed type so
    either fixture generation works.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            # Native TIMESTAMP(MICROS) parquet arrives as TIMESTAMP_NTZ;
            # normalize to TimestampType (session tz is pinned UTC) so the
            # whole corpus sees ONE ts type regardless of fixture vintage
            # (unix_micros / watermarks reject NTZ).
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Decouple CPU-bound per-row stages from scan parallelism.

    The local fixtures are single-row-group parquet files, so a scan yields
    1-3 partitions no matter how many cores exist, serializing per-row-heavy
    pipelines (md5-per-shingle, regex batteries, pandas tiles). Round-robin
    repartition to cores*factor spreads that compute.

    The decision is a static conf read (``spark.gmail_etl.spread``): a
    per-call ``df.rdd.getNumPartitions()`` probe would force an RDD
    conversion of the analyzed plan on the driver for every query build.
    The DEFAULT is deployment-aware: on under a ``local[*]`` master (the
    single-JVM case where narrow single-file scans serialize compute), off
    on a real cluster (scans there are already many-files/row-groups wide
    and a blanket round-robin exchange could even SHRINK an already-wide
    scan to cores*factor). Either can be forced with the conf.
    """
    sess = df.sparkSession
    conf = sess.conf.get("spark.gmail_etl.spread", "auto")
    if conf == "off":
        return df
    if conf != "on" and not sess.sparkContext.master.startswith("local"):
        return df
    return df.repartition(sess.sparkContext.defaultParallelism * factor)


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view; return the DataFrames."""
    out: dict[str, DataFrame] = {}
    for name in FIXTURE_TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            df = load_table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
