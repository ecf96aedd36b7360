"""Replay a fixture table as a file stream.

The driver fixtures are static parquet; streaming tests need a source that
arrives in micro-batches. ``write_replay_dir`` splits ``events`` into N
time-ordered parquet chunks (so event time advances batch over batch and
watermarks actually move); ``replay_events_stream`` reads them back with
``readStream`` + ``maxFilesPerTrigger=1`` -- one chunk per micro-batch,
exactly the reference's page-at-a-time loop shape (etl_service/main.py:
163-211) under Spark's runtime.

At 100 TB the same code reads a real landing directory (or Kafka); the
chunking here is only the local replay harness.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table


def write_replay_dir(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    chunks: int = 8,
) -> str:
    """Materialize ``events`` as ``chunks`` time-ordered parquet files under
    ``out_dir`` (created if needed). Returns the directory path."""
    ev = load_table(spark, sf_dir, "events")
    # ntile over event time: chunk k holds strictly earlier data than k+1,
    # so replay advances the watermark monotonically like a live source.
    # Global-sort ntile is fine here: this is the local replay harness, not a
    # production path (a live source arrives time-ordered already).
    ranked = ev.withColumn("_chunk", F.ntile(chunks).over(Window.orderBy("ts")))
    for k in range(1, chunks + 1):
        (
            ranked.filter(F.col("_chunk") == k)
            .drop("_chunk")
            .coalesce(1)
            .write.mode("overwrite" if k == 1 else "append")
            .parquet(out_dir)
        )
    return out_dir


def replay_events_stream(
    spark: SparkSession,
    replay_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """``readStream`` over a replay directory, one file per micro-batch."""
    schema = spark.read.parquet(replay_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(replay_dir)
    )
