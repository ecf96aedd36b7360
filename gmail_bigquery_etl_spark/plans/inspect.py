"""Plan inspection helpers (used by the plan-assertion tests)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, full_metadata: bool = True) -> str:
    spark = df.sparkSession
    if full_metadata:
        spark.conf.set("spark.sql.debug.maxToStringFields", "1000")
        spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    return df._jdf.queryExecution().executedPlan().toString()


def scan_read_schema(df: DataFrame) -> list[set[str]]:
    """The column set of every parquet scan in the plan."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan_string(df)):
        out.append({c.split(":")[0] for c in m.group(1).split(",") if c})
    return out
