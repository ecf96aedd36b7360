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


def broadcast_subtrees(df: DataFrame, full_metadata: bool = True) -> list[str]:
    """toString of every BroadcastExchange subtree in the executed plan.

    Used to assert which relations a query is willing to materialize on the
    driver: a fact-scaling table (orders/customer/lineitem) under a
    BroadcastExchange is a plan that OOMs at 100x scale.
    """
    spark = df.sparkSession
    if full_metadata:
        spark.conf.set("spark.sql.debug.maxToStringFields", "1000")
        spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    out: list[str] = []

    def walk(node) -> None:
        name = node.nodeName()
        if name.startswith("AdaptiveSparkPlan"):
            # With AQE on (session default) the root AdaptiveSparkPlanExec is
            # a leaf from children()'s perspective; descend into the current
            # physical plan or the walk sees nothing and the guard is vacuous.
            walk(node.executedPlan())
            return
        if name.startswith("BroadcastExchange"):
            out.append(node.toString())
            return  # nested exchanges inside are part of this subtree
        for i in range(node.children().length()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out
