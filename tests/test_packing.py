"""Distributed prefix-sum shard packing (operators/packing.py): exact
equality with the naive global-window formulation, invariance to the
partition count, and the partitioned-window plan shape."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.catalog import load_table
from gmail_bigquery_etl_spark.functions.text import token_count
from gmail_bigquery_etl_spark.operators.packing import assign_token_shards

SMOKE_SF = "/root/testdata/sf0.001"
BUDGET = 1000


def _docs(spark):
    return load_table(spark, SMOKE_SF, "documents").select(
        "doc_id", token_count("text").cast("bigint").alias("n_tokens")
    )


def _naive(docs):
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = F.sum("n_tokens").over(w)
    return docs.withColumn(
        "shard", F.floor((cum - F.col("n_tokens")) / F.lit(BUDGET))
    )


def _assignment(df) -> dict[int, int]:
    return {r.doc_id: r.shard for r in df.select("doc_id", "shard").collect()}


def test_shards_match_global_window(spark):
    docs = _docs(spark)
    got = _assignment(assign_token_shards(docs, "n_tokens", BUDGET))
    want = _assignment(_naive(docs))
    assert got == want and len(got) == docs.count()


def test_shards_invariant_to_partition_count(spark):
    """Offsets derive from actual per-partition totals, so ANY range split
    must produce the identical assignment."""
    docs = _docs(spark)
    a = _assignment(assign_token_shards(docs, "n_tokens", BUDGET, num_partitions=2))
    b = _assignment(assign_token_shards(docs, "n_tokens", BUDGET, num_partitions=7))
    assert a == b


def test_full_data_window_is_partitioned(spark):
    """The cumsum over the DATA must run partitioned by _pid (parallel);
    only the O(num_partitions) offsets window may be global."""
    from gmail_bigquery_etl_spark.plans.inspect import plan_string

    plan = plan_string(assign_token_shards(_docs(spark), "n_tokens", BUDGET))
    assert "hashpartitioning(_pid" in plan
