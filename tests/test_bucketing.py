"""Bucketed co-located joins (plans/bucketing.py): the write-once-shuffle,
join-forever-free layout, asserted at the physical-plan level."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.catalog import load_table
from gmail_bigquery_etl_spark.plans import plan_string, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "orderkey"),
        "b_orders", "orderkey", buckets=8, path=str(base / "orders"),
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "orderkey"),
        "b_lineitem", "orderkey", buckets=8, path=str(base / "lineitem"),
    )
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    o, li = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, "orderkey").groupBy("o_orderstatus").count()
        plan = plan_string(joined)
        assert "SortMergeJoin" in plan
        # co-located: the join itself needs no shuffle on either side
        join_part = plan.split("SortMergeJoin")[-1]
        assert "Exchange hashpartitioning(orderkey" not in join_part, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_unbucketed_join_does_exchange(spark):
    """Control: the same join over plain parquet shuffles both sides."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, SF, "orders").withColumnRenamed(
            "o_orderkey", "orderkey"
        )
        li = load_table(spark, SF, "lineitem").withColumnRenamed(
            "l_orderkey", "orderkey"
        )
        plan = plan_string(li.join(o, "orderkey"))
        assert "Exchange hashpartitioning(orderkey" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_bucketed_groupby_has_no_exchange(spark, bucketed):
    _, li = bucketed
    agg = li.groupBy("orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = plan_string(agg)
    assert "Exchange hashpartitioning(orderkey" not in plan, plan


def test_bucketed_join_result_matches_plain(spark, bucketed):
    o, li = bucketed
    plain_o = load_table(spark, SF, "orders").withColumnRenamed(
        "o_orderkey", "orderkey"
    )
    plain_li = load_table(spark, SF, "lineitem").withColumnRenamed(
        "l_orderkey", "orderkey"
    )
    a = li.join(o, "orderkey").count()
    b = plain_li.join(plain_o, "orderkey").count()
    assert a == b
