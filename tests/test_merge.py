"""Unit tests for operators/merge.py (CDC merge + SCD2) beyond the
oracle-gated aggregate queries: row-level semantics on a hand-built batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.operators.merge import merge_upsert, scd2_from_events


def test_merge_upsert_update_insert_delete(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id bigint, name string, v double",
    )
    changes = spark.createDataFrame(
        # update id=2, delete id=3, insert id=4
        [(2, "b2", 21.0, False), (3, "c", 30.0, True), (4, "d", 40.0, False)],
        "id bigint, name string, v double, is_delete boolean",
    )
    got = {
        r["id"]: (r["name"], r["v"])
        for r in merge_upsert(base, changes, ["id"], delete_col="is_delete").collect()
    }
    assert got == {1: ("a", 10.0), 2: ("b2", 21.0), 4: ("d", 40.0)}


def test_merge_upsert_without_delete_col_is_pure_upsert(spark):
    base = spark.createDataFrame([(1, "a")], "id bigint, name string")
    changes = spark.createDataFrame([(1, "a2"), (2, "b")], "id bigint, name string")
    got = {
        r["id"]: r["name"] for r in merge_upsert(base, changes, ["id"]).collect()
    }
    assert got == {1: "a2", 2: "b"}


def test_merge_upsert_shuffle_fallback_matches_broadcast(spark):
    base = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    changes = (
        spark.range(0, 1000, 3)
        .withColumn("v", F.col("id") * 10)
        .withColumn("is_delete", F.col("id") % 9 == 0)
    )
    a = merge_upsert(base, changes, ["id"], "is_delete", broadcast_hint=True)
    b = merge_upsert(base, changes, ["id"], "is_delete", broadcast_hint=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_scd2_interval_chain(spark):
    feed = spark.createDataFrame(
        [(7, 1, "2024-01-01"), (7, 2, "2024-01-05"), (7, 3, "2024-01-05"),
         (8, 4, "2024-02-01")],
        "key bigint, change_id bigint, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = {
        r["change_id"]: (
            str(r["effective_from"])[:10],
            None if r["effective_to"] is None else str(r["effective_to"])[:10],
            r["is_current"],
        )
        for r in scd2_from_events(
            feed, ["key"], "ts", tiebreakers=["change_id"]
        ).collect()
    }
    # same-ts versions chain deterministically by the tiebreaker
    assert rows[1] == ("2024-01-01", "2024-01-05", False)
    assert rows[2] == ("2024-01-05", "2024-01-05", False)
    assert rows[3] == ("2024-01-05", None, True)
    assert rows[4] == ("2024-02-01", None, True)
