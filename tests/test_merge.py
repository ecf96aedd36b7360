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


def _state(df):
    return {(r.k): (r.v) for r in df.collect()}


def test_time_travel_reads_across_three_generations(spark, tmp_path):
    """read_as_of(v) must equal the sequential merge_upsert state after
    batch v, for every retained v across >= 3 generations, including a
    delete and a re-insert; read_as_of(None) is the current pointer;
    a never-committed version raises."""
    import pytest

    from gmail_bigquery_etl_spark.streaming.merge_sink import (
        apply_merge_batch,
        list_versions,
        read_as_of,
    )

    batches = [
        [(1, "a", False), (2, "b", False), (3, "c", False)],
        [(2, "b2", False), (3, None, True), (4, "d", False)],
        [(3, "c3", False), (1, None, True)],
    ]
    root = str(tmp_path / "tt_sink")
    expected = {}
    state = spark.createDataFrame([], "k int, v string")
    for i, rows in enumerate(batches):
        b = spark.createDataFrame(rows, "k int, v string, is_delete boolean")
        apply_merge_batch(spark, b, i, root, ["k"])
        state = merge_upsert(state, b, ["k"], delete_col="is_delete")
        expected[i] = _state(state)

    assert list_versions(root) == [0, 1, 2]
    for v in (0, 1, 2):
        assert _state(read_as_of(spark, root, v)) == expected[v], v
    assert _state(read_as_of(spark, root)) == expected[2]
    assert expected[1][4] == "d" and 3 not in expected[1]  # delete landed
    assert expected[2][3] == "c3" and 1 not in expected[2]  # re-insert+del
    with pytest.raises(ValueError, match="not retained"):
        read_as_of(spark, root, 7)


def test_vacuum_retention_keeps_current_and_horizon(spark, tmp_path):
    """vacuum(keep_last=N) drops the oldest snapshots, never the current
    pointer target; time-travel past the horizon raises instead of
    silently reading something else."""
    import pytest

    from gmail_bigquery_etl_spark.streaming.merge_sink import (
        apply_merge_batch,
        list_versions,
        read_as_of,
        vacuum,
    )

    root = str(tmp_path / "vac_sink")
    for i in range(4):
        b = spark.createDataFrame(
            [(1, f"v{i}", False)], "k int, v string, is_delete boolean"
        )
        apply_merge_batch(spark, b, i, root, ["k"])

    removed = vacuum(root, keep_last=2)
    assert removed == [0, 1]
    assert list_versions(root) == [2, 3]
    assert _state(read_as_of(spark, root)) == {1: "v3"}
    assert _state(read_as_of(spark, root, 2)) == {1: "v2"}
    with pytest.raises(ValueError, match="not retained"):
        read_as_of(spark, root, 0)
    # keep_last is floored at 1 and the current target always survives
    assert vacuum(root, keep_last=0) == [2]
    assert _state(read_as_of(spark, root)) == {1: "v3"}
