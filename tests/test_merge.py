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


def test_replay_guard_makes_redelivery_a_noop(spark, tmp_path):
    """foreachBatch redelivers an uncommitted batch after a crash; if the
    crash fell between the pointer swap and the checkpoint commit the
    redelivered batch_id EQUALS the committed pointer id. Without the
    guard the rewrite would overwrite the snapshot dir the merged plan
    is lazily reading (Spark refuses -> wedged recovery). The guard must
    turn any batch_id <= pointer id into a clean no-op."""
    from gmail_bigquery_etl_spark.streaming.merge_sink import (
        apply_merge_batch,
        list_versions,
        read_as_of,
    )

    root = str(tmp_path / "replay_sink")
    b0 = spark.createDataFrame(
        [(1, "a", False), (2, "b", False)], "k int, v string, is_delete boolean"
    )
    b1 = spark.createDataFrame(
        [(2, "b2", False), (3, "c", False)],
        "k int, v string, is_delete boolean",
    )
    apply_merge_batch(spark, b0, 0, root, ["k"])
    apply_merge_batch(spark, b1, 1, root, ["k"])
    want = _state(read_as_of(spark, root))

    # exact-id redelivery (the crash-window case) and a stale earlier id
    mutated = spark.createDataFrame(
        [(9, "SHOULD_NOT_LAND", False)], "k int, v string, is_delete boolean"
    )
    apply_merge_batch(spark, mutated, 1, root, ["k"])
    apply_merge_batch(spark, mutated, 0, root, ["k"])
    assert list_versions(root) == [0, 1]
    assert _state(read_as_of(spark, root)) == want


def test_schema_evolution_adds_columns_null_backfilled(spark, tmp_path):
    """A batch may ADD columns (Delta mergeSchema): history rows read
    back NULL for the new column at every version at or after the
    evolution; pre-evolution snapshots keep their original schema. A
    batch that DROPS a column is rejected loudly."""
    import pytest

    from gmail_bigquery_etl_spark.streaming.merge_sink import (
        apply_merge_batch,
        read_as_of,
    )

    root = str(tmp_path / "evo_sink")
    b0 = spark.createDataFrame(
        [(1, "a", False), (2, "b", False)], "k int, v string, is_delete boolean"
    )
    b1 = spark.createDataFrame(
        [(2, "b2", 99, False), (3, "c", 7, False)],
        "k int, v string, score int, is_delete boolean",
    )
    b2 = spark.createDataFrame(
        [(1, "a3", 5, False)], "k int, v string, score int, is_delete boolean"
    )
    apply_merge_batch(spark, b0, 0, root, ["k"])
    apply_merge_batch(spark, b1, 1, root, ["k"])
    apply_merge_batch(spark, b2, 2, root, ["k"])

    v0 = read_as_of(spark, root, 0)
    assert v0.columns == ["k", "v"]  # pre-evolution snapshot untouched
    v1 = {r.k: (r.v, r.score) for r in read_as_of(spark, root, 1).collect()}
    # k=1 predates the score column -> NULL backfill; updated rows carry it
    assert v1 == {1: ("a", None), 2: ("b2", 99), 3: ("c", 7)}
    v2 = {r.k: (r.v, r.score) for r in read_as_of(spark, root, 2).collect()}
    assert v2 == {1: ("a3", 5), 2: ("b2", 99), 3: ("c", 7)}

    dropped = spark.createDataFrame(
        [(4, False)], "k int, is_delete boolean"
    )
    with pytest.raises(ValueError, match="drops snapshot columns"):
        apply_merge_batch(spark, dropped, 3, root, ["k"])


def test_timestamp_as_of_resolves_and_respects_vacuum(spark, tmp_path):
    """read_as_of(ts=...) is Delta's timestampAsOf: newest snapshot whose
    recorded commit timestamp <= ts. Exact-boundary ts hits its own
    version; a ts older than the oldest retained commit raises (silent
    fallback would corrupt a backfill), including after vacuum removes
    the history the ts points into."""
    import pytest

    from gmail_bigquery_etl_spark.streaming.merge_sink import (
        apply_merge_batch,
        read_as_of,
        vacuum,
    )

    root = str(tmp_path / "ts_sink")
    for i, ts in enumerate([100.0, 200.0, 300.0]):
        b = spark.createDataFrame(
            [(1, f"v{i}", False)], "k int, v string, is_delete boolean"
        )
        apply_merge_batch(spark, b, i, root, ["k"], commit_ts=ts)

    assert _state(read_as_of(spark, root, ts=100.0)) == {1: "v0"}  # boundary
    assert _state(read_as_of(spark, root, ts=250.0)) == {1: "v1"}
    assert _state(read_as_of(spark, root, ts=1e9)) == {1: "v2"}
    with pytest.raises(ValueError, match="at or before"):
        read_as_of(spark, root, ts=99.9)
    with pytest.raises(ValueError, match="not both"):
        read_as_of(spark, root, version=1, ts=250.0)

    vacuum(root, keep_last=1)
    # ts=250 resolved to version 1 before; that history is gone -> raise
    with pytest.raises(ValueError, match="at or before"):
        read_as_of(spark, root, ts=250.0)
    assert _state(read_as_of(spark, root, ts=300.0)) == {1: "v2"}


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


def test_change_data_feed_classifies_every_transition(spark, tmp_path):
    """read_changes row-level semantics on hand-built generations:
    insert / delete / update (both images) / unchanged (no row) /
    net-effect (inserted AND deleted between endpoints -> no row);
    evolution interplay (a column added mid-history NULL-backfills the
    preimage); endpoint validation raises."""
    import pytest

    from gmail_bigquery_etl_spark.streaming.merge_sink import (
        apply_merge_batch,
        read_changes,
    )

    root = str(tmp_path / "cdf_sink")
    b0 = spark.createDataFrame(
        [(1, "keep", False), (2, "upd", False), (3, "gone", False)],
        "k int, v string, is_delete boolean",
    )
    # transient key 9: lives only between the endpoints
    b1 = spark.createDataFrame(
        [(2, "upd2", 5, False), (9, "blip", 1, False)],
        "k int, v string, score int, is_delete boolean",
    )
    b2 = spark.createDataFrame(
        [(3, None, None, True), (9, None, None, True), (4, "new", 7, False)],
        "k int, v string, score int, is_delete boolean",
    )
    for i, b in enumerate([b0, b1, b2]):
        apply_merge_batch(spark, b, i, root, ["k"])

    rows = {
        (r.k, r._change_type): (r.v, r.score)
        for r in read_changes(spark, root, 0, 2, ["k"]).collect()
    }
    assert rows == {
        (2, "update_preimage"): ("upd", None),  # evolution: NULL backfill
        (2, "update_postimage"): ("upd2", 5),
        (3, "delete"): ("gone", None),
        (4, "insert"): ("new", 7),
        # key 1 unchanged -> no row; key 9 net-effect -> no row
    }

    with pytest.raises(ValueError, match="must precede"):
        read_changes(spark, root, 2, 2, ["k"])
    with pytest.raises(ValueError, match="not retained"):
        read_changes(spark, root, 0, 7, ["k"])


def test_change_log_preserves_transients_and_respects_vacuum(spark, tmp_path):
    """read_changes_log vs read_changes: the log preserves transients
    (insert at v1 + delete at v2 both appear, stamped per commit) where
    the endpoint diff nets them out; bootstrap enters as version-0
    inserts; a vacuum hole inside the requested range raises instead of
    silently skipping commits."""
    import pytest

    from gmail_bigquery_etl_spark.streaming.merge_sink import (
        apply_merge_batch,
        read_changes,
        read_changes_log,
        vacuum,
    )

    root = str(tmp_path / "log_sink")
    b0 = spark.createDataFrame(
        [(1, "a", False)], "k int, v string, is_delete boolean"
    )
    b1 = spark.createDataFrame(
        [(9, "blip", False), (1, "a2", False)],
        "k int, v string, is_delete boolean",
    )
    b2 = spark.createDataFrame(
        [(9, None, True)], "k int, v string, is_delete boolean"
    )
    for i, b in enumerate([b0, b1, b2]):
        apply_merge_batch(spark, b, i, root, ["k"])

    log = {
        (r.k, r._commit_version, r._change_type): r.v
        for r in read_changes_log(spark, root, ["k"]).collect()
    }
    assert log == {
        (1, 0, "insert"): "a",  # bootstrap
        (1, 1, "update_preimage"): "a",
        (1, 1, "update_postimage"): "a2",
        (9, 1, "insert"): "blip",  # transient: present in the log...
        (9, 2, "delete"): "blip",  # ...on both sides of its short life
    }
    # ...but absent from the endpoint diff (net-effect)
    net = {r.k for r in read_changes(spark, root, 0, 2, ["k"]).collect()}
    assert 9 not in net and net == {1}

    # explicit sub-range: only commit 2's slice
    tail = read_changes_log(spark, root, ["k"], from_version=1, to_version=2)
    assert {
        (r.k, r._commit_version, r._change_type) for r in tail.collect()
    } == {(9, 2, "delete")}

    vacuum(root, keep_last=2)  # drops version 0
    with pytest.raises(ValueError, match="not fully retained"):
        read_changes_log(spark, root, ["k"], from_version=0)


def test_forget_keys_erases_retroactively_across_history(spark, tmp_path):
    """Right-to-be-forgotten vs CDC delete: after forget_keys the key
    is gone from EVERY retained version (time travel), from the
    endpoint change feed, and from the per-commit log; all other rows'
    per-version states are bit-identical; commit-ts sidecars survive
    so timestamp travel still resolves."""
    from gmail_bigquery_etl_spark.streaming.merge_sink import (
        apply_merge_batch,
        forget_keys,
        read_as_of,
        read_changes,
        read_changes_log,
    )

    root = str(tmp_path / "forget_sink")
    batches = [
        [(1, "a", False), (2, "b", False), (7, "secret", False)],
        [(7, "secret2", False), (3, "c", False)],
        [(2, "b2", False)],
    ]
    for i, rows in enumerate(batches):
        b = spark.createDataFrame(rows, "k int, v string, is_delete boolean")
        apply_merge_batch(spark, b, i, root, ["k"], commit_ts=100.0 * (i + 1))

    want = {
        v: {r.k: r.v for r in read_as_of(spark, root, v).collect() if r.k != 7}
        for v in (0, 1, 2)
    }
    removed = forget_keys(spark, root, ["k"], [(7,)])
    assert removed == {0: 1, 1: 1, 2: 1}
    for v in (0, 1, 2):
        assert {
            r.k: r.v for r in read_as_of(spark, root, v).collect()
        } == want[v], v
    assert 7 not in {
        r.k for r in read_changes(spark, root, 0, 2, ["k"]).collect()
    }
    assert 7 not in {
        r.k for r in read_changes_log(spark, root, ["k"]).collect()
    }
    # timestamp travel still resolves through preserved sidecars
    assert {r.k for r in read_as_of(spark, root, ts=150.0).collect()} == {1, 2}
