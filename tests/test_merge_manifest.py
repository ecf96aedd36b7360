"""Partition-scoped manifest merge sink (streaming/merge_manifest.py):
state parity with the flat sink, the file-reuse (no-rewrite) guarantee,
refcounting vacuum, replay guard, bucket death, timestamp travel."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.streaming.merge_manifest import (
    apply_merge_batch_bucketed,
    current_manifest,
    list_manifest_versions,
    read_manifest_as_of,
    vacuum_manifests,
)
from gmail_bigquery_etl_spark.streaming.merge_sink import (
    apply_merge_batch,
    read_as_of,
)

BATCHES = [
    [(1, "a", False), (2, "b", False), (3, "c", False), (18, "r", False)],
    [(2, "b2", False), (3, None, True), (4, "d", False)],
    [(3, "c3", False), (1, None, True), (18, "r2", False)],
]
SCHEMA = "k int, v string, is_delete boolean"


def _state(df):
    return {r.k: r.v for r in df.collect()}


@pytest.fixture()
def twin_sinks(spark, tmp_path):
    """The same 3 CDC generations through BOTH sinks."""
    flat = str(tmp_path / "flat")
    man = str(tmp_path / "man")
    for i, rows in enumerate(BATCHES):
        b = spark.createDataFrame(rows, SCHEMA)
        apply_merge_batch(spark, b, i, flat, ["k"], commit_ts=100.0 * (i + 1))
        apply_merge_batch_bucketed(
            spark, b, i, man, ["k"], n_buckets=8, commit_ts=100.0 * (i + 1)
        )
    return flat, man


def test_manifest_sink_matches_flat_sink_every_version(spark, twin_sinks):
    """Per-version state equality with the flat whole-rewrite sink on
    identical batches -- the partition-scoped write is pure physical
    layout, never semantics."""
    flat, man = twin_sinks
    assert list_manifest_versions(man) == [0, 1, 2]
    for v in (0, 1, 2):
        assert _state(read_manifest_as_of(spark, man, v)) == _state(
            read_as_of(spark, flat, v)
        ), v
    assert _state(read_manifest_as_of(spark, man)) == _state(
        read_as_of(spark, flat)
    )
    # timestampAsOf resolution parity
    assert _state(read_manifest_as_of(spark, man, ts=250.0)) == _state(
        read_as_of(spark, flat, ts=250.0)
    )
    with pytest.raises(ValueError, match="at or before"):
        read_manifest_as_of(spark, man, ts=50.0)


def test_untouched_buckets_are_reused_not_rewritten(spark, tmp_path):
    """The no-rewrite guarantee, checked on METADATA: a batch touching
    one key must carry every other bucket's dir pointer forward as an
    IDENTICAL STRING (same generation dir), and the new generation's
    directory must contain only the touched buckets."""
    sink = str(tmp_path / "reuse")
    wide = spark.createDataFrame(
        [(i, f"v{i}", False) for i in range(50)], SCHEMA
    )
    one = spark.createDataFrame([(7, "NEW", False)], SCHEMA)
    apply_merge_batch_bucketed(spark, wide, 0, sink, ["k"], n_buckets=8)
    m0 = current_manifest(sink)
    apply_merge_batch_bucketed(spark, one, 1, sink, ["k"], n_buckets=8)
    m1 = current_manifest(sink)

    touched = {
        b for b, d in m1["buckets"].items() if d.startswith("gen_1/")
    }
    assert len(touched) == 1  # one key -> one bucket rewritten
    for b, d in m0["buckets"].items():
        if b not in touched:
            assert m1["buckets"][b] == d, b  # pointer reused verbatim
    gen1 = os.path.join(sink, "gen_1")
    assert (
        sum(1 for n in os.listdir(gen1) if n.startswith("mbucket=")) == 1
    )
    got = _state(read_manifest_as_of(spark, sink))
    assert got[7] == "NEW" and len(got) == 50


def test_replay_guard_and_bucket_death(spark, tmp_path):
    """Crash-window redelivery (same batch id, mutated content) no-ops;
    deleting every row in a bucket removes that bucket from the
    manifest entirely instead of leaving an empty dir pointer."""
    sink = str(tmp_path / "death")
    b0 = spark.createDataFrame([(1, "a", False), (2, "b", False)], SCHEMA)
    apply_merge_batch_bucketed(spark, b0, 0, sink, ["k"], n_buckets=4)
    n0 = len(current_manifest(sink)["buckets"])

    poison = spark.createDataFrame([(9, "X", False)], SCHEMA)
    apply_merge_batch_bucketed(spark, poison, 0, sink, ["k"], n_buckets=4)
    assert _state(read_manifest_as_of(spark, sink)) == {1: "a", 2: "b"}

    # delete key 1; if it lived alone in its bucket the bucket dies
    kill = spark.createDataFrame([(1, None, True)], SCHEMA)
    apply_merge_batch_bucketed(spark, kill, 1, sink, ["k"], n_buckets=4)
    m = current_manifest(sink)
    assert _state(read_manifest_as_of(spark, sink)) == {2: "b"}
    assert len(m["buckets"]) <= n0

    with pytest.raises(ValueError, match="n_buckets"):
        apply_merge_batch_bucketed(spark, b0, 2, sink, ["k"], n_buckets=16)


def test_vacuum_refcounts_shared_dirs(spark, tmp_path):
    """Retention is a refcount over retained manifests: generation-0
    bucket dirs still referenced by the CURRENT manifest survive any
    horizon (an age-based delete would corrupt the live table);
    manifests past the horizon disappear (their versions raise); the
    current version still reads correctly."""
    man = str(tmp_path / "vac")
    wide = spark.createDataFrame(
        [(i, f"v{i}", False) for i in range(50)], SCHEMA
    )
    apply_merge_batch_bucketed(spark, wide, 0, man, ["k"], n_buckets=8)
    for i, k in enumerate([7, 13], start=1):
        one = spark.createDataFrame([(k, f"upd{i}", False)], SCHEMA)
        apply_merge_batch_bucketed(spark, one, i, man, ["k"], n_buckets=8)
    before = _state(read_manifest_as_of(spark, man))
    removed = vacuum_manifests(man, keep_last=1)
    assert removed["manifests"] == [0, 1]
    assert list_manifest_versions(man) == [2]
    # gen_0 dirs referenced by manifest 2 must have survived
    cur = current_manifest(man)
    assert any(d.startswith("gen_0/") for d in cur["buckets"].values())
    for d in cur["buckets"].values():
        assert os.path.isdir(os.path.join(man, d)), d
    # removed dirs are exactly the unreferenced ones
    for rel in removed["dirs"]:
        assert not os.path.exists(os.path.join(man, rel))
    assert _state(read_manifest_as_of(spark, man)) == before
    with pytest.raises(ValueError, match="not retained"):
        read_manifest_as_of(spark, man, 0)


def test_streaming_bucketed_merge_matches_sequential_batch(spark, tmp_path):
    """The foreachBatch wrapper drains a replayed CDC feed and the final
    manifest state equals sequentially applying the same batches --
    i.e., the streaming path is exactly the batch path."""
    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        start_bucketed_merge_apply,
    )

    feed = str(tmp_path / "feed")
    sink = str(tmp_path / "ssink")
    ckpt = str(tmp_path / "sckpt")
    ref = str(tmp_path / "ref")
    rows = [(i, f"v{i % 7}", i % 13 == 0) for i in range(200)]
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(4).write.mode("overwrite").parquet(feed)

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = start_bucketed_merge_apply(stream, sink, ckpt, ["k"], n_buckets=8)
    q.awaitTermination(300)
    assert not q.isActive

    # reference: one-shot batch apply of the full feed (key-unique rows)
    apply_merge_batch_bucketed(spark, df, 0, ref, ["k"], n_buckets=8)
    assert _state(read_manifest_as_of(spark, sink)) == _state(
        read_manifest_as_of(spark, ref)
    )


def test_point_lookup_reads_one_bucket_only(spark, tmp_path):
    """read_manifest_point_lookup answers from EXACTLY one bucket dir
    (plan-asserted single scan) and agrees with filtering the full
    read, for every key in the table, at an old version, and for a
    missing key (empty, correctly typed); binding the wrong key set
    raises."""
    from gmail_bigquery_etl_spark.plans.inspect import plan_string
    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        read_manifest_point_lookup,
    )

    sink = str(tmp_path / "pl")
    wide = spark.createDataFrame(
        [(i, f"v{i}", False) for i in range(40)], SCHEMA
    )
    upd = spark.createDataFrame([(7, "UPD", False)], SCHEMA)
    apply_merge_batch_bucketed(spark, wide, 0, sink, ["k"], n_buckets=8)
    apply_merge_batch_bucketed(spark, upd, 1, sink, ["k"], n_buckets=8)

    for k, want in [(7, "UPD"), (13, "v13"), (0, "v0")]:
        df = read_manifest_point_lookup(spark, sink, {"k": k})
        rows = df.collect()
        assert [(r.k, r.v) for r in rows] == [(k, want)], k
        assert plan_string(df).count("FileScan parquet") == 1

    # old version still sees the pre-update value
    old = read_manifest_point_lookup(spark, sink, {"k": 7}, version=0)
    assert [r.v for r in old.collect()] == ["v7"]

    missing = read_manifest_point_lookup(spark, sink, {"k": 999})
    assert missing.count() == 0 and missing.columns == ["k", "v"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="exactly the sink keys"):
        read_manifest_point_lookup(spark, sink, {"wrong": 1})


def test_compact_rewrites_one_generation_and_unpins_history(spark, tmp_path):
    """OPTIMIZE lifecycle: after many touch-one-key generations the live
    manifest pins a dir in nearly every generation; compact_manifest
    rewrites the identical state into ONE fresh generation, after which
    vacuum(keep_last=1) reclaims EVERY older gen dir (the refcount
    drops to zero) while the state stays bit-identical."""
    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        compact_manifest,
    )

    sink = str(tmp_path / "opt")
    wide = spark.createDataFrame(
        [(i, f"v{i}", False) for i in range(40)], SCHEMA
    )
    apply_merge_batch_bucketed(spark, wide, 0, sink, ["k"], n_buckets=8)
    for i, k in enumerate([3, 11, 19, 27], start=1):
        one = spark.createDataFrame([(k, f"u{i}", False)], SCHEMA)
        apply_merge_batch_bucketed(spark, one, i, sink, ["k"], n_buckets=8)
    before = _state(read_manifest_as_of(spark, sink))
    gens_before = {
        d.split("/", 1)[0] for d in current_manifest(sink)["buckets"].values()
    }
    assert len(gens_before) > 1  # history is genuinely spread out

    new_id = compact_manifest(spark, sink)
    m = current_manifest(sink)
    assert m["batch_id"] == new_id
    assert {
        d.split("/", 1)[0] for d in m["buckets"].values()
    } == {f"gen_{new_id}"}
    assert _state(read_manifest_as_of(spark, sink)) == before

    removed = vacuum_manifests(sink, keep_last=1)
    assert set(removed["manifests"]) == {0, 1, 2, 3, 4}
    for g in gens_before:
        assert not os.path.exists(os.path.join(sink, g)), g
    assert _state(read_manifest_as_of(spark, sink)) == before


def test_matview_sink_layout_is_vacuum_compatible(spark, tmp_path):
    """The IVM sink intentionally shares the snap_/pointer layout, so
    merge_sink's list_versions/vacuum work on it unchanged -- one
    retention mechanism across every snapshot sink."""
    from gmail_bigquery_etl_spark.streaming.matview import (
        apply_view_delta,
        read_view,
    )
    from gmail_bigquery_etl_spark.streaming.merge_sink import (
        list_versions,
        vacuum,
    )

    sink = str(tmp_path / "mv_vac")
    for i in range(3):
        d = spark.createDataFrame(
            [("a", 10 * (i + 1), 1)], "g string, cents bigint, mult int"
        )
        apply_view_delta(spark, d, i, sink, ["g"], ["cents"])
    assert list_versions(sink) == [0, 1, 2]
    assert vacuum(sink, keep_last=1) == [0, 1]
    got = {r.g: r.cents for r in read_view(spark, sink).collect()}
    assert got == {"a": 60}


def test_describe_history_and_files_metadata_tables(spark, tmp_path):
    """Metadata tables: describe_history reports per-commit reuse (the
    write-amplification audit -- a one-key commit over an 8-bucket
    table reuses ~7 buckets), compaction drops reuse back to zero, and
    manifest_files itemizes exactly the current manifest's pointers;
    both read metadata only (no data-page scans to verify against --
    asserted on byte totals matching os-level sizes)."""
    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        compact_manifest,
        describe_history,
        manifest_files,
    )

    sink = str(tmp_path / "meta")
    wide = spark.createDataFrame(
        [(i, f"v{i}", False) for i in range(40)], SCHEMA
    )
    one = spark.createDataFrame([(5, "upd", False)], SCHEMA)
    apply_merge_batch_bucketed(
        spark, wide, 0, sink, ["k"], n_buckets=8, commit_ts=100.0
    )
    apply_merge_batch_bucketed(
        spark, one, 1, sink, ["k"], n_buckets=8, commit_ts=200.0
    )
    hist = {r.version: r for r in describe_history(spark, sink).collect()}
    assert hist[0].n_buckets_reused == 0  # first commit wrote everything
    assert hist[1].n_buckets_reused == hist[1].n_buckets_live - 1
    assert hist[1].commit_ts == 200.0

    files = manifest_files(spark, sink).collect()
    assert {r.bucket for r in files} == {
        int(b) for b in current_manifest(sink)["buckets"]
    }
    assert all(r.n_files >= 1 and r.bytes > 0 for r in files)
    # metadata totals agree across the two views
    assert sum(r.n_files for r in files) == hist[1].n_files
    assert sum(r.bytes for r in files) == hist[1].total_bytes

    compact_manifest(spark, sink)
    hist2 = {r.version: r for r in describe_history(spark, sink).collect()}
    assert hist2[2].n_buckets_reused == 0  # compaction rewrote everything


def test_forget_keys_bucketed_rewrites_only_target_buckets(spark, tmp_path):
    """Partition-scoped erasure: the forgotten key disappears from
    every retained version AND from the manifest change feed, other
    rows' states are bit-identical, and -- the scale claim -- bucket
    dirs NOT containing the key keep their exact file bytes (no
    rewrite happened there)."""
    import hashlib

    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        forget_keys_bucketed,
        read_manifest_changes,
    )

    sink = str(tmp_path / "forget_bkt")
    wide = spark.createDataFrame(
        [(i, f"v{i}", False) for i in range(40)], SCHEMA
    )
    upd = spark.createDataFrame(
        [(7, "secret2", False), (41, "new", False)], SCHEMA
    )
    apply_merge_batch_bucketed(spark, wide, 0, sink, ["k"], n_buckets=8)
    apply_merge_batch_bucketed(spark, upd, 1, sink, ["k"], n_buckets=8)

    def file_hashes():
        out = {}
        for gen in sorted(os.listdir(sink)):
            gd = os.path.join(sink, gen)
            if not (gen.startswith("gen_") and os.path.isdir(gd)):
                continue
            for b in sorted(os.listdir(gd)):
                bd = os.path.join(gd, b)
                if not b.startswith("mbucket="):
                    continue
                h = hashlib.md5()
                for f in sorted(os.listdir(bd)):
                    if f.endswith(".parquet"):
                        h.update(open(os.path.join(bd, f), "rb").read())
                out[f"{gen}/{b}"] = h.hexdigest()
        return out

    before_hashes = file_hashes()
    want = {
        v: {r.k: r.v for r in read_manifest_as_of(spark, sink, v).collect() if r.k != 7}
        for v in (0, 1)
    }
    removed = forget_keys_bucketed(spark, sink, [(7,)])
    assert sum(removed.values()) >= 2  # key 7 in both generations
    for v in (0, 1):
        assert {
            r.k: r.v for r in read_manifest_as_of(spark, sink, v).collect()
        } == want[v], v
    assert 7 not in {
        r.k for r in read_manifest_changes(spark, sink, 0, 1).collect()
    }
    after_hashes = file_hashes()
    untouched = [
        d for d in before_hashes
        if d not in removed and before_hashes[d] == after_hashes.get(d)
    ]
    rewritten = set(removed)
    # every non-target bucket kept its exact bytes
    assert set(before_hashes) - rewritten == set(untouched)


def test_bloom_index_skips_buckets_and_matches_full_filter(spark, tmp_path):
    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        apply_merge_batch_bucketed,
        bloom_candidate_buckets,
        build_bloom_index,
        current_manifest,
        read_manifest_as_of,
        read_manifest_bloom_lookup,
    )

    root = str(tmp_path / "bloom_sink")
    rows = [(i, i % 37, float(i)) for i in range(500)]
    df = spark.createDataFrame(rows, "k bigint, grp bigint, v double")
    apply_merge_batch_bucketed(
        spark, df.withColumn("is_delete", F.lit(False)), 0, root, ["k"],
        n_buckets=16, commit_ts=1.0,
    )
    build_bloom_index(spark, root, "grp")

    n_live = len(current_manifest(root)["buckets"])
    full = read_manifest_as_of(spark, root)
    for probe in (0, 7, 36):
        cands = bloom_candidate_buckets(spark, root, "grp", probe)
        # sound: every bucket truly holding the value is a candidate
        got = read_manifest_bloom_lookup(spark, root, "grp", probe)
        want = full.where(F.col("grp") == probe)
        assert sorted(r.k for r in got.collect()) == sorted(
            r.k for r in want.collect()
        )
        assert len(cands) <= n_live

    # a value absent everywhere: with high probability not all d bits
    # collide in any bucket at m=4096 -- and even if they did, the exact
    # filter returns empty
    got = read_manifest_bloom_lookup(spark, root, "grp", 999_999)
    assert got.count() == 0
    # the skipping is real, not vacuous: the absent probe rules out
    # at least one bucket
    assert len(
        bloom_candidate_buckets(spark, root, "grp", 999_999)
    ) < n_live


def test_bloom_index_is_version_pinned_and_requires_build(spark, tmp_path):
    import pytest as _pytest

    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        apply_merge_batch_bucketed,
        bloom_candidate_buckets,
        build_bloom_index,
        read_manifest_bloom_lookup,
    )

    root = str(tmp_path / "bloom_pin")
    df = spark.createDataFrame(
        [(i, i % 5, 0.0) for i in range(50)], "k bigint, grp bigint, v double"
    )
    apply_merge_batch_bucketed(
        spark, df.withColumn("is_delete", F.lit(False)), 0, root, ["k"],
        n_buckets=8, commit_ts=1.0,
    )
    with _pytest.raises(ValueError, match="bloom index"):
        bloom_candidate_buckets(spark, root, "grp", 1)
    build_bloom_index(spark, root, "grp")
    assert read_manifest_bloom_lookup(spark, root, "grp", 1).count() == 10

    # new commit => new version; the old index must not silently serve it
    apply_merge_batch_bucketed(
        spark,
        spark.createDataFrame(
            [(1000, 1, 9.0)], "k bigint, grp bigint, v double"
        ).withColumn("is_delete", F.lit(False)),
        1, root, ["k"], n_buckets=8, commit_ts=2.0,
    )
    with _pytest.raises(ValueError, match="version 1"):
        read_manifest_bloom_lookup(spark, root, "grp", 1)
    # rebuilding at the new version picks up the new row
    build_bloom_index(spark, root, "grp")
    assert read_manifest_bloom_lookup(spark, root, "grp", 1).count() == 11


def _mk_sink(spark, root, n=60, n_buckets=8):
    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        apply_merge_batch_bucketed,
    )

    df = spark.createDataFrame(
        [(i, i % 6, float(i)) for i in range(n)],
        "k bigint, grp bigint, v double",
    )
    apply_merge_batch_bucketed(
        spark, df.withColumn("is_delete", F.lit(False)), 0, root, ["k"],
        n_buckets=n_buckets, commit_ts=1.0,
    )
    return df


def test_shallow_clone_is_zero_copy_and_independently_writable(
    spark, tmp_path
):
    import os

    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        apply_merge_batch_bucketed,
        clone_manifest,
        current_manifest,
        read_manifest_as_of,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _mk_sink(spark, src)
    clone_manifest(spark, src, dst, commit_ts=2.0)

    # zero data bytes under the clone root: metadata only
    data_dirs = [
        n for n in os.listdir(dst) if os.path.isdir(os.path.join(dst, n))
    ]
    assert data_dirs == []
    assert read_manifest_as_of(spark, dst).count() == 60
    assert current_manifest(dst)["cloned_from"]["version"] == 0

    # copy-on-write: merging into the clone rewrites only touched
    # buckets locally; the source is untouched
    apply_merge_batch_bucketed(
        spark,
        spark.createDataFrame(
            [(0, 99, -1.0)], "k bigint, grp bigint, v double"
        ).withColumn("is_delete", F.lit(False)),
        1, dst, ["k"], n_buckets=8, commit_ts=3.0,
    )
    got = {r.k: r.grp for r in read_manifest_as_of(spark, dst).collect()}
    assert got[0] == 99 and len(got) == 60
    src_state = {
        r.k: r.grp for r in read_manifest_as_of(spark, src).collect()
    }
    assert src_state[0] == 0
    # untouched clone buckets still reference the source by abs path
    m = current_manifest(dst)
    assert any(os.path.isabs(d) for d in m["buckets"].values())
    assert any(not os.path.isabs(d) for d in m["buckets"].values())


def test_shallow_clone_breaks_loudly_if_source_vacuumed_away(
    spark, tmp_path
):
    import shutil as _sh

    import pytest as _pytest

    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        clone_manifest,
        read_manifest_as_of,
    )

    src = str(tmp_path / "src2")
    dst = str(tmp_path / "dst2")
    _mk_sink(spark, src)
    clone_manifest(spark, src, dst, commit_ts=2.0)
    _sh.rmtree(src)
    with _pytest.raises(Exception):
        read_manifest_as_of(spark, dst).count()


def test_deep_clone_survives_source_removal(spark, tmp_path):
    import shutil as _sh

    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        clone_manifest,
        read_manifest_as_of,
    )

    src = str(tmp_path / "src3")
    dst = str(tmp_path / "dst3")
    df = _mk_sink(spark, src)
    clone_manifest(spark, src, dst, deep=True, commit_ts=2.0)
    _sh.rmtree(src)
    got = sorted(r.k for r in read_manifest_as_of(spark, dst).collect())
    assert got == sorted(r.k for r in df.collect())


def test_clone_refuses_existing_target(spark, tmp_path):
    import pytest as _pytest

    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        clone_manifest,
    )

    src = str(tmp_path / "src4")
    _mk_sink(spark, src)
    with _pytest.raises(ValueError, match="already a sink"):
        clone_manifest(spark, src, src)


def test_delete_where_rewrites_only_matching_buckets(spark, tmp_path):
    import os

    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        current_manifest,
        delete_where,
        read_manifest_as_of,
    )

    root = str(tmp_path / "dml_del")
    _mk_sink(spark, root, n=80, n_buckets=8)
    before = current_manifest(root)
    res = delete_where(spark, root, "grp = 3", commit_ts=2.0)
    assert res["version"] == 1
    after = current_manifest(root)

    # predicate rows gone, everything else intact
    state = read_manifest_as_of(spark, root)
    assert state.where("grp = 3").count() == 0
    assert state.count() == 80 - 80 // 6 - (1 if 80 % 6 > 3 else 0)

    # untouched buckets carry identical dir pointers forward
    touched = set(res["touched_buckets"])
    for b, d in after["buckets"].items():
        if b not in touched:
            assert before["buckets"][b] == d

    # DML is a normal commit: history retains the pre-delete state
    old = read_manifest_as_of(spark, root, version=0)
    assert old.where("grp = 3").count() > 0
    # rewritten dirs live under the DML's own staged generation
    # (suffixed so a racing writer's gen_1/ can never be clobbered)
    assert all(
        d is None or d.startswith("gen_1_dml/")
        for d in res["touched_buckets"].values()
    )
    _ = os


def test_delete_where_drops_fully_deleted_buckets(spark, tmp_path):
    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        current_manifest,
        delete_where,
        read_manifest_as_of,
    )

    root = str(tmp_path / "dml_del_all")
    _mk_sink(spark, root, n=40, n_buckets=4)
    delete_where(spark, root, "TRUE", commit_ts=2.0)
    assert current_manifest(root)["buckets"] == {}
    assert read_manifest_as_of(spark, root).count() == 0


def test_update_where_sets_columns_and_protects_keys(spark, tmp_path):
    import pytest as _pytest

    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        read_manifest_as_of,
        update_where,
    )

    root = str(tmp_path / "dml_upd")
    _mk_sink(spark, root, n=60, n_buckets=8)
    with _pytest.raises(ValueError, match="key columns"):
        update_where(spark, root, "TRUE", {"k": "k + 1"})

    update_where(
        spark, root, "grp = 2", {"v": "v * 10", "grp": "99"}, commit_ts=2.0
    )
    state = read_manifest_as_of(spark, root)
    assert state.where("grp = 2").count() == 0
    upd = state.where("grp = 99").collect()
    assert len(upd) == 10
    assert all(r.v == r.k * 10.0 for r in upd)
    # untouched rows byte-identical in value terms
    rest = state.where("grp NOT IN (2, 99)")
    assert all(r.v == float(r.k) for r in rest.collect())


def test_dml_detects_concurrent_commit_and_refuses_lost_update(
    spark, tmp_path
):
    import pytest as _pytest

    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        CommitConflictError,
        _dml_commit,
        apply_merge_batch_bucketed,
        read_manifest_as_of,
    )

    root = str(tmp_path / "dml_conflict")
    _mk_sink(spark, root, n=40, n_buckets=4)

    # a rewrite callback that sneaks in a competing commit mid-DML --
    # the same interleaving a second writer would produce
    def racing_rewrite(df):
        apply_merge_batch_bucketed(
            spark,
            spark.createDataFrame(
                [(999, 0, 0.0)], "k bigint, grp bigint, v double"
            ).withColumn("is_delete", F.lit(False)),
            1, root, ["k"], n_buckets=4, commit_ts=5.0,
        )
        return df.where("grp <> 0")

    with _pytest.raises(CommitConflictError, match="concurrent commit"):
        _dml_commit(spark, root, "grp = 0", racing_rewrite, 6.0)
    # the competing commit SURVIVES (no lost update), DML did not land
    state = read_manifest_as_of(spark, root)
    assert state.where("k = 999").count() == 1
    assert state.where("grp = 0").count() > 1


# --- partition-spec evolution (evolve_bucket_spec) ---------------------------


def test_spec_evolution_is_metadata_only_and_state_preserving(
    spark, tmp_path
):
    """Evolving the bucket count moves ZERO data bytes (every legacy dir
    pointer is the identical string) and leaves the readable state
    bit-identical to the flat twin."""
    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        evolve_bucket_spec,
    )

    root = str(tmp_path / "evo")
    flat = str(tmp_path / "evo_flat")
    for i, rows in enumerate(BATCHES[:2]):
        b = spark.createDataFrame(rows, SCHEMA)
        apply_merge_batch_bucketed(
            spark, b, i, root, ["k"], n_buckets=4, commit_ts=100.0 * (i + 1)
        )
        apply_merge_batch(spark, b, i, flat, ["k"], commit_ts=100.0 * (i + 1))
    pre = current_manifest(root)
    ver = evolve_bucket_spec(root, 8, commit_ts=300.0)
    m = current_manifest(root)
    assert ver == m["batch_id"] == pre["batch_id"] + 1
    assert m["n_buckets"] == 8
    assert m["buckets"] == {}
    assert m["legacy"]["n_buckets"] == 4
    # zero-copy: legacy pointers are the pre-evolution strings verbatim
    assert m["legacy"]["buckets"] == pre["buckets"]
    assert _state(read_manifest_as_of(spark, root)) == _state(
        read_as_of(spark, flat)
    )
    # pre-evolution versions still time-travel
    assert _state(read_manifest_as_of(spark, root, 0)) == _state(
        read_as_of(spark, flat, 0)
    )
    # a second evolution while legacy is draining is rejected
    with pytest.raises(ValueError, match="draining"):
        evolve_bucket_spec(root, 16)
    # a same-spec evolution is rejected outright
    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        compact_manifest,
    )

    compact_manifest(spark, root)
    with pytest.raises(ValueError, match="already uses"):
        evolve_bucket_spec(root, 8)


def test_spec_evolution_merge_drains_touched_legacy_buckets(
    spark, tmp_path
):
    """Post-evolution merges stay correct vs the flat twin; batch keys
    LEAVE their legacy dirs (drained lazily); untouched legacy buckets
    keep their identical pointer strings; point lookups find keys in
    whichever spec holds them; the old-spec batch size is rejected."""
    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        evolve_bucket_spec,
        read_manifest_point_lookup,
    )

    root = str(tmp_path / "evo2")
    flat = str(tmp_path / "evo2_flat")
    for i, rows in enumerate(BATCHES[:2]):
        b = spark.createDataFrame(rows, SCHEMA)
        apply_merge_batch_bucketed(
            spark, b, i, root, ["k"], n_buckets=4, commit_ts=100.0 * (i + 1)
        )
        apply_merge_batch(spark, b, i, flat, ["k"], commit_ts=100.0 * (i + 1))
    evolve_bucket_spec(root, 8, commit_ts=300.0)
    m_evo = current_manifest(root)
    b2 = spark.createDataFrame(BATCHES[2], SCHEMA)
    with pytest.raises(ValueError, match="n_buckets"):
        apply_merge_batch_bucketed(spark, b2, 3, root, ["k"], n_buckets=4)
    apply_merge_batch_bucketed(
        spark, b2, 3, root, ["k"], n_buckets=8, commit_ts=400.0
    )
    apply_merge_batch(spark, b2, 2, flat, ["k"], commit_ts=400.0)
    expect = _state(read_as_of(spark, flat))
    assert _state(read_manifest_as_of(spark, root)) == expect
    m = current_manifest(root)
    # batch keys (1, 3, 18) must be gone from every legacy dir
    legacy_dirs = list(m["legacy"]["buckets"].values())
    for d in legacy_dirs:
        ks = {
            r.k
            for r in spark.read.parquet(os.path.join(root, d)).collect()
        }
        assert not ks & {1, 3, 18}, (d, ks)
    # legacy buckets NOT holding a batch key kept their exact pointers
    touched_l = {
        r.b
        for r in spark.createDataFrame([(1,), (3,), (18,)], "k int")
        .select(
            F.pmod(F.xxhash64("k"), F.lit(4)).cast("int").alias("b")
        )
        .collect()
    }
    for b, d in m_evo["legacy"]["buckets"].items():
        if int(b) not in touched_l:
            assert m["legacy"]["buckets"][b] == d
    # point lookup finds keys wherever they live (legacy or current)
    for k, v in expect.items():
        got = {
            r.k: r.v
            for r in read_manifest_point_lookup(
                spark, root, {"k": k}
            ).collect()
        }
        assert got == {k: v}, k
    # and returns empty for deleted keys
    assert (
        read_manifest_point_lookup(spark, root, {"k": 1}).count() == 0
    )


def test_spec_evolution_compact_vacuum_dml_clone(spark, tmp_path):
    """compact_manifest finishes the migration (legacy block gone, one
    spec, state unchanged); vacuum then reclaims the old-spec dirs; DML
    and clone handle a mid-migration table correctly."""
    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        build_bloom_index,
        clone_manifest,
        compact_manifest,
        delete_where,
        evolve_bucket_spec,
    )

    root = str(tmp_path / "evo3")
    _mk_sink(spark, root, n=60, n_buckets=4)
    evolve_bucket_spec(root, 8, commit_ts=2.0)
    # DML against a mid-migration table rewrites legacy buckets too
    delete_where(spark, root, "k >= 50", commit_ts=3.0)
    assert {
        r.k for r in read_manifest_as_of(spark, root).collect()
    } == set(range(50))
    # clone carries the legacy block (deep: fully severed)
    dst = str(tmp_path / "evo3_clone")
    clone_manifest(spark, root, dst, deep=True)
    assert {
        r.k for r in read_manifest_as_of(spark, dst).collect()
    } == set(range(50))
    # bloom build refuses a two-spec table, loudly
    with pytest.raises(ValueError, match="single bucket spec"):
        build_bloom_index(spark, root, "grp")
    # compact completes the migration
    compact_manifest(spark, root)
    m = current_manifest(root)
    assert "legacy" not in m
    assert m["n_buckets"] == 8
    assert {
        r.k for r in read_manifest_as_of(spark, root).collect()
    } == set(range(50))
    # after the horizon passes, vacuum reclaims every old-spec dir
    out = vacuum_manifests(root, keep_last=1)
    assert out["dirs"]
    for gen in os.listdir(root):
        assert not gen.startswith("gen_0"), gen
    # and the compacted sink accepts a fresh bloom index
    build_bloom_index(spark, root, "grp")


def test_bucketed_schema_evolution_three_generations(spark, tmp_path):
    """Delta-style mergeSchema on the bucketed sink: a later batch adds
    a column (history NULL-backfills at every affected version), a
    batch dropping a stored column is rejected loudly, and the
    evolution composes with an in-flight SPEC evolution (legacy dirs
    lack the new column; reads backfill them)."""
    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        evolve_bucket_spec,
        read_manifest_point_lookup,
    )

    root = str(tmp_path / "schemaevo")
    b0 = spark.createDataFrame(
        [(1, "a", False), (2, "b", False), (3, "c", False)], SCHEMA
    )
    apply_merge_batch_bucketed(
        spark, b0, 0, root, ["k"], n_buckets=4, commit_ts=10.0
    )
    # gen 1 ADDS a column
    b1 = spark.createDataFrame(
        [(2, "b2", 7, False), (4, "d", 8, False)],
        "k int, v string, extra int, is_delete boolean",
    )
    apply_merge_batch_bucketed(
        spark, b1, 1, root, ["k"], n_buckets=4, commit_ts=20.0
    )
    cur = read_manifest_as_of(spark, root)
    got = {r.k: (r.v, r.extra) for r in cur.collect()}
    assert got == {
        1: ("a", None),
        2: ("b2", 7),
        3: ("c", None),
        4: ("d", 8),
    }
    # the pre-evolution version reads back WITHOUT the new column
    assert set(read_manifest_as_of(spark, root, 0).columns) == {"k", "v"}
    # dropping a stored column is rejected, even for untouched buckets
    b_bad = spark.createDataFrame([(9, "z", False)], SCHEMA)
    with pytest.raises(ValueError, match="drops snapshot columns"):
        apply_merge_batch_bucketed(
            spark, b_bad, 2, root, ["k"], n_buckets=4, commit_ts=30.0
        )
    # composes with spec evolution: legacy dirs lack a later-added column
    evolve_bucket_spec(root, 8, commit_ts=40.0)
    b2 = spark.createDataFrame(
        [(3, "c3", 9, 1.5, False)],
        "k int, v string, extra int, score double, is_delete boolean",
    )
    apply_merge_batch_bucketed(
        spark, b2, 3, root, ["k"], n_buckets=8, commit_ts=50.0
    )
    cur = read_manifest_as_of(spark, root)
    got = {r.k: (r.v, r.extra, r.score) for r in cur.collect()}
    assert got == {
        1: ("a", None, None),
        2: ("b2", 7, None),
        3: ("c3", 9, 1.5),
        4: ("d", 8, None),
    }
    # point lookup backfills too, wherever the key lives
    row = read_manifest_point_lookup(spark, root, {"k": 1}).collect()
    assert len(row) == 1 and row[0].v == "a" and row[0].score is None


# --- stream-vs-maintenance version independence (r8) --------------------------


def test_stream_replay_guard_survives_maintenance_commits(spark, tmp_path):
    """Stream batch ids and table versions are independent sequences:
    a maintenance DML commit between micro-batches bumps the version
    counter PAST the stream's next batch id, and a version-keyed replay
    guard would then silently drop live batches. The stream_batch_id
    field keys the guard instead: post-DML batches land, true replays
    still no-op."""
    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        delete_where,
    )

    root = str(tmp_path / "stream_vs_dml")
    b0 = spark.createDataFrame(
        [(1, "a", False), (2, "b", False), (3, "c", False)], SCHEMA
    )
    apply_merge_batch_bucketed(
        spark, b0, 0, root, ["k"], n_buckets=4, commit_ts=10.0,
        stream_batch_id=0,
    )
    # maintenance commits: version counter advances without the stream
    delete_where(spark, root, "k = 3", commit_ts=20.0)
    delete_where(spark, root, "k = 999", commit_ts=30.0)
    assert current_manifest(root)["batch_id"] == 2
    # the stream's NEXT micro-batch (id 1 <= version 2) must still land
    b1 = spark.createDataFrame([(4, "d", False)], SCHEMA)
    apply_merge_batch_bucketed(
        spark, b1, 1, root, ["k"], n_buckets=4, commit_ts=40.0,
        stream_batch_id=1,
    )
    assert _state(read_manifest_as_of(spark, root)) == {
        1: "a", 2: "b", 4: "d"
    }
    cur = current_manifest(root)
    assert cur["batch_id"] == 3 and cur["stream_batch_id"] == 1
    # a TRUE replay of stream batch 1 (crash-window redelivery) no-ops
    b1_replay = spark.createDataFrame([(4, "DUP", False)], SCHEMA)
    apply_merge_batch_bucketed(
        spark, b1_replay, 1, root, ["k"], n_buckets=4, commit_ts=50.0,
        stream_batch_id=1,
    )
    assert current_manifest(root)["batch_id"] == 3
    assert _state(read_manifest_as_of(spark, root))[4] == "d"
    # maintenance carries the stream high-water mark forward
    delete_where(spark, root, "k = 1", commit_ts=60.0)
    assert current_manifest(root)["stream_batch_id"] == 1


def test_forget_keys_refuses_shallow_clone(spark, tmp_path):
    """RTBF on a SHALLOW clone would rewrite the SOURCE sink's bucket
    dirs in place (clone manifests hold absolute source paths) --
    cross-sink data loss. forget_keys_bucketed must refuse; a deep
    clone erases fine and the source keeps its rows."""
    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        clone_manifest,
        forget_keys_bucketed,
    )

    src = str(tmp_path / "src")
    shallow = str(tmp_path / "shallow")
    deep = str(tmp_path / "deep")
    _mk_sink(spark, src, n=20, n_buckets=4)
    clone_manifest(spark, src, shallow, commit_ts=2.0)
    clone_manifest(spark, src, deep, deep=True, commit_ts=2.0)
    with pytest.raises(ValueError, match="outside this sink"):
        forget_keys_bucketed(spark, shallow, [(7,)])
    # source untouched by the refused call
    assert read_manifest_as_of(spark, src).where("k = 7").count() == 1
    # deep clone erases locally; source still keeps the key
    removed = forget_keys_bucketed(spark, deep, [(7,)])
    assert sum(removed.values()) == 1
    assert read_manifest_as_of(spark, deep).where("k = 7").count() == 0
    assert read_manifest_as_of(spark, src).where("k = 7").count() == 1


def test_dml_exclusive_manifest_commit_blocks_same_version_race(
    spark, tmp_path
):
    """The manifest FILE is the commit arbiter: if a racing writer has
    already published manifest_{new_id}.json (but not yet swapped the
    pointer -- the window the pointer pre-check cannot see), the DML's
    exclusive link must refuse rather than silently overwrite the
    racer's commit."""
    import json

    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        CommitConflictError,
        _manifest_path,
        delete_where,
    )

    root = str(tmp_path / "dml_excl")
    _mk_sink(spark, root, n=20, n_buckets=4)
    # simulate the racer: manifest_1.json exists, pointer still at 0
    racer = dict(current_manifest(root))
    racer["batch_id"] = 1
    with open(_manifest_path(root, 1), "w") as f:
        json.dump(racer, f)
    with pytest.raises(CommitConflictError, match="already exists"):
        delete_where(spark, root, "k = 3", commit_ts=9.0)
    # the racer's manifest content survived untouched
    with open(_manifest_path(root, 1)) as f:
        assert json.load(f)["buckets"] == racer["buckets"]


def test_streaming_merge_into_clauses_match_batch(spark, tmp_path):
    """Conditional MERGE INTO as a STREAM: each micro-batch of source
    rows compiles through compile_merge_into against the sink's current
    state and applies via the bucketed merge (stream_batch_id keyed).
    Final state must equal the one-shot relational merge of the whole
    source -- valid here because the per-key clause outcome is
    independent of batch boundaries (distinct keys per batch)."""
    from gmail_bigquery_etl_spark.operators.merge import compile_merge_into
    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        apply_merge_batch_bucketed,
    )

    root = str(tmp_path / "minto")
    target = spark.createDataFrame(
        [(i, "base", float(i * 10)) for i in range(40)],
        "k int, st string, p double",
    )
    apply_merge_batch_bucketed(
        spark,
        target.withColumn("is_delete", F.lit(False)),
        0, root, ["k"], n_buckets=4, commit_ts=1.0,
    )
    # source: k%3==0 repriced up (update), k%5==0 to 999 (delete-cond),
    # new keys 100..109 cheap (insert), 110..119 expensive (filtered)
    src_rows = (
        [(k, "N", 999.0) for k in range(0, 40, 5)]
        + [(k, "N", float(k * 10 + 1)) for k in range(3, 40, 3) if k % 5]
        + [(k, "N", 5.0) for k in range(100, 110)]
        + [(k, "N", 500.0) for k in range(110, 120)]
    )
    src = spark.createDataFrame(src_rows, "k int, st string, p double")

    from gmail_bigquery_etl_spark.streaming.merge_manifest import (
        read_manifest_as_of,
    )

    # stream simulation: 4 deterministic micro-batches by key hash
    for bid in range(1, 5):
        part = src.where(F.pmod(F.col("k"), 4) == bid - 1)
        state = read_manifest_as_of(spark, root)
        batch = compile_merge_into(
            state, part, ["k"],
            update_set={"st": "'U'", "p": "s.p"},
            update_cond="s.p > t.p",
            delete_cond="s.p > 900",
            insert_cond="s.p < 100",
        )
        apply_merge_batch_bucketed(
            spark, batch, bid, root, ["k"], n_buckets=4,
            commit_ts=float(bid + 1), stream_batch_id=bid,
        )
    got = {
        r.k: (r.st, r.p) for r in read_manifest_as_of(spark, root).collect()
    }
    # one-shot reference: relational clause semantics over the full source
    want = {}
    for k in range(40):
        want[k] = ("base", float(k * 10))
    for k, st, p in src_rows:
        if k in want:
            if p > 900:
                del want[k]
            elif p > want[k][1]:
                want[k] = ("U", p)
        elif p < 100:
            want[k] = (st, p)
    assert got == want
