"""Misra-Gries mergeable heavy-hitter summary: deterministic worst-case
guarantee, merge algebra, and the streaming maintenance twin.

What can be pinned exactly vs what is split-dependent: build/merge over
FIXED frames is fully deterministic (relational compress, no stream
order), so fold parity and commutativity are exact-equality tests; the
worst-case bound est <= true <= est + (N - M)/(k+1) and the
heavy-hitter presence guarantee hold for EVERY batch split, so they
gate the real streamed run too.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.catalog import load_table
from gmail_bigquery_etl_spark.operators.misra_gries import (
    mg_build,
    mg_estimate,
    mg_merge,
)
from gmail_bigquery_etl_spark.streaming.misra_gries import (
    apply_mg_batch,
    read_mg_summary,
    start_mg_maintenance,
)
from gmail_bigquery_etl_spark.streaming.replay import (
    replay_events_stream,
    write_replay_dir,
)

SMOKE_SF = "/root/testdata/sf0.001"
K = 16


@pytest.fixture(scope="module")
def words(spark):
    """Zipf-ish word stream from the documents fixture: a realistic
    heavy-hitter distribution (vocab >> K, frequent words dominate)."""
    return (
        load_table(spark, SMOKE_SF, "documents")
        .select(F.explode(F.split(F.col("text"), r"\s+")).alias("item"))
        .where(F.col("item") != "")
        .localCheckpoint()
    )


def _exact(words):
    return {
        r.item: r.c
        for r in words.groupBy("item")
        .agg(F.count("*").alias("c"))
        .collect()
    }


def _assert_mg_guarantee(summary_rows, exact, k):
    """est <= true; deficit <= (N - M)/(k+1); every item heavier than
    the deficit bound is present."""
    est = {r.item: r.c for r in summary_rows}
    assert len(est) <= k
    n = sum(exact.values())
    m = sum(est.values())
    bound = (n - m) / (k + 1)
    for item, e in est.items():
        assert e <= exact[item], item
        assert exact[item] - e <= bound, item
    for item, true in exact.items():
        if true > bound:
            assert item in est, (item, true, bound)


def test_build_guarantee_and_size(spark, words):
    exact = _exact(words)
    assert len(exact) > K  # compression actually happens
    summary = mg_build(words, "item", k=K).collect()
    _assert_mg_guarantee(summary, exact, K)


def test_merge_matches_guarantee_and_is_commutative(spark, words):
    """Summaries of two halves merge into a valid summary of the union,
    and merge order does not matter (exact equality -- the relational
    compress has no arrival-order state)."""
    xa = words.where(F.crc32(F.col("item")) % 2 == 0)
    xb = words.where(F.crc32(F.col("item")) % 2 == 1)
    sa, sb = mg_build(xa, "item", k=K), mg_build(xb, "item", k=K)
    ab = {r.item: r.c for r in mg_merge(sa, sb, k=K).collect()}
    ba = {r.item: r.c for r in mg_merge(sb, sa, k=K).collect()}
    assert ab == ba
    _assert_mg_guarantee(
        [type("R", (), {"item": i, "c": c}) for i, c in ab.items()],
        _exact(words),
        K,
    )


def test_estimate_join(spark, words):
    summary = mg_build(words, "item", k=K)
    cands = spark.createDataFrame(
        [("the",), ("definitely-not-a-word",)], "item string"
    )
    est = {r.item: r.est for r in mg_estimate(summary, cands).collect()}
    assert est["definitely-not-a-word"] == 0
    assert all(v >= 0 for v in est.values())


def test_streamed_state_equals_batch_fold(spark, tmp_path, words):
    """For a FIXED batch split, the maintained state must equal the
    batch-side left fold of mg_merge over the same frames, exactly."""
    batches = [
        words.where(F.crc32(F.col("item")) % 3 == i).localCheckpoint()
        for i in range(3)
    ]
    sink = str(tmp_path / "mg_fold_sink")
    for i, b in enumerate(batches):
        apply_mg_batch(spark, b, i, "item", sink, k=K)
    got = {r.item: r.c for r in read_mg_summary(spark, sink).collect()}

    want_df = mg_build(batches[0], "item", k=K)
    for b in batches[1:]:
        want_df = mg_merge(want_df, mg_build(b, "item", k=K), k=K)
    want = {r.item: r.c for r in want_df.collect()}
    assert got == want and got


def test_replayed_batch_is_not_double_counted(spark, tmp_path):
    """Crash-after-swap redelivery: MG merge is not idempotent, so the
    id guard must drop an already-recorded batch (and any stale id
    below the head) while applying genuinely new ids."""
    sink = str(tmp_path / "mg_replay_sink")
    b0 = spark.createDataFrame([("a",), ("b",), ("a",)], "item string")
    b1 = spark.createDataFrame([("b",), ("c",)], "item string")

    def state():
        return {
            r.item: r.c for r in read_mg_summary(spark, sink).collect()
        }

    apply_mg_batch(spark, b0, 0, "item", sink, k=K)
    after0 = state()
    apply_mg_batch(spark, b0, 0, "item", sink, k=K)  # replay
    assert state() == after0
    apply_mg_batch(spark, b1, 1, "item", sink, k=K)
    after1 = state()
    assert after1 != after0
    apply_mg_batch(spark, b1, 1, "item", sink, k=K)  # replay of head
    apply_mg_batch(spark, b0, 0, "item", sink, k=K)  # stale id
    assert state() == after1


def test_streaming_maintenance_guarantee(spark, tmp_path):
    """Real foreachBatch run over the replayed event stream: whatever
    split availableNow picks, the committed summary must satisfy the
    worst-case guarantee against exact corpus counts, and the heavy
    event types must all be present."""
    replay = write_replay_dir(
        spark, SMOKE_SF, str(tmp_path / "mg_replay"), chunks=6
    )
    stream = replay_events_stream(spark, replay).select("event_type")
    sink = str(tmp_path / "mg_sink")
    q = start_mg_maintenance(
        stream, "event_type", sink, str(tmp_path / "mg_ckpt"), k=4
    )
    q.awaitTermination(300)
    assert not q.isActive

    exact = _exact(
        load_table(spark, SMOKE_SF, "events").select(
            F.col("event_type").alias("item")
        )
    )
    rows = read_mg_summary(spark, sink).collect()
    _assert_mg_guarantee(rows, exact, 4)


GATE_SF = "/root/testdata/sf0.01"


def _bigram_exact(spark, sf_dir):
    from gmail_bigquery_etl_spark.catalog import spread
    from gmail_bigquery_etl_spark.queries.curation import _bigram_stream

    docs = spread(load_table(spark, sf_dir, "documents"))
    return {
        r.item: r.c
        for r in _bigram_stream(docs)
        .groupBy("item")
        .agg(F.count("*").alias("c"))
        .collect()
    }


def test_registry_build_gate_is_nonvacuous(spark):
    """The oracle-gated build query must actually compress (d > 0 --
    the bigram vocab is ~14x k=64), honor the worst-case guarantee
    against exact counts, and carry a CONSTANT per-row deficit equal
    to the single compress threshold."""
    from gmail_bigquery_etl_spark.queries import ALL_QUERIES

    rows = ALL_QUERIES["text_mg_heavy_hitters"](spark, GATE_SF).collect()
    assert 0 < len(rows) <= 64
    deficits = {r.deficit for r in rows}
    assert deficits == {rows[0].deficit} and rows[0].deficit > 0
    exact = _bigram_exact(spark, GATE_SF)
    assert len(exact) > 64
    _assert_mg_guarantee(
        [type("R", (), {"item": r.bigram, "c": r.est}) for r in rows],
        exact,
        64,
    )


def test_registry_merge_gate_bound_and_presence(spark):
    """The merged-shards query must satisfy the Agarwal et al. bound
    over ALL items (dropped items estimate 0) and miss no item heavier
    than (N - M)/(k+1); its per-item deficit must VARY (the merge
    arithmetic is visible in values, not just the row set)."""
    from gmail_bigquery_etl_spark.queries import ALL_QUERIES

    rows = ALL_QUERIES["text_mg_merge_shards"](spark, GATE_SF).collect()
    assert 0 < len(rows) <= 64
    assert len({r.deficit for r in rows}) > 1
    exact = _bigram_exact(spark, GATE_SF)
    for r in rows:
        assert r.true_n == exact[r.bigram]
    _assert_mg_guarantee(
        [type("R", (), {"item": r.bigram, "c": r.est}) for r in rows],
        exact,
        64,
    )


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.dictionaries(
        st.integers(min_value=0, max_value=40).map(lambda i: f"w{i}"),
        st.integers(min_value=1, max_value=200),
        min_size=1,
        max_size=40,
    ),
    k=st.integers(min_value=1, max_value=12),
)
def test_mg_guarantee_property(spark, counts, k):
    """Property pin over random multisets and random k: the summary
    never exceeds k counters, never overestimates, never underestimates
    by more than (N - M)/(k+1), and never misses an item heavier than
    that deficit bound."""
    rows = [(item, c) for item, c in counts.items()]
    df = spark.createDataFrame(rows, "item string, n bigint").select(
        "item", F.explode(F.sequence(F.lit(1), F.col("n"))).alias("_i")
    )
    summary = mg_build(df, "item", k=k).collect()
    _assert_mg_guarantee(summary, counts, k)
