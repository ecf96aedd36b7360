"""KMV sketch contracts: merge==build-of-union, estimator accuracy,
plan shape (no global sort), and the streaming sink's replay guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.catalog import load_table
from gmail_bigquery_etl_spark.operators.kmv import (
    kmv_build,
    kmv_build_grouped,
    kmv_estimate,
    kmv_merge,
)
from gmail_bigquery_etl_spark.streaming.kmv import (
    apply_kmv_batch,
    read_kmv,
)


def test_merge_equals_build_of_union(spark, sf_dir):
    """The mergeability contract: bottom-k of the union == re-taken
    bottom-k of per-slice bottom-k's. This is what lets partial
    sketches combine across partitions/days/batches without rescans."""
    ev = load_table(spark, sf_dir, "events")
    whole = kmv_build(ev, "event_id", 64).collect()
    parts = [
        kmv_build(ev.where(F.col("event_id") % 3 == i), "event_id", 64)
        for i in range(3)
    ]
    merged = kmv_merge(parts, 64).collect()
    assert [(r.h, r.value) for r in whole] == [
        (r.h, r.value) for r in merged
    ]


def test_estimator_within_error_band(spark, sf_dir):
    """est = (k-1)*H/h_k has relative standard error ~1/sqrt(k-2);
    assert within 5 sigma for k=256 (~31%). The gated query pins the
    exact value; this pins that the exact value is also CORRECT as an
    estimate."""
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select("event_id").distinct().count()
    est = kmv_estimate(kmv_build(ev, "event_id", 256), 256).first()
    assert est.n_kept == min(256, exact)
    assert abs(est.est_distinct - exact) / exact < 5 / (254**0.5)


def test_small_population_is_exact(spark):
    df = spark.range(10).select(F.col("id").alias("v"))
    est = kmv_estimate(kmv_build(df, "v", 256), 256).first()
    assert est.n_kept == 10
    assert est.est_distinct == 10


def test_empty_input_estimates_zero(spark):
    df = spark.range(0).select(F.col("id").alias("v"))
    est = kmv_estimate(kmv_build(df, "v", 64), 64).first()
    assert est.n_kept == 0
    assert est.est_distinct == 0


def test_bottom_k_plan_is_take_ordered_not_global_sort(spark, sf_dir):
    """orderBy+limit must compile to TakeOrderedAndProject (per-partition
    heaps + driver merge); a global Sort in the plan would be the
    100 TB scale-killer this operator exists to avoid."""
    ev = load_table(spark, sf_dir, "events")
    plan = kmv_build(
        ev, "event_id", 64
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


def test_grouped_sample_k_per_group_deterministic(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = kmv_build_grouped(ev, ["event_type"], "user_id", 4)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r.event_type, []).append(r.h)
    assert all(len(v) <= 4 for v in per.values())
    # deterministic: a second run returns the identical sample
    again = kmv_build_grouped(ev, ["event_type"], "user_id", 4).collect()
    assert sorted((r.event_type, r.h) for r in rows) == sorted(
        (r.event_type, r.h) for r in again
    )


def test_streaming_sink_matches_batch_and_guards_replay(
    spark, sf_dir, tmp_path
):
    ev = load_table(spark, sf_dir, "events")
    root = str(tmp_path / "kmv")
    for i in range(3):
        apply_kmv_batch(
            spark, ev.where(F.col("event_id") % 3 == i), i, "event_id",
            root, 128,
        )
    streamed = kmv_estimate(read_kmv(spark, root), 128).first()
    batch = kmv_estimate(kmv_build(ev, "event_id", 128), 128).first()
    assert streamed.est_distinct == batch.est_distinct

    # replay of an already-committed batch id must be a no-op
    before = sorted(r.h for r in read_kmv(spark, root).collect())
    apply_kmv_batch(spark, ev.limit(50), 1, "event_id", root, 128)
    after = sorted(r.h for r in read_kmv(spark, root).collect())
    assert before == after


@pytest.mark.parametrize("k", [1, 2])
def test_degenerate_k(spark, k):
    df = spark.range(100).select(F.col("id").alias("v"))
    sk = kmv_build(df, "v", k)
    assert sk.count() == k
    est = kmv_estimate(sk, k).first()
    assert est.n_kept == k
