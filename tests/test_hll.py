"""Hand-built HyperLogLog (operators/hll.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.operators.hll import (
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _items(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("string").alias("x")
    )


def test_hll_merge_equals_build_of_union(spark):
    """merge(build(X), build(Y)) == build(X ∪ Y), register for register --
    the contract that makes per-day sketches composable."""
    x = _items(spark, 0, 3000)
    y = _items(spark, 2000, 6000)  # overlapping
    merged = {
        (r.bucket, r.reg)
        for r in hll_merge(
            hll_registers(x, "x"), hll_registers(y, "x")
        ).collect()
    }
    union = {
        (r.bucket, r.reg)
        for r in hll_registers(x.unionAll(y), "x").collect()
    }
    assert merged == union and merged


def test_hll_estimate_within_theoretical_error(spark):
    """m=256 gives sigma ~= 1.04/sqrt(256) = 6.5%; the estimate for a
    known cardinality must land within 4 sigma (and the merged overlap
    sketch must estimate the union, not the sum)."""
    n = 5000
    est = hll_estimate(
        hll_registers(_items(spark, 0, n), "x")
    ).collect()[0].hll_estimate
    assert abs(est - n) / n < 0.26

    x, y = _items(spark, 0, 4000), _items(spark, 2000, 6000)
    est_union = hll_estimate(
        hll_merge(hll_registers(x, "x"), hll_registers(y, "x"))
    ).collect()[0].hll_estimate
    assert abs(est_union - 6000) / 6000 < 0.26  # not ~8000 (the sum)


def test_hll_small_range_uses_linear_counting(spark):
    """Tiny cardinalities fall into the linear-counting branch and come
    out near-exact (raw HLL would be badly biased here)."""
    est = hll_estimate(
        hll_registers(_items(spark, 0, 10), "x")
    ).collect()[0].hll_estimate
    assert abs(est - 10) <= 1.0


def test_hll_grouped_registers_bounded(spark):
    """Per-group state never exceeds m rows, whatever the input size."""
    items = spark.range(0, 20000).select(
        (F.col("id") % 3).alias("g"), F.col("id").cast("string").alias("x")
    )
    regs = hll_registers(items, "x", ["g"], m=64)
    counts = {r.g: r.n for r in regs.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 64 for n in counts.values()) and len(counts) == 3
