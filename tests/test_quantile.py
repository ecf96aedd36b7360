"""Mergeable quantile sketch (operators/quantile.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.operators.quantile import (
    qsketch_build,
    qsketch_merge,
    qsketch_quantiles,
)


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "x double")


def _cells(df):
    return {(r.e, r.m): r.cnt for r in df.collect()}


def test_merge_equals_build_of_union(spark):
    """The mergeability contract, cell for cell: merge(build(X),
    build(Y)) == build(X ∪ Y) exactly."""
    xs = [1.23, 4.56, 78.9, 1234.56, 1234.57, 99999.99, 0.01, 0.02]
    ys = [1.23, 2.34, 500.0, 1234.56, 7e6, 0.01]
    both = qsketch_build(_vals(spark, xs + ys), "x")
    merged = qsketch_merge(
        qsketch_build(_vals(spark, xs), "x"),
        qsketch_build(_vals(spark, ys), "x"),
    )
    assert _cells(merged) == _cells(both) and _cells(both)


def test_quantile_bounds_bracket_exact_rank_element(spark):
    """For every requested q, [est_lo, est_hi] must CONTAIN the exact
    rank-ceil(q*n) element (in cents), and the bucket width must honor
    the 2^-(sub_bits-1) relative-error contract."""
    import random

    rng = random.Random(42)
    xs = [round(rng.uniform(0.5, 500000.0), 2) for _ in range(5000)]
    cents = sorted(round(x * 100) for x in xs)
    sk = qsketch_build(_vals(spark, xs), "x")
    got = {
        r.q_permille: (r.est_lo, r.est_hi)
        for r in qsketch_quantiles(sk, [500, 900, 950, 990]).collect()
    }
    for q in (500, 900, 950, 990):
        exact = cents[math.ceil(q / 1000 * len(cents)) - 1]
        lo, hi = got[q]
        assert lo <= exact <= hi, (q, lo, exact, hi)
        assert (hi - lo) <= max(1, lo * 2 ** (-7)) + 1, (q, lo, hi)


def test_sub_bits_trades_width_for_cells(spark):
    """More sub-bucket bits => strictly tighter buckets (and more cells):
    the accuracy knob does what it says."""
    xs = [float(v) / 100 for v in range(1, 4000, 7)]
    coarse = qsketch_build(_vals(spark, xs), "x", sub_bits=4)
    fine = qsketch_build(_vals(spark, xs), "x", sub_bits=10)
    assert coarse.count() < fine.count()
    q_coarse = qsketch_quantiles(coarse, [500], sub_bits=4).first()
    q_fine = qsketch_quantiles(fine, [500], sub_bits=10).first()
    assert (q_fine.est_hi - q_fine.est_lo) <= (
        q_coarse.est_hi - q_coarse.est_lo
    )


def test_domain_guards_and_empty(spark):
    """NULL and non-positive values are out of domain (filtered, not
    thrown); an empty build yields an empty quantile table."""
    df = spark.createDataFrame(
        [(None,), (-1.5,), (0.0,), (2.5,)], "x double"
    )
    sk = qsketch_build(df, "x")
    assert sk.agg(F.sum("cnt")).first()[0] == 1
    empty = qsketch_build(
        spark.createDataFrame([], "x double"), "x"
    )
    assert qsketch_quantiles(empty, [500, 990]).count() == 0


def test_grouped_sketch_walks_per_group(spark):
    """Grouped build/extract: each group's quantiles come from its own
    cells only."""
    rows = [("a", float(i)) for i in range(1, 101)] + [
        ("b", 1000.0 * i) for i in range(1, 11)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    sk = qsketch_build(df, "x", group_cols=["g"])
    got = {
        (r.g, r.q_permille): (r.est_lo, r.est_hi)
        for r in qsketch_quantiles(sk, [500], group_cols=["g"]).collect()
    }
    lo_a, hi_a = got[("a", 500)]
    lo_b, hi_b = got[("b", 500)]
    assert lo_a <= 50 * 100 <= hi_a
    assert lo_b <= 5000 * 100 <= hi_b


def test_bucket_function_is_monotone_pure_math():
    """The rank walk is only correct if (e, m) ordering == value
    ordering. Property-check the pure-integer bucket formula (bit length
    + top-bits shift, the exact arithmetic both engines run) over
    adversarial pairs: v1 <= v2 implies (e1, m1) <= (e2, m2), and every
    value lies within its own bucket's [lo, hi] bounds."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    B = 8

    def bucket(v: int) -> tuple[int, int]:
        e = v.bit_length()
        m = v >> max(e - B, 0)
        return e, m

    def bounds(e: int, m: int) -> tuple[int, int]:
        shift = max(e - B, 0)
        return m << shift, ((m + 1) << shift) - 1

    @settings(max_examples=500, deadline=None)
    @given(
        st.integers(min_value=1, max_value=2**62),
        st.integers(min_value=1, max_value=2**62),
    )
    def check(a, b):
        lo_v, hi_v = sorted((a, b))
        assert bucket(lo_v) <= bucket(hi_v)
        for v in (a, b):
            lo, hi = bounds(*bucket(v))
            assert lo <= v <= hi
            # relative-error contract: bucket width <= lo * 2^-(B-1)
            assert (hi - lo) <= max(1, lo >> (B - 1))

    check()
