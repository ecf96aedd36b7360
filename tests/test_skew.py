"""Skew-mitigation operators (operators/skew.py): result-invariance and
plan shape under a deliberately skewed key distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.operators.skew import salted_counts_sums, salted_join


def _skewed_df(spark, n=10_000):
    """90% of rows land on key 0, the rest spread over 100 keys."""
    return spark.range(n).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise(F.col("id") % 100)
        .cast("long")
        .alias("k"),
        F.col("id").alias("uid"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_salted_agg_matches_plain_groupby(spark):
    df = _skewed_df(spark)
    got = salted_counts_sums(
        df, key="k", salt_from="uid", sum_cols={"sv": F.sum("v")}, n_salts=8
    )
    want = df.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
    g = {r.k: (r.n, r.sv) for r in got.collect()}
    w = {r.k: (r.n, r.sv) for r in want.collect()}
    assert g == w


def test_salted_agg_spreads_hot_key(spark):
    """The partial aggregate must produce multiple rows for the hot key --
    i.e. the salt actually splits it."""
    df = _skewed_df(spark)
    partial = (
        df.withColumn("_salt", F.pmod(F.xxhash64("uid"), F.lit(8)).cast("int"))
        .groupBy("k", "_salt")
        .count()
    )
    hot_splits = partial.filter(F.col("k") == 0).count()
    assert hot_splits == 8


def test_salted_join_matches_plain_join(spark):
    big = _skewed_df(spark)
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val")
    )
    got = salted_join(big, small, key="k", salt_from="uid", n_salts=8)
    want = big.join(small, "k")
    assert got.count() == want.count()
    g = got.groupBy("k").agg(F.sum("dim_val").alias("s"))
    w = want.groupBy("k").agg(F.sum("dim_val").alias("s"))
    assert sorted(map(tuple, g.collect())) == sorted(map(tuple, w.collect()))


def test_salted_join_left_outer_preserves_unmatched(spark):
    big = _skewed_df(spark).withColumn("k", F.col("k") + 1000)  # no matches
    small = spark.range(10).select(F.col("id").alias("k"), F.lit(1).alias("d"))
    out = salted_join(big, small, key="k", salt_from="uid", n_salts=4, how="left")
    assert out.count() == big.count()
    assert out.filter(F.col("d").isNotNull()).count() == 0


def test_salted_join_rejects_right_and_full(spark):
    """The salt-replication scheme emits each unmatched small-side row once
    per salt replica under right/full joins -- those modes must raise."""
    import pytest
    from gmail_bigquery_etl_spark.operators.skew import salted_join

    big = spark.range(10).select(F.col("id").alias("k"), F.col("id").alias("d"))
    small = spark.createDataFrame([(1, "x"), (99, "y")], "k bigint, v string")
    for how in ("right", "full", "outer", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, key="k", salt_from="d", how=how)
    # supported modes still work
    assert salted_join(big, small, key="k", salt_from="d", how="left_semi").count() == 1
    assert salted_join(big, small, key="k", salt_from="d", how="left_anti").count() == 9


def test_aqe_skew_join_splits_hot_partition(spark):
    """The AUTOMATIC half of the skew story (manual salting is the
    planned half): with AQE's skew-join thresholds lowered to fixture
    scale, a sort-merge join against a 90%-hot key distribution must
    plan SortMergeJoin(skew=true) with a skewed AQEShuffleRead -- the
    runtime split that keeps one straggler task from serializing the
    stage at 100 TB -- and return exactly the un-tuned join's rows.

    Two fixture subtleties this test documents: (a) the hot rows carry
    a HIGH-ENTROPY payload, because AQE sizes partitions from the
    compressed map output and 180k identical 8-byte keys compress to
    under any threshold (a real hot key drags real row bytes with it);
    (b) forceOptimizeSkewedJoin, because a downstream same-key
    aggregate makes AQE decline the split (it breaks the partitioning
    guarantee) unless told the extra exchange is acceptable."""
    from collections import Counter

    df = spark.range(200_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise(F.col("id") % 100)
        .cast("long")
        .alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("pay"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "100KB",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        # force the shuffle path: broadcast would bypass skew handling
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = df.join(dim, "k")  # pay survives the shuffle
        got = Counter((r.k, r.w) for r in joined.collect())
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        assert "skewed" in plan, plan[:2000]  # the AQEShuffleRead side
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # row-identical to the un-tuned join (fresh QueryExecution,
    # session-default AQE settings)
    want = Counter((r.k, r.w) for r in df.join(dim, "k").collect())
    assert got == want
