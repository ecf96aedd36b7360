"""Count-min sketch (operators/cms.py): mergeability contract, overcount
guarantee, and the estimate path over missing candidates."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.operators.cms import (
    cms_build,
    cms_estimate,
    cms_merge,
)


def _items(spark, xs):
    return spark.createDataFrame([(x,) for x in xs], "x string")


def test_cms_merge_equals_build_of_union(spark):
    """cms_merge(build(A), build(B)) == build(A union B) cell-for-cell --
    the property that makes per-partition partial sketches combinable at
    any scale."""
    a = _items(spark, [f"k{i % 7}" for i in range(50)])
    b = _items(spark, [f"k{i % 13}" for i in range(80)])
    merged = {
        (r.i, r.col): r.c
        for r in cms_merge(cms_build(a, "x"), cms_build(b, "x")).collect()
    }
    whole = {
        (r.i, r.col): r.c for r in cms_build(a.unionAll(b), "x").collect()
    }
    assert merged == whole and merged


def test_cms_never_undercounts_and_bounds_overcount(spark):
    """est >= exact for every item (structural), and with width >> items
    the excess stays within e*N/width-scale slack."""
    xs = [f"item{i % 40}" for i in range(400)] + ["hot"] * 100
    df = _items(spark, xs)
    cells = cms_build(df, "x", depth=4, width=256)
    exact = df.groupBy("x").agg(F.count("*").alias("n"))
    est = cms_estimate(cells, exact, "x", depth=4, width=256).collect()
    n_total = len(xs)
    for r in est:
        assert r.cms_est >= r.n, (r.x, r.cms_est, r.n)
        assert r.cms_est <= r.n + 3 * n_total * 4 // 256, (r.x, r.cms_est, r.n)
    hot = next(r for r in est if r.x == "hot")
    assert hot.n == 100


def test_cms_estimate_unseen_candidate_is_bounded(spark):
    """A candidate never inserted estimates >= 0 via the left join (no
    crash, no null), and usually 0 with a sparse sketch."""
    built = cms_build(_items(spark, ["a", "b", "c"]), "x", width=1024)
    out = cms_estimate(
        built, _items(spark, ["zzz-never-seen"]), "x", width=1024
    ).collect()
    assert len(out) == 1 and 0 <= out[0].cms_est <= 3


def test_bloom_prefilter_equals_plain_anti_join(spark):
    """Bloom pruning is a pure plan change: result rows == plain anti-join
    rows, the definitely-new split is non-trivial, and every sink id is
    flagged for the exact check (no false negatives)."""
    from gmail_bigquery_etl_spark.operators.bloom import (
        bloom_prefiltered_anti_join,
    )
    from gmail_bigquery_etl_spark.operators.incremental import (
        incremental_anti_join,
    )

    inc = spark.range(0, 2000).select(
        F.concat(F.lit("m"), F.col("id").cast("string")).alias("id"),
        (F.col("id") * 3).alias("payload"),
    )
    sink = spark.range(0, 2000, 3).select(
        F.concat(F.lit("m"), F.col("id").cast("string")).alias("id")
    )
    got = bloom_prefiltered_anti_join(inc, sink, "id")
    plain = {r.id for r in incremental_anti_join(inc, sink, "id").collect()}
    rows = got.collect()
    assert {r.id for r in rows} == plain
    assert all(r.payload is not None for r in rows)  # columns survive
    checked = {r.id for r in rows if r.bloom_checked}
    unchecked = {r.id for r in rows if not r.bloom_checked}
    assert unchecked, "bloom pruned nothing: filter is vacuously full"
    # false-positive sliver should be small at m=8192, n=667
    assert len(checked) < len(plain) / 2, (len(checked), len(plain))
