"""Scale-curve bench: time the heaviest declared operators at two data
scales and report the scaling ratio. A linear-ish ratio on 10x data is the
measured evidence behind the 100 TB plan-shape claims (LSH/IVF bucketed
candidate generation vs the deliberately-quadratic all-pairs baseline).

Usage: python tools/bench_scale.py [--small /root/testdata/sf0.1]
                                   [--big scratch/sf1] [--out SCALE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmail_bigquery_etl_spark.queries import ALL_QUERIES  # noqa: E402
from gmail_bigquery_etl_spark.session import get_spark  # noqa: E402

OPS = [
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "dedup_simhash_pairs_wide",  # corpus-scale sizing: pair count collapses
    "dedup_clusters",
    "embedding_near_dup",  # all-pairs baseline: expected ~quadratic
    "ann_lsh_buckets",
    "ann_ivf_cells",
    "knn_bruteforce_cosine",
]


def _time(spark, name: str, sf_dir: str) -> tuple[float, int]:
    """Best-of-2: the second run reuses warmed code paths/file cache, so the
    min isolates the operator cost from cold-plan + GC noise (which at this
    toy scale can exceed the operator itself).

    Timing materializes via the NOOP WRITER, not count(): count() over a
    global (no-grouping) aggregate lets Catalyst rewrite the whole child
    away (a global agg always has exactly one row), which benched
    er_quality_eval at 0.4 s while the real computation costs ~7 s at 10x.
    The row count is taken untimed afterwards."""
    best = None
    for _ in range(2):
        t0 = time.time()
        df = ALL_QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    n = ALL_QUERIES[name](spark, sf_dir).count()
    return best, n


def _time_skew(spark, sf_dir: str, clique: int = 5000) -> dict:
    """Mega-bucket skew slice: the sf corpus plus a `clique`-wide clique
    of identical boilerplate documents (one bucket of width `clique` in
    EVERY band). Reports capped wall time on the plain vs skewed corpus
    -- a flat ratio is the measured 100 TB skew story (the cap keeps
    cost tracking output, not bucket-width**2). The uncapped
    counterfactual on the same skewed corpus is the divergence."""
    from pyspark.sql import functions as F

    from gmail_bigquery_etl_spark.catalog import load_table
    from gmail_bigquery_etl_spark.operators.dedup import lsh_candidate_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    boiler = docs.filter(F.col("doc_id") == 1).select("text")
    clones = (
        spark.range(10_000_000, 10_000_000 + clique)
        .select(F.col("id").alias("doc_id"))
        .crossJoin(F.broadcast(boiler))
    )
    skewed = docs.unionAll(clones).localCheckpoint()  # pin inputs: time LSH only
    plain = docs.localCheckpoint()

    def best2(frame, max_bucket):
        best, n = None, None
        for _ in range(2):
            t0 = time.time()
            n = lsh_candidate_pairs(frame, max_bucket=max_bucket).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best, n

    t_plain, n_plain = best2(plain, 1000)
    t_capped, n_capped = best2(skewed, 1000)
    t_uncapped, n_uncapped = best2(skewed, 10_000_000)
    out = {
        "clique": clique,
        "plain_sec": round(t_plain, 2),
        "capped_sec": round(t_capped, 2),
        "uncapped_sec": round(t_uncapped, 2),
        "capped_over_plain": round(t_capped / t_plain, 2) if t_plain else None,
        "uncapped_over_capped": (
            round(t_uncapped / t_capped, 2) if t_capped else None
        ),
        "plain_pairs": n_plain,
        "capped_pairs": n_capped,
        "uncapped_pairs": n_uncapped,
    }
    for f in (skewed, plain):
        try:
            f.unpersist()
        except Exception:
            pass
    return out


def _time_skew_postings(spark, sf_dir: str, clique: int = 3000) -> dict:
    """Posting-list (no-sketch) skew slice: the sf documents plus a
    ``clique``-wide set of documents sharing one boilerplate prefix (every
    boilerplate shingle's document frequency ~= clique). With the df cap
    (max_df=64) the boilerplate postings are dropped BEFORE the self-join
    and capped time stays ~flat vs the plain corpus; uncapped, the same
    shingles emit ~clique^2/2 candidate rows per gram. The measured pair
    of ratios is the 100 TB df-cap story for inverted_jaccard_pairs /
    inverted_containment_pairs (they share df_capped_postings)."""
    import time as _t

    from pyspark.sql import functions as F

    from gmail_bigquery_etl_spark.catalog import load_table
    from gmail_bigquery_etl_spark.operators.dedup import inverted_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    boiler = "generated by the acme pipeline all rights reserved do not edit"
    clones = spark.range(20_000_000, 20_000_000 + clique).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(boiler + " unique tail "),
            F.md5(F.col("id").cast("string")),
            F.lit(" "),
            F.md5((F.col("id") + 7).cast("string")),
        ).alias("text"),
    )
    skewed = docs.unionAll(clones).localCheckpoint()
    plain = docs.localCheckpoint()

    def best2(frame, max_df):
        best, n = None, None
        for _ in range(2):
            t0 = _t.time()
            n = inverted_jaccard_pairs(frame, threshold=0.6, max_df=max_df).count()
            dt = _t.time() - t0
            best = dt if best is None else min(best, dt)
        return best, n

    t_plain, n_plain = best2(plain, 64)
    t_capped, n_capped = best2(skewed, 64)
    t_uncapped, n_uncapped = best2(skewed, 10_000_000)
    out = {
        "clique": clique,
        "plain_sec": round(t_plain, 2),
        "capped_sec": round(t_capped, 2),
        "uncapped_sec": round(t_uncapped, 2),
        "capped_over_plain": round(t_capped / t_plain, 2) if t_plain else None,
        "uncapped_over_capped": (
            round(t_uncapped / t_capped, 2) if t_capped else None
        ),
        "plain_pairs": n_plain,
        "capped_pairs": n_capped,
        "uncapped_pairs": n_uncapped,
    }
    for f in (skewed, plain):
        try:
            f.unpersist()
        except Exception:
            pass
    return out


def _time_skew_prefix(spark, sf_dir: str, clique: int = 3000) -> dict:
    """Prefix-filter skew slice: same boilerplate-prefix clique as the
    df-cap slice (shared grams reach df ~= clique), measured against
    prefix_filter_jaccard_pairs -- the EXACT operator. With this clique
    the clones' true Jaccard is ~0.53 >= t, so the correct ANSWER itself
    is quadratic (clique^2/2 pairs): what the slice shows is the
    output-bound behavior of the exact path -- wall time grows by the
    recorded skewed/plain ratio while the answer grows by
    skewed_pairs/plain_pairs (~17500x at clique=3000), i.e. cost tracks
    the answer, not bucket-width^2 scanning. (A corpus where boilerplate
    exceeds half of every document defeats prefix PRUNING -- completeness
    forces the shared grams into some prefixes -- which is exactly the
    regime the df-capped twins own by dropping those grams.)"""
    import time as _t

    from pyspark.sql import functions as F

    from gmail_bigquery_etl_spark.catalog import load_table
    from gmail_bigquery_etl_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    boiler = "generated by the acme pipeline all rights reserved do not edit"
    clones = spark.range(30_000_000, 30_000_000 + clique).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(boiler + " unique tail "),
            F.md5(F.col("id").cast("string")),
            F.lit(" "),
            F.md5((F.col("id") + 7).cast("string")),
        ).alias("text"),
    )
    skewed = docs.unionAll(clones).localCheckpoint()
    plain = docs.localCheckpoint()

    def best2(frame):
        best, n = None, None
        for _ in range(2):
            t0 = _t.time()
            n = prefix_filter_jaccard_pairs(frame).count()
            dt = _t.time() - t0
            best = dt if best is None else min(best, dt)
        return best, n

    t_plain, n_plain = best2(plain)
    t_skewed, n_skewed = best2(skewed)
    out = {
        "clique": clique,
        "plain_sec": round(t_plain, 2),
        "skewed_sec": round(t_skewed, 2),
        "skewed_over_plain": round(t_skewed / t_plain, 2) if t_plain else None,
        "plain_pairs": n_plain,
        "skewed_pairs": n_skewed,
    }
    for f in (skewed, plain):
        try:
            f.unpersist()
        except Exception:
            pass
    return out


def _time_skew_basket(spark, sf_dir: str, heavy: int = 8, basket: int = 500) -> dict:
    """Item-CF basket-cap skew slice (VERDICT r8 item #9): the sf
    orders/lineitem baskets plus ``heavy`` planted mega-customers who
    each bought the ENTIRE mod-500 catalog (basket = 500 items, far
    above the 128 cap). Uncapped, each contributes basket^2 ~= 250k
    co-occurrence pairs and shifts every item-pair count; capped, they
    are excluded from the co-occurrence STATISTICS (still receiving
    recs through the scoring path). Reports: capped vs uncapped wall,
    capped vs uncapped pair-join volume, and -- the cap's RECALL grade
    -- the overlap of top-3 recs for the real (cust < 200, non-heavy)
    customers between the capped and uncapped similarity matrices."""
    import time as _t

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from gmail_bigquery_etl_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_custkey").alias("cust"),
            (F.col("l_partkey") % 500).alias("item"),
        )
        .distinct()
    )
    mega = (
        spark.range(9_000_000, 9_000_000 + heavy)
        .crossJoin(spark.range(basket).select(F.col("id").alias("item")))
        .select(F.col("id").alias("cust"), "item")
    )
    skewed = baskets.unionByName(mega).localCheckpoint()

    def recs(frame, cap):
        capped = (
            frame.withColumn("_bsz", F.count("*").over(W.partitionBy("cust")))
            .filter(F.col("_bsz") <= cap)
            .drop("_bsz")
        )
        item_n = capped.groupBy("item").agg(F.count("*").alias("cnt"))
        pair_n = (
            capped.alias("a")
            .join(
                capped.alias("b"),
                (F.col("a.cust") == F.col("b.cust"))
                & (F.col("a.item") != F.col("b.item")),
            )
            .groupBy(
                F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
            )
            .agg(F.count("*").alias("n_both"))
            .filter(F.col("n_both") >= 3)
        )
        sim = (
            pair_n.join(
                F.broadcast(
                    item_n.select(
                        F.col("item").alias("item_a"), F.col("cnt").alias("_ca")
                    )
                ),
                "item_a",
            )
            .join(
                F.broadcast(
                    item_n.select(
                        F.col("item").alias("item_b"), F.col("cnt").alias("_cb")
                    )
                ),
                "item_b",
            )
            .select(
                "item_a",
                "item_b",
                F.round(
                    F.col("n_both").cast("double")
                    / (F.sqrt(F.col("_ca").cast("double")) * F.sqrt(F.col("_cb").cast("double"))),
                    6,
                )
                .cast("decimal(18,6)")
                .alias("s6"),
            )
        )
        scored = (
            frame.where(F.col("cust") < 200)
            .join(sim, frame["item"] == sim["item_a"])
            .groupBy("cust", F.col("item_b").alias("rec_item"))
            .agg(F.sum("s6").alias("score6"))
        )
        novel = scored.join(
            frame.withColumnRenamed("item", "rec_item"),
            ["cust", "rec_item"],
            "left_anti",
        )
        return novel.withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("cust").orderBy(F.desc("score6"), "rec_item")
            ),
        ).where(F.col("rank") <= 3).select("cust", "rec_item")

    def pair_volume(frame, cap):
        capped = (
            frame.withColumn("_bsz", F.count("*").over(W.partitionBy("cust")))
            .filter(F.col("_bsz") <= cap)
            .drop("_bsz")
        )
        return (
            capped.groupBy("cust")
            .agg(F.count("*").alias("b"))
            .agg(F.sum(F.col("b") * (F.col("b") - 1)).cast("bigint").alias("v"))
            .collect()[0]
            .v
        )

    def best2(cap):
        best, n = None, None
        for _ in range(2):
            t0 = _t.time()
            n = recs(skewed, cap).count()
            dt = _t.time() - t0
            best = dt if best is None else min(best, dt)
        return best, n

    uncap = 10_000_000
    plain = baskets.localCheckpoint()
    t_capped, n_capped = best2(128)
    t_uncapped, n_uncapped = best2(uncap)
    r_capped = {(r.cust, r.rec_item) for r in recs(skewed, 128).collect()}
    r_uncapped = {(r.cust, r.rec_item) for r in recs(skewed, uncap).collect()}
    # Ground truth = recs on the PLAIN corpus: the mega-baskets are
    # adversarial noise (a basket holding the whole catalog carries no
    # preference signal), so the cap's recall grade is how much of the
    # plain-corpus answer survives the skew WITH the cap vs WITHOUT it.
    r_plain = {(r.cust, r.rec_item) for r in recs(plain, uncap).collect()}

    def _ov(a, b):
        return round(len(a & b) / len(b), 4) if b else None

    out = {
        "heavy_customers": heavy,
        "planted_basket": basket,
        "capped_sec": round(t_capped, 2),
        "uncapped_sec": round(t_uncapped, 2),
        "uncapped_over_capped": (
            round(t_uncapped / t_capped, 2) if t_capped else None
        ),
        "capped_pair_volume": pair_volume(skewed, 128),
        "uncapped_pair_volume": pair_volume(skewed, uncap),
        "capped_recs": len(r_capped),
        "uncapped_recs": len(r_uncapped),
        "rec_overlap_vs_uncapped": _ov(r_capped, r_uncapped),
        "capped_recall_of_plain": _ov(r_capped, r_plain),
        "uncapped_recall_of_plain": _ov(r_uncapped, r_plain),
    }
    for f in (skewed, plain):
        try:
            f.unpersist()
        except Exception:
            pass
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="scratch/sf1")
    ap.add_argument("--out", default="SCALE.json")
    ap.add_argument(
        "--skew",
        type=int,
        default=0,
        help="also measure the mega-bucket skew slice with this clique width",
    )
    ap.add_argument(
        "--skew-postings",
        type=int,
        default=0,
        help="also measure the df-cap posting-list skew slice with this "
        "clique width",
    )
    ap.add_argument(
        "--skew-prefix",
        type=int,
        default=0,
        help="also measure the prefix-filter exact-Jaccard skew slice with "
        "this clique width",
    )
    ap.add_argument(
        "--skew-basket",
        type=int,
        default=0,
        help="also measure the item-CF basket-cap skew slice with this many "
        "planted full-catalog mega-customers",
    )
    ap.add_argument(
        "--ops",
        default="",
        help="comma list of ops to run (default: the built-in OPS list); "
        "results merge into --out if it already exists",
    )
    args = ap.parse_args()
    ops = [] if args.ops == "-" else ([o for o in args.ops.split(",") if o] or OPS)
    spark = get_spark()
    # warm the JVM/session so the first op doesn't absorb startup
    spark.read.parquet(os.path.join(args.small, "documents.parquet")).count()
    report = {}
    for name in ops:
        t_small, n_small = _time(spark, name, args.small)
        t_big, n_big = _time(spark, name, args.big)
        report[name] = {
            "small_sec": round(t_small, 2),
            "big_sec": round(t_big, 2),
            "ratio": round(t_big / t_small, 2) if t_small else None,
            "small_rows": n_small,
            "big_rows": n_big,
        }
        print(json.dumps({name: report[name]}))
    payload = {"small": args.small, "big": args.big, "ops": report}
    if args.skew:
        payload["skew"] = _time_skew(spark, args.small, clique=args.skew)
        print(json.dumps({"skew": payload["skew"]}))
    if args.skew_postings:
        payload["skew_postings"] = _time_skew_postings(
            spark, args.small, clique=args.skew_postings
        )
        print(json.dumps({"skew_postings": payload["skew_postings"]}))
    if args.skew_prefix:
        payload["skew_prefix"] = _time_skew_prefix(
            spark, args.small, clique=args.skew_prefix
        )
        print(json.dumps({"skew_prefix": payload["skew_prefix"]}))
    if args.skew_basket:
        payload["skew_basket"] = _time_skew_basket(
            spark, args.small, heavy=args.skew_basket
        )
        print(json.dumps({"skew_basket": payload["skew_basket"]}))
    if os.path.exists(args.out):
        with open(args.out) as f:
            prior = json.load(f)
        merged_ops = {**prior.get("ops", {}), **payload["ops"]}
        payload = {**prior, **payload, "ops": merged_ops}
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
