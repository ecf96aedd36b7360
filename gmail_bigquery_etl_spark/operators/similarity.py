"""Similarity search over embedding columns (SURVEY.md §2.10).

brute_force_topk  -- exact top-k cosine: broadcast the (small) query set,
                     cross-join against the corpus, per-query window top-k.
                     At 100 TB the corpus side stays partitioned; the only
                     broadcast is the query set, and the ranking is a
                     TakeOrdered per query key, not a global sort.
lsh_bucket_ann    -- random-hyperplane LSH: b sign-bits from pseudo-random
                     (hash-derived, engine-portable) planes form a bucket
                     key; probe joins on the bucket, exact-ranks within.
                     Trades recall for turning the cross-join into an
                     equi-join -- the scale path.
label_centroids   -- per-label mean vector via posexplode + (label, dim)
                     aggregation: one shuffle, partial aggregation applies;
                     never collects vectors to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.text import portable_hash64
from ..functions.vectors import cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector. Excludes self-matches."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("match_id") != F.col("query_id"))
        .select(
            "query_id",
            "match_id",
            cosine_similarity("q_vec", "c_vec").alias("score"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "rank", F.round("score", 6).alias("score"))
    )


def hyperplane_bucket(vec_col: Column | str, n_planes: int = 8, dim: int = 64) -> Column:
    """Sign-bit bucket key from deterministic pseudo-random hyperplanes.

    Plane p component j = (md5-hash('p:j') % 2001 - 1000) / 1000 in [-1, 1]
    -- identical in any engine, no RNG state to ship. Bucket key is the
    concatenated sign bits as a string.
    """
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda p: F.when(
            F.aggregate(
                F.zip_with(
                    v,
                    F.transform(
                        F.sequence(F.lit(0), F.lit(dim - 1)),
                        lambda j: (
                            (
                                portable_hash64(
                                    F.concat(p.cast("string"), F.lit(":"), j.cast("string"))
                                )
                                % 2001
                                - 1000
                            ).cast("double")
                            / 1000.0
                        ),
                    ),
                    lambda x, w_: x.cast("double") * w_,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )
    return F.array_join(bits, "")


def lsh_bucket_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: candidates share the query's hyperplane bucket; exact cosine
    rank within. Single-probe (no multi-bucket expansion)."""
    bucket = hyperplane_bucket(vec_col, n_planes, dim)
    c = corpus.select(
        F.col(id_col).alias("match_id"), F.col(vec_col).alias("c_vec"), bucket.alias("bucket")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), bucket.alias("bucket")
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("match_id") != F.col("query_id"))
        .select("query_id", "match_id", cosine_similarity("q_vec", "c_vec").alias("score"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "rank", F.round("score", 6).alias("score"))
    )


def label_centroids(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label element-wise mean embedding, distributed (no collect).
    Output long-form (label, dim, centroid) with rounding so the fp sum's
    shuffle-order nondeterminism stays below the emitted precision."""
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    )
    return exploded.groupBy("label", "dim").agg(
        F.round(F.avg(F.col("x").cast("double")), 6).alias("centroid"),
        F.count("*").alias("n"),
    )
