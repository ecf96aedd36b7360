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

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

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


def _plane_weights(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes, component (p, j) =
    (int(md5('p:j')[:15 hex]) % 2001 - 1000) / 1000 in [-1, 1]. Computed in
    Python with hashlib (bit-identical to the SQL md5 formula the oracle
    uses) and baked in as literals: constants, not per-row md5 calls."""
    return [
        [
            float(
                int(hashlib.md5(f"{p}:{j}".encode()).hexdigest()[:15], 16) % 2001
                - 1000
            )
            / 1000.0
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def hyperplane_bucket(vec_col: Column | str, n_planes: int = 8, dim: int = 64) -> Column:
    """Sign-bit bucket key from deterministic pseudo-random hyperplanes.

    Plane weights are Python-computed constants (same md5 derivation the
    DuckDB oracle evaluates in SQL); per row the work is n_planes
    sequential dot folds -- same accumulation order as the oracle, so the
    sign bits match bit-for-bit.
    """
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bits = []
    for plane in _plane_weights(n_planes, dim):
        w_arr = F.array(*[F.lit(w) for w in plane])
        d = F.aggregate(
            F.zip_with(v, w_arr, lambda x, w_: x.cast("double") * w_),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


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


def allpairs_cosine(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "v",
    blocks: int = 8,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold, via blocked BLAS.

    The naive form is a crossJoin with an interpreted 64-element fold per
    pair -- O(n^2) slow-path evaluations. Here every row is replicated to
    the ``blocks`` block-pairs it participates in (B copies/row), each of
    the B*(B+1)/2 groups lands on one task, and numpy matmul scores the
    whole tile at once. Shuffle volume is B x corpus (pick B ~ sqrt(task
    slots)); flops run in BLAS, not the expression interpreter -- this is
    the standard distributed blocked all-pairs similarity layout.
    """
    b_lit = F.lit(blocks)
    tagged = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.pmod(F.col(id_col), b_lit).cast("int").alias("blk"),
    )
    replicated = tagged.select(
        "id",
        "v",
        "blk",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), b_lit - 1),
                lambda o: F.struct(
                    F.least(F.col("blk"), o).cast("int").alias("bp"),
                    F.greatest(F.col("blk"), o).cast("int").alias("bq"),
                ),
            )
        ).alias("pair"),
    ).select("id", "v", "blk", "pair.bp", "pair.bq")

    def score_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        V = np.asarray(pdf["v"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1)
        safe = np.where(norms == 0.0, 1.0, norms)
        Vn = V / safe[:, None]
        Vn[norms == 0.0] = 0.0  # zero vectors match nothing (oracle: NULL)
        ids = pdf["id"].to_numpy()
        bp, bq = int(pdf["bp"].iloc[0]), int(pdf["bq"].iloc[0])
        if bp == bq:
            S = Vn @ Vn.T
            iu, ju = np.triu_indices(len(ids), k=1)
            ia, ib, s = ids[iu], ids[ju], S[iu, ju]
        else:
            left = pdf["blk"].to_numpy() == bp
            A, Bm = Vn[left], Vn[~left]
            ida, idb = ids[left], ids[~left]
            S = A @ Bm.T
            ii, jj = np.indices(S.shape)
            ia, ib, s = ida[ii.ravel()], idb[jj.ravel()], S.ravel()
        keep = s >= threshold
        ia, ib, s = ia[keep], ib[keep], s[keep]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "score": s})

    return replicated.groupBy("bp", "bq").applyInPandas(
        score_tile, schema="id_a bigint, id_b bigint, score double"
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
