"""Distributed Lloyd k-means over embedding vectors, in exact integer
arithmetic (SURVEY.md §2.10 similarity family; the ITERATIVE quantizer,
where ivf_centroid_arrays is the one-pass label quantizer).

Each Lloyd round is the canonical two-step:

  assign:   every vector -> argmin_c L2^2(v, centroid_c). The centroid
            matrix is a k x dim LITERAL (collected once per round --
            kilobytes, the same O(K*dim) driver surface every IVF build
            ships), so assignment is a pure codegen'd projection: ZERO
            shuffle, no join, no Python.
  recenter: component-wise integer mean per cluster -- posexplode of the
            staged vector attribute to (cluster, dim, val), ONE
            (cluster, dim) shuffle, sum div count.

Determinism is total: vectors quantize to BIGINT micro-units
(round(x * 1e6)), distances are BIGINT sums of squared diffs, argmin
tie-breaks on cluster id via struct ordering, and means use truncating
integer division (`div`), which DuckDB's `//` matches sign-for-sign --
so the k-round loop unrolls as chained CTEs into a bit-exact oracle,
like BPE and PageRank. Empty clusters simply drop out of the next
centroid table on BOTH sides (no special case to mirror).

Scale: per round, one projection over the corpus and one shuffle of
corpus x dim rows on uniform (cluster, dim) keys; the driver holds k*dim
ints. iters is fixed (training pipelines run Lloyd a bounded number of
rounds per re-index), so the plan is statically unrollable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**6


def quantized_vectors(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, v): embeddings as BIGINT micro-unit arrays (exact arithmetic
    from here on)."""
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            vec_col,
            lambda x: F.round(x.cast("double") * SCALE).cast("bigint"),
        ).alias("v"),
    )


def _assign(qv: DataFrame, centroids: list[tuple[int, list[int]]]) -> DataFrame:
    """(vec_id, cluster, dist): nearest centroid by exact L2^2 over the
    literal centroid matrix; ties break to the smallest cluster id via
    struct min."""
    if not centroids:
        # empty-input cold start: a well-TYPED empty candidate array so
        # array_min folds to a null struct and the assignment projects
        # null cluster/dist over zero rows instead of failing analysis
        scored = F.array().cast("array<struct<dist:bigint,cid:int>>")
    else:
        # the whole candidate array as ONE parsed expression: the
        # structured builder paid ~88 py4j roundtrips per zip_with/
        # aggregate lambda, k of them per round x (iters+1) rounds, so
        # expression BUILD (driver-side, single-threaded) dominated the
        # query's wall time. BIGINT literals via the L suffix are
        # value-identical to the F.lit ints after zip_with's upcast; the
        # parsed tree is the same zip_with/aggregate/named_struct shape,
        # so assignments and distances are bit-identical.
        scored = F.expr(
            "array("
            + ",".join(
                "named_struct('dist', aggregate(zip_with(v, array("
                + ",".join(f"{int(x)}L" for x in cv)
                + "), (a, b) -> (a - b) * (a - b)), CAST(0 AS BIGINT), "
                f"(acc, d) -> acc + d), 'cid', {int(cid)})"
                for cid, cv in centroids
            )
            + ")"
        )
    return qv.select(
        "vec_id",
        F.array_min(scored).alias("_best"),
    ).select(
        "vec_id",
        F.col("_best.cid").alias("cluster"),
        F.col("_best.dist").alias("dist"),
    )


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Final-round assignment (vec_id, cluster, dist) after ``iters``
    Lloyd rounds from the deterministic seed (the k lowest-id vectors)."""
    qv = quantized_vectors(df, id_col, vec_col).localCheckpoint()
    seed_rows = qv.orderBy("vec_id").limit(k).collect()
    centroids = [(i, list(r.v)) for i, r in enumerate(seed_rows)]
    assigned = _assign(qv, centroids)
    for _ in range(iters):
        comp = (
            assigned.join(qv, "vec_id")
            .select("cluster", F.posexplode("v").alias("j", "val"))
            .groupBy("cluster", "j")
            .agg(F.expr("sum(val) div count(*)").alias("m"))
        )
        rows = comp.collect()  # k*dim ints: the quantizer-table collect
        by_cid: dict[int, dict[int, int]] = {}
        for r in rows:
            by_cid.setdefault(r.cluster, {})[r.j] = r.m
        centroids = [
            (cid, [by_cid[cid][j] for j in range(len(seed_rows[0].v))])
            for cid in sorted(by_cid)
        ]
        assigned = _assign(qv, centroids)
    return assigned
