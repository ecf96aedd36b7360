"""Lloyd k-means (operators/kmeans.py): objective monotonicity, exact
determinism, and cluster-count sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.operators.kmeans import kmeans_lloyd

SF = "/root/testdata/sf0.001"


def _objective(spark, iters):
    from gmail_bigquery_etl_spark.catalog import load_table

    emb = load_table(spark, SF, "embeddings")
    out = kmeans_lloyd(emb, k=8, iters=iters)
    return out.agg(F.sum("dist")).collect()[0][0]


def test_lloyd_objective_non_increasing(spark):
    """Each recenter+reassign round can only lower the summed L2^2
    objective (Lloyd's convergence guarantee, up to integer-mean
    quantization slack)."""
    objs = [_objective(spark, i) for i in range(3)]
    slack = 10**8  # quantization: k*dim cells, each off by < 1 micro-unit
    assert objs[1] <= objs[0] + slack, objs
    assert objs[2] <= objs[1] + slack, objs
    assert objs[2] < objs[0], objs  # and it genuinely improves


def test_lloyd_is_deterministic_and_partitions(spark):
    from gmail_bigquery_etl_spark.catalog import load_table

    emb = load_table(spark, SF, "embeddings")
    a = {(r.vec_id, r.cluster) for r in kmeans_lloyd(emb, k=8, iters=2).collect()}
    b = {(r.vec_id, r.cluster) for r in kmeans_lloyd(emb, k=8, iters=2).collect()}
    assert a == b
    assert len(a) == emb.count()  # every vector assigned exactly once
    assert len({c for _, c in a}) >= 2  # non-degenerate clustering
