"""Connected components / dedup-cluster operators (operators/components.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.operators.components import (
    connected_components,
    dedup_survivors,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a bigint, id_b bigint")


def test_components_known_graph(spark):
    # components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    pairs = _pairs(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
    )
    got = {
        r.node: r.component for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_components_long_chain_converges(spark):
    """A 40-node path needs multiple propagation rounds (stress for the
    fixpoint loop + checkpoint-truncated lineage)."""
    n = 40
    pairs = _pairs(spark, [(i, i + 1) for i in range(n)])
    got = connected_components(pairs)
    comps = {r.component for r in got.collect()}
    assert comps == {0}
    assert got.count() == n + 1


def test_dedup_survivors_keep_min_per_cluster(spark):
    df = spark.range(8).select(F.col("id").alias("doc_id"))
    pairs = _pairs(spark, [(1, 5), (5, 7), (2, 3)])
    out = sorted(r.doc_id for r in dedup_survivors(df, pairs).collect())
    # losers: 5,7 (cluster min 1), 3 (cluster min 2)
    assert out == [0, 1, 2, 4, 6]


def test_pagerank_star_graph_properties(spark):
    """Integer fixed-point PageRank: the hub of a star out-ranks every
    leaf, leaves tie exactly (determinism), and total mass stays within
    quantization slack of one unit."""
    from gmail_bigquery_etl_spark.operators.components import pagerank_units

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 9)], "id_a long, id_b long"
    )
    rows = {r.node: r.pr_units for r in pagerank_units(star, iters=5).collect()}
    assert len(rows) == 9
    hub, leaves = rows[0], [rows[i] for i in range(1, 9)]
    assert all(hub > l for l in leaves)
    assert len(set(leaves)) == 1  # exact tie, no float drift
    total = hub + sum(leaves)
    assert abs(total - 10**12) < 10**6  # mass conserved to quantization
