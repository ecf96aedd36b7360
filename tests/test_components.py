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


def test_bfs_hops_multi_source_shortest(spark):
    """Distance to the nearest component-min survivor, level-synchronous:
    chain 1-2-3-4 (hops 0,1,2,3), triangle 20-21-22 (hops 0,1,1), and a
    cycle 30..35 where two paths compete and the SHORTER must win."""
    from gmail_bigquery_etl_spark.operators.components import bfs_hops

    pairs = _pairs(
        spark,
        [(1, 2), (2, 3), (3, 4), (20, 21), (21, 22), (20, 22)]
        + [(30, 31), (31, 32), (32, 33), (33, 34), (34, 35), (35, 30)],
    )
    got = {r.node: r.hops for r in bfs_hops(pairs).collect()}
    assert got == {
        1: 0, 2: 1, 3: 2, 4: 3,
        20: 0, 21: 1, 22: 1,
        30: 0, 31: 1, 32: 2, 33: 3, 34: 2, 35: 1,
    }


def test_bfs_hops_explicit_sources(spark):
    from gmail_bigquery_etl_spark.operators.components import bfs_hops

    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4)])
    srcs = spark.createDataFrame([(4,)], "node bigint")
    got = {r.node: r.hops for r in bfs_hops(pairs, sources=srcs).collect()}
    assert got == {4: 0, 3: 1, 2: 2, 1: 3}


def test_kcore_peels_chains_keeps_cliques(spark):
    """2-core: a path graph peels to nothing; a 4-clique with a pendant
    chain keeps exactly the clique (pendant peels, then fixpoint)."""
    from gmail_bigquery_etl_spark.operators.components import kcore

    path = _pairs(spark, [(1, 2), (2, 3), (3, 4)])
    assert kcore(path, k=2).count() == 0

    clique = [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13) if a < b]
    g = _pairs(spark, clique + [(13, 20), (20, 21)])
    got = {r.node: r.core_deg for r in kcore(g, k=2).collect()}
    assert got == {10: 3, 11: 3, 12: 3, 13: 3}


def test_kcore_cascading_peel_depth(spark):
    """A peel that CASCADES: caterpillar where removing leaves drops the
    spine below k, round after round -- exercises the multi-round
    fixpoint loop the unrolled oracle depth must cover."""
    from gmail_bigquery_etl_spark.operators.components import kcore

    # chain 0-1-2-...-9 with an extra leaf on each end node: every round
    # peels the current endpoints; 2-core is empty after ~5 rounds.
    edges = [(i, i + 1) for i in range(9)] + [(0, 100), (9, 101)]
    assert kcore(_pairs(spark, edges), k=2).count() == 0


def test_kcore_fixture_peel_depth_within_oracle_unroll(spark, sf_dir):
    """The graph_kcore oracle unrolls 8 peel rounds; assert the sf fixture
    graph actually reaches its fixpoint within fewer (guards the
    'unroll >= true peel depth' exactness precondition)."""
    from gmail_bigquery_etl_spark.operators.components import kcore
    from gmail_bigquery_etl_spark.queries.graph import _lsh_pairs

    pairs = _lsh_pairs(spark, sf_dir).localCheckpoint()
    full = kcore(pairs, k=3, max_iter=30)
    capped = kcore(pairs, k=3, max_iter=6)
    a = sorted((r.node, r.core_deg) for r in full.collect())
    b = sorted((r.node, r.core_deg) for r in capped.collect())
    assert a == b


def test_ewma_halflife_exact_weights(spark, tmp_path):
    """Dyadic EWMA: hand-check the 2^(15-d) weighting and the partial
    window normalization on a 3-event user."""
    import shutil
    from datetime import datetime

    from gmail_bigquery_etl_spark.queries.events import events_ewma_halflife

    rows = [
        (0, datetime(2024, 1, 1, 0, 0), 1, "a", 1.0, "{}"),
        (1, datetime(2024, 1, 1, 0, 1), 1, "a", 2.0, "{}"),
        (2, datetime(2024, 1, 1, 0, 2), 1, "a", 4.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )
    d = tmp_path / "sf"
    d.mkdir()
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    try:
        got = {
            r.event_id: r.ewma
            for r in events_ewma_halflife(spark, str(d)).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert got[0] == 1.0
    # n=2: (2*2^15 + 1*2^14) / (2^16 - 2^14)
    assert got[1] == round((2 * 2**15 + 1 * 2**14) / (2**16 - 2**14), 6)
    # n=3: (4*2^15 + 2*2^14 + 1*2^13) / (2^16 - 2^13)
    assert got[2] == round(
        (4 * 2**15 + 2 * 2**14 + 1 * 2**13) / (2**16 - 2**13), 6
    )


def test_bfs_fixture_eccentricity_within_cap(spark, sf_dir):
    """bfs_hops caps at max_iter=32 and the graph_bfs_hops oracle walks
    to d < 32; assert the fixture graph's eccentricity from the
    component-min sources sits well inside BOTH caps (guards the
    'cap >= true eccentricity' exactness precondition, the BFS analog
    of test_kcore_fixture_peel_depth_within_oracle_unroll), and that
    every graph node is reached (the docstring's every-node-gets-a-row
    guarantee holds because sources cover every component)."""
    from gmail_bigquery_etl_spark.operators.components import bfs_hops
    from gmail_bigquery_etl_spark.queries.graph import _lsh_pairs

    pairs = _lsh_pairs(spark, sf_dir).localCheckpoint()
    dist = bfs_hops(pairs).localCheckpoint()
    max_hops = dist.agg(F.max("hops")).first()[0]
    assert max_hops <= 16, f"fixture eccentricity {max_hops} nears the cap"
    n_nodes = (
        pairs.select(F.col("id_a").alias("n"))
        .unionAll(pairs.select(F.col("id_b").alias("n")))
        .distinct()
        .count()
    )
    assert dist.count() == n_nodes
