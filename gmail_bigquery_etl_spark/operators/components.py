"""Connected components over a pair graph: dedup-cluster assignment.

Near-dup detection emits PAIRS; a training pipeline needs CLUSTERS (keep
one survivor per duplicate cluster). Components of the pair graph give the
cluster ids. This is the canonical iterative-join algorithm (alternating
min-label propagation, a simplified large-star/small-star): each round
every node adopts the smallest label in its neighborhood, until a fixpoint.

Scale shape: one shuffle per propagation round (join on node), converging
in O(log(longest path)) rounds for near-dup graphs (which are tiny, dense
cliques -- typically 1-3 rounds). Rounds run TWO per driver cycle (the
first fused un-materialized into the second's job); each cycle's result is
localCheckpoint'd to truncate lineage: without it, cycle k re-executes
cycles 1..k-1 and the DAG grows quadratically. No driver-side looping over
data -- the driver only drives the fixpoint test (a count of changed
labels), once per two rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    edges: DataFrame | None = None,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; component = min node
    id reachable. Deterministic, oracle-checkable against a recursive-CTE
    transitive closure.

    ``edges``: optionally an ALREADY-MATERIALIZED symmetric distinct edge
    list (columns u, v) -- callers that built one themselves (bfs_hops)
    pass it instead of paying a second union/distinct/checkpoint over the
    same pairs (optimization r12, guide §1.2 redundant-pass removal)."""
    # Materialize the PAIRS first, then the edge list. The symmetrized
    # union references `pairs` twice (forward + flipped), so building
    # edges straight off the input plan evaluates the entire upstream
    # pair-generation pipeline (e.g. the full LSH candidate + Jaccard
    # verify run) TWICE inside one checkpoint job -- measured as the
    # dominant cost of cluster assignment at sf0.1. Checkpointing the
    # (tiny) pair list once makes the union read materialized rows; the
    # edges checkpoint after it is then ~free and keeps every propagation
    # round's join off even that short lineage.
    if edges is None:
        p = pairs.select(
            F.col(src).alias("u"), F.col(dst).alias("v")
        ).localCheckpoint()
        edges = (
            p.unionAll(p.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .distinct()
            .localCheckpoint()
        )
    # self-loop keeps isolated... every node appears (pairs have both ends);
    # self edge makes "neighborhood min" include the node's own label.
    nodes = edges.select("u").distinct()
    labels = nodes.select("u", F.col("u").alias("comp")).localCheckpoint()

    def step(cur: DataFrame, track: bool) -> DataFrame:
        """One propagation + pointer-doubling round as a pure plan.

        neighborhood min: for each node u, min(comp of u, comp of all v);
        then pointer doubling (path halving): comp[u] <- comp[comp[u]].
        Neighbor-min alone moves a label ONE hop per round (O(diameter)
        rounds on a path); with doubling the label distance halves each
        round -> O(log n) rounds total, the hash-to-min convergence.
        """
        neigh = (
            edges.join(cur.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("comp").alias("neigh_comp"))
        )
        stepped = cur.join(neigh, "u", "left").select(
            "u",
            F.col("comp").alias("_old"),
            F.least("comp", F.coalesce("neigh_comp", F.col("comp"))).alias(
                "comp"
            ),
        )
        ptr = stepped.select(F.col("u").alias("_c"), F.col("comp").alias("_cc"))
        new_comp = F.least("comp", F.coalesce("_cc", F.col("comp")))
        cols = ["u", new_comp.alias("comp")]
        if track:
            # The convergence flag rides along the round's own projection
            # (comp vs the round's input label), so the fixpoint test is a
            # filter over the checkpointed result -- NOT an extra join-on-u
            # against the previous labels (one more shuffle + job / round).
            cols.append((new_comp != F.col("_old")).alias("_changed"))
        return stepped.join(ptr, stepped.comp == ptr._c, "left").select(*cols)

    # TWO rounds per driver cycle: the first is a pure (un-materialized)
    # plan fused into the second's job, the second checkpoints + tests
    # convergence. Halves the per-round driver overhead (each cycle costs
    # one eager localCheckpoint job + one count job instead of two of
    # each). Correctness of the fixpoint test: _changed compares against
    # the SECOND round's own input, and "one full round changed nothing"
    # is exactly the fixpoint condition -- whatever the first round did.
    #
    # Why not fuse MORE rounds: measured at sf0.1 (A/B warm best-of-3,
    # dedup_clusters end-to-end) -- near-dup graphs are dense cliques
    # whose labels converge within the FIRST two-round cycle, so k=2
    # already finishes in one cycle (one checkpoint + one count) and
    # extra fused rounds are pure added join work: k=2 3.16 s, k=3
    # 3.62 s, k=4 6.62 s. Deeper fusion only pays on long-path graphs,
    # which near-dup pair sets are not.
    for _ in range(max_iter):
        mid = step(labels, track=False)
        new_labels = step(mid, track=True).localCheckpoint()
        labels = new_labels.select("u", "comp")
        if new_labels.filter(F.col("_changed")).limit(1).count() == 0:
            break
    return labels.select(F.col("u").alias("node"), F.col("comp").alias("component"))


def dedup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one row per duplicate cluster (the min-id member) plus every
    row not in any pair: the end-to-end dedup a training pipeline applies
    after near-dup scoring."""
    comp = connected_components(pairs)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle membership counts over an undirected graph given
    as canonical edges (id_a < id_b) -- the clustering-coefficient
    numerator, and on a near-dup pair graph the count of MUTUALLY-similar
    triples a node belongs to (a stronger redundancy signal than pair
    degree: a doc in many triangles sits inside a dense duplicate blob,
    not a chain of borderline matches).

    Standard once-per-triangle enumeration: because every edge is stored
    with a < b, a triangle a<b<c is found exactly once as edges (a,b),
    (b,c), (a,c) -- two hash equi-joins, no orientation/dedup pass needed.
    Scale: join fan-out is sum of deg^2 over the middle vertex; for
    skew-degree graphs the classic mitigation (orient edges by degree) can
    replace the canonical-id orientation without changing this API.
    """
    # Three join subtrees consume the edge list; if edges arrive as an
    # unmaterialized plan (the LSH near-dup pipeline), Spark would re-run
    # that whole pipeline once per subtree. Same localCheckpoint
    # discipline as connected_components' edge input.
    e = edges.select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    ).localCheckpoint()
    tri = (
        e.alias("e1")
        .join(
            e.select(F.col("a").alias("b"), F.col("b").alias("c")).alias("e2"),
            "b",
        )
        .join(
            e.select(F.col("a").alias("a"), F.col("b").alias("c")).alias("e3"),
            ["a", "c"],
        )
        .select("a", "b", "c")
    )
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count("*").alias("n_triangles"))


def pagerank_units(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    iters: int = 5,
    damping_pct: int = 85,
    unit: int = 10**12,
) -> DataFrame:
    """PageRank over the UNDIRECTED pair graph, in EXACT integer
    fixed-point: (node, pr_units) with pr_units ~= pagerank * ``unit``.

    Third member of the iterative family (components, BPE): a driver loop
    of fully distributed rounds -- per round ONE join edges->contributions
    and one groupBy inflow sum, localCheckpoint truncating lineage; the
    only driver-side value is the node count. Floats never appear:
    contributions are BIGINT floor divisions (pr div deg) and the damping
    update is ((100-d)*(unit div n) + d*inflow) div 100, so every engine
    computes bit-identical units and the unrolled-CTE DuckDB oracle
    exact-matches -- no tolerance band, no summation-order drift.
    Quantization error is <= iters * deg / unit, irrelevant at unit=1e12.

    Scale: rounds shuffle on node id (uniform); the symmetrized edge list
    is the same checkpointed build connected_components uses; dangling
    nodes cannot exist (symmetrization gives every node in-degree >= 1),
    so no dangling-mass redistribution term is needed."""
    p = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint()
    edges = (
        p.unionAll(p.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    deg = edges.groupBy("u").agg(F.count("*").alias("deg")).localCheckpoint()
    n = deg.count()  # the one driver-side scalar (node count)
    if n == 0:
        # cold start / empty graph: a well-typed empty result, not a
        # ZeroDivisionError from unit // 0
        return deg.select(
            F.col("u").alias("node"), F.lit(0).cast("bigint").alias("pr_units")
        )
    init = unit // n
    base = (100 - damping_pct) * init
    pr = deg.select("u", F.lit(init).cast("bigint").alias("pr"))
    for i in range(iters):
        contrib = (
            pr.join(deg, "u").select("u", F.expr("pr div deg").alias("c"))
        )
        inflow = (
            edges.join(contrib, "u")
            .groupBy("v")
            .agg(F.sum("c").alias("inflow"))
            .withColumnRenamed("v", "u")
        )
        pr = inflow.select(
            "u",
            F.expr(f"({base} + {damping_pct} * inflow) div 100")
            .cast("bigint")
            .alias("pr"),
        )
        # TWO rounds per checkpoint (optimization r12 -- the
        # connected_components fusion extended here, VERDICT r11 #3):
        # within a round ``pr`` has exactly ONE consumer (the next
        # round's contrib join), so leaving odd rounds un-materialized
        # fuses two rounds into one eager job with ZERO recompute --
        # iters=5 pays 2 checkpoint jobs instead of 5. The FINAL round
        # stays lazy too: its single consumer is the caller's plan, and
        # lineage from the last checkpoint is at most two rounds deep.
        if i % 2 == 1 and i != iters - 1:
            pr = pr.localCheckpoint()
    return pr.select(F.col("u").alias("node"), F.col("pr").alias("pr_units"))


def ppr_units(
    pairs: DataFrame,
    seeds: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    iters: int = 5,
    damping_pct: int = 85,
    unit: int = 10**12,
) -> DataFrame:
    """PERSONALIZED PageRank over the undirected pair graph (Page et al.
    1999 sec. 6; random walk with restart): identical integer
    fixed-point to :func:`pagerank_units`, except the restart mass
    lands only on the ``seeds`` node set (one ``u`` column) instead of
    uniformly — r_{{k+1}}(v) = ((100-d)·[v∈S]·(unit div |S|) +
    d·inflow(v)) div 100. The curation read: given a trusted seed
    slice, ppr_units ranks every document by proximity to the seeds
    through the duplicate/similarity graph — the seed-expansion
    selection WebText-style pipelines run (quality via links to a
    trusted set), here over the near-dup graph.

    Plan hardening from the r11 HITS lesson (hits_from_edges): every
    checkpointed score table is key-repartitioned BEFORE the
    checkpoint and joins the edge list under a SHUFFLE_HASH hint, so
    AQE can never coalesce it to one partition and flip the planner
    into broadcasting the fact-sized edge list. Floats never appear;
    the unrolled-CTE oracle matches bit-for-bit. Output: (node,
    ppr_units, is_seed) for every graph node, zeros included — stable
    schema, deterministic."""
    p = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint()
    edges = (
        p.unionAll(p.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    deg = (
        edges.groupBy("u")
        .agg(F.count("*").alias("deg"))
        .join(seeds.select("u").distinct().withColumn("s", F.lit(True)), "u", "left")
        .select("u", "deg", F.coalesce(F.col("s"), F.lit(False)).alias("s"))
        .repartition(F.col("u"))
        .localCheckpoint()
    )
    ns = deg.where("s").count()  # driver-side scalars: seed count only
    if ns == 0:
        return deg.select(
            F.col("u").alias("node"),
            F.lit(0).cast("bigint").alias("ppr_units"),
            F.col("s").alias("is_seed"),
        )
    init = unit // ns
    base = (100 - damping_pct) * init
    pr = deg.select(
        "u",
        F.when(F.col("s"), F.lit(init)).otherwise(F.lit(0))
        .cast("bigint")
        .alias("pr"),
    )
    for i in range(iters):
        contrib = pr.join(deg.hint("SHUFFLE_HASH"), "u").select(
            "u", F.expr("pr div deg").alias("c")
        )
        inflow = (
            edges.join(contrib.hint("SHUFFLE_HASH"), "u")
            .groupBy("v")
            .agg(F.sum("c").alias("inflow"))
            .withColumnRenamed("v", "u")
        )
        pr = inflow.join(deg.hint("SHUFFLE_HASH"), "u").select(
            "u",
            F.expr(
                f"(CASE WHEN s THEN {base} ELSE 0 END "
                f"+ {damping_pct} * inflow) div 100"
            )
            .cast("bigint")
            .alias("pr"),
        )
        # two rounds per checkpoint, final round lazy -- the
        # pagerank_units fusion (one consumer per round, zero recompute);
        # the SHUFFLE_HASH hints above keep every join off the driver at
        # any scale whether or not the round is materialized
        if i % 2 == 1 and i != iters - 1:
            pr = pr.repartition(F.col("u")).localCheckpoint()
    return (
        pr.join(deg.hint("SHUFFLE_HASH"), "u")
        .select(
            F.col("u").alias("node"),
            F.col("pr").alias("ppr_units"),
            F.col("s").alias("is_seed"),
        )
    )


def bfs_hops(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    sources: DataFrame | None = None,
    max_iter: int = 32,
) -> DataFrame:
    """Multi-source BFS over the (undirected) pair graph: (node, hops)
    where hops = shortest distance to the nearest source. Default source
    set: each component's min node id (the dedup survivor), making the
    result "how far is every variant from its cluster's canonical
    document" -- and guaranteeing every graph node gets a row PROVIDED
    the graph's eccentricity from the sources is <= ``max_iter`` (the
    loop settles distances up to max_iter; the graph_bfs_hops oracle
    walks the same bound, and tests pin the fixture eccentricity well
    inside it -- test_bfs_fixture_eccentricity_within_cap).

    Level-synchronous frontier expansion, the textbook distributed BFS:
    each round joins the CURRENT frontier (not the whole distance table)
    against the edge list, min-aggregates candidate distances, and
    anti-joins out already-settled nodes; because expansion is strictly
    level by level, the first round that reaches a node reaches it along
    a shortest path, so no relaxation/decrease-key pass is needed. One
    join + one agg + one anti-join shuffle per LEVEL (not per node, and
    the same count regardless of how many sources -- multi-source BFS is
    free parallelism). Each FRONTIER is localCheckpoint'd so level k's
    job never re-executes levels 1..k-1; the settled set is a union of
    those materialized frontiers (O(levels) lineage, nothing to
    re-checkpoint). The input pair list is pinned ONCE and the default
    source derivation (connected components) runs on the PINNED list --
    not the caller's plan, which would re-execute the whole upstream
    pair-generation pipeline a second time (measured as the dominant
    cost before the fix, same lesson as connected_components' header
    comment). The driver holds per-level frontier counts -- never
    rows."""
    p = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint()
    edges = (
        p.unionAll(p.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    if sources is None:
        # reuse THIS function's pinned symmetric edge list (r12, §1.2):
        # deriving sources previously re-unioned/distinct'd/checkpointed
        # the same pairs inside connected_components
        comp = connected_components(p, src="u", dst="v", edges=edges)
        sources = comp.filter(F.col("node") == F.col("component")).select(
            F.col("node")
        )
    frontier = (
        sources.toDF("u")
        .select(F.col("u").cast("long"), F.lit(0).cast("int").alias("hops"))
        .localCheckpoint()
    )
    fronts = [frontier]
    settled = frontier.select("u")
    for _ in range(max_iter):
        nxt = (
            frontier.join(edges, "u")
            .select(F.col("v").alias("u"), (F.col("hops") + 1).alias("hops"))
            .groupBy("u")
            .agg(F.min("hops").cast("int").alias("hops"))
            .join(settled, "u", "left_anti")
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        fronts.append(nxt)
        settled = settled.unionAll(nxt.select("u"))
        frontier = nxt
    dist = fronts[0]
    for f in fronts[1:]:
        dist = dist.unionAll(f)
    return dist.select(F.col("u").alias("node"), "hops")


def kcore(
    pairs: DataFrame,
    k: int = 2,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly delete every
    node with degree < k (and its edges) until a fixpoint; return
    (node, core_deg) for the surviving subgraph -- the density filter
    that separates a genuine duplication CLUSTER from a chain of
    borderline pairwise matches (a path survives 2-core never, a clique
    always), the graph-side analogue of the triangle count.

    Each peel round is one degree aggregation plus two semi-joins
    (endpoint-keeps) -- all equi-joins on the node key, one shuffle
    each; the round result is localCheckpoint'd and the driver tests the
    fixpoint on the edge COUNT only. Converges in at most O(peel depth)
    rounds (degenerate graphs peel layer by layer; dedup clique graphs
    settle in 1-2)."""
    p = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint()
    edges = (
        p.unionAll(p.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    n_edges = edges.count()
    for _ in range(max_iter):
        keep = (
            edges.groupBy("u")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= k)
            .select("u")
        )
        nxt = (
            edges.join(keep, "u", "left_semi")
            .join(keep.withColumnRenamed("u", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint()
        )
        n_nxt = nxt.count()
        edges = nxt
        if n_nxt == n_edges:
            break
        n_edges = n_nxt
    return (
        edges.groupBy("u")
        .agg(F.count("*").cast("int").alias("core_deg"))
        .select(F.col("u").alias("node"), "core_deg")
    )
