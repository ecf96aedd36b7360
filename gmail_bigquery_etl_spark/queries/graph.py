"""Graph analytics over the near-dup pair graph: BFS + k-core.

Completes the graph family next to connected components (membership),
PageRank (centrality) and triangle counts (local density) in
operators/components.py. Both are iterative driver-loop operators whose
per-round work is pure equi-join/aggregate shuffles -- the shape that
survives a 1000-executor scale-up -- and both are oracle-gated in exact
integers (hop counts, degrees), so the checks are bit-for-bit, no float
tolerance.

Reference parity: the reference has no graph surface at all (its dedup
is `SELECT DISTINCT` in BigQuery, survey §2.4 A1); these operators are
part of the LLM-pipeline north stars (cluster diagnostics for near-dup
families).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from .registry import query
from .text import _SQL_LSH_CTES, _SQL_LSH_SELECT, _augmented_corpus


def _lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import near_dup_pairs

    corpus = _augmented_corpus(load_table(spark, sf_dir, "documents"))
    return near_dup_pairs(corpus, threshold=0.5, num_hashes=16, bands=4)


@query(
    "graph_bfs_hops",
    oracle=f"""
WITH RECURSIVE {_SQL_LSH_CTES},
pairs AS ({_SQL_LSH_SELECT}),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
compo AS (
  SELECT u AS node, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u
),
srcs AS (SELECT node AS u FROM compo WHERE node = component),
walk(u, d) AS (
  SELECT u, 0 FROM srcs
  UNION
  -- d < 32 matches bfs_hops(max_iter=32) exactly: both sides settle
  -- distances up to 32; tests pin the fixture eccentricity well under
  -- the cap so both bounds are slack (test_bfs_fixture_eccentricity).
  SELECT e.v, w.d + 1 FROM walk w JOIN edges e ON e.u = w.u WHERE w.d < 32
)
SELECT u AS node, CAST(MIN(d) AS INT) AS hops
FROM walk GROUP BY u
""",
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest hop distance from every document to its cluster's
    CANONICAL node (the component-min survivor): multi-source
    level-synchronous frontier BFS (operators/components.bfs_hops -- one
    join + agg + anti-join shuffle per LEVEL, frontiers checkpointed),
    seeded from the connected-components survivors. The dedup
    diagnostic this answers: a variant 1 hop from its survivor is a
    direct near-duplicate; 2+ hops means it joined the cluster only
    transitively (the chaining radius curation thresholds control). The
    oracle recomputes components AND min-hops with recursive-CTE
    closures: the iterative algorithms and the set-theoretic definitions
    must agree on exact integers."""
    from ..operators.components import bfs_hops

    return bfs_hops(_lsh_pairs(spark, sf_dir))


def _kcore_oracle(k: int, rounds: int) -> str:
    """Unrolled-CTE twin of operators/components.kcore: each peel round
    (degree filter + endpoint semi-joins) chains as a CTE, like the BPE
    and PageRank unrolls. Peeling is idempotent at the fixpoint, so any
    unroll depth >= the true peel depth is exact; tests assert the
    fixture peels well inside ``rounds``."""
    head = f"""WITH {_SQL_LSH_CTES},
pairs AS ({_SQL_LSH_SELECT}),
e0 AS MATERIALIZED (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
)"""
    steps = []
    for i in range(1, rounds + 1):
        steps.append(f""",
k{i} AS MATERIALIZED (
  SELECT u FROM e{i - 1} GROUP BY u HAVING COUNT(*) >= {k}
),
e{i} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{i - 1} e
  JOIN k{i} ku ON ku.u = e.u
  JOIN k{i} kv ON kv.u = e.v
)""")
    tail = f"""
SELECT u AS node, CAST(COUNT(*) AS INT) AS core_deg
FROM e{rounds} GROUP BY u"""
    return head + "".join(steps) + tail


@query("graph_kcore", oracle=_kcore_oracle(k=3, rounds=8))
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the near-dup pair graph: iteratively peel nodes of
    degree < 3 until the fixpoint, keeping only the densely-duplicated
    families (a chain of borderline pairwise matches peels away; a
    clique of true variants survives with its in-core degree). The
    oracle unrolls the peel as 8 chained CTEs -- peeling is idempotent
    at the fixpoint, so the unroll is exact once deep enough, which the
    pytest fixpoint-depth assertion pins."""
    from ..operators.components import kcore

    return kcore(_lsh_pairs(spark, sf_dir), k=3)
