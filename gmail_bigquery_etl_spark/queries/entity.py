"""Entity resolution: fuzzy matching of dirty records to a master table.

The reference pipeline trusts Gmail's sender strings verbatim
(etl_service/main.py:154-168 stores the raw ``From`` header); a
production warehouse dedupes those dirty identities against a master
dimension. This module implements the canonical ER shape Spark-first:

  candidate generation  ->  union of cheap BLOCKING equi-joins
                            (never a cartesian compare-all)
  verification          ->  edit-distance predicate (JVM codegen'd
                            ``levenshtein``; Spark's impl takes a
                            threshold for banded early-exit)
  survivorship          ->  per-record argmin window (best match wins,
                            total-order tiebreaker)

Blocking-recall guarantee (documented, not hoped): a single-character
deletion at position p changes the 2-char prefix only if p < 2 and the
2-char suffix only if p >= len-2; for names of length >= 5 those sets
are disjoint, so EVERY single-deletion typo shares at least one of the
two blocking keys with its source -- the union join provably generates
the true match as a candidate. Multi-edit typos would add more keys
(q-gram blocks, the dedup family's posting-list scaffold); the shape
stays a union of equi-joins.

100 TB posture: the master dimension is small (distinct canonical
names) -> broadcast on both blocking joins, so candidate generation is
map-side with zero shuffle of the dirty side; the argmin is one window
over dirty_id (a single hash partition exchange). Never O(dirty x
master).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from .registry import query


@query(
    "er_fuzzy_match_master",
    oracle="""
WITH master AS (
  SELECT p_name AS master_name, MIN(p_partkey) AS master_id
  FROM part GROUP BY p_name
),
dirty AS (
  SELECT p_partkey AS dirty_id,
         concat(substring(p_name, 1,
                  CAST((p_partkey * 7) % GREATEST(length(p_name), 1) AS INT)),
                substring(p_name,
                  CAST((p_partkey * 7) % GREATEST(length(p_name), 1) AS INT) + 2))
           AS dirty_name
  FROM part
),
cand AS (
  SELECT DISTINCT d.dirty_id, d.dirty_name, m.master_id, m.master_name
  FROM dirty d JOIN master m
    ON substring(d.dirty_name, 1, 2) = substring(m.master_name, 1, 2)
  UNION
  SELECT DISTINCT d.dirty_id, d.dirty_name, m.master_id, m.master_name
  FROM dirty d JOIN master m
    ON right(d.dirty_name, 2) = right(m.master_name, 2)
),
verified AS (
  SELECT *, levenshtein(dirty_name, master_name) AS dist
  FROM cand
  WHERE levenshtein(dirty_name, master_name) <= 2
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY dirty_id ORDER BY dist, master_id) AS rn
  FROM verified
)
SELECT dirty_id, dirty_name, master_id, master_name, CAST(dist AS INT) AS dist
FROM ranked WHERE rn = 1
""",
)
def er_fuzzy_match_master(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution against a master dimension: every part
    record gets a deterministic single-character-deletion typo (position
    ``(key*7) % len``), and the dirty names are matched back to the
    distinct-name master via blocked candidate generation (prefix-2 and
    suffix-2 equi-joins, union -- provably complete for one deletion,
    see module docstring), a ``levenshtein <= 2`` verify, and a
    best-match argmin per dirty record (distance, then master_id)."""
    part = load_table(spark, sf_dir, "part")
    master = part.groupBy(F.col("p_name").alias("master_name")).agg(
        F.min("p_partkey").alias("master_id")
    )
    # greatest(length, 1) guards an empty-string p_name: % 0 throws
    # under ANSI on both engines; with the guard an empty name maps to
    # an empty dirty_name on both sides.
    pos = "(p_partkey * 7) % greatest(length(p_name), 1)"
    dirty = part.select(
        F.col("p_partkey").alias("dirty_id"),
        F.concat(
            F.expr(f"substring(p_name, 1, {pos})"),
            F.expr(f"substring(p_name, {pos} + 2)"),
        ).alias("dirty_name"),
    )
    m = F.broadcast(master)
    by_prefix = dirty.join(
        m, F.substring("dirty_name", 1, 2) == F.substring("master_name", 1, 2)
    )
    by_suffix = dirty.join(
        m,
        F.expr("right(dirty_name, 2)") == F.expr("right(master_name, 2)"),
    )
    cand = by_prefix.unionByName(by_suffix).dropDuplicates(
        ["dirty_id", "master_id"]
    )
    verified = cand.withColumn(
        "dist", F.levenshtein("dirty_name", "master_name")
    ).where(F.col("dist") <= 2)
    w = Window.partitionBy("dirty_id").orderBy("dist", "master_id")
    return (
        verified.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "dirty_id",
            "dirty_name",
            "master_id",
            "master_name",
            F.col("dist").cast("int").alias("dist"),
        )
    )
