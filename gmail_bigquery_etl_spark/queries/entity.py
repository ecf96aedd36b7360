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


def _er_eval_oracle() -> str:
    """Composes the registered er_fuzzy_match_master oracle as a CTE (the
    same reuse pattern as the ANN recall scoreboard), so the evaluated
    matcher is definitionally the gated one."""
    from .registry import ALL_ORACLES

    return f"""
WITH matched AS ({ALL_ORACLES['er_fuzzy_match_master']}),
truth AS (
  SELECT p_partkey AS dirty_id, p_name AS true_name FROM part
),
joined AS (
  SELECT t.dirty_id, m.master_name,
         CASE WHEN m.master_name = t.true_name THEN 1 ELSE 0 END AS correct
  FROM truth t LEFT JOIN matched m ON m.dirty_id = t.dirty_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_dirty,
       CAST(COUNT(master_name) AS BIGINT) AS n_matched,
       CAST(SUM(correct) AS BIGINT) AS n_correct,
       ROUND(CAST(SUM(correct) AS DOUBLE)
             / NULLIF(COUNT(master_name), 0), 6) AS precision,
       ROUND(CAST(SUM(correct) AS DOUBLE) / COUNT(*), 6) AS recall
FROM joined
"""


@query("er_quality_eval", oracle=_er_eval_oracle())
def er_quality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution quality harness: because the dirty names are
    SYNTHESIZED from the master (one deterministic character deletion),
    ground truth is known exactly -- every dirty record's true master is
    its source name's group. This scores the gated matcher against that
    truth: n_matched (coverage), n_correct (the argmin survivor landed
    on the true master), precision over matches, recall over all dirty
    records -- the eval-harness sibling of text_langid_eval, and the
    number a blocking/threshold change must not silently regress. The
    blocking lemma guarantees the true candidate is always generated;
    imperfection comes only from verify-threshold collisions (a
    different master within levenshtein 2 winning the argmin) -- so this
    also measures collision density of the name space. Composes the
    registered query on the Spark side and its registered oracle SQL on
    the DuckDB side (the ANN-scoreboard reuse pattern)."""
    part = load_table(spark, sf_dir, "part")
    truth = part.select(
        F.col("p_partkey").alias("dirty_id"),
        F.col("p_name").alias("true_name"),
    )
    matched = er_fuzzy_match_master(spark, sf_dir).select(
        "dirty_id", "master_name"
    )
    joined = truth.join(matched, "dirty_id", "left").select(
        "master_name",
        F.when(F.col("master_name") == F.col("true_name"), 1)
        .otherwise(0)
        .alias("correct"),
    )
    return joined.agg(
        F.count("*").cast("bigint").alias("n_dirty"),
        F.count("master_name").cast("bigint").alias("n_matched"),
        F.sum("correct").cast("bigint").alias("n_correct"),
        F.round(
            F.sum("correct").cast("double")
            / F.nullif(F.count("master_name"), F.lit(0)),
            6,
        ).alias("precision"),
        F.round(
            F.sum("correct").cast("double") / F.count("*"), 6
        ).alias("recall"),
    )
