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


@query(
    "er_fellegi_sunter",
    oracle="""
WITH names AS (
  SELECT p_name, MIN(p_partkey) AS master_id FROM part GROUP BY p_name
),
master AS (
  SELECT n.master_id, p.p_name AS m_name, p.p_brand AS m_brand,
         p.p_type AS m_type, p.p_size AS m_size
  FROM part p JOIN names n ON p.p_partkey = n.master_id
),
dirty AS (
  SELECT p.p_partkey AS dirty_id, n.master_id AS true_master_id,
         concat(substring(p.p_name, 1,
                  CAST((p.p_partkey * 7) % GREATEST(length(p.p_name), 1) AS INT)),
                substring(p.p_name,
                  CAST((p.p_partkey * 7) % GREATEST(length(p.p_name), 1) AS INT) + 2))
           AS d_name,
         CASE WHEN p.p_partkey % 7 = 0 THEN concat('X', p.p_brand)
              ELSE p.p_brand END AS d_brand,
         p.p_type AS d_type,
         CASE WHEN p.p_partkey % 5 = 0 THEN p.p_size + 1
              ELSE p.p_size END AS d_size
  FROM part p JOIN names n ON p.p_name = n.p_name
),
cand AS (
  SELECT DISTINCT d.dirty_id, d.true_master_id,
                  d.d_name, d.d_brand, d.d_type, d.d_size,
                  m.master_id, m.m_name, m.m_brand, m.m_type, m.m_size
  FROM dirty d JOIN master m
    ON substring(d.d_name, 1, 2) = substring(m.m_name, 1, 2)
  UNION
  SELECT DISTINCT d.dirty_id, d.true_master_id,
                  d.d_name, d.d_brand, d.d_type, d.d_size,
                  m.master_id, m.m_name, m.m_brand, m.m_type, m.m_size
  FROM dirty d JOIN master m
    ON right(d.d_name, 2) = right(m.m_name, 2)
),
agrees AS (
  SELECT dirty_id, master_id,
         CASE WHEN levenshtein(d_name, m_name) <= 1 THEN 1 ELSE 0 END AS a_name,
         CASE WHEN d_brand = m_brand THEN 1 ELSE 0 END AS a_brand,
         CASE WHEN d_type = m_type THEN 1 ELSE 0 END AS a_type,
         CASE WHEN d_size = m_size THEN 1 ELSE 0 END AS a_size,
         CASE WHEN master_id = true_master_id THEN 1 ELSE 0 END AS is_match
  FROM cand
),
params AS (
  SELECT SUM(is_match) AS nm, SUM(1 - is_match) AS nu,
         SUM(CASE WHEN is_match = 1 THEN a_name ELSE 0 END) AS am_name,
         SUM(CASE WHEN is_match = 0 THEN a_name ELSE 0 END) AS au_name,
         SUM(CASE WHEN is_match = 1 THEN a_brand ELSE 0 END) AS am_brand,
         SUM(CASE WHEN is_match = 0 THEN a_brand ELSE 0 END) AS au_brand,
         SUM(CASE WHEN is_match = 1 THEN a_type ELSE 0 END) AS am_type,
         SUM(CASE WHEN is_match = 0 THEN a_type ELSE 0 END) AS au_type,
         SUM(CASE WHEN is_match = 1 THEN a_size ELSE 0 END) AS am_size,
         SUM(CASE WHEN is_match = 0 THEN a_size ELSE 0 END) AS au_size
  FROM agrees
),
scored AS (
  SELECT a.is_match,
    CAST(ROUND(ln(CASE WHEN a_name = 1
        THEN CAST((am_name + 1) * (nu + 2) AS DOUBLE)
             / CAST((au_name + 1) * (nm + 2) AS DOUBLE)
        ELSE CAST((nm + 1 - am_name) * (nu + 2) AS DOUBLE)
             / CAST((nu + 1 - au_name) * (nm + 2) AS DOUBLE) END), 9)
      AS DECIMAL(18,9))
    + CAST(ROUND(ln(CASE WHEN a_brand = 1
        THEN CAST((am_brand + 1) * (nu + 2) AS DOUBLE)
             / CAST((au_brand + 1) * (nm + 2) AS DOUBLE)
        ELSE CAST((nm + 1 - am_brand) * (nu + 2) AS DOUBLE)
             / CAST((nu + 1 - au_brand) * (nm + 2) AS DOUBLE) END), 9)
      AS DECIMAL(18,9))
    + CAST(ROUND(ln(CASE WHEN a_type = 1
        THEN CAST((am_type + 1) * (nu + 2) AS DOUBLE)
             / CAST((au_type + 1) * (nm + 2) AS DOUBLE)
        ELSE CAST((nm + 1 - am_type) * (nu + 2) AS DOUBLE)
             / CAST((nu + 1 - au_type) * (nm + 2) AS DOUBLE) END), 9)
      AS DECIMAL(18,9))
    + CAST(ROUND(ln(CASE WHEN a_size = 1
        THEN CAST((am_size + 1) * (nu + 2) AS DOUBLE)
             / CAST((au_size + 1) * (nm + 2) AS DOUBLE)
        ELSE CAST((nm + 1 - am_size) * (nu + 2) AS DOUBLE)
             / CAST((nu + 1 - au_size) * (nm + 2) AS DOUBLE) END), 9)
      AS DECIMAL(18,9)) AS s
  FROM agrees a CROSS JOIN params
)
SELECT CASE WHEN s >= 2.0 THEN 'link'
            WHEN s <= -2.0 THEN 'non-link'
            ELSE 'possible' END AS decision,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(is_match) AS BIGINT) AS n_true_matches,
       ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS mean_score,
       ROUND(CAST(MIN(s) AS DOUBLE), 6) AS min_score,
       ROUND(CAST(MAX(s) AS DOUBLE), 6) AS max_score
FROM scored
GROUP BY 1
""",
)
def er_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (the 1969 decision
    model Splink/JedAI implement) over the same blocked candidate pairs
    the fuzzy matcher generates: each pair gets a log-likelihood-ratio
    score sum_f ln(P(gamma_f | match) / P(gamma_f | non-match)) over
    four field comparators (name within edit distance 1; brand / type /
    size equality), and the classic three-way decision -- link /
    possible / non-link -- falls out of two thresholds on the score.
    The master is the DISTINCT-NAME dimension (representative = min-key
    record per name, the er_fuzzy_match_master convention), so candidate
    volume is dirty x masters-per-block, never part x part. The m/u
    parameters are estimated FROM THE DATA: each dirty record's true
    master is its pre-typo name's representative (the planted corruption
    is name-deletion always, brand on key%7, size on key%5), which
    labels every candidate pair; add-1-smoothed agreement rates over
    match vs non-match pairs give exact-integer m/u ratios -- the
    supervised special case of the EM fit production linkers run.

    Exactness: every weight is one libm ln over an exact integer ratio
    (PMI convention), 9dp-DECIMAL-quantized; the pair score is a decimal
    sum of four such weights, so the decision boundaries and the
    per-class decimal statistics are bit-identical cross-engine. Plan:
    broadcast blocked joins (never dirty x master), ONE aggregate for
    all eight m/u counters, a 1-row params crossJoin, one final
    per-decision aggregate. At 100 TB the params table is still one
    row; everything corpus-sized moves through the two blocking
    equi-joins the fuzzy matcher already pays."""
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.min("p_partkey").alias("master_id"))
    master = part.join(
        F.broadcast(names.select("master_id")),
        part["p_partkey"] == F.col("master_id"),
    ).select(
        "master_id",
        F.col("p_name").alias("m_name"),
        F.col("p_brand").alias("m_brand"),
        F.col("p_type").alias("m_type"),
        F.col("p_size").alias("m_size"),
    )
    pos = "(p_partkey * 7) % greatest(length(p_name), 1)"
    dirty = part.join(F.broadcast(names), "p_name").select(
        F.col("p_partkey").alias("dirty_id"),
        F.col("master_id").alias("true_master_id"),
        F.concat(
            F.expr(f"substring(p_name, 1, {pos})"),
            F.expr(f"substring(p_name, {pos} + 2)"),
        ).alias("d_name"),
        F.when(F.col("p_partkey") % 7 == 0, F.concat(F.lit("X"), F.col("p_brand")))
        .otherwise(F.col("p_brand"))
        .alias("d_brand"),
        F.col("p_type").alias("d_type"),
        F.when(F.col("p_partkey") % 5 == 0, F.col("p_size") + 1)
        .otherwise(F.col("p_size"))
        .alias("d_size"),
    )
    m = F.broadcast(master)
    by_prefix = dirty.join(
        m, F.substring("d_name", 1, 2) == F.substring("m_name", 1, 2)
    )
    by_suffix = dirty.join(
        m, F.expr("right(d_name, 2)") == F.expr("right(m_name, 2)")
    )
    cand = by_prefix.unionByName(by_suffix).distinct()
    agrees = cand.select(
        "dirty_id",
        "master_id",
        F.when(F.levenshtein("d_name", "m_name") <= 1, 1).otherwise(0).alias("a_name"),
        F.when(F.col("d_brand") == F.col("m_brand"), 1).otherwise(0).alias("a_brand"),
        F.when(F.col("d_type") == F.col("m_type"), 1).otherwise(0).alias("a_type"),
        F.when(F.col("d_size") == F.col("m_size"), 1).otherwise(0).alias("a_size"),
        F.when(F.col("master_id") == F.col("true_master_id"), 1)
        .otherwise(0)
        .alias("is_match"),
    )
    fields = ["name", "brand", "type", "size"]
    params = agrees.agg(
        F.sum("is_match").alias("nm"),
        F.sum(1 - F.col("is_match")).alias("nu"),
        *[
            F.sum(F.when(F.col("is_match") == 1, F.col(f"a_{f}")).otherwise(0)).alias(
                f"am_{f}"
            )
            for f in fields
        ],
        *[
            F.sum(F.when(F.col("is_match") == 0, F.col(f"a_{f}")).otherwise(0)).alias(
                f"au_{f}"
            )
            for f in fields
        ],
    )

    def weight(f: str):
        agree_ratio = (
            ((F.col(f"am_{f}") + 1) * (F.col("nu") + 2)).cast("double")
            / ((F.col(f"au_{f}") + 1) * (F.col("nm") + 2)).cast("double")
        )
        disagree_ratio = (
            ((F.col("nm") + 1 - F.col(f"am_{f}")) * (F.col("nu") + 2)).cast("double")
            / ((F.col("nu") + 1 - F.col(f"au_{f}")) * (F.col("nm") + 2)).cast("double")
        )
        return (
            F.round(
                F.log(
                    F.when(F.col(f"a_{f}") == 1, agree_ratio).otherwise(
                        disagree_ratio
                    )
                ),
                9,
            )
        ).cast("decimal(18,9)")

    scored = agrees.crossJoin(F.broadcast(params)).select(
        "is_match",
        (weight("name") + weight("brand") + weight("type") + weight("size")).alias(
            "s"
        ),
    )
    return (
        scored.withColumn(
            "decision",
            F.when(F.col("s") >= 2.0, "link")
            .when(F.col("s") <= -2.0, "non-link")
            .otherwise("possible"),
        )
        .groupBy("decision")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("is_match").cast("bigint").alias("n_true_matches"),
            F.round(F.sum("s").cast("double") / F.count("*"), 6).alias("mean_score"),
            F.round(F.min("s").cast("double"), 6).alias("min_score"),
            F.round(F.max("s").cast("double"), 6).alias("max_score"),
        )
    )
