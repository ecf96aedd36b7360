"""Entity resolution: fuzzy matching of dirty records to a master table.

The reference pipeline trusts Gmail's sender strings verbatim
(etl_service/main.py:154-168 stores the raw ``From`` header); a
production warehouse dedupes those dirty identities against a master
dimension. This module implements the canonical ER shape Spark-first:

  candidate generation  ->  capped deletion-1 neighborhood equi-join
                            (operators/er_blocking.py, SymSpell-style;
                            never a cartesian compare-all)
  verification          ->  edit-distance predicate (JVM codegen'd
                            ``levenshtein``; Spark's impl takes a
                            threshold for banded early-exit)
  survivorship          ->  per-record argmin window (best match wins,
                            total-order tiebreaker)

Blocking-recall guarantee (by construction, any name length): a dirty
string produced by deleting one character from a master IS a member of
that master's deletion-1 neighborhood, so the single equi-join on the
exact variant string always generates the true candidate -- unless its
variant block exceeds the audited ``max_block`` cap (the exclusion is
reported, never silent; see operators/er_blocking.py). This replaces
the r7 2-char prefix/suffix blocks: their key space is bounded by the
name vocabulary, so blocks went quadratic with the corpus (8.01x wall
at 10x data, SCALE_r07), where the neighborhood index is O(masters x
len) rows and candidate volume O(dirty).

100 TB posture: candidate generation is ONE hash equi-join on the
variant string (shuffle both sides, AQE broadcasts when the index is
small); the argmin is one window over dirty_id (a single hash
partition exchange). Never O(dirty x master).
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
variants AS (
  SELECT master_id, master_name,
         unnest(list_distinct(list_append(
           list_transform(range(0, length(master_name)),
             i -> concat(substring(master_name, 1, CAST(i AS INT)),
                         substring(master_name, CAST(i AS INT) + 2))),
           master_name))) AS v
  FROM master
),
capped AS (
  SELECT master_id, master_name, v FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY v) AS blk FROM variants
  ) WHERE blk <= 64
),
cand AS (
  SELECT DISTINCT d.dirty_id, d.dirty_name, m.master_id, m.master_name
  FROM dirty d JOIN capped m ON d.dirty_name = m.v
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
    distinct-name master via the capped deletion-1 neighborhood index
    (operators/er_blocking.py -- SymSpell candidate generation: ONE
    equi-join on the exact variant string, recall guaranteed by
    construction for the one-deletion typo, block-size cap 64 with the
    audited-exclusion contract), a ``levenshtein <= 2`` verify, and a
    best-match argmin per dirty record (distance, then master_id).

    Replaces the r7 fixed 2-char prefix/suffix blocks, whose key space
    the corpus outgrows (measured 8.01x wall at 10x data, SCALE_r07):
    the neighborhood index is O(masters x len) rows and candidate
    volume is O(dirty), both linear."""
    from ..operators.er_blocking import deletion1_candidates

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
    cand = deletion1_candidates(
        dirty,
        master,
        dirty_name_col="dirty_name",
        master_name_col="master_name",
        dirty_id_col="dirty_id",
        master_id_col="master_id",
        max_block=64,
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
variants AS (
  SELECT master_id, m_name, m_brand, m_type, m_size,
         unnest(list_distinct(list_append(
           list_transform(range(0, length(m_name)),
             i -> concat(substring(m_name, 1, CAST(i AS INT)),
                         substring(m_name, CAST(i AS INT) + 2))),
           m_name))) AS v
  FROM master
),
capped AS (
  SELECT master_id, m_name, m_brand, m_type, m_size, v FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY v) AS blk FROM variants
  ) WHERE blk <= 64
),
cand AS (
  SELECT DISTINCT d.dirty_id, d.true_master_id,
                  d.d_name, d.d_brand, d.d_type, d.d_size,
                  m.master_id, m.m_name, m.m_brand, m.m_type, m.m_size
  FROM dirty d JOIN capped m ON d.d_name = m.v
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
truth AS (
  SELECT CASE WHEN levenshtein(d.d_name, m.m_name) <= 1 THEN 1 ELSE 0 END AS a_name,
         CASE WHEN d.d_brand = m.m_brand THEN 1 ELSE 0 END AS a_brand,
         CASE WHEN d.d_type = m.m_type THEN 1 ELSE 0 END AS a_type,
         CASE WHEN d.d_size = m.m_size THEN 1 ELSE 0 END AS a_size
  FROM dirty d JOIN master m ON m.master_id = d.true_master_id
),
nmc AS (SELECT GREATEST(COUNT(*), 1) AS b FROM master),
smpl AS (
  SELECT CASE WHEN levenshtein(d.d_name, m.m_name) <= 1 THEN 1 ELSE 0 END AS a_name,
         CASE WHEN d.d_brand = m.m_brand THEN 1 ELSE 0 END AS a_brand,
         CASE WHEN d.d_type = m.m_type THEN 1 ELSE 0 END AS a_type,
         CASE WHEN d.d_size = m.m_size THEN 1 ELSE 0 END AS a_size,
         CASE WHEN m.master_id = d.true_master_id THEN 1 ELSE 0 END AS is_match
  FROM dirty d CROSS JOIN nmc JOIN master m
    ON CAST(('0x' || substring(md5('u' || CAST(d.dirty_id AS VARCHAR)), 1, 8)) AS BIGINT) % nmc.b
     = CAST(('0x' || substring(md5('v' || CAST(m.master_id AS VARCHAR)), 1, 8)) AS BIGINT) % nmc.b
),
mstats AS (
  SELECT COUNT(*) AS nm, SUM(a_name) AS am_name, SUM(a_brand) AS am_brand,
         SUM(a_type) AS am_type, SUM(a_size) AS am_size
  FROM truth
),
ustats AS (
  SELECT COUNT(*) AS nu, SUM(a_name) AS au_name, SUM(a_brand) AS au_brand,
         SUM(a_type) AS au_type, SUM(a_size) AS au_size
  FROM smpl
),
params AS (SELECT * FROM mstats CROSS JOIN ustats),
pairs AS (
  SELECT 'candidate' AS origin, is_match, a_name, a_brand, a_type, a_size
  FROM agrees
  UNION ALL
  SELECT 'sample', is_match, a_name, a_brand, a_type, a_size FROM smpl
),
scored AS (
  SELECT a.origin, a.is_match,
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
  FROM pairs a CROSS JOIN params
)
SELECT origin,
       CASE WHEN s >= 2.0 THEN 'link'
            WHEN s <= -2.0 THEN 'non-link'
            ELSE 'possible' END AS decision,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(is_match) AS BIGINT) AS n_true_matches,
       ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS mean_score,
       ROUND(CAST(MIN(s) AS DOUBLE), 6) AS min_score,
       ROUND(CAST(MAX(s) AS DOUBLE), 6) AS max_score
FROM scored
GROUP BY 1, 2
""",
)
def er_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (the 1969 decision
    model Splink/JedAI implement) over the same deletion-1-neighborhood
    candidate pairs the fuzzy matcher generates (operators/er_blocking.py
    -- replaces the r7 2-char prefix/suffix blocks whose fixed key space
    measured 8.01x wall at 10x data): each candidate pair gets a
    log-likelihood-ratio score sum_f ln(P(gamma_f | match) /
    P(gamma_f | non-match)) over four field comparators (name within
    edit distance 1; brand / type / size equality), and the classic
    three-way decision -- link / possible / non-link -- falls out of two
    thresholds on the score. The master is the DISTINCT-NAME dimension
    (representative = min-key record per name, the er_fuzzy_match_master
    convention).

    The m/u parameters follow Splink's estimation split, each side
    LINEAR in the corpus: m (agreement rates among matches) from the
    LABELED true pairs -- each dirty record's true master is its
    pre-typo name's representative (the planted corruption is
    name-deletion always, brand on key%7, size on key%5), one equi-join
    on true_master_id; u (agreement rates among non-matches) from a
    DETERMINISTIC pseudo-random pair sample -- dirty and master rows
    pair where their 32-bit md5 hashes agree mod n_masters, giving
    ~n_dirty uniformly-random pairs (Splink's
    estimate_u_using_random_sampling, made engine-portable) -- never
    from dense blocks.

    Exactness: every weight is one libm ln over an exact integer ratio
    (PMI convention), 9dp-DECIMAL-quantized; the pair score is a decimal
    sum of four such weights, so the decision boundaries and the
    per-class decimal statistics are bit-identical cross-engine. Plan:
    the neighborhood equi-join (O(dirty) candidates), two O(n) param
    equi-joins feeding TWO 1-row aggregates, a 1-row params crossJoin,
    one final per-decision aggregate. At 100 TB the params table is
    still one row; everything corpus-sized moves through hash
    equi-joins with the audited block cap."""
    from ..operators.er_blocking import deletion1_candidates

    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.min("p_partkey").alias("master_id"))
    # no broadcast HINT on names: it is a distinct over part, so it
    # GROWS with SF (64 names at sf0.1 -> 640 at sf1 in the fixtures).
    # Under the size-picked threshold it still broadcasts at bench
    # scales, but at 100 TB the optimizer can fall back to a shuffle
    # join instead of OOMing the driver on a forced hint.
    master = part.join(
        names.select("master_id"),
        part["p_partkey"] == F.col("master_id"),
    ).select(
        "master_id",
        F.col("p_name").alias("m_name"),
        F.col("p_brand").alias("m_brand"),
        F.col("p_type").alias("m_type"),
        F.col("p_size").alias("m_size"),
    )
    pos = "(p_partkey * 7) % greatest(length(p_name), 1)"
    dirty = part.join(names, "p_name").select(
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
    cand = deletion1_candidates(
        dirty,
        master,
        dirty_name_col="d_name",
        master_name_col="m_name",
        dirty_id_col="dirty_id",
        master_id_col="master_id",
        max_block=64,
    )

    def comparators(df: DataFrame) -> DataFrame:
        return df.select(
            *[c for c in ("dirty_id", "master_id") if c in df.columns],
            F.when(F.levenshtein("d_name", "m_name") <= 1, 1)
            .otherwise(0)
            .alias("a_name"),
            F.when(F.col("d_brand") == F.col("m_brand"), 1)
            .otherwise(0)
            .alias("a_brand"),
            F.when(F.col("d_type") == F.col("m_type"), 1)
            .otherwise(0)
            .alias("a_type"),
            F.when(F.col("d_size") == F.col("m_size"), 1)
            .otherwise(0)
            .alias("a_size"),
            *(
                [
                    F.when(F.col("master_id") == F.col("true_master_id"), 1)
                    .otherwise(0)
                    .alias("is_match")
                ]
                if "true_master_id" in df.columns
                else []
            ),
        )

    agrees = comparators(cand)
    fields = ["name", "brand", "type", "size"]
    # m-params: agreement rates among LABELED true pairs (one equi-join)
    truth = comparators(
        dirty.join(master, F.col("master_id") == F.col("true_master_id"))
    )
    mstats = truth.agg(
        F.count("*").alias("nm"),
        *[F.sum(f"a_{f}").alias(f"am_{f}") for f in fields],
    )
    # u-params: agreement rates among a deterministic pseudo-random pair
    # sample -- dirty x master where 32-bit md5 hashes agree mod
    # n_masters (~n_dirty expected pairs, uniform over masters). The
    # modulus is an O(1) DRIVER SCALAR, not a column: a join key
    # referencing the other side's column can't hash-partition, and
    # Spark degrades to a nested-loop over dirty x master (measured
    # 3.4x at 10x with the column form); with a literal modulus each
    # side computes its own key map-side and the join is a plain
    # shuffle hash join. max(.,1) guards the empty-master modulus
    # under ANSI.
    b = max(master.count(), 1)
    dh = F.conv(
        F.substring(F.md5(F.concat(F.lit("u"), F.col("dirty_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    mh = F.conv(
        F.substring(F.md5(F.concat(F.lit("v"), F.col("master_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    smpl = comparators(
        dirty.join(master, F.pmod(dh, F.lit(b)) == F.pmod(mh, F.lit(b)))
    )
    ustats = smpl.agg(
        F.count("*").alias("nu"),
        *[F.sum(f"a_{f}").alias(f"au_{f}") for f in fields],
    )
    params = mstats.crossJoin(ustats)

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

    # score the candidates AND the control sample (labeled by origin):
    # the sample rows put the score distribution's non-match side on the
    # output -- the threshold-validation view linkers report
    keep = ["origin", "is_match", "a_name", "a_brand", "a_type", "a_size"]
    pairs = agrees.withColumn("origin", F.lit("candidate")).select(
        *keep
    ).unionByName(smpl.withColumn("origin", F.lit("sample")).select(*keep))
    scored = pairs.crossJoin(F.broadcast(params)).select(
        "origin",
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
        .groupBy("origin", "decision")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("is_match").cast("bigint").alias("n_true_matches"),
            F.round(F.sum("s").cast("double") / F.count("*"), 6).alias("mean_score"),
            F.round(F.min("s").cast("double"), 6).alias("min_score"),
            F.round(F.max("s").cast("double"), 6).alias("max_score"),
        )
    )
