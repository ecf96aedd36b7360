"""Ranked text retrieval: BM25 over a distributed inverted index.

The reference's only search surface is BigQuery string predicates over
the mined email table (survey §2.2 T1/T3); a corpus engine needs RANKED
retrieval. This module implements BM25 (the Robertson/Spärck Jones
probabilistic ranking function, the default scorer in Lucene/Elastic)
Spark-first:

  inverted index   ->  (term, doc, tf) groupBy aggregates -- the same
                       distributed posting lists the dedup family joins
  query matching   ->  posting-list equi-join on term (never doc x doc,
                       never a collected vocabulary)
  scoring          ->  per-term BM25 partials quantized to DECIMAL(18,8)
                       so the per-(query,doc) SUM is associative/exact
                       (the repo-wide float-determinism contract), libm
                       ln rounded only at the very end
  top-k            ->  per-query window rank with total-order tiebreaker

100 TB posture: corpus statistics (N, avgdl) ride as a 1-row broadcast,
document frequencies as a term-keyed join -- nothing driver-side; the
candidate set is bounded by |query terms| x posting length, the
classic inverted-index retrieval cost, and skew on stop-word postings
is the same df-cap story the dedup family measures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table, spread
from .registry import query

_K1 = "1.2"
_B = "0.75"


@query(
    "text_bm25_topk",
    oracle=f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS cnt FROM tok
  WHERE term <> '' GROUP BY doc_id, term
),
dlen AS (SELECT doc_id, SUM(cnt) AS n_tok FROM tf GROUP BY doc_id),
df AS (SELECT term, COUNT(*) AS n_docs FROM tf GROUP BY term),
stats AS (
  SELECT COUNT(*) AS n_total,
         CAST(SUM(n_tok) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dlen
),
qterms AS (
  SELECT doc_id AS query_id, term FROM (
    SELECT doc_id, term,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY cnt DESC, term) AS rnk
    FROM tf WHERE doc_id % 100 = 0
  ) WHERE rnk <= 3
),
partials AS (
  SELECT q.query_id, tf.doc_id,
         CAST(ROUND(
           ln(1.0 + (stats.n_total - df.n_docs + 0.5) / (df.n_docs + 0.5))
             * (tf.cnt * ({_K1} + 1.0))
             / (tf.cnt + {_K1} * (1.0 - {_B} + {_B} * dlen.n_tok / stats.avgdl)),
           8) AS DECIMAL(18, 8)) AS part
  FROM qterms q
  JOIN tf ON tf.term = q.term AND tf.doc_id <> q.query_id
  JOIN dlen ON dlen.doc_id = tf.doc_id
  JOIN df ON df.term = q.term
  CROSS JOIN stats
),
scored AS (
  SELECT query_id, doc_id, SUM(part) AS score
  FROM partials GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rnk
  FROM scored
)
SELECT query_id, doc_id, ROUND(CAST(score AS DOUBLE), 6) AS score,
       CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 10
""",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-by-example BM25: every 100th document acts as a query (its
    top-3 terms by tf, tiebroken lexically), retrieval runs over the
    distributed inverted index, and each query returns its 10 best
    documents (k1=1.2, b=0.75, Lucene-style idf = ln(1 + (N-df+.5)/(df+.5)))
    -- self-matches excluded. Per-term partials are quantized to
    DECIMAL(18,8) BEFORE the per-document sum so ranking compares exact
    decimals, never float-accumulation noise."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    from ..functions.text import whitespace_tokens

    tok = docs.where(
        F.col("text").isNotNull() & (F.col("text") != "")
    ).select("doc_id", F.explode(whitespace_tokens("text")).alias("term"))
    # tf has FOUR lineage consumers (dlen, dfreq, qterms, the posting
    # join); pinned with a lazy localCheckpoint so the tokenize/explode/
    # count pipeline runs once instead of once per consumer (A/B
    # measured sf0.1 warm: 3.45 -> 2.33 s; at scale the pin is the
    # materialized inverted index every consumer reads). Storage note
    # (ADVICE r11): each invocation checkpoints a fresh RDD that only
    # driver GC/ContextCleaner reclaims, and checkpointed partitions are
    # not recomputable on executor loss -- both acceptable for a
    # DETERMINISTIC derived frame (recovery = rerun the query); a
    # long-lived production pipeline would persist+unpersist or write
    # the index out instead.
    tf = (
        tok.where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    dlen = tf.groupBy("doc_id").agg(F.sum("cnt").alias("n_tok"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("n_docs"))
    stats = dlen.agg(
        F.count("*").alias("n_total"),
        (F.sum("n_tok").cast("double") / F.count("*")).alias("avgdl"),
    )
    wq = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("term"))
    qterms = (
        tf.where(F.col("doc_id") % 100 == 0)
        .withColumn("rnk", F.row_number().over(wq))
        .where(F.col("rnk") <= 3)
        .select(F.col("doc_id").alias("query_id"), "term")
    )
    partials = (
        qterms.join(tf, "term")
        .where(F.col("doc_id") != F.col("query_id"))
        .join(dlen, "doc_id")
        .join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.log(
                    1.0
                    + (F.col("n_total") - F.col("n_docs") + 0.5)
                    / (F.col("n_docs") + 0.5)
                )
                * (F.col("cnt") * F.expr(f"{_K1} + 1.0"))
                / (
                    F.col("cnt")
                    + F.expr(_K1)
                    * (
                        F.expr(f"1.0 - {_B}")
                        + F.expr(_B) * F.col("n_tok") / F.col("avgdl")
                    )
                ),
                8,
            )
            .cast("decimal(18,8)")
            .alias("part"),
        )
    )
    scored = partials.groupBy("query_id", "doc_id").agg(
        F.sum("part").alias("score")
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") <= 10)
        .select(
            "query_id",
            "doc_id",
            F.round(F.col("score").cast("double"), 6).alias("score"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def _hybrid_oracle() -> str:
    """Text leg = the registered BM25 oracle as a CTE; vector leg =
    knn-style exact cosine with the SAME query block (doc/vec ids share
    one id space in the fixtures); fusion = RRF, the ann_rrf_fusion
    formula."""
    from .registry import ALL_ORACLES
    from .similarity import _SQL_COSINE

    return f"""
WITH text_top AS (
  SELECT * FROM ({ALL_ORACLES['text_bm25_topk']}) WHERE query_id < 20000
),
q AS (
  SELECT vec_id AS query_id, embedding AS q_vec
  FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 20000
),
vscored AS (
  SELECT q.query_id, c.vec_id AS match_id,
         {_SQL_COSINE.format(a='q.q_vec', b='c.embedding')} AS score
  FROM embeddings c, q
  WHERE c.vec_id <> q.query_id
),
v_ranked AS (
  SELECT query_id, match_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC,
                            match_id) AS rnk
  FROM vscored
),
vec_top AS (SELECT query_id, match_id, rnk FROM v_ranked WHERE rnk <= 10),
fused AS (
  SELECT COALESCE(t.query_id, v.query_id) AS query_id,
         COALESCE(t.doc_id, v.match_id) AS match_id,
         COALESCE(1.0 / (60 + t.rnk), 0.0)
           + COALESCE(1.0 / (60 + v.rnk), 0.0) AS rrf
  FROM text_top t
  FULL JOIN vec_top v
    ON v.query_id = t.query_id AND v.match_id = t.doc_id
),
ranked AS (
  SELECT query_id, match_id, rrf,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf DESC,
                            match_id) AS rank
  FROM fused
)
SELECT query_id, match_id, CAST(rank AS INT) AS rank,
       ROUND(rrf, 6) AS rrf
FROM ranked WHERE rank <= 5
"""


@query("hybrid_retrieval_rrf", oracle=_hybrid_oracle())
def hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-MODAL hybrid retrieval -- the shape every modern RAG stack
    runs: the lexical ranker (BM25 over the distributed inverted index)
    and the dense ranker (exact embedding cosine) score the SAME query
    block (documents and embeddings share one id space in the
    fixtures; queries are every 100th id, matching the BM25 gate), and
    reciprocal-rank fusion merges the two top-10 lists score-free
    (RRF = sum 1/(60+rank), robust to the incomparable scales). Reuses
    the registered BM25 query on the Spark side and its registered
    oracle as a CTE on the DuckDB side (the scoreboard pattern), so the
    text leg cannot drift from its own gate; fusion is one full-outer
    join + re-rank window, exact small-rational doubles."""
    from ..operators.similarity import brute_force_topk
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    # FIXED eval-query block (every 100th id, ids < 20000 -- every id at
    # both gate scales, so gate answers are unchanged): a query set that
    # grew with the corpus made the brute-force dense leg O(n^2/100),
    # 3.27x at 10x in the r11 sweep; a real RAG eval set is
    # corpus-size-independent, and the bounded block also keeps the
    # leg's broadcast NLJ build side under the machine-checked cap at
    # ANY scale (it previously out-grew it past ~sf8).
    text_top = (
        text_bm25_topk(spark, sf_dir)
        .where(F.col("query_id") < 20000)
        .select(
            "query_id",
            F.col("doc_id").alias("match_id"),
            F.col("rnk").alias("t_rnk"),
        )
    )
    vec_top = brute_force_topk(
        emb,
        emb.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 20000)),
        k=10,
    ).select("query_id", "match_id", F.col("rank").alias("v_rnk"))
    fused = text_top.join(
        vec_top, ["query_id", "match_id"], "full_outer"
    ).select(
        "query_id",
        "match_id",
        (
            F.coalesce(1.0 / (60 + F.col("t_rnk")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("v_rnk")), F.lit(0.0))
        ).alias("rrf"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("match_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select(
            "query_id",
            "match_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("rrf", 6).alias("rrf"),
        )
    )


@query(
    "retrieval_quality_eval",
    oracle=f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS cnt FROM tok
  WHERE term <> '' GROUP BY doc_id, term
),
dlen AS (SELECT doc_id, SUM(cnt) AS n_tok FROM tf GROUP BY doc_id),
df AS (SELECT term, COUNT(*) AS n_docs FROM tf GROUP BY term),
stats AS (
  SELECT COUNT(*) AS n_total,
         CAST(SUM(n_tok) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dlen
),
qdocs AS (
  SELECT doc_id AS query_id, doc_id AS truth_id,
         lower(text) || ' near dup' AS qtext
  FROM documents
  WHERE doc_id % 25 = 0 AND text IS NOT NULL AND trim(text) <> ''
),
qtok AS (
  SELECT query_id, truth_id,
         unnest(regexp_split_to_array(trim(qtext), '\\s+')) AS term
  FROM qdocs
),
qtf AS (
  SELECT query_id, truth_id, term, COUNT(*) AS cnt FROM qtok
  WHERE term <> '' GROUP BY query_id, truth_id, term
),
qterms AS (
  SELECT query_id, truth_id, term FROM (
    SELECT query_id, truth_id, term,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cnt DESC, term) AS rnk
    FROM qtf
  ) WHERE rnk <= 3
),
partials AS (
  SELECT q.query_id, q.truth_id, tf.doc_id,
         CAST(ROUND(
           ln(1.0 + (stats.n_total - df.n_docs + 0.5) / (df.n_docs + 0.5))
             * (tf.cnt * ({_K1} + 1.0))
             / (tf.cnt + {_K1} * (1.0 - {_B} + {_B} * dlen.n_tok / stats.avgdl)),
           8) AS DECIMAL(18, 8)) AS part
  FROM qterms q
  JOIN tf ON tf.term = q.term
  JOIN dlen ON dlen.doc_id = tf.doc_id
  JOIN df ON df.term = q.term
  CROSS JOIN stats
),
scored AS (
  SELECT query_id, truth_id, doc_id, SUM(part) AS score
  FROM partials GROUP BY query_id, truth_id, doc_id
),
ranked AS (
  SELECT query_id, truth_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rnk
  FROM scored
),
hits AS (SELECT query_id, rnk FROM ranked WHERE doc_id = truth_id),
per_q AS (
  SELECT q.query_id,
         CAST(COALESCE(
           CASE WHEN h.rnk <= 10 THEN ROUND(1.0 / h.rnk, 6) END, 0)
           AS DECIMAL(18,6)) AS rr,
         CASE WHEN h.rnk <= 1 THEN 1 ELSE 0 END AS r1,
         CASE WHEN h.rnk <= 5 THEN 1 ELSE 0 END AS r5,
         CASE WHEN h.rnk <= 10 THEN 1 ELSE 0 END AS r10
  FROM qdocs q LEFT JOIN hits h ON h.query_id = q.query_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       ROUND(CAST(SUM(rr) AS DOUBLE) / COUNT(*), 6) AS mrr_at10,
       ROUND(CAST(SUM(COALESCE(r1, 0)) AS DOUBLE) / COUNT(*), 6) AS recall_at1,
       ROUND(CAST(SUM(COALESCE(r5, 0)) AS DOUBLE) / COUNT(*), 6) AS recall_at5,
       ROUND(CAST(SUM(COALESCE(r10, 0)) AS DOUBLE) / COUNT(*), 6) AS recall_at10
FROM per_q
""",
)
def retrieval_quality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval quality harness (the IR complement to er_quality_eval
    and the ANN recall scoreboard): every 25th document spawns a
    near-duplicate QUERY (its text + a ' near dup' tail -- the planted
    ground truth the dedup fixtures use), the query's top-3 tf terms
    retrieve over the SAME BM25 inverted index text_bm25_topk plans,
    and the planted source's rank yields MRR@10 and recall@1/5/10 in
    one row -- the numbers a search team actually tracks per index
    build. Self-retrieval is genuinely nontrivial here: the fixture's
    31-word vocabulary means every document shares the query's terms
    and only the tf/length profile separates the true source.

    Exactness: reciprocal ranks are exact integer reciprocals rounded
    to 6dp and DECIMAL-summed; recalls are integer-ratio divisions.
    Plan: the inverted-index build (two aggregates), a |queries x 3|
    posting join, one ranking window, one left join of queries to
    their hit ranks, one global aggregate -- query cost is bounded by
    posting lengths, never corpus x corpus."""
    from ..functions.text import whitespace_tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    base = docs.where(
        F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
    )
    tok = base.select(
        "doc_id", F.explode(whitespace_tokens("text")).alias("term")
    )
    # same pin as text_bm25_topk (incl. its storage/fault-tolerance
    # note): tf feeds dlen, dfreq, stats and the posting join -- one
    # materialization instead of four re-derivations
    tf = (
        tok.where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    dlen = tf.groupBy("doc_id").agg(F.sum("cnt").alias("n_tok"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("n_docs"))
    stats = dlen.agg(
        F.count("*").alias("n_total"),
        (F.sum("n_tok").cast("double") / F.count("*")).alias("avgdl"),
    )
    # truth_id == query_id by construction (each query is its own
    # planted source), so it is NOT carried through the posting join --
    # one fewer bigint on every joined/shuffled row (guide §2.3)
    qdocs = base.where(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.concat(F.lower(F.col("text")), F.lit(" near dup")).alias("qtext"),
    )
    qtf = (
        qdocs.select(
            "query_id",
            F.explode(whitespace_tokens("qtext")).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("cnt"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cnt"), F.asc("term"))
    qterms = (
        qtf.withColumn("rnk", F.row_number().over(wq))
        .where(F.col("rnk") <= 3)
        .select("query_id", "term")
    )
    k1, b = float(_K1), float(_B)
    partials = (
        qterms.join(tf, "term")
        .join(dlen, "doc_id")
        .join(F.broadcast(dfreq.withColumnRenamed("term", "t2")),
              F.col("term") == F.col("t2"))
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.log(
                    1.0
                    + (F.col("n_total") - F.col("n_docs") + 0.5)
                    / (F.col("n_docs") + 0.5)
                )
                * (F.col("cnt") * (k1 + 1.0))
                / (
                    F.col("cnt")
                    + k1 * (1.0 - b + b * F.col("n_tok") / F.col("avgdl"))
                ),
                8,
            )
            .cast("decimal(18,8)")
            .alias("part"),
        )
    )
    # Optimization r12 (guide §1.2 / §2.4 -- remove a sort used only to
    # read ONE row per group): the old shape ranked EVERY candidate with
    # a row_number window (a full per-query sort of the scored posting-
    # join output) and then kept only the truth doc's rank. The truth's
    # rank under (score DESC, doc_id ASC) is just 1 + the count of
    # candidates that order strictly before it -- score > t_score, or an
    # exact-decimal tie with a smaller doc_id -- so a hash aggregate over
    # the same rows replaces the sort outright. Scores are DECIMAL(18,8)
    # sums, so the comparisons are exact and the computed rank is
    # bit-identical to row_number's. ``scored`` now has two consumers
    # (truth extraction + the better-count), hence the lazy pin (same
    # storage note as the tf pin above).
    scored = (
        partials.groupBy("query_id", "doc_id")
        .agg(F.sum("part").alias("score"))
        .localCheckpoint(eager=False)
    )
    truth = scored.where(F.col("doc_id") == F.col("query_id")).select(
        "query_id", F.col("score").alias("t_score")
    )
    n_better = (
        scored.join(F.broadcast(truth), "query_id")
        .where(
            (F.col("score") > F.col("t_score"))
            | (
                (F.col("score") == F.col("t_score"))
                & (F.col("doc_id") < F.col("query_id"))
            )
        )
        .groupBy("query_id")
        .agg(F.count("*").alias("n_better"))
    )
    hits = truth.join(n_better, "query_id", "left").select(
        "query_id",
        (F.coalesce(F.col("n_better"), F.lit(0)) + 1)
        .cast("int")
        .alias("rnk"),
    )
    per_q = qdocs.select("query_id").join(hits, "query_id", "left").select(
        F.coalesce(
            F.when(F.col("rnk") <= 10, F.round(1.0 / F.col("rnk"), 6)),
            F.lit(0),
        )
        .cast("decimal(18,6)")
        .alias("rr"),
        F.when(F.col("rnk") <= 1, 1).otherwise(0).alias("r1"),
        F.when(F.col("rnk") <= 5, 1).otherwise(0).alias("r5"),
        F.when(F.col("rnk") <= 10, 1).otherwise(0).alias("r10"),
    )
    return per_q.agg(
        F.count("*").cast("bigint").alias("n_queries"),
        F.round(F.sum("rr").cast("double") / F.count("*"), 6).alias("mrr_at10"),
        F.round(F.sum("r1").cast("double") / F.count("*"), 6).alias("recall_at1"),
        F.round(F.sum("r5").cast("double") / F.count("*"), 6).alias("recall_at5"),
        F.round(F.sum("r10").cast("double") / F.count("*"), 6).alias("recall_at10"),
    )
