"""Training-pipeline assembly queries: the steps between "clean corpus"
and "training shards" that a large-scale data pipeline runs after dedup /
quality filtering (SURVEY.md §2.10 extensions):

  docs_stratified_split -- deterministic hash-based train/val/test split
                           (md5 of the id, 80/10/10). Pure per-row map +
                           one aggregation shuffle; the assignment is
                           content-independent and stable across runs,
                           partitionings, and engines.
  docs_token_shards     -- token-budget shard packing in deterministic
                           corpus order, via the distributed prefix sum
                           in operators/packing.py (range partition ->
                           parallel local cumsum -> O(num_partitions)
                           offset window -> broadcast join). The oracle is
                           the naive global-window formulation, which the
                           distributed plan must reproduce exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import token_count
from .registry import query

# 4 hex chars of the id's md5 -> uniform 16-bit int; % 10 buckets to
# 80/10/10. Mirrors the md5-derived arithmetic the multimodal oracle uses.
_SQL_SPLIT = (
    "CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 10 < 8 THEN 'train' "
    "WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 10 = 8 THEN 'val' "
    "ELSE 'test' END"
)


@query(
    "docs_stratified_split",
    oracle=f"""
SELECT {_SQL_SPLIT} AS split,
       source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
""",
)
def docs_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split: bucket = md5(doc_id)-derived
    uniform int mod 10 (8/1/1). No shuffle for the assignment itself --
    it's a codegen'd projection -- and the per-(split, source) stats prove
    every document lands in exactly one deterministic bucket."""
    docs = load_table(spark, sf_dir, "documents")
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("bigint")
        % 10
    )
    split = (
        F.when(h < 8, "train").when(h == 8, "val").otherwise("test")
    )
    return docs.groupBy(split.alias("split"), "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@query(
    "docs_balanced_sample",
    oracle="""
WITH ranked AS (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(CAST(doc_id AS BIGINT)) AS BIGINT) AS id_sum
FROM ranked
WHERE rn <= 40
GROUP BY lang
""",
)
def docs_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group balanced sampling: cap every language at 40
    documents, chosen by md5(doc_id) order -- a content-independent
    pseudo-random draw that is reproducible across runs and engines
    (the md5 hex string orders identically everywhere). One shuffle on the
    group key + a per-group window; the id_sum pins EXACTLY which
    documents were drawn, not just how many."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    w = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 40)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum(F.col("doc_id").cast("bigint")).alias("id_sum"),
        )
    )


@query(
    "docs_token_shards",
    oracle=r"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT CAST(FLOOR((cum - n_tokens) / 4000.0) AS BIGINT) AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM c
GROUP BY 1
""",
)
def docs_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into 4000-token shards in doc_id order through the
    distributed prefix sum (operators/packing.py) -- range partition,
    parallel per-partition cumsum, O(num_partitions) offset window,
    broadcast offset join. The oracle computes the same assignment with
    the naive single global window; per-shard stats (count, token total,
    id range) pin the exact packing."""
    from ..operators.packing import assign_token_shards

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").cast("bigint").alias("n_tokens")
    )
    sharded = assign_token_shards(
        docs, size_col="n_tokens", budget=4000, order_col="doc_id"
    )
    return sharded.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@query(
    "docs_curated_pipeline",
    oracle=f"""
WITH kept AS (
  SELECT doc_id, text, lang, source, n_chars
  FROM documents
  WHERE n_chars >= 100 AND lang IS NOT NULL
), survivors AS (
  SELECT k.* FROM kept k
  JOIN (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text)) s
    ON k.doc_id = s.doc_id
)
SELECT {_SQL_SPLIT} AS split,
       lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM survivors
GROUP BY 1, 2
""",
)
def docs_curated_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation composition: length/lang quality gate ->
    deterministic exact dedup (min-id survivor per content hash) ->
    stratified split assignment -- the three pipeline stages chained as ONE
    lazy plan, proving the operators compose without materialization
    boundaries. Plan shape: scan -> filter (pushed) -> one dedup window
    shuffle -> split projection -> final aggregate; nothing quadratic,
    nothing driver-side."""
    from ..operators.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    kept = docs.filter(
        (F.col("n_chars") >= 100) & F.col("lang").isNotNull()
    )
    survivors = exact_dedup(kept)
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("bigint")
        % 10
    )
    split = F.when(h < 8, "train").when(h == 8, "val").otherwise("test")
    return survivors.groupBy(split.alias("split"), "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
