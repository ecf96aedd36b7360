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

from pyspark.sql import DataFrame, SparkSession, Window as W
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
    "docs_domain_mixture",
    oracle="""
WITH per AS (
  SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY source
), shared AS (
  SELECT *,
         CAST(total_chars AS DOUBLE) / SUM(CAST(total_chars AS DOUBLE)) OVER () AS raw_share
  FROM per
), tempered AS (
  SELECT *, CAST(ROUND(sqrt(raw_share), 9) AS DECIMAL(18,9)) AS t_dec FROM shared
)
SELECT source, n_docs, total_chars,
       ROUND(raw_share, 6) AS raw_share,
       ROUND(CAST(t_dec AS DOUBLE) / CAST(SUM(t_dec) OVER () AS DOUBLE), 6) AS mix_weight,
       CAST(ROUND(CAST(t_dec AS DOUBLE) / CAST(SUM(t_dec) OVER () AS DOUBLE) * 100000, 0) AS BIGINT) AS epoch_quota
FROM tempered
""",
)
def docs_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain mixing (the alpha=0.5 upsampling rule from
    multilingual/multi-domain LM training): per-source sampling weight
    w_i = share_i^alpha / sum_j share_j^alpha, which flattens the domain
    distribution toward uniform, plus the resulting per-epoch document
    quota at a 100k budget. Plan: one tiny groupBy(source) aggregate, then
    unpartitioned windows over the handful of domain rows -- the serial
    part is O(n_domains), never O(n_docs).

    Float determinism: raw_share is one exact double division; the
    tempering uses sqrt (IEEE-correctly-rounded, bit-identical across
    engines -- the reason alpha is 0.5 and not pow), and the cross-domain
    denominator sums DECIMAL(18,9)-quantized terms so it is associative
    and order-independent."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    w_all = W.partitionBy()
    share = F.col("total_chars").cast("double") / F.sum(
        F.col("total_chars").cast("double")
    ).over(w_all)
    tempered = per.withColumn("raw_share", share).withColumn(
        "t_dec", F.round(F.sqrt(F.col("raw_share")), 9).cast("decimal(18,9)")
    )
    weight = F.col("t_dec").cast("double") / F.sum("t_dec").over(w_all).cast(
        "double"
    )
    return tempered.select(
        "source",
        "n_docs",
        "total_chars",
        F.round("raw_share", 6).alias("raw_share"),
        F.round(weight, 6).alias("mix_weight"),
        F.round(weight * 100000, 0).cast("bigint").alias("epoch_quota"),
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


# Whitespace tokens of a text column (DuckDB side; mirrors
# functions/text.py whitespace_tokens for non-empty fixture texts).
_SQL_PTOKS = r"regexp_split_to_array(trim(lower(text)), '\s+')"

# Sliding token-window chunking: window of 64 tokens, stride 48 (16-token
# overlap). n_chunks = 1 if n <= 64 else floor((n - 17) / 48) + 1, i.e.
# ceil((n - 64) / 48) + 1 -- the last window starts at the final stride
# step and is allowed to run short.
_CHUNK_W, _CHUNK_S = 64, 48


def _sql_chunks(src: str) -> str:
    """CTE chain `chunk_t -> chunk_c -> chunks` producing the sliding
    token-window chunk rows of table/CTE ``src`` (DuckDB side)."""
    return f"""chunk_t AS (
  SELECT doc_id, {_SQL_PTOKS} AS toks, len({_SQL_PTOKS}) AS n FROM {src}
),
chunk_c AS (
  SELECT doc_id, toks,
         unnest(generate_series(0,
             CASE WHEN n <= {_CHUNK_W} THEN 0
                  ELSE CAST(floor((n - {_CHUNK_W - _CHUNK_S + 1}) / {_CHUNK_S}.0) AS BIGINT)
             END)) AS chunk_id
  FROM chunk_t
),
chunks AS (
  SELECT doc_id, chunk_id,
         chunk_id * {_CHUNK_S} AS start_tok,
         CAST(len(toks[chunk_id * {_CHUNK_S} + 1 : chunk_id * {_CHUNK_S} + {_CHUNK_W}]) AS BIGINT) AS n_tokens,
         substring(md5(array_to_string(toks[chunk_id * {_CHUNK_S} + 1 : chunk_id * {_CHUNK_S} + {_CHUNK_W}], ' ')), 1, 16) AS chunk_hash
  FROM chunk_c
)"""


@query(
    "docs_chunk_windows",
    oracle=f"""
WITH {_sql_chunks('documents')}
SELECT doc_id, chunk_id, start_tok, n_tokens, chunk_hash FROM chunks
""",
)
def docs_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window document chunking with overlap -- the step that turns a
    curated corpus into model-ready sequences (context-window packing's
    sibling: docs_token_shards buckets whole docs, this SPLITS long docs).

    Pure per-row explode of a sequence expression: tokens are staged once
    per document (HOF/slice lambdas get no CSE), chunk starts are a
    generated sequence, and each chunk row carries its token span plus an
    md5 content fingerprint (so downstream chunk-level dedup can run
    without re-tokenizing). No shuffle at all -- at 100 TB this is a
    map-only stage that composes with the scan; the fan-out factor is
    bounded by doc length / stride.
    """
    return chunk_windows(load_table(spark, sf_dir, "documents"))


def chunk_windows(
    docs: DataFrame, window: int = _CHUNK_W, stride: int = _CHUNK_S
) -> DataFrame:
    """Sliding token-window chunk rows of a (doc_id, text) frame -- see
    docs_chunk_windows for the contract. Requires 0 < stride <= window
    (stride > window would silently drop tokens between windows)."""
    from ..functions.text import whitespace_tokens

    if not 0 < stride <= window:
        raise ValueError(f"need 0 < stride <= window, got {window=} {stride=}")
    w, s = window, stride
    toks = docs.select(
        "doc_id", whitespace_tokens("text").alias("toks")
    ).withColumn("n", F.size("toks"))
    n_chunks = F.when(F.col("n") <= w, F.lit(1).cast("bigint")).otherwise(
        F.floor((F.col("n") - (w - s + 1)) / s) + 1
    )
    chunks = toks.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias(
            "chunk_id"
        ),
    )
    ctoks = F.slice("toks", (F.col("chunk_id") * s + 1).cast("int"), w)
    staged2 = chunks.select(
        "doc_id",
        "chunk_id",
        (F.col("chunk_id") * s).alias("start_tok"),
        ctoks.alias("ctoks"),
    )
    return staged2.select(
        "doc_id",
        "chunk_id",
        "start_tok",
        F.size("ctoks").cast("bigint").alias("n_tokens"),
        F.substring(F.md5(F.array_join("ctoks", " ")), 1, 16).alias("chunk_hash"),
    )


@query(
    "docs_repeated_chunks",
    oracle=f"""
WITH aug AS (
  SELECT doc_id, text, lang, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 100000, text, lang, source, n_chars FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 200000, text || ' near dup', lang, source, n_chars
  FROM documents WHERE doc_id % 25 = 0
),
{_sql_chunks('aug')}
SELECT chunk_hash,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_occurrences,
       MIN(doc_id) AS first_doc
FROM chunks
GROUP BY chunk_hash
HAVING COUNT(DISTINCT doc_id) >= 2
""",
)
def docs_repeated_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-PASSAGE detection: chunk the corpus, then
    group the chunk fingerprints -- any hash in >= 2 documents is a
    duplicated span (the chunk-granularity approximation of suffix-array
    substring dedup a la "Deduplicating Training Data Makes Language
    Models Better"; whole-doc dedup cannot see a copied paragraph inside
    an otherwise-unique document). Composition proof for the chunking
    operator: chunk_windows feeds a plain aggregate with no
    materialization boundary. Plan: map-only chunk explode -> one
    hash-partitioned aggregate on the 64-bit fingerprint -- the same
    scale-safe single-shuffle shape as exact_dedup. Runs over the
    standard augmented corpus (text.py) so planted exact/near copies
    yield non-vacuous shared spans."""
    from .text import _augmented_corpus

    corpus = _augmented_corpus(load_table(spark, sf_dir, "documents"))
    return (
        chunk_windows(corpus)
        .groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@query(
    "docs_epoch_shuffle",
    oracle="""
SELECT doc_id,
       ROW_NUMBER() OVER (ORDER BY md5('e1:' || CAST(doc_id AS VARCHAR))) - 1 AS pos
FROM documents
""",
)
def docs_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: every document gets a global position
    in md5('<epoch-seed>:' || id) order -- the reshuffle-per-epoch a
    training loader needs, reproducible across runs, engines, and
    partitionings (unlike ORDER BY rand(), whose draw depends on row
    order and partition count).

    The naive formulation is ROW_NUMBER() over a GLOBAL order -- a
    single-partition sort at 100 TB. Here the position is a distributed
    prefix COUNT through operators/packing.py (range partition on the
    hash -> parallel per-partition cumsum of 1s -> O(num_partitions)
    offset window -> broadcast join): with size=1 and budget=1 the shard
    id IS the 0-indexed global position. The oracle runs the naive global
    window, which this plan must reproduce exactly."""
    from ..operators.packing import assign_token_shards

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    hashed = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit("e1:"), F.col("doc_id").cast("string"))).alias("_h"),
        F.lit(1).cast("bigint").alias("_one"),
    )
    pos = assign_token_shards(hashed, size_col="_one", budget=1, order_col="_h")
    return pos.select("doc_id", F.col("shard").alias("pos"))


@query(
    "docs_weighted_sample_noreplace",
    oracle="""
WITH keyed AS (
  SELECT doc_id, n_chars,
         -ln((CAST(('0x' || substring(md5('es:' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) + 1)
             / 281474976710657.0)
           / CAST(n_chars AS DOUBLE) AS es_key
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, n_chars, rank FROM (
  SELECT doc_id, n_chars,
         ROW_NUMBER() OVER (ORDER BY es_key, doc_id) AS rank
  FROM keyed
) WHERE rank <= 100
""",
)
def docs_weighted_sample_noreplace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    exponential keys): each document draws key = -ln(u)/weight from a
    deterministic md5-derived uniform u in (0,1], and the k smallest keys
    ARE a weighted sample without replacement -- the distributed one-pass
    answer to 'sample 100 docs proportional to length, no duplicates',
    where naive sequential weighted draws can't parallelize.
    docs_weighted_sample is the Bernoulli (with-replacement-ish,
    per-row-independent) twin; this is the exact-k form. Plan: a
    projection for the keys + one top-k (TakeOrderedAndProject at this k,
    never a global sort). u = (md5_48bit + 1) / 2^48 is identical
    arithmetic in both engines; ln is libm on identical doubles, ranking
    uses the raw key with a doc_id tiebreak."""
    # weight-0 (empty) documents are unsampleable by definition and would
    # divide by zero under ANSI: excluded on both sides
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("es:"), F.col("doc_id").cast("string"))), 1, 12),
            16,
            10,
        ).cast("bigint")
        + 1
    ) / F.lit(281474976710657.0)
    keyed = docs.select(
        "doc_id",
        "n_chars",
        (-F.log(u) / F.col("n_chars").cast("double")).alias("es_key"),
    )
    w = W.orderBy(F.asc("es_key"), F.asc("doc_id"))
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 100)
        .select("doc_id", "n_chars", "rank")
    )


@query(
    "pipeline_pack_sequences",
    oracle=r"""
WITH d AS (
  SELECT doc_id % 8 AS g, doc_id,
         CAST(len(regexp_split_to_array(trim(lower(text)), '\s+'))
              AS BIGINT) AS ln
  FROM documents
),
pos AS (
  SELECT g, ln,
         CAST(COALESCE(SUM(ln) OVER (
             PARTITION BY g ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS s
  FROM d WHERE ln > 0
),
spans AS (
  SELECT g, s, ln, s // 128 AS k0, (s + ln - 1) // 128 AS k1,
         unnest(generate_series(s // 128, (s + ln - 1) // 128)) AS chunk
  FROM pos
),
contrib AS (
  SELECT g, chunk,
         least(s + ln, (chunk + 1) * 128)
           - greatest(s, chunk * 128) AS tok,
         CASE WHEN k0 = chunk THEN 1 ELSE 0 END AS starts,
         CASE WHEN k0 = chunk AND k1 = chunk THEN 1 ELSE 0 END AS whole
  FROM spans
)
SELECT g, chunk, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(starts) AS BIGINT) AS n_starts,
       CAST(SUM(whole) AS BIGINT) AS n_whole,
       CAST(SUM(tok) AS BIGINT) AS fill
FROM contrib GROUP BY 1, 2
""",
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (operators/seqpack.py): the
    GPT-style pretraining default -- concatenate each packing group's
    documents in doc_id order and cut every 128 tokens; documents
    straddle row boundaries, so padding exists ONLY in each group's
    tail chunk. The emitted per-chunk table (documents touching,
    documents starting, token fill) is the packing's complete audit:
    conservation (sum of fills == corpus token count) and the
    zero-interior-padding law (fill == 128 off-tail) are pinned by
    pytest, and the oracle replays the identical exclusive-prefix-sum
    arithmetic (the layout_compaction_plan idiom) so the gate hash
    pins every boundary. Plan: one window cumsum per group (groups are
    doc_id % 8 -- deterministic, engine-replayable, embarrassingly
    parallel; G scales with the cluster at 100 TB), one bounded
    explode (a document touches ceil(len/C)+1 chunks), one aggregate.
    No UDF, no global window. Reference has no training-data surface
    (its pipeline ends at the BigQuery load, etl_service/main.py:
    239-268)."""
    from ..operators.seqpack import pack_concat_chunks

    docs = load_table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 8).alias("g"),
        "doc_id",
        token_count("text").cast("bigint").alias("ln"),
    )
    return pack_concat_chunks(
        docs, len_col="ln", order_col="doc_id", group_col="g",
        context_len=128,
    )


@query(
    "pipeline_pack_ffd_bins",
    # NULLIF(list_position(...), 0) everywhere: this DuckDB returns 0
    # (not NULL) when no element matches, and a 0 slice bound silently
    # becomes a from-the-end index -- without the guard the fills list
    # DOUBLES per iteration (measured: 2^k growth, a hang by depth 30).
    # group count scales with the corpus (GREATEST(8, ceil(n/625)),
    # derived identically on both engines -- the dbscan n_planes
    # precedent): fixed groups made per-group FFD work quadratic in n
    # (measured 4.93x at 10x with G=8; bounded ~625-doc groups keep
    # per-group work constant, total linear).
    oracle=r"""
WITH RECURSIVE gs AS (
  SELECT GREATEST(8, CAST(CEIL(COUNT(*) / 625.0) AS BIGINT)) AS g
  FROM documents
),
d AS MATERIALIZED (
  SELECT doc_id % gs.g AS g, doc_id,
         CAST(len(regexp_split_to_array(trim(lower(text)), '\s+'))
              AS BIGINT) AS ln,
         ROW_NUMBER() OVER (
             PARTITION BY doc_id % gs.g
             ORDER BY len(regexp_split_to_array(trim(lower(text)),
                                                '\s+')) DESC, doc_id
         ) AS r
  FROM documents, gs
),
ffd AS (
  SELECT g, r, ln, [ln] AS fills, CAST(0 AS BIGINT) AS bin
  FROM d WHERE r = 1
  UNION ALL
  SELECT nxt.g, nxt.r, nxt.ln,
         CASE WHEN NULLIF(list_position(
                  list_transform(f.fills, x -> x + nxt.ln <= 128),
                  true), 0) IS NULL
              THEN list_append(f.fills, nxt.ln)
              ELSE list_concat(list_concat(
                     list_slice(f.fills, 1,
                       NULLIF(list_position(list_transform(f.fills,
                         x -> x + nxt.ln <= 128), true), 0) - 1),
                     [list_extract(f.fills,
                       NULLIF(list_position(list_transform(f.fills,
                         x -> x + nxt.ln <= 128), true), 0)) + nxt.ln]),
                     list_slice(f.fills,
                       NULLIF(list_position(list_transform(f.fills,
                         x -> x + nxt.ln <= 128), true), 0) + 1,
                       len(f.fills)))
         END,
         CAST(COALESCE(
             NULLIF(list_position(list_transform(f.fills,
               x -> x + nxt.ln <= 128), true), 0) - 1,
             len(f.fills)) AS BIGINT)
  FROM ffd f JOIN d nxt ON nxt.g = f.g AND nxt.r = f.r + 1
)
SELECT g, bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ln) AS BIGINT) AS fill,
       CAST(128 - SUM(ln) AS BIGINT) AS pad
FROM ffd GROUP BY 1, 2
""",
)
def pipeline_pack_ffd_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing bin packing (operators/seqpack.py): the
    no-split packing for SFT/eval rows where a document must stay
    atomic -- sort each packing group by (length DESC, doc_id ASC) and
    place every document in the FIRST open 128-token bin with room,
    else open a new one (oversized documents get a bin of their own).
    FFD's open-bin state is inherently sequential, so the Spark side is
    the sanctioned custom-operator shape: ONE applyInPandas call per
    deterministic doc_id%G group (Arrow batch in, numpy-backed loop
    inside, never per-row Python), while the ORACLE replays the exact
    same decision sequence as a DuckDB recursive CTE whose state column
    is the open-bin fill list -- the strongest gate in the family: a
    single misplaced document changes some bin's (n_docs, fill) pair
    and breaks the hash. The group count G = max(8, ceil(n/625)) is
    derived identically on both engines (the dbscan n_planes / conformal
    driver-scalar precedent), bounding every group at ~625 docs: the
    per-group FFD loop's O(docs x open-bins) work is then CONSTANT per
    group and the total is linear -- the fixed-G first cut measured
    4.93x at 10x (SCALE_r10), exactly the quadratic this policy
    removes. Pytest adds the conservation law (sum of bin fills ==
    corpus token count), the hard-capacity law (fill <= 128 for every
    multi-doc bin), and an independent pure-Python FFD recompute. At
    100 TB the groups are embarrassingly parallel and per-group state
    is O(open bins). Reference has no training-data surface (survey
    2.4)."""
    from ..operators.seqpack import pack_ffd_bins

    base = load_table(spark, sf_dir, "documents")
    # one driver scalar (count), the allowlisted bookkeeping fetch
    n_docs = base.count()
    g = max(8, -(-n_docs // 625))
    docs = base.select(
        (F.col("doc_id") % g).alias("g"),
        "doc_id",
        token_count("text").cast("bigint").alias("ln"),
    )
    assigned = pack_ffd_bins(
        docs, len_col="ln", order_col="doc_id", group_col="g",
        context_len=128,
    )
    return assigned.groupBy("g", "bin").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("fill"),
        (F.lit(128) - F.sum("n_tok")).cast("bigint").alias("pad"),
    )


@query(
    "pipeline_assembly_e2e",
    oracle=r"""
WITH m AS (
  SELECT doc_id, text,
         CAST(len(regexp_split_to_array(trim(lower(text)), '\s+'))
              AS BIGINT) AS n_tok,
         CAST(strlen(regexp_replace(trim(lower(text)), '\s', '', 'g'))
              AS BIGINT) AS sumlen,
         CAST(len(list_filter(regexp_split_to_array(trim(lower(text)),
                                                    '\s+'),
                              x -> x IN ('the', 'a'))) AS BIGINT) AS n_stop
  FROM documents
),
kept AS (
  SELECT doc_id, text, n_tok FROM m
  WHERE n_tok >= 50
    AND 3 * n_tok <= sumlen AND sumlen <= 10 * n_tok
    AND n_stop >= 2
),
survivors AS (
  SELECT k.doc_id, k.n_tok FROM kept k
  JOIN (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text)) s
    ON k.doc_id = s.doc_id
),
pos AS (
  SELECT doc_id % 8 AS g, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (
             PARTITION BY doc_id % 8 ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS s
  FROM survivors WHERE n_tok > 0
)
SELECT g,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST((SUM(n_tok) + 127) // 128 AS BIGINT) AS n_chunks,
       CAST(((SUM(n_tok) + 127) // 128) * 128 - SUM(n_tok) AS BIGINT)
         AS pad_tokens,
       CAST(SUM(CASE WHEN s // 128 <> (s + n_tok - 1) // 128
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
FROM pos GROUP BY g
""",
)
def pipeline_assembly_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data ASSEMBLY composition -- the capstone
    that proves the round-10 stages chain as ONE lazy plan the way
    docs_curated_pipeline proved quality->dedup->split: a Gopher-rule
    quality gate (natural failures only -- 221 of 500 docs fail the
    50-word floor at sf0.01, no planting needed) -> deterministic
    exact dedup (min-id survivor per content hash) -> concat-and-chunk
    sequence packing over the SURVIVORS, reported per packing group
    (docs kept, token total, 128-token training rows produced, tail
    padding, boundary-straddling docs -- the number an attention-mask
    builder budgets). The straddler count is the part only the
    exclusive prefix sum can produce, so the gate exercises the real
    packing arithmetic, not just totals. Plan shape: scan -> flag
    projection (one pass computes all three rule statistics) -> one
    dedup window shuffle on the content hash -> one per-group window
    cumsum -> 8-row aggregate; no materialization boundary anywhere,
    Catalyst sees the whole chain. At 100 TB every stage is the
    already-adjudicated shape of its standalone gate. Reference's
    pipeline ends at a BigQuery append with no assembly surface
    (etl_service/main.py:239-268)."""
    from ..functions.text import whitespace_tokens
    from ..operators.dedup import exact_dedup
    from ..operators.seqpack import pack_concat_chunks

    docs = load_table(spark, sf_dir, "documents")
    te = F.trim(F.lower(F.col("text")))
    ws = whitespace_tokens("text")
    m = docs.select(
        "doc_id",
        "text",
        F.size(ws).cast("bigint").alias("n_tok"),
        F.length(F.regexp_replace(te, r"\s", ""))
        .cast("bigint")
        .alias("sumlen"),
        F.size(F.filter(ws, lambda x: x.isin("the", "a")))
        .cast("bigint")
        .alias("n_stop"),
    )
    kept = m.where(
        (F.col("n_tok") >= 50)
        & (3 * F.col("n_tok") <= F.col("sumlen"))
        & (F.col("sumlen") <= 10 * F.col("n_tok"))
        & (F.col("n_stop") >= 2)
    )
    survivors = exact_dedup(kept).select(
        (F.col("doc_id") % 8).alias("g"), "doc_id", "n_tok"
    )
    chunks = pack_concat_chunks(
        survivors, len_col="n_tok", order_col="doc_id", group_col="g",
        context_len=128,
    )
    return chunks.groupBy("g").agg(
        F.sum("n_starts").cast("bigint").alias("n_docs"),
        F.sum("fill").cast("bigint").alias("total_tokens"),
        F.count("*").cast("bigint").alias("n_chunks"),
        (F.count("*") * 128 - F.sum("fill")).cast("bigint").alias(
            "pad_tokens"
        ),
        # distinct documents crossing >=1 boundary: every doc starts
        # exactly once, so starts - wholly-contained = straddlers. NOT
        # sum(n_docs) - sum(n_starts): that counts boundary CROSSINGS
        # and over-counts any doc spanning >2 chunks.
        (F.sum("n_starts") - F.sum("n_whole"))
        .cast("bigint")
        .alias("n_straddlers"),
    )
