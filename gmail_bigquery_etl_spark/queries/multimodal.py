"""Multimodal-column queries (SURVEY.md §2.10).

``documents`` stands in as the media corpus: utf-8 payload bytes in a
BinaryType column with a typed metadata struct. Feature extraction runs
through the real Arrow/mapInPandas plumbing (operators/multimodal.py); the
codec decode itself is a deterministic md5-derived fake (the real decode is
stubbed behind NotImplementedError -- no codec libs in this container).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, spread
from ..operators.multimodal import (
    decode_features,
    documents_as_media,
    sample_frames,
)
from .registry import query


@query(
    "multimodal_features",
    oracle="""
SELECT doc_id AS media_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS digest,
       CAST(CAST(('0x' || substring(md5(text), 1, 4)) AS BIGINT) % 640 + 1 AS INT) AS width,
       CAST(CAST(('0x' || substring(md5(text), 5, 4)) AS BIGINT) % 480 + 1 AS INT) AS height
FROM documents
""",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_features(documents_as_media(docs), fake=True)


@query(
    "multimodal_frame_sample",
    oracle="""
WITH media AS (
  SELECT doc_id AS media_id, encode(text) AS payload, md5(text) AS pdig,
         octet_length(encode(text)) // 100 + 1 AS n_frames
  FROM documents
)
SELECT media_id, CAST(k AS BIGINT) AS frame_idx,
       md5(pdig || ':' || CAST(k AS VARCHAR)) AS frame_digest
FROM media, generate_series(0, 10000) AS t(k)
WHERE k < n_frames AND k % 2 = 0
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling through the fan-out mapInPandas path
    (one output row per sampled frame); fake decode is md5-derived and
    reproduced exactly by the SQL oracle."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return sample_frames(documents_as_media(docs), every_n=2, fake=True)


@query(
    "multimodal_metadata_stats",
    oracle="""
SELECT source,
       COUNT(*) AS n_media,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       MAX(octet_length(encode(text))) AS max_bytes
FROM documents
GROUP BY source
""",
)
def multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregation: Catalyst prunes the payload column out of
    the scan entirely (verified via ReadSchema in tests) -- the reason the
    payload/metadata split matters at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    return media.groupBy(F.col("meta.source").alias("source")).agg(
        F.count("*").alias("n_media"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.max("meta.n_bytes").alias("max_bytes"),
    )
