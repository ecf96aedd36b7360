"""Multimodal (binary) column plumbing (SURVEY.md §2.10).

Images/audio/video are opaque BinaryType payloads with a typed metadata
struct alongside. The Spark-side plumbing -- schema, Arrow batch shape,
mapInPandas signatures, partitioning -- is real and tested; the actual
codec decode is STUBBED (the container ships no image/audio libs): decode
functions raise NotImplementedError unless ``fake=True``, in which case a
deterministic md5-derived fake feature vector stands in, keeping every
downstream operator exercisable end-to-end.

Scale notes: binary payloads ride in Arrow record batches; mapInPandas
streams batches (never materializes a partition); payload columns are
pruned unless selected, so metadata-only queries never read the bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Wrap the documents fixture as a media table: utf-8 payload bytes +
    typed metadata. Pure projection (codegen'd encode)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def _fake_dims(digest: str) -> tuple[int, int]:
    """Deterministic stand-in for decoded image dimensions."""
    return int(digest[:4], 16) % 640 + 1, int(digest[4:8], 16) % 480 + 1


def decode_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Batch feature extraction over binary payloads via mapInPandas.

    Real decode path is stubbed: with fake=False this raises
    NotImplementedError (no codec libs in the container). The Arrow
    plumbing -- batch iteration, binary columns in/out, schema -- is the
    production shape either way.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "codec decode requires image/audio libraries not present "
                    "in this environment; pass fake=True for the "
                    "deterministic stand-in"
                )
            digests = pdf["payload"].map(
                lambda b: hashlib.md5(bytes(b)).hexdigest() if b is not None else None
            )
            dims = digests.map(lambda d: _fake_dims(d) if d else (None, None))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else None
                    ),
                    "digest": digests,
                    "width": dims.map(lambda t: t[0]),
                    "height": dims.map(lambda t: t[1]),
                }
            )

    return media.select("media_id", "payload").mapInPandas(extract, FEATURE_SCHEMA)
