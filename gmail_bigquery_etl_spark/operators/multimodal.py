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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_media(
    media: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Batch resize over binary payloads (mapInPandas, Arrow-batched).

    Real codec path stubbed (no imaging libs in the container); the fake
    path emits a deterministic digest-derived payload sized width*height//64
    so downstream size accounting is testable. Schema, batch iteration and
    binary-out plumbing are the production shape.
    """

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize requires codec libraries not present in "
                    "this environment; pass fake=True for the stand-in"
                )
            n_out = max(1, width * height // 64)
            out_payload = pdf["payload"].map(
                lambda b: (
                    (hashlib.md5(bytes(b)).digest() * (n_out // 16 + 1))[:n_out]
                    if b is not None
                    else None
                )
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payload,
                    "width": width,
                    "height": height,
                }
            )

    return media.select("media_id", "payload").mapInPandas(do_resize, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_digest", T.StringType(), True),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 10, fake: bool = True) -> DataFrame:
    """Frame sampling over binary 'video' payloads: one output row per
    sampled frame (a fan-out mapInPandas, the UDTF batch shape).

    Deterministic fake decode: a payload of B bytes 'contains'
    B // 100 + 1 frames; frame k's digest is md5(md5(payload) || ':' k) --
    reproducible in SQL, so the sampling query is oracle-gated.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video frame decode requires codec libraries not present "
                    "in this environment; pass fake=True for the stand-in"
                )
            ids, idxs, digs = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                if b is None:
                    continue
                payload_digest = hashlib.md5(bytes(b)).hexdigest()
                n_frames = len(b) // 100 + 1
                for k in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(k)
                    digs.append(
                        hashlib.md5(f"{payload_digest}:{k}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_digest": digs}
            )

    return media.select("media_id", "payload").mapInPandas(sample, FRAME_SCHEMA)
