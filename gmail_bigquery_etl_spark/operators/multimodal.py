"""Multimodal (binary) column plumbing (SURVEY.md §2.10).

Images/audio/video are opaque BinaryType payloads with a typed metadata
struct alongside. The Spark-side plumbing -- schema, Arrow batch shape,
mapInPandas signatures, partitioning -- is real and tested. Codec status:
``decode_features(fake=False)`` REALLY decodes binary PPM (P6) images via
the pure-Python parser below (header parse + pixel-length validation);
every other format, and the resize/frame-sample codecs, stay STUBBED
behind NotImplementedError (the container ships no image/audio libs) with
a deterministic md5-derived fake behind ``fake=True`` keeping every
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


def parse_ppm_dims(b: bytes) -> tuple[int, int]:
    """REAL image decode for binary PPM (P6): header parse (magic, width,
    height, maxval, '#' comments per the netpbm spec) + pixel-payload
    length validation. Pure Python -- no codec library needed -- which is
    exactly why PPM is the one format this environment can decode for
    real. Raises NotImplementedError for any other format (honest stub:
    everything else needs the absent codec libs)."""
    if not b or not b.startswith(b"P6"):
        raise NotImplementedError(
            "only binary PPM (P6) payloads decode without codec libraries; "
            "pass fake=True for other formats"
        )
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        try:
            fields.append(int(b[i:j]))
        except ValueError:
            # Starts with "P6" but the header fields aren't integers: not
            # actually a PPM -- honor the honest-stub contract rather than
            # leaking a parse error for a format we never claimed to read.
            raise NotImplementedError(
                "payload starts with 'P6' but does not follow the PPM "
                "header grammar; pass fake=True for non-PPM formats"
            ) from None
        i = j
    width, height, maxval = fields
    if width <= 0 or height <= 0:
        raise ValueError(f"PPM dimensions out of range: {width}x{height}")
    if not (0 < maxval < 65536):
        raise ValueError(f"PPM maxval out of range: {maxval}")
    i += 1  # exactly one whitespace byte separates header from raster
    bpp = 3 if maxval < 256 else 6
    if len(b) - i != width * height * bpp:
        raise ValueError(
            f"PPM raster is {len(b) - i} bytes, expected {width * height * bpp}"
        )
    return width, height


def decode_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Batch feature extraction over binary payloads via mapInPandas.

    fake=False runs the REAL pure-Python PPM (P6) decode -- header parse +
    raster validation -- and raises NotImplementedError for formats that
    would need the container's absent codec libs. fake=True substitutes
    deterministic md5-derived dimensions for any payload. The Arrow
    plumbing -- batch iteration, binary columns in/out, schema -- is the
    production shape either way.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf["payload"].map(
                lambda b: hashlib.md5(bytes(b)).hexdigest() if b is not None else None
            )
            if fake:
                dims = digests.map(lambda d: _fake_dims(d) if d else (None, None))
            else:
                dims = pdf["payload"].map(
                    lambda b: parse_ppm_dims(bytes(b)) if b is not None else (None, None)
                )
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
