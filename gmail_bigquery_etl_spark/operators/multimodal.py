"""Multimodal (binary) column plumbing (SURVEY.md §2.10).

Images/audio/video are opaque BinaryType payloads with a typed metadata
struct alongside. The Spark-side plumbing -- schema, Arrow batch shape,
mapInPandas signatures, partitioning -- is real and tested. Codec status:
``decode_features(fake=False)`` REALLY decodes binary PPM (P6) images via
the pure-Python parser below (header parse + pixel-length validation),
and ``audio_features(fake=False)`` REALLY decodes PCM WAV (RIFF) headers
(chunk walk + fmt/data consistency validation); BMP, PNG (CRC chunk walk
+ inflate + all five scanline filters), nearest-neighbor resize over the
decoded PNG/PPM rasters, and ANM1 multi-frame sampling (``parse_anim``)
are likewise real -- the formats simple enough to parse with zero codec
libraries. Every other format (JPEG, MP4, ...) stays STUBBED behind
NotImplementedError (the container ships no image/audio libs) with a
deterministic md5-derived fake behind ``fake=True`` keeping every
downstream operator exercisable end-to-end.

Scale notes: binary payloads ride in Arrow record batches; mapInPandas
streams batches (never materializes a partition); payload columns are
pruned unless selected, so metadata-only queries never read the bytes.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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
    width, height, _maxval, _off = _ppm_header(b)
    return width, height


def _ppm_header(b: bytes) -> tuple[int, int, int, int]:
    """Validated P6 header walk: (width, height, maxval, raster_offset)."""
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
    return width, height, maxval, i


def parse_ppm_raster(b: bytes) -> tuple[int, int, bytes]:
    """8-bit P6 raster extraction: full header validation, then the packed
    RGB raster. 16-bit PPMs (maxval >= 256) raise NotImplementedError --
    the resize path is 8-bit RGB."""
    width, height, maxval, off = _ppm_header(b)
    if maxval >= 256:
        raise NotImplementedError("16-bit PPM rasters do not resize here")
    return width, height, bytes(b[off:])


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


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("bits_per_sample", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
    ]
)


def parse_wav_meta(b: bytes) -> tuple[int, int, int, int]:
    """REAL audio decode for PCM WAV: RIFF/WAVE container walk (chunk ids,
    little-endian sizes, word alignment) + fmt/data consistency validation
    per the WAVE spec. Pure Python/stdlib -- no audio library needed --
    which is exactly why PCM WAV joins PPM as a format this environment
    decodes for real. Returns (n_channels, sample_rate, bits_per_sample,
    n_frames). Raises NotImplementedError for any non-RIFF/WAVE payload
    and for compressed (non-PCM) WAV variants (honest stub: those need
    the absent codec libs); ValueError for malformed/truncated PCM WAV."""
    n_ch, rate, bits, n_frames, _off, _dlen = _wav_walk(b)
    return n_ch, rate, bits, n_frames


def _wav_walk(b: bytes) -> tuple[int, int, int, int, int, int]:
    """Shared RIFF walk: (n_ch, rate, bits, n_frames, data_off, data_len)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError(
            "only PCM WAV (RIFF/WAVE) payloads decode without codec "
            "libraries; pass fake=True for other formats"
        )
    riff_size = int.from_bytes(b[4:8], "little")
    if riff_size != len(b) - 8:
        raise ValueError(
            f"RIFF size field says {riff_size}, payload has {len(b) - 8}"
        )
    fmt = None
    data_len = None
    data_off = None
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = int.from_bytes(b[pos + 4 : pos + 8], "little")
        if pos + 8 + size > len(b):
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk shorter than PCM's 16 bytes")
            audio_format, n_ch, rate, byte_rate, block_align, bits = (
                struct.unpack("<HHIIHH", b[pos + 8 : pos + 24])
            )
            if audio_format != 1:
                raise NotImplementedError(
                    f"WAV audio format {audio_format} is compressed; only "
                    "PCM (format 1) decodes without codec libraries"
                )
            fmt = (n_ch, rate, byte_rate, block_align, bits)
        elif cid == b"data":
            data_len = size
            data_off = pos + 8
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None or data_len is None:
        raise ValueError("missing fmt or data chunk")
    n_ch, rate, byte_rate, block_align, bits = fmt
    if n_ch <= 0 or rate <= 0 or bits <= 0 or bits % 8:
        raise ValueError(f"bad PCM params: ch={n_ch} rate={rate} bits={bits}")
    if block_align != n_ch * bits // 8:
        raise ValueError(f"block_align {block_align} != ch*bits/8")
    if byte_rate != rate * block_align:
        raise ValueError(f"byte_rate {byte_rate} != rate*block_align")
    if data_len % block_align:
        raise ValueError(f"data size {data_len} not frame-aligned")
    # Explicit post-walk truncation contract (the per-chunk size check
    # above already implies it, but parse_wav_samples slices
    # b[off:off+len] and Python slicing truncates silently -- this
    # guard makes "declared data is fully present" an asserted
    # invariant rather than an inference).
    if data_off + data_len > len(b):
        raise ValueError(
            f"data chunk declares {data_len} bytes at offset {data_off}, "
            f"payload is only {len(b)} bytes (truncated PCM WAV)"
        )
    return n_ch, rate, bits, data_len // block_align, data_off, data_len


def parse_wav_samples(b: bytes) -> tuple[int, int, int, list[int]]:
    """REAL PCM sample extraction on top of the RIFF walk: returns
    (n_channels, sample_rate, bits, samples) with samples CENTERED --
    8-bit PCM is unsigned-biased-128 per the WAVE spec (subtract 128),
    16-bit is signed little-endian (struct '<h'). Interleaved channel
    order preserved. 24/32-bit PCM raises NotImplementedError."""
    n_ch, rate, bits, _n_frames, off, dlen = _wav_walk(b)
    raw = b[off : off + dlen]
    if bits == 8:
        samples = [x - 128 for x in raw]
    elif bits == 16:
        samples = list(struct.unpack(f"<{dlen // 2}h", raw))
    else:
        raise NotImplementedError(
            f"{bits}-bit PCM sample decode not implemented (8/16 only)"
        )
    return n_ch, rate, bits, samples


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("window_idx", T.LongType(), False),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("sum_x", T.LongType(), True),
        T.StructField("sum_sq", T.LongType(), True),
    ]
)


def audio_window_stats(media: DataFrame, window: int = 16) -> DataFrame:
    """Windowed audio feature extraction over REAL decoded PCM samples:
    one row per ``window``-frame window with exact integer sample sum and
    energy (sum of squares) -- the moments RMS/loudness/silence-detection
    features derive from, kept integral so the oracle comparison is
    bit-for-bit. Window membership is by FRAME (interleaved channels of
    a frame share a window). Fan-out mapInPandas over Arrow batches,
    same shape as frame sampling; sums prove the parser pulled the RIGHT
    bytes from the data chunk (a one-byte offset error shifts every
    value)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, sx, sq = [], [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                if b is None:
                    continue
                n_ch, _rate, _bits, samples = parse_wav_samples(bytes(b))
                agg: dict[int, list[int]] = {}
                for i, v in enumerate(samples):
                    wi = (i // n_ch) // window
                    a = agg.setdefault(wi, [0, 0, 0])
                    a[0] += 1
                    a[1] += v
                    a[2] += v * v
                for wi in sorted(agg):
                    n, s1, s2 = agg[wi]
                    ids.append(mid)
                    idxs.append(wi)
                    ns.append(n)
                    sx.append(s1)
                    sq.append(s2)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(idxs, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "sum_x": pd.Series(sx, dtype="int64"),
                    "sum_sq": pd.Series(sq, dtype="int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        stats, AUDIO_WINDOW_SCHEMA
    )


def _fake_audio(digest: str) -> tuple[int, int, int, int]:
    """Deterministic stand-in for decoded audio metadata."""
    return (
        int(digest[:2], 16) % 2 + 1,
        8000 + int(digest[2:6], 16) % 4 * 4000,
        (int(digest[6:8], 16) % 2 + 1) * 8,
        int(digest[8:12], 16) % 48000 + 1,
    )


def audio_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Batch audio-metadata extraction over binary payloads (mapInPandas,
    Arrow-batched) -- the audio twin of ``decode_features``.

    fake=False runs the REAL stdlib PCM WAV parser (RIFF chunk walk +
    validation) and raises NotImplementedError for non-WAV/compressed
    payloads; fake=True substitutes deterministic md5-derived metadata
    for any payload. Same production Arrow plumbing either way.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            none4 = (None, None, None, None)
            if fake:
                metas = pdf["payload"].map(
                    lambda b: _fake_audio(hashlib.md5(bytes(b)).hexdigest())
                    if b is not None
                    else none4
                )
            else:
                metas = pdf["payload"].map(
                    lambda b: parse_wav_meta(bytes(b)) if b is not None else none4
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else None
                    ),
                    "n_channels": metas.map(lambda t: t[0]),
                    "sample_rate": metas.map(lambda t: t[1]),
                    "bits_per_sample": metas.map(lambda t: t[2]),
                    "n_frames": metas.map(lambda t: t[3]),
                }
            )

    return media.select("media_id", "payload").mapInPandas(extract, AUDIO_SCHEMA)


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

    fake=False runs a REAL nearest-neighbor resize for the two formats
    whose rasters decode here without codec libraries -- 8-bit truecolor
    PNG (parse_png_raster: chunk walk + inflate + unfilter) and 8-bit P6
    PPM (parse_ppm_raster) -- re-encoding the resized raster as a
    filter-0 PNG, and raises NotImplementedError for any other format
    (honest stub: JPEG et al need the absent codec libs). The fake path
    emits a deterministic digest-derived payload sized width*height//64
    so downstream size accounting stays testable format-free.
    """

    def _resize_real(b) -> bytes | None:
        if b is None:
            return None
        b = bytes(b)
        if b[:8] == _PNG_SIG:
            w, h, _bd, _ct, raster = parse_png_raster(b)
        else:
            w, h, raster = parse_ppm_raster(b)
        return encode_png(width, height, resize_raster_nn(raster, w, h, width, height))

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                out_payload = pdf["payload"].map(_resize_real)
            else:
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

FRAME_REAL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("pixel_sum", T.LongType(), True),
    ]
)

_ANM_MAGIC = b"ANM1"


def parse_anim(b: bytes) -> tuple[int, int, int]:
    """REAL multi-frame container parse: the ``ANM1`` animation format
    (magic + LE u16 frame-count/width/height header, then ``n_frames``
    raw 24-bit RGB rasters of ``w*h*3`` bytes back to back -- the same
    fixed-raster layout uncompressed AVI/Y4M streams use). Returns
    (n_frames, width, height) after validating the magic, the header
    length and that the payload holds EXACTLY the declared rasters, so a
    truncated or padded stream errors instead of mis-slicing frames.
    Raises ValueError for malformed payloads."""
    if b[:4] != _ANM_MAGIC:
        raise NotImplementedError(
            "only ANM1 multi-frame payloads decode without codec "
            "libraries; pass fake=True for other video formats"
        )
    if len(b) < 10:
        raise ValueError("ANM payload truncated inside the header")
    n_frames, w, h = struct.unpack_from("<HHH", b, 4)
    if n_frames < 1 or w < 1 or h < 1:
        raise ValueError("ANM header fields must be positive")
    expect = 10 + n_frames * w * h * 3
    if len(b) != expect:
        raise ValueError(
            f"ANM length mismatch: declared {expect} bytes, got {len(b)}"
        )
    return n_frames, w, h


def anim_frame(b: bytes, idx: int) -> bytes:
    """Slice frame ``idx``'s raster out of a validated ANM1 payload."""
    n_frames, w, h = parse_anim(b)
    if not 0 <= idx < n_frames:
        raise ValueError(f"frame {idx} out of range (n_frames={n_frames})")
    size = w * h * 3
    start = 10 + idx * size
    return b[start : start + size]


def sample_frames(media: DataFrame, every_n: int = 10, fake: bool = True) -> DataFrame:
    """Frame sampling over binary 'video' payloads: one output row per
    sampled frame (a fan-out mapInPandas, the UDTF batch shape).

    fake=False runs a REAL container decode for the ANM1 multi-frame
    format (parse_anim above: header parse + exact-length validation),
    emitting every ``every_n``-th frame's dimensions and raster byte sum
    -- values that depend on slicing the RIGHT byte range, so the oracle
    catches off-by-one frame offsets. Payloads that are not ANM1 raise
    (honest contract: real video codecs need libraries this container
    ships without).

    Deterministic fake decode: a payload of B bytes 'contains'
    B // 100 + 1 frames; frame k's digest is md5(md5(payload) || ':' k) --
    reproducible in SQL, so the sampling query is oracle-gated.
    """

    def sample_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, sums = [], [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                if b is None:
                    continue
                b = bytes(b)
                n_frames, w, h = parse_anim(b)
                size = w * h * 3
                for k in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(k)
                    ws.append(w)
                    hs.append(h)
                    sums.append(sum(b[10 + k * size : 10 + (k + 1) * size]))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "pixel_sum": pd.Series(sums, dtype="int64"),
                }
            )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
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

    src = media.select("media_id", "payload")
    if not fake:
        return src.mapInPandas(sample_real, FRAME_REAL_SCHEMA)
    return src.mapInPandas(sample, FRAME_SCHEMA)


BMP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("bits_per_pixel", T.IntegerType(), True),
    ]
)


def parse_bmp_meta(b: bytes) -> tuple[int, int, int]:
    """REAL image decode for uncompressed BMP (BITMAPINFOHEADER): file
    header + DIB header parse with little-endian fields and 4-byte row
    padding validated against the raster length, per the Windows bitmap
    spec. Pure Python/stdlib -- the third format this environment decodes
    for real (after PPM and PCM WAV). Returns (width, height,
    bits_per_pixel); height is reported positive even for top-down
    (negative-height) bitmaps. Raises NotImplementedError for non-BMP
    payloads and compressed/paletted variants; ValueError for malformed
    uncompressed ones."""
    if len(b) < 54 or b[:2] != b"BM":
        raise NotImplementedError(
            "only uncompressed BMP (BITMAPINFOHEADER) payloads decode "
            "without codec libraries; pass fake=True for other formats"
        )
    file_size, _res, data_offset = struct.unpack("<III", b[2:14])
    if file_size != len(b):
        raise ValueError(f"BMP size field says {file_size}, payload has {len(b)}")
    dib_size, width, height, planes, bpp, compression = struct.unpack(
        "<IiiHHI", b[14:34]
    )
    if dib_size != 40:
        raise NotImplementedError(
            f"DIB header size {dib_size} is not BITMAPINFOHEADER(40); only "
            "the classic uncompressed layout decodes here"
        )
    if compression != 0 or bpp not in (8, 24, 32):
        raise NotImplementedError(
            f"BMP compression={compression} bpp={bpp}: only BI_RGB with "
            "8/24/32 bpp decodes without codec libraries"
        )
    if planes != 1:
        raise ValueError(f"BMP planes must be 1, got {planes}")
    abs_h = abs(height)
    if width <= 0 or abs_h == 0:
        raise ValueError(f"BMP dimensions out of range: {width}x{height}")
    stride = (width * bpp // 8 + 3) // 4 * 4
    if data_offset < 54 or data_offset > len(b):
        raise ValueError(f"BMP data offset {data_offset} out of bounds")
    if len(b) - data_offset != stride * abs_h:
        raise ValueError(
            f"BMP raster is {len(b) - data_offset} bytes, expected "
            f"{stride * abs_h} ({stride}-byte rows x {abs_h})"
        )
    return width, abs_h, bpp


def bmp_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Batch BMP-metadata extraction (mapInPandas, Arrow-batched) -- the
    bitmap twin of ``decode_features``/``audio_features``: fake=False runs
    the real uncompressed-BMP parser, fake=True substitutes deterministic
    md5-derived metadata."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            none3 = (None, None, None)
            if fake:
                metas = pdf["payload"].map(
                    lambda b: (
                        (*_fake_dims(hashlib.md5(bytes(b)).hexdigest()), 24)
                        if b is not None
                        else none3
                    )
                )
            else:
                metas = pdf["payload"].map(
                    lambda b: parse_bmp_meta(bytes(b)) if b is not None else none3
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else None
                    ),
                    "width": metas.map(lambda t: t[0]),
                    "height": metas.map(lambda t: t[1]),
                    "bits_per_pixel": metas.map(lambda t: t[2]),
                }
            )

    return media.select("media_id", "payload").mapInPandas(extract, BMP_SCHEMA)


PNG_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("bit_depth", T.IntegerType(), True),
        T.StructField("color_type", T.IntegerType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, raster: bytes) -> bytes:
    """Minimal 8-bit truecolor PNG encoder (filter type 0 on every
    scanline) over a packed-RGB raster -- the write half of the real
    resize path; parse_png decodes its output bit-exactly."""
    stride = width * 3
    if len(raster) != stride * height:
        raise ValueError(
            f"raster is {len(raster)} bytes, expected {stride * height}"
        )
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw.extend(raster[y * stride : (y + 1) * stride])
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def resize_raster_nn(
    raster: bytes, w: int, h: int, out_w: int, out_h: int
) -> bytes:
    """Nearest-neighbor resample of a packed-RGB raster: output pixel
    (X, Y) copies source pixel (X*w // out_w, Y*h // out_h) -- pure
    integer arithmetic, so an oracle can reproduce the resized channel
    sums relationally."""
    out = bytearray(out_w * out_h * 3)
    for Y in range(out_h):
        sy = Y * h // out_h
        src_row = sy * w * 3
        dst_row = Y * out_w * 3
        for X in range(out_w):
            s = src_row + (X * w // out_w) * 3
            d = dst_row + X * 3
            out[d : d + 3] = raster[s : s + 3]
    return bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def parse_png(b: bytes) -> tuple[int, int, int, int, tuple[int, int, int]]:
    """REAL image decode for 8-bit truecolor PNG: chunk walk with CRC-32
    verification, IHDR parse, zlib inflate of the concatenated IDAT
    stream, and full scanline UNFILTERING (all five filter types: None /
    Sub / Up / Average / Paeth, per the PNG spec) -- the fourth and
    deepest pure-stdlib codec here (PPM/WAV/BMP parse headers; this one
    reconstructs every pixel). Returns (width, height, bit_depth,
    color_type, (sum_r, sum_g, sum_b)) with exact integer channel sums
    over the reconstructed raster. Raises NotImplementedError for
    non-PNG payloads and for PNG variants beyond 8-bit non-interlaced
    truecolor (palette, alpha, 16-bit, Adam7); ValueError for malformed
    conforming payloads (bad CRC, short raster, unknown filter)."""
    width, height, bit_depth, color_type, raster = parse_png_raster(b)
    sums = [0, 0, 0]
    for i in range(0, len(raster), 3):
        sums[0] += raster[i]
        sums[1] += raster[i + 1]
        sums[2] += raster[i + 2]
    return width, height, bit_depth, color_type, (sums[0], sums[1], sums[2])


def parse_png_raster(b: bytes) -> tuple[int, int, int, int, bytes]:
    """parse_png's decode core, returning the reconstructed packed-RGB
    raster itself (stride = 3*width, height rows) -- the input the real
    resize path consumes."""
    if len(b) < 8 or b[:8] != _PNG_SIG:
        raise NotImplementedError(
            "only PNG payloads decode here; pass fake=True for other formats"
        )
    pos = 8
    width = height = bit_depth = color_type = None
    idat = bytearray()
    while pos < len(b):
        if pos + 8 > len(b):
            raise ValueError("PNG chunk header truncated")
        (length,), ctype = struct.unpack(">I", b[pos : pos + 4]), b[pos + 4 : pos + 8]
        # one bound covers data AND the 4-byte CRC trailer: a payload cut
        # inside either must raise ValueError, not a raw struct.error
        if pos + 12 + length > len(b):
            raise ValueError("PNG chunk truncated")
        data = b[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", b[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8 or color_type != 2 or interlace != 0:
                raise NotImplementedError(
                    f"PNG bit_depth={bit_depth} color_type={color_type} "
                    f"interlace={interlace}: only 8-bit non-interlaced "
                    "truecolor decodes here"
                )
            if comp != 0 or filt != 0:
                raise ValueError("PNG compression/filter method must be 0")
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG has no IHDR")
    if width <= 0 or height <= 0:
        raise ValueError(f"PNG dimensions out of range: {width}x{height}")
    raw = zlib.decompress(bytes(idat))
    bpp = 3
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"PNG raster is {len(raw)} bytes, expected {(stride + 1) * height}"
        )
    prev = bytearray(stride)
    raster = bytearray()
    for y in range(height):
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        ftype = raw[y * (stride + 1)]
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG filter type {ftype} unknown")
        raster.extend(row)
        prev = row
    return width, height, bit_depth, color_type, bytes(raster)


def synth_png(width: int, height: int, filters: bool = True) -> bytes:
    """Deterministic 8-bit truecolor PNG: pixel (x, y) has channels
    r=(7x+3y)%256, g=(5x+11y)%256, b=(x+y)%256 -- arithmetic an oracle can
    reproduce relationally. With ``filters`` True, scanline y uses filter
    type y%3 in {None, Sub, Up} so the decoder's unfiltering is actually
    exercised end-to-end (Average/Paeth are unit-tested)."""
    chunk = _png_chunk
    bpp = 3
    stride = width * bpp
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = bytearray(stride)
        for x in range(width):
            row[x * 3] = (7 * x + 3 * y) % 256
            row[x * 3 + 1] = (5 * x + 11 * y) % 256
            row[x * 3 + 2] = (x + y) % 256
        ftype = (y % 3) if filters else 0
        enc = bytearray(row)
        if ftype == 1:
            for i in range(stride - 1, bpp - 1, -1):
                enc[i] = (enc[i] - row[i - bpp]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                enc[i] = (enc[i] - prev[i]) & 0xFF
        raw.append(ftype)
        raw.extend(enc)
        prev = bytes(row)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def png_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Batch PNG decode (mapInPandas, Arrow-batched): fake=False runs the
    real chunk-walk + inflate + unfilter pixel decode, fake=True
    substitutes deterministic md5-derived metadata (zero channel sums)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        none5 = (None, None, None, None, (None, None, None))
        for pdf in batches:
            if fake:
                metas = pdf["payload"].map(
                    lambda b: (
                        (*_fake_dims(hashlib.md5(bytes(b)).hexdigest()), 8, 2, (0, 0, 0))
                        if b is not None
                        else none5
                    )
                )
            else:
                metas = pdf["payload"].map(
                    lambda b: parse_png(bytes(b)) if b is not None else none5
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": metas.map(lambda t: t[0]),
                    "height": metas.map(lambda t: t[1]),
                    "bit_depth": metas.map(lambda t: t[2]),
                    "color_type": metas.map(lambda t: t[3]),
                    "sum_r": metas.map(lambda t: t[4][0]),
                    "sum_g": metas.map(lambda t: t[4][1]),
                    "sum_b": metas.map(lambda t: t[4][2]),
                }
            )

    return media.select("media_id", "payload").mapInPandas(extract, PNG_SCHEMA)


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("dhash", T.LongType(), True),
    ]
)


def dhash_from_raster(width: int, height: int, raster: bytes) -> int:
    """Difference hash (dHash, the standard perceptual image fingerprint)
    over an 8-bit RGB raster: gray = R channel, bit (x, y) set iff
    gray(x+1, y) > gray(x, y); bit index y*(width-1) + x. A width-9
    image yields 8 bits per row -- the classic 9-wide dHash layout.
    (width-1)*height must stay <= 62 so the BIGINT fingerprint keeps the
    sign bit clear for the banded Hamming join."""
    nbits = (width - 1) * height
    if nbits > 62:
        raise ValueError(
            f"dhash needs (width-1)*height <= 62 bits, got {nbits}"
        )
    h = 0
    for y in range(height):
        row = y * width * 3
        for x in range(width - 1):
            if raster[row + (x + 1) * 3] > raster[row + x * 3]:
                h |= 1 << (y * (width - 1) + x)
    return h


def dhash_features(media: DataFrame) -> DataFrame:
    """Perceptual-hash extraction through the REAL decode path: each
    binary payload runs the pure-Python P6 parser (``parse_ppm_raster``
    -- header walk + raster validation, no codec libs) and the decoded
    raster is dHashed row-batch-at-a-time via mapInPandas (Arrow). The
    dimensions and the hash both come from the BYTES the decoder read,
    so a decode bug cannot cancel out of a downstream comparison against
    an oracle that predicts the hash analytically."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        none3 = (None, None, None)

        def one(b) -> tuple[int | None, int | None, int | None]:
            if b is None:
                return none3
            w, h, raster = parse_ppm_raster(bytes(b))
            return w, h, dhash_from_raster(w, h, raster)

        for pdf in batches:
            metas = pdf["payload"].map(one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": metas.map(lambda t: t[0]),
                    "height": metas.map(lambda t: t[1]),
                    "dhash": metas.map(lambda t: t[2]),
                }
            )

    return media.select("media_id", "payload").mapInPandas(extract, DHASH_SCHEMA)
