"""Multimodal binary-column plumbing (operators/multimodal.py): Arrow
batch shapes, payload pruning, fan-out, and the decode stub contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from gmail_bigquery_etl_spark.catalog import load_table
from gmail_bigquery_etl_spark.operators.multimodal import (
    decode_features,
    documents_as_media,
    resize_media,
    sample_frames,
)

SMOKE_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return documents_as_media(load_table(spark, SMOKE_SF, "documents"))


def test_resize_emits_fixed_dims_and_payload_size(spark, media):
    out = resize_media(media, width=64, height=64, fake=True)
    rows = out.collect()
    assert len(rows) == media.count()
    n_out = 64 * 64 // 64
    assert all(r.width == 64 and r.height == 64 for r in rows)
    assert all(len(r.payload) == n_out for r in rows)
    # deterministic: same input -> same resized payload
    again = {r.media_id: bytes(r.payload) for r in resize_media(media, 64, 64).collect()}
    assert all(bytes(r.payload) == again[r.media_id] for r in rows)


def test_sample_frames_fan_out(spark, media):
    frames = sample_frames(media, every_n=2, fake=True)
    per_media = frames.groupBy("media_id").agg(F.count("*").alias("n"))
    sizes = media.select(
        "media_id", (F.col("meta.n_bytes") / 100 + 1).cast("long").alias("nf")
    )
    joined = per_media.join(sizes, "media_id")
    bad = joined.filter(
        F.col("n") != F.ceil(F.col("nf") / 2).cast("long")
    ).count()
    assert bad == 0
    idxs = frames.select("frame_idx").distinct()
    assert all(r.frame_idx % 2 == 0 for r in idxs.collect())


def test_parse_ppm_dims_real_decode():
    """The pure-Python PPM (P6) parser: plain headers, '#' comments,
    16-bit maxval rasters, and loud failures on truncation/foreign
    formats."""
    from gmail_bigquery_etl_spark.operators.multimodal import parse_ppm_dims

    assert parse_ppm_dims(b"P6\n4 3\n255\n" + b"x" * 36) == (4, 3)
    assert (
        parse_ppm_dims(b"P6 # comment\n# another\n 4\t3 255 " + b"\0" * 36)
        == (4, 3)
    )
    # maxval > 255 -> 2 bytes per sample
    assert parse_ppm_dims(b"P6\n2 2\n65535\n" + b"y" * 24) == (2, 2)
    with pytest.raises(ValueError, match="raster"):
        parse_ppm_dims(b"P6\n4 3\n255\n" + b"x" * 35)
    with pytest.raises(NotImplementedError):
        parse_ppm_dims(b"\x89PNG\r\n")
    with pytest.raises(NotImplementedError):
        parse_ppm_dims(b"plain text payload")
    # starts with "P6" but isn't PPM header grammar -> honest-stub contract,
    # not a leaked ValueError
    with pytest.raises(NotImplementedError):
        parse_ppm_dims(b"P6ters of the deep")
    # degenerate dims must not "validate" against an empty raster
    with pytest.raises(ValueError, match="dimensions"):
        parse_ppm_dims(b"P6\n0 5\n255\n")


def test_real_decode_path_is_explicitly_stubbed(spark, media):
    """fake=False on NON-PPM payloads must fail loudly (NotImplementedError
    inside the worker), never silently fake."""
    with pytest.raises(PythonException, match="NotImplementedError"):
        decode_features(media.limit(1), fake=False).collect()
    with pytest.raises(PythonException, match="NotImplementedError"):
        resize_media(media.limit(1), 8, 8, fake=False).collect()
    with pytest.raises(PythonException, match="NotImplementedError"):
        sample_frames(media.limit(1), fake=False).collect()


def test_metadata_query_prunes_payload(spark, media):
    """Metadata-only aggregation must not read the payload bytes: the scan
    ReadSchema contains text only via meta derivation... assert the payload
    column is absent from the aggregation plan's scan when metadata is
    precomputed parquet. Here media is derived from text, so instead assert
    the plan has no decode/mapInPandas and payload is not in the agg."""
    agg = media.groupBy("meta.source").agg(F.sum("meta.n_bytes").alias("b"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan.lower()


def test_parse_wav_meta_real_decode():
    """The stdlib PCM WAV parser: agreement with the stdlib `wave` writer
    (a fully independent RIFF implementation), chunk-walk robustness, and
    loud failures on truncation / compressed formats / foreign payloads."""
    import io
    import wave as wave_mod

    from gmail_bigquery_etl_spark.operators.multimodal import parse_wav_meta

    for ch, rate, sampwidth, nframes in [
        (1, 8000, 1, 37),
        (2, 44100, 2, 480),
        (2, 16000, 2, 1),
    ]:
        buf = io.BytesIO()
        w = wave_mod.open(buf, "wb")
        w.setnchannels(ch)
        w.setframerate(rate)
        w.setsampwidth(sampwidth)
        w.writeframes(b"\x78" * (nframes * ch * sampwidth))
        w.close()
        assert parse_wav_meta(buf.getvalue()) == (ch, rate, sampwidth * 8, nframes)

    buf = io.BytesIO()
    w = wave_mod.open(buf, "wb")
    w.setnchannels(1)
    w.setframerate(8000)
    w.setsampwidth(2)
    w.writeframes(b"\x01\x02" * 10)
    w.close()
    good = buf.getvalue()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="RIFF size"):
        parse_wav_meta(good[:-4])  # truncated: size field disagrees
    with _pytest.raises(NotImplementedError):
        parse_wav_meta(b"\x89PNG\r\n")
    with _pytest.raises(NotImplementedError):
        parse_wav_meta(b"OggS" + b"\0" * 40)
    # compressed (non-PCM) format tag -> honest stub, not a parse error
    import struct

    mulaw = bytearray(good)
    mulaw[20:22] = struct.pack("<H", 7)  # format 7 = mu-law
    with _pytest.raises(NotImplementedError, match="compressed"):
        parse_wav_meta(bytes(mulaw))
    # corrupt block_align -> ValueError
    bad_align = bytearray(good)
    bad_align[32:34] = struct.pack("<H", 5)
    with _pytest.raises(ValueError, match="block_align"):
        parse_wav_meta(bytes(bad_align))


def test_audio_features_fake_path(spark, media):
    """fake=True substitutes deterministic md5-derived audio metadata for
    ANY payload -- same Arrow plumbing, no codec."""
    from gmail_bigquery_etl_spark.operators.multimodal import audio_features

    out = audio_features(media.limit(20), fake=True).collect()
    assert len(out) == 20
    assert all(r.n_channels in (1, 2) for r in out)
    assert all(r.sample_rate in (8000, 12000, 16000, 20000) for r in out)
    assert all(r.bits_per_sample in (8, 16) for r in out)


def test_parse_bmp_meta_real_decode():
    import struct

    from gmail_bigquery_etl_spark.operators.multimodal import parse_bmp_meta

    def build(w, h, bpp=24, compression=0, dib=40, corrupt_size=False):
        stride = (w * bpp // 8 + 3) // 4 * 4
        raster = stride * abs(h)
        size = 54 + raster
        head = b"BM" + struct.pack(
            "<III", size + (1 if corrupt_size else 0), 0, 54
        )
        info = struct.pack("<IiiHHI", dib, w, h, 1, bpp, compression)
        info += b"\x00" * (40 - len(info))
        return head + info + b"x" * raster

    assert parse_bmp_meta(build(5, 3)) == (5, 3, 24)
    assert parse_bmp_meta(build(4, 2, bpp=32)) == (4, 2, 32)
    # top-down (negative height) reports positive height
    assert parse_bmp_meta(build(5, -3)) == (5, 3, 24)
    # row padding matters: width 5 @24bpp pads 15 -> 16-byte rows
    with pytest.raises(ValueError):
        parse_bmp_meta(build(5, 3)[:-1])
    with pytest.raises(ValueError):
        parse_bmp_meta(build(5, 3, corrupt_size=True))
    with pytest.raises(NotImplementedError):
        parse_bmp_meta(b"PNG\x00" * 20)
    with pytest.raises(NotImplementedError):
        parse_bmp_meta(build(5, 3, compression=1))  # BI_RLE8
    with pytest.raises(NotImplementedError):
        parse_bmp_meta(build(5, 3, dib=124))  # BITMAPV5HEADER


def test_parse_png_real_decode_all_filters():
    """Full-pixel PNG decode: handcrafted IDAT streams exercise the two
    filter types the generator doesn't emit (Average, Paeth) plus the
    malformed-payload contracts."""
    import struct
    import zlib

    import pytest

    from gmail_bigquery_etl_spark.operators.multimodal import (
        parse_png,
        synth_png,
    )

    # Generator roundtrip (filters None/Sub/Up) -- exact channel sums.
    w, h = 6, 5
    got = parse_png(synth_png(w, h))
    want = (
        sum((7 * x + 3 * y) % 256 for x in range(w) for y in range(h)),
        sum((5 * x + 11 * y) % 256 for x in range(w) for y in range(h)),
        sum((x + y) % 256 for x in range(w) for y in range(h)),
    )
    assert got == (w, h, 8, 2, want)

    # Handcraft a 2x2 image written with Average (row 0) and Paeth (row 1).
    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    pix = [[(10, 20, 30), (40, 50, 60)], [(70, 80, 90), (100, 110, 120)]]
    raw = bytearray()
    # Row 0, filter 3 (Average): left avg only (prev row = zeros).
    raw.append(3)
    row0 = [v for p in pix[0] for v in p]
    enc0 = list(row0)
    for i in range(len(enc0)):
        left = row0[i - 3] if i >= 3 else 0
        enc0[i] = (row0[i] - (left + 0) // 2) & 0xFF
    raw.extend(enc0)
    # Row 1, filter 4 (Paeth).
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    row1 = [v for p in pix[1] for v in p]
    enc1 = list(row1)
    for i in range(len(enc1)):
        left = row1[i - 3] if i >= 3 else 0
        up = row0[i]
        ul = row0[i - 3] if i >= 3 else 0
        enc1[i] = (row1[i] - paeth(left, up, ul)) & 0xFF
    raw.append(4)
    raw.extend(enc1)
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    png = (
        sig
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    flat = [v for r in pix for p in r for v in p]
    assert parse_png(png) == (
        2,
        2,
        8,
        2,
        (sum(flat[0::3]), sum(flat[1::3]), sum(flat[2::3])),
    )

    # Contracts: non-PNG -> NotImplementedError; corrupted CRC -> ValueError.
    with pytest.raises(NotImplementedError):
        parse_png(b"JFIF not a png")
    bad = bytearray(png)
    bad[-5] ^= 0xFF  # flip a byte of IEND's CRC
    with pytest.raises(ValueError):
        parse_png(bytes(bad))
    # 16-bit / palette variants are honest stubs.
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    png16 = sig + chunk(b"IHDR", ihdr16) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        parse_png(png16)


def test_parse_png_truncation_raises_value_error():
    """Payloads cut inside a chunk's data OR its 4-byte CRC trailer, and a
    trailing partial chunk header, must all raise ValueError -- never a
    raw struct.error from an unchecked unpack."""
    import pytest

    from gmail_bigquery_etl_spark.operators.multimodal import (
        parse_png,
        synth_png,
    )

    good = synth_png(4, 3)
    with pytest.raises(ValueError):  # cut inside IDAT data
        parse_png(good[:40])
    with pytest.raises(ValueError):  # cut inside a CRC trailer
        parse_png(good[: len(good) - 2])
    with pytest.raises(ValueError):  # trailing partial chunk header
        parse_png(good[:-12] + b"\x00\x00")


def test_resize_real_roundtrip_nearest_neighbor():
    """resize_media(fake=False): PNG and PPM rasters NN-resample to exact
    integer-arithmetic channel sums after re-encode + re-decode."""
    from gmail_bigquery_etl_spark.operators.multimodal import (
        encode_png,
        parse_png,
        parse_png_raster,
        parse_ppm_raster,
        resize_raster_nn,
        synth_png,
    )

    w, h, out_w, out_h = 9, 6, 4, 5
    _, _, _, _, raster = parse_png_raster(synth_png(w, h))
    for src in (raster, None):  # png raster, then the same via ppm
        if src is None:
            pw, ph, src = parse_ppm_raster(b"P6\n9 6\n255\n" + raster)
            assert (pw, ph) == (w, h)
        enc = encode_png(out_w, out_h, resize_raster_nn(src, w, h, out_w, out_h))
        W, H, _, _, sums = parse_png(enc)
        want = [0, 0, 0]
        for Y in range(out_h):
            for X in range(out_w):
                sx, sy = X * w // out_w, Y * h // out_h
                want[0] += (7 * sx + 3 * sy) % 256
                want[1] += (5 * sx + 11 * sy) % 256
                want[2] += (sx + sy) % 256
        assert (W, H) == (out_w, out_h) and sums == tuple(want)


def test_parse_anim_real_decode():
    """ANM1 container: header parse, exact-length validation, and frame
    slicing must read the RIGHT byte ranges."""
    import struct

    from gmail_bigquery_etl_spark.operators.multimodal import (
        anim_frame,
        parse_anim,
    )

    w, h, nf = 3, 2, 4
    frames = [bytes([10 * k + 1]) * (w * h * 3) for k in range(nf)]
    payload = b"ANM1" + struct.pack("<HHH", nf, w, h) + b"".join(frames)
    assert parse_anim(payload) == (nf, w, h)
    for k in range(nf):
        assert anim_frame(payload, k) == frames[k]

    # Wrong format -> honest stub (NotImplementedError), like non-P6 PPM.
    with pytest.raises(NotImplementedError):
        parse_anim(b"RIFF" + payload[4:])
    # Claimed ANM1 but malformed -> loud ValueError, never a mis-slice.
    with pytest.raises(ValueError, match="truncated"):
        parse_anim(payload[:8])
    with pytest.raises(ValueError, match="length mismatch"):
        parse_anim(payload[:-1])
    with pytest.raises(ValueError, match="length mismatch"):
        parse_anim(payload + b"\x00")
    with pytest.raises(ValueError, match="positive"):
        parse_anim(b"ANM1" + struct.pack("<HHH", 0, w, h))
    with pytest.raises(ValueError, match="out of range"):
        anim_frame(payload, nf)


def test_sample_frames_real_path(spark):
    """fake=False over synthesized ANM1 payloads: every 2nd frame, with
    byte sums proving the parser sliced frame k (not k-1 or k+1)."""
    import struct

    from gmail_bigquery_etl_spark.operators.multimodal import sample_frames

    w, h, nf = 2, 2, 5
    size = w * h * 3
    frames = [bytes([7 * k + 3]) * size for k in range(nf)]
    payload = b"ANM1" + struct.pack("<HHH", nf, w, h) + b"".join(frames)
    media = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    rows = {
        r["frame_idx"]: r
        for r in sample_frames(media, every_n=2, fake=False).collect()
    }
    assert sorted(rows) == [0, 2, 4]
    for k, r in rows.items():
        assert (r["width"], r["height"]) == (w, h)
        assert r["pixel_sum"] == (7 * k + 3) * size


def test_parse_wav_samples_real_decode():
    """Sample extraction: biased-128 centering for 8-bit, signed LE for
    16-bit, and the data-chunk offset must be honored exactly."""
    import struct

    from gmail_bigquery_etl_spark.operators.multimodal import (
        parse_wav_samples,
    )

    def wav(ch, rate, bits, frames_bytes):
        block = ch * bits // 8
        return (
            b"RIFF"
            + struct.pack("<I", 36 + len(frames_bytes))
            + b"WAVEfmt "
            + struct.pack(
                "<IHHIIHH", 16, 1, ch, rate, rate * block, block, bits
            )
            + b"data"
            + struct.pack("<I", len(frames_bytes))
            + frames_bytes
        )

    b8 = wav(1, 8000, 8, bytes([0, 128, 255, 200]))
    assert parse_wav_samples(b8) == (1, 8000, 8, [-128, 0, 127, 72])

    b16 = wav(2, 16000, 16, struct.pack("<4h", -32768, -1, 0, 32767))
    assert parse_wav_samples(b16) == (2, 16000, 16, [-32768, -1, 0, 32767])

    with pytest.raises(NotImplementedError, match="8/16"):
        parse_wav_samples(wav(1, 8000, 32, b"\x00" * 8))


def test_audio_window_stats_window_boundaries(spark):
    """Exact moments per 4-frame window, including the ragged tail."""
    import struct

    from gmail_bigquery_etl_spark.operators.multimodal import (
        audio_window_stats,
    )

    vals = [130, 126, 128, 132, 120, 128]  # centered: 2,-2,0,4,-8,0
    data = bytes(vals)
    payload = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    media = spark.createDataFrame(
        [(7, bytearray(payload))], "media_id long, payload binary"
    )
    rows = {
        r.window_idx: (r.n_samples, r.sum_x, r.sum_sq)
        for r in audio_window_stats(media, window=4).collect()
    }
    assert rows == {0: (4, 4, 24), 1: (2, -8, 64)}


def test_parse_wav_truncated_data_raises_value_error():
    """A WAV whose RIFF size field was patched to agree with a TRUNCATED
    payload (so the outer size check passes) must still raise ValueError
    -- for 16-bit via the chunk/data-extent guards, never a bare
    struct.error, and for 8-bit never a silent short decode."""
    import io
    import struct
    import wave as wave_mod

    import pytest as _pytest

    from gmail_bigquery_etl_spark.operators.multimodal import (
        parse_wav_meta,
        parse_wav_samples,
    )

    for sampwidth in (1, 2):
        buf = io.BytesIO()
        w = wave_mod.open(buf, "wb")
        w.setnchannels(1)
        w.setframerate(8000)
        w.setsampwidth(sampwidth)
        w.writeframes(b"\x40" * (20 * sampwidth))
        w.close()
        good = buf.getvalue()
        cut = bytearray(good[: len(good) - 6 * sampwidth])
        cut[4:8] = struct.pack("<I", len(cut) - 8)  # self-consistent RIFF size
        with _pytest.raises(ValueError):
            parse_wav_meta(bytes(cut))
        with _pytest.raises(ValueError):
            parse_wav_samples(bytes(cut))
