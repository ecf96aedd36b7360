"""Pathological-content robustness: every declared query must survive a
tiny fixture stuffed with the edge rows real corpora contain -- empty /
whitespace-only / NULL text, zero-norm embeddings, NULL event values,
malformed JSON props, tied timestamps, single-symbol vocabularies. ANSI
mode turns latent index/div-by-zero bugs into crashes, which is the
point: this sweep found (now fixed) an ANSI INVALID_ARRAY_INDEX in the
BPE pair stage (filter-reorder past element_at) and a DIVIDE_BY_ZERO in
Efraimidis-Spirakis keys for weight-0 documents."""

from __future__ import annotations

from datetime import datetime

import pytest

from gmail_bigquery_etl_spark.queries import ALL_QUERIES


@pytest.fixture(scope="module")
def nasty_sf(spark, tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("nasty_sf"))

    def w(df, name):
        df.write.mode("overwrite").parquet(f"{d}/{name}.parquet")

    w(
        spark.createDataFrame(
            [
                (0, "", "en", "web", 0),
                (1, "solo", "en", "web", 4),
                (2, "   ", "en", "web", 3),
                (3, None, None, "web", None),
                (4, "a b c d e f g h", "en", "mail", 15),
            ],
            "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint",
        ),
        "documents",
    )
    w(
        spark.createDataFrame(
            [(0, [0.0] * 64, 0), (1, [1.0] + [0.0] * 63, 1), (2, [0.5] * 64, 2)],
            "vec_id bigint, embedding array<float>, label int",
        ),
        "embeddings",
    )
    w(
        spark.createDataFrame(
            [
                (0, datetime(2024, 1, 1), 1, "click", None, "{not json"),
                (1, datetime(2024, 1, 1), 1, "click", 1.0, None),
                (2, datetime(2024, 1, 1), 1, "purchase", 0.0, '{"k": 1}'),
                (3, datetime(2024, 3, 1), 2, "view", -5.5, '{"k": null}'),
            ],
            "event_id bigint, ts timestamp, user_id bigint,"
            " event_type string, value double, props string",
        ),
        "events",
    )
    w(spark.createDataFrame([(0, "R0")], "r_regionkey bigint, r_name string"), "region")
    w(
        spark.createDataFrame(
            [(0, "N0", 0)], "n_nationkey bigint, n_name string, n_regionkey int"
        ),
        "nation",
    )
    w(
        spark.createDataFrame(
            [(0, "Customer#0", 0, 0.0, "SEG")],
            "c_custkey bigint, c_name string, c_nationkey int,"
            " c_acctbal double, c_mktsegment string",
        ),
        "customer",
    )
    w(
        spark.createDataFrame(
            [(0, "Supplier#0", 0, 0.0)],
            "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
        ),
        "supplier",
    )
    w(
        spark.createDataFrame(
            [(0, "x", "B", "T", 1, 1.0), (1, "small ring", "B", "T", 2, 2.0)],
            "p_partkey bigint, p_name string, p_brand string, p_type string,"
            " p_size int, p_retailprice double",
        ),
        "part",
    )
    w(
        spark.createDataFrame(
            [(0, 0, "O", 1.0, datetime(2024, 1, 1), "1-URGENT")],
            "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ),
        "orders",
    )
    w(
        spark.createDataFrame(
            [
                (
                    0, 1, 0, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                    datetime(2024, 1, 2),
                )
            ],
            "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
            " l_linenumber int, l_quantity double, l_extendedprice double,"
            " l_discount double, l_tax double, l_returnflag string,"
            " l_linestatus string, l_shipdate timestamp",
        ),
        "lineitem",
    )
    return d


def test_every_query_survives_pathological_rows(spark, nasty_sf):
    failures = []
    for name, fn in ALL_QUERIES.items():
        try:
            n = fn(spark, nasty_sf).count()
            assert n >= 0
        except Exception as ex:  # noqa: BLE001 - collecting a report
            failures.append(
                (name, type(ex).__name__, str(ex).splitlines()[0][:120])
            )
    assert not failures, failures


def test_text_pipeline_survives_giant_and_unicode_rows(spark):
    """Row-size skew + unicode: a multi-megabyte document and CJK/emoji/
    RTL/combining-mark documents must flow through the hot text operators
    (tokenize -> shingle -> simhash; quality; fingerprint) without
    crashing, and with counts that match a Python reference for the
    unicode rows (whitespace split and lower() are codepoint-safe)."""
    from pyspark.sql import functions as F

    from gmail_bigquery_etl_spark.functions.text import (
        token_count,
        whitespace_tokens,
    )
    from gmail_bigquery_etl_spark.operators.dedup import simhash

    giant = "token " * 500_000  # ~3 MB, 500k tokens
    rows = [
        (1, giant),
        (2, "今天 天气 很好"),      # CJK
        (3, "café naïve über"),                # accents
        (4, "\U0001f600 \U0001f680 \U0001f9e0"),              # emoji
        (5, "شكرا جزيلا"),  # RTL
        (6, "étoile été"),                  # combining marks
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n, r.fp is not None)
        for r in df.select(
            "doc_id",
            token_count("text").alias("n"),
            simhash("text").alias("fp"),
        ).collect()
    }
    for did, text in rows:
        assert got[did][0] == len(text.split()), did
        assert got[did][1], did
    # giant row round-trips the Arrow batch path too (mapInPandas)
    from gmail_bigquery_etl_spark.operators.multimodal import resize_media

    media = df.where(F.col("doc_id") == 1).select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    )
    assert resize_media(media, 4, 4, fake=True).count() == 1
