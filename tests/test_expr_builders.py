"""Optimization r11 focused tests: the single-F.expr expression builders
must be BIT-IDENTICAL to the structured (per-F.lit / python-lambda HOF)
builders they replaced.

The r11 optimization round rebuilt several hot constructors as one parsed
SQL expression (driver py4j roundtrips dominated query BUILD time); these
tests pin that the parsed trees compute the same doubles/ints/strings as
the structured paths, element for element -- the property every oracle
gate in the corpus relies on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.functions import vectors as V


@pytest.fixture(scope="module")
def vec_df(spark):
    # awkward values on purpose: negatives, denormal-ish, exact halves,
    # zero vector rows exercise the nullif guard
    rows = [
        (1, [0.5, -1.25, 3.0, 1e-7], [2.0, 0.25, -0.5, 123.456]),
        (2, [0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0]),
        (3, [-7.5, 2.5, 0.125, 9.0], [0.1, 0.2, 0.3, 0.4]),
    ]
    return spark.createDataFrame(
        [(i, [float(x) for x in a], [float(x) for x in b]) for i, a, b in rows],
        "id int, a array<float>, b array<float>",
    )


def _both(df, expr_col, struct_col):
    out = df.select(
        expr_col.alias("e"), struct_col.alias("s")
    ).collect()
    for r in out:
        assert r.e == r.s or (r.e is None and r.s is None), (r.e, r.s)


def test_dot_str_path_matches_column_path(vec_df):
    _both(vec_df, V.dot("a", "b"), V.dot(F.col("a"), F.col("b")))


def test_l2_norm_str_path_matches_column_path(vec_df):
    _both(vec_df, V.l2_norm("a"), V.l2_norm(F.col("a")))


def test_cosine_str_path_matches_column_path(vec_df):
    _both(
        vec_df,
        V.cosine_similarity("a", "b"),
        V.cosine_similarity(F.col("a"), F.col("b")),
    )


def test_max_abs_str_path_matches_column_path(vec_df):
    _both(vec_df, V.max_abs("a"), V.max_abs(F.col("a")))


def test_int_dot_str_path_matches_column_path(spark):
    df = spark.createDataFrame(
        [(1, [127, -127, 3], [5, 9, -2]), (2, [0, 0, 0], [1, 2, 3])],
        "id int, a array<bigint>, b array<bigint>",
    )
    _both(df, V.int_dot("a", "b"), V.int_dot(F.col("a"), F.col("b")))


def test_lit_double_array_roundtrips_ieee(spark):
    from gmail_bigquery_etl_spark.operators.similarity import lit_double_array

    vals = [1.5e-05, -0.5, 2.0, 1e22, 0.1 + 0.2, -7.25, 3.141592653589793]
    got = spark.range(1).select(lit_double_array(vals).alias("v")).head().v
    assert got == vals  # exact equality: repr round-trips IEEE754


def test_hyperplane_bucket_str_path_matches_column_path(spark):
    from gmail_bigquery_etl_spark.operators.similarity import hyperplane_bucket

    df = spark.createDataFrame(
        [(i, [float((i * 31 + j * 7) % 11 - 5) for j in range(64)])
         for i in range(40)],
        "vec_id int, embedding array<float>",
    )
    out = df.select(
        hyperplane_bucket("embedding", n_planes=8, dim=64).alias("e"),
        hyperplane_bucket(F.col("embedding"), n_planes=8, dim=64).alias("s"),
    ).collect()
    assert all(r.e == r.s for r in out)
    assert any("1" in r.e and "0" in r.e for r in out)  # non-vacuous


def test_pq_code_col_str_path_matches_column_path(spark):
    from gmail_bigquery_etl_spark.operators.similarity import pq_code_col

    cb = [
        (lab, [float((lab * 13 + j) % 7 - 3) for j in range(8)])
        for lab in range(6)
    ]
    df = spark.createDataFrame(
        [(i, [float((i * 17 + j * 3) % 9 - 4) for j in range(64)])
         for i in range(40)],
        "vec_id int, embedding array<float>",
    )
    out = df.select(
        pq_code_col("embedding", cb, 2, 8).alias("e"),
        pq_code_col(F.col("embedding"), cb, 2, 8).alias("s"),
    ).collect()
    assert all(r.e == r.s for r in out)
    assert len({r.e for r in out}) > 1  # non-vacuous: multiple codes hit


def test_kmeans_assign_matches_unrolled_reference(spark):
    """The one-expr _assign must reproduce a hand-computed argmin with
    smallest-cid tie-breaks over exact integer L2^2."""
    from gmail_bigquery_etl_spark.operators.kmeans import _assign

    qv = spark.createDataFrame(
        [(1, [0, 0]), (2, [10, 0]), (3, [5, 0]), (4, [-3, 4])],
        "vec_id int, v array<bigint>",
    )
    cents = [(0, [0, 0]), (1, [10, 0]), (2, [5, 0])]
    got = {
        r.vec_id: (r.cluster, r.dist) for r in _assign(qv, cents).collect()
    }
    assert got == {
        1: (0, 0),
        2: (1, 0),
        3: (2, 0),
        4: (0, 25),  # ties to no one; d0=25 < d1=185 < d2=80
    }
