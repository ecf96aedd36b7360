"""As-of join operator vs the pandas.merge_asof spec (backward,
inclusive ties, tolerance)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

TS = dt.datetime


def _ts(h, m=0):
    return TS(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def frames():
    left = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3],
            "ts": [_ts(1), _ts(5), _ts(9), _ts(2), _ts(3), _ts(4)],
            "lv": [10, 11, 12, 20, 21, 30],
        }
    )
    right = pd.DataFrame(
        {
            "k": [1, 1, 2, 9],
            "ts": [_ts(2), _ts(5), _ts(3), _ts(0)],
            "price": [1.5, 2.5, 7.0, 99.0],
        }
    )
    return left, right


def _spec(left, right, tolerance=None):
    kwargs = {}
    if tolerance is not None:
        kwargs["tolerance"] = pd.Timedelta(seconds=tolerance)
    return pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
        **kwargs,
    )


def _got(spark, left, right, tolerance=None):
    from gmail_bigquery_etl_spark.operators.asof import asof_join

    l_df = spark.createDataFrame(left)
    r_df = spark.createDataFrame(right)
    out = asof_join(
        l_df, r_df, on="k", tolerance_seconds=tolerance
    ).toPandas()
    return out


def _cmp(got, want):
    g = {
        (r.k, r.ts): (None if pd.isna(r.price) else r.price)
        for r in got.itertuples()
    }
    w = {
        (r.k, r.ts): (None if pd.isna(r.price) else r.price)
        for r in want.itertuples()
    }
    assert g == w


def test_backward_inclusive_matches_pandas(spark, frames):
    left, right = frames
    _cmp(_got(spark, left, right), _spec(left, right))
    # spot-check semantics: equal-ts right row matches (inclusive),
    # key with no right rows yields null
    got = _got(spark, left, right).set_index(["k", "ts"])
    assert got.loc[(1, _ts(5)), "price"] == 2.5
    assert pd.isna(got.loc[(3, _ts(4)), "price"])


def test_tolerance_matches_pandas(spark, frames):
    left, right = frames
    tol = 3600.0  # 1 hour lookback
    _cmp(_got(spark, left, right, tol), _spec(left, right, tol))
    got = _got(spark, left, right, tol).set_index(["k", "ts"])
    # (1, 09:00): last right at 05:00 is 4h old -> nulled by tolerance
    assert pd.isna(got.loc[(1, _ts(9)), "price"])


def test_asof_ts_column_reports_match_time(spark, frames):
    left, right = frames
    got = _got(spark, left, right).set_index(["k", "ts"])
    assert got.loc[(1, _ts(9)), "_asof_ts"] == _ts(5)


def test_null_right_values_carried_atomically(spark):
    """A matched right row's NULL field must be carried as NULL (pandas
    parity), not back-filled from an older right row -- the whole-row
    struct carry. _asof_ts must point at the row whose values came along."""
    from gmail_bigquery_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, _ts(6), 100)], "k int, ts timestamp, lv int"
    )
    right = spark.createDataFrame(
        [(1, _ts(2), 1.5, "old"), (1, _ts(5), None, "new")],
        "k int, ts timestamp, price double, tag string",
    )
    row = asof_join(left, right, on="k").collect()[0]
    want = pd.merge_asof(
        left.toPandas().sort_values("ts"),
        right.toPandas().sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
    ).iloc[0]
    assert row._asof_ts == _ts(5)
    assert row.tag == "new" == want.tag
    assert row.price is None and pd.isna(want.price)


def test_subsecond_tolerance(spark):
    """Tolerance compares fractional epoch seconds: a 0.5s lookback keeps a
    0.3s-old match and nulls a 0.7s-old one."""
    from gmail_bigquery_etl_spark.operators.asof import asof_join

    base = _ts(1)
    ms = dt.timedelta
    left = spark.createDataFrame(
        [(1, base + ms(seconds=1.0)), (2, base + ms(seconds=1.0))],
        "k int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, base + ms(seconds=0.7), 1.0), (2, base + ms(seconds=0.3), 2.0)],
        "k int, ts timestamp, price double",
    )
    got = {
        r.k: r.price
        for r in asof_join(left, right, on="k", tolerance_seconds=0.5).collect()
    }
    assert got == {1: 1.0, 2: None}


def test_numeric_ts_columns(spark):
    """Numeric (epoch-style) ts columns join and respect tolerance."""
    from gmail_bigquery_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100), (1, 200)], "k int, ts bigint")
    right = spark.createDataFrame(
        [(1, 90, 5.0), (1, 160, 6.0)], "k int, ts bigint, price double"
    )
    got = {
        (r.k, r.ts): (r.price, r._asof_ts)
        for r in asof_join(left, right, on="k", tolerance_seconds=15).collect()
    }
    assert got == {(1, 100): (5.0, 90), (1, 200): (None, None)}


def test_unsupported_ts_type_raises(spark):
    from gmail_bigquery_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, "a")], "k int, ts string")
    right = spark.createDataFrame([(1, "b", 1.0)], "k int, ts string, v double")
    with pytest.raises(TypeError, match="timestamp/date/numeric"):
        asof_join(left, right, on="k")
