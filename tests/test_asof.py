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
