"""Property-based tests (hypothesis) for the header-extraction semantics
(SURVEY.md §5 item 6).

The spec is the reference idiom itself, reimplemented here in plain Python:
``next((h["value"] for h in headers if h["name"].lower() == name), None)``
(reference etl_service/main.py:199-202) and
``",".join(labels or [])`` (main.py:203). Random header lists -- duplicate
names, mixed case, missing entries, empty lists, unicode -- must agree
between the Python spec and the Spark HOF implementation batch-wise.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql import types as T

from gmail_bigquery_etl_spark.functions.headers import (
    flatten_labels,
    header_value,
    label_predicate,
)

HEADER_NAMES = st.sampled_from(
    ["Subject", "subject", "SUBJECT", "SuBjEcT", "From", "To", "Date", "X-Spam"]
)
HEADER_VALUES = st.one_of(
    st.none(), st.text(min_size=0, max_size=12)
)
HEADERS = st.lists(
    st.tuples(HEADER_NAMES, HEADER_VALUES), min_size=0, max_size=6
)
LABELS = st.one_of(
    st.none(),
    st.lists(
        st.sampled_from(["INBOX", "SENT", "TRASH", "SPAM", "DRAFT", "x"]),
        max_size=5,
    ),
)

ROW_SCHEMA = T.StructType(
    [
        T.StructField("i", T.LongType()),
        T.StructField(
            "headers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("labels", T.ArrayType(T.StringType())),
    ]
)


def _spec_header_value(headers, name):
    return next(
        (v for (n, v) in headers if n.lower() == name.lower()), None
    )


def _spec_flatten(labels):
    return ",".join(labels or [])


def _spec_predicate(labels):
    ls = labels or []
    return (
        ("INBOX" in ls or "SENT" in ls or "TRASH" in ls) and "SPAM" not in ls
    )


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(st.tuples(HEADERS, LABELS), min_size=1, max_size=8))
def test_hof_semantics_match_reference_idiom(spark, rows):
    df = spark.createDataFrame(
        [(i, [(n, v) for n, v in hs], ls) for i, (hs, ls) in enumerate(rows)],
        ROW_SCHEMA,
    )
    got = {
        r.i: (r.subj, r.frm, r.flat, r.pred)
        for r in df.select(
            "i",
            header_value("headers", "subject").alias("subj"),
            header_value("headers", "from").alias("frm"),
            flatten_labels("labels").alias("flat"),
            label_predicate("labels").alias("pred"),
        ).collect()
    }
    for i, (hs, ls) in enumerate(rows):
        assert got[i][0] == _spec_header_value(hs, "subject"), (i, hs)
        assert got[i][1] == _spec_header_value(hs, "from"), (i, hs)
        assert got[i][2] == _spec_flatten(ls), (i, ls)
        # predicate on NULL labels array: Spark yields NULL (filtered like
        # False); the spec says False -- both drop the row
        want_pred = _spec_predicate(ls)
        assert bool(got[i][3]) == want_pred or (
            got[i][3] is None and want_pred is False
        ), (i, ls)
