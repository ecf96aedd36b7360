"""Python UDTF surface (functions/udtf_fns.py): the one-to-many table
function API, exercised via both the DataFrame call form and a SQL
LATERAL join, checked against a pure-Python reference."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.catalog import load_table
from gmail_bigquery_etl_spark.functions.udtf_fns import (
    SentenceSplit,
    register_udtfs,
)

SF = "/root/testdata/sf0.001"


def _py_sentences(text):
    out = []
    for m in re.finditer(r"[^.!?]+[.!?]?", text or ""):
        raw = m.group(0)
        s = raw.strip()
        if s:
            out.append((s, m.start() + (len(raw) - len(raw.lstrip())), len(s.split())))
    return out


def test_udtf_lateral_matches_python_reference(spark):
    register_udtfs(spark)
    # Fixture texts carry no punctuation (one sentence each); splice two
    # copies with terminators so the one-to-many expansion is exercised.
    docs = (
        load_table(spark, SF, "documents")
        .select(
            "doc_id",
            F.concat(F.col("text"), F.lit(". "), F.col("text"), F.lit("!")).alias(
                "text"
            ),
        )
        .limit(50)
    )
    docs.createOrReplaceTempView("_udtf_docs")
    got = spark.sql(
        """
        SELECT d.doc_id, s.sentence, s.start, s.n_tokens
        FROM _udtf_docs d, LATERAL sentence_split(d.text) s
        """
    ).collect()
    rows = docs.collect()
    want = [
        (r.doc_id, sent, start, n)
        for r in rows
        for (sent, start, n) in _py_sentences(r.text)
    ]
    assert sorted((r.doc_id, r.sentence, r.start, r.n_tokens) for r in got) == sorted(
        want
    )
    assert len(want) > 50  # expansion actually happened


def test_udtf_dataframe_call_and_null_guard(spark):
    out = SentenceSplit(F.lit("One two. Three! And a tail")).collect()
    assert [(r.sentence, r.start, r.n_tokens) for r in out] == [
        ("One two.", 0, 2),
        ("Three!", 9, 1),
        ("And a tail", 16, 3),
    ]
    assert SentenceSplit(F.lit(None).cast("string")).collect() == []
