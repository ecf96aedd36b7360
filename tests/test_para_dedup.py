"""Streaming CCNet paragraph first-occurrence index
(streaming/para_dedup.py): streamed == one-shot parity, arrival-order
independence of the min-merge, replay no-op, and the rewrite contract
against the maintained index.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.catalog import load_table
from gmail_bigquery_etl_spark.operators.paragraphs import (
    explode_paras,
    para_arrays,
)
from gmail_bigquery_etl_spark.streaming.para_dedup import (
    apply_para_batch,
    read_para_index,
    rewrite_against_index,
    start_para_index_maintenance,
)

SMOKE_SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SMOKE_SF, "documents").select("doc_id", "text")


def _batch_first_occurrence(docs):
    p = explode_paras(para_arrays(docs))
    return p.groupBy("para").agg(
        F.min(F.struct("doc_id", "pos")).alias("k")
    ).select("para", F.col("k.doc_id").alias("doc_id"),
             F.col("k.pos").alias("pos"))


def _index_set(spark, sink):
    return {
        (r.para, r.doc_id, r.pos)
        for r in read_para_index(spark, sink).collect()
    }


def test_streamed_index_matches_batch_and_replays_nop(spark, tmp_path):
    docs = _docs(spark)
    sink = str(tmp_path / "para_sink")
    ckpt = str(tmp_path / "para_ckpt")
    live = str(tmp_path / "para_live")

    half = docs.where(F.col("doc_id") % 2 == 0)
    rest = docs.where(F.col("doc_id") % 2 == 1)
    half.coalesce(3).write.mode("overwrite").parquet(live)

    def run():
        schema = spark.read.parquet(live).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(live)
        )
        q = start_para_index_maintenance(stream, sink, ckpt)
        q.awaitTermination(300)
        assert not q.isActive

    run()
    want_half = {
        (r.para, r.doc_id, r.pos)
        for r in _batch_first_occurrence(half).collect()
    }
    assert _index_set(spark, sink) == want_half

    rest.coalesce(3).write.mode("append").parquet(live)
    run()  # restart on the same checkpoint: only the new files process
    want_all = {
        (r.para, r.doc_id, r.pos)
        for r in _batch_first_occurrence(docs).collect()
    }
    assert _index_set(spark, sink) == want_all

    # stale batch id: whole-batch redelivery is a committed no-op
    before = _index_set(spark, sink)
    apply_para_batch(spark, docs.limit(5), 0, sink)
    assert _index_set(spark, sink) == before


def test_index_is_arrival_order_independent(spark, tmp_path):
    """The min-merge makes the committed index a function of the SET of
    documents seen, not the batch split or order: streaming the halves
    in the opposite order lands the identical table."""
    docs = _docs(spark)
    half = docs.where(F.col("doc_id") % 2 == 0)
    rest = docs.where(F.col("doc_id") % 2 == 1)

    a = str(tmp_path / "sink_a")
    b = str(tmp_path / "sink_b")
    apply_para_batch(spark, half, 1, a)
    apply_para_batch(spark, rest, 2, a)
    apply_para_batch(spark, rest, 1, b)
    apply_para_batch(spark, half, 2, b)
    assert _index_set(spark, a) == _index_set(spark, b)


def test_rewrite_contract(spark, tmp_path):
    docs = _docs(spark)
    sink = str(tmp_path / "sink_rw")
    apply_para_batch(spark, docs, 1, sink)

    # (a) replaying indexed documents reproduces batch first-occurrence
    # semantics: kept mass = paragraphs whose index row is their own
    out = {
        r.doc_id: r
        for r in rewrite_against_index(spark, sink, docs).collect()
    }
    first = {
        r.para: (r.doc_id, r.pos)
        for r in read_para_index(spark, sink).collect()
    }
    p = explode_paras(para_arrays(docs)).collect()
    import collections

    want_paras = collections.Counter(r.doc_id for r in p)
    want_kept = collections.Counter(
        r.doc_id for r in p if first[r.para] == (r.doc_id, r.pos)
    )
    for doc_id, row in out.items():
        assert row.n_paras == want_paras[doc_id]
        assert row.n_kept == want_kept.get(doc_id, 0)

    # (b) a new document made entirely of indexed paragraphs -> empty
    donor = docs.orderBy("doc_id").limit(1).collect()[0]
    dup = spark.createDataFrame(
        [(999999, donor.text)], "doc_id: long, text: string"
    )
    r = rewrite_against_index(spark, sink, dup).collect()[0]
    assert r.n_kept == 0 and r.clean == ""

    # (c) genuinely new material passes through untouched, and a
    # paragraph repeated WITHIN the new doc is kept exactly once
    fresh_para = "zz yy xx ww vv uu tt ss rr qq"
    fresh = spark.createDataFrame(
        [(999998, fresh_para + " " + fresh_para)],
        "doc_id: long, text: string",
    )
    r = rewrite_against_index(spark, sink, fresh).collect()[0]
    assert r.n_paras == 2 and r.n_kept == 1 and r.clean == fresh_para
