"""Sequence/CEP operator contracts (operators/sequence.py)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.operators.sequence import (
    key_sequences,
    label_expr,
    match_counts,
    transition_counts,
)

LABELS = {"view": "v", "click": "c", "purchase": "p"}


def _events(spark, rows):
    return spark.createDataFrame(
        [(k, datetime(2024, 1, 1, 0, 0, s), i, t)
         for i, (k, s, t) in enumerate(rows)],
        "key int, ts timestamp, eid int, etype string",
    )


def _seqs(spark, rows):
    df = _events(spark, rows)
    return key_sequences(
        df, "key", "ts", "eid", label_expr("etype", LABELS)
    )


def test_sequence_orders_by_ts_then_tiebreak(spark):
    # two events share ts=5; eid decides (eid is insertion order here)
    rows = [(1, 5, "view"), (1, 5, "click"), (1, 2, "purchase")]
    got = {r.key: r.seq for r in _seqs(spark, rows).collect()}
    assert got == {1: "pvc"}


def test_unmapped_labels_hold_position_but_match_nothing(spark):
    rows = [(1, 1, "view"), (1, 2, "refund"), (1, 3, "purchase")]
    seqs = _seqs(spark, rows)
    assert seqs.first().seq == "v_p"
    assert match_counts(seqs, "vp").first().n_matches == 0
    assert match_counts(seqs, "v.p").first().n_matches == 1


def test_match_counts_non_overlapping_left_to_right(spark):
    rows = [(1, i, t) for i, t in enumerate(
        ["view", "click", "purchase", "view", "purchase", "view"]
    )]
    m = match_counts(_seqs(spark, rows), "vc*p").first()
    assert (m.seq_len, m.n_matches) == (6, 2)


def test_transitions_counts_and_row_normalization(spark):
    rows = [(1, i, t) for i, t in enumerate(
        ["view", "click", "view", "click", "purchase"]
    )] + [(2, 0, "view"), (2, 1, "click")]
    got = {
        (r.src, r.dst): (r.n, r.p)
        for r in transition_counts(_seqs(spark, rows)).collect()
    }
    assert got[("v", "c")] == (3, 1.0)
    assert got[("c", "v")] == (1, pytest.approx(1 / 2))
    assert got[("c", "p")] == (1, pytest.approx(1 / 2))
    # v->c from key 2 counted; singleton sequences contribute nothing
    assert sum(n for n, _ in got.values()) == 5


def test_single_event_and_empty_sequences_yield_no_pairs(spark):
    rows = [(1, 0, "view")]
    assert transition_counts(_seqs(spark, rows)).count() == 0


def test_label_expr_rejects_multichar():
    with pytest.raises(ValueError):
        label_expr("x", {"view": "vv"})


def test_sequences_deterministic_across_repartition(spark):
    rows = [(1, i % 7, t) for i, t in enumerate(
        ["view", "click", "purchase", "view", "click"] * 4
    )]
    df = _events(spark, rows)
    a = key_sequences(
        df, "key", "ts", "eid", label_expr("etype", LABELS)
    ).first().seq
    b = key_sequences(
        df.repartition(13), "key", "ts", "eid", label_expr("etype", LABELS)
    ).first().seq
    assert a == b


def test_streaming_cep_matches_batch_for_any_batch_partitioning(
    spark, sf_dir, tmp_path
):
    """Out-of-order arrival: batches split by key hash AND by parity of
    position, never by time -- the triple-storing state must still
    reproduce the batch matcher exactly."""
    from gmail_bigquery_etl_spark.catalog import load_table
    from gmail_bigquery_etl_spark.streaming.cep import (
        apply_cep_batch,
        cep_match_view,
    )

    LAB = {"click": "c", "error": "e", "purchase": "p",
           "signup": "s", "view": "v"}
    ev = load_table(spark, sf_dir, "events")
    root = str(tmp_path / "cep")
    lab = label_expr("etype" if "etype" in ev.columns else "event_type", LAB)
    # reversed batch order of a modulo split: batch 0 gets the LAST third
    for i, m in enumerate([2, 1, 0]):
        apply_cep_batch(
            spark, ev.where(F.col("event_id") % 3 == m), i, root,
            "user_id", "ts", "event_id", lab,
        )
    streamed = {
        (r.key, r.seq_len, r.n_matches)
        for r in cep_match_view(spark, root, "vc*p").collect()
    }
    batch = {
        (str(r.key), r.seq_len, r.n_matches)
        for r in match_counts(
            key_sequences(ev, "user_id", "ts", "event_id", lab), "vc*p"
        ).collect()
    }
    assert streamed == batch

    # replay guard: redelivering an already-committed batch id no-ops
    before = streamed
    apply_cep_batch(
        spark, ev.limit(100), 2, root, "user_id", "ts", "event_id", lab
    )
    after = {
        (r.key, r.seq_len, r.n_matches)
        for r in cep_match_view(spark, root, "vc*p").collect()
    }
    assert after == before
