"""Write-path expectations: split invariants, metrics, enforcement, and
the contract-enforced streaming sink (operators/expectations.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.operators.expectations import (
    Expectation,
    ExpectationError,
    expectation_metrics,
    expectations_writer,
    split_quarantine,
    tag_violations,
    validate_or_raise,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "ok"),
            (2, -5.0, "ok"),
            (3, 500.0, None),
            (4, None, "ok"),
        ],
        "id int, price double, status string",
    )


def _exps():
    return [
        Expectation("price_positive", F.col("price") > 0, "drop"),
        Expectation("price_capped", F.col("price") <= 100, "drop"),
        Expectation("has_status", F.col("status").isNotNull(), "warn"),
    ]


def test_split_partitions_rows_and_tags_all_violations(spark):
    clean, quar = split_quarantine(_df(spark), _exps())
    assert sorted(r.id for r in clean.collect()) == [1]
    got = {r.id: r["_violations"] for r in quar.collect()}
    # NULL price violates BOTH drop contracts (unknown is not compliance);
    # row 3's NULL status is warn-action only -- not in any tag.
    assert got == {
        2: ["price_positive"],
        3: ["price_capped"],
        4: ["price_capped", "price_positive"],
    }


def test_warn_never_drops_and_fail_routes(spark):
    exps = [Expectation("status_req", F.col("status").isNotNull(), "fail")]
    clean, quar = split_quarantine(_df(spark), exps)
    assert sorted(r.id for r in clean.collect()) == [1, 2, 4]
    assert [r.id for r in quar.collect()] == [3]


def test_metrics_one_row_per_expectation_null_counts_as_violation(spark):
    m = {
        r.expectation: r
        for r in expectation_metrics(_df(spark), _exps()).collect()
    }
    assert set(m) == {"price_positive", "price_capped", "has_status"}
    assert all(r.n_rows == 4 for r in m.values())
    assert m["price_positive"].n_violations == 2  # -5 and NULL
    assert m["price_capped"].n_violations == 2  # 500 and NULL
    assert m["has_status"].n_violations == 1
    assert m["has_status"].action == "warn"
    assert m["price_capped"].violation_rate == pytest.approx(0.5)


def test_metrics_is_single_scan_single_aggregate(spark):
    """One scan, one aggregate: the audit plan must contain exactly one
    source scan however many constraints are declared (the whole design
    point -- constraint count scales columns, not passes)."""
    plan = expectation_metrics(
        _df(spark), _exps()
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1


def test_validate_or_raise_names_breached_contracts(spark):
    df = _df(spark)
    exps = [
        Expectation("price_positive", F.col("price") > 0, "fail"),
        Expectation("id_present", F.col("id").isNotNull(), "fail"),
    ]
    with pytest.raises(ExpectationError) as ei:
        validate_or_raise(df, exps)
    assert "price_positive (2 rows)" in str(ei.value)
    assert "id_present" not in str(ei.value)
    # all-pass set returns the frame unchanged, lazily usable
    ok = validate_or_raise(df, [exps[1]])
    assert ok.count() == 4


def test_tag_with_no_routing_contracts_is_empty_array(spark):
    tagged = tag_violations(
        _df(spark), [Expectation("w", F.col("price") > 0, "warn")]
    )
    assert all(r["_violations"] == [] for r in tagged.collect())


def test_streaming_sink_routes_batches_and_is_replay_idempotent(
    spark, tmp_path
):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    df = _df(spark)
    df.repartition(1).write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    writer = expectations_writer(sink, _exps())
    q = (
        stream.writeStream.foreachBatch(writer)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    clean = spark.read.parquet(os.path.join(sink, "clean"))
    quar = spark.read.parquet(os.path.join(sink, "quarantine"))
    metrics = spark.read.parquet(os.path.join(sink, "metrics"))
    assert sorted(r.id for r in clean.collect()) == [1]
    got = {r.id: r["_violations"] for r in quar.collect()}
    assert got == {
        2: "price_positive",
        3: "price_capped",
        4: "price_capped,price_positive",
    }
    # one metrics row per (batch, expectation)
    assert metrics.count() == 3
    assert {r.expectation for r in metrics.collect()} == {
        "price_positive",
        "price_capped",
        "has_status",
    }

    # redelivery of the same batch id overwrites its own partition dirs:
    # totals unchanged (idempotent), no double-append
    writer(df, 0)
    assert spark.read.parquet(os.path.join(sink, "clean")).count() == 1
    assert spark.read.parquet(os.path.join(sink, "quarantine")).count() == 3
    assert spark.read.parquet(os.path.join(sink, "metrics")).count() == 3


def test_bad_action_rejected():
    with pytest.raises(ValueError):
        Expectation("x", F.lit(True), "explode")
