"""Write-path data contracts: declarative expectations with quarantine.

The reference's only data-quality behavior is reactive -- BigQuery insert
errors are logged per-batch and the pipeline moves on
(etl_service/main.py:244-250; SURVEY.md T6/K1). A training-data pipeline
needs the proactive form: constraints declared ON the write path, checked
in the same scan that writes, with violating rows routed to a quarantine
table instead of silently landing (or silently vanishing). This is the
Delta Live Tables expectations model (expect / expect_or_drop) rebuilt on
plain DataFrames:

- every expectation is a named boolean Column with an action:
  ``warn``   -- record the violation in metrics, keep the row;
  ``drop``   -- route the row to quarantine (with the names of every
                constraint it failed), keep it out of the clean output;
  ``fail``   -- like drop, but ``validate_or_raise`` aborts the job if
                any row violates it (a contract breach, not dirty data).
- one pass computes everything: the violation tags are projections, the
  clean/quarantine split is two filters over the SAME tagged plan, and
  the per-expectation metrics are a single global aggregate -- no
  per-constraint rescans, so at 100 TB the audit costs one table scan.

Scale posture: all checks are Column expressions (whole-stage codegen,
no Python in the row path); metrics is one partial+final aggregate; the
split writes are two filtered scans of one cached/tagged plan, which AQE
executes as a shared shuffle-free stage per sink.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TAG = "_violations"
_ACTIONS = ("warn", "drop", "fail")


@dataclass(frozen=True)
class Expectation:
    """A named row-level contract. ``predicate`` must be TRUE for the row
    to satisfy the contract; NULL predicate results count as violations
    (unknown is not proof of compliance -- same stance as SQL CHECK
    constraints are often criticized for NOT taking)."""

    name: str
    predicate: Column
    action: str = "drop"

    def __post_init__(self) -> None:
        if self.action not in _ACTIONS:
            raise ValueError(f"action must be one of {_ACTIONS}")

    @property
    def violated(self) -> Column:
        # NULL-safe: a NULL check result is a violation.
        return ~self.predicate.eqNullSafe(F.lit(True))


def tag_violations(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Append the ``_violations`` column: sorted array of the names of
    every drop/fail expectation the row breaks (warn-only breaches are
    metrics-only and never quarantine a row). One projection, no shuffle."""
    routing = [e for e in expectations if e.action in ("drop", "fail")]
    tags = [
        F.when(e.violated, F.lit(e.name)) for e in routing
    ] or [F.lit(None).cast("string")]
    arr = F.array_compact(F.array(*tags))
    return df.withColumn(_TAG, F.array_sort(arr))


def split_quarantine(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): two filters over one tagged plan. The clean
    side drops the tag column (contract satisfied -- nothing to say);
    the quarantine side keeps it so every quarantined row names every
    contract it broke (triage needs the full list, not the first)."""
    tagged = tag_violations(df, expectations)
    clean = tagged.where(F.size(_TAG) == 0).drop(_TAG)
    quarantined = tagged.where(F.size(_TAG) > 0)
    return clean, quarantined


def expectation_metrics(
    df: DataFrame, expectations: list[Expectation]
) -> DataFrame:
    """Per-expectation audit in ONE aggregate over one scan:
    (expectation, action, n_rows, n_violations, violation_rate). The
    per-constraint counts are conditional sums inside a single global
    aggregation -- adding a 20th constraint adds a column, not a scan.
    Output is stacked to one row per expectation relationally (inline
    of a literal array -- no second pass over the data)."""
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(e.violated.cast("long")).alias(f"__v{i}")
        for i, e in enumerate(expectations)
    ]
    wide = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(e.name).alias("expectation"),
                F.lit(e.action).alias("action"),
                F.col(f"__v{i}").alias("n_violations"),
            )
            for i, e in enumerate(expectations)
        ]
    )
    return (
        wide.select(F.col("__n").alias("n_rows"), F.inline(pairs))
        .select(
            "expectation",
            "action",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_violations").cast("bigint").alias("n_violations"),
            # try_divide: an EMPTY audited table is a legitimate input
            # (cold start), and ANSI mode turns 0/0 into a job abort
            F.try_divide("n_violations", "n_rows").alias("violation_rate"),
        )
    )


class ExpectationError(RuntimeError):
    """A ``fail``-action contract was breached."""


def validate_or_raise(
    df: DataFrame, expectations: list[Expectation]
) -> DataFrame:
    """Enforce ``fail``-action expectations eagerly: one aggregate job
    counts breaches of every fail-action contract; any breach raises
    ExpectationError naming each broken contract and its count. Returns
    ``df`` unchanged for fluent use. Warn/drop contracts are not
    enforced here -- they are routing, not preconditions."""
    hard = [e for e in expectations if e.action == "fail"]
    if not hard:
        return df
    row = df.agg(
        *[F.sum(e.violated.cast("long")).alias(e.name) for e in hard]
    ).first()
    broken = {e.name: row[e.name] for e in hard if row[e.name]}
    if broken:
        raise ExpectationError(
            "expectation(s) breached: "
            + ", ".join(f"{k} ({v} rows)" for k, v in sorted(broken.items()))
        )
    return df


def expectations_writer(
    sink_root: str,
    expectations: list[Expectation],
    keys: list[str] | None = None,
):
    """foreachBatch body for a contract-enforced streaming append sink:
    clean rows land under ``clean/``, quarantined rows (with their
    violation lists) under ``quarantine/``, and one metrics row per
    (batch, expectation) under ``metrics/`` -- so the stream's quality
    is a queryable time series, not a log line. Each batch writes to
    ``batch_id=`` subdirectories; redelivered batch ids overwrite their
    own directories (dynamic-partition-style idempotence), never touch
    other batches, and never double-append."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        # pin the tagged frame ONCE: three consumers follow (quarantine
        # write, clean write, metrics aggregate), and without the pin
        # each action re-scans the micro-batch -- and a re-computed
        # non-deterministic upstream could even make clean / quarantine
        # / metrics mutually inconsistent within a batch. The checkpoint
        # is O(batch) under the foreachBatch small-batch contract.
        tagged = tag_violations(batch_df, expectations).localCheckpoint()
        clean = tagged.where(F.size(_TAG) == 0).drop(_TAG)
        quarantined = tagged.where(F.size(_TAG) > 0)
        qdir = os.path.join(sink_root, "quarantine", f"batch_id={batch_id}")
        cdir = os.path.join(sink_root, "clean", f"batch_id={batch_id}")
        mdir = os.path.join(sink_root, "metrics", f"batch_id={batch_id}")
        quarantined.withColumn(
            _TAG, F.array_join(_TAG, ",")
        ).write.mode("overwrite").parquet(qdir)
        clean.write.mode("overwrite").parquet(cdir)
        m = expectation_metrics(tagged.drop(_TAG), expectations)
        m.write.mode("overwrite").parquet(mdir)

    return apply_batch
