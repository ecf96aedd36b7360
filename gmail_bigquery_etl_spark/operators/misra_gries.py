"""Misra-Gries heavy-hitter summary: the DETERMINISTIC-error frequency
sketch beside the probabilistic count-min (operators/cms.py).

A Misra-Gries summary keeps at most k counters. Where the CMS
overestimates with a probabilistic bound (~e*N/width w.h.p.), MG
UNDERestimates with a worst-case guarantee that needs no hash and no
randomness at all:

    est(x) <= true(x) <= est(x) + (N - M) / (k + 1)

where N is the total item mass and M the summary's retained mass -- and
every item with true(x) > (N - M)/(k+1) is guaranteed PRESENT. That is
the bound to quote when an SLA needs "no heavy hitter missed", not "no
heavy hitter missed with probability 1-delta".

The classic formulation decrements counters as the stream flows (state
depends on arrival order). This module uses the MERGEABLE-summaries
formulation (Agarwal, Cormode, Huang, Phillips, Wei, Yi, PODS 2012):
summarize exact partial counts, then COMPRESS by subtracting the
(k+1)-th largest count and dropping non-positive counters. Build and
merge are pure relational operations on aggregated counts, so for a
fixed merge tree the result is fully deterministic -- exact-equality
testable, unlike stream-order MG.

100 TB shape: build is one hash aggregate (map-side partial counts)
plus a TakeOrdered over k+1 rows for the compression threshold -- the
summary itself is O(k) rows, broadcastable anywhere, and merging two
summaries touches at most 2k rows. No window over the corpus, no
per-row Python.

Reference has no sketch surface at all (its analytics live in BigQuery,
SURVEY.md 2.4); this extends the exact label counts
(etl_service/main.py:231-238) to the bounded-memory regime with a
deterministic guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUMMARY_SCHEMA = "item string, c bigint"


def _mg_compress(counts: DataFrame, k: int) -> DataFrame:
    """Reduce a (item, c) count table to <= k counters: subtract the
    (k+1)-th largest count from every counter and drop the non-positive
    ones. If there are <= k items the table is already a valid summary
    (d = 0). The threshold comes from a TakeOrdered over k+1 rows (never
    a global sort), broadcast back as a 1-row scalar -- ties AT the
    threshold all drop, which only tightens the summary below k."""
    top = counts.orderBy(F.desc("c"), "item").limit(k + 1)
    d = top.agg(
        F.when(F.count("*") > k, F.min("c"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("d")
    )
    return (
        counts.crossJoin(F.broadcast(d))
        .where(F.col("c") > F.col("d"))
        .select(
            "item", (F.col("c") - F.col("d")).cast("bigint").alias("c")
        )
    )


def mg_build(items: DataFrame, item_col: str, k: int = 64) -> DataFrame:
    """Summary of a static frame: exact counts (one partial+final hash
    aggregate), then one compress."""
    counts = items.groupBy(
        F.col(item_col).cast("string").alias("item")
    ).agg(F.count("*").cast("bigint").alias("c"))
    return _mg_compress(counts, k)


def mg_from_counts(counts: DataFrame, k: int = 64) -> DataFrame:
    """Summary from an already-aggregated exact (item, c) count table --
    the entry point when the caller shares the count aggregate with
    other consumers (truth join, totals), so the corpus is scanned
    once and the compress runs over the vocabulary-sized table."""
    return _mg_compress(counts, k)


def mg_merge(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """Merge two summaries: counter-wise sum (missing = 0), then one
    compress. Commutative by construction (sum + order-free threshold),
    and the Agarwal et al. bound holds for ANY merge tree: each compress
    removes at least d*(k+1) mass while charging any single item at most
    d, so the total per-item deficit never exceeds (N - M)/(k+1)."""
    merged = a.unionByName(b).groupBy("item").agg(
        F.sum("c").cast("bigint").alias("c")
    )
    return _mg_compress(merged, k)


def mg_estimate(summary: DataFrame, candidates: DataFrame) -> DataFrame:
    """Lower-bound estimates for a candidate item set: one broadcast
    left join against the O(k) summary; absent items estimate 0."""
    return candidates.join(F.broadcast(summary), "item", "left").select(
        "item", F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("est")
    )
