"""KMV (k-minimum-values) sketch: deterministic bottom-k sampling and
distinct-count estimation in one bounded structure.

Completes the sketch family (HLL/CMS/Bloom/quantile, operators/hll.py et
al.) with the one member that also yields a SAMPLE: keep the k distinct
values with the smallest hashes. That set is simultaneously

- a uniform random sample of the distinct values (hash order is
  pseudo-random but DETERMINISTIC -- reruns, retries, and the DuckDB
  oracle all agree, unlike rand()-based sampling),
- a distinct-count estimator (est = (k-1) * H / h_k, Beyer et al.,
  "On Synopses for Distinct-Value Estimation Under Multiset Operations",
  SIGMOD'07),
- mergeable: bottom-k of a union == bottom-k of the concatenated
  bottom-k's -- so partial sketches combine across partitions, days, or
  micro-batches without re-scanning history (streaming twin in
  streaming/kmv.py).

This is the engine's reservoir-sampling answer: a true reservoir needs
sequential randomness (unreplayable, order-dependent); hash-bottom-k
gives the same uniform-sample guarantee with deterministic replay, exact
SQL oracles, and trivial distribution.

Hash: the leading 60 bits of md5, via conv(hex, 16, 10) -- md5 is the
one keyed hash with bit-identical semantics in both Spark and DuckDB
(xxhash64/hash are engine-specific), and 15 hex chars stay inside a
BIGINT. Scale posture: the global bottom-k is TakeOrderedAndProject
(per-partition top-k, merged on the driver -- never a global sort);
the grouped form is one window rank per group; everything downstream
of the hash is O(k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_SPACE = float(1 << 60)


def kmv_hash(col: Column | str) -> Column:
    """60-bit deterministic hash: leading 15 hex chars of md5 of the
    value's string form. Matches the DuckDB oracle expression
    ``('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15))::BIGINT``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(c.cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("bigint")


def kmv_build(df: DataFrame, col: str, k: int) -> DataFrame:
    """The sketch: (h, value) for the k distinct values with the
    smallest hashes, ascending. distinct-first keeps the take-ordered
    heap honest (KMV is defined over the value SET); orderBy+limit
    compiles to TakeOrderedAndProject -- per-partition bottom-k then a
    driver merge of k-row heaps, no global sort at any scale."""
    return (
        df.select(F.col(col).alias("value"))
        .where(F.col("value").isNotNull())  # NULL is not a value; also
        # dodges the engines' opposite NULL sort orders (Spark first,
        # DuckDB last) so the oracle's ORDER BY agrees bit-for-bit
        .distinct()
        .select(kmv_hash("value").alias("h"), "value")
        .orderBy("h")
        .limit(k)
    )


def kmv_merge(sketches: list[DataFrame], k: int) -> DataFrame:
    """Union partial sketches, dedup (the same value may sit in several
    partials), re-take bottom-k. Equals kmv_build over the unioned
    inputs -- the contract tests/test_kmv.py pins."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.dropDuplicates(["h", "value"]).orderBy("h").limit(k)


def kmv_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """One-row distinct-count estimate from the committed sketch:
    n_kept < k means the sketch saw every distinct value (estimate is
    exact); otherwise est = (k-1) * 2^60 / h_k. Arithmetic in double on
    both engines (IEEE-identical), floored to a bigint."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("kth_hash"),
    )
    exact = F.col("n_kept").cast("double")
    est = F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("kth_hash")
    return agg.select(
        F.lit(k).cast("bigint").alias("k"),
        F.col("n_kept").cast("bigint").alias("n_kept"),
        F.floor(
            F.when(F.col("n_kept") < k, exact).otherwise(est)
        ).cast("bigint").alias("est_distinct"),
    )


def kmv_build_grouped(
    df: DataFrame, group_cols: list[str], col: str, k: int
) -> DataFrame:
    """Per-group KMV: one hash projection, one window rank per group --
    a single shuffle on the group key however many groups exist. Output:
    (group..., h, value) with the k smallest per group."""
    from pyspark.sql import Window as W

    hashed = (
        df.select(*group_cols, F.col(col).alias("value"))
        .where(F.col("value").isNotNull())
        .distinct()
        .withColumn("h", kmv_hash("value"))
    )
    w = W.partitionBy(*group_cols).orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )
