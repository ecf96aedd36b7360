"""Skew-mitigation operators: salted aggregation and salted joins.

At 100 TB a handful of hot keys (one mega-user, one boilerplate document)
can pin a whole stage on one task. AQE's skew-join splitting handles the
sort-merge case at runtime; these operators are the declarative-plan-level
tools for when you know the skew is coming:

* salted two-stage aggregation -- partial-aggregate on (key, salt) so the
  hot key's rows spread over N tasks, then final-merge on key. Correct for
  any decomposable aggregate (count/sum/min/max, and avg via sum+count).
* salted broadcast-replicated join -- replicate the SMALL side N times with
  a salt column and salt the big side deterministically, turning one hot
  hash bucket into N. (For broadcast joins Spark already avoids the
  problem; this is the shuffle-join form.)

Salts are deterministic (xxhash64 of a caller-chosen disambiguator column,
never rand()) so re-runs and retries are stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(disambiguator: Column | str, n: int) -> Column:
    c = F.col(disambiguator) if isinstance(disambiguator, str) else disambiguator
    return F.pmod(F.xxhash64(c), F.lit(n)).cast("int")


def salted_counts_sums(
    df: DataFrame,
    key: str,
    salt_from: str,
    sum_cols: dict[str, Column] | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(key) -> count + sums, executed as two shuffles with the first
    spread over (key, salt). Output: key, n, plus one column per sum_cols
    entry. Equivalent to the direct groupBy (oracle-gated); strictly better
    only when a key is hot enough to dominate a task -- the price is one
    extra (tiny, pre-aggregated) shuffle.
    """
    sum_cols = sum_cols or {}
    partial = (
        df.withColumn("_salt", _salt(salt_from, n_salts))
        .groupBy(key, "_salt")
        .agg(
            F.count("*").alias("_n"),
            *[expr.alias(f"_s_{name}") for name, expr in sum_cols.items()],
        )
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n"),
        *[F.sum(f"_s_{name}").alias(name) for name in sum_cols],
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big[key]`` is skewed: salt the big side from a
    high-cardinality disambiguator column, replicate the small side across
    all salts (a broadcast-sized blowup of N x |small|), and join on
    (key, salt). The hot key's probe rows now hash to N buckets.

    Supported ``how``: inner / left / left_semi / left_anti (big side on
    the left). Right/full/outer joins are rejected: every UNMATCHED small
    row exists once per salt replica, so those join types would emit it
    n_salts times. (Matched small rows are fine in all modes -- each big
    row carries exactly one salt value.)"""
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    norm = how.replace("_", "").lower()
    if norm not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got how={how!r}: "
            "right/full joins would emit each unmatched small-side row once "
            "per salt replica"
        )
    salts = small.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("_salt")
    )
    big_s = big.withColumn("_salt", _salt(salt_from, n_salts))
    small_s = small.crossJoin(F.broadcast(salts))
    return big_s.join(small_s, [key, "_salt"], how).drop("_salt")
