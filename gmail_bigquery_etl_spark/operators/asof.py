"""As-of join: for each left row, the most recent right row at-or-before
its timestamp (per key) -- the time-series join Spark lacks as a builtin.

Implementation is the union+window single-pass form, NOT a per-row probe:

  1. tag both sides and union on (key, ts) with right rows sorting BEFORE
     left rows at equal ts (backward join is inclusive),
  2. one window per key ordered by (ts, tag): running
     last(value, ignorenulls) carries the latest right values forward,
  3. keep the left rows.

Cost = one shuffle on the key + one sort within partitions -- the same
shape as pandas-on-Spark merge_asof, but dependency-free and explicit.
Skewed keys salt like any other window (operators/skew.py). ``tolerance``
nulls matches older than the allowed lookback, matching
``pandas.merge_asof(..., tolerance=...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join (inclusive): left columns + the latest right
    ``value_cols`` (and ``_asof_ts``) whose ``right_ts`` <= ``left_ts``."""
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (on, right_ts)
        ]
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rv__asof_ts"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
        F.col(right_ts).alias("_rv__asof_ts"),
    )
    # right (tag 0) sorts before left (tag 1) at equal ts => inclusive match
    w = (
        W.partitionBy("_k")
        .orderBy("_ts", "_is_left")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "_k",
        "_ts",
        "_is_left",
        "_lrow",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in value_cols
        ],
        F.last("_rv__asof_ts", ignorenulls=True).over(w).alias("_m__asof_ts"),
    )
    out = carried.filter(F.col("_is_left") == 1)
    if tolerance_seconds is not None:
        in_window = (
            F.unix_timestamp("_ts") - F.unix_timestamp("_m__asof_ts")
        ) <= tolerance_seconds
        out = out.select(
            "_k",
            "_ts",
            "_lrow",
            *[
                F.when(in_window, F.col(f"_m_{c}")).alias(f"_m_{c}")
                for c in value_cols
            ],
            F.when(in_window, F.col("_m__asof_ts")).alias("_m__asof_ts"),
        )
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m_{c}").alias(c) for c in value_cols],
        F.col("_m__asof_ts").alias("_asof_ts"),
    )
