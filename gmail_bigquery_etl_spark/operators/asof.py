"""As-of join: for each left row, the most recent right row at-or-before
its timestamp (per key) -- the time-series join Spark lacks as a builtin.

Implementation is the union+window single-pass form, NOT a per-row probe:

  1. tag both sides and union on (key, ts) with right rows sorting BEFORE
     left rows at equal ts (backward join is inclusive),
  2. one window per key ordered by (ts, tag): a running
     last(right_row_struct, ignorenulls) carries the latest right ROW
     forward -- one struct, so a matched row's NULL fields are preserved
     atomically (per-column carry would stitch values from different
     right rows, diverging from pandas.merge_asof),
  3. keep the left rows.

Cost = one shuffle on the key + one sort within partitions -- the same
shape as pandas-on-Spark merge_asof, but dependency-free and explicit.
Skewed keys salt like any other window (operators/skew.py). ``tolerance``
nulls matches older than the allowed lookback, matching
``pandas.merge_asof(..., tolerance=...)``.

Supported ``ts`` column types: timestamp / timestamp_ntz / date (tolerance
compares fractional epoch seconds -- sub-second tolerances work) and any
numeric type (tolerance compares raw numeric difference).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, DateType, NumericType, TimestampNTZType, TimestampType
from pyspark.sql.window import Window as W


def _epoch(col: Column, dtype: DataType) -> Column:
    """ts column -> double suitable for tolerance arithmetic: fractional
    epoch seconds for temporal types, the raw value for numeric ts."""
    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        return col.cast("double")  # keeps sub-second precision
    if isinstance(dtype, DateType):
        return col.cast("timestamp").cast("double")
    if isinstance(dtype, NumericType):
        return col.cast("double")
    raise TypeError(
        f"asof_join ts columns must be timestamp/date/numeric, got {dtype}"
    )


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
        value_cols = [c for c in right.columns if c not in (on, right_ts)]
    if "_asof_ts" in value_cols:
        raise ValueError("value_cols may not contain the reserved name _asof_ts")
    # validate ts types eagerly (also powers the tolerance arithmetic)
    l_ts_type = left.schema[left_ts].dataType
    r_ts_type = right.schema[right_ts].dataType
    _epoch(F.col(left_ts), l_ts_type)
    _epoch(F.col(right_ts), r_ts_type)

    # The matched right row travels as ONE nullable struct: NULL means "no
    # right row yet", a non-NULL struct with NULL fields means "matched a
    # row whose values were NULL" -- the two must not be conflated.
    rrow = F.struct(
        F.col(right_ts).alias("_asof_ts"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("x")).schema["x"].dataType
        ).alias("_lrow"),
        rrow.alias("_rrow"),
    )
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(
            right.select(rrow.alias("x")).schema["x"].dataType
        ).alias("_rrow"),
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
        F.last("_rrow", ignorenulls=True).over(w).alias("_m"),
    )
    out = carried.filter(F.col("_is_left") == 1)
    if tolerance_seconds is not None:
        in_window = (
            _epoch(F.col("_ts"), l_ts_type)
            - _epoch(F.col("_m._asof_ts"), r_ts_type)
        ) <= F.lit(float(tolerance_seconds))
        out = out.select(
            "_k",
            "_ts",
            "_lrow",
            F.when(in_window, F.col("_m")).alias("_m"),
        )
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(c) for c in value_cols],
        F.col("_m._asof_ts").alias("_asof_ts"),
    )
