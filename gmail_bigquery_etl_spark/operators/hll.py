"""HyperLogLog from first principles: distributed build, merge, estimate.

Completes the hand-built sketch trio (count-min in operators/cms.py,
Bloom in operators/bloom.py): where those answer "how often" and
"definitely absent", HLL answers "how many DISTINCT" in O(m) state. The
engine ships approx_count_distinct (its own HLL++), but that sketch is
opaque -- this one's REGISTERS are a plain (group, bucket, max-rho)
DataFrame, so it can be merged across days/sources (element-wise max,
the mergeability contract pytest pins), persisted to parquet, and --
because the hash is the repo's portable md5-slice arithmetic -- rebuilt
RELATIONALLY by the DuckDB oracle and compared bit for bit: register
state is exact integers, and the estimator's floats are evaluated by an
identical expression tree on both engines.

Construction (classic Flajolet et al. 2007, m = 2^b buckets):
  bucket = first-32-bits(md5(x)) mod m
  rho    = leading-zeros + 1 of the next 60 bits
         = 61 - length(bin(h60))          (h60 > 0; 61 if h60 == 0)
  register[j] = max rho over items in bucket j    -- one groupBy
  raw estimate = alpha_m * m^2 / sum_j 2^(-reg_j)
The harmonic sum is kept EXACT: sum_j 2^(61-reg_j) is an integer
(<= m * 2^61, held in DECIMAL(38,0)), and empty buckets contribute
2^61 each -- so the only floats are the final one-row estimator
arithmetic. Small-range (linear counting) correction applies below
2.5m when empty buckets remain, same branch on both engines from the
same exact integers.

Scale shape: ONE partial+final hash aggregate to (group, bucket)
registers -- m bounded rows per group no matter the corpus -- then an
O(m)-row rollup. Merging sketches from two frames is the same groupBy
max. No driver-side state at any point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_W = 60  # rho field width (15 md5 hex chars)


def _bucket(item: Column, m: int) -> Column:
    return (
        F.conv(F.substring(F.md5(item), 1, 8), 16, 10).cast("bigint") % m
    )


def _rho(item: Column) -> Column:
    h60 = F.conv(F.substring(F.md5(item), 9, 15), 16, 10).cast("bigint")
    return F.when(h60 == 0, F.lit(_W + 1)).otherwise(
        F.lit(_W + 1) - F.length(F.bin(h60))
    )


def hll_registers(
    items: DataFrame,
    item_col: str,
    group_cols: list[str] | None = None,
    m: int = 256,
) -> DataFrame:
    """(group..., bucket, reg): the sketch, one row per non-empty bucket."""
    group_cols = group_cols or []
    it = F.col(item_col)
    return (
        items.where(it.isNotNull())
        .select(
            *group_cols,
            _bucket(it, m).alias("bucket"),
            _rho(it).alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").cast("int").alias("reg"))
    )


def hll_merge(a: DataFrame, b: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Sketch union: element-wise register max. merge(build(X), build(Y))
    == build(X union Y) exactly."""
    group_cols = group_cols or []
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("reg").cast("int").alias("reg"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | None = None,
    m: int = 256,
) -> DataFrame:
    """(group..., hll_estimate): the bias-corrected cardinality estimate,
    6dp-rounded. Exact-integer harmonic sum; linear-counting correction
    below 2.5m while empty buckets remain."""
    group_cols = group_cols or []
    agg = registers.groupBy(*group_cols).agg(
        # per-term DECIMAL cast BEFORE the sum: terms reach 2^60 and a
        # 256-bucket long accumulation overflows int64 under ANSI
        F.sum(
            F.expr(
                f"CAST(shiftleft(CAST(1 AS BIGINT), {_W + 1} - reg)"
                " AS DECIMAL(38,0))"
            )
        ).alias("sum_nonempty"),
        F.count("*").alias("n_buckets"),
    )
    zeros = F.lit(m) - F.col("n_buckets")
    # scaled harmonic sum: empty buckets contribute 2^(W+1) each
    sum_scaled = (
        F.col("sum_nonempty")
        + zeros.cast("decimal(38,0)")
        * F.lit(2 ** (_W + 1)).cast("decimal(38,0)")
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    raw = (
        alpha
        * F.lit(float(m * m))
        * F.lit(float(2 ** (_W + 1)))
        / sum_scaled.cast("double")
    )
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= 2.5 * m) & (zeros > 0), lc).otherwise(raw)
    return agg.select(
        *group_cols, F.round(est, 6).alias("hll_estimate")
    )
