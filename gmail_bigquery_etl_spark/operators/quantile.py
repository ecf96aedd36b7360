"""Mergeable quantile sketch: deterministic base-2 sub-bucketed histogram
(DDSketch-style), built/merged/queried relationally in exact integers.

Completes the sketch family's fourth rung next to HLL (distinct),
count-min (frequency) and Bloom (membership): the approximate-QUANTILE
sketch a 100 TB profiling pass needs when an exact percentile (full sort
or exact rank selection) is too expensive. Reference parity: the
reference outsources all analytics to BigQuery and has no sketch surface
(SURVEY.md section 2.10); the design here follows the published DDSketch
idea (Masson, Rim, Lee, VLDB 2019: relative-error-bounded log-bucketed
histograms are mergeable by bucket-count addition) re-expressed with a
BASE-2 bucket function chosen so both engines compute it in exact
integer arithmetic -- no libm, no float drift, bit-for-bit oracle
comparison like operators/hll.py's register table.

Bucket function (values scaled to positive integer "cents" v > 0):
  e = bit length of v            = length(bin(v))      -- exact
  m = top ``sub_bits`` bits of v = v >> max(e - sub_bits, 0)
The cell key (e, m) truncates v to its leading sub_bits bits, so every
value in a cell agrees with the cell's bounds within relative error
2^-(sub_bits-1) (~0.8% at the default 8): lo = m << max(e - sub_bits, 0),
hi = (m + 1) << max(e - sub_bits, 0) - 1. Ordering by (e, m) IS value
order (longer bit length => strictly larger; same length => prefix order),
so quantile extraction is a cumulative-count walk over the sorted cells.

State: at most sub_bits * 2^(sub_bits-1)-ish cells per group for any
data distribution spanning k orders of magnitude (one "e" stripe of
<= 2^(sub_bits-1) sub-buckets per octave; 64 octaves max for bigint) --
a few thousand rows regardless of corpus size. Build is ONE partial+final
hash aggregate; merge = groupBy-sum of cell counts, and
merge(build(X), build(Y)) == build(X ∪ Y) EXACTLY (counts are additive;
pytest pins it). Quantile extraction is an O(cells) window walk against
a broadcast O(#quantiles) dim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_SUB_BITS = 8


def _cents(value: Column, scale: int) -> Column:
    """Deterministic positive-integer domain: round(value * scale). Both
    engines round half-away-from-zero for positive doubles and the
    double arithmetic is IEEE-identical, so the integer is portable."""
    return F.round(value * scale, 0).cast("bigint")


def qsketch_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    sub_bits: int = DEFAULT_SUB_BITS,
    scale: int = 100,
) -> DataFrame:
    """(group..., e, m, cnt): the sketch cell table. Non-positive and
    NULL values are out of domain (documented, filtered on both the
    Spark and oracle sides)."""
    group_cols = group_cols or []
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, _cents(F.col(value_col), scale).alias("v"))
        .where(F.col("v") > 0)
        .select(
            *group_cols,
            F.length(F.bin("v")).alias("e"),
            # expr form: PySpark's shiftright() only takes a literal
            # shift, but the underlying SQL expression accepts a column
            F.expr(
                f"shiftright(v, greatest(length(bin(v)) - {sub_bits}, 0))"
            ).alias("m"),
        )
        .groupBy(*group_cols, "e", "m")
        .agg(F.count("*").alias("cnt"))
    )


def qsketch_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Sketch union: cell-count addition. merge(build(X), build(Y)) ==
    build(X ∪ Y) exactly (pytest-pinned)."""
    group_cols = group_cols or []
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "e", "m")
        .agg(F.sum("cnt").alias("cnt"))
    )


def qsketch_quantiles(
    cells: DataFrame,
    permille: list[int],
    group_cols: list[str] | None = None,
    sub_bits: int = DEFAULT_SUB_BITS,
) -> DataFrame:
    """(group..., q_permille, est_lo, est_hi): for each requested
    quantile q/1000, the BOUNDS of the first cell (in value order) whose
    cumulative count reaches ceil(q/1000 * total) -- the bucket that
    contains the exact rank-selected element, so est_lo <= exact
    quantile <= est_hi with relative error 2^-(sub_bits-1). All-integer
    walk: rank target via truncating-division ceil trick, cumulative
    window over (e, m).

    Plan note: with no group columns the cumulative window is a single
    global partition -- deliberately fine, because it runs on the
    SKETCH'S CELL TABLE (a few thousand rows bounded by sub_bits and
    the value range, regardless of corpus size), never on the data.
    The data-proportional work is only the build's partial+final hash
    aggregate. The per-group total is an UNBOUNDED window over the same
    cell frame, not a separate aggregate+join: a second reference to
    ``cells`` would duplicate its whole build subtree in the plan --
    including the data scan -- turning every N-column profiling pass
    into 2N scans (plan-asserted single-scan in tests/test_plans.py)."""
    group_cols = group_cols or []
    spark = cells.sparkSession
    qdim = spark.createDataFrame(
        [(q,) for q in permille], "q_permille int"
    )
    w = Window.partitionBy(*group_cols).orderBy("e", "m")
    wt = Window.partitionBy(*group_cols)
    cum = cells.select(
        *group_cols,
        "e",
        "m",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wt).alias("total"),
    )
    picked = (
        cum.join(
            F.broadcast(qdim),
            # first cell whose cumulative count reaches the rank target
            # ceil(q * total / 1000): for integers, cum >= ceil(x/1000)
            # <=> 1000 * cum >= x -- pure integer compare, no division
            F.col("cum") * 1000 >= F.col("q_permille") * F.col("total"),
        )
        .groupBy(*group_cols, "q_permille")
        .agg(
            F.min_by(
                F.struct(
                    F.expr(
                        f"shiftleft(m, greatest(e - {sub_bits}, 0))"
                    ).alias("est_lo"),
                    F.expr(
                        f"shiftleft(m + 1, greatest(e - {sub_bits}, 0)) - 1"
                    ).alias("est_hi"),
                ),
                F.struct("e", "m"),
            ).alias("cell")
        )
        .select(
            *group_cols,
            "q_permille",
            F.col("cell.est_lo").alias("est_lo"),
            F.col("cell.est_hi").alias("est_hi"),
        )
    )
    return picked
