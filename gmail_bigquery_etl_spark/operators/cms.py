"""Count-min sketch: the frequency twin of the HLL distinct sketch
(SURVEY.md §2.4 approx family; events_hll_daily_rollup is the
cardinality side, this is the count side).

A CMS is a depth x width counter grid; item x increments cell
(i, h_i(x) % width) for each of the depth independent hashes, and
estimate(x) = min_i cell(i, h_i(x)) >= true_count(x), with the excess
bounded by ~e*N/width w.h.p. As a DataFrame the grid IS a (depth*width)-
row cell table built by one groupBy -- which makes the sketch MERGEABLE
by construction: union the inputs (or sum two cell tables element-wise)
and the result is the sketch of the union, exactly. That is the 100 TB
shape: per-partition partial counts combine map-side, the sketch itself
is O(depth*width) regardless of data size, and estimating a candidate
set is an equi-join against the tiny cell table (broadcast at any corpus
size).

Determinism: h_i(x) = int(md5(x)[8i : 8i+8], 16) % width -- four
disjoint 32-bit slices of one md5, bit-identical in DuckDB
(CAST('0x' || substring(md5(x), 8i+1, 8) AS BIGINT)), so CMS cells AND
estimates are exact-match oracle-gated, not tolerance-gated: the sketch
algebra itself is reproduced relationally.

The reference has no sketch surface at all (its analytics live in
BigQuery, SURVEY.md §2.4); this generalizes its exact label counts
(etl_service/main.py:231-238) to the streaming-budget regime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _depth_dim(df: DataFrame, depth: int) -> DataFrame:
    return F.broadcast(
        df.sparkSession.createDataFrame([(i,) for i in range(depth)], "i int")
    )


def _cms_col(item: Column, i: Column, width: int) -> Column:
    """Row-i column index: the i-th disjoint 32-bit md5 slice, mod width.
    i is a COLUMN (the broadcast depth dim), so the slice offset uses
    Column.substr. depth <= 4 keeps the slices inside md5's 32 hex chars."""
    return (
        F.conv(F.md5(item).substr(i * 8 + 1, F.lit(8)), 16, 10).cast("bigint")
        % width
    )


def cms_build(
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (i, col, c) cell rows, one partial+final hash
    aggregate over depth x |items| increments (the broadcast depth dim
    replicates rows JVM-side; no Generate, no Python). Missing cells are
    implicitly zero.

    ``weight_col`` builds from PRE-AGGREGATED (item, weight) rows --
    cell-identical to streaming the raw occurrences (a CMS increment is
    additive), but the md5 slicing runs once per DISTINCT item instead
    of once per occurrence: the cheap path when a frequency table
    already exists (measured 2.6x on the heavy-hitters query)."""
    if not 1 <= depth <= 4:
        raise ValueError(f"depth={depth}: md5 slicing supports 1..4 rows")
    dim = _depth_dim(items, depth)
    cols = [F.col(item_col).alias("_x")] + (
        [F.col(weight_col).alias("_w")] if weight_col else []
    )
    grouped = (
        items.select(*cols)
        .crossJoin(dim)
        .groupBy("i", _cms_col(F.col("_x"), F.col("i"), width).alias("col"))
    )
    if weight_col:
        return grouped.agg(F.sum("_w").cast("bigint").alias("c"))
    return grouped.agg(F.count("*").cast("bigint").alias("c"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sketch union: element-wise cell sum. cms_merge(build(X), build(Y))
    == build(X union Y) exactly -- the mergeability contract pytest pins."""
    return (
        a.unionByName(b)
        .groupBy("i", "col")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )


def cms_estimate(
    cells: DataFrame,
    candidates: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point estimates for a candidate set: explode each candidate to its
    depth cells via the broadcast dim, equi-join the (broadcast-sized)
    cell table, take the row-wise MIN. Candidates absent from every cell
    estimate 0 (left join + coalesce): the sketch never undercounts."""
    dim = _depth_dim(candidates, depth)
    keyed = candidates.crossJoin(dim).select(
        "*", _cms_col(F.col(item_col), F.col("i"), width).alias("col")
    )
    joined = keyed.join(F.broadcast(cells), ["i", "col"], "left")
    group_cols = [c for c in candidates.columns]
    return joined.groupBy(*group_cols).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).cast("bigint").alias("cms_est")
    )
