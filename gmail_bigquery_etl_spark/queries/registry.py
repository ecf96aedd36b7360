"""Query/oracle registry.

A declared query is a callable (spark, sf_dir) -> DataFrame plus (usually)
an equivalent ANSI-SQL string DuckDB can run over the same parquet fixture
views. Queries whose semantics are not SQL-expressible (custom stateful
streaming, iterative algorithms) register without an oracle; the driver then
records the weaker rows-only check.

Determinism rules every registered pair follows (so the order-insensitive
value-hash comparison is exact, not fuzzy):
  * double aggregates over data columns go through DECIMAL(18,4) so the sum
    is associative/exact, then cast back to double;
  * libm-dependent scalars (ln/exp/pow) and float reductions (cosine) are
    rounded to a fixed number of decimals on BOTH sides;
  * every LIMIT/top-k has a total-order tiebreaker;
  * hashes are md5-derived (portable), never engine-native murmur.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

ALL_QUERIES: dict[str, QueryFn] = {}
ALL_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in ALL_QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        ALL_QUERIES[name] = fn
        if oracle is not None:
            ALL_ORACLES[name] = oracle
        return fn

    return deco
