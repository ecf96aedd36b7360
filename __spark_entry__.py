"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in gmail_bigquery_etl_spark/ (queries/ holds the
declared corpus; each query registers its DuckDB oracle alongside).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gmail_bigquery_etl_spark.queries import ALL_ORACLES, ALL_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference-parity
    incremental ingest (label predicate -> broadcast anti-join vs sink ->
    header-extraction HOFs -> per-id dedup), SURVEY.md §3.1."""
    return ALL_QUERIES["ingest_incremental"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    return dict(ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    """Equivalent ANSI SQL for DuckDB, keyed like ``queries()``. Queries
    without an entry here are non-SQL-expressible (streaming/stateful) and
    get the driver's weaker rows-only check."""
    return dict(ALL_ORACLES)
