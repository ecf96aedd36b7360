"""Shared fixtures: one SparkSession per test session, one DuckDB connection
with the fixture parquet tables registered as views (mirrors the driver's
CORRECTNESS harness, TESTDATA.md)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from gmail_bigquery_etl_spark.schemas import FIXTURE_TABLES  # noqa: E402
from gmail_bigquery_etl_spark.session import get_spark  # noqa: E402

# The driver's correctness gate runs at sf0.01; override for quick local runs.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def spark():
    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))
    return get_spark("tests", cpus=cpus, shuffle_partitions=cpus)


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for name in FIXTURE_TABLES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()
