"""PySpark-native analytics/ETL engine with the query and data-processing
capabilities of ``lanafrenzel/gmail-bigquery-etl`` (reference read-only at
/root/reference), re-expressed Spark-first.

Layout:
  session     -- SparkSession factory tuned for local testing + cluster scale
  schemas     -- the one email schema (reference etl_service/main.py:196-204)
                 plus fixture-table schemas
  catalog     -- fixture-table loader / temp-view registration
  functions/  -- column-level helpers (header extraction HOFs, text, vectors)
  operators/  -- incremental ingest, dedup family, similarity search, asof
  sources/    -- Gmail-shaped paginated Python DataSource with pushdown
  sinks/      -- batched idempotent append sink (foreachBatch-style)
  pipeline    -- end-to-end incremental ingest (reference /fetch parity)
  streaming/  -- watermarked window aggregations over the events stream
  queries/    -- declared query corpus with DuckDB-oracle SQL strings
"""

__version__ = "0.1.0"
