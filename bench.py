"""Benchmark harness: runs the declared query corpus at a scale-factor
directory and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32),
     BENCH_QUERIES      (optional comma-list to restrict).

Each query is materialized with the noop writer (full computation, no
driver collect, no Python transfer) -- the honest end-to-end cost of the
plan, which is what has to survive a 100 TB cluster.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gmail_bigquery_etl_spark.queries import ALL_QUERIES  # noqa: E402
from gmail_bigquery_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    only = {q for q in os.environ.get("BENCH_QUERIES", "").split(",") if q}

    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    spark = get_spark("bench", cpus=cpus)

    # JVM + parquet-footer warmup so query 1 doesn't pay session startup.
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    timings: dict[str, float] = {}
    for name, fn in sorted(ALL_QUERIES.items()):
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # report, keep benching
            timings[name] = -1.0
            print(f"# BENCH ERROR {name}: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "declared-query corpus wall time (noop-materialized)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
