"""Per-query optimization probe (guide §1): time a named query with the
noop sink (warm best-of-N in one session) and dump .explain("formatted")
to plans/r12/<name>_<tag>.txt (PROBE_PLAN_DIR overrides the round dir).

Usage: python tools/probe_query.py <tag> <query> [query ...]
  env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       PROBE_RUNS (default 3)
       PROBE_NO_PLAN=1 to skip plan dumps (timing only)
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmail_bigquery_etl_spark.queries import ALL_QUERIES  # noqa: E402
from gmail_bigquery_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("PROBE_RUNS", "3"))
    spark = get_spark("probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    # same generic warmup as bench.py
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nation.groupBy("n_regionkey").count().write.format("noop").mode(
        "overwrite"
    ).save()

    def _identity(batches):
        yield from batches

    spark.range(64).mapInPandas(_identity, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in names:
        fn = ALL_QUERIES[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        if os.environ.get("PROBE_NO_PLAN") != "1":
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            out = os.path.join(here, "plans", os.environ.get("PROBE_PLAN_DIR", "r12"), f"{name}_{tag}.txt")
            os.makedirs(os.path.dirname(out), exist_ok=True)
            with open(out, "w") as fh:
                fh.write(buf.getvalue())
        print(f"PROBE {name} min={min(samples)} samples={samples}", flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
