"""Operational entry point: the reference's Flask service surface
(etl_service/main.py:270-307 -- /fetch, /health, batch trigger) as a CLI
over the declared corpus.

  python -m gmail_bigquery_etl_spark list                 # every query
  python -m gmail_bigquery_etl_spark run <query> [sf_dir] # execute, show rows
  python -m gmail_bigquery_etl_spark explain <query> [sf_dir]  # physical plan
  python -m gmail_bigquery_etl_spark oracle <query>       # the DuckDB twin SQL

`run` prints row count plus the first rows (driver-side display only --
the query itself executes distributed); `explain` prints the formatted
physical plan so the pushdown/broadcast/partial-agg claims are one
command away from verification.
"""

from __future__ import annotations

import sys

DEFAULT_SF = "/root/testdata/sf0.01"


def main(argv: list[str]) -> int:
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, *rest = argv

    from .queries import ALL_ORACLES, ALL_QUERIES

    if cmd == "list":
        for name in ALL_QUERIES:
            tag = "" if name in ALL_ORACLES else "  (rows-only: no SQL oracle)"
            print(f"{name}{tag}")
        print(f"\n{len(ALL_QUERIES)} queries, {len(ALL_ORACLES)} oracle-gated")
        return 0

    if cmd == "oracle":
        if not rest or rest[0] not in ALL_ORACLES:
            print(f"unknown or oracle-less query: {rest[:1]}", file=sys.stderr)
            return 2
        print(ALL_ORACLES[rest[0]].strip())
        return 0

    if cmd in ("run", "explain"):
        if not rest or rest[0] not in ALL_QUERIES:
            print(f"unknown query: {rest[:1]} (try `list`)", file=sys.stderr)
            return 2
        name = rest[0]
        sf_dir = rest[1] if len(rest) > 1 else DEFAULT_SF
        from .session import get_spark

        spark = get_spark("cli")
        df = ALL_QUERIES[name](spark, sf_dir)
        if cmd == "explain":
            df.explain("formatted")
        else:
            import time

            t0 = time.time()
            n = df.count()
            dt = time.time() - t0
            df.show(20, truncate=40)
            print(f"{name}: {n} rows in {dt:.2f}s  (sf_dir={sf_dir})")
        return 0

    print(f"unknown command: {cmd} (list | run | explain | oracle)", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
