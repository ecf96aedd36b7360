"""Plan-only dump: write .explain("formatted") for named queries to
plans/<dir>/<name>_<tag>.txt WITHOUT executing them (probe_query.py times
with the noop sink as well; this tool is for before/after plan evidence
when a timing run would be redundant or the box is busy).

Usage: python tools/dump_plan.py <plans_subdir> <tag> <query> [query ...]
  env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       DUMP_REPO_DIR (default: this repo -- lets a pristine worktree dump
       into the main repo's plans/ tree)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmail_bigquery_etl_spark.queries import ALL_QUERIES  # noqa: E402
from gmail_bigquery_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    subdir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_repo = os.environ.get(
        "DUMP_REPO_DIR",
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    spark = get_spark("dump_plan", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    for name in names:
        df = ALL_QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out = os.path.join(out_repo, "plans", subdir, f"{name}_{tag}.txt")
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as fh:
            fh.write(buf.getvalue())
        print(f"DUMPED {name} -> {out}", flush=True)


if __name__ == "__main__":
    main()
