"""Full-corpus 10x scale sweep: single-run noop timing of EVERY
registered query at two scales, flagging super-linear outliers for
triage. Coarser than bench_median4 (one sample per side) -- this is a
DETECTOR, not a durable record: anything it flags gets the idle
median-of-4 protocol before any claim is made. Round-11 provenance: the
per-op re-reads caught two REAL super-linear bugs (the novelty HOF
hazard, the HITS one-partition broadcast flip) that corpus-bench totals
had hidden; this sweep applies the same lens to all ~300 queries.

Usage: python tools/sweep_scale.py [--small ...] [--big ...]
         [--out scratch/sweep_r11.jsonl] [--budget 20]

Queries whose SMALL side exceeds --budget seconds skip the big side
(deliberately-quadratic baselines and sink-builders would dominate the
sweep); skipped rows are recorded, never silently dropped.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmail_bigquery_etl_spark.queries import ALL_QUERIES  # noqa: E402
from gmail_bigquery_etl_spark.session import get_spark  # noqa: E402

# deliberately-quadratic all-pairs baselines: their super-linearity is
# the documented POINT (the contrast row for the bucketed variants), and
# at sf1 they run for minutes -- measured once in SCALE_r02-r04, skipped
# here by design
DELIBERATE_BASELINES = {
    "embedding_near_dup",
    "knn_bruteforce_cosine",
}


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="scratch/sf1")
    ap.add_argument("--out", default="scratch/sweep_r11.jsonl")
    ap.add_argument("--budget", type=float, default=20.0)
    ap.add_argument("--only", default="", help="comma list; default all")
    args = ap.parse_args()

    spark = get_spark()
    spark.read.parquet(os.path.join(args.small, "documents.parquet")).count()
    names = [n for n in args.only.split(",") if n] or list(ALL_QUERIES)

    done = set()
    if os.path.exists(args.out):  # resumable across interrupted runs
        with open(args.out) as fh:
            done = {json.loads(line)["name"] for line in fh if line.strip()}

    with open(args.out, "a") as out:
        for name in names:
            if name in done:
                continue
            row: dict = {"name": name}
            if name in DELIBERATE_BASELINES:
                row["skip"] = "deliberate quadratic baseline"
            else:
                try:
                    row["small_sec"] = round(
                        _noop(ALL_QUERIES[name](spark, args.small)), 2
                    )
                    if row["small_sec"] > args.budget:
                        row["skip"] = f"small side over {args.budget}s budget"
                    else:
                        row["big_sec"] = round(
                            _noop(ALL_QUERIES[name](spark, args.big)), 2
                        )
                        row["ratio"] = (
                            round(row["big_sec"] / row["small_sec"], 2)
                            if row["small_sec"]
                            else None
                        )
                except Exception as exc:  # record, keep sweeping
                    row["error"] = f"{type(exc).__name__}: {exc}"[:300]
            out.write(json.dumps(row) + "\n")
            out.flush()
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
