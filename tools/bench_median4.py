"""Idle median-of-4 scale re-reads (the novelty precedent, BASELINE.md).

Protocol: for each op, run 4 independent SEQUENCES; each sequence times
the op best-of-2 at the small scale then best-of-2 at the big scale
(tools/bench_scale._time -- noop-writer materialization) and yields one
ratio. The recorded row is the per-side MEDIAN of the 4 sequences plus
every sample, so the noise band is part of the durable artifact. A
known-linear control op (one scan + hash agg) runs under the identical
protocol in the same session: if the control's ratio band strays from
1.0, the instance -- not the operators -- owns that much of every other
row's band.

Usage: python tools/bench_median4.py --ops a,b,c [--seqs 4]
         [--small /root/testdata/sf0.1] [--big scratch/sf1]
         [--out SCALE_r11.json] [--control q1_pricing_summary]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_scale import _time  # noqa: E402

from gmail_bigquery_etl_spark.session import get_spark  # noqa: E402


def _wait_idle(gate: float = 1.5, max_wait: int = 300) -> float:
    """Bounded idle gate (bench.py's policy): don't start a sequence on
    a box still draining a prior run's load."""
    t0 = time.time()
    while time.time() - t0 < max_wait:
        load1 = os.getloadavg()[0]
        if load1 < gate:
            return load1
        time.sleep(10)
    return os.getloadavg()[0]


def measure(spark, name: str, small: str, big: str, seqs: int) -> dict:
    small_s, big_s, ratios = [], [], []
    for _ in range(seqs):
        ts, ns = _time(spark, name, small)
        tb, nb = _time(spark, name, big)
        small_s.append(ts)
        big_s.append(tb)
        ratios.append(tb / ts if ts else None)
    return {
        "small_sec": round(statistics.median(small_s), 2),
        "big_sec": round(statistics.median(big_s), 2),
        "ratio": round(
            statistics.median(big_s) / statistics.median(small_s), 2
        ),
        "small_rows": ns,
        "big_rows": nb,
        "samples_small": [round(s, 2) for s in small_s],
        "samples_big": [round(s, 2) for s in big_s],
        "samples_ratio": [round(r, 2) for r in ratios],
        "protocol": f"median of {seqs} idle sequences (best-of-2 each, "
        "noop-writer); ratio = median(big)/median(small)",
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="scratch/sf1")
    ap.add_argument("--ops", required=True)
    ap.add_argument("--seqs", type=int, default=4)
    ap.add_argument("--out", default="SCALE_r11.json")
    ap.add_argument("--control", default="q1_pricing_summary")
    args = ap.parse_args()

    load_at_start = _wait_idle()
    spark = get_spark()
    spark.read.parquet(os.path.join(args.small, "documents.parquet")).count()

    report: dict[str, dict] = {}
    names = [o for o in args.ops.split(",") if o]
    if args.control:
        names = names + [args.control]
    for name in names:
        row = measure(spark, name, args.small, args.big, args.seqs)
        if name == args.control:
            row["role"] = (
                "known-linear noise control: one scan + hash agg; its "
                "band bounds the instance noise in this session"
            )
        report[name] = row
        print(json.dumps({name: row}), flush=True)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(here, args.out)
    payload = {"small": args.small, "big": args.big, "ops": {}}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            payload = json.load(fh)
    payload.setdefault("ops", {}).update(report)
    payload["idle_loadavg_at_start"] = round(load_at_start, 2)
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
