"""Per-leg decomposition of events_bootstrap_ci's 10x scale reading
(SCALE_r11 recorded 3.08x, plan-audited linear, note: "candidate for
per-leg decomposition next round").

The hypothesis on record: the small-side absolute (~2.5 s) is dominated
by a fixed per-query session floor, so the raw ratio overstates the
data-dependent term. This harness measures each cumulative subplan of
the registered query (median of N noop-writer runs per scale point):

  floor    -- 1-row limit over the same scan: pure job/scheduling cost
  scan     -- filter + decimal quantize + md5 rehash projection
  inflate  -- + 64-way coeff crossJoin + inverse-CDF weight CASE chain
  agg      -- + the (event_type, b) partial+final aggregate (the means)
  full     -- the registered query end to end

and reports, next to each leg's raw ratio, the FLOOR-SUBTRACTED full
ratio ((full_big - floor_big) / (full_small - floor_small)) — the
number the 2x bar should judge, with both raw medians kept so the
subtraction is auditable.

Usage: python tools/bench_bootstrap_legs.py [--small /root/testdata/sf0.1]
          [--big scratch/sf1] [--runs 4] [--out SCALE_r11.json]

The leg builders duplicate ~20 lines of queries/sampling.py by design:
a measurement tool must not refactor the production plan it measures.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from gmail_bigquery_etl_spark.catalog import load_table, spread  # noqa: E402
from gmail_bigquery_etl_spark.operators.kmv import kmv_hash  # noqa: E402
from gmail_bigquery_etl_spark.queries import ALL_QUERIES  # noqa: E402
from gmail_bigquery_etl_spark.queries.sampling import (  # noqa: E402
    _PB_CUM,
    _PB_P,
    _pb_coeffs,
)
from gmail_bigquery_etl_spark.session import get_spark  # noqa: E402


def _ev(spark, sf_dir):
    return (
        spread(load_table(spark, sf_dir, "events"))
        .where(F.col("value").isNotNull() & F.col("event_id").isNotNull())
        .select(
            "event_type",
            F.round("value", 4).cast("decimal(18,4)").alias("v"),
            (kmv_hash("event_id") % _PB_P).alias("h"),
        )
    )


def _inflate(spark, sf_dir):
    ev = _ev(spark, sf_dir)
    coeffs = F.broadcast(
        spark.createDataFrame(_pb_coeffs(), "b int, a bigint, c bigint")
    )
    u = ((F.col("h") * F.col("a") + F.col("c")) % _PB_P + 1) / F.lit(
        float(_PB_P + 2)
    )
    w = F.lit(8)
    for k in range(len(_PB_CUM) - 1, -1, -1):
        w = F.when(u < F.lit(_PB_CUM[k]), F.lit(k)).otherwise(w)
    return ev.crossJoin(coeffs).select("event_type", "b", "v", w.alias("w"))


def _agg(spark, sf_dir):
    return (
        _inflate(spark, sf_dir)
        .groupBy("event_type", "b")
        .agg(F.sum(F.col("w") * F.col("v")).alias("sv"), F.sum("w").alias("n_w"))
    )


LEGS = {
    "floor": lambda spark, sf_dir: _ev(spark, sf_dir).limit(1),
    "scan": _ev,
    "inflate": _inflate,
    "agg": _agg,
    "full": lambda spark, sf_dir: ALL_QUERIES["events_bootstrap_ci"](
        spark, sf_dir
    ),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="scratch/sf1")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    spark = get_spark("bootstrap-legs", cpus=32)
    legs: dict[str, dict] = {}
    for name, build in LEGS.items():
        row: dict = {}
        for tag, sf_dir in (("small", args.small), ("big", args.big)):
            samples = []
            for _ in range(args.runs):
                t0 = time.time()
                build(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.time() - t0)
            row[f"{tag}_sec"] = round(statistics.median(samples), 3)
            row[f"{tag}_samples"] = [round(s, 3) for s in samples]
        row["ratio"] = round(row["big_sec"] / max(row["small_sec"], 1e-9), 2)
        legs[name] = row
        print(name, row["small_sec"], row["big_sec"], row["ratio"], flush=True)

    fs = legs["full"]["small_sec"] - legs["floor"]["small_sec"]
    fb = legs["full"]["big_sec"] - legs["floor"]["big_sec"]
    deflored = round(fb / max(fs, 1e-9), 2)
    result = {
        "protocol": (
            f"cumulative-subplan legs, median of {args.runs} noop-writer "
            "runs per scale point, one warm session"
        ),
        "legs": legs,
        "floor_subtracted_full_ratio": deflored,
        "loadavg_at_start": os.getloadavg()[0],
    }
    print(json.dumps({"floor_subtracted_full_ratio": deflored}))
    if args.out:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out_path = os.path.join(here, args.out)
        payload = {}
        if os.path.exists(out_path):
            with open(out_path) as fh:
                payload = json.load(fh)
        payload.setdefault("ops", {}).setdefault(
            "events_bootstrap_ci", {}
        )["leg_decomposition"] = result
        with open(out_path, "w") as fh:
            json.dump(payload, fh, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
