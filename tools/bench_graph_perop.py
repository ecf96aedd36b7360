"""Un-confounded graph-trio scale measurement (VERDICT r9 item #2).

The round-9 composite rows for clustering coefficient / LPA exceeded
the 2x bar, with the builder's decomposition attributing the excess to
the shared near-dup LSH pair pipeline (which carries its own
adjudicated scale rows). This harness makes that decomposition
MEASURED instead of credible: per scale point it materializes the
distinct pair table to parquet ONCE, then times each graph operator
over the materialized pairs (noop-writer, median of N runs), plus the
pair pipeline itself as its own row.

Usage: python tools/bench_graph_perop.py [--small /root/testdata/sf0.1]
          [--big scratch/sf1] [--runs 4] [--out SCALE_r10.json]

Rows merge into the --out artifact's "ops" dict under the REGISTERED
query names (the per-op number IS the operator's scale row; the
"protocol" field records how it was taken).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmail_bigquery_etl_spark.session import get_spark  # noqa: E402


def _noop_time(thunk) -> float:
    """Time plan CONSTRUCTION + materialization: the graph operators
    localCheckpoint intermediate rounds eagerly, so the work must start
    inside the timer -- pass a thunk, not a built DataFrame."""
    t0 = time.time()
    thunk().write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _materialize_pairs(spark, sf_dir: str, dst: str) -> tuple[float, int]:
    from gmail_bigquery_etl_spark.queries.graph import _lsh_pairs

    t0 = time.time()
    pairs = _lsh_pairs(spark, sf_dir).select("id_a", "id_b").distinct()
    pairs.write.mode("overwrite").parquet(dst)
    dt = time.time() - t0
    n = spark.read.parquet(dst).count()
    return dt, n


def _materialize_purchase_edges(spark, sf_dir: str, dst: str) -> tuple[float, int]:
    """HITS runs on the bipartite customer->part purchase graph, not the
    LSH dup graph; its un-confounded input is the distinct (cust, item)
    edge list with the orders join already paid."""
    from pyspark.sql import functions as F

    from gmail_bigquery_etl_spark.catalog import load_table

    t0 = time.time()
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("item"))
        .distinct()
    )
    e.write.mode("overwrite").parquet(dst)
    dt = time.time() - t0
    n = spark.read.parquet(dst).count()
    return dt, n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="scratch/sf1")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--out", default="SCALE_r10.json")
    ap.add_argument(
        "--ops",
        default="",
        help="comma list of per-op names to run (default: all)",
    )
    args = ap.parse_args()

    from gmail_bigquery_etl_spark.queries.graph import (
        clustering_coeff_from_pairs,
        hits_from_edges,
        label_propagation_from_pairs,
    )

    spark = get_spark("graph-perop", cpus=32)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    report: dict[str, dict] = {}

    all_ops = {
        "graph_clustering_coeff": ("lsh_pairs", clustering_coeff_from_pairs),
        "graph_label_propagation": ("lsh_pairs", label_propagation_from_pairs),
        "graph_hits_scores": ("purchase_edges", hits_from_edges),
    }
    wanted = [o for o in args.ops.split(",") if o] or list(all_ops)
    ops = {k: v for k, v in all_ops.items() if k in wanted}
    kinds = {kind for kind, _ in ops.values()}

    # one materialized-input family per op kind; the build is reported
    # as its own (confounded-by-design) pipeline row
    frames: dict[tuple[str, str], object] = {}
    builders = {
        "lsh_pairs": ("graph_pairs", _materialize_pairs,
                      "graph_lsh_pair_pipeline"),
        "purchase_edges": ("hits_edges", _materialize_purchase_edges,
                           "graph_hits_edge_pipeline"),
    }
    for kind in sorted(kinds):
        prefix, build, row_name = builders[kind]
        stats = {}
        for tag, sf_dir in (("small", args.small), ("big", args.big)):
            dst = os.path.join(here, "scratch", f"{prefix}_{tag}.parquet")
            sec, n = build(spark, sf_dir, dst)
            stats[tag] = {"sec": round(sec, 2), "rows": n}
            frames[(kind, tag)] = spark.read.parquet(dst)
        report[row_name] = {
            "small_sec": stats["small"]["sec"],
            "big_sec": stats["big"]["sec"],
            "ratio": round(stats["big"]["sec"] / stats["small"]["sec"], 2),
            "small_rows": stats["small"]["rows"],
            "big_rows": stats["big"]["rows"],
            "protocol": "input build + distinct + parquet write, single run",
        }

    for name, (kind, fn) in ops.items():
        row: dict = {"protocol": f"median of {args.runs} runs over "
                     f"materialized {kind} (noop-writer); rows from a "
                     "parquet spill of the LAST sample, not an extra "
                     "untimed re-execution"}
        for tag in ("small", "big"):
            samples = []
            frame = frames[(kind, tag)]
            for _ in range(args.runs - 1):
                samples.append(_noop_time(lambda: fn(frame)))
            # final sample doubles as the row-count source: same timed
            # materialization, spilled to scratch parquet instead of the
            # noop sink (write overhead is in THIS sample only; it is
            # still included in the median -- parquet-vs-noop delta on a
            # few-thousand-row result is negligible next to the
            # localCheckpoint rounds being measured).
            spill = os.path.join(here, "scratch", f"perop_{name}_{tag}")
            t0 = time.time()
            fn(frame).write.mode("overwrite").parquet(spill)
            samples.append(time.time() - t0)
            row[f"{tag}_sec"] = round(statistics.median(samples), 2)
            row[f"{tag}_samples"] = [round(s, 2) for s in samples]
            row[f"{tag}_rows"] = spark.read.parquet(spill).count()
        row["ratio"] = round(row["big_sec"] / row["small_sec"], 2)
        report[name] = row
        print(name, row["small_sec"], row["big_sec"], row["ratio"],
              flush=True)

    out_path = os.path.join(here, args.out)
    payload = {"small": args.small, "big": args.big, "ops": {}}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            payload = json.load(fh)
    payload.setdefault("ops", {}).update(report)
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
