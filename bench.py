"""Benchmark harness: runs the declared query corpus at a scale-factor
directory and prints ONE JSON line:

  {"metric": "...", "value": <total best-of-2 sec>, "unit": "sec",
   "cold": <total first-run sec>, "queries": {name: sec, ...},
   "sf": <float>}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32),
     BENCH_QUERIES      (optional comma-list to restrict),
     BENCH_RUNS         (runs per query, default 2; min is reported),
     BENCH_LOAD_GATE    (start-gate loadavg threshold, default 1.5;
                         0 disables),
     BENCH_LOAD_GATE_TIMEOUT (max seconds to wait for the gate,
                         default 600; floored at 300 whenever the
                         gate is enabled -- see inline note).

Contention defenses (rounds 4/5 both benched on a loaded box):
1. START GATE -- before any timing, wait (bounded) for 1-min loadavg to
   drop under BENCH_LOAD_GATE. Timing out does not abort the bench, it
   just records reality: the gate wait plus start/end loadavg land in
   the output line, so a contaminated run stays diagnosable.
2. OUTLIER RE-RUN -- after the main pass, the top-10 slowest queries by
   warm min get one extra run each and report best-of-(N+1). A noise
   spike that inflated both main-pass samples of one query (the
   BENCH_r05 `set_ops` 4.7 s case) self-corrects inside the artifact.
3. ENVIRONMENT FINGERPRINT -- the output line carries steal_pct
   (hypervisor CPU steal across the timed window) and duckdb_canary
   (3 fixed oracles timed single-thread in the same session), so a
   uniform drift like BENCH_r09's +7% is classifiable from the
   artifact alone: canary at parity + uniform Spark drift = slower VM
   instance under parallel load, not a code regression.

Each query is materialized with the noop writer (full computation, no
driver collect, no Python transfer) -- the honest end-to-end cost of the
plan, which is what has to survive a 100 TB cluster.

Each query runs BENCH_RUNS times back-to-back in the same session and the
headline per-query number is the MIN (warm best-of-2 by default).
Single-shot numbers on this box swing +/-40% (GC, cold plan compile,
Python worker churn), which made round-over-round comparison
unfalsifiable; the warm min is the stable signal. The first-run (cold)
timings are preserved per-query in bench_results.json and as a "cold"
total on the stdout line for history.

The consumer of stdout captures only a ~2 KB TAIL, so the one stdout line
is hard-capped at _LINE_BUDGET bytes: per-query values degrade 3 -> 2 -> 1
decimals, and if the corpus outgrows even that, the FASTEST queries fold
into a {"fast": {"n": .., "secs": ..}} bucket (slow queries -- the ones
worth reading -- stay itemized). Full 3-decimal timings always go to
bench_results.json and stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gmail_bigquery_etl_spark.queries import ALL_QUERIES  # noqa: E402
from gmail_bigquery_etl_spark.session import get_spark  # noqa: E402

# Environment fingerprint (VERDICT r9 item #6): BENCH_r09's +7% uniform
# drift took a session to re-diagnose as VM contention because the
# artifact itself carried no single-thread reference.  Two fields make
# the next drift self-classifying from the JSON line alone:
#   steal_pct     -- hypervisor CPU steal over the whole timed window
#                    (delta of /proc/stat's steal vs total jiffies);
#   duckdb_canary -- 3 fixed oracle queries timed in DuckDB (single-
#                    thread, warm best-of-2) in the SAME session.  If a
#                    Spark total drifts while the canary holds parity
#                    with prior rounds, the box's parallel throughput
#                    moved, not the query code (the r9 signature).
_CANARY = ["q1_pricing_summary", "q6_forecast_revenue", "events_gap_fill_hourly"]


def _cpu_times() -> tuple[int, int] | None:
    """(steal, total) jiffies from /proc/stat, or None off-Linux."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(v) for v in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except (OSError, ValueError, IndexError):
        return None


def _duckdb_canary(sf_dir: str) -> dict[str, float]:
    """Time the canary oracles in DuckDB on the bench's own parquet."""
    try:
        import duckdb

        from gmail_bigquery_etl_spark.queries import ALL_ORACLES
        from gmail_bigquery_etl_spark.schemas import FIXTURE_TABLES

        con = duckdb.connect()
        for t in FIXTURE_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        out = {}
        for name in _CANARY:
            if name not in ALL_ORACLES:
                continue
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                con.execute(ALL_ORACLES[name]).fetchall()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[name] = round(best, 3)
        con.close()
        return out
    except Exception as exc:  # fingerprint must never fail the bench
        print(f"# BENCH CANARY ERROR: {exc}", file=sys.stderr)
        return {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    only = {q for q in os.environ.get("BENCH_QUERIES", "").split(",") if q}

    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    spark = get_spark("bench", cpus=cpus)

    # Warmup so the alphabetically-first queries don't absorb session
    # startup: JVM + parquet footer reads, one shuffle (exchange/codegen
    # machinery), and one Arrow mapInPandas no-op (spins the Python worker
    # pool every Arrow-batched operator reuses). Generic -- no query's
    # actual work is precomputed.
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nation.groupBy("n_regionkey").count().write.format("noop").mode(
        "overwrite"
    ).save()

    def _identity(batches):
        yield from batches

    spark.range(64).mapInPandas(_identity, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    # The Python DataSource path has its own one-time machinery (driver-
    # side plan/pushFilters workers + per-executor datasource workers);
    # touch it with a 1-row limited read so the first paginated_api query
    # isn't charged for session-lifetime spin-up.
    from gmail_bigquery_etl_spark.sources.paginated import register

    register(spark)
    (
        spark.read.format("paginated_api")
        .option("path", f"{sf_dir}/events.parquet")
        .option("tokens", "1")
        .option("limit", "1")
        .load()
        .limit(1)
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # Start gate: don't begin timing while the box is visibly busy with
    # someone else's work (the bench's own Spark session is idle here).
    gate = float(os.environ.get("BENCH_LOAD_GATE", "1.5"))
    gate_timeout = float(os.environ.get("BENCH_LOAD_GATE_TIMEOUT", "600"))
    # BENCH_r08 was taken with gate_wait 100.0 (timed out, loadavg
    # 1.5-2.1) and every co-listed slow query drifted +10-20% -- pure
    # contention noise (VERDICT r8 item #7).  When a gate is wanted at
    # all, floor the wait budget at 300 s so an env override can't
    # reintroduce a contended official record; opting out of gating
    # entirely is BENCH_LOAD_GATE=0, which stays untouched.
    if gate > 0:
        gate_timeout = max(gate_timeout, 300.0)
    gate_t0 = time.perf_counter()
    while (
        gate > 0
        and os.getloadavg()[0] > gate
        and time.perf_counter() - gate_t0 < gate_timeout
    ):
        time.sleep(5)
    gate_wait = round(time.perf_counter() - gate_t0, 1)
    load_start = round(os.getloadavg()[0], 1)  # post-gate reality

    # Environment fingerprint, taken post-gate so it measures the same
    # window the timings come from: single-thread DuckDB canary first
    # (it is itself load-sensitive), then open the steal window.
    canary = _duckdb_canary(sf_dir)
    cpu0 = _cpu_times()

    runs = max(1, int(os.environ.get("BENCH_RUNS", "2")))
    timings: dict[str, float] = {}  # best-of-N (warm) -- the headline
    cold: dict[str, float] = {}  # first run, plan compile included
    for name, fn in sorted(ALL_QUERIES.items()):
        if only and name not in only:
            continue
        samples: list[float] = []
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                samples.append(round(time.perf_counter() - t0, 3))
        except Exception as exc:  # report, keep benching
            print(f"# BENCH ERROR {name}: {exc}", file=sys.stderr)
        if samples:
            cold[name] = samples[0]
            timings[name] = min(samples)
        else:
            cold[name] = timings[name] = -1.0

    # Outlier re-run: one extra warm sample for the top-10 slowest, so a
    # transient load spike that hit both main-pass runs of a query gets
    # a third chance to show the query's true cost (best-of-3).
    slowest = sorted(
        (k for k, v in timings.items() if v >= 0),
        key=lambda k: timings[k],
        reverse=True,
    )[:10]
    for name in slowest:
        try:
            t0 = time.perf_counter()
            df = ALL_QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = min(
                timings[name], round(time.perf_counter() - t0, 3)
            )
        except Exception as exc:
            print(f"# BENCH RERUN ERROR {name}: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    cold_total = round(sum(t for t in cold.values() if t >= 0), 3)
    # Contamination detector: BENCH_r04's official warm total ran ~20%
    # above the repo's idle-box number because the suite shared the box.
    # loadavg at start/end (vs the bench's own 32 threads) makes a
    # loaded-box run diagnosable from the recorded JSON line alone.
    load_end = round(os.getloadavg()[0], 1)
    cpu1 = _cpu_times()
    steal_pct = (
        round(
            100.0 * (cpu1[0] - cpu0[0]) / max(1, cpu1[1] - cpu0[1]), 2
        )
        if cpu0 and cpu1
        else None
    )
    full = {
        "metric": "declared-query corpus wall time (noop-materialized, "
        f"best-of-{runs} warm)",
        "value": total,
        "unit": "sec",
        "cold": cold_total,
        "queries": timings,
        "cold_queries": cold,
        "sf": sf,
        "loadavg": [load_start, load_end],
        "gate_wait": gate_wait,
        "steal_pct": steal_pct,
        "duckdb_canary": canary,
    }
    # Full precision for humans/history: a file + stderr (NOT stdout --
    # extra stdout bytes push the parseable line out of the tail capture).
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "bench_results.json"), "w") as fh:
        json.dump(full, fh, indent=1)
    # Committed per-run HISTORY of the complete per-query map (VERDICT
    # r10 item #7): the stdout line folds the fast tail into one bucket
    # under its 2 KB budget, which made a 3x regression of any
    # under-the-cutoff query invisible in the driver record. One JSONL
    # row per run keeps every query diagnosable across rounds.
    with open(os.path.join(here, "BENCH_DETAIL.jsonl"), "a") as fh:
        fh.write(
            json.dumps(
                {**full, "ts": time.strftime("%Y-%m-%dT%H:%M:%S")},
                separators=(",", ":"),
            )
            + "\n"
        )
    print(json.dumps(full), file=sys.stderr)
    print(compact_line(full))


_LINE_BUDGET = 2000  # bytes; consumer tail-captures ~2 KB of stdout


def compact_line(full: dict) -> str:
    """The stdout line, guaranteed <= _LINE_BUDGET bytes (see module doc).

    Per-query COLD timings stay in bench_results.json only; stdout keeps
    the cold TOTAL plus the per-query warm best-of-N values.
    """
    full = {k: v for k, v in full.items() if k != "cold_queries"}
    full = {**full, "metric": "corpus-sec-noop-warm"}  # long form in the file
    for ndec in (3, 2, 1):
        q = {k: round(v, ndec) for k, v in full["queries"].items()}
        line = json.dumps({**full, "queries": q}, separators=(",", ":"))
        if len(line) <= _LINE_BUDGET:
            return line
    # Still too big: fold the fastest queries into one aggregate bucket,
    # keeping the slowest itemized. Error entries (-1.0) are NEVER
    # foldable -- they must stay visible by name.
    errors = {k: v for k, v in q.items() if v < 0}
    items = sorted(
        ((k, v) for k, v in q.items() if v >= 0),
        key=lambda kv: kv[1],
        reverse=True,
    )
    for keep in range(len(items), -1, -1):
        kept = dict(items[:keep])
        folded = items[keep:]
        out = {
            **full,
            "queries": {**errors, **kept,
                        "fast": {"n": len(folded),
                                 "secs": round(sum(v for _, v in folded), 1)}},
        }
        line = json.dumps(out, separators=(",", ":"))
        if len(line) <= _LINE_BUDGET:
            return line
    return json.dumps(
        {k: v for k, v in full.items() if k != "queries"}, separators=(",", ":")
    )


if __name__ == "__main__":
    main()
