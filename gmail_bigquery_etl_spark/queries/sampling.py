"""KMV bottom-k sketch as gated queries: deterministic sampling +
distinct estimation (operators/kmv.py, streaming twin streaming/kmv.py).

The engine's answer to reservoir sampling: hash-bottom-k gives the same
uniform-over-distinct-values guarantee with deterministic replay (the
DuckDB oracle recomputes the identical sample), O(k) state, and a
distinct-count estimate for free. The reference has no sampling at all;
its only cardinality logic is the exact in-memory id set
(etl_service/main.py:101) this sketch replaces at scales where a set no
longer fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.kmv import (
    kmv_build,
    kmv_build_grouped,
    kmv_estimate,
)
from .registry import query

_H = "('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15))::BIGINT"

_EST_ORACLE = f"""
WITH d AS (SELECT DISTINCT event_id FROM events WHERE event_id IS NOT NULL),
h AS (SELECT {_H.format(col='event_id')} AS h FROM d),
bk AS (SELECT h FROM h ORDER BY h LIMIT 256)
SELECT CAST(256 AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(FLOOR(CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
                       ELSE 255.0 * 1152921504606846976.0 / MAX(h) END)
            AS BIGINT) AS est_distinct
FROM bk
"""


@query("agg_kmv_distinct_events", oracle=_EST_ORACLE)
def agg_kmv_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count estimate of event_id with k=256: the bottom-k
    is TakeOrderedAndProject (per-partition heaps merged at the driver,
    no global sort), everything after the hash is O(k). The oracle
    recomputes the identical bottom-k and Beyer et al. estimator
    relationally -- the gate checks the ESTIMATE bit-for-bit, not just
    its error band (accuracy-vs-exact is pytest-gated)."""
    ev = load_table(spark, sf_dir, "events")
    return kmv_estimate(kmv_build(ev, "event_id", 256), 256)


@query(
    "agg_kmv_sample_users",
    oracle=f"""
WITH d AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
h AS (SELECT {_H.format(col='user_id')} AS h,
             CAST(user_id AS BIGINT) AS user_id FROM d)
SELECT h, user_id FROM h ORDER BY h LIMIT 16
""",
)
def agg_kmv_sample_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sample face of the same sketch: the 16 distinct users with
    the smallest hashes ARE a uniform sample of the user population --
    and exactly reproducible, so the oracle materializes the very same
    16 rows. This is how a 100 TB pipeline samples users for an eval
    set without a global shuffle or a nondeterministic rand()."""
    ev = load_table(spark, sf_dir, "events")
    return kmv_build(ev, "user_id", 16).select(
        "h", F.col("value").cast("bigint").alias("user_id")
    )


@query(
    "events_kmv_grouped_sample",
    oracle=f"""
WITH d AS (SELECT DISTINCT event_type, user_id FROM events
            WHERE user_id IS NOT NULL),
h AS (SELECT event_type, {_H.format(col='user_id')} AS h,
             CAST(user_id AS BIGINT) AS user_id FROM d),
r AS (SELECT event_type, h, user_id,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM h)
SELECT event_type, h, user_id FROM r WHERE rn <= 4
""",
)
def events_kmv_grouped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group KMV: 4-user deterministic sample per event type in one
    hash projection + one window rank (single shuffle on the group key).
    Ties are impossible (the hash is injective over distinct inputs up
    to md5 collisions), so rank order is total and the oracle's
    ROW_NUMBER reproduces it exactly."""
    ev = load_table(spark, sf_dir, "events")
    return kmv_build_grouped(ev, ["event_type"], "user_id", 4).select(
        "event_type", "h", F.col("value").cast("bigint").alias("user_id")
    )


@query("stream_kmv_distinct_events", oracle=_EST_ORACLE)
def stream_kmv_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAM-MAINTAINED sketch, gated against the batch spec: the
    corpus arrives as three micro-batches through the real
    snapshot-pointer sink (streaming/kmv.apply_kmv_batch -- the exact
    code path the streaming maintenance runs), and the final committed
    state's estimate must equal the one-shot batch build's. Proves the
    merge contract (bottom-k of union == bottom-k of merged bottom-k's)
    on the production write path, not just in pytest."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..streaming.kmv import apply_kmv_batch, read_kmv

    ev = load_table(spark, sf_dir, "events")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_sinks_{os.getpid()}",
        f"kmv_{tag}",
    )
    shutil.rmtree(root, ignore_errors=True)
    for i in range(3):
        apply_kmv_batch(
            spark,
            ev.where(F.col("event_id") % 3 == i),
            i,
            "event_id",
            root,
            256,
        )
    return kmv_estimate(read_kmv(spark, root), 256)
