"""Incremental-ingest operators: the reference's semantic core.

The load-bearing operator of the whole reference pipeline is one anti-join:
``[m for m in messages if m["id"] not in existing_email_ids]``
(reference etl_service/main.py:175, build side main.py:94-104). Here it is a
broadcast LEFT ANTI join -- the id set is shipped once per executor instead
of once per thread.

Scale posture (100 TB): the broadcast is only correct while the distinct-id
projection fits the broadcast threshold. ``incremental_anti_join`` takes a
``broadcast_hint`` flag; when the sink's id set outgrows it, pass False and
Catalyst plans a shuffle/sort-merge anti-join, which AQE converts back to
broadcast at runtime if stats allow. For a date-partitioned sink, pass a
pre-filtered ``existing`` (partition-pruned id scan) rather than the full
``SELECT id`` -- the reference's full-table id scan (main.py:97) is exactly
what does NOT survive 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.headers import (
    flatten_labels,
    header_value,
    label_predicate,
    parse_rfc2822,
)


def incremental_anti_join(
    incoming: DataFrame,
    existing: DataFrame,
    key: str = "id",
    broadcast_hint: bool = True,
) -> DataFrame:
    """Keep only incoming rows whose ``key`` is absent from ``existing``.

    Parity: reference etl_service/main.py:175 (set-membership anti-join).
    """
    ids = existing.select(key).distinct()
    if broadcast_hint:
        ids = F.broadcast(ids)
    return incoming.join(ids, key, "left_anti")


def pruned_sink_ids(
    spark,
    sink_path: str,
    since,
    date_col: str = "ingest_date",
    key: str = "id",
) -> DataFrame:
    """Partition-pruned incremental id scan: the 100 TB posture for the
    anti-join's build side (SURVEY.md §7.3 item 5).

    The reference scans the sink's FULL id column every cycle
    (etl_service/main.py:97) -- linear in sink history, the one cost that
    grows without bound. When the sink is written partitioned by ingest
    date and the source replays only a bounded recent window (Gmail's
    recent-message fetch), ids older than the replay watermark can never
    collide with incoming rows, so scanning only partitions >= ``since``
    is EXACT, not approximate -- and the scan cost becomes proportional
    to the replay window instead of to sink history. ``since`` must be a
    plan-time literal (date/str), keeping the pruning STATIC: Catalyst
    resolves the matching directories at planning (PartitionFilters in
    the scan node, plan-asserted in tests) and unmatched partitions are
    never listed, opened, or footer-read."""
    return (
        # explicit schema: a cold-start sink written from an EMPTY source
        # has no partition dirs to infer from
        spark.read.schema(f"{key} string, {date_col} date")
        .parquet(sink_path)
        .filter(F.col(date_col) >= F.lit(since))
        .select(key)
    )


def extract_email_records(
    messages: DataFrame,
    rich: bool = False,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Gmail-shaped message rows -> flat email records.

    Reproduces the record build at reference etl_service/main.py:196-204:
    first-match case-insensitive header extraction with NULL default,
    threadId defaulting to '' (not NULL), labels flattened to a CSV string.
    Everything is a codegen'd expression; no UDFs, no shuffle.

    ``passthrough``: extra input columns carried verbatim onto the record
    (e.g. a pruning flag) -- avoids a self-join back onto the input to
    re-attach columns this projection would otherwise drop.
    """
    cols = [
        F.col("id"),
        F.coalesce(F.col("threadId"), F.lit("")).alias("threadId"),
        header_value("headers", "subject").alias("subject"),
        header_value("headers", "from").alias("sender"),
        header_value("headers", "to").alias("recipient"),
        header_value("headers", "date").alias("timestamp"),
        flatten_labels("labelIds").alias("combined_labels"),
    ]
    if rich:
        cols += [
            F.coalesce(F.col("labelIds"), F.array().cast("array<string>")).alias(
                "labels"
            ),
            parse_rfc2822(header_value("headers", "date")).alias("ts"),
        ]
    cols += [F.col(c) for c in passthrough]
    return messages.select(*cols)


def ingest_increment(
    messages: DataFrame,
    existing: DataFrame,
    broadcast_hint: bool = True,
) -> DataFrame:
    """The reference /fetch dataflow as one lazy plan:

    source predicate (main.py:160) -> anti-join vs sink (main.py:175) ->
    record build (main.py:196-204) -> per-id dedup (main.py:205).

    The anti-join is placed BEFORE record extraction, mirroring the
    reference's manual plan-shape decision to anti-join before the expensive
    detail fetch (main.py:175 precedes :179-206) -- at scale this is what
    keeps already-ingested rows out of every downstream stage.

    Dedup note: the reference dict is last-writer-wins (main.py:205);
    ``dropDuplicates`` keeps an arbitrary first row. For identical payloads
    (the only duplicates the source produces) the results agree; the
    divergence is documented in SURVEY.md §7.3.
    """
    fresh = messages.filter(label_predicate("labelIds"))
    fresh = incremental_anti_join(fresh, existing, "id", broadcast_hint)
    records = extract_email_records(fresh)
    return records.dropDuplicates(["id"])


def incremental_near_dup(
    new: DataFrame,
    existing: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Classify an incoming batch against an ALREADY-INGESTED corpus:
    ``outcome`` in ('exact_dup', 'near_dup', 'ingest') per new document.

    The reference's incremental ingest dedups exact-by-id only
    (etl_service/main.py:175); a training-data pipeline must also refuse
    near-copies of what the sink already holds -- WITHOUT re-pairing the
    whole corpus per batch. Shape:

      1. exact: content-hash LEFT join vs the sink's distinct hashes (the
         J1 anti-join on md5(text) instead of id);
      2. candidates: MinHash-LSH band join of the non-exact remainder
         AGAINST the sink's band table -- two-sided equi-join on
         (band, band_key), cost proportional to the BATCH, not the
         corpus; in production the sink's bands/signatures are a
         persisted index maintained alongside the data, not recomputed;
      3. verify: exact shingle-set Jaccard on candidates only;
      4. precedence: exact_dup beats near_dup beats ingest.

    Skew: sink-side buckets wider than ``max_bucket`` are dropped before
    the join (boilerplate mega-buckets; the same cap/rationale as
    lsh_candidate_pairs). A capped bucket can only flip near_dup ->
    ingest, never corrupt exact_dup.
    """
    from .dedup import banded_signatures, grams_stage, jaccard_pairs_from_grams

    nh = new.withColumn("_h", F.md5(F.col(text_col)))
    eh = existing.select(F.md5(F.col(text_col)).alias("_h")).distinct()
    marked = nh.join(
        F.broadcast(eh.withColumn("_is_exact", F.lit(True))), "_h", "left"
    )
    rest = marked.filter(F.col("_is_exact").isNull()).drop("_is_exact", "_h")

    # Both gram stages feed TWO plan branches each (band signatures and
    # the Jaccard verifier's union). The stage is a projection, not an
    # exchange, so ReuseExchange cannot deduplicate it -- without pinning,
    # Spark re-runs tokenize+shingle+md5 over the full corpus once per
    # consumer. localCheckpoint materializes each exactly once.
    grams_n = grams_stage(rest, text_col, id_col, shingle_n).localCheckpoint()
    grams_e = grams_stage(existing, text_col, id_col, shingle_n).localCheckpoint()
    bands_n = banded_signatures(grams_n, id_col, num_hashes, bands)
    bands_e = (
        banded_signatures(grams_e, id_col, num_hashes, bands)
        .withColumn(
            "_bw", F.count("*").over(W.partitionBy("band", "band_key"))
        )
        .filter(F.col("_bw") <= max_bucket)
        .drop("_bw")
    )
    cand = (
        bands_n.select(F.col("_id").alias("id_a"), "band", "band_key")
        .join(
            bands_e.select(F.col("_id").alias("id_b"), "band", "band_key"),
            ["band", "band_key"],
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # ids are disjoint across sides (caller contract), so one unioned
    # gram frame serves both join legs of the verifier.
    verified = jaccard_pairs_from_grams(grams_n.unionAll(grams_e), cand, id_col)
    near_ids = (
        verified.filter(F.col("jaccard") >= threshold)
        .select(F.col("id_a").alias(id_col))
        .distinct()
        .withColumn("_is_near", F.lit(True))
    )
    return (
        marked.drop("_h")
        .join(near_ids, id_col, "left")
        .select(
            *[c for c in new.columns],
            F.when(F.col("_is_exact").isNotNull(), "exact_dup")
            .when(F.col("_is_near").isNotNull(), "near_dup")
            .otherwise("ingest")
            .alias("outcome"),
        )
    )


# --- J1 auto-mode: size-driven broadcast / bloom / shuffle selection ---------

BROADCAST_MAX_BYTES = 8 << 20  # ship the whole id set to every executor
BLOOM_MAX_BYTES = 2 << 30  # past this a bounded-m filter saturates


def estimate_plan_bytes(df: DataFrame) -> int:
    """Catalyst's own plan-time size estimate (sizeInBytes from the
    optimized logical plan) -- file-size-based for parquet scans, free
    (no job). The same statistic the engine's auto-broadcast decision
    uses, so auto-mode's regime choice agrees with what Catalyst would
    believe about the relation."""
    return int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )


def choose_anti_join_strategy(
    existing: DataFrame,
    broadcast_max_bytes: int = BROADCAST_MAX_BYTES,
    bloom_max_bytes: int = BLOOM_MAX_BYTES,
    key: str | None = None,
) -> str:
    """'broadcast' | 'bloom' | 'shuffle' from the build side's estimated
    bytes. Rungs: a small id set ships whole (one broadcast, zero
    shuffle of the probe side); a mid-size set is too big to ship but a
    <= m-row Bloom bit table still broadcasts, pruning
    definitely-absent probes before the residual shuffle join; a huge
    set saturates any bounded-m filter (all bits set => no pruning, pure
    overhead), so it goes straight to the shuffle anti-join.

    When ``key`` is given, the estimate is taken on the KEY PROJECTION
    (what the anti-join actually ships as its build side), not the full
    relation -- a wide sink table must not push auto-mode off the
    broadcast rung when its id column alone broadcasts comfortably.
    Catalyst's Project stats scale sizeInBytes by the output/input row
    width ratio, so this stays a free plan-time estimate."""
    build = existing.select(key) if key is not None else existing
    est = estimate_plan_bytes(build)
    if est <= broadcast_max_bytes:
        return "broadcast"
    if est <= bloom_max_bytes:
        return "bloom"
    return "shuffle"


def incremental_anti_join_auto(
    incoming: DataFrame,
    existing: DataFrame,
    key: str = "id",
    mode: str = "auto",
    broadcast_max_bytes: int = BROADCAST_MAX_BYTES,
    bloom_max_bytes: int = BLOOM_MAX_BYTES,
    bloom_m: int = 1 << 20,
    bloom_depth: int = 4,
) -> DataFrame:
    """Self-tuning J1: plain-anti-join SEMANTICS in every regime (the
    Bloom rung's no-false-negative split and residual join compose to
    exactly the anti-join answer -- the equivalence the
    ingest_bloom_prefilter oracle proves), with the physical strategy
    picked from the build side's plan-time size estimate. ``mode``
    overrides explicitly ('broadcast' / 'bloom' / 'shuffle'); 'auto'
    delegates to choose_anti_join_strategy. Regime thresholds are
    plan-test-pinned in tests/test_plans.py."""
    if mode == "auto":
        mode = choose_anti_join_strategy(
            existing, broadcast_max_bytes, bloom_max_bytes, key=key
        )
    if mode == "broadcast":
        return incremental_anti_join(incoming, existing, key, True)
    if mode == "shuffle":
        return incremental_anti_join(incoming, existing, key, False)
    if mode == "bloom":
        from .bloom import bloom_prefiltered_anti_join

        return bloom_prefiltered_anti_join(
            incoming,
            existing,
            key,
            m=bloom_m,
            depth=bloom_depth,
            broadcast_hint=False,
        ).drop("bloom_checked")
    raise ValueError(f"unknown anti-join mode: {mode}")
