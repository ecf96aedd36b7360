"""Reference-parity ingest queries.

These exercise the reference's entire semantic surface (SURVEY.md §2.1-§2.6)
over the Gmail-shaped messages synthesized from ``events``:

  ingest_incremental  -- the flagship: source label predicate (T1) ->
                         broadcast anti-join vs sink (J1) -> header
                         extraction HOFs (T3) -> label flatten (F2) ->
                         per-id dedup (A1). Reference etl_service/main.py:
                         160,175,196-205.
  header_extraction   -- first-match / case-insensitive / NULL-default
                         header semantics on every message, including the
                         dropped-Subject and UPPERCASED-header edge rows.
  ingest_idempotent   -- re-running the increment against a sink that
                         already contains it yields zero rows (ST1).

The DuckDB oracles derive the expected output directly from ``events`` --
they are the semantic spec, independent of the Spark implementation path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.incremental import extract_email_records, ingest_increment
from ..sources.synthetic import existing_sink_ids, gmail_messages_from_events
from .registry import query

# Shared oracle CTE: the message universe as DuckDB sees it.
_MSG_CTE = """
WITH msgs AS (
  SELECT 'm' || CAST(event_id AS VARCHAR) AS id,
         't' || CAST(user_id AS VARCHAR) AS threadId,
         event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
         CASE event_type
           WHEN 'error' THEN 'SPAM,INBOX'
           WHEN 'signup' THEN 'INBOX'
           WHEN 'purchase' THEN 'SENT,INBOX'
           WHEN 'click' THEN 'TRASH'
           ELSE 'DRAFT' END AS combined_labels,
         CASE WHEN event_id % 11 = 0 THEN NULL
              ELSE event_type || ' #' || CAST(event_id AS VARCHAR) END AS subject,
         'user' || CAST(user_id AS VARCHAR) || '@example.com' AS sender,
         'etl@example.com' AS recipient,
         strftime(CAST(ts AS TIMESTAMP), '%a, %d %b %Y %H:%M:%S +0000') AS "timestamp"
  FROM events
)
"""


@query(
    "ingest_incremental",
    oracle=_MSG_CTE
    + """
SELECT id, threadId, subject, sender, recipient, "timestamp", combined_labels
FROM msgs
WHERE event_type IN ('signup', 'purchase', 'click')
  AND event_id % 3 <> 0
""",
)
def ingest_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = gmail_messages_from_events(spark, sf_dir)
    existing = existing_sink_ids(spark, sf_dir)
    return ingest_increment(msgs, existing)


@query(
    "ingest_shuffle_anti_join",
    oracle=_MSG_CTE
    + """
SELECT id, threadId, subject, sender, recipient, "timestamp", combined_labels
FROM msgs
WHERE event_type IN ('signup', 'purchase', 'click')
  AND event_id % 3 <> 0
""",
)
def ingest_shuffle_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The over-threshold sink path (SURVEY.md §7.3): when the sink's
    distinct-id projection outgrows the broadcast threshold, the increment
    runs with ``broadcast_hint=False`` and Catalyst plans a SHUFFLE
    anti-join -- both sides hash-partitioned on id, no driver-side id set
    at all (AQE is still free to convert back to broadcast at runtime when
    stats allow; with stats pinned in tests the plan is sort-merge,
    asserted broadcast-free). Same oracle as ingest_incremental: the
    fallback must be a pure plan change."""
    msgs = gmail_messages_from_events(spark, sf_dir)
    existing = existing_sink_ids(spark, sf_dir)
    return ingest_increment(msgs, existing, broadcast_hint=False)


@query(
    "header_extraction",
    oracle=_MSG_CTE
    + """
SELECT id, threadId, subject, sender, recipient, "timestamp", combined_labels
FROM msgs
""",
)
def header_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record build over ALL messages (no predicate/anti-join), deduped --
    covers the %11 missing-Subject and %13 uppercase-header edge rows."""
    msgs = gmail_messages_from_events(spark, sf_dir)
    return extract_email_records(msgs).dropDuplicates(["id"])


@query(
    "ingest_via_datasource",
    oracle=_MSG_CTE
    + """
SELECT id, threadId, subject, sender, recipient, "timestamp", combined_labels
FROM msgs
WHERE event_type IN ('signup', 'purchase', 'click')
  AND event_id % 3 <> 0
""",
)
def ingest_via_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same increment as ingest_incremental, but the messages arrive through
    the custom paginated-API Python DataSource (sources/paginated.py): label
    predicate pushed into the source via the q option (reference main.py:160),
    per-token partitions, page-size batching. One oracle spec gates both the
    DataFrame-synthetic and DataSource paths."""
    import os

    from ..sources.paginated import register

    register(spark)
    msgs = (
        spark.read.format("paginated_api")
        .option("path", os.path.join(sf_dir, "events.parquet"))
        .option("q", "in:inbox OR in:sent OR in:trash -in:spam")
        .option("tokens", "8")
        .load()
    )
    existing = existing_sink_ids(spark, sf_dir)
    return ingest_increment(msgs, existing)


@query(
    "ingest_point_lookup",
    oracle=_MSG_CTE
    + """
SELECT id, threadId, subject, sender, recipient, "timestamp", combined_labels
FROM msgs
WHERE id IN ('m5', 'm55', 'm550')
""",
)
def ingest_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 point lookup THROUGH the DataSource pushdown chain: the id IN
    filter reaches pushFilters, becomes an event_id isin() in the Arrow
    scan (sources/paginated.py _scan_filter), and only matching rows are
    ever decoded or rendered -- the reference's messages.get by id
    (main.py:179-185) as a pushed scan."""
    import os

    from ..sources.paginated import register

    register(spark)
    msgs = (
        spark.read.format("paginated_api")
        .option("path", os.path.join(sf_dir, "events.parquet"))
        .option("tokens", "4")
        .load()
        .filter(F.col("id").isin("m5", "m55", "m550"))
    )
    return extract_email_records(msgs).dropDuplicates(["id"])


@query(
    "ingest_parse_errors",
    oracle=_MSG_CTE
    + """
, rec AS (
  SELECT id, event_id,
         CASE WHEN event_id % 17 = 0 THEN 'X' || "timestamp" ELSE "timestamp" END AS raw
  FROM msgs
)
SELECT id,
       try_strptime(left(raw, length(raw) - 6), '%a, %d %b %Y %H:%M:%S') AS ts,
       CASE WHEN raw IS NOT NULL
             AND try_strptime(left(raw, length(raw) - 6), '%a, %d %b %Y %H:%M:%S') IS NULL
            THEN 'PARSE_ERROR' END AS parse_error
FROM rec
""",
)
def ingest_parse_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Errors-as-data (reference T6/ST5): every 17th message's Date header
    is corrupted in-query; try_to_timestamp yields NULL + an error tag
    instead of an ANSI exception, so bad rows stay queryable and the job
    never aborts. Both engines corrupt and parse identically."""
    from ..operators.errors import parse_timestamp_or_error

    msgs = gmail_messages_from_events(spark, sf_dir)
    rec = extract_email_records(msgs).dropDuplicates(["id"])
    raw = F.when(
        F.substring("id", 2, 100).cast("bigint") % 17 == 0,
        F.concat(F.lit("X"), F.col("timestamp")),
    ).otherwise(F.col("timestamp"))
    staged = rec.select("id", raw.alias("_raw"))
    ts, err = parse_timestamp_or_error("_raw")
    return staged.select("id", ts.alias("ts"), err.alias("parse_error"))


@query(
    "ingest_idempotent",
    oracle="SELECT count(*) AS n_new FROM events WHERE 1 = 0",
)
def ingest_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental re-run: when the sink already holds every message id,
    the increment is empty (exactly-once-ish semantics, SURVEY §2.7 ST1)."""
    msgs = gmail_messages_from_events(spark, sf_dir)
    all_ids = msgs.select("id")
    return ingest_increment(msgs, all_ids).agg(F.count("*").alias("n_new"))


@query(
    "ingest_pruned_sink_scan",
    oracle=_MSG_CTE
    + """
, since AS (SELECT MAX(CAST(ts AS DATE)) - 7 AS d FROM events)
SELECT id, threadId, subject, sender, recipient, "timestamp", combined_labels
FROM msgs, since
WHERE event_type IN ('signup', 'purchase', 'click')
  AND CAST(ts AS DATE) >= since.d
  AND event_id % 3 <> 0
""",
)
def ingest_pruned_sink_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partition-pruned incremental id scan end-to-end (SURVEY §7.3
    item 5, the S5 100 TB posture): the sink lives as ingest-date-
    partitioned parquet; the increment reads the replay watermark (one
    scalar -- max event date minus the 7-day replay window), scans ONLY
    sink partitions >= watermark for the anti-join's build side
    (PartitionFilters plan-asserted in tests/test_plans.py), and
    anti-joins the windowed incoming messages against it. Exact, not
    approximate: ids older than the watermark cannot re-arrive when the
    source replays a bounded window, so pruned-sink output equals
    full-sink output -- which is what the oracle checks."""
    from ..operators.incremental import pruned_sink_ids
    from ..sources.synthetic import (
        messages_from_events_df,
        partitioned_sink_path,
    )
    from ..catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    # watermark read: ONE scalar crosses the driver (plan-time literal so
    # the partition pruning below stays static)
    since = ev.agg(F.date_add(F.max(F.to_date("ts")), -7)).first()[0]
    if since is None:
        # empty source: no watermark exists; any literal keeps the plan
        # analyzable and both scans correctly empty
        import datetime

        since = datetime.date(1970, 1, 1)
    sink = partitioned_sink_path(spark, sf_dir)
    existing = pruned_sink_ids(spark, sink, since)
    incoming = messages_from_events_df(ev.filter(F.to_date("ts") >= F.lit(since)))
    return ingest_increment(incoming, existing)


@query(
    "ingest_bloom_prefilter",
    oracle=_MSG_CTE
    + """
, sink AS (SELECT 'm' || CAST(event_id AS VARCHAR) AS id FROM events
           WHERE event_id % 3 = 0),
bits AS (
  -- ONE shared bit array across the d hash rows (classic Bloom), not
  -- per-row bit sets: any hash row may satisfy any probe position
  SELECT DISTINCT
         CAST('0x' || substring(md5(id), g.i * 8 + 1, 8) AS BIGINT) % 8192 AS bit
  FROM sink CROSS JOIN generate_series(0, 3) g(i)
),
fresh AS (
  SELECT * FROM msgs WHERE event_type IN ('signup', 'purchase', 'click')
),
flags AS (
  SELECT f.id,
         COUNT(b.bit) = 4 AS bloom_checked
  FROM (SELECT DISTINCT id FROM fresh) f
  CROSS JOIN generate_series(0, 3) g(i)
  LEFT JOIN bits b
    ON b.bit = CAST('0x' || substring(md5(f.id), g.i * 8 + 1, 8) AS BIGINT) % 8192
  GROUP BY f.id
)
SELECT m.id, m.threadId, m.subject, m.sender, m.recipient, m."timestamp",
       m.combined_labels, fl.bloom_checked
FROM fresh m JOIN flags fl ON fl.id = m.id
WHERE m.event_id % 3 <> 0
""",
)
def ingest_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned incremental anti-join (operators/bloom.py): rows whose
    id the sink's Bloom filter proves ABSENT skip the exact anti-join
    entirely; only the maybe-present sliver joins. The gated output is
    the plain anti-join result (identical rows to ingest_incremental)
    PLUS the bloom_checked split flag, and the oracle replays the filter
    bit-for-bit (same md5-slice positions), so both the pruning's
    exactness (no dropped new rows, no leaked sink rows) and the split
    itself are checked. 100 TB posture: the filter is a <= 8192-row
    broadcast; the exact join's probe side shrinks from |incoming| to
    |true positives| + the false-positive sliver. Bench note: as a GATE
    query this rebuilds the bit table and runs BOTH the pruned and
    residual paths every time so the oracle can prove equivalence; a
    production ingest loop persists the filter beside the sink and
    re-merges only the appended ids' bits (bloom_bits is a distinct-set
    union, incrementally maintainable), so the per-cycle cost is the
    pruned join alone."""
    from ..operators.bloom import bloom_prefiltered_anti_join
    from ..operators.incremental import extract_email_records
    from ..functions.headers import label_predicate

    msgs = gmail_messages_from_events(spark, sf_dir)
    existing = existing_sink_ids(spark, sf_dir)
    # §5 pin (optimization r12): the bloom operator consumes ``fresh``
    # in BOTH split branches (maybe-present and definitely-new), so the
    # synthetic message build ran twice per reference; pinned it runs
    # once.
    fresh = msgs.filter(label_predicate("labelIds")).localCheckpoint(
        eager=False
    )
    kept = bloom_prefiltered_anti_join(fresh, existing, "id")
    # carry the split flag THROUGH the record projection (r12, §1.2):
    # the old shape re-joined the extracted records back onto ``kept``
    # (a second full consumption of the anti-join plus a distinct) just
    # to re-attach the one column the projection dropped. The flag is
    # constant per id within a branch and the branches are id-disjoint,
    # so the passthrough is row-identical to the join.
    recs = extract_email_records(kept, passthrough=("bloom_checked",))
    return recs.dropDuplicates(["id"])


@query(
    "ingest_auto_anti_join",
    oracle=_MSG_CTE
    + """
SELECT id, threadId, subject, sender, recipient, "timestamp", combined_labels
FROM msgs
WHERE event_type IN ('signup', 'purchase', 'click')
  AND event_id % 3 <> 0
""",
)
def ingest_auto_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The self-tuning J1 path (operators/incremental.
    incremental_anti_join_auto): the physical anti-join strategy --
    broadcast / Bloom-prefilter / shuffle -- is chosen from Catalyst's
    plan-time size estimate of the sink id projection instead of a
    caller flag. Same oracle as ingest_incremental / ingest_shuffle_
    anti_join / ingest_bloom_prefilter: whatever regime the estimate
    picks (broadcast at these SFs), the ANSWER must be the plain
    anti-join result -- auto-mode is a plan decision, never a semantics
    decision. Regime thresholds + per-regime plan shapes are pinned in
    tests/test_plans.py::test_auto_anti_join_regimes."""
    from ..functions.headers import label_predicate
    from ..operators.incremental import (
        extract_email_records,
        incremental_anti_join_auto,
    )

    msgs = gmail_messages_from_events(spark, sf_dir)
    existing = existing_sink_ids(spark, sf_dir)
    fresh = msgs.filter(label_predicate("labelIds"))
    kept = incremental_anti_join_auto(fresh, existing, "id")
    return extract_email_records(kept).dropDuplicates(["id"])
