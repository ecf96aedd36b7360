"""Custom paginated-API Python DataSource (sources/paginated.py).

Covers the reference scan semantics it re-expresses: label-predicate
pushdown via the q option (main.py:160), id-filter pushdown via
pushFilters, per-token partitioning (main.py:299-303), page batching, and
header projection (main.py:184-185) -- plus equivalence with the
DataFrame-synthetic message source on the same fixture.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, In

from gmail_bigquery_etl_spark.sources.paginated import (
    PaginatedApiReader,
    parse_label_query,
    register,
)
from gmail_bigquery_etl_spark.sources.synthetic import gmail_messages_from_events

SMOKE_SF = "/root/testdata/sf0.001"
EVENTS = os.path.join(SMOKE_SF, "events.parquet")


def _read(spark, **opts):
    register(spark)
    r = spark.read.format("paginated_api").option("path", EVENTS)
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_matches_synthetic_dataframe_source(spark):
    """The DataSource serves exactly the message universe the synthetic
    DataFrame transform builds (same ids, same headers, same labels)."""
    via_ds = _read(spark, tokens=4)
    via_df = gmail_messages_from_events(spark, SMOKE_SF)
    cols = ["id", "threadId", "headers", "labelIds"]
    a = sorted(map(str, via_ds.select(cols).collect()))
    b = sorted(map(str, via_df.select(cols).collect()))
    assert a == b


def test_label_query_pushdown(spark):
    """q option filters source-side: -in:spam removes 'error' messages,
    include terms keep only matching label sets."""
    df = _read(spark, q="in:inbox OR in:sent OR in:trash -in:spam")
    labels = df.select(F.explode("labelIds").alias("l")).distinct()
    got = {r.l for r in labels.collect()}
    assert "SPAM" not in got and "DRAFT" not in got
    assert {"INBOX", "SENT", "TRASH"} <= got


def test_parse_label_query():
    inc, exc = parse_label_query("in:inbox OR in:sent -in:spam -in:allmail")
    assert inc == {"INBOX", "SENT"} and exc == {"SPAM", "ALLMAIL"}
    assert parse_label_query("") == (set(), set())


def _rows(reader, partition):
    """Flatten a reader's RecordBatch pages into plain python row tuples."""
    for batch in reader.read(partition):
        yield from zip(*(c.to_pylist() for c in batch.columns))


def test_id_filter_pushdown_unit():
    """pushFilters accepts id EqualTo/In, hands back everything else."""
    r = PaginatedApiReader({"path": EVENTS})
    rest = list(
        r.pushFilters(
            [
                In(attribute=("id",), value=("m1", "m2")),
                GreaterThan(("threadId",), "t0"),
            ]
        )
    )
    assert r.id_allow == {"m1", "m2"}
    assert len(rest) == 1 and isinstance(rest[0], GreaterThan)
    got = {row[0] for p in r.partitions() for row in _rows(r, p)}
    assert got == {"m1", "m2"}


def test_point_filter_collapses_partition_planning():
    """A pushed id filter bounds the answer, so the reader plans ONE
    partition spanning every token instead of the per-token fan-out
    (saves num_tokens x worker spin-up for a point lookup) -- and that
    single partition still serves rows from ANY user slice."""
    r = PaginatedApiReader({"path": EVENTS, "tokens": "4"})
    assert len(r.partitions()) == 4  # no pushed filter: full fan-out
    r.pushFilters([In(attribute=("id",), value=("m1", "m2", "m5"))])
    parts = r.partitions()
    assert len(parts) == 1
    got = {row[0] for row in _rows(r, parts[0])}
    assert got == {"m1", "m2", "m5"}


def test_point_filter_collapse_scales_per_partition_limit():
    """The 1-partition collapse must not shrink the pushed limit's total
    cap: pre-collapse, .option("limit", N) allowed N rows per token
    partition (N*tokens overall), so the surviving partition's cap is
    scaled by num_tokens -- an id IN list of more than N ids still comes
    back complete."""
    r = PaginatedApiReader({"path": EVENTS, "tokens": "3", "limit": "1"})
    r.pushFilters([In(attribute=("id",), value=("m1", "m2", "m5"))])
    parts = r.partitions()
    assert len(parts) == 1
    got = {row[0] for row in _rows(r, parts[0])}
    assert got == {"m1", "m2", "m5"}


def test_id_filter_pushdown_end_to_end(spark):
    df = _read(spark, tokens=2).filter(F.col("id") == "m5")
    rows = df.collect()
    assert [r.id for r in rows] == ["m5"]


def test_header_projection_option(spark):
    """headers option = the reference's metadataHeaders projection: only
    requested headers get built."""
    df = _read(spark, headers="From,Date")
    names = df.select(
        F.explode(F.expr("transform(headers, h -> h.name)")).alias("n")
    ).distinct()
    assert {r.n for r in names.collect()} == {"From", "Date"}


def test_partitions_cover_all_users(spark):
    """Token partitioning is a disjoint cover: row counts match at any
    token width, and each partition only serves its user slice."""
    n2 = _read(spark, tokens=2).count()
    n8 = _read(spark, tokens=8).count()
    assert n2 == n8 > 0


def test_streaming_source_delivers_everything_once(spark, tmp_path):
    """readStream over the paginated source: every message arrives exactly
    once, one page per micro-batch, and the offsets replay deterministically
    (the reference's page loop under Structured Streaming)."""
    register(spark)
    total = _read(spark, tokens=1).count()
    stream = (
        spark.readStream.format("paginated_api")
        .option("path", EVENTS)
        .option("page_size", "500")
        .load()
    )
    out = str(tmp_path / "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time as _t

    deadline = _t.time() + 120
    while _t.time() < deadline:
        try:
            if spark.read.parquet(out).count() >= total:
                break
        except Exception:
            pass
        _t.sleep(1)
    q.stop()
    got = spark.read.parquet(out)
    assert got.count() == total
    batch = _read(spark, tokens=1)
    assert sorted(r.id for r in got.select("id").collect()) == sorted(
        r.id for r in batch.select("id").collect()
    )


def test_limit_stops_paging_unit():
    """A pushed limit stops the page loop: <=ceil(n/page_size) pages are
    fetched and exactly n rows served per partition (SURVEY §4's limit-
    pushdown rule; the Python DataSource API has no pushLimit hook, so the
    limit arrives as an option)."""
    import math

    page_size, limit = 50, 120
    r = PaginatedApiReader(
        {"path": EVENTS, "page_size": str(page_size), "limit": str(limit), "tokens": "1"}
    )
    (part,) = r.partitions()
    pages = list(r._pages(part))
    assert len(pages) <= math.ceil(limit / page_size)
    assert sum(p.num_rows for p in pages) == limit
    # unlimited reader serves strictly more
    full = PaginatedApiReader({"path": EVENTS, "tokens": "1"})
    assert sum(b.num_rows for b in full.read(part)) > limit


def test_limit_option_end_to_end(spark):
    """limit option through the Spark read path: per-partition cap, so at
    most limit*tokens rows come back, and a .limit(n) on top behaves."""
    df = _read(spark, tokens=2, limit=10)
    assert df.count() <= 20
    assert len(df.limit(5).collect()) == 5


def test_lazy_pages_fetch_nothing_beyond_consumption():
    """The page generator is genuinely lazy: consuming one page fetches one
    batch, not the whole mailbox (a real API's pageToken is never asked
    for)."""
    r = PaginatedApiReader({"path": EVENTS, "page_size": "10", "tokens": "1"})
    (part,) = r.partitions()
    gen = r._pages(part)
    first = next(gen)
    assert 0 < first.num_rows <= 12  # one batch (+ redelivered dupes)
    gen.close()  # no error: scanner abandoned without draining


def test_stream_restart_from_checkpoint_adds_nothing(spark, tmp_path):
    """Recovery contract of the partition-planned stream reader: after a
    completed run, restarting from the same checkpoint serves no new rows
    (latestOffset is stable and never backwards), and output stays
    exactly-once."""
    register(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("paginated_api")
            .option("path", EVENTS)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    run_once()
    total = _read(spark).count()
    first = spark.read.parquet(out).count()
    assert first == total
    run_once()  # restart: same checkpoint, no new data
    again = spark.read.parquet(out)
    assert again.count() == total
    assert again.select("id").distinct().count() == _read(spark).select(
        "id"
    ).distinct().count()


def test_page_size_batching_unit():
    """Small pages produce identical output (pagination is invisible)."""
    big = PaginatedApiReader({"path": EVENTS, "page_size": "100000"})
    small = PaginatedApiReader({"path": EVENTS, "page_size": "7"})
    rows_big = sorted(
        str(x) for p in big.partitions() for x in _rows(big, p)
    )
    rows_small = sorted(
        str(x) for p in small.partitions() for x in _rows(small, p)
    )
    assert rows_big == rows_small


# --- backend injection (ScanBackend registry) --------------------------------

def test_raw_events_backend_end_to_end(spark):
    """The generic machinery serves a DIFFERENT backend through the same
    format: schema comes from the backend, ids are backend-rendered, and
    the token fan-out still covers every row exactly once."""
    import duckdb

    df = _read(spark, backend="raw_events", tokens=3)
    assert df.columns == ["id", "event_type"]
    n_events = duckdb.sql(f"SELECT COUNT(*) FROM '{EVENTS}'").fetchone()[0]
    rows = df.collect()
    assert len(rows) == n_events  # no gmail %7 redelivery in this backend
    assert all(r.id.startswith("e") for r in rows[:5])


def test_raw_events_backend_id_pushdown(spark):
    """Pushed id filters route through the backend's own id translation
    ('e<event_id>', not the gmail 'm' scheme)."""
    rows = (
        _read(spark, backend="raw_events", tokens=2)
        .filter(F.col("id") == "e5")
        .collect()
    )
    assert [r.id for r in rows] == ["e5"]


def test_register_custom_backend():
    """A user-registered backend slots into the reader with no reader
    changes: the machinery asks IT for columns/filter/render."""
    import pyarrow as pa
    from pyspark.sql.types import StringType, StructField, StructType

    from gmail_bigquery_etl_spark.sources.paginated import (
        BACKENDS,
        ScanBackend,
        _token_fanout,
        register_backend,
    )

    class TypesOnlyBackend(ScanBackend):
        schema = StructType([StructField("id", StringType(), False)])
        columns = ["event_id", "user_id"]

        def scan_filter(self, token_idx, num_tokens, id_allow):
            return _token_fanout(token_idx, num_tokens)

        def render(self, df, id_allow):
            ids = "x" + df["event_id"].astype(str)
            return pa.RecordBatch.from_arrays(
                [pa.array(ids.to_numpy(dtype=object), type=pa.string())],
                names=["id"],
            )

    register_backend("types_only", TypesOnlyBackend)
    try:
        r = PaginatedApiReader(
            {"path": EVENTS, "backend": "types_only", "tokens": "2"}
        )
        parts = r.partitions()
        assert len(parts) == 2
        got = [row[0] for p in parts for row in _rows(r, p)]
        assert len(got) == len(set(got)) and all(i[0] == "x" for i in got)
    finally:
        BACKENDS.pop("types_only")


def test_unknown_backend_rejected():
    import pytest

    with pytest.raises(ValueError, match="unknown paginated_api backend"):
        PaginatedApiReader({"path": EVENTS, "backend": "nope"})
