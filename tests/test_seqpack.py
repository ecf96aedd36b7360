"""Sequence-packing laws (operators/seqpack.py).

Conservation and capacity are the packing contracts a trainer relies
on: every input token lands in exactly one output row (concat-chunk) /
exactly one bin (FFD), interior chunks are perfectly full, and no FFD
bin exceeds the context length. The FFD assignment is additionally
pinned against an independent pure-Python recompute.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.catalog import load_table
from gmail_bigquery_etl_spark.functions.text import token_count
from gmail_bigquery_etl_spark.operators.seqpack import ffd_fit, pack_ffd_bins
from gmail_bigquery_etl_spark.queries import ALL_QUERIES

SF = "/root/testdata/sf0.01"
C = 128


def _doc_lens(spark):
    return {
        (r.g, r.doc_id): r.ln
        for r in load_table(spark, SF, "documents")
        .select(
            (F.col("doc_id") % 8).alias("g"),
            "doc_id",
            token_count("text").cast("bigint").alias("ln"),
        )
        .collect()
    }


def test_concat_chunks_conservation_and_interior_fill(spark):
    """Sum of chunk fills == corpus token count; every non-tail chunk
    of every group is EXACTLY full; chunk ids are dense from 0."""
    rows = ALL_QUERIES["pipeline_pack_sequences"](spark, SF).collect()
    lens = _doc_lens(spark)
    assert sum(r.fill for r in rows) == sum(lens.values())
    by_g = defaultdict(dict)
    for r in rows:
        by_g[r.g][r.chunk] = r
    for g, chunks in by_g.items():
        tail = max(chunks)
        assert sorted(chunks) == list(range(tail + 1))
        for k, r in chunks.items():
            if k != tail:
                assert r.fill == C, (g, k, r.fill)
            # a chunk fully covered by one straddling document has
            # n_starts == 0; n_starts can never exceed docs touching
            assert 0 <= r.n_starts <= r.n_docs


def test_ffd_bins_conservation_capacity_and_exact_assignment(spark):
    """Sum of bin fills == corpus token count; fill <= C for every bin
    whose documents all fit (with max doc len 99 < C that is ALL bins);
    the per-doc assignment equals a pure-Python FFD recompute."""
    lens = _doc_lens(spark)
    assigned = {
        (r.g, r.doc_id): r.bin
        for r in pack_ffd_bins(
            load_table(spark, SF, "documents").select(
                (F.col("doc_id") % 8).alias("g"),
                "doc_id",
                token_count("text").cast("bigint").alias("ln"),
            ),
            len_col="ln",
            order_col="doc_id",
            group_col="g",
            context_len=C,
        ).collect()
    }
    assert set(assigned) == set(lens)
    groups = defaultdict(list)
    for (g, did), ln in lens.items():
        groups[g].append((ln, did))
    fills: dict[tuple, int] = defaultdict(int)
    for g, items in groups.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        bins = ffd_fit([ln for ln, _ in items], C)
        for (ln, did), b in zip(items, bins):
            assert assigned[(g, did)] == b, (g, did)
            fills[(g, b)] += ln
    assert sum(fills.values()) == sum(lens.values())
    assert all(f <= C for f in fills.values())
    # the packing is non-trivial: some bin holds >1 doc, some group
    # has >1 bin (vocab of lengths 10..99 vs C=128 guarantees both)
    rows = ALL_QUERIES["pipeline_pack_ffd_bins"](spark, SF).collect()
    assert any(r.n_docs > 1 for r in rows)
    assert len({(r.g, r.bin) for r in rows}) > 8


def test_ffd_fit_oversized_and_order():
    """Reference loop semantics: oversized items open their own bin;
    first-fit prefers the earliest bin with room."""
    assert ffd_fit([200, 100, 60, 50, 40], 128) == [0, 1, 2, 2, 3]
    assert ffd_fit([100, 60, 50, 40, 20], 128) == [0, 1, 1, 2, 0]
    assert ffd_fit([], 128) == []
    assert ffd_fit([128, 128], 128) == [0, 1]


def test_concat_chunks_distinct_straddlers_multi_chunk_doc(spark):
    """A document spanning MORE than two chunks is one straddler, not
    k0!=k1 crossings: sum(n_starts) - sum(n_whole) must equal the number
    of distinct boundary-crossing documents. Synthetic group: lengths
    (300, 20, 100) at C=128 -> doc 1 spans chunks 0-2 (2 crossings, 1
    straddler), doc 2 sits wholly in chunk 2, doc 3 crosses 2->3."""
    from gmail_bigquery_etl_spark.operators.seqpack import pack_concat_chunks

    docs = spark.createDataFrame(
        [(0, 1, 300), (0, 2, 20), (0, 3, 100)], "g long, doc_id long, ln long"
    )
    rows = pack_concat_chunks(
        docs, len_col="ln", order_col="doc_id", group_col="g",
        context_len=128,
    ).collect()
    n_starts = sum(r.n_starts for r in rows)
    n_whole = sum(r.n_whole for r in rows)
    n_docs = sum(r.n_docs for r in rows)
    assert n_starts == 3
    assert n_starts - n_whole == 2          # distinct straddlers
    assert n_docs - n_starts == 3           # crossings over-count: 2+0+1
    assert sum(r.fill for r in rows) == 420
    by_chunk = {r.chunk: r for r in rows}
    assert by_chunk[2].n_whole == 1         # the 20-token doc
    assert by_chunk[0].n_starts == 1 and by_chunk[1].n_starts == 0
