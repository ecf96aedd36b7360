"""Token-window chunking invariants (queries/pipeline.py
docs_chunk_windows): full coverage of every document's token span, fixed
stride, bounded windows -- checked against an independent Python
re-chunking of the same fixture texts. (The exact output is also
oracle-gated via the registered query.)
"""

from __future__ import annotations

import hashlib

import pytest

from gmail_bigquery_etl_spark.queries.pipeline import (
    _CHUNK_S,
    _CHUNK_W,
    docs_chunk_windows,
)

SF = "/root/testdata/sf0.001"


def _python_chunks(text: str):
    toks = text.lower().split()
    n = len(toks)
    n_chunks = 1 if n <= _CHUNK_W else (n - (_CHUNK_W - _CHUNK_S + 1)) // _CHUNK_S + 1
    out = []
    for cid in range(n_chunks):
        start = cid * _CHUNK_S
        ctoks = toks[start : start + _CHUNK_W]
        out.append(
            (
                cid,
                start,
                len(ctoks),
                hashlib.md5(" ".join(ctoks).encode()).hexdigest()[:16],
            )
        )
    return out


def test_chunks_match_python_reference(spark):
    got = {}
    for r in docs_chunk_windows(spark, SF).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.start_tok, r.n_tokens, r.chunk_hash)
        )
    import duckdb

    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
        ).fetchall()
    )
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        assert sorted(got[doc_id]) == _python_chunks(text), doc_id


def test_chunks_cover_and_overlap(spark):
    rows = docs_chunk_windows(spark, SF).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        # chunk ids are dense from 0; starts advance by exactly the stride
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        assert all(c.start_tok == c.chunk_id * _CHUNK_S for c in chunks)
        # every chunk is bounded by the window; all but the last are full
        # (a short last window is the contract) and consecutive chunks
        # overlap by w - s tokens
        assert all(c.n_tokens <= _CHUNK_W for c in chunks)
        for prev, nxt in zip(chunks, chunks[1:]):
            assert prev.n_tokens == _CHUNK_W
            assert nxt.start_tok < prev.start_tok + prev.n_tokens
        # the final chunk reaches the end of the document exactly once:
        # its span ends past every other chunk's span
        last = chunks[-1]
        end = last.start_tok + last.n_tokens
        assert all(c.start_tok + c.n_tokens <= end for c in chunks)


def test_chunking_runs_on_a_stream(spark, tmp_path):
    """chunk_windows is a pure map-only transform (explode + projections,
    no window/sort/aggregate), so it must run unmodified on a streaming
    DataFrame and produce exactly the batch rows."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    from gmail_bigquery_etl_spark.queries.pipeline import chunk_windows

    chunked = chunk_windows(stream)
    assert chunked.isStreaming
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = (
        chunked.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive
    got = {
        (r.doc_id, r.chunk_id, r.chunk_hash)
        for r in spark.read.parquet(sink).collect()
    }
    want = {
        (r.doc_id, r.chunk_id, r.chunk_hash)
        for r in chunk_windows(docs).collect()
    }
    assert got == want


@pytest.mark.parametrize("w,s", [(64, 48), (8, 4), (5, 5), (7, 3), (1, 1)])
def test_chunking_parametric_matches_python(spark, w, s):
    """The window/stride arithmetic holds across parameterizations,
    including no-overlap (w == s) and degenerate single-token windows."""
    from gmail_bigquery_etl_spark.queries.pipeline import chunk_windows

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    got = {}
    for r in chunk_windows(docs, window=w, stride=s).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_id, r.start_tok, r.n_tokens))
    for doc_id, text in _texts().items():
        toks = text.lower().split()
        n = len(toks)
        n_chunks = 1 if n <= w else (n - (w - s + 1)) // s + 1
        want = [
            (cid, cid * s, len(toks[cid * s : cid * s + w]))
            for cid in range(n_chunks)
        ]
        assert sorted(got[doc_id]) == want, (doc_id, w, s)


def test_chunking_rejects_lossy_stride(spark):
    import pytest as _pytest

    from gmail_bigquery_etl_spark.queries.pipeline import chunk_windows

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    with _pytest.raises(ValueError):
        chunk_windows(docs, window=4, stride=5)
    with _pytest.raises(ValueError):
        chunk_windows(docs, window=4, stride=0)


def _texts():
    import duckdb

    return dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
        ).fetchall()
    )
