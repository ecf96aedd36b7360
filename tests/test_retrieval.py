"""BM25 ranked retrieval (queries/retrieval.py)."""

from __future__ import annotations

import math
import shutil
from collections import Counter
from decimal import Decimal


def _python_bm25(corpus, k1=1.2, b=0.75):
    """Classic BM25 reference: returns {(query_id, doc_id): score} using
    the same query-by-example protocol (top-3 tf terms of doc_id%100==0,
    ties lexical) and the same DECIMAL(18,8) partial quantization."""
    tf = {d: Counter(t.lower().split()) for d, t in corpus.items() if t.strip()}
    dlen = {d: sum(c.values()) for d, c in tf.items()}
    df = Counter(t for c in tf.values() for t in c)
    n = len(tf)
    avgdl = sum(dlen.values()) / n
    out = {}
    for q in [d for d in tf if d % 100 == 0]:
        qterms = sorted(tf[q], key=lambda t: (-tf[q][t], t))[:3]
        for d, c in tf.items():
            if d == q:
                continue
            s = Decimal(0)
            for t in qterms:
                if t not in c:
                    continue
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                part = idf * (c[t] * (k1 + 1.0)) / (
                    c[t] + k1 * (1.0 - b + b * dlen[d] / avgdl)
                )
                s += Decimal(f"{part:.8f}")
            if s:
                out[(q, d)] = float(round(s, 6))
    return out


def test_bm25_matches_python_reference(spark, tmp_path):
    corpus = {
        0: "spark shuffle join spark spark agg",
        1: "spark shuffle",
        2: "join agg window",
        3: "spark spark spark shuffle shuffle agg",
        4: "completely different words here",
        100: "shuffle agg window join window",
        101: "window window partition",
    }
    df = spark.createDataFrame(
        [(d, t, "en", "s", len(t)) for d, t in corpus.items()],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    d = tmp_path / "sf"
    d.mkdir()
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    try:
        from gmail_bigquery_etl_spark.queries.retrieval import text_bm25_topk

        got = {
            (r.query_id, r.doc_id): (r.score, r.rnk)
            for r in text_bm25_topk(spark, str(d)).collect()
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)

    want = _python_bm25(corpus)
    assert {k: v[0] for k, v in got.items()} == want
    # ranking: scores non-increasing in rnk per query, ties by doc_id
    for q in {k[0] for k in got}:
        rows = sorted(
            ((v[1], v[0], k[1]) for k, v in got.items() if k[0] == q)
        )
        for (r1, s1, d1), (r2, s2, d2) in zip(rows, rows[1:]):
            assert s1 > s2 or (s1 == s2 and d1 < d2)
