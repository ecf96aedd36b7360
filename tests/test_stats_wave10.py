"""Round-10 second wave: e2e assembly pipeline + k-group statistics.

Each gate is re-derived here from raw fixture rows in pure Python --
independent of both engines' SQL/DataFrame machinery.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb
import pytest

from gmail_bigquery_etl_spark.queries import ALL_QUERIES

SF = "/root/testdata/sf0.01"


def _duck(sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'"
    )
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    return con.execute(sql).fetchall()


def test_assembly_e2e_recompute(spark):
    """Survivor set, per-group totals, chunk count, padding, and the
    straddler count all recomputed from raw documents in Python."""
    docs = _duck("SELECT doc_id, text FROM documents ORDER BY doc_id")
    kept = []
    for did, text in docs:
        toks = text.strip().lower().split()
        n_tok = len(toks) if text.strip() else 0
        sumlen = sum(len(t) for t in toks)
        n_stop = sum(1 for t in toks if t in ("the", "a"))
        if (
            n_tok >= 50
            and 3 * n_tok <= sumlen <= 10 * n_tok
            and n_stop >= 2
        ):
            kept.append((did, text, n_tok))
    first = {}
    for did, text, n_tok in kept:
        h = hashlib.md5(text.encode()).hexdigest()
        first.setdefault(h, (did, n_tok))
    surv = sorted(first.values())
    want = defaultdict(lambda: [0, 0, 0])  # g -> [n, total, straddlers]
    offs = defaultdict(int)
    for did, n_tok in surv:
        g = did % 8
        s = offs[g]
        want[g][0] += 1
        want[g][1] += n_tok
        if s // 128 != (s + n_tok - 1) // 128:
            want[g][2] += 1
        offs[g] += n_tok
    rows = ALL_QUERIES["pipeline_assembly_e2e"](spark, SF).collect()
    assert len(rows) == len(want)
    for r in rows:
        n, total, strad = want[r.g]
        assert (r.n_docs, r.total_tokens, r.n_straddlers) == (
            n,
            total,
            strad,
        ), r.g
        assert r.n_chunks == -(-total // 128)
        assert r.pad_tokens == r.n_chunks * 128 - total
    # the pipeline must actually FILTER and DEDUP (non-vacuous stages)
    assert sum(v[0] for v in want.values()) < len(docs)


def test_kruskal_wallis_recompute(spark):
    """H from a scipy-free rank recompute over raw l_quantity rows."""
    rows = _duck("SELECT l_returnflag, CAST(l_quantity AS BIGINT) FROM lineitem")
    by_val = Counter(v for _, v in rows)
    # doubled average rank per value
    dr = {}
    m = 0
    for v in sorted(by_val):
        c = by_val[v]
        dr[v] = 2 * m + c + 1
        m += c
    t2 = defaultdict(int)
    n = defaultdict(int)
    for g, v in rows:
        t2[g] += dr[v]
        n[g] += 1
    nn = sum(n.values())
    s = sum(t2[g] ** 2 / n[g] for g in ("R", "A", "N"))
    h = 3.0 / (nn * (nn + 1)) * s - 3.0 * (nn + 1)
    tie = sum(c**3 - c for c in by_val.values())
    hc = h / (1.0 - tie / (nn**3 - nn))
    out = ALL_QUERIES["agg_kruskal_wallis"](spark, SF).collect()[0]
    assert (out.n_r, out.n_a, out.n_n) == (n["R"], n["A"], n["N"])
    assert (out.t2_r, out.t2_a, out.t2_n) == (t2["R"], t2["A"], t2["N"])
    assert out.tie_term == tie
    assert out.h == pytest.approx(h, abs=1e-5)
    assert out.h_tie_corrected == pytest.approx(hc, abs=1e-5)
    assert out.significant == (hc > 5.991465)


def test_chi_square_recompute(spark):
    rows = _duck("SELECT o_orderpriority, o_orderstatus FROM orders")
    obs = Counter(rows)
    rt = Counter(p for p, _ in rows)
    ct = Counter(s for _, s in rows)
    nn = len(rows)
    chi2 = sum(
        round((o - rt[p] * ct[s] / nn) ** 2 / (rt[p] * ct[s] / nn), 9)
        for (p, s), o in obs.items()
    )
    out = ALL_QUERIES["agg_chi_square_independence"](spark, SF).collect()
    assert len(out) == len(obs)
    assert sum(r.observed for r in out) == nn
    for r in out:
        assert r.observed == obs[(r.priority, r.status)]
        assert r.dof == (len(rt) - 1) * (len(ct) - 1)
        assert r.chi2_total == pytest.approx(chi2, abs=1e-5)
        assert r.significant == (chi2 > 15.507313)
