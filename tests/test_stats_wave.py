"""Targeted pins for the round-9 statistics/profiling wave, beyond the
registry's DuckDB-oracle mirror (which already gates every query
end-to-end): brute-force recomputation of the rank statistics in plain
Python over the sf0.001 fixture, the FDR planted-control falsifiability
pin (the duplicate-payments precedent: a gate must be able to fail), and
the seat-conservation invariants of the Neyman allocator.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from gmail_bigquery_etl_spark.queries import ALL_QUERIES

SF = "/root/testdata/sf0.001"


def _duck(sql: str):
    con = duckdb.connect()
    for t in ("events", "lineitem", "documents", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).fetchall()


def test_fdr_planted_shift_is_rejected(spark):
    """Falsifiability pin: the +50 late-window shift planted into the
    click series MUST be detected and BH-rejected; a broken split, a
    broken z, or a broken step-up would all fail here."""
    rows = {
        r.event_type: r
        for r in ALL_QUERIES["events_fdr_bh"](spark, SF).collect()
    }
    assert "planted_shift" in rows
    assert rows["planted_shift"].rejected is True
    assert rows["planted_shift"].p_rank == 1
    # the real (undrifted) types give the step-up a null field to hold on
    assert {"click", "view", "purchase"} <= set(rows)
    assert abs(rows["planted_shift"].z) > 3.0


def test_mann_whitney_matches_bruteforce(spark):
    """Recompute U1 and the tie term from raw quantities with plain
    Python average ranks -- the textbook definition, no SQL."""
    out = ALL_QUERIES["agg_mann_whitney"](spark, SF).collect()[0]
    qs = _duck(
        "SELECT l_returnflag, CAST(l_quantity AS BIGINT) FROM lineitem "
        "WHERE l_returnflag IN ('R','A')"
    )
    sample = sorted((v, flag) for flag, v in qs)
    n = len(sample)
    # average ranks with ties
    ranks = {}
    i = 0
    while i < n:
        j = i
        while j < n and sample[j][0] == sample[i][0]:
            j += 1
        avg = (i + 1 + j) / 2.0  # mean of ranks i+1 .. j
        ranks[sample[i][0]] = avg
        i = j
    r1 = sum(ranks[v] for v, f in sample if f == "R")
    n1 = sum(1 for _, f in sample if f == "R")
    n2 = n - n1
    u1 = r1 - n1 * (n1 + 1) / 2.0
    assert out.n1 == n1 and out.n2 == n2
    assert out.u1_x2 == int(round(2 * u1))
    # tie term
    from collections import Counter

    t = sum(c**3 - c for c in Counter(v for v, _ in sample).values())
    assert out.tie_term == t
    var = n1 * n2 / 12.0 * ((n + 1) - t / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)
    assert out.z == pytest.approx(z, abs=1e-5)


def test_spearman_matches_bruteforce(spark):
    """Recompute rho_spearman from the daily series with plain Python
    tie-averaged ranks."""
    out = ALL_QUERIES["events_spearman_corr"](spark, SF).collect()[0]
    daily = _duck(
        "SELECT date_trunc('day', ts) AS d, "
        "SUM(CASE WHEN event_type='click' "
        "    THEN CAST(value AS DECIMAL(18,4)) ELSE 0 END) AS x, "
        "SUM(CASE WHEN event_type='purchase' "
        "    THEN CAST(value AS DECIMAL(18,4)) ELSE 0 END) AS y "
        "FROM events GROUP BY 1"
    )

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(vals):
            j = i
            while j < len(vals) and vals[order[j]] == vals[order[i]]:
                j += 1
            for k in range(i, j):
                ranks[order[k]] = (i + 1 + j) / 2.0
            i = j
        return ranks

    xs = [r[1] for r in daily]
    ys = [r[2] for r in daily]
    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    )
    assert out.n == n
    assert out.rho_spearman == pytest.approx(num / den, abs=1e-5)


def test_acf_lag1_matches_bruteforce(spark):
    """Recompute the lag-1 autocorrelation from the gap-filled hourly
    series in plain Python (full-series mean convention)."""
    rows = {
        r.lag: r for r in ALL_QUERIES["events_acf_lags"](spark, SF).collect()
    }
    hr = dict(
        _duck(
            "SELECT CAST(floor(epoch(ts)/3600) AS BIGINT), COUNT(*) "
            "FROM events GROUP BY 1"
        )
    )
    lo, hi = min(hr), max(hr)
    c = [hr.get(t, 0) for t in range(lo, hi + 1)]
    n = len(c)
    mu = sum(c) / n
    den = sum((x - mu) ** 2 for x in c)
    for k in (1, 6, 12):
        num = sum((c[t] - mu) * (c[t + k] - mu) for t in range(n - k))
        assert rows[k].n_pairs == n - k
        assert rows[k].acf == pytest.approx(num / den, abs=1e-5)


def test_neyman_seats_conserve_and_favor_variance(spark):
    """Both allocations must sum exactly to the 500-seat budget
    (Hamilton's method conserves seats by construction), and each
    column must equal an independent pure-integer Hamilton recompute
    from its own weights (w_milli for Neyman, n_docs for
    proportional) -- which also pins that Neyman seats really follow
    N_h*S_h, not headcount."""
    rows = ALL_QUERIES["curation_neyman_allocation"](spark, SF).collect()
    assert sum(r.alloc_neyman for r in rows) == 500
    assert sum(r.alloc_prop for r in rows) == 500
    assert all(r.alloc_neyman >= 0 for r in rows)
    # w_milli really is round(N*s*1000)
    for r in rows:
        assert r.w_milli == int(round(r.n_docs * r.s_chars * 1000))

    def hamilton(weights):  # {lang: w} -> {lang: seats}
        tw = sum(weights.values())
        base = {k: (500 * w) // tw for k, w in weights.items()}
        rem = sorted(
            weights, key=lambda k: (-((500 * weights[k]) % tw), k)
        )
        left = 500 - sum(base.values())
        for k in rem[:left]:
            base[k] += 1
        return base

    ney = hamilton({r.lang: r.w_milli for r in rows})
    prop = hamilton({r.lang: r.n_docs for r in rows})
    for r in rows:
        assert r.alloc_neyman == ney[r.lang]
        assert r.alloc_prop == prop[r.lang]


def test_adamic_adar_pair_matches_bruteforce(spark):
    """Recompute the three link-prediction scores for the top
    common-order pair from raw baskets."""
    out = ALL_QUERIES["graph_adamic_adar"](spark, SF).collect()
    best = max(out, key=lambda r: (r.common_orders, r.item_a, r.item_b))
    baskets = _duck(
        "SELECT DISTINCT l_orderkey, l_partkey % 1000 FROM lineitem"
    )
    from collections import defaultdict

    by_order = defaultdict(set)
    by_item = defaultdict(set)
    for o, it in baskets:
        by_order[o].add(it)
        by_item[it].add(o)
    shared = by_item[best.item_a] & by_item[best.item_b]
    shared = {o for o in shared if len(by_order[o]) >= 2}
    assert best.common_orders == len(shared)
    aa = sum(round(1.0 / math.log(len(by_order[o])), 6) for o in shared)
    assert best.adamic_adar == pytest.approx(aa, abs=1e-5)
    jac = len(shared) / (
        len(by_item[best.item_a])
        + len(by_item[best.item_b])
        - len(shared)
    )
    assert best.jaccard == pytest.approx(jac, abs=1e-5)


def test_ind_candidates_verdicts(spark):
    """The known-holds FK pairs must hold, and the PLANTED orphan slice
    must be violated with the exact expected missing count: every
    md5-selected order's shifted custkey (custkey + 1000000) is outside
    the customer key space and distinct custkeys collapse once."""
    rows = {
        r.ind: r
        for r in ALL_QUERIES["profile_ind_candidates"](spark, SF).collect()
    }
    assert rows["orders.o_custkey c= customer.c_custkey"].holds is True
    assert rows["customer.c_nationkey c= nation.n_nationkey"].holds is True
    assert rows["nation.n_regionkey c= region.r_regionkey"].holds is True
    planted = rows["orders_dirty.dirty_custkey c= customer.c_custkey"]
    assert planted.holds is False
    expected_missing = _duck(
        "SELECT COUNT(DISTINCT o_custkey + 1000000) FROM orders WHERE "
        "('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))"
        "::BIGINT % 19 = 0"
    )[0][0]
    assert expected_missing > 0
    assert planted.n_missing == expected_missing
    assert 0.0 < planted.coverage < 1.0
