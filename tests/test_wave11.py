"""Round-11 model-based-curation wave: linear quality classifier,
perceptual-hash (dHash) image near-dup, unigram-LM tokenizer prune.

Each operator is pinned against an INDEPENDENT pure-Python recompute of
the full arithmetic (hashing via hashlib, segmentation via a literal
maximal-munch walk), not just row counts -- the test can only pass if
the distributed plan computes the same function.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.catalog import load_table
from gmail_bigquery_etl_spark.queries import ALL_QUERIES

SF = "/root/testdata/sf0.01"


def _md5i8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text").collect()


# --- curation_quality_classifier ---------------------------------------

def test_quality_classifier_recompute(spark):
    """w_sum_milli, n_bigrams, and keep recomputed from raw text with
    the same hashed-feature + md5-weight arithmetic; keep must be the
    exact integer sign test and non-vacuous both ways."""
    weights = {f: _md5i8(f"w:{f}") % 2001 - 1000 for f in range(512)}
    want = {}
    for r in _docs(spark):
        toks = r.text.strip().lower().split()
        if len(toks) < 2:
            continue
        s = n = 0
        for a, b in zip(toks, toks[1:]):
            fid = _md5i8(f"{a} {b}") % 512
            s += weights[fid]
            n += 1
        want[r.doc_id] = (n, s)
    rows = ALL_QUERIES["curation_quality_classifier"](spark, SF).collect()
    assert len(rows) == len(want)
    kept = dropped = 0
    for r in rows:
        n, s = want[r.doc_id]
        assert (r.n_bigrams, r.w_sum_milli) == (n, s), r.doc_id
        assert r.keep == (s > 0)
        assert 0.0 <= r.prob <= 1.0
        kept += r.keep
        dropped += not r.keep
    assert kept and dropped


# --- multimodal_dhash_near_dup ------------------------------------------

def _pixel(grp: int, y: int, x: int, p: int) -> int:
    hx = (
        hashlib.md5(f"img:{grp}:{y}:0".encode()).hexdigest()
        + hashlib.md5(f"img:{grp}:{y}:1".encode()).hexdigest()
    )
    v = int(hx[x * 6 : x * 6 + 2], 16)
    if y * 9 + x == p:
        v = (v + 128) % 256
    return v


def _dhash(doc_id: int, n_docs: int) -> int:
    g = max(97, n_docs // 64)
    grp, p = doc_id % g, (doc_id * 31) % 63
    h = 0
    for y in range(7):
        for x in range(8):
            if _pixel(grp, y, x + 1, p) > _pixel(grp, y, x, p):
                h |= 1 << (y * 8 + x)
    return h


def test_dhash_decode_path_matches_analytic_hash(spark):
    """The REAL-decode pipeline (SQL-built PPM bytes -> parse_ppm_raster
    -> dhash_from_raster) must reproduce the hash predicted analytically
    from the pixel formula for every document."""
    ids = [r.doc_id for r in _docs(spark)]
    n = len(ids)  # G derives from COUNT (sf1 ids are sparse)
    rows = ALL_QUERIES["multimodal_dhash_near_dup"](spark, SF).collect()
    fps = {i: _dhash(i, n) for i in ids}
    # brute-force reference pair set over the analytic fingerprints
    want = set()
    sids = sorted(ids)
    for i, a in enumerate(sids):
        for b in sids[i + 1 :]:
            d = bin(fps[a] ^ fps[b]).count("1")
            if d <= 3:
                want.add((a, b, d))
    got = {(r.id_a, r.id_b, r.hamming) for r in rows}
    assert got == want
    assert len(got) == len(rows), "duplicate pair emission"
    assert got, "no near-dup pairs: planted clusters missing"


def test_dhash_from_raster_unit():
    from gmail_bigquery_etl_spark.operators.multimodal import (
        dhash_from_raster,
    )

    # 3x2 gray ramp on R channel: increasing row 0, flat row 1
    raster = bytes(
        [10, 0, 0, 20, 0, 0, 30, 0, 0,  # y=0: bits (0,0),(1,0) set
         7, 0, 0, 7, 0, 0, 5, 0, 0]     # y=1: no increase
    )
    assert dhash_from_raster(3, 2, raster) == 0b0011
    try:
        dhash_from_raster(8, 9, bytes(8 * 9 * 3))  # 63 bits > 62
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_hamming_pairs_pigeonhole_completeness(spark):
    """Planted fingerprints at hamming exactly 3 and 4 across band
    boundaries: the banded join must emit the 3 and not the 4."""
    from gmail_bigquery_etl_spark.operators.dedup import (
        hamming_pairs_from_fingerprints,
    )

    base = 0x00AA_BBCC_DDEE
    fp3 = base ^ ((1 << 0) | (1 << 15) | (1 << 30))  # 3 bits, 3 bands
    fp4 = base ^ ((1 << 0) | (1 << 15) | (1 << 30) | (1 << 45))
    df = spark.createDataFrame(
        [(1, base), (2, fp3), (3, fp4)], "_id long, _fp long"
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_pairs_from_fingerprints(
            df, bits=56, max_distance=3, bands=4
        ).collect()
    }
    assert (1, 2, 3) in got
    assert not any(a == 1 and b == 3 for a, b, _ in got)
    # fp3 vs fp4 differ by exactly 1 bit -> must be found
    assert (2, 3, 1) in got


# --- text_unigram_tokenizer ----------------------------------------------

def _unigram_recompute(texts):
    wf = Counter()
    for t in texts:
        wf.update(t.strip().lower().split())
    wf = {w: f for w, f in wf.items() if len(w) >= 1}
    # seed: substrings len 2..4, weighted
    cnt = defaultdict(int)
    for w, f in wf.items():
        for ln in (2, 3, 4):
            for s in range(len(w) - ln + 1):
                cnt[w[s : s + ln]] += f
    seed = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:40]
    multi = {p for p, _ in seed}

    def segment(w, vocab):
        out, pos = [], 0
        while pos < len(w):
            for k in (4, 3, 2):
                if w[pos : pos + k] in vocab:
                    out.append(w[pos : pos + k])
                    pos += k
                    break
            else:
                out.append(w[pos])
                pos += 1
        return out

    def usage_of(vocab):
        u = defaultdict(int)
        for w, f in wf.items():
            for p in segment(w, vocab):
                u[p] += f
        return u

    for size in (28, 16):
        u = usage_of(multi)
        keep = sorted(
            ((p, c) for p, c in u.items() if len(p) >= 2),
            key=lambda kv: (-kv[1], kv[0]),
        )[:size]
        multi = {p for p, _ in keep}
    return usage_of(multi)


def test_unigram_tokenizer_recompute(spark):
    """The full seed -> prune -> prune -> final-usage loop recomputed in
    pure Python must match the gated table exactly (pieces AND usage)."""
    texts = [r.text for r in _docs(spark)]
    want = _unigram_recompute(texts)
    rows = ALL_QUERIES["text_unigram_tokenizer"](spark, SF).collect()
    got = {r.piece: r.usage for r in rows}
    assert got == dict(want)
    for r in rows:
        assert r.piece_len == len(r.piece)
    assert any(len(p) >= 2 for p in got), "no multi-char survivors"
    assert any(len(p) == 1 for p in got), "alphabet singles missing"


def test_greedy_segment_maximal_munch(spark):
    """Longest-match order and the clamped-tail equivalence: a k=4 test
    capturing a shorter tail substring advances by 4 but appends the
    true piece -- same output as the shorter test firing."""
    from gmail_bigquery_etl_spark.operators.unigram_lm import greedy_segment

    df = spark.createDataFrame([("ababa",), ("xab",)], "w string")
    out = {
        r.w: r.ps
        for r in df.select(
            "w", greedy_segment(F.col("w"), ["abab", "ab", "ba"]).alias("ps")
        ).collect()
    }
    assert out["ababa"] == ["abab", "a"]
    assert out["xab"] == ["x", "ab"]
