"""Iterative BPE merge learning (operators/bpe.py) vs a pure-Python
reference implementing the classic algorithm on the same word-frequency
table: greedy leftmost non-overlapping merges, count-then-lexicographic
argmax per round. The distributed loop must learn the identical merge
sequence with identical pair counts."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.catalog import load_table
from gmail_bigquery_etl_spark.operators.bpe import learn_bpe_merges

SF = "/root/testdata/sf0.001"
K = 6


def _py_bpe(word_freqs: dict[str, int], k: int):
    seqs = {w: list(w) for w in word_freqs}
    out = []
    for idx in range(k):
        counts: Counter = Counter()
        for w, syms in seqs.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((idx, a, b, n))
        for w, syms in seqs.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            seqs[w] = merged
    return out


def test_learned_merges_match_python_reference(spark):
    docs = load_table(spark, SF, "documents").select("text")
    got = [
        (r.merge_idx, r.left, r.right, r.pair_count)
        for r in learn_bpe_merges(docs, num_merges=K).collect()
    ]

    toks = docs.select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w"))
    wf = {
        r.w: r.f
        for r in toks.filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("f"))
        .collect()
    }
    want = _py_bpe(wf, K)
    assert got == want
    assert len(got) == K
    # (merge composition -- a later merge consuming an earlier product --
    # is pinned by the synthetic test below; the corpus's top-6 bigrams
    # happen to be disjoint)


def test_overlapping_merge_is_greedy_leftmost(spark):
    docs = spark.createDataFrame([("aaa aaa",)], "text string")
    got = [
        (r.left, r.right, r.pair_count)
        for r in learn_bpe_merges(docs, num_merges=2).collect()
    ]
    # 'aaa' x2: round 1 pair (a,a) has weighted count 2*2=4 (two adjacent
    # positions per word); greedy leftmost rebuild gives [aa, a], so round
    # 2's top pair is (aa, a) with count 2.
    assert got == [("a", "a", 4), ("aa", "a", 2)]


def test_encoded_vocab_matches_python_reference_and_is_lossless(spark):
    from gmail_bigquery_etl_spark.operators.bpe import encode_tokens, learn_bpe

    docs = spark.createDataFrame(
        [("the theme there",), ("the other theme",)], "text string"
    )
    merges_df, vocab = learn_bpe(docs, num_merges=3)
    rows = vocab.collect()
    # lossless: each word's final symbols concatenate back to the word
    assert all("".join(r.syms) == r.w for r in rows)

    # python reference encode with the same merges
    wf = {r.w: r.f for r in rows}
    want_merges = _py_bpe(wf, 3)
    got_merges = [
        (r.merge_idx, r.left, r.right, r.pair_count)
        for r in merges_df.collect()
    ]
    assert got_merges == want_merges

    seqs = {w: list(w) for w in wf}
    for _, a, b, _n in want_merges:
        for w, syms in seqs.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            seqs[w] = merged
    assert {r.w: r.syms for r in rows} == seqs

    # token stats: corpus-weighted counts over the encoded vocab
    from collections import Counter

    want_counts: Counter = Counter()
    for w, syms in seqs.items():
        for s in syms:
            want_counts[s] += wf[w]
    got_counts = {r.token: r.n for r in encode_tokens(vocab).collect()}
    assert got_counts == dict(want_counts)
