"""SimHash Hamming-ball banded search (operators/dedup.py simhash_pairs).

The pigeonhole design claim -- bands = d+1 bit-slices give EXACT recall for
Hamming distance <= d -- is checked against a brute-force all-pairs join on
the same fingerprints; the plan-shape tests pin the equi-join (bucketed)
candidate generation that makes it 100 TB-viable.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.catalog import load_table
from gmail_bigquery_etl_spark.operators.dedup import simhash, simhash_pairs

SF = "/root/testdata/sf0.001"


def _corpus(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    dup = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    near = docs.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat("text", F.lit(" tail")).alias("text"),
    )
    return docs.unionAll(dup).unionAll(near)


def test_simhash_pairs_match_bruteforce(spark):
    """Banded search returns exactly the brute-force Hamming ball (no false
    negatives by pigeonhole, no false positives after verification)."""
    corpus = _corpus(spark)
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_pairs(corpus, max_distance=3).collect()
    }
    fp = corpus.select("doc_id", simhash("text").alias("fp"))
    a = fp.select(F.col("doc_id").alias("id_a"), F.col("fp").alias("fa"))
    b = fp.select(F.col("doc_id").alias("id_b"), F.col("fp").alias("fb"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )
    want = {(r.id_a, r.id_b, r.hamming) for r in brute.collect()}
    assert got == want
    assert got, "fixture corpus must produce non-vacuous pairs"
    # exact copies are distance 0
    assert any(h == 0 for _, _, h in got)


def test_simhash_pairs_distance_zero_is_exact_dups(spark):
    corpus = _corpus(spark)
    got = simhash_pairs(corpus, max_distance=0, bands=1).collect()
    texts = {r.doc_id: r.text for r in corpus.collect()}
    # d=0 pairs have identical fingerprints; every exact text copy is found
    assert all(r.hamming == 0 for r in got)
    found = {(r.id_a, r.id_b) for r in got}
    for did, text in texts.items():
        if did >= 100000 and did < 200000:
            assert (did - 100000, did) in found


def test_simhash_pairs_parameter_validation(spark):
    corpus = _corpus(spark)
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs(corpus, max_distance=4, bands=4)
    with pytest.raises(ValueError, match="divide evenly"):
        simhash_pairs(corpus, max_distance=4, bands=5)
    with pytest.raises(ValueError, match="exceed bits"):
        simhash_pairs(corpus, max_distance=40)


def test_simhash_pairs_plan_is_equi_join(spark):
    """Candidate generation must stay bucket-shaped: no CartesianProduct,
    and the only nested-loop join is the broadcast of the O(bands) dim."""
    plan = (
        simhash_pairs(_corpus(spark), max_distance=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_wider_fingerprint_is_more_selective(spark):
    """The sizing guidance in the docstring, as a property: more fingerprint
    bits => strictly-not-more chance collisions within the same distance
    budget (and the same exact copies still at distance 0)."""
    corpus = _corpus(spark)
    n32 = simhash_pairs(corpus, max_distance=3, bits=32).count()
    n48 = simhash_pairs(corpus, max_distance=3, bits=48, bands=4).count()
    assert 0 < n48 <= n32


def test_simhash_pairs_bucket_cap_drops_mega_buckets(spark):
    """max_bucket caps the quadratic in-bucket expansion: a corpus of n
    identical docs yields 0 pairs when every bucket exceeds the cap."""
    docs = load_table(spark, SF, "documents").limit(20)
    same = docs.select("doc_id", F.lit("same text every row here").alias("text"))
    assert simhash_pairs(same, max_distance=3, max_bucket=10).count() == 0
    assert simhash_pairs(same, max_distance=3, max_bucket=1000).count() == 190


def test_inverted_jaccard_matches_python_bruteforce(spark):
    """With the df cap disabled, inverted_jaccard_pairs is EXACT: every
    pair at or above the threshold, with the true trigram-set Jaccard."""
    import hashlib
    from gmail_bigquery_etl_spark.operators.dedup import inverted_jaccard_pairs

    corpus = _corpus(spark)
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in inverted_jaccard_pairs(
            corpus, threshold=0.6, max_df=1_000_000
        ).collect()
    }

    P = 1_000_000_007

    def shingle_hashes(text):
        toks = text.lower().split()
        grams = (
            [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
            if len(toks) >= 3
            else [" ".join(toks)]
        )
        return {
            int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % P for g in grams
        }

    rows = corpus.select("doc_id", "text").collect()
    sets = {r.doc_id: shingle_hashes(r.text) for r in rows}
    ids = sorted(sets)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter:
                j = inter / len(sets[a] | sets[b])
                if j >= 0.6:
                    want[(a, b)] = round(j, 6)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6


def test_inverted_jaccard_df_cap_drops_boilerplate(spark):
    """A shingle shared by every document (licence-header shape) must be
    excluded by the df cap: two otherwise-disjoint docs that share ONLY
    boilerplate never pair, and the posting-list join never sees the
    mega-bucket."""
    from gmail_bigquery_etl_spark.operators.dedup import inverted_jaccard_pairs

    boiler = "generated by the acme pipeline all rights reserved"
    rows = [(i, f"{boiler} unique token{i} payload{i} row{i}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    # Every boilerplate trigram hits all 40 docs -> df 40 > cap 8; the
    # unique tails share nothing, so no pair survives.
    assert inverted_jaccard_pairs(docs, threshold=0.1, max_df=8).count() == 0
    # Uncapped, the boilerplate dominates every pair's intersection.
    uncapped = inverted_jaccard_pairs(docs, threshold=0.1, max_df=10_000)
    assert uncapped.count() == 40 * 39 // 2


def test_inverted_jaccard_plan_is_equi_join(spark):
    """Candidate generation must stay a hash/sort-merge EQUI-join on the
    shingle hash -- never a cartesian product over documents."""
    from gmail_bigquery_etl_spark.operators.dedup import inverted_jaccard_pairs

    plan = inverted_jaccard_pairs(_corpus(spark))._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_containment_finds_quotes_jaccard_misses(spark):
    """The asymmetric-score design claim: a short document quoted verbatim
    inside a much longer one has containment ~1.0 but Jaccard well under
    any useful threshold -- so the containment operator pairs them and the
    Jaccard operator (same threshold-strength) does not."""
    from gmail_bigquery_etl_spark.operators.dedup import (
        inverted_containment_pairs,
        inverted_jaccard_pairs,
    )

    quote = " ".join(f"quoted sentence token{i}" for i in range(6))
    long_doc = (
        " ".join(f"host prose word{i}" for i in range(60))
        + " "
        + quote
        + " "
        + " ".join(f"trailing prose word{i}" for i in range(60))
    )
    docs = spark.createDataFrame(
        [(1, quote), (2, long_doc)], "doc_id bigint, text string"
    )
    cont = inverted_containment_pairs(docs, threshold=0.9, max_df=1000).collect()
    assert len(cont) == 1
    r = cont[0]
    assert (r.id_a, r.id_b) == (1, 2)
    # Every trigram of the quote (except the two splice-boundary grams on
    # each side, which mix host and quote tokens) appears in the long doc.
    assert r.cont_a_in_b >= 0.9
    assert r.cont_b_in_a < 0.2
    assert (
        inverted_jaccard_pairs(docs, threshold=0.5, max_df=1000).count() == 0
    )


def test_containment_plan_is_equi_join(spark):
    from gmail_bigquery_etl_spark.operators.dedup import (
        inverted_containment_pairs,
    )

    plan = (
        inverted_containment_pairs(_corpus(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_incremental_near_dup_outcomes(spark):
    """Planted batch against the sf0.001 sink: exact copies classify as
    exact_dup, tail-mutated near copies as near_dup, fresh md5-token docs
    as ingest -- and outcome precedence is exact > near > ingest."""
    from gmail_bigquery_etl_spark.catalog import load_table
    from gmail_bigquery_etl_spark.operators.incremental import (
        incremental_near_dup,
    )

    existing = load_table(spark, SF, "documents").select("doc_id", "text")
    exact = existing.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    near = existing.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat("text", F.lit(" near dup")).alias("text"),
    )
    fresh = existing.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("fresh"),
            F.md5(F.col("doc_id").cast("string")),
            F.md5((F.col("doc_id") + 1).cast("string")),
        ).alias("text"),
    )
    out = {
        r.doc_id: r.outcome
        for r in incremental_near_dup(
            exact.unionAll(near).unionAll(fresh), existing, threshold=0.5
        ).collect()
    }
    for doc_id, outcome in out.items():
        if doc_id >= 300000:
            assert outcome == "ingest", (doc_id, outcome)
        elif doc_id >= 200000:
            assert outcome == "near_dup", (doc_id, outcome)
        else:
            assert outcome == "exact_dup", (doc_id, outcome)
    assert {"exact_dup", "near_dup", "ingest"} == set(out.values())


def test_prefix_filter_jaccard_equals_bruteforce(spark):
    """PPJoin completeness on an adversarial mini-corpus: near-identical
    pairs, disjoint docs, a shared-boilerplate cluster (frequent tokens
    that must land in suffixes), and size-skewed pairs the size filter
    prunes. Result must equal brute-force exact Jaccard >= 1/2."""
    from gmail_bigquery_etl_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    texts = {
        1: "the quick brown fox jumps over the lazy dog today",
        2: "the quick brown fox jumps over the lazy cat today",
        3: "completely different words appear in this document here now",
        4: "the quick brown fox jumps over the lazy dog today",  # exact dup of 1
        5: "boiler plate header text boiler plate header text boiler plate",
        6: "boiler plate header text boiler plate header text boiler plate",
        7: "short doc only",
        8: "the quick brown fox jumps over the lazy dog today plus lots "
        "of extra trailing content making this much longer than before",
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id bigint, text string"
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_filter_jaccard_pairs(df).collect()
    }

    # brute force over the SAME shingle hashes the operator uses
    from gmail_bigquery_etl_spark.operators.dedup import shingle_hash_stage

    sh = {
        r["doc_id"]: set(r["_hs"])
        for r in shingle_hash_stage(df).collect()
    }
    want = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and 2 * inter >= union:
                want[(a, b)] = round(inter / union, 6)
    assert got == want
    assert (1, 4) in got and got[(1, 4)] == 1.0
    assert (5, 6) in got


def test_prefix_filter_indexes_fewer_postings(spark, sf_dir):
    """The point of the prefix index: it must be materially smaller than
    the full posting list at fixture scale."""
    from gmail_bigquery_etl_spark.operators.dedup import shingle_hash_stage
    from gmail_bigquery_etl_spark.queries.text import _augmented_corpus
    from gmail_bigquery_etl_spark.catalog import load_table

    corpus = _augmented_corpus(load_table(spark, sf_dir, "documents"))
    toks = (
        shingle_hash_stage(corpus)
        .select("doc_id", F.explode(F.array_distinct("_hs")).alias("g"))
    )
    full = toks.count()
    # prefix length for t=1/2 is sz - ceil(sz/2) + 1 ~= sz/2 + 1
    from pyspark.sql import Window as W

    pos = (
        toks.withColumn("_df", F.count("*").over(W.partitionBy("g")))
        .withColumn("sz", F.count("*").over(W.partitionBy("doc_id")))
        .withColumn(
            "_pos",
            F.row_number().over(W.partitionBy("doc_id").orderBy("_df", "g")),
        )
    )
    prefix = pos.filter(
        F.col("_pos") <= F.col("sz") - F.expr("(sz + 1) div 2") + 1
    ).count()
    assert prefix < 0.65 * full


def test_prefix_filter_jaccard_randomized_corpus(spark):
    """Seeded random corpus (vocab small enough to force collisions,
    sizes 1..12 tokens incl. sub-shingle docs): prefix-filtered result
    must equal brute-force exact Jaccard >= 1/2 over the same hashes."""
    import random

    from gmail_bigquery_etl_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
        shingle_hash_stage,
    )

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(5)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
        for i in range(30)
    ]
    # planted near-dups: clone + one appended token (J usually >= 1/2)
    rows += [(100 + i, t + " w0") for i, t in rows[:10]]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_filter_jaccard_pairs(df).collect()
    }
    sh = {r["doc_id"]: set(r["_hs"]) for r in shingle_hash_stage(df).collect()}
    want = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and 2 * inter >= union:
                want[(a, b)] = round(inter / union, 6)
    assert got == want and want  # non-vacuous: the seed produces pairs


def test_leakage_safe_split_never_splits_a_cluster(spark, sf_dir):
    """The invariant the query exists for: every near-dup cluster lands
    wholly inside one split, and all three splits are non-empty."""
    from gmail_bigquery_etl_spark.queries.text import (
        curation_leakage_safe_split,
    )
    from pyspark.sql import functions as F

    out = curation_leakage_safe_split(spark, sf_dir)
    spans = (
        out.groupBy("rep")
        .agg(F.count_distinct("split").alias("ns"))
        .where(F.col("ns") > 1)
        .count()
    )
    assert spans == 0
    sizes = {r.split: r.n for r in
             out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == {"train", "val", "test"}
    total = sum(sizes.values())
    assert sizes["train"] / total > 0.6
