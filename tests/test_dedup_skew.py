"""Mega-bucket skew: the max_bucket cap under a pathological corpus.

At 100 TB boilerplate text (licence headers, templated pages) puts
thousands of documents into ONE LSH bucket per band; expanding pairs
inside such a bucket is quadratic in its width. ``lsh_candidate_pairs``
caps bucket width (``max_bucket``) and drops wider buckets. These tests
synthesize exactly that corpus and pin BOTH sides of the documented
trade (operators/dedup.py module docstring "Skew note"):

  (a) recall loss is EXACTLY the documented bound -- a pair is lost iff
      every band bucket the pair agrees on blows the cap; for identical
      boilerplate (all bands agree, one mega-bucket each) that is all
      C(n_boiler, 2) boilerplate pairs and NOTHING else. Organic
      near-dup pairs in small buckets all survive.
  (b) cost tracks the CAPPED output, not bucket-width squared: the
      capped run's in-bucket pair expansion is flat while the uncapped
      counterfactual's blows up quadratically with the mega-bucket.

The companion runtime measurement at sf0.1 scale lives in
tools/bench_scale.py (--skew) and lands in SCALE_r{N}.json.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.catalog import load_table
from gmail_bigquery_etl_spark.operators.dedup import lsh_candidate_pairs

SF = "/root/testdata/sf0.001"

BOILER_N = 120  # width of the synthetic mega-bucket
BOILER_BASE = 10_000_000  # id space for the boilerplate clones


def _skewed_corpus(spark):
    """Real sf0.001 documents + BOILER_N exact clones of one document.

    Identical text => identical shingle sets => identical minhash
    signatures => the clones share ONE bucket of width BOILER_N in EVERY
    band: the worst-case mega-bucket, in every band at once.
    """
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    boiler_text = docs.filter(F.col("doc_id") == 1).select("text")
    clones = (
        spark.range(BOILER_BASE, BOILER_BASE + BOILER_N)
        .select(F.col("id").alias("doc_id"))
        .crossJoin(F.broadcast(boiler_text))
    )
    return docs.unionAll(clones)


def _pairs(corpus, max_bucket):
    return {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(corpus, max_bucket=max_bucket).collect()
    }


def test_cap_drops_exactly_the_mega_bucket(spark):
    corpus = _skewed_corpus(spark)
    capped = _pairs(corpus, max_bucket=BOILER_N - 1)
    uncapped = _pairs(corpus, max_bucket=1_000_000)

    lost = uncapped - capped
    # (a) the loss is exactly the boilerplate clique -- the BOILER_N
    # clones PLUS their source document (identical text puts it in the
    # same bucket): C(BOILER_N + 1, 2) pairs, every endpoint in the
    # clique. No organic pair is lost -- organic buckets are far below
    # the cap, and a pair survives if ANY of its agreeing bands' buckets
    # survives.
    clique = {1} | set(range(BOILER_BASE, BOILER_BASE + BOILER_N))
    w = len(clique)
    assert capped <= uncapped
    assert len(lost) == w * (w - 1) // 2
    assert all(a in clique and b in clique for a, b in lost)
    assert not any(
        a in clique and b in clique for a, b in capped
    ), "no clique pair may survive: every band maps the clique to one bucket"
    # organic candidates are unaffected by the cap
    organic = {(a, b) for a, b in uncapped if not (a in clique and b in clique)}
    assert organic and organic <= capped


def test_cap_bounds_pair_expansion_not_just_output(spark):
    """The capped plan never EXPANDS the mega-bucket: candidate volume
    (pre-distinct pair count) stays flat as the clique widens, while the
    uncapped counterfactual grows quadratically. Counting generated pairs
    is the determinism-friendly proxy for 'runtime stays flat' -- the
    wall-clock curve at sf0.1 scale is measured in tools/bench_scale.py."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    boiler_text = docs.filter(F.col("doc_id") == 1).select("text")

    def clique_cost(n, max_bucket):
        clones = (
            spark.range(BOILER_BASE, BOILER_BASE + n)
            .select(F.col("id").alias("doc_id"))
            .crossJoin(F.broadcast(boiler_text))
        )
        corpus = docs.unionAll(clones)
        # pre-distinct candidate count == total in-bucket expansion work
        return lsh_candidate_pairs(corpus, max_bucket=max_bucket).count()

    cap = 100
    at_1x = clique_cost(cap + 20, cap)
    at_3x = clique_cost(3 * (cap + 20), cap)
    # capped: widening the clique 3x adds ZERO clique pairs (bucket is
    # dropped in both); organic pairs are identical
    assert at_3x == at_1x
    # uncapped counterfactual on the SAME corpus: quadratic in the
    # clique (clique width = clones + their identical source document)
    uncapped = clique_cost(3 * (cap + 20), 1_000_000)
    w = 3 * (cap + 20) + 1
    assert uncapped == at_1x + w * (w - 1) // 2
