"""ANN quality gates: recall vs the exact brute-force baseline.

Bucketed ANN (hyperplane-LSH, IVF) trades recall for turning the cross
join into an equi-join; their contract is recall@k against brute force,
not exact id match -- so they are pytest-gated here rather than
oracle-gated (the IVF cell ASSIGNMENT is oracle-gated: ann_ivf_cells).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gmail_bigquery_etl_spark.catalog import load_table
from gmail_bigquery_etl_spark.operators.similarity import (
    brute_force_topk,
    ivf_centroid_arrays,
    ivf_topk,
    lsh_bucket_ann,
)

K = 5
N_QUERIES = 30


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _hits(df):
    return {(r.query_id, r.match_id) for r in df.collect()}


def _recall(approx, exact):
    return len(approx & exact) / len(exact)


def test_ivf_recall_beats_floor(spark, emb):
    qs = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = _hits(brute_force_topk(emb, qs, k=K))
    approx = _hits(ivf_topk(emb, qs, k=K, nprobe=3))
    # fixture embeddings are only weakly clustered, so probing 3 of 10
    # cells must still beat the uniform-spread baseline (0.3) with margin;
    # the strong guarantees are the monotonicity test and nprobe=10 == 1.0
    assert _recall(approx, exact) >= 0.38


def test_ivf_nprobe_monotone(spark, emb):
    """More probes -> recall can only grow (candidate set is monotone)."""
    qs = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = _hits(brute_force_topk(emb, qs, k=K))
    r1 = _recall(_hits(ivf_topk(emb, qs, k=K, nprobe=1)), exact)
    r3 = _recall(_hits(ivf_topk(emb, qs, k=K, nprobe=3)), exact)
    r10 = _recall(_hits(ivf_topk(emb, qs, k=K, nprobe=10)), exact)
    assert r1 <= r3 <= r10
    assert r10 == 1.0  # probing every cell IS brute force


def test_ivf_centroids_shape(spark, emb):
    cents = ivf_centroid_arrays(emb)
    assert len(cents) == 10
    assert all(len(v) == 64 for _, v in cents)
    assert [lab for lab, _ in cents] == sorted(lab for lab, _ in cents)


def test_lsh_recall_beats_floor(spark, emb):
    qs = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = _hits(brute_force_topk(emb, qs, k=K))
    single = _hits(lsh_bucket_ann(emb, qs, k=K, n_planes=4, multiprobe=False))
    multi = _hits(lsh_bucket_ann(emb, qs, k=K, n_planes=4, multiprobe=True))
    # 4-bit buckets on the weakly-clustered fixture: multiprobe must beat
    # single-probe and clear a non-trivial floor
    assert _recall(multi, exact) >= _recall(single, exact)
    assert _recall(multi, exact) >= 0.25


def test_lsh_near_dup_full_recall_on_directional_dupes(spark, emb):
    """lsh_near_dup_pairs (the bucketed scale path) must find EVERY pair
    the all-pairs baseline finds on the augmented corpus: positive-scaled
    copies share the exact sign bucket, so recall is 1.0 there, and the
    exact-cosine verify makes precision 1.0 by construction."""
    from gmail_bigquery_etl_spark.operators.similarity import (
        allpairs_cosine,
        lsh_near_dup_pairs,
    )
    from gmail_bigquery_etl_spark.queries.similarity import augmented_embeddings

    corpus = augmented_embeddings(emb)
    exact = {(r.id_a, r.id_b) for r in allpairs_cosine(corpus, 0.999).collect()}
    lsh = {(r.id_a, r.id_b) for r in lsh_near_dup_pairs(corpus, 0.999).collect()}
    assert exact and lsh == exact


def test_sq8_recall_beats_floor(spark, emb):
    """Int8 scalar quantization must barely perturb the cosine ranking:
    recall@5 vs the float32 brute force should be near-perfect (the
    contract that makes the 4x memory cut a free lunch)."""
    from gmail_bigquery_etl_spark.operators.similarity import sq8_topk

    qs = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = _hits(brute_force_topk(emb, qs, k=K))
    approx = _hits(sq8_topk(emb, qs, k=K))
    assert _recall(approx, exact) >= 0.9


def test_sq8_scores_close_to_float_cosine(spark, emb):
    """Quantized cosine tracks true cosine within SQ8's error envelope
    (~1/127 per element, strongly cancelling over 64 dims)."""
    from gmail_bigquery_etl_spark.operators.similarity import sq8_topk

    qs = emb.filter(F.col("vec_id") < 5)
    sq8 = {
        (r.query_id, r.match_id): r.score for r in sq8_topk(emb, qs, k=K).collect()
    }
    exact = {
        (r.query_id, r.match_id): r.score
        for r in brute_force_topk(emb, qs, k=K).collect()
    }
    common = set(sq8) & set(exact)
    assert common, "no overlapping top-k pairs to compare"
    for pair in common:
        assert abs(sq8[pair] - exact[pair]) < 0.02


def test_ivf_sq8_recall_matches_ivf_float(spark, emb):
    """Composing SQ8 scoring into the IVF probe must not cost recall
    beyond the quantization's own (near-zero) error: recall@5 within a
    whisker of the float IVF at the same nprobe."""
    from gmail_bigquery_etl_spark.operators.similarity import ivf_sq8_topk

    qs = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = _hits(brute_force_topk(emb, qs, k=K))
    ivf_float = _hits(ivf_topk(emb, qs, k=K, nprobe=2))
    ivf_sq8 = _hits(ivf_sq8_topk(emb, qs, k=K, nprobe=2))
    r_float, r_sq8 = _recall(ivf_float, exact), _recall(ivf_sq8, exact)
    assert r_sq8 >= r_float - 0.05, (r_sq8, r_float)


def test_pq_shortlist_recall_beats_uniform(spark, emb):
    """PQ/ADC contract: the shortlist is a CANDIDATE GENERATOR (re-rank
    follows in a real pipeline), so the gate is containment of the exact
    L2 top-5 in the ADC shortlist, with a uniform-random floor: a 50-of-n
    random shortlist would contain ~50/n of the true neighbors (0.1 at
    sf0.001's 500 vectors); label-mean codebooks must beat that 3x+."""
    from pyspark.sql import Window as W
    from gmail_bigquery_etl_spark.operators.similarity import pq_topk

    qs = emb.filter(F.col("vec_id") < N_QUERIES)
    q = qs.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    c = emb.select(F.col("vec_id").alias("match_id"), F.col("embedding").alias("cv"))
    d2 = F.aggregate(
        F.zip_with(
            "qv",
            "cv",
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = W.partitionBy("query_id").orderBy(F.asc("d"), F.asc("match_id"))
    exact = _hits(
        c.crossJoin(F.broadcast(q))
        .filter(F.col("match_id") != F.col("query_id"))
        .select("query_id", "match_id", d2.alias("d"))
        .withColumn("rn", F.row_number().over(w))
        .filter("rn <= 5")
    )
    short20 = _hits(pq_topk(emb, qs, k=20, m=8))
    short50 = _hits(pq_topk(emb, qs, k=50, m=8))
    assert _recall(short50, exact) >= 0.4  # uniform floor is 0.1
    # Monotone: a longer shortlist can only contain more true neighbors.
    assert short20 <= short50
    # Finer subspaces quantize with less error (pinned on this fixture).
    coarse50 = _hits(pq_topk(emb, qs, k=50, m=4))
    assert _recall(short50, exact) >= _recall(coarse50, exact)


def test_pq_rerank_lifts_recall_over_raw_adc(spark, emb, sf_dir):
    """The two-stage contract: exact-cosine rerank of the ADC shortlist
    must recover at least as many true cosine neighbors as trusting raw
    ADC order -- and in absolute terms must recover exactly the true
    top-5 that made it into the shortlist."""
    from gmail_bigquery_etl_spark.queries.similarity import (
        ann_pq_rerank,
        ann_pq_topk,
    )

    qs = emb.filter(F.col("vec_id") < 10)
    exact = _hits(brute_force_topk(emb, qs, k=K))
    adc5 = _hits(ann_pq_topk(spark, sf_dir))
    rer5 = _hits(ann_pq_rerank(spark, sf_dir))
    assert _recall(rer5, exact) >= _recall(adc5, exact)
    from gmail_bigquery_etl_spark.operators.similarity import pq_topk

    short = _hits(pq_topk(emb, qs, k=50, m=8))
    # rerank returns the best cosine candidates WITHIN the shortlist, so
    # every true neighbor that survived the shortlist must be recovered.
    assert (exact & short) <= rer5
