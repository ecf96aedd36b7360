"""Deduplication operator family (SURVEY.md §2.10).

The reference's dedup is exact-by-key (dict on message id, etl_service/
main.py:205; anti-join vs sink ids, main.py:175). A training-data pipeline
needs the near-dup ladder as well:

  exact_dedup        -- hash-groupBy on content hash; one shuffle.
  minhash_signature  -- k salted min-hashes over word shingles. Per-row
                       HOF math, no shuffle; the salt trick
                       (h_i = md5(shingle || '#' || i)) avoids 128-bit
                       mulmod while staying engine-portable.
  lsh_candidate_pairs-- MinHash-LSH banding: equi-join on (band, band_key)
                       buckets. THE scale path: candidate generation is a
                       hash self-join on bucket keys, never O(n^2).
  jaccard_verify     -- exact shingle-set Jaccard on candidates only.
  simhash            -- 32-bit sign-aggregated token-hash fingerprint;
                       per-row HOF, Hamming-ball search joins on rotated
                       prefixes (not implemented; pytest covers pairwise).

Skew note (100 TB): boilerplate shingles ("lorem ipsum", licence headers)
produce mega-buckets. ``lsh_candidate_pairs`` caps bucket width
(max_bucket) and drops wider buckets -- standard practice; dropped buckets
are boilerplate clusters that exact-dedup already collapses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.text import ngram_shingles, portable_hash64


def content_key(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.md5(col)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per distinct content hash (deterministic,
    unlike dropDuplicates' arbitrary-first). One shuffle on the 128-bit
    content key; key space is uniform so no skew."""
    w = W.partitionBy(content_key(text_col)).orderBy(id_col)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def minhash_terms(text_col: str, num_hashes: int, shingle_n: int = 3) -> Column:
    """Array of (h_idx -> min salted-hash over distinct shingles)."""
    grams = F.array_distinct(ngram_shingles(text_col, shingle_n))
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                grams,
                lambda s: portable_hash64(F.concat(s, F.lit("#"), i.cast("string"))),
            )
        ),
    )


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Long-form signatures: (id, h_idx, minhash). Pure projection."""
    sig = df.select(
        F.col(id_col), minhash_terms(text_col, num_hashes, shingle_n).alias("sig")
    )
    return sig.select(
        id_col, F.posexplode("sig").alias("h_idx", "minhash")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash-LSH banding.

    rows-per-band r = num_hashes/bands; two docs collide on a band iff all
    r minhashes in it agree -> P(collide) = jaccard^r per band.
    Returns distinct (id_a, id_b) with id_a < id_b.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("_id"),
        minhash_terms(text_col, num_hashes, shingle_n).alias("sig"),
    )
    banded = sig.select(
        "_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.array_join(F.slice("sig", b * r + 1, r), "_"),
            )
        ).alias("band", "band_key"),
    )
    # Cap pathological buckets (boilerplate shingles) before the self-join.
    counts = banded.groupBy("band", "band_key").agg(F.count("*").alias("_n"))
    banded = banded.join(
        counts.filter(F.col("_n") <= max_bucket).drop("_n"), ["band", "band_key"]
    )
    a = banded.select("band", "band_key", F.col("_id").alias("id_a"))
    b = banded.select("band", "band_key", F.col("_id").alias("id_b"))
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for given candidate (id_a, id_b) pairs."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(ngram_shingles(text_col, shingle_n))).alias("sh"),
    ).distinct()
    sizes = sh.groupBy("_id").agg(F.count("*").alias("n_sh"))
    # Intersection via composite-key equi-join (id_b, shingle): stays a hash
    # join; never materializes the per-pair shingle cross product.
    sh_a = sh.select(F.col("_id").alias("id_a"), "sh")
    sh_b = sh.select(F.col("_id").alias("id_b"), "sh")
    shared = (
        pairs.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        shared.join(
            sizes.select(F.col("_id").alias("id_a"), F.col("n_sh").alias("n_a")), "id_a"
        )
        .join(
            sizes.select(F.col("_id").alias("id_b"), F.col("n_sh").alias("n_b")), "id_b"
        )
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )


def simhash(text_col: Column | str, bits: int = 32) -> Column:
    """Sign-aggregated token-hash fingerprint as a bigint.

    bit_j(sum over tokens of +-1 by token-hash bit j) -- positive sums set
    the bit. Single aggregate() fold per row, no shuffle.
    """
    from ..functions.text import whitespace_tokens

    toks = whitespace_tokens(text_col)
    counts = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("bigint"), bits),
        lambda acc, t: F.zip_with(
            acc,
            F.array(
                *[
                    (
                        F.shiftright(portable_hash64(t), j).bitwiseAND(F.lit(1)) * 2 - 1
                    ).cast("bigint")
                    for j in range(bits)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    powers = F.array(*[F.lit(1 << j).cast("bigint") for j in range(bits)])
    return F.aggregate(
        F.zip_with(
            counts,
            powers,
            lambda c, p: F.when(c > 0, p).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
