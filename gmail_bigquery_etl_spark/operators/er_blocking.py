"""Deletion-neighborhood blocking for entity resolution (SymSpell-style).

The r7 ER family generated candidates from fixed 2-character prefix /
suffix blocks. That key space is BOUNDED BY THE DATA's name vocabulary
(the fixture's names draw first/last tokens from a small palette, and a
real corpus has natural prefix skew), so 10x records meant ~10x masters
AND ~10x dirty rows per block -> ~100x comparisons: measured 8.01x wall
at 10x data (SCALE_r07). Lengthening the key only helps until it crosses
the vocabulary boundary.

This module replaces it with the deletion-1 neighborhood index SymSpell
popularized (Garbe 2012; the same candidate structure as the
Norvig-corrector, inverted): each MASTER name emits itself plus every
string obtained by deleting one character; a dirty record is a candidate
for exactly the masters whose neighborhood contains its (exact) dirty
string. One equi-join on the variant string replaces both blocking
joins.

Why it scales where prefix blocks don't:

* index size is O(masters x avg_len) rows -- linear, map-side generated;
* candidate volume is O(dirty x collisions-per-variant): a variant is a
  near-full name, so its block holds the handful of masters within one
  deletion of each other, NOT everything sharing two characters;
* the block-size distribution is data-skew-proof by contract: variants
  whose master count exceeds ``max_block`` are EXCLUDED from candidate
  generation (the dedup family's measured mega-bucket idiom,
  operators/dedup.py:248), and the exclusion is auditable via
  :func:`deletion1_overcap_variants` -- exactness pinned by pytest.

Recall contract (stronger than the prefix/suffix lemma it replaces): a
dirty string produced by deleting EXACTLY ONE character from a master is
*by construction* a member of that master's neighborhood, for any name
length -- the true candidate is always generated (unless its variant
block is over the cap, which the audit surfaces). Multi-edit typos would
extend the index to deletion distance 2 (same shape, len^2/2 variants);
the join stays a single equi-join.

Reference parity: the reference trusts sender strings verbatim
(etl_service/main.py:154-168); this is the dedup-against-master pass a
warehouse adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def deletion1_variants(name: Column | str) -> Column:
    """All strings at deletion distance <=1 from ``name`` (the name
    itself plus each single-character deletion), distinct, as an array
    column. Empty/NULL-safe: '' emits [''], NULL emits NULL."""
    c = F.col(name) if isinstance(name, str) else name
    dels = F.when(
        F.length(c) > 0,
        F.transform(
            F.sequence(F.lit(0), F.length(c) - F.lit(1)),
            lambda i: F.concat(
                F.substring(c, F.lit(1), i),
                F.substring(c, i + F.lit(2), F.length(c)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(F.concat(dels, F.array(c)))


def deletion1_index(
    master: DataFrame,
    name_col: str,
    max_block: int = 64,
    out_col: str = "_variant",
) -> DataFrame:
    """The capped deletion-1 neighborhood index: one row per (master row,
    variant), with variants whose block (distinct master rows sharing
    the variant) exceeds ``max_block`` excluded. All other master columns
    ride along."""
    exploded = master.withColumn(out_col, F.explode(deletion1_variants(name_col)))
    return (
        exploded.withColumn("_blk", F.count("*").over(W.partitionBy(out_col)))
        .filter(F.col("_blk") <= max_block)
        .drop("_blk")
    )


def deletion1_overcap_variants(
    master: DataFrame,
    name_col: str,
    max_block: int = 64,
    out_col: str = "_variant",
) -> DataFrame:
    """The audit complement of :func:`deletion1_index`: the variants the
    cap excluded, with their block sizes -- so an operator that drops
    them reports WHAT it dropped (the LSH mega-bucket exclusion
    contract). index + overcap partitions the uncapped neighborhood
    exactly (pytest-pinned)."""
    exploded = master.withColumn(out_col, F.explode(deletion1_variants(name_col)))
    return (
        exploded.groupBy(out_col)
        .agg(F.count("*").alias("block_size"))
        .filter(F.col("block_size") > max_block)
    )


def deletion1_candidates(
    dirty: DataFrame,
    master: DataFrame,
    dirty_name_col: str,
    master_name_col: str,
    dirty_id_col: str,
    master_id_col: str,
    max_block: int = 64,
) -> DataFrame:
    """Candidate (dirty, master) pairs at deletion distance <=1: one
    equi-join of the dirty frame against the capped neighborhood index on
    the exact variant string, deduped per (dirty, master) pair (a pair
    can arise through several variants). Carries every column of both
    inputs."""
    idx = deletion1_index(master, master_name_col, max_block=max_block)
    return dirty.join(
        idx, dirty[dirty_name_col] == idx["_variant"]
    ).dropDuplicates([dirty_id_col, master_id_col]).drop("_variant")
