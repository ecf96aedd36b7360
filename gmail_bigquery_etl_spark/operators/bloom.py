"""Bloom-filter join pruning for the incremental anti-join (SURVEY.md
§2.3/§7.3: the J1 anti-join's semi-join-reduction rung).

At 100 TB the anti-join's probe side pays the full join cost even though
most incoming rows are genuinely new. A Bloom filter over the sink ids
splits the probe exactly:

  definitely-absent  -- at least one of the row's d bit positions is
                        unset: the id CANNOT be in the sink (Bloom's
                        no-false-negative guarantee), so the row skips
                        the join entirely;
  maybe-present      -- all d bits set: only THESE rows (the true
                        positives plus the ~(1-e^{-dn/m})^d false-positive
                        sliver) enter the exact anti-join.

The union of (definitely-absent) and (maybe-present minus sink) is
EXACTLY the plain anti-join result -- pruning is a pure plan change, and
the oracle checks precisely that. This is the relational form of Spark's
own runtime row-level bloom pruning (spark.sql.optimizer.runtime.
bloomFilter.*), built portably so DuckDB replays it bit-for-bit: bit
positions are the same disjoint 32-bit md5 slices the CMS uses
(operators/cms.py), the filter itself is a <= m-row set-bit table
(broadcast at any corpus size), and membership is an equi-join on the
bit position -- no opaque binary sketch crosses engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .cms import _cms_col, _depth_dim


def bloom_bits(
    ids: DataFrame, key: str = "id", m: int = 8192, depth: int = 4
) -> DataFrame:
    """The filter: distinct set-bit positions (bit,) of the build side --
    one groupBy over depth x |ids| increments, <= m rows out."""
    dim = _depth_dim(ids, depth)
    return (
        ids.select(F.col(key).alias("_x"))
        .crossJoin(dim)
        .select(_cms_col(F.col("_x"), F.col("i"), m).alias("bit"))
        .distinct()
    )


def bloom_prefiltered_anti_join(
    incoming: DataFrame,
    existing: DataFrame,
    key: str = "id",
    m: int = 8192,
    depth: int = 4,
    broadcast_hint: bool = True,
) -> DataFrame:
    """Plain-anti-join semantics with Bloom pruning: adds a
    ``bloom_checked`` flag (did the row need the exact join?) so the
    pruning split itself is part of the gated output."""
    bits = F.broadcast(bloom_bits(existing, key, m, depth))
    dim = _depth_dim(incoming, depth)
    hits = (
        incoming.select(F.col(key).alias("_k"))
        .distinct()
        .crossJoin(dim)
        .select("_k", _cms_col(F.col("_k"), F.col("i"), m).alias("bit"))
        .join(bits, "bit", "left_semi")
        .groupBy("_k")
        .agg(F.count("*").alias("_nbits"))
        .filter(F.col("_nbits") == depth)
        .select(F.col("_k").alias(key))
        # two consumers below (semi + anti): pin the tiny id list so the
        # hash/probe pipeline runs once, not per branch
        .localCheckpoint()
    )
    # maybe-present ids (all d bits set) -- the only rows the exact
    # anti-join must examine; everything else is definitely new
    maybe = incoming.join(F.broadcast(hits) if broadcast_hint else hits, key, "left_semi")
    definite = incoming.join(
        F.broadcast(hits) if broadcast_hint else hits, key, "left_anti"
    ).withColumn("bloom_checked", F.lit(False))
    ids = existing.select(key).distinct()
    if broadcast_hint:
        ids = F.broadcast(ids)
    checked = maybe.join(ids, key, "left_anti").withColumn(
        "bloom_checked", F.lit(True)
    )
    return definite.unionByName(checked)
