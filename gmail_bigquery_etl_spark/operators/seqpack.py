"""Sequence packing: assemble tokenized documents into fixed
context-length training rows -- the pipeline stage between curation and
the trainer.

Two standard semantics, each with its honest scale shape:

* CONCAT-AND-CHUNK (``pack_concat_chunks``): concatenate documents in a
  deterministic order and cut every C tokens; documents may straddle row
  boundaries (the attention mask handles it downstream). Zero padding
  except the tail row of each packing group. This is the GPT-style
  pretraining default and is PURE prefix-sum relational algebra: one
  window cumsum per group, one bounded explode (a document touches
  ceil(len/C)+1 chunks), one aggregate. No UDF anywhere.

* FIRST-FIT-DECREASING BINS (``pack_ffd_bins``): documents are atomic
  (SFT/eval rows must not split); sort by length descending and place
  each document in the first open bin with room, else open a new bin.
  FFD's bin state (remaining capacity per open bin) is inherently
  sequential, so this is the repo's sanctioned custom-operator shape:
  ``applyInPandas`` per packing group -- Arrow-batched, one Python call
  per GROUP (never per row), a numpy loop over the group's documents
  inside. Oversized documents (len > C) get a bin of their own, the
  standard semantics.

Packing groups are a DETERMINISTIC function of the order key (id mod G),
not Spark partition ids: partition lineage is not stable across retries
or cluster sizes, and the whole point of the gate is that a second
engine can replay the exact assignment. At 100 TB, G scales with the
cluster (any G keeps groups independent and embarrassingly parallel);
each group's window/FFD touches only its own slice, so there is no
global sort and no serial stage -- the distributed-prefix-sum argument
of operators/packing.py applies per group.

Reference has no training-data surface at all (its pipeline ends at
BigQuery load, etl_service/main.py:239-268); this family is part of the
LLM-pipeline extension mandated by the survey.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

FFD_SCHEMA = "g bigint, doc_id bigint, n_tok bigint, bin bigint"


def pack_concat_chunks(
    docs: DataFrame,
    len_col: str,
    order_col: str,
    group_col: str,
    context_len: int,
) -> DataFrame:
    """Per-chunk table for concat-and-chunk packing.

    Returns (g, chunk, n_docs, n_starts, n_whole, fill): for every
    packing group and every C-token output row, how many documents
    contribute tokens to it, how many START in it, how many lie WHOLLY
    inside it (start AND end there -- so a group's distinct straddler
    count is sum(n_starts) - sum(n_whole), exact even for documents
    spanning more than two chunks, where crossings sum(n_docs) -
    sum(n_starts) over-counts), and its token fill (== C everywhere
    except each group's tail chunk). Exact integer arithmetic
    throughout: a document occupying global offsets [s, s+len) within
    its group touches chunks floor(s/C) .. floor((s+len-1)/C) and
    contributes min(s+len, (k+1)C) - max(s, kC) tokens to chunk k."""
    c = F.lit(context_len)
    w = (
        W.partitionBy("g")
        .orderBy("_ord")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    pos = docs.select(
        F.col(group_col).alias("g"),
        F.col(order_col).alias("_ord"),
        F.col(len_col).cast("bigint").alias("_len"),
    ).withColumn(
        "_s", F.coalesce(F.sum("_len").over(w), F.lit(0)).cast("bigint")
    ).where(F.col("_len") > 0)
    spans = pos.select(
        "g",
        "_s",
        "_len",
        F.expr(f"_s div {context_len}").alias("_k0"),
        F.expr(f"(_s + _len - 1) div {context_len}").alias("_k1"),
    ).select(
        "g",
        "_s",
        "_len",
        "_k0",
        "_k1",
        F.explode(F.sequence("_k0", "_k1")).alias("chunk"),
    )
    contrib = spans.select(
        "g",
        "chunk",
        (
            F.least(F.col("_s") + F.col("_len"), (F.col("chunk") + 1) * c)
            - F.greatest(F.col("_s"), F.col("chunk") * c)
        )
        .cast("bigint")
        .alias("_tok"),
        (F.col("_k0") == F.col("chunk")).cast("bigint").alias("_starts"),
        ((F.col("_k0") == F.col("chunk")) & (F.col("_k1") == F.col("chunk")))
        .cast("bigint")
        .alias("_whole"),
    )
    return contrib.groupBy("g", "chunk").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("_starts").cast("bigint").alias("n_starts"),
        F.sum("_whole").cast("bigint").alias("n_whole"),
        F.sum("_tok").cast("bigint").alias("fill"),
    )


def ffd_fit(lengths: list[int], capacity: int) -> list[int]:
    """Reference first-fit-decreasing over ALREADY-SORTED lengths:
    returns the 0-based bin index per input position. Pure-Python,
    shared by the Arrow batch path and the pytest recompute so the two
    can only diverge through Spark plumbing, not algorithm drift."""
    fills: list[int] = []
    out: list[int] = []
    for ln in lengths:
        for i, f in enumerate(fills):
            if f + ln <= capacity:
                fills[i] = f + ln
                out.append(i)
                break
        else:
            fills.append(ln)
            out.append(len(fills) - 1)
    return out


def pack_ffd_bins(
    docs: DataFrame,
    len_col: str,
    order_col: str,
    group_col: str,
    context_len: int,
) -> DataFrame:
    """Per-document FFD bin assignment (g, doc_id, n_tok, bin).

    One applyInPandas call per packing group; inside, documents sort by
    (length DESC, id ASC) -- the deterministic FFD order -- and the
    shared ``ffd_fit`` loop assigns 0-based bins in creation order.
    State is O(bins-in-group); the group's documents arrive as one
    Arrow batch."""

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tok", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        pdf["bin"] = ffd_fit(pdf["n_tok"].tolist(), context_len)
        return pdf[["g", "doc_id", "n_tok", "bin"]]

    shaped = docs.select(
        F.col(group_col).cast("bigint").alias("g"),
        F.col(order_col).cast("bigint").alias("doc_id"),
        F.col(len_col).cast("bigint").alias("n_tok"),
    )
    return shaped.groupBy("g").applyInPandas(_pack, FFD_SCHEMA)
