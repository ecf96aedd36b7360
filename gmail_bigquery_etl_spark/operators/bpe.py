"""Iterative BPE merge learning (SURVEY.md §2.10 text analysis).

`queries/curation.text_bpe_merge_candidates` scores the FIRST merge
iteration declaratively; this operator runs the actual training loop:
k rounds of (weighted pair count -> argmax -> apply merge to every
symbol sequence). Like connected components (operators/components.py),
the iteration is a driver loop over fully distributed rounds -- the only
driver-side data is the ONE winning pair per round, and symbol sequences
are rebuilt by a codegen'd-free but Arrow-free HOF fold (aggregate with
an (out, pending) accumulator implementing the greedy leftmost
non-overlapping merge, exactly classic BPE).

Scale: each round is one explode+groupBy over the DISTINCT-WORD table
(vocabulary-sized, not corpus-sized -- BPE training's standard trick),
plus a map-only merge application; localCheckpoint truncates the plan
per round so round k doesn't re-run rounds 1..k-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.text import whitespace_tokens


def word_symbol_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, f, syms): distinct words with corpus frequency and initial
    single-character symbol sequences."""
    return (
        docs.select(F.explode(whitespace_tokens(text_col)).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("f"))
        .withColumn("syms", F.split(F.col("w"), ""))
    )


def _apply_merge(syms: F.Column, left: str, right: str) -> F.Column:
    """Greedy leftmost non-overlapping replacement of adjacent
    (left, right) with left||right, as a single fold."""
    merged = left + right
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, s):
        hit = acc["pend"].eqNullSafe(F.lit(left)) & (s == F.lit(right))
        return F.when(
            acc["pend"].isNull(),
            F.struct(acc["out"].alias("out"), s.alias("pend")),
        ).otherwise(
            F.when(
                hit,
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            ).otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                    s.alias("pend"),
                )
            )
        )

    def finish(acc):
        return F.when(
            acc["pend"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pend"])))

    return F.aggregate(syms, acc0, step, finish)


def learn_bpe_merges(
    docs: DataFrame, text_col: str = "text", num_merges: int = 6
) -> DataFrame:
    """Learn ``num_merges`` BPE merges; returns (merge_idx, left, right,
    pair_count) in learning order. Ties break lexicographically on
    (left, right) so the learned sequence is deterministic."""
    merges_df, _ = learn_bpe(docs, text_col, num_merges)
    return merges_df


def learn_bpe(
    docs: DataFrame, text_col: str = "text", num_merges: int = 6
) -> tuple[DataFrame, DataFrame]:
    """The training loop, returning BOTH artifacts it produces: the
    merge table (merge_idx, left, right, pair_count) AND the final
    ENCODED vocabulary (w, f, syms) -- the word table after every
    learned merge has been applied. Training necessarily computes the
    encoded vocab as it goes (each round rewrites it), so exposing it
    costs nothing; re-deriving it would re-run the whole loop."""
    spark = docs.sparkSession
    wf = word_symbol_table(docs, text_col).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for k in range(num_merges):
        pairs = (
            # adjacent pairs via zip_with over two slices: for a
            # fully-merged 1-symbol word both slices are empty, so no
            # index expression can ever go out of bounds -- unlike the
            # previous element_at(i+1)-over-sequence form, which relied
            # on a size>=2 filter that Catalyst's projection/predicate
            # reordering is free to evaluate AFTER the indexing (observed
            # as an ANSI INVALID_ARRAY_INDEX on a 1-symbol corpus)
            wf.withColumn(
                "_ps",
                F.zip_with(
                    F.slice("syms", 1, F.size("syms") - 1),
                    F.slice("syms", 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                ),
            )
            .select(F.explode("_ps").alias("p"), "f")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("f").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), F.asc("a"), F.asc("b")).first()
        if top is None:
            break
        merges.append((k, top.a, top.b, int(top.n)))
        # one map-only rebuild + lineage truncation; words too short to
        # contain the pair pass through the fold unchanged
        old = wf
        wf = wf.withColumn(
            "syms", _apply_merge(F.col("syms"), top.a, top.b)
        ).localCheckpoint()
        old.unpersist()
    merges_df = spark.createDataFrame(
        merges, "merge_idx int, left string, right string, pair_count bigint"
    )
    return merges_df, wf


def encode_tokens(encoded_vocab: DataFrame) -> DataFrame:
    """Corpus token statistics from the encoded vocabulary: explode each
    word's final symbol sequence weighted by word frequency. Runs over
    the VOCABULARY (distinct words), never the corpus -- the same
    size-class trick the training loop uses. Output: (token, n) with n
    the corpus-weighted occurrence count."""
    return (
        encoded_vocab.select(F.explode("syms").alias("token"), "f")
        .groupBy("token")
        .agg(F.sum("f").cast("bigint").alias("n"))
    )
