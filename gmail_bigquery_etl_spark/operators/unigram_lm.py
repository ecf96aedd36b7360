"""Unigram-LM (SentencePiece-style) tokenizer learning by iterative
prune (SURVEY.md §2.10 text analysis).

SentencePiece's unigram trainer seeds a large candidate-piece vocabulary,
alternates segmentation (E) with piece-probability re-estimation (M), and
prunes the least-useful pieces until the target size. This operator keeps
that structure with every float removed so two engines can replay it
bit-for-bit (the BPE precedent, operators/bpe.py):

* SEED: every substring of length 2..``max_piece`` of every distinct
  word, weighted by corpus word frequency; top ``seed_size`` by
  (count DESC, piece ASC). The single-character alphabet is always in
  the vocabulary and is never pruned, so segmentation always progresses.
* E-step: deterministic GREEDY LONGEST-MATCH segmentation (maximal
  munch -- SentencePiece's own non-Viterbi inference mode and the
  WordPiece convention): at each position take the longest vocabulary
  piece, ties impossible by construction. Pure integer/string
  arithmetic, expressed as one F.aggregate fold per word -- no UDF.
* M-step + PRUNE: piece usage = frequency-weighted occurrence count in
  the canonical segmentation; keep the ``sizes[r]`` most-used
  multi-character pieces (usage DESC, piece ASC), drop the rest.

Scale: like BPE, every round works on the DISTINCT-WORD table
(vocabulary-sized, never corpus-sized) and the only driver-side state is
the pruned piece list -- O(seed_size) strings per round, the quantizer-
table convention. The word table is localCheckpointed once; each round's
segmentation is a fresh codegen'd projection using the round's piece
list as an array literal, so lineage never grows.

Reference outsources all analytics to BigQuery (SURVEY 2.4); the
tokenizer family is part of the LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import whitespace_tokens


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, f): distinct lowercase whitespace words with corpus counts."""
    return (
        docs.select(F.explode(whitespace_tokens(text_col)).alias("w"))
        .filter(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count("*").alias("f"))
    )


def seed_pieces(words: DataFrame, max_piece: int = 4, seed_size: int = 40) -> DataFrame:
    """Top multi-character candidate pieces: every substring of length
    2..max_piece at every start position, counted with word-frequency
    weights; (count DESC, piece ASC) TakeOrdered -- no global sort."""
    # the inner bound clamps to 1 (never 0: Spark's sequence(1, 0) is a
    # DECREASING sequence, not empty) and the exact-length filter drops
    # the clamp's spurious short capture at words shorter than ln
    spans = words.select(
        "f",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(2), F.lit(max_piece)),
                    lambda ln: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.greatest(F.length("w") - ln + 1, F.lit(1)),
                        ),
                        lambda s: F.struct(
                            ln.alias("ln"),
                            F.substring(F.col("w"), s, ln).alias("piece"),
                        ),
                    ),
                )
            )
        ).alias("sp"),
    ).filter(
        (F.length("sp.piece") == F.col("sp.ln"))
        & (F.length("sp.piece") >= 2)
    ).select("f", F.col("sp.piece").alias("piece"))
    return (
        spans.groupBy("piece")
        .agg(F.sum("f").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(seed_size)
    )


def greedy_segment(w: Column, pieces: list[str], max_piece: int = 4) -> Column:
    """Maximal-munch segmentation of ``w`` against the multi-char piece
    list (single characters implicitly always match): one F.aggregate
    fold over character positions. A k-length test may capture a
    SHORTER trailing substring near the word end (substring clamps);
    that is identical to the shorter test firing, and both engines
    clamp the same way, so no end guard is needed -- but k tests run
    longest-first so the longest real match always wins."""
    vocab = F.array(*[F.lit(p) for p in pieces]) if pieces else F.array().cast(
        "array<string>"
    )
    acc0 = F.struct(
        F.lit(1).cast("int").alias("pos"),
        F.array().cast("array<string>").alias("out"),
    )

    def step(acc, i):
        def try_k(k, fallback):
            cand = F.substring(w, acc["pos"], k)
            return F.when(
                F.array_contains(vocab, cand),
                F.struct(
                    (acc["pos"] + k).cast("int").alias("pos"),
                    F.concat(acc["out"], F.array(cand)).alias("out"),
                ),
            ).otherwise(fallback)

        single = F.struct(
            (acc["pos"] + 1).cast("int").alias("pos"),
            F.concat(
                acc["out"], F.array(F.substring(w, acc["pos"], 1))
            ).alias("out"),
        )
        matched = single
        for k in range(2, max_piece + 1):
            matched = try_k(k, matched)
        # positions already consumed by an earlier longer match skip
        return F.when(i != acc["pos"], acc).otherwise(matched)

    return F.aggregate(
        F.sequence(F.lit(1), F.length(w)), acc0, step, lambda a: a["out"]
    )


def learn_unigram_vocab(
    docs: DataFrame,
    text_col: str = "text",
    max_piece: int = 4,
    sizes: tuple[int, ...] = (40, 28, 16),
) -> DataFrame:
    """Run the seed -> (segment, count, prune) loop; ``sizes`` gives the
    multi-char vocabulary size per round (seed first). Returns the FINAL
    round's usage table: (piece, piece_len, usage) over multi-char
    survivors AND the alphabet singles, usage from the final canonical
    segmentation."""
    words = word_freq_table(docs, text_col).localCheckpoint()
    multi = [
        r.piece
        for r in seed_pieces(words, max_piece, sizes[0]).collect()
    ]

    def usage_of(pieces: list[str]) -> DataFrame:
        seg = words.select(
            "f", greedy_segment(F.col("w"), pieces, max_piece).alias("ps")
        )
        return (
            seg.select("f", F.explode("ps").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("f").cast("bigint").alias("usage"))
        )

    for size in sizes[1:]:
        keep = (
            usage_of(multi)
            .filter(F.length("piece") >= 2)
            .orderBy(F.desc("usage"), F.asc("piece"))
            .limit(size)
            .collect()
        )
        multi = [r.piece for r in keep]
    return usage_of(multi).select(
        "piece", F.length("piece").cast("int").alias("piece_len"), "usage"
    )
