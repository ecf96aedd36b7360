"""Paragraph grid shared by the CCNet-style dedup family: consecutive
N-token chunks of the lowercased whitespace tokenization.

One definition serves the batch rewrite query
(queries/webcorpus.curation_line_dedup) and the streaming
first-occurrence index (streaming/para_dedup.py), so the streamed and
one-shot paragraph tables are bit-identical by construction — the
banded_signatures/dedup_index precedent.

HOF hazard note: the chunk transform's lambda references the token
array per element; `para_arrays` stages the array as its own attribute
and references it twice in the consuming projection (size + transform),
which stops CollapseProject from inlining the split expression into the
lambda (the documented O(tokens^2)-per-row re-evaluation hazard,
queries/text.py novelty fix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import whitespace_tokens

PARA_TOKENS = 10


def para_arrays(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    para_tokens: int = PARA_TOKENS,
) -> DataFrame:
    """(id_col, paras array<string>) — the document's paragraph grid.
    Empty/whitespace-only text yields an empty array."""
    tok = df.select(id_col, whitespace_tokens(text_col).alias("toks"))
    return tok.select(
        id_col,
        F.expr(
            f"CASE WHEN size(toks) = 0 THEN CAST(array() AS ARRAY<STRING>) "
            f"ELSE transform(sequence(1, (size(toks) + {para_tokens - 1}) "
            f"div {para_tokens}), "
            f"i -> array_join(slice(toks, (i-1)*{para_tokens}+1, "
            f"{para_tokens}), ' ')) END"
        ).alias("paras"),
    )


def explode_paras(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id_col, pos, para) with 1-based positions, document order."""
    return df.select(
        id_col, F.posexplode("paras").alias("pos0", "para")
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "para")
