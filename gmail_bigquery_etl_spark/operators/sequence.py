"""Event-sequence pattern matching: MATCH_RECOGNIZE-lite on DataFrames.

Spark has no MATCH_RECOGNIZE clause (Flink SQL / Oracle do); the engine's
restatement compiles per-key event history into a compact label STRING --
one character per event, in (ts, tiebreak) order -- and runs ordinary
regular expressions over it. Regex IS the MATCH_RECOGNIZE pattern
language (PATTERN (A B* C) is literally a regex over labels), so this
covers the common CEP shapes: ordered funnels with arbitrary gaps,
"A then B with no C between", bounded repetitions, alternations.

Scale posture: one shuffle per key (the same groupBy any per-user
aggregate costs); per-key state is one char per event, so a
10k-event user is a 10 KB string -- vastly cheaper than exploding
candidate windows the way join-based funnel matching does. Matching is
regexp_count inside whole-stage codegen, no Python in the row path.

Sequence construction uses sort_array over (ts, tiebreak, label)
structs -- struct ordering is lexicographic by field -- then a single
transform + concat. The adjacent-pair (bigram) form zips the label
array against its own tail (zip_with over slice), the HOF-safe idiom
for adjacency (no per-element re-evaluation of an inlined expression,
no self-join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def label_expr(col: Column | str, mapping: dict[str, str]) -> Column:
    """Map event labels to single characters (regex alphabet). Unmapped
    labels become '_' -- they occupy a position (gaps are real events)
    but match no pattern letter."""
    c = F.col(col) if isinstance(col, str) else col
    expr = F.lit("_")
    for value, ch in sorted(mapping.items()):
        if len(ch) != 1:
            raise ValueError(f"label char for {value!r} must be 1 char")
        expr = F.when(c == value, F.lit(ch)).otherwise(expr)
    return expr


def key_sequences(
    df: DataFrame,
    key: str,
    ts_col: str,
    tiebreak: str,
    label: Column,
) -> DataFrame:
    """(key, seq): per-key label string in strict (ts, tiebreak) order.
    The tiebreak column must be unique per key so the order is total --
    both engines then produce the identical string."""
    return (
        df.select(
            F.col(key).alias("key"),
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(tiebreak).alias("tb"),
                label.alias("c"),
            ).alias("s"),
        )
        .groupBy("key")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda x: x["c"]
                ),
                "",
            ).alias("seq")
        )
    )


def match_counts(seqs: DataFrame, pattern: str) -> DataFrame:
    """(key, seq_len, n_matches): non-overlapping regex match count per
    key -- identical left-to-right non-overlapping semantics in Java
    regex (Spark) and RE2 (DuckDB) for patterns without backrefs."""
    return seqs.select(
        "key",
        F.length("seq").cast("bigint").alias("seq_len"),
        F.regexp_count("seq", F.lit(pattern)).cast("bigint").alias(
            "n_matches"
        ),
    )


def transition_counts(seqs: DataFrame) -> DataFrame:
    """Global first-order Markov transitions from per-key sequences:
    (src, dst, n, p) where p is row-normalized over src. Adjacent pairs
    come from zipping the label array with its own tail (zip_with over
    slice) -- per-key, order-preserving, no self-join, no window."""
    chars = F.split("seq", "")
    pairs = F.zip_with(
        F.slice(chars, 1, F.greatest(F.length("seq") - 1, F.lit(0))),
        F.slice(chars, 2, F.greatest(F.length("seq") - 1, F.lit(0))),
        lambda a, b: F.concat(a, b),
    )
    counted = (
        seqs.where(F.length("seq") >= 2)
        .select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.substring("pair", 1, 1).alias("src"),
            F.substring("pair", 2, 1).alias("dst"),
            F.col("n").cast("bigint").alias("n"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("src")
    return counted.withColumn(
        "p", F.col("n") / F.sum("n").over(w)
    )
