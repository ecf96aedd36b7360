"""Text-analysis column functions for the LLM-pipeline extensions
(SURVEY.md §2.10): tokenization, shingling, portable hashing, quality
metrics, language-ID, document fingerprinting.

Everything here is built-in pyspark.sql.functions expressions (JVM-side,
codegen'd) -- at 100 TB these run per-row inside the scan stage with zero
Python round-trips. Hashes are built on md5 hex so the DuckDB oracle can
reproduce them bit-for-bit (Spark's murmur3 ``hash()`` is not portable).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007  # fingerprint modulus; keeps rolling hash in int64 range

# MinHash affine-family modulus. h_i(s) = (a_i * (H(s) % P) + b_i) % P with
# H the 60-bit md5 hash: ONE md5 per shingle, then k cheap int64 rehashes
# (a_i < P, h < P => a_i*h < 1e18 < 2^63, no ANSI overflow). 16x fewer md5
# evaluations than salting the digest per hash index.
MINHASH_P = 1_000_000_007


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the affine MinHash family, from a
    fixed-seed LCG so Spark and the DuckDB oracle share one source of truth
    (queries/text.py formats these same ints into the oracle SQL)."""
    x = 123456789
    out = []
    for _ in range(num_hashes):
        x = (1103515245 * x + 12345) % (1 << 31)
        a = x % (MINHASH_P - 1) + 1
        x = (1103515245 * x + 12345) % (1 << 31)
        b = x % MINHASH_P
        out.append((a, b))
    return out


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def portable_hash64(col: Column | str) -> Column:
    """Deterministic 60-bit non-negative hash identical across engines.

    Spark:  conv(substring(md5(s), 1, 15), 16, 10)::bigint
    DuckDB: CAST('0x' || substring(md5(s), 1, 15) AS BIGINT)
    15 hex chars = 60 bits, always positive in an int64.
    """
    return F.conv(F.substring(F.md5(_c(col)), 1, 15), 16, 10).cast("bigint")


def whitespace_tokens(col: Column | str) -> Column:
    """Lowercased whitespace tokenization; empty string -> empty array."""
    trimmed = F.trim(F.lower(_c(col)))
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    return F.size(whitespace_tokens(col))


def bpe_ish_tokens(col: Column | str) -> Column:
    """Sub-word-ish tokenization: splits on word/number/punct boundaries,
    the common pre-tokenizer regex shape used before BPE merges."""
    return F.regexp_extract_all(
        F.lower(_c(col)), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0
    )


def ngram_shingles_from_tokens(toks_col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined) over a PRE-MATERIALIZED token
    array column. Callers on the hot path should stage the token split as
    its own projection and pass the attribute here: the slice lambda
    references ``toks`` per element, and if ``toks`` is an inline expression
    (not an attribute) Catalyst re-evaluates the whole split per shingle --
    HOF lambdas get neither codegen nor CSE.

    Texts shorter than n tokens yield a single shingle of the whole text so
    no document silently drops out of dedup.
    """
    toks = _c(toks_col)
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(k >= n, grams).otherwise(F.array(F.array_join(toks, " ")))


def ngram_shingles(col: Column | str, n: int = 3) -> Column:
    """Shingles straight from a text column. Convenience form: fine for
    one-shot use, but O(tokens) re-splitting per shingle -- prefer staging
    ``whitespace_tokens`` and calling ``ngram_shingles_from_tokens``."""
    return ngram_shingles_from_tokens(whitespace_tokens(col), n)


def quality_columns(col: Column | str) -> dict[str, Column]:
    """Heuristic document-quality signals (length/punct/stopword ratios).

    Returned as named Columns so callers can select any subset; every ratio
    is guarded against division by zero (ANSI mode raises otherwise).
    """
    c = _c(col)
    n_chars = F.length(c).cast("bigint")
    toks = whitespace_tokens(c)
    n_tokens = F.size(toks).cast("bigint")
    safe_chars = F.nullif(n_chars, F.lit(0)).cast("double")
    safe_tokens = F.nullif(n_tokens, F.lit(0)).cast("double")
    stop = F.array(
        *[
            F.lit(s)
            for s in ("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")
        ]
    )
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast("bigint")
    n_punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]{}-]", "")).cast("bigint")
    n_alpha = F.length(F.regexp_replace(F.lower(c), r"[^a-z]", "")).cast("bigint")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": F.coalesce(n_alpha / safe_tokens, F.lit(0.0)),
        "punct_ratio": F.coalesce(n_punct / safe_chars, F.lit(0.0)),
        "alpha_ratio": F.coalesce(n_alpha / safe_chars, F.lit(0.0)),
        "stopword_ratio": F.coalesce(n_stop / safe_tokens, F.lit(0.0)),
    }


# Marker stopwords per language for the n-gram/stopword language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "des", "est"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}


def lang_scores(col: Column | str) -> dict[str, Column]:
    toks = whitespace_tokens(col)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
    return out


def predicted_lang(col: Column | str) -> Column:
    """Argmax language by marker-stopword count; deterministic tie-break on
    language code order; 'und' (undetermined) when no marker hits."""
    scores = lang_scores(col)
    best_score = F.greatest(*scores.values())
    pred = F.lit("und")
    # Iterate reversed so earlier language codes win ties (en before es ...).
    for lang in sorted(scores, reverse=True):
        pred = F.when(scores[lang] == best_score, F.lit(lang)).otherwise(pred)
    return F.when(best_score > 0, pred).otherwise(F.lit("und"))


def doc_fingerprint_from_tokens(toks_col: Column | str, n: int = 3) -> Column:
    """Order-sensitive rolling hash over word shingles, mod 1e9+7.

    fp = fold(shingles, 0, (acc, s) -> (acc * 31 + h(s) % MOD) % MOD)
    Reproducible in DuckDB via list_reduce over the same md5-based h().
    Takes a staged token-array column (see ngram_shingles_from_tokens).
    """
    grams = ngram_shingles_from_tokens(toks_col, n)
    return F.aggregate(
        grams,
        F.lit(0).cast("bigint"),
        lambda acc, s: (acc * 31 + portable_hash64(s) % MOD) % MOD,
    )


def doc_fingerprint(col: Column | str, n: int = 3) -> Column:
    """Fingerprint straight from text; prefer the staged-token form on the
    hot path (same re-split caveat as ngram_shingles)."""
    return doc_fingerprint_from_tokens(whitespace_tokens(col), n)
