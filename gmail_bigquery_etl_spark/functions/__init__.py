from .headers import (
    flatten_labels,
    header_value,
    label_predicate,
    parse_rfc2822,
)
from .text import (
    doc_fingerprint,
    ngram_shingles,
    portable_hash64,
    quality_columns,
    token_count,
    whitespace_tokens,
)
from .vectors import cosine_similarity, dot, l2_norm, normalize

__all__ = [
    "flatten_labels",
    "header_value",
    "label_predicate",
    "parse_rfc2822",
    "doc_fingerprint",
    "ngram_shingles",
    "portable_hash64",
    "quality_columns",
    "token_count",
    "whitespace_tokens",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "normalize",
]
