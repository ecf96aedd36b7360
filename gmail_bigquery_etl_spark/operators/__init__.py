from .dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signature,
    near_dup_pairs,
    simhash,
)
from .errors import divide_or_error, parse_timestamp_or_error
from .incremental import (
    extract_email_records,
    incremental_anti_join,
    ingest_increment,
)
from .multimodal import (
    decode_features,
    documents_as_media,
    resize_media,
    sample_frames,
)
from .similarity import (
    allpairs_cosine,
    brute_force_topk,
    ivf_topk,
    label_centroids,
    lsh_bucket_ann,
)
from .skew import salted_counts_sums, salted_join

__all__ = [
    "allpairs_cosine",
    "brute_force_topk",
    "decode_features",
    "divide_or_error",
    "documents_as_media",
    "exact_dedup",
    "extract_email_records",
    "incremental_anti_join",
    "ingest_increment",
    "ivf_topk",
    "jaccard_pairs",
    "label_centroids",
    "lsh_bucket_ann",
    "lsh_candidate_pairs",
    "minhash_signature",
    "near_dup_pairs",
    "parse_timestamp_or_error",
    "resize_media",
    "salted_counts_sums",
    "salted_join",
    "sample_frames",
    "simhash",
]
