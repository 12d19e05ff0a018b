from .text import (
    h64,
    tokens_col,
    token_count,
    quality_score,
    lang_id,
    fingerprint,
    winnow_fingerprints,
)
from .dedup import (
    exact_dedup,
    shingle_df,
    minhash_signatures,
    minhash_candidates,
    simhash,
    simhash_candidates,
    ngram_jaccard_pairs,
)
from .similarity import (
    cosine_topk,
    embedding_near_dup,
    embedding_near_dup_allpairs,
    lsh_band_buckets,
    lsh_bucket_topk,
    lsh_buckets,
)

__all__ = [
    "h64",
    "tokens_col",
    "token_count",
    "quality_score",
    "lang_id",
    "fingerprint",
    "winnow_fingerprints",
    "exact_dedup",
    "shingle_df",
    "minhash_signatures",
    "minhash_candidates",
    "simhash",
    "simhash_candidates",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "embedding_near_dup",
    "embedding_near_dup_allpairs",
    "lsh_band_buckets",
    "lsh_bucket_topk",
    "lsh_buckets",
]
