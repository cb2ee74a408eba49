"""LLM-training-data pipeline operators (first-class, beyond the
reference's SPARQL surface): deduplication, similarity search, text
analysis, sessionization, multimodal column plumbing."""

from .dedup import (
    exact_dedup_groups,
    fingerprint_dedup_groups,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash,
    simhash_near_dup_pairs,
)
from .sessions import session_stats, sessionize
from .similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_bucket_topk,
)
from .text import (
    top_words,
    with_language_id,
    with_quality_score,
    with_rolling_fingerprint,
    with_text_stats,
)

__all__ = [
    "exact_dedup_groups", "fingerprint_dedup_groups", "jaccard_pairs",
    "minhash_lsh_pairs", "simhash", "simhash_near_dup_pairs",
    "session_stats", "sessionize",
    "cosine_topk", "embedding_near_dup_pairs", "ivf_topk", "lsh_bucket_topk",
    "top_words", "with_language_id", "with_quality_score",
    "with_rolling_fingerprint", "with_text_stats",
]
