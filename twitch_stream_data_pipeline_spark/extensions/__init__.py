"""Large-scale training-data pipeline operators (SURVEY.md §2.9).

These extend the reference's surface with the operations a 100 TB
text/embedding corpus pipeline needs: deduplication (exact and
near-dup), similarity search over embeddings, text analysis, and
multimodal column plumbing. All hot paths are built-in column
expressions (JVM-side, codegen) — Python appears only in the clearly
marked multimodal decode stubs.
"""

from .text_analysis import (
    language_id,
    text_fingerprint,
    text_quality,
    tokenize,
    token_count,
)
from .dedup_text import (
    exact_dedup_groups,
    minhash_signatures,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash64,
)
from .similarity import cosine_knn, lsh_bucketed_knn, quantized_embedding

__all__ = [
    "language_id",
    "text_fingerprint",
    "text_quality",
    "tokenize",
    "token_count",
    "exact_dedup_groups",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "shingles",
    "simhash64",
    "cosine_knn",
    "lsh_bucketed_knn",
    "quantized_embedding",
]
