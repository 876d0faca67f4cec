"""Large-scale training-data pipeline operators (SURVEY.md §2.9).

These extend the reference's surface with the operations a 100 TB
text/embedding corpus pipeline needs: deduplication (exact and
near-dup), similarity search over embeddings, text analysis, and
multimodal column plumbing. All hot paths are built-in column
expressions (JVM-side, codegen) — Python appears only in the clearly
marked multimodal decode stubs.
"""

from .text_analysis import (
    boilerplate_ratio,
    bpe_token_count,
    language_id,
    pii_scrub,
    repetition_stats,
    text_fingerprint,
    text_quality,
    tfidf_top_terms,
    tokenize,
    token_count,
    bigram_logprob,
    unigram_logprob,
)
from .dedup_text import (
    duplicate_span_stats,
    near_dup_verify,
    canonical_dedup,
    winnow_fingerprints,
    winnow_near_dup_pairs,
    decontaminate,
    exact_dedup_groups,
    minhash_signatures,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash64,
    simhash_near_dup_pairs,
)
from .classify import nb_evaluate, nb_predict, nb_train
from .graph import connected_components
from .sampling import (
    budget_select,
    chunk_documents,
    mixture_sample,
    pack_sequences,
    global_row_index,
    split_assign,
    stratified_sample,
    temperature_sample,
    weighted_sample,
)
from .similarity import (
    append_to_ivf_index,
    build_ivf_index,
    cosine_knn,
    embedding_covariance,
    ivf_index_knn,
    group_outlier_scores,
    group_outlier_scores_scalable,
    ivf_knn,
    ivfpq_knn,
    lsh_bucketed_knn,
    norms_map_in_arrow,
    pca_project,
    pq_knn,
    quantized_embedding,
    semantic_dedup,
)

from .multimodal import pool_features

__all__ = [
    "append_to_ivf_index",
    "bigram_logprob",
    "boilerplate_ratio",
    "bpe_token_count",
    "build_ivf_index",
    "ivf_index_knn",
    "pool_features",
    "winnow_fingerprints",
    "winnow_near_dup_pairs",
    "budget_select",
    "canonical_dedup",
    "chunk_documents",
    "connected_components",
    "cosine_knn",
    "embedding_covariance",
    "decontaminate",
    "duplicate_span_stats",
    "exact_dedup_groups",
    "global_row_index",
    "group_outlier_scores",
    "group_outlier_scores_scalable",
    "ivf_knn",
    "ivfpq_knn",
    "language_id",
    "lsh_bucketed_knn",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "mixture_sample",
    "near_dup_verify",
    "norms_map_in_arrow",
    "nb_evaluate",
    "nb_predict",
    "nb_train",
    "ngram_jaccard_pairs",
    "pack_sequences",
    "pca_project",
    "pii_scrub",
    "pq_knn",
    "quantized_embedding",
    "repetition_stats",
    "semantic_dedup",
    "shingles",
    "simhash64",
    "simhash_near_dup_pairs",
    "split_assign",
    "stratified_sample",
    "temperature_sample",
    "text_fingerprint",
    "text_quality",
    "tfidf_top_terms",
    "tokenize",
    "token_count",
    "unigram_logprob",
    "weighted_sample",
]
