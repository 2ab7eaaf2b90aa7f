from mapreducewordoccurences_spark.functions.text import (
    tokens,
    token_count,
    text_stats,
    quality_score,
    language_id,
    doc_fingerprint,
)
from mapreducewordoccurences_spark.functions.similarity import (
    dot,
    l2_norm,
    cosine_similarity,
    brute_force_knn,
    lsh_knn,
)

__all__ = [
    "tokens",
    "token_count",
    "text_stats",
    "quality_score",
    "language_id",
    "doc_fingerprint",
    "dot",
    "l2_norm",
    "cosine_similarity",
    "brute_force_knn",
    "lsh_knn",
]
