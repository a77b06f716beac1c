from rhq_metrics_spark.pipelines.dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from rhq_metrics_spark.pipelines.similarity import (
    cosine_topk,
    ivf_cosine_topk,
    lsh_cosine_topk,
)
from rhq_metrics_spark.pipelines.text import (
    document_fingerprint,
    language_id,
    quality_score,
    token_stats,
)

__all__ = [
    "cosine_topk",
    "document_fingerprint",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "ivf_cosine_topk",
    "language_id",
    "lsh_cosine_topk",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "quality_score",
    "simhash_pairs",
    "token_stats",
]
