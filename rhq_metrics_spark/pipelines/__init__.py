from rhq_metrics_spark.pipelines.dedup import (
    dup_clusters,
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from rhq_metrics_spark.pipelines.multimodal import (
    frame_sample_plan,
    media_features,
    media_from_documents,
    resize_plan,
)
from rhq_metrics_spark.pipelines.sampling import (
    cap_per_group,
    deterministic_sample,
    hash_split,
)
from rhq_metrics_spark.pipelines.similarity import (
    cosine_topk,
    ivf_cosine_topk,
    lsh_cosine_topk,
)
from rhq_metrics_spark.pipelines.text import (
    contamination_check,
    document_fingerprint,
    language_id,
    quality_score,
    token_stats,
    vocab_stats,
)

__all__ = [
    "cap_per_group",
    "contamination_check",
    "cosine_topk",
    "deterministic_sample",
    "document_fingerprint",
    "dup_clusters",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "frame_sample_plan",
    "hash_split",
    "ivf_cosine_topk",
    "language_id",
    "lsh_cosine_topk",
    "media_features",
    "media_from_documents",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "quality_score",
    "resize_plan",
    "simhash_pairs",
    "token_stats",
    "vocab_stats",
]
