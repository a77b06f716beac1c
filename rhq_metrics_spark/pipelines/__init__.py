from rhq_metrics_spark.pipelines.classify import hashed_weights, linear_score
from rhq_metrics_spark.pipelines.dedup import (
    dup_clusters,
    embed_cross_near_dup,
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    segment_dedup,
    simhash_pairs,
)
from rhq_metrics_spark.pipelines.multimodal import (
    frame_sample_plan,
    media_features,
    media_from_documents,
    resize_plan,
)
from rhq_metrics_spark.pipelines.embeddings import quantize_int8, rp_reduce
from rhq_metrics_spark.pipelines.packing import chunk_documents, pack_chunks
from rhq_metrics_spark.pipelines.sketches import kmv_distinct
from rhq_metrics_spark.pipelines.sampling import (
    leakage_safe_split,
    cap_per_group,
    deterministic_sample,
    hash_split,
    mixture_sample,
)
from rhq_metrics_spark.pipelines.similarity import (
    cosine_topk,
    ivf_build_index,
    ivf_query_index,
    ivf_cosine_topk,
    lsh_cosine_topk,
)
from rhq_metrics_spark.pipelines.text import (
    bm25_score,
    contamination_check,
    document_fingerprint,
    language_id,
    quality_score,
    tfidf_top_terms,
    token_stats,
    vocab_stats,
)

__all__ = [
    "bm25_score",
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
    "embed_cross_near_dup",
    "hashed_weights",
    "linear_score",
    "ivf_cosine_topk",
    "ivf_build_index",
    "ivf_query_index",
    "kmv_distinct",
    "language_id",
    "lsh_cosine_topk",
    "media_features",
    "media_from_documents",
    "minhash_lsh_pairs",
    "mixture_sample",
    "ngram_jaccard_pairs",
    "pack_chunks",
    "chunk_documents",
    "leakage_safe_split",
    "quality_score",
    "quantize_int8",
    "resize_plan",
    "rp_reduce",
    "segment_dedup",
    "simhash_pairs",
    "tfidf_top_terms",
    "token_stats",
    "vocab_stats",
]
