from patternly_spark.operators.dedup import (
    exact_dedup,
    minhash_signatures,
    lsh_candidate_pairs,
    minhash_dedup,
    simhash_signatures,
    ngram_jaccard_pairs,
    embedding_neardup_pairs,
)
from patternly_spark.operators.dedup import simhash_neardup_pairs
from patternly_spark.operators.similarity import cosine_topk, ivf_topk, lsh_bucketed_topk, lsh_index_topk, save_lsh_index
from patternly_spark.operators.multimodal import extract_features, sample_frames, resize_images

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "minhash_dedup",
    "simhash_signatures",
    "ngram_jaccard_pairs",
    "embedding_neardup_pairs",
    "cosine_topk",
    "lsh_bucketed_topk",
    "ivf_topk",
    "lsh_index_topk",
    "save_lsh_index",
    "simhash_neardup_pairs",
    "extract_features",
    "sample_frames",
    "resize_images",
]
