from patternly_spark.operators.dedup import (
    exact_dedup,
    incremental_exact_dedup,
    minhash_signatures,
    lsh_candidate_pairs,
    minhash_dedup,
    neardup_dedup_corpus,
    simhash_signatures,
    simhash_neardup_pairs,
    ngram_jaccard_pairs,
    embedding_neardup_pairs,
    semantic_dedup,
    pair_set_agreement,
)
from patternly_spark.operators.decontam import (
    benchmark_shingle_set,
    cross_source_overlap,
    decontaminate,
)
from patternly_spark.operators.graph import (
    connected_components,
    dedup_clusters,
    label_propagation,
    pagerank,
)
from patternly_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
)
from patternly_spark.operators.packing import chunk_documents, pack_sequences
from patternly_spark.operators.sketches import sketch_profile
from patternly_spark.operators.sampling import (
    hash_fraction,
    hash_sample,
    stratified_hash_sample,
)
from patternly_spark.operators.quantized import (
    hamming_rerank_topk,
    int8_quantize,
    int8_topk,
    matryoshka_recall,
    sign_pack,
    truncated_topk,
)
from patternly_spark.operators.similarity import (
    cosine_topk,
    ivf_index_topk,
    ivf_topk,
    lsh_bucketed_topk,
    lsh_index_topk,
    save_ivf_index,
    save_lsh_index,
)
from patternly_spark.operators.ranges import range_join
from patternly_spark.operators.retrieval import (
    bm25_retrieve,
    bm25_scores,
    collocations,
    corpus_stats,
    tfidf_scores,
)
from patternly_spark.operators.rollup import hypertable_rollup
from patternly_spark.operators.temporal import (
    asof_intervals,
    asof_join,
    sessionize,
    stream_stream_asof_join,
    streaming_asof_join,
)

__all__ = [
    "exact_dedup",
    "incremental_exact_dedup",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "minhash_dedup",
    "neardup_dedup_corpus",
    "simhash_signatures",
    "simhash_neardup_pairs",
    "ngram_jaccard_pairs",
    "embedding_neardup_pairs",
    "semantic_dedup",
    "pair_set_agreement",
    "sketch_profile",
    "connected_components",
    "label_propagation",
    "pagerank",
    "dedup_clusters",
    "benchmark_shingle_set",
    "decontaminate",
    "cross_source_overlap",
    "pack_sequences",
    "chunk_documents",
    "cosine_topk",
    "hamming_rerank_topk",
    "int8_quantize",
    "int8_topk",
    "matryoshka_recall",
    "sign_pack",
    "truncated_topk",
    "lsh_bucketed_topk",
    "ivf_topk",
    "lsh_index_topk",
    "save_lsh_index",
    "ivf_index_topk",
    "save_ivf_index",
    "hash_fraction",
    "hash_sample",
    "stratified_hash_sample",
    "asof_join",
    "asof_intervals",
    "streaming_asof_join",
    "stream_stream_asof_join",
    "sessionize",
    "range_join",
    "hypertable_rollup",
    "bm25_scores",
    "bm25_retrieve",
    "tfidf_scores",
    "corpus_stats",
    "collocations",
    "extract_features",
    "sample_frames",
    "resize_images",
]
