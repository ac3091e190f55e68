from patternly_spark.streaming.windows import (
    streaming_tumbling_counts,
    streaming_sliding_counts,
    streaming_session_counts,
    run_stream_to_memory,
)
from patternly_spark.streaming.dedup import (
    incremental_set_similarity_join,
    streaming_exact_dedup,
    streaming_set_similarity_join,
)
from patternly_spark.streaming.drift import (
    sprt_from_registry,
    streaming_holt,
    streaming_sprt_registry,
    streaming_survival_registry,
)
from patternly_spark.streaming.evaluation import (
    ranking_registry_metrics,
    streaming_ranking_registry,
)
from patternly_spark.streaming.similarity import (
    covariance_from_registry,
    incremental_cosine_allpairs,
    streaming_cosine_allpairs,
    streaming_covariance_registry,
)
from patternly_spark.streaming.continuous import StreamingPFSADetector
from patternly_spark.streaming.multimodal import streaming_image_dedup_registry

__all__ = [
    "streaming_tumbling_counts",
    "streaming_sliding_counts",
    "streaming_session_counts",
    "streaming_exact_dedup",
    "incremental_set_similarity_join",
    "streaming_set_similarity_join",
    "incremental_cosine_allpairs",
    "streaming_cosine_allpairs",
    "streaming_covariance_registry",
    "streaming_holt",
    "streaming_sprt_registry",
    "sprt_from_registry",
    "streaming_survival_registry",
    "streaming_ranking_registry",
    "ranking_registry_metrics",
    "covariance_from_registry",
    "run_stream_to_memory",
    "StreamingPFSADetector",
    "streaming_image_dedup_registry",
]
