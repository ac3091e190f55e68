from patternly_spark.streaming.windows import (
    streaming_tumbling_counts,
    streaming_sliding_counts,
    streaming_session_counts,
    run_stream_to_memory,
)
from patternly_spark.streaming.dedup import streaming_exact_dedup
from patternly_spark.streaming.continuous import StreamingPFSADetector

__all__ = [
    "streaming_tumbling_counts",
    "streaming_sliding_counts",
    "streaming_session_counts",
    "streaming_exact_dedup",
    "run_stream_to_memory",
    "StreamingPFSADetector",
]
