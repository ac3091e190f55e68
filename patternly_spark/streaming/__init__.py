from patternly_spark.streaming.windows import (
    streaming_tumbling_counts,
    streaming_sliding_counts,
    run_stream_to_memory,
)
from patternly_spark.streaming.continuous import StreamingPFSADetector

__all__ = [
    "streaming_tumbling_counts",
    "streaming_sliding_counts",
    "run_stream_to_memory",
    "StreamingPFSADetector",
]
