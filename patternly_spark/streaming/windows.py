"""Structured Streaming windowed aggregations (SURVEY ST4/ST5).

The same window expressions as the batch queries (q08/q09) expressed over
``readStream`` with an event-time watermark — the engine's upgrade over
the reference's implicit-order streams (ST4 is documented as an
extension, not parity).  The batch/stream equivalence test
(tests/test_streaming.py) proves both paths produce identical windows on
the same data, which is the SURVEY §5.5 gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_tumbling_counts(
    events: DataFrame,
    *,
    window_seconds: int = 86400,
    watermark: str = "1 day",
) -> DataFrame:
    """Tumbling-window counts per event_type over a streaming DataFrame.

    Note on output modes: with ``append`` the watermark finalizes windows
    — windows newer than (max event time - watermark) stay open and are
    NOT emitted at end-of-stream; use ``complete`` mode when every window
    must be surfaced (the batch-equivalence tests do)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{window_seconds} seconds").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start"),
            "event_type",
            "n",
        )
    )


def streaming_sliding_counts(
    events: DataFrame,
    *,
    window_seconds: int = 86400,
    slide_seconds: int = 43200,
    watermark: str = "1 day",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{window_seconds} seconds", f"{slide_seconds} seconds").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start"), "n")
    )


def run_stream_to_memory(result: DataFrame, name: str, *, output_mode: str = "append") -> DataFrame:
    """Drain a streaming DataFrame to a memory sink with an availableNow
    trigger (processes everything currently available, then stops).
    Returns the sink contents as a batch DataFrame."""
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result.sparkSession.sql(f"SELECT * FROM {name}")
