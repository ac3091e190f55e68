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


def streaming_session_counts(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    by: str = "user_id",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Gap-based sessions over a streaming DataFrame — the streaming twin
    of ``operators.temporal.sessionize`` (same ``session_window``
    expression, so batch and stream agree row-for-row; proven by the
    equivalence test).

    Append mode only emits a session once the watermark passes its end,
    so on a finite replay the session holding the globally-latest event
    never closes (its end = last ts + gap > any achievable watermark).
    Live streams don't care; finite replays append a far-future sentinel
    event to flush (see the equivalence test)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.col(by), F.session_window(F.col("ts"), gap).alias("session"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            by,
            F.unix_micros(F.col("session.start")).alias("session_start_us"),
            "n_events",
        )
    )
