"""Streaming deduplication: first-seen exact dedup over an unbounded stream.

Batch dedup sees the whole corpus at once; a stream cannot, so STATE is
the design problem — remembering every content hash forever is a leak at
100 TB/day.  ``dropDuplicatesWithinWatermark`` keys state by the
normalized content hash and evicts an entry once the event-time
watermark passes it, so state is bounded by the duplicate horizon (how
far apart duplicates can arrive), not by stream length.

Uses the same ``fingerprint`` normalization as
``operators.dedup.exact_dedup`` so batch and stream agree on what counts
as a duplicate (equivalence pinned in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from patternly_spark.functions.text import fingerprint


def streaming_exact_dedup(
    docs: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first-arriving row per normalized content hash.

    ``watermark`` is the dedup horizon: two identical documents arriving
    further apart than this (in event time) are BOTH kept — the price of
    bounded state.  Size it to the real-world dup lag (re-crawls,
    retries), not to the corpus lifetime; cross-horizon dups are caught
    by the batch ``exact_dedup`` compaction pass downstream.
    """
    hashed = docs.withColumn("content_hash", fingerprint(text_col, 32))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
