"""Stream -> batch-of-sequences windowing (SURVEY W1).

Exact parity with ``StreamingDetection.split_streams``
(``patternly/detection.py:596-613``): stride = window_size - overlap,
window i covers rows [i*stride, i*stride + window_size), and any window
not completely filled is dropped (the reference's ``dropna(how='any')``
after transpose).

Overlap means a row belongs to up to ceil(size/stride) windows; we express
that with ``sequence() + explode`` — a narrow, shuffle-free expansion whose
blow-up factor is exactly the overlap ratio.  The completeness filter is a
windowed count (one shuffle by (stream, window_id) — the same shuffle the
downstream per-window aggregation needs anyway, so AQE reuses it).

For live streams the same assignment maps onto Structured Streaming
``window(ts, size, slide)`` (SURVEY ST5); here we implement the
row-position batch variant the reference actually uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def split_stream(
    df: DataFrame,
    *,
    window_size: int,
    window_overlap: int = 0,
    order_col: str = "offset",
    stream_cols: list[str] | None = None,
    row_number_is_offset: bool = False,
) -> DataFrame:
    """Assign rows of an ordered stream to (possibly overlapping) windows.

    Output columns: input columns + ``window_id`` (long) + ``t`` (int,
    position within window).  Incomplete trailing windows are dropped.
    """
    if window_overlap >= window_size:
        raise ValueError("window_overlap must be < window_size")
    stride = window_size - window_overlap
    parts = stream_cols or []

    if row_number_is_offset:
        work = df.withColumn("__rn", F.col(order_col).cast("long"))
    else:
        w = Window.partitionBy(*parts).orderBy(order_col) if parts else Window.orderBy(order_col)
        work = df.withColumn("__rn", F.row_number().over(w) - 1)

    # windows containing row rn:  i in [ceil((rn-size+1)/stride), floor(rn/stride)]
    lo = F.greatest(F.lit(0).cast("long"), F.ceil((F.col("__rn") - F.lit(window_size) + 1) / F.lit(stride)))
    hi = F.floor(F.col("__rn") / F.lit(stride))
    exploded = (
        work.withColumn("window_id", F.explode(F.sequence(lo, hi)))
        .withColumn("t", (F.col("__rn") - F.col("window_id") * F.lit(stride)).cast("int"))
        .drop("__rn")
    )
    cw = (
        Window.partitionBy(*(parts + ["window_id"]))
        if parts
        else Window.partitionBy("window_id")
    )
    return (
        exploded.withColumn("__wcount", F.count(F.lit(1)).over(cw))
        .filter(F.col("__wcount") == window_size)
        .drop("__wcount")
    )


def windows_to_sequences(
    windowed: DataFrame,
    *,
    symbol_col: str = "symbol",
    stream_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse the long windowed layout into the compact sequence layout
    (seq_id, symbols array<tinyint>) — symbols sorted by within-window
    position so the result is deterministic under any partitioning."""
    parts = (stream_cols or []) + ["window_id"]
    agg = (
        windowed.groupBy(*parts)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("t"), F.col(symbol_col).alias("s")))
            ).alias("__pairs")
        )
        .withColumn("symbols", F.transform(F.col("__pairs"), lambda p: p["s"].cast("tinyint")))
        .drop("__pairs")
    )
    return agg.withColumnRenamed("window_id", "seq_id")
