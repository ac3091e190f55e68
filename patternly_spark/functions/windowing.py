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


def add_dense_offset(
    df: DataFrame,
    order_cols: list[str],
    *,
    out_col: str = "__rn",
    range_col=None,
    num_buckets: int | None = None,
) -> DataFrame:
    """Scalable global 0-based row numbering by ``order_cols``.

    A bare ``Window.orderBy`` collapses the whole table into ONE task —
    fine at sf0.1, fatal at 100 TB.  Scheme: (1) take approximate
    quantiles of a numeric prefix of the ordering (``range_col``, default
    order_cols[0]) ONCE on the driver and bake them in as literal bucket
    boundaries — unlike ``repartitionByRange``, whose sampled boundaries
    change per job and would scramble the numbering across actions;
    (2) rank within each bucket (windowed, parallel across buckets);
    (3) add per-bucket offsets from one tiny count pass.

    ``range_col`` must be a numeric expression that is a prefix of the
    ordering (bucket boundaries must respect the global order).  Ties on
    ``range_col`` land in one bucket; heavy ties skew that bucket.
    """
    from patternly_spark.plans import shuffle_partitions

    spark = df.sparkSession
    # robust conf read: the setting can be the literal "auto" on
    # AQE-managed platforms (plans.shuffle_partitions handles it)
    n_b = num_buckets or min(shuffle_partitions(spark, default=32) * 4, 256)
    rc = F.col(range_col) if isinstance(range_col, str) else range_col
    if rc is None:
        rc = F.col(order_cols[0])
    keyed = df.withColumn("__rk", rc.cast("double"))
    probs = [i / n_b for i in range(1, n_b)]
    cuts = sorted(set(keyed.stat.approxQuantile("__rk", probs, 0.001)))
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + F.when(F.col("__rk") > F.lit(float(c)), 1).otherwise(0)
    keyed = keyed.withColumn("__bucket", bucket)
    counts = {
        r["__bucket"]: r["cnt"]
        for r in keyed.groupBy("__bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off_expr = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("__bucket").orderBy(*order_cols)
    return (
        keyed.withColumn(out_col, (F.row_number().over(w) - 1 + off_expr[F.col("__bucket")]).cast("long"))
        .drop("__rk", "__bucket")
    )


def split_stream(
    df: DataFrame,
    *,
    window_size: int,
    window_overlap: int = 0,
    order_col: str = "offset",
    stream_cols: list[str] | None = None,
    row_number_is_offset: bool = False,
    range_col=None,
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
    elif parts:
        w = Window.partitionBy(*parts).orderBy(order_col)
        work = df.withColumn("__rn", (F.row_number().over(w) - 1).cast("long"))
    else:
        # global ordering: quantile-bucketed dense offset, never a
        # single-task global sort
        work = add_dense_offset(df, [order_col], out_col="__rn", range_col=range_col)

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
    element_type: str = "tinyint",
) -> DataFrame:
    """Collapse the long windowed layout into the compact sequence layout
    (seq_id, symbols array<element_type>) — symbols sorted by
    within-window position so the result is deterministic under any
    partitioning.  Pass element_type='double' for raw (pre-quantization)
    value streams: casting those to tinyint would overflow/corrupt."""
    parts = (stream_cols or []) + ["window_id"]
    agg = (
        windowed.groupBy(*parts)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("t"), F.col(symbol_col).alias("s")))
            ).alias("__pairs")
        )
        .withColumn("symbols", F.transform(F.col("__pairs"), lambda p: p["s"].cast(element_type)))
        .drop("__pairs")
    )
    return agg.withColumnRenamed("window_id", "seq_id")
