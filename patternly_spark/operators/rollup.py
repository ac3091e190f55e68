"""Hypertable-style multi-resolution rollups (continuous aggregates).

TimescaleDB's hypertable rollup / materialized continuous aggregate,
re-expressed Spark-first.  Two strategies, identical output:

- ``explode`` (default): each event emits one (level, bucket) pair per
  resolution, then ONE groupBy aggregates every level in a single
  shuffle.  The raw table is scanned exactly once, the fan-out is
  per-row/narrow, and map-side partial aggregation collapses the
  exploded rows to (levels × buckets × keys) before the exchange —
  the right batch-query plan at 100 TB.
- ``cascade``: the finest level's partials (count / decimal sum /
  min / max — all mergeable) are aggregated first and every coarser
  level merges the previous level's PARTIALS.  This is the
  incremental-refresh shape (a coarse bucket refreshes from the tiny
  fine-partial table, not the events), but as a single batch plan each
  union branch re-derives its inputs — persist/materialize the fine
  level when using it, exactly like a real continuous aggregate.

Exactness: sums are carried as DECIMAL (associative), so both
strategies are bit-identical to each other and to a direct per-level
aggregation; means are derived at the very end as double/bigint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from patternly_spark.operators.ranges import _bucket


def _fdiv(c: Column, w: Column) -> Column:
    """Exact floor-division on longs (see ranges._bucket; this variant
    takes a column divisor for the exploded level width)."""
    return ((c - F.pmod(c, w)) / w).cast("long")


def hypertable_rollup(
    df: DataFrame,
    *,
    axis: str,
    value: str,
    by: str | list[str] | None = None,
    widths: list[int],
    strategy: str = "explode",
) -> DataFrame:
    """Rollup ``value`` over a long-typed time axis at several bucket
    widths at once (finest first; each width must divide the next so
    coarse buckets are exact unions of fine ones).

    Returns one row per (level, window, keys):
    ``level`` (the bucket width), ``window_start`` (bucket start, same
    units as ``axis``), the ``by`` keys, ``n``, ``total``, ``vmin``,
    ``vmax``, ``avg``.
    """
    if not widths:
        raise ValueError("widths must be non-empty")
    if sorted(widths) != list(widths) or len(set(widths)) != len(widths):
        raise ValueError(f"widths must be strictly ascending, got {widths}")
    for a, b in zip(widths, widths[1:]):
        if b % a != 0:
            raise ValueError(f"each width must divide the next: {a} !| {b}")
    if strategy not in ("explode", "cascade"):
        raise ValueError(f"strategy must be explode|cascade, got {strategy!r}")
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    v = F.col(value)

    if strategy == "explode":
        lv = F.explode(F.array(*[F.lit(int(w)).cast("long") for w in widths])).alias("level")
        exploded = df.select(*keys, F.col(axis), v.alias("__v"), lv)
        return (
            exploded.groupBy(
                "level",
                (_fdiv(F.col(axis), F.col("level")) * F.col("level")).alias("window_start"),
                *keys,
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.col("__v").cast("decimal(24,10)")).cast("decimal(30,10)").alias("__sum"),
                F.min("__v").alias("vmin"),
                F.max("__v").alias("vmax"),
            )
            .select(
                "level",
                "window_start",
                *keys,
                "n",
                F.col("__sum").cast("double").alias("total"),
                "vmin",
                "vmax",
                (F.col("__sum").cast("double") / F.col("n")).alias("avg"),
            )
        )

    partials = df.groupBy(*keys, _bucket(F.col(axis), widths[0]).alias("__b")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v.cast("decimal(24,10)")).cast("decimal(30,10)").alias("__sum"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
    )

    def finalize(p: DataFrame, w: int) -> DataFrame:
        return p.select(
            F.lit(int(w)).cast("long").alias("level"),
            (F.col("__b") * F.lit(int(w))).cast("long").alias("window_start"),
            *keys,
            "n",
            F.col("__sum").cast("double").alias("total"),
            "vmin",
            "vmax",
            (F.col("__sum").cast("double") / F.col("n")).alias("avg"),
        )

    levels = [finalize(partials, widths[0])]
    prev, w_prev = partials, widths[0]
    for w in widths[1:]:
        prev = prev.groupBy(*keys, _bucket(F.col("__b"), w // w_prev).alias("__b")).agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("__sum").cast("decimal(30,10)").alias("__sum"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
        w_prev = w
        levels.append(finalize(prev, w))

    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def streaming_hypertable_rollup(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    value: str = "value",
    by: str | list[str] | None = None,
    widths_seconds: list[int] = (3600, 86400),
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming twin of ``hypertable_rollup``: the continuous-aggregate
    form TimescaleDB materializes, expressed as Structured Streaming —
    one watermarked tumbling-window aggregation per resolution, unioned.

    Each level is its own stateful operator over the SAME source scan
    (Spark runs the branches off one micro-batch), so a 100 TB/day
    stream maintains all resolutions in one query with per-level state
    bounded by (watermark / width) x keys.  Output schema matches the
    batch rollup with the axis in epoch MICROSECONDS (``level`` = bucket
    width in micros, ``window_start`` = bucket start in micros), so
    batch-vs-stream equivalence is a direct DataFrame comparison against
    ``hypertable_rollup(axis=unix_micros(ts), widths=[w*1e6 ...])`` —
    pinned in tests/test_streaming.py.

    Append-mode caveat (same as every watermarked agg here): windows
    newer than max(event time) - watermark are still open at
    end-of-stream; use complete mode (or a watermark-advancing sentinel)
    when every window must drain.
    """
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    widths = [int(w) for w in widths_seconds]
    if sorted(widths) != widths or len(set(widths)) != len(widths):
        raise ValueError(f"widths_seconds must be strictly ascending, got {widths}")
    v = F.col(value)
    out = None
    for w in widths:
        branch = (
            events.withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, f"{w} seconds").alias("__w"), *keys)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(v.cast("decimal(24,10)")).cast("decimal(30,10)").alias("__sum"),
                F.min(v).alias("vmin"),
                F.max(v).alias("vmax"),
            )
            .select(
                F.lit(w * 1_000_000).cast("long").alias("level"),
                F.unix_micros(F.col("__w.start")).alias("window_start"),
                *keys,
                "n",
                F.col("__sum").cast("double").alias("total"),
                "vmin",
                "vmax",
                (F.col("__sum").cast("double") / F.col("n")).alias("avg"),
            )
        )
        out = branch if out is None else out.unionByName(branch)
    return out


def gapfill(
    df: DataFrame,
    *,
    axis: str,
    value: str,
    width: int,
    by: str | list[str] | None = None,
    agg: str = "max",
    method: str = "locf",
) -> DataFrame:
    """TimescaleDB-style ``time_bucket_gapfill`` + fill: bucket ``axis``
    (long units) by ``width``, aggregate ``value`` per bucket, then emit
    every missing interior bucket per group with the chosen fill.

    ``agg``: ``max`` | ``min`` | ``count`` | ``avg`` (max/min/count are
    bit-exact cross-engine; avg depends on distributed sum order — fine
    for use, excluded from exact oracles).  ``method``: ``none`` (gaps
    stay NULL), ``locf`` (last observation carried forward), ``linear``
    (interpolate between the surrounding known buckets on the bucket-
    start axis; formula written to be IEEE-identical in SQL).

    Output: (keys..., window_start, n, val, val_filled) — ``n`` = 0 and
    ``val`` NULL on generated gap rows; total over [first, last] known
    bucket per group (TimescaleDB fills the query range instead; pass a
    pre-unioned range frame if you need leading/trailing fill).

    Scale shape — the whole point of the formulation: ONE aggregation
    shuffle + one small window (lead) over the aggregated buckets, then
    each known bucket row explodes into itself plus its trailing gap
    (``sequence(ws, next_ws - width, width)``).  The fill values ride
    along from the pre-explode row, so there is NO spine aggregation,
    NO join back, and NO post-explode window; per-row array size is
    bounded by the individual gap length, not the group's time extent.
    """
    from pyspark.sql import Window

    keys = [by] if isinstance(by, str) else list(by or [])
    if agg not in ("max", "min", "count", "avg"):
        raise ValueError(f"unsupported agg {agg!r}")
    if method not in ("none", "locf", "linear"):
        raise ValueError(f"unsupported method {method!r}")
    w_lit = F.lit(int(width)).cast("long")
    a = F.col(axis).cast("long")
    bucket = (a - F.pmod(a, w_lit)).alias("ws")
    aggc = {
        "max": F.max(value),
        "min": F.min(value),
        "count": F.count(value).cast("long"),
        "avg": F.avg(value),
    }[agg]
    b = df.groupBy(*keys, bucket).agg(
        F.count(F.lit(1)).cast("long").alias("n"), aggc.alias("val")
    )
    w = Window.partitionBy(*keys).orderBy("ws") if keys else Window.orderBy("ws")
    led = b.withColumn("next_ws", F.lead("ws").over(w)).withColumn(
        "next_val", F.lead("val").over(w)
    )
    spine = led.select(
        *keys,
        "ws",
        "n",
        "val",
        "next_ws",
        "next_val",
        F.explode(
            F.sequence(F.col("ws"), F.coalesce(F.col("next_ws") - w_lit, F.col("ws")), w_lit)
        ).alias("ws2"),
    )
    known = F.col("ws2") == F.col("ws")
    if method == "none":
        filled = F.when(known, F.col("val"))
    elif method == "locf":
        # the carried value IS the pre-explode row's val
        filled = F.col("val")
    else:
        frac = (F.col("ws2") - F.col("ws")).cast("double") / (
            F.col("next_ws") - F.col("ws")
        ).cast("double")
        filled = F.when(known, F.col("val")).otherwise(
            F.col("val") + (F.col("next_val") - F.col("val")) * frac
        )
    return spine.select(
        *keys,
        F.col("ws2").alias("window_start"),
        F.when(known, F.col("n")).otherwise(F.lit(0)).cast("long").alias("n"),
        F.when(known, F.col("val")).alias("val"),
        filled.alias("val_filled"),
    )


def corpus_data_card(
    docs: DataFrame,
    *,
    dims: tuple[str, ...] = ("lang", "source"),
    text_col: str = "text",
    short_tokens: int = 10,
) -> DataFrame:
    """Corpus "data card": one CUBE over the dimension columns with the
    summary every dataset release ships — document and token counts,
    short-document counts, mean quality score — at every granularity
    (per lang x source cell, per-lang and per-source marginals, grand
    total) in ONE pass.

    The mean quality is cross-engine exact: the per-doc composite score
    (functions/text.quality_score, already SQL-replicated by q19) is
    floor-quantized to the 2^-20 dyadic grid and summed as longs, so
    the group means are identical under any partitioning/engine
    (integer sums; one final division).

    Scale shape: CUBE(d1..dk) expands each row to 2^k grouping keys
    before ONE partial-aggregating shuffle — for the 2-3 release
    dimensions that is a small constant fan-out, and the shuffle
    carries only (keys, 4 longs).  Never joins, never sorts."""
    from patternly_spark.functions.text import quality_score

    scale = float(1 << 20)
    tok = (
        F.size(F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")))
        .cast("long")
    )
    base = docs.select(
        *dims,
        tok.alias("__tok"),
        F.floor(quality_score(text_col) * F.lit(scale)).cast("long").alias("__qq"),
    )
    n = F.count(F.lit(1))
    return base.cube(*dims).agg(
        n.cast("long").alias("n_docs"),
        F.sum("__tok").cast("long").alias("tokens"),
        F.sum(F.when(F.col("__tok") < int(short_tokens), 1).otherwise(0))
        .cast("long")
        .alias("short_docs"),
        ((F.sum("__qq").cast("double") / F.lit(scale)) / n.cast("double")).alias(
            "mean_quality"
        ),
    )


def rollup_distinct(
    df: DataFrame,
    *,
    axis: str,
    entity: str,
    widths: list[int],
    by: str | list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """Multi-resolution distinct-entity counts — the DAU/WAU/MAU query —
    from ONE scan of the fact table.

    Each row fans out to one (level, bucket) per width (the
    ``hypertable_rollup`` explode shape), then a two-stage distinct:
    dedup on (level, window, keys, entity) — partial aggregation
    collapses a hot entity's repeats map-side — followed by the count.
    ``exact=False`` swaps the dedup for per-bucket HLL++ partials
    (``approx_count_distinct``): one shuffle instead of two and a
    mergeable sketch, the scale default when +-2% is fine; the
    distinct-count identity (an entity counts once per bucket it
    appears in) is what makes the exact path need its own shuffle.

    Output: (level, window_start, keys..., n_entities long).
    """
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    if not widths:
        raise ValueError("widths must be non-empty")
    lv = F.explode(F.array(*[F.lit(int(w)).cast("long") for w in widths])).alias("level")
    exploded = df.select(*keys, F.col(axis), F.col(entity), lv)
    win = (_fdiv(F.col(axis), F.col("level")) * F.col("level")).alias("window_start")
    if not exact:
        return (
            exploded.groupBy("level", win, *keys)
            .agg(F.approx_count_distinct(entity).cast("long").alias("n_entities"))
        )
    return (
        exploded.select("level", win, *keys, entity)
        .distinct()
        .groupBy("level", "window_start", *keys)
        .agg(F.count(F.lit(1)).cast("long").alias("n_entities"))
    )
