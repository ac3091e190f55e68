"""Hypertable-style multi-resolution rollups (continuous aggregates).

TimescaleDB's hypertable rollup / materialized continuous aggregate,
re-expressed as a Spark aggregation cascade:

- ONE pass over the raw events computes the finest level's partial
  aggregates (count / decimal sum / min / max) — the only shuffle that
  ever touches raw data.
- every coarser level re-aggregates the previous level's PARTIALS
  (all four aggregates are mergeable), so a 1-hour level at 100 TB
  aggregates the 1-minute partial table (~6 orders of magnitude
  smaller), not the events.

Exactness: sums are carried as DECIMAL through the cascade, so the
cascaded coarse sums are bit-identical to a direct one-level
aggregation regardless of partial ordering (decimal addition is
associative); means are derived at the very end as double/bigint.
This is also why the cascade is safe to materialize incrementally:
refreshing a coarse bucket only needs the fine partials it covers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from patternly_spark.operators.ranges import _bucket


def hypertable_rollup(
    df: DataFrame,
    *,
    axis: str,
    value: str,
    by: str | list[str] | None = None,
    widths: list[int],
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
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))

    v = F.col(value)
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
