"""Range (interval) joins as equi-joins — the at-scale shape.

A naive range join (``ON l.t BETWEEN r.start AND r.end``) has no
equality key for Spark to hash on: without help Catalyst falls back to
``BroadcastNestedLoopJoin`` / cartesian, which is quadratic and dies at
scale.  The standard fix (used by every warehouse's "range join
optimization") is axis bucketing: chop the join axis into fixed-width
buckets, explode each interval onto the buckets it spans, equi-join on
``(keys..., bucket)``, then apply the exact range predicate as a
residual filter.  The join becomes a plain hash/sort-merge join —
shuffles once on a bounded key, AQE-skew-splittable, 100 TB-safe.

Duplicate suppression without a distinct shuffle:

- point-in-interval: a point lands in exactly ONE bucket, so each
  qualifying pair meets exactly once — no dedup at all.
- interval-overlap: a qualifying pair co-occurs in every shared bucket;
  we keep only the bucket containing ``max(l.start, r.start)`` (the
  first bucket both intervals occupy), so each pair is emitted exactly
  once — a filter, not a ``distinct``.

Pick ``bucket_width`` near the typical interval length: explode factor
is ``1 + interval_len / width`` per row, while residual-filter
selectivity falls as width grows.  Both are per-row/narrow; only the
single equi-join shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(c: Column, width: int) -> Column:
    """Floor-division of a (possibly negative) long axis value into a
    bucket id, in exact integer arithmetic: ``pmod`` is non-negative, so
    ``c - pmod(c, w)`` is an exact multiple of ``w`` and the double
    division below is exact for |c| < 2^53 (epoch micros ≈ 1.8e15)."""
    w = F.lit(int(width))
    return ((c - F.pmod(c, w)) / w).cast("long")


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    right_start: str,
    right_end: str,
    left_point: str | None = None,
    left_start: str | None = None,
    left_end: str | None = None,
    by: str | list[str] | None = None,
    bucket_width: int,
    suffix: str = "_r",
) -> DataFrame:
    """Inner range join on a long-typed axis (e.g. epoch micros).

    Two modes:

    - ``left_point=`` : point-in-interval — match where
      ``right_start <= point <= right_end`` (bounds inclusive).
    - ``left_start=/left_end=`` : interval-overlap — match where
      ``left_start <= right_end AND right_start <= left_end``.

    ``by``: optional equality key(s) present on both sides; they join
    the hash key together with the bucket id.  Right-side columns that
    collide with left names are suffixed with ``suffix``.

    Left columns come out unchanged; each qualifying (left, right) pair
    appears exactly once (see module docstring).
    """
    point_mode = left_point is not None
    if point_mode == (left_start is not None or left_end is not None):
        raise ValueError("pass either left_point= or left_start=/left_end=")
    if not point_mode and (left_start is None or left_end is None):
        raise ValueError("interval mode needs both left_start and left_end")
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))

    ls = F.col(left_point if point_mode else left_start)
    le = F.col(left_point if point_mode else left_end)
    l = left.withColumn(
        "__bucket",
        F.explode(F.sequence(_bucket(ls, bucket_width), _bucket(le, bucket_width)))
        if not point_mode
        else _bucket(ls, bucket_width),
    )

    rename = {c: (c + suffix if c in left.columns else c) for c in right.columns}
    r = right.select(*[F.col(c).alias(rename[c]) for c in right.columns])
    rs, re_ = F.col(rename[right_start]), F.col(rename[right_end])
    r = r.withColumn(
        "__bucket", F.explode(F.sequence(_bucket(rs, bucket_width), _bucket(re_, bucket_width)))
    )

    equi = ["__bucket"] + keys
    for k in keys:
        if rename.get(k, k) != k:
            # key column was suffixed on the right: realign the equi name
            r = r.withColumnRenamed(rename[k], k)
            rename[k] = k
    if point_mode:
        residual = (rs <= ls) & (ls <= re_)
    else:
        residual = (ls <= re_) & (rs <= le)
        # emit exactly once: only in the first bucket both intervals occupy
        residual = residual & (F.col("__bucket") == _bucket(F.greatest(ls, rs), bucket_width))

    out = l.join(r, on=equi, how="inner").filter(residual)
    return out.drop("__bucket")
