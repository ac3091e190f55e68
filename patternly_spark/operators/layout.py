"""Data-layout operators: Z-order (Morton) clustering for multi-column
data skipping, plus a size-targeted compacting writer.

Why this exists at 100 TB: parquet readers prune files/row-groups by
footer min/max statistics, but stats only help if rows are physically
clustered on the filter columns.  Sorting on one column destroys locality
on the others; interleaving the bits of several columns (a space-filling
curve) keeps every file's bounding box small in ALL dimensions, so a
conjunctive range filter prunes most files regardless of which columns it
touches.  This is the same layout trick Delta/Iceberg expose as OPTIMIZE
ZORDER BY; here it's a plain DataFrame -> sorted parquet write.

The reference engine has no storage-layout surface (it re-reads flat CSV
per run, reference patternly/detection.py:241-268); this is first-class
pipeline infrastructure from the builder brief.

Everything is built-in column expressions (shift/and/aggregate) — the
z-value math stays inside whole-stage codegen, and the only wide exchange
is the one range-partitioning shuffle any clustered write needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_value", "normalize_to_bits", "zorder_write"]


def zorder_value(cols: list[Column | str], *, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative integer)
    column into a Morton code: bit ``b`` of column ``j`` lands at position
    ``len(cols)*b + j``.

    Inputs must already be small non-negative ints (use
    ``normalize_to_bits`` for raw/skewed columns).  ``len(cols)*bits`` must
    fit in a signed 64-bit long (<= 62).
    """
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits = {n * bits} > 62 interleaved bits")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    parts = []
    for bit in range(bits):
        for j, c in enumerate(cs):
            parts.append(F.shiftleft(F.shiftright(c.cast("long"), bit).bitwiseAND(F.lit(1)), n * bit + j))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def normalize_to_bits(c: Column | str, lo, hi, *, bits: int = 16) -> Column:
    """Affine-scale a numeric column from [lo, hi] onto [0, 2^bits - 1].

    ``lo``/``hi`` are plain scalars (one tiny min/max agg upstream — the
    caller computes them once, so the scaling itself is a pure map).
    Values outside [lo, hi] clamp.  floor() before the cast so the
    bucketing is reproducible across engines (casts round differently).
    """
    col = F.col(c) if isinstance(c, str) else c
    span = float(hi) - float(lo)
    top = float(2**bits - 1)
    scaled = F.floor((col.cast("double") - F.lit(float(lo))) * F.lit(top) / F.lit(span))
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(int(2**bits - 1))).cast("long")


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 16,
    num_files: int = 32,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> None:
    """Write ``df`` as parquet physically clustered on the Z-order curve
    over ``cols``.

    One pass: (optional) min/max agg for normalization bounds, then
    repartitionByRange on the z-value (range exchange = the one shuffle)
    + sortWithinPartitions so every output file covers a contiguous curve
    segment — small per-file bounding boxes in every dimension, which is
    exactly what footer-stats pruning needs.

    ``bounds``: per-column (lo, hi) to skip the min/max job (at 100 TB the
    caller usually knows domain bounds, or samples them).
    """
    if bounds is None:
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
        row = df.agg(*aggs).first()
        bounds = {c: (row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in cols}
    norm = [normalize_to_bits(c, *bounds[c], bits=bits) for c in cols]
    z = zorder_value(norm, bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
