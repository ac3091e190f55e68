"""Sketch-based data profiling: cardinalities and quantiles per group.

The 100 TB shape is the ``exact=False`` default: HyperLogLog++
(``approx_count_distinct``) and the GK-style quantile summary
(``approx_percentile``) are MERGEABLE, bounded-memory sketches — every
partition builds a kilobyte-scale summary and a single shuffle merges
them, regardless of group or corpus size.  Exact mode
(``count_distinct`` + interpolated ``percentile``) materializes whole
groups in an aggregation buffer — use it for small data or
oracle-parity checks only (same trade the complex quantizer documents
in ``functions/quantize.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: pinned accuracy for approx_percentile (1/accuracy relative rank error)
APPROX_QUANTILE_ACCURACY = 10_000
#: pinned relative standard deviation for approx_count_distinct
APPROX_DISTINCT_RSD = 0.02


def sketch_profile(
    df: DataFrame,
    *,
    by: str | list[str] | None = None,
    distinct_cols: list[str] | None = None,
    quantile_cols: list[str] | None = None,
    quantile_probs: list[float] = (0.5, 0.9, 0.99),
    exact: bool = False,
) -> DataFrame:
    """Per-group profile: row count, distinct count of each
    ``distinct_cols`` entry (``nd_<col>``), and the requested quantiles
    of each ``quantile_cols`` entry (``q<prob>_<col>``, prob in %).

    One aggregation pass — all sketches merge in the same shuffle.
    """
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    distinct_cols = list(distinct_cols or [])
    quantile_cols = list(quantile_cols or [])
    probs = list(quantile_probs)
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in distinct_cols:
        agg = (
            F.count_distinct(F.col(c))
            if exact
            else F.approx_count_distinct(c, APPROX_DISTINCT_RSD)
        )
        aggs.append(agg.cast("long").alias(f"nd_{c}"))
    arr = ", ".join(repr(float(p)) for p in probs)
    for c in quantile_cols:
        fn = "percentile" if exact else "approx_percentile"
        acc = "" if exact else f", {APPROX_QUANTILE_ACCURACY}"
        q = F.expr(f"{fn}({c}, array({arr}){acc})")
        for i, p in enumerate(probs):
            label = f"q{int(round(p * 100)):02d}_{c}"
            aggs.append(F.element_at(q, i + 1).cast("double").alias(label))
    grouped = df.groupBy(*keys) if keys else df.groupBy()
    return grouped.agg(*aggs)
