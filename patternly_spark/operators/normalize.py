"""Per-group robust normalization: winsorization (quantile clipping).

Outlier clipping is a standard pre-training numeric hygiene pass (feature
columns, reward scores, document lengths).  The shape here is the 100 TB
one: ONE aggregation computes the per-group cut points (a tiny table — one
row per group), broadcast-joins back, and the clip itself is a pure map.

``exact=True`` uses interpolated ``percentile`` (hash-matches DuckDB's
``quantile_cont`` — the q15/q45 precedent) and is the oracle-parity mode;
``exact=False`` uses ``approx_percentile`` with pinned accuracy — the
mergeable-sketch scale default, same trade ``sketch_profile`` documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from patternly_spark.operators.sketches import APPROX_QUANTILE_ACCURACY

__all__ = ["winsorize"]


def winsorize(
    df: DataFrame,
    value_col: str,
    *,
    by: str | list[str] | None = None,
    lower: float = 0.05,
    upper: float = 0.95,
    exact: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """Clip ``value_col`` to its per-group [lower, upper] quantiles.

    Appends ``out_col`` (default ``<value_col>_w``); all input columns
    pass through.  Groups absent from ``by`` (global mode) clip against
    the whole-frame quantiles.
    """
    if not 0.0 <= lower <= upper <= 1.0:
        raise ValueError(f"need 0 <= lower <= upper <= 1, got [{lower}, {upper}]")
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    out_col = out_col or f"{value_col}_w"
    fn = "percentile" if exact else "approx_percentile"
    acc = "" if exact else f", {APPROX_QUANTILE_ACCURACY}"
    cuts_expr = F.expr(f"{fn}({value_col}, array({lower!r}, {upper!r}){acc})")
    grouped = df.groupBy(*keys) if keys else df.groupBy()
    cuts = grouped.agg(
        F.element_at(cuts_expr, 1).alias("__lo"),
        F.element_at(cuts_expr, 2).alias("__hi"),
    )
    joined = (
        df.join(F.broadcast(cuts), keys) if keys else df.crossJoin(F.broadcast(cuts))
    )
    clipped = F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi"))
    return joined.withColumn(out_col, clipped).drop("__lo", "__hi")
