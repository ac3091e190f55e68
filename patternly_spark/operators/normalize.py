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

__all__ = ["winsorize", "mad_outliers"]


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


def mad_outliers(
    df: DataFrame,
    value_col: str,
    *,
    by: str | list[str] | None = None,
    k: float = 3.0,
    exact: bool = True,
) -> DataFrame:
    """Robust outlier flagging by median absolute deviation: flag rows
    where ``|x - median| > k * MAD`` within their group.

    Two tiny cut-point aggregations (median, then MAD — each one row per
    group) broadcast back; the flag itself is a pure map.  MAD is the
    breakdown-point-0.5 robust scale — unlike mean/stddev thresholds, a
    contaminated tail cannot drag the fence.  ``exact`` as in
    ``winsorize`` (interpolated percentile == DuckDB quantile_cont for
    the oracle; mergeable approx sketch at scale).

    Appends ``med``, ``mad``, ``is_outlier``; a zero-MAD group (>= half
    the values identical) flags exactly the non-median values iff k*0 <
    their deviation — i.e. every x != med.
    """
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    fn = "percentile" if exact else "approx_percentile"
    acc = "" if exact else f", {APPROX_QUANTILE_ACCURACY}"

    def _median_of(col_sql: str) -> F.Column:
        return F.expr(f"{fn}({col_sql}, 0.5{acc})")

    g1 = df.groupBy(*keys) if keys else df.groupBy()
    med = g1.agg(_median_of(value_col).alias("med"))
    with_med = df.join(F.broadcast(med), keys) if keys else df.crossJoin(F.broadcast(med))
    dev = with_med.withColumn("__dev", F.abs(F.col(value_col) - F.col("med")))
    g2 = dev.groupBy(*keys) if keys else dev.groupBy()
    mad = g2.agg(_median_of("__dev").alias("mad"))
    out = dev.join(F.broadcast(mad), keys) if keys else dev.crossJoin(F.broadcast(mad))
    return out.withColumn(
        "is_outlier", F.col("__dev") > F.lit(float(k)) * F.col("mad")
    ).drop("__dev")


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    *,
    by: str | list[str],
    id_col: str,
    grid_points: int = 100,
    exact: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """Map each group's value distribution onto the GLOBAL distribution
    — the cross-source score calibration step of mixture curation (a
    quality score of "p50 within src7" becomes the corpus-wide p50
    value, so thresholds mean the same thing in every source).

    Rank-based: within-group percent_rank (deterministic (value, id)
    total order), then linear interpolation into a broadcast
    ``grid_points``-point global quantile grid.  Every step is either
    integer-rank arithmetic or a fixed shape of correctly-rounded
    double ops, so an external SQL replica is bit-exact (``exact=True``
    uses interpolated ``percentile`` == DuckDB quantile_cont; the
    approx sketch is the at-scale default, same trade as
    ``sketch_profile``).

    Appends ``out_col`` (default ``<value_col>_qn``).  Single-member
    groups have percent_rank 0 and map to the global minimum — the
    standard convention.
    """
    from pyspark.sql import Window

    keys = [by] if isinstance(by, str) else list(by)
    out_col = out_col or f"{value_col}_qn"
    g = int(grid_points)
    probs = [i / g for i in range(g + 1)]
    fn = "percentile" if exact else "approx_percentile"
    acc = "" if exact else f", {APPROX_QUANTILE_ACCURACY}"
    arr = ", ".join(repr(float(p)) for p in probs)
    grid = df.select(
        F.expr(f"{fn}({value_col}, array({arr}){acc})").alias("__grid")
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    with_pr = df.withColumn("__pr", F.percent_rank().over(w))
    j = with_pr.crossJoin(F.broadcast(grid))
    idx = F.col("__pr") * F.lit(float(g))
    lo = F.floor(idx).cast("int")
    frac = idx - lo.cast("double")
    g_lo = F.element_at("__grid", lo + 1)
    g_hi = F.element_at("__grid", F.least(lo + 2, F.lit(g + 1)))
    mapped = F.when(lo >= g, F.element_at("__grid", g + 1)).otherwise(
        g_lo + frac * (g_hi - g_lo)
    )
    return j.withColumn(out_col, mapped).drop("__pr", "__grid")
