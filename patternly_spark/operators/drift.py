"""Distribution-drift monitoring: chi-squared and PSI of a categorical
column against a reference distribution, per group.

The monitoring question a 100 TB ingest pipeline asks every batch:
"does today's (this shard's / this crawl's) category mix still look
like the corpus I tuned my mixture weights on?"  Both statistics are
computed over the full (group x reference-category) grid — a missing
category is evidence of drift, not a join dropout.

Cross-engine determinism: every per-cell term is a fixed shape of
correctly-rounded double ops (products, one division, one ln), then
floor-quantized to a 2^-20 dyadic grid and summed as LONGS — integer
addition is associative, so the group sum is identical under ANY
partitioning or engine, and a SQL replica matches bit-for-bit (the same
trick the retrieval/LM operators use for ln).

Scale shape: one (group, cat) count shuffle over the data; the
reference and the group-total tables are category- and group-sized and
broadcast; the grid is |groups| x |ref cats| rows — never data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["categorical_drift"]

#: dyadic quantization grid for the summed statistic terms
DRIFT_SCALE = float(1 << 20)
#: probability clamp for PSI when a cell is empty (ln(0) guard)
PSI_EPS = 1e-6


def _qsum(term: F.Column) -> F.Column:
    """floor-quantize a double term to the 2^-20 grid as a long —
    summable exactly in any order."""
    return F.floor(term * F.lit(DRIFT_SCALE)).cast("long")


def categorical_drift(
    df: DataFrame,
    cat_col: str,
    *,
    by: str | list[str] | None = None,
    ref: DataFrame | None = None,
    psi_eps: float = PSI_EPS,
) -> DataFrame:
    """Per-group drift of ``cat_col`` against a reference distribution.

    ``ref``: (cat_col, ref_cnt long) reference counts.  ``None`` derives
    the reference from ``df`` itself (each group vs the global mix —
    the self-monitoring default).  Categories observed in a group but
    absent from the reference are NOT part of either statistic; their
    probability mass is reported as ``unseen_frac`` (at scale, a new
    category appearing is its own alert).

    Output per group: ``n`` (rows), ``chi2`` (Pearson statistic over
    the reference grid, quantized 2^-20), ``psi`` (population stability
    index, same grid, empty cells clamped to ``psi_eps``), and
    ``unseen_frac``.
    """
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    if ref is None:
        ref = df.groupBy(cat_col).agg(F.count(F.lit(1)).cast("long").alias("ref_cnt"))
    ref = ref.select(F.col(cat_col), F.col("ref_cnt").cast("long"))
    tot = ref.agg(F.sum("ref_cnt").cast("long").alias("ref_n"))
    refd = ref.crossJoin(F.broadcast(tot))

    obs = df.groupBy(*keys, cat_col).agg(F.count(F.lit(1)).cast("long").alias("obs"))
    grp = obs.groupBy(*keys).agg(F.sum("obs").cast("long").alias("n"))

    # full grid: every group x every reference category (missing -> 0).
    # Both cross-joined sides are bounded (1 row / |cats| rows) and the
    # obs side is |groups| x |cats| — every join here is broadcast-sized,
    # so the only data-sized shuffles in the whole operator are the two
    # count aggregations above.
    grid = (
        grp.crossJoin(F.broadcast(refd))
        .join(F.broadcast(obs), [*keys, cat_col], "left")
        .withColumn("obs", F.coalesce("obs", F.lit(0)).cast("long"))
    )
    o = F.col("obs").cast("double")
    n = F.col("n").cast("double")
    c = F.col("ref_cnt").cast("double")
    big_n = F.col("ref_n").cast("double")
    # chi2 cell: (obs - n*c/N)^2 / (n*c/N), algebraically lifted to
    # (obs*N - n*c)^2 / (n*c*N) — same fixed op shape in the SQL twin
    dev = o * big_n - n * c
    chi2_term = (dev * dev) / (n * c * big_n)
    p_obs = F.greatest(o / n, F.lit(float(psi_eps)))
    p_ref = c / big_n
    lnr = F.floor(F.log(p_obs / p_ref) * F.lit(DRIFT_SCALE)) / F.lit(DRIFT_SCALE)
    psi_term = ((o / n) - p_ref) * lnr

    stats = grid.groupBy(*keys, "n").agg(
        (F.sum(_qsum(chi2_term)).cast("double") / F.lit(DRIFT_SCALE)).alias("chi2"),
        (F.sum(_qsum(psi_term)).cast("double") / F.lit(DRIFT_SCALE)).alias("psi"),
        F.sum("obs").cast("long").alias("__seen"),
    )
    return stats.select(
        *keys,
        F.col("n"),
        "chi2",
        "psi",
        ((F.col("n") - F.col("__seen")).cast("double") / F.col("n").cast("double")).alias(
            "unseen_frac"
        ),
    )
