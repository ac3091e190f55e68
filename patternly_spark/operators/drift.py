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

from patternly_spark.plans import local_rows

__all__ = ["categorical_drift", "ks_drift", "linear_trend", "cusum", "pairwise_correlation"]

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


def ks_drift(
    df: DataFrame,
    value_col: str,
    *,
    by: str | list[str] | None = None,
    ref: DataFrame | None = None,
) -> DataFrame:
    """Numeric drift per group: the exact two-sample Kolmogorov-Smirnov
    distance between each group's ``value_col`` sample and a reference
    sample — the companion of ``categorical_drift`` for continuous
    columns (score shifts, length distributions, embedding norms).

    ``ref``: a one-column reference sample.  ``None`` uses the whole of
    ``df`` (each group vs the global distribution).  The reference is
    BROADCAST against the group list, so it must be bounded — at corpus
    scale feed a deterministic ``hash_sample`` of the reference, not
    the reference itself (the KS statistic of a 100k-point sample is
    within ~0.01 of the full-population statistic w.h.p.).

    Exact, not binned: both empirical CDFs are evaluated at every
    distinct value of the pooled sample via integer cumulative counts
    (one per-group sort window), so the statistic is
    partition-invariant and an external SQL engine reproduces it
    bit-for-bit.  Output: (keys..., n_obs bigint, n_ref bigint,
    ks double).
    """
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    if ref is None:
        ref = df.select(value_col)
    refv = ref.select(F.col(value_col).cast("double").alias("__v"))

    obs = df.select(
        *keys, F.col(value_col).cast("double").alias("__v"),
        F.lit(1).alias("__o"), F.lit(0).alias("__r"),
    )
    groups = df.select(*keys).distinct()
    refs = groups.crossJoin(F.broadcast(refv)).select(
        *keys, "__v", F.lit(0).alias("__o"), F.lit(1).alias("__r")
    )
    per_val = (
        obs.unionByName(refs)
        .groupBy(*keys, "__v")
        .agg(F.sum("__o").alias("__oc"), F.sum("__r").alias("__rc"))
    )
    from pyspark.sql import Window

    win = (
        Window.partitionBy(*keys)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(*keys)
    cum = per_val.select(
        *keys,
        F.sum("__oc").over(win).alias("__co"),
        F.sum("__rc").over(win).alias("__cr"),
        F.sum("__oc").over(tot).alias("n_obs"),
        F.sum("__rc").over(tot).alias("n_ref"),
    )
    d = F.abs(
        F.col("__co").cast("double") / F.col("n_obs").cast("double")
        - F.col("__cr").cast("double") / F.col("n_ref").cast("double")
    )
    return (
        cum.groupBy(*keys, "n_obs", "n_ref")
        .agg(F.max(d).alias("ks"))
        .select(*keys, F.col("n_obs").cast("long"), F.col("n_ref").cast("long"), "ks")
    )


def linear_trend(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    by: str | list[str] | None = None,
    bits: int = 20,
) -> DataFrame:
    """Per-group least-squares trend of ``y_col`` against ``x_col`` —
    the "is this metric drifting over time" primitive that complements
    the distributional monitors (chi2/PSI/KS tell you THAT a window
    differs; the trend tells you which way a level is moving).

    Exactness: both inputs are floor-quantized to the 2^-bits dyadic
    grid as integers; S_x/S_y sum as longs and S_xy/S_xx as
    2^-2bits-scaled integer products in DECIMAL (order-invariant), then
    one fixed sequence of double ops yields slope (per unit x) and
    intercept — identical under any partitioning/engine.

    Scale shape: ONE grouped aggregation over the data (partial
    aggregation collapses map-side); no window, no sort, no join.
    Degenerate groups (n < 2 or zero x-variance) return null slope.

    Output: (keys..., n, slope, intercept).
    """
    scale = float(1 << int(bits))
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    x = F.floor(F.col(x_col).cast("double") * F.lit(scale)).cast("long")
    y = F.floor(F.col(y_col).cast("double") * F.lit(scale)).cast("long")
    pts = df.select(*keys, x.alias("__x"), y.alias("__y"))
    agg = pts.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").cast("long").alias("__sx"),
        F.sum("__y").cast("long").alias("__sy"),
        # multiply as DECIMAL, not long: quantized values of large-
        # magnitude regressors (e.g. epoch hours) overflow a long
        # product; decimal(19,0) x decimal(19,0) is exact to 38 digits
        F.sum(F.col("__x").cast("decimal(19,0)") * F.col("__y").cast("decimal(19,0)")).alias("__sxy"),
        F.sum(F.col("__x").cast("decimal(19,0)") * F.col("__x").cast("decimal(19,0)")).alias("__sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    det = n * sxx - sx * sx
    slope = F.when(det != 0.0, (n * sxy - sx * sy) / det)
    intercept = F.when(
        det != 0.0, (sy / F.lit(scale) - slope * (sx / F.lit(scale))) / n
    )
    return agg.select(
        *keys, "n", slope.alias("slope"), intercept.alias("intercept")
    )


def cusum(
    df: DataFrame,
    value_col: str,
    *,
    by: str | list[str],
    order_col: str | list[str],
    target: float,
    slack: float = 0.5,
    threshold: float = 5.0,
    init: DataFrame | None = None,
    broadcast_init: bool = True,
) -> DataFrame:
    """Per-key CUSUM changepoint monitor (Page 1954): the classic
    sequential statistic for detecting a small persistent mean shift
    that no single-point outlier rule sees —

        hi_t = max(0, hi_{t-1} + (x_t - target - slack))
        lo_t = max(0, lo_{t-1} - (x_t - target + slack))

    with an alarm when either side exceeds ``threshold``.  Completes
    the monitoring family: MAD flags single spikes, KS/chi2 flag
    distribution changes between windows, the trend fits a direction,
    CUSUM catches slow drifts AS THEY ACCUMULATE.

    Like ``ema``, inherently sequential: one deterministic fold per key
    (collect sorted, fold, re-explode — per-key-bounded contract).
    With dyadic ``target``/``slack`` the IEEE recurrence replays
    exactly in a recursive CTE.

    ``init``: optional (keys..., cusum_hi, cusum_lo) carried-in state —
    a key present there continues its accumulation instead of starting
    at zero (the streaming twin's registry hook; the seed rides as
    acc[0] and is sliced off).  Broadcast by default.

    Output: (keys..., order cols..., value, cusum_hi, cusum_lo, alarm).
    """
    keys = [by] if isinstance(by, str) else list(by)
    order = [order_col] if isinstance(order_col, str) else list(order_col)
    t, k, h = float(target), float(slack), float(threshold)

    row = F.struct(*[F.col(c) for c in order], F.col(value_col).cast("double").alias("__v"))
    seqs = df.groupBy(*keys).agg(F.array_sort(F.collect_list(row)).alias("__xs"))
    if init is not None:
        seed = init.select(
            *[F.col(c) for c in keys],
            F.struct(
                F.col("cusum_hi").cast("double").alias("hi"),
                F.col("cusum_lo").cast("double").alias("lo"),
            ).alias("__seed"),
        )
        seqs = seqs.join(F.broadcast(seed) if broadcast_init else seed, keys, "left")
    else:
        seqs = seqs.withColumn(
            "__seed", F.lit(None).cast("struct<hi:double,lo:double>")
        )
    folded = F.aggregate(
        F.col("__xs"),
        F.when(F.col("__seed").isNotNull(), F.array(F.col("__seed")))
        .otherwise(F.array().cast("array<struct<hi:double,lo:double>>")),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.struct(
                    F.greatest(
                        F.lit(0.0),
                        F.coalesce(F.try_element_at(acc, F.lit(-1))["hi"], F.lit(0.0))
                        + (x["__v"] - F.lit(t) - F.lit(k)),
                    ).alias("hi"),
                    F.greatest(
                        F.lit(0.0),
                        F.coalesce(F.try_element_at(acc, F.lit(-1))["lo"], F.lit(0.0))
                        - (x["__v"] - F.lit(t) + F.lit(k)),
                    ).alias("lo"),
                )
            ),
        ),
    )
    folded = F.when(
        F.col("__seed").isNotNull(), F.slice(folded, 2, F.size("__xs"))
    ).otherwise(folded)
    zipped = seqs.select(
        *keys, F.posexplode(F.arrays_zip("__xs", folded.alias("__c"))).alias("__i", "__z")
    )
    hi, lo = F.col("__z.__c.hi"), F.col("__z.__c.lo")
    return zipped.select(
        *keys,
        *[F.col(f"__z.__xs.{c}").alias(c) for c in order],
        F.col("__z.__xs.__v").alias("value"),
        hi.alias("cusum_hi"),
        lo.alias("cusum_lo"),
        ((hi > F.lit(h)) | (lo > F.lit(h))).alias("alarm"),
    )


def pairwise_correlation(
    df: DataFrame,
    series_col: str,
    key_col: str,
    value_col: str,
    *,
    bits: int = 20,
) -> DataFrame:
    """Pearson correlation between every pair of series over their
    SHARED keys — the multivariate layer of the monitoring family
    ("error rate rises when purchases fall" is a correlation question,
    not a per-metric one).  Input is long-form (series, key, value),
    e.g. hourly rollups per event type keyed by the hour bucket.

    Exactness: values floor-quantize to the 2^-bits grid; per-pair
    sums are longs/DECIMAL products (order-invariant), finished by one
    fixed double-op sequence — identical under any partitioning and
    replayable in SQL.  Pairs with fewer than 2 shared keys or zero
    variance on either side return null.

    Scale shape: the self-join is on ``key_col`` (the time bucket —
    data-sized but co-partitioned), producing |pairs| x |shared keys|
    rows before ONE grouped aggregation; with rolled-up inputs (series
    x buckets, not raw events) this is dashboard-sized.  Emits each
    unordered pair once (a < b).

    Output: (series_a, series_b, n, corr).
    """
    scale = float(1 << int(bits))
    q = F.floor(F.col(value_col).cast("double") * F.lit(scale)).cast("long")
    base = df.select(F.col(series_col).alias("__s"), F.col(key_col).alias("__k"), q.alias("__q"))
    a = base.select(F.col("__s").alias("series_a"), "__k", F.col("__q").alias("__x"))
    b = base.select(F.col("__s").alias("series_b"), "__k", F.col("__q").alias("__y"))
    pairs = a.join(b, "__k").filter(F.col("series_a") < F.col("series_b"))
    d19 = lambda c: F.col(c).cast("decimal(19,0)")
    agg = pairs.groupBy("series_a", "series_b").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x").cast("long").alias("__sx"),
        F.sum("__y").cast("long").alias("__sy"),
        F.sum(d19("__x") * d19("__y")).alias("__sxy"),
        F.sum(d19("__x") * d19("__x")).alias("__sxx"),
        F.sum(d19("__y") * d19("__y")).alias("__syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    sxy, sxx, syy = (
        F.col("__sxy").cast("double"),
        F.col("__sxx").cast("double"),
        F.col("__syy").cast("double"),
    )
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    corr = F.when(
        (F.col("n") >= 2) & (vx > 0.0) & (vy > 0.0),
        (n * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy)),
    )
    return agg.select("series_a", "series_b", "n", corr.alias("corr"))


def idf_snapshot_drift(
    old_snap: DataFrame,
    new_snap: DataFrame,
    *,
    min_df: int = 5,
    rate_change_threshold: float = 2.0,
) -> DataFrame:
    """Vocabulary drift between two ``build_idf_snapshot`` relations —
    the decision input for the frozen-IDF registry's rebuild-or-keep
    question (ST24): a term whose document-frequency RATE (df/N) moved
    by more than ``rate_change_threshold``x in either direction, or
    that appeared/vanished above ``min_df``, is evidence the frozen
    weights no longer describe the stream.

    Full outer join on term (vocabulary-scale, keyed); rates are one
    division each; the change ratio is max(rate_new/rate_old,
    rate_old/rate_new) with absent sides treated as rate 0 (ratio
    infinite -> status new/vanished instead).  Integer dfs + two
    divisions: engine-exact.

    Output: (term, df_old, df_new, rate_old, rate_new, status) where
    status in ('new', 'vanished', 'mover', 'stable'); rows below
    ``min_df`` on BOTH sides are dropped (noise floor).
    """
    o = old_snap.select(
        "term",
        F.col("df").alias("df_old"),
        F.col("n_docs").alias("n_old"),
    )
    n = new_snap.select(
        "term",
        F.col("df").alias("df_new"),
        F.col("n_docs").alias("n_new"),
    )
    joined = o.join(n, "term", "full_outer")
    # corpus sizes are constant columns; recover them from any row via
    # 1-row aggregates folded back in (broadcast)
    totals = joined.agg(
        F.max("n_old").alias("__no"), F.max("n_new").alias("__nn")
    )
    j = joined.crossJoin(F.broadcast(totals))
    df_o = F.coalesce(F.col("df_old"), F.lit(0)).cast("long")
    df_n = F.coalesce(F.col("df_new"), F.lit(0)).cast("long")
    rate_o = df_o.cast("double") / F.col("__no").cast("double")
    rate_n = df_n.cast("double") / F.col("__nn").cast("double")
    ratio = F.greatest(rate_n / rate_o, rate_o / rate_n)
    status = (
        F.when((df_o == 0) & (df_n >= int(min_df)), F.lit("new"))
        .when((df_n == 0) & (df_o >= int(min_df)), F.lit("vanished"))
        .when(
            (df_o > 0) & (df_n > 0) & (ratio > F.lit(float(rate_change_threshold))),
            F.lit("mover"),
        )
        .otherwise(F.lit("stable"))
    )
    return (
        j.filter((df_o >= int(min_df)) | (df_n >= int(min_df)))
        .select(
            "term",
            df_o.alias("df_old"),
            df_n.alias("df_new"),
            rate_o.alias("rate_old"),
            rate_n.alias("rate_new"),
            status.alias("status"),
        )
    )


def proportion_ztest(
    df: DataFrame,
    *,
    group_cols: list[str],
    variant_col: str,
    success_col: str,
    control: str,
    treatment: str,
) -> DataFrame:
    """Two-proportion z-test per experiment group — the A/B lift table:
    for each group, conversion rates of treatment vs control, absolute
    lift, and the pooled-variance z statistic
    z = (p_t - p_c) / sqrt(p_pool (1-p_pool) (1/n_c + 1/n_t)).

    One aggregation pass (conditional integer sums per group); the
    statistic is integer counts + a fixed chain of IEEE ops — engine
    exact.  Groups missing either arm (or with zero pooled variance:
    all-success/all-failure both arms) report z NULL rather than a
    division artifact.

    Output: (group_cols..., n_control, conv_control, n_treatment,
    conv_treatment, rate_control, rate_treatment, lift, z).
    """
    v = F.col(variant_col)
    s = F.col(success_col).cast("int")
    agg = df.groupBy(*group_cols).agg(
        F.sum(F.when(v == control, 1).otherwise(0)).cast("long").alias("n_c"),
        F.sum(F.when(v == control, s).otherwise(0)).cast("long").alias("x_c"),
        F.sum(F.when(v == treatment, 1).otherwise(0)).cast("long").alias("n_t"),
        F.sum(F.when(v == treatment, s).otherwise(0)).cast("long").alias("x_t"),
    )
    p_c = F.col("x_c").cast("double") / F.col("n_c").cast("double")
    p_t = F.col("x_t").cast("double") / F.col("n_t").cast("double")
    p_pool = (F.col("x_c") + F.col("x_t")).cast("double") / (
        F.col("n_c") + F.col("n_t")
    ).cast("double")
    var = (
        p_pool
        * (F.lit(1.0) - p_pool)
        * (
            F.lit(1.0) / F.col("n_c").cast("double")
            + F.lit(1.0) / F.col("n_t").cast("double")
        )
    )
    z = F.when(
        (F.col("n_c") > 0) & (F.col("n_t") > 0) & (var > 0),
        (p_t - p_c) / F.sqrt(var),
    )
    return agg.select(
        *group_cols,
        F.col("n_c").alias("n_control"),
        F.col("x_c").alias("conv_control"),
        F.col("n_t").alias("n_treatment"),
        F.col("x_t").alias("conv_treatment"),
        F.when(F.col("n_c") > 0, p_c).alias("rate_control"),
        F.when(F.col("n_t") > 0, p_t).alias("rate_treatment"),
        F.when((F.col("n_c") > 0) & (F.col("n_t") > 0), p_t - p_c).alias("lift"),
        z.alias("z"),
    )


def theil_sen_trend(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    max_points: int = 2000,
) -> DataFrame:
    """Theil-Sen robust trend per group: slope = exact MEDIAN of all
    pairwise slopes (y_j - y_i)/(x_j - x_i) over x_i < x_j, intercept =
    exact median of per-point residuals y_i - slope * x_i.  Breakdown
    point ~29% — the trend estimator that shrugs off the outlier days a
    least-squares ``linear_trend`` chases.

    Input is pre-aggregated per (group, x) — duplicate x within a group
    are averaged first (sum/count, one division), so the pair set is
    well-defined and the estimator deterministic.

    Exactness: medians are RANK-selected (sort by value with a total
    tie-break), not interpolated beyond the even-case mean of the two
    middles — one addition + one division, identical in any engine.
    Every slope is one subtraction-division of doubles; no
    accumulation-order dependence anywhere, so a plain-SQL oracle
    replays bit-for-bit.

    Scale: pairs are O(n^2) per group BY DESIGN (the estimator's
    definition); ``max_points`` guards the fan-out — a group wider than
    that raises rather than silently exploding (pre-bucket x, e.g.
    daily means, to stay under it; 2000 points = 2M pairs per group,
    one task's work).  The pair join shuffles once on the group key.

    Output: (group_cols..., n_points, n_pairs, slope, intercept).
    """
    from pyspark.sql import Window

    gcols = list(group_cols or [])
    pts = df.groupBy(*gcols, F.col(x_col).cast("double").alias("__x")).agg(
        (F.sum(F.col(y_col).cast("double")) / F.count(F.lit(1))).alias("__y")
    )
    cnt = pts.groupBy(*gcols).agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    over = cnt.filter(F.col("n_points") > int(max_points)).limit(1).collect()
    if over:
        raise ValueError(
            f"theil_sen_trend: a group has {over[0]['n_points']} distinct x "
            f"> max_points={max_points}; pre-bucket x (e.g. daily means) "
            "before calling"
        )
    a = pts.select(*gcols, F.col("__x").alias("__xa"), F.col("__y").alias("__ya"))
    b = pts.select(*gcols, F.col("__x").alias("__xb"), F.col("__y").alias("__yb"))
    on = [a[g] == b[g] for g in gcols] if gcols else [F.lit(True)]
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    pairs = a.join(b, cond & (a["__xa"] < b["__xb"])).select(
        *[a[g] for g in gcols],
        (
            (F.col("__yb") - F.col("__ya")) / (F.col("__xb") - F.col("__xa"))
        ).alias("__s"),
    )

    def _median(rel: DataFrame, val: str, out: str) -> DataFrame:
        w = Window.partitionBy(*gcols).orderBy(F.col(val), F.monotonically_increasing_id()) \
            if gcols else Window.orderBy(F.col(val), F.monotonically_increasing_id())
        wc = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
        r = rel.withColumn("__r", F.row_number().over(w)).withColumn(
            "__n", F.count(F.lit(1)).over(wc)
        )
        lo = (F.col("__n") + 1) / 2
        hi = (F.col("__n") + 2) / 2
        mid = r.filter(
            (F.col("__r") == F.floor(lo)) | (F.col("__r") == F.floor(hi))
        )
        return mid.groupBy(*gcols).agg(
            (F.sum(val) / F.count(F.lit(1))).alias(out),
            F.max("__n").alias("__cnt"),
        )

    slopes = _median(pairs, "__s", "slope")
    if gcols:
        resid = pts.join(F.broadcast(slopes.select(*gcols, "slope")), gcols)
    else:
        resid = pts.crossJoin(F.broadcast(slopes.select("slope")))
    resid = resid.select(
        *gcols, (F.col("__y") - F.col("slope") * F.col("__x")).alias("__res")
    )
    inter = _median(resid, "__res", "intercept").select(*gcols, "intercept") \
        if gcols else _median(resid, "__res", "intercept").select("intercept")
    out = cnt.join(slopes.select(*gcols, "slope", F.col("__cnt").alias("n_pairs")), gcols) \
        if gcols else cnt.crossJoin(slopes.select("slope", F.col("__cnt").alias("n_pairs")))
    out = out.join(inter, gcols) if gcols else out.crossJoin(inter)
    return out.select(*gcols, "n_points", "n_pairs", "slope", "intercept")


def mutual_information(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    units: int = 1 << 20,
) -> DataFrame:
    """Mutual information (nats) between two categorical columns per
    group, with marginal entropies and normalized MI — the
    feature-association audit ("does `source` leak `lang`?"; "is this
    metadata column informative or redundant?") a curation pipeline
    runs before trusting a stratification key:

        MI  = sum_{x,y} p_xy * ln( p_xy / (p_x * p_y) )
        NMI = MI / sqrt(H(X) * H(Y))

    Exactness: the joint/marginal counts are integers; each cell's ln
    argument is ONE integer-numerator double division, the ln is
    floor-quantized to ``units`` (2^-20), the p_xy weight is one more
    division, and the weighted term is floor-quantized AGAIN before
    the cross-cell sum — order-free integer addition, the
    categorical_drift convention, so MI/H/NMI replay in SQL exactly.
    Quantization bias is < |cells| * 2^-20 nats, documented not hidden.

    Shape: one (group, x, y) count shuffle (the contingency table —
    cells-sized, never data-sized), marginals as two window sums over
    it, one group aggregate.  No UDFs.

    Output: (group_cols..., n, cells, mi, h_x, h_y, nmi); NMI is NULL
    when either marginal entropy is 0 (a constant column carries no
    information to normalize by).
    """
    from pyspark.sql import Window

    gcols = list(group_cols or [])
    u = int(units)
    fu = F.lit(float(u))
    joint = df.groupBy(
        *gcols, F.col(x_col).alias("__x"), F.col(y_col).alias("__y")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    wg = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    wx = (
        Window.partitionBy(*gcols, "__x") if gcols else Window.partitionBy("__x")
    )
    wy = (
        Window.partitionBy(*gcols, "__y") if gcols else Window.partitionBy("__y")
    )
    cells = (
        joint.withColumn("n", F.sum("c").over(wg))
        .withColumn("cx", F.sum("c").over(wx))
        .withColumn("cy", F.sum("c").over(wy))
    )

    def qterm(weight_num: F.Column, ln_num: F.Column, ln_den: F.Column) -> F.Column:
        """floor( (w/n) * (floor(ln(num/den)*u)/u) * u ) as long."""
        lnq = (
            F.floor(
                F.log(ln_num.cast("double") / ln_den.cast("double")) * fu
            )
            / fu
        )
        return F.floor(
            weight_num.cast("double") / F.col("n").cast("double") * lnq * fu
        ).cast("long")

    mi_u = qterm(F.col("c"), F.col("c") * F.col("n"), F.col("cx") * F.col("cy"))
    # entropies over the joint relation: weight each cell by c/n and
    # ln(n/marginal); summing cells of the same x repeats the same
    # quantized ln — identical to summing the marginal directly only up
    # to quantization of the weight, so quantize per CELL in both engines
    hx_u = qterm(F.col("c"), F.col("n"), F.col("cx"))
    hy_u = qterm(F.col("c"), F.col("n"), F.col("cy"))
    agg = cells.groupBy(*gcols).agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("long").alias("cells"),
        F.sum(mi_u).cast("long").alias("__mi_u"),
        F.sum(hx_u).cast("long").alias("__hx_u"),
        F.sum(hy_u).cast("long").alias("__hy_u"),
    )
    mi = F.col("__mi_u").cast("double") / fu
    hx = F.col("__hx_u").cast("double") / fu
    hy = F.col("__hy_u").cast("double") / fu
    return agg.select(
        *gcols,
        "n",
        "cells",
        mi.alias("mi"),
        hx.alias("h_x"),
        hy.alias("h_y"),
        F.when((hx > 0) & (hy > 0), mi / F.sqrt(hx * hy)).alias("nmi"),
    )


def bh_fdr(
    df: DataFrame,
    *,
    p_col: str,
    id_cols: list[str],
    group_cols: list[str] | None = None,
    fdr_q: float = 0.05,
) -> DataFrame:
    """Benjamini-Hochberg false-discovery-rate control per group — the
    multiple-testing gate a metrics platform needs the moment it runs
    hundreds of q204-style tests at once (at q=0.05, ~5% of null tests
    "fire" by luck; BH caps the expected FALSE fraction of the
    discoveries instead):

        sort p ascending; threshold = max p_(k) with p_(k) <= k*q/m;
        reject every test with p <= threshold.

    The reject set depends only on the threshold VALUE, so tied
    p-values are handled deterministically regardless of rank
    tie-breaks.  Exactness: ranks/counts are integers, each critical
    value k*q/m is one fixed double chain, comparisons replay in SQL.

    Shape: one (group) sort window + one group-max window over the
    qualifying rows; never data-sized beyond the test table itself
    (tests are aggregates upstream — thousands, not billions).

    Output: (group_cols..., id_cols..., p, rank, m_tests, bh_critical,
    reject).
    """
    from pyspark.sql import Window

    gcols = list(group_cols or [])
    ids = list(id_cols)
    qv = float(fdr_q)
    w = (
        Window.partitionBy(*gcols).orderBy(F.col(p_col).asc(), *[F.col(c) for c in ids])
        if gcols
        else Window.orderBy(F.col(p_col).asc(), *[F.col(c) for c in ids])
    )
    wg = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    ranked = df.select(
        *gcols,
        *ids,
        F.col(p_col).cast("double").alias("p"),
    ).withColumn("rank", F.row_number().over(w)).withColumn(
        "m_tests", F.count(F.lit(1)).over(wg).cast("long")
    )
    crit = (
        F.col("rank").cast("double") * F.lit(qv) / F.col("m_tests").cast("double")
    )
    ranked = ranked.withColumn("bh_critical", crit)
    thr = F.max(
        F.when(F.col("p") <= F.col("bh_critical"), F.col("p"))
    ).over(wg)
    return ranked.withColumn(
        "reject", thr.isNotNull() & (F.col("p") <= thr)
    ).select(
        *gcols, *ids, "p", F.col("rank").cast("long").alias("rank"),
        "m_tests", "bh_critical", "reject",
    )


def robust_means(
    df: DataFrame,
    *,
    value_cents_col: str,
    group_cols: list[str] | None = None,
    trim: float = 0.1,
) -> DataFrame:
    """Trimmed and winsorized means per group — the outlier-resistant
    central-tendency pair (a mean that one fat-finger order can't move)
    to sit beside q66's MAD fences:

      trimmed    : drop the k = floor(trim * n) lowest- and highest-
                   RANKED values, mean the middle n - 2k;
      winsorized : clamp the bottom k values up to the (k+1)-th and the
                   top k down to the (n-k)-th, mean all n.

    Exactness: input is INTEGER cents (the q186 convention — the caller
    casts money through DECIMAL once); ranks, sums and clamps are then
    pure integer arithmetic and each mean is ONE division — engine-
    exact, order-free.  Groups with n - 2k < 1 report NULL robust means
    (over-trimmed), never a division artifact.

    Shape: one rank window + one group aggregate over the data; no
    second pass (the clamp values ride along as group-window maxima of
    rank-gated columns).

    Output: (group_cols..., n, k_trimmed, mean, trimmed_mean,
    winsorized_mean).
    """
    from pyspark.sql import Window

    gcols = list(group_cols or [])
    t = float(trim)
    if not 0.0 <= t < 0.5:
        raise ValueError("trim in [0, 0.5)")
    base = df.select(*gcols, F.col(value_cents_col).cast("long").alias("__v"))
    w = (
        Window.partitionBy(*gcols).orderBy(
            F.col("__v").asc(), F.monotonically_increasing_id()
        )
        if gcols
        else Window.orderBy(F.col("__v").asc(), F.monotonically_increasing_id())
    )
    wg = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    ranked = base.withColumn("__r", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(wg)
    )
    k = F.floor(F.lit(t) * F.col("__n").cast("double")).cast("long")
    ranked = ranked.withColumn("__k", k)
    lo_clamp = F.max(
        F.when(F.col("__r") == F.col("__k") + 1, F.col("__v"))
    ).over(wg)
    hi_clamp = F.max(
        F.when(F.col("__r") == F.col("__n") - F.col("__k"), F.col("__v"))
    ).over(wg)
    mid = (F.col("__r") > F.col("__k")) & (
        F.col("__r") <= F.col("__n") - F.col("__k")
    )
    # windowed clamp values must be materialized BEFORE the aggregate
    # (window-inside-aggregate is illegal)
    staged = ranked.withColumn(
        "__wins",
        F.when(F.col("__r") <= F.col("__k"), lo_clamp)
        .when(F.col("__r") > F.col("__n") - F.col("__k"), hi_clamp)
        .otherwise(F.col("__v")),
    ).withColumn("__mid", mid)
    agg = staged.groupBy(*gcols).agg(
        F.max("__n").cast("long").alias("n"),
        F.max("__k").cast("long").alias("k_trimmed"),
        F.sum("__v").cast("long").alias("__s"),
        F.sum(F.when(F.col("__mid"), F.col("__v"))).cast("long").alias("__st"),
        F.sum(F.when(F.col("__mid"), 1).otherwise(0)).cast("long").alias("__nt"),
        F.sum("__wins").cast("long").alias("__sw"),
    )
    return agg.select(
        *gcols,
        "n",
        "k_trimmed",
        (F.col("__s").cast("double") / F.col("n").cast("double")).alias("mean"),
        F.when(
            F.col("__nt") > 0,
            F.col("__st").cast("double") / F.col("__nt").cast("double"),
        ).alias("trimmed_mean"),
        F.when(
            F.col("__nt") > 0,
            F.col("__sw").cast("double") / F.col("n").cast("double"),
        ).alias("winsorized_mean"),
    )


def sprt_test(
    df: DataFrame,
    *,
    ts_col: str,
    outcome_col: str,
    group_cols: list[str] | None = None,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.05,
    units: int = 1 << 20,
) -> DataFrame:
    """Wald's Sequential Probability Ratio Test per group — the
    peeking-safe A/B monitor (q204's z-test is only valid at a FIXED n;
    SPRT is the test you may legally check after every observation):
    Bernoulli H0: p = p0 vs H1: p = p1, decide H1 when the
    log-likelihood ratio crosses ln((1-beta)/alpha), H0 when it falls
    below ln(beta/(1-alpha)).

    Exactness: the TWO per-observation increments ln(p1/p0) and
    ln((1-p1)/(1-p0)) and both thresholds are Python-computed double
    literals floor-quantized to ``units`` once — every observation then
    adds an INTEGER, the LLR path is one cumulative window sum, and the
    first-crossing row is rank arithmetic.  Plain SQL replays the whole
    walk.

    Shape: one (group) sort window over the observations + one group
    aggregate.  Output: one row per group — (group_cols..., n_obs,
    decision 'accept_h1'|'accept_h0'|'continue', n_at_decision,
    llr_final, llr_at_decision) with llr columns in nats (units
    de-scaled).
    """
    import math

    from pyspark.sql import Window

    gcols = list(group_cols or [])
    u = int(units)
    if not (0.0 < p0 < 1.0 and 0.0 < p1 < 1.0 and p0 != p1):
        raise ValueError("p0, p1 in (0,1), p0 != p1")
    inc1 = math.floor(math.log(p1 / p0) * u)
    inc0 = math.floor(math.log((1.0 - p1) / (1.0 - p0)) * u)
    hi = math.floor(math.log((1.0 - beta) / alpha) * u)
    lo = math.floor(math.log(beta / (1.0 - alpha)) * u)

    # total order (ts, outcome): rows equal in BOTH are interchangeable
    # (identical increment), so the LLR path is partition-invariant
    w = (
        Window.partitionBy(*gcols).orderBy(F.col(ts_col), F.col(outcome_col))
        if gcols
        else Window.orderBy(F.col(ts_col), F.col(outcome_col))
    )
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    inc = F.when(
        F.col(outcome_col).cast("int") == 1, F.lit(inc1)
    ).otherwise(F.lit(inc0)).cast("long")
    walk = df.select(*gcols, F.col(ts_col), F.col(outcome_col)).withColumn(
        "__llr", F.sum(inc).over(wc)
    ).withColumn("__r", F.row_number().over(w))
    crossed = F.when(F.col("__llr") >= hi, F.lit("accept_h1")).when(
        F.col("__llr") <= lo, F.lit("accept_h0")
    )
    walk = walk.withColumn("__dec", crossed)
    agg = walk.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.min(
            F.when(F.col("__dec").isNotNull(), F.struct("__r", "__dec", "__llr"))
        ).alias("__firstrow"),
        F.max(F.struct("__r", F.col("__llr").alias("l"))).alias("__last"),
    )
    return agg.select(
        *gcols,
        "n_obs",
        F.coalesce(F.col("__firstrow.__dec"), F.lit("continue")).alias(
            "decision"
        ),
        F.col("__firstrow.__r").alias("n_at_decision"),
        (F.col("__last.l").cast("double") / F.lit(float(u))).alias("llr_final"),
        (F.col("__firstrow.__llr").cast("double") / F.lit(float(u))).alias(
            "llr_at_decision"
        ),
    )


def weighted_median(
    df: DataFrame,
    *,
    value_col: str,
    weight_col: str,
    group_cols: list[str] | None = None,
    check_weights: bool = True,
) -> DataFrame:
    """Exact lower weighted median per group: the smallest value whose
    cumulative INTEGER weight reaches ceil(total/2) — the
    revenue-weighted latency / size-weighted price statistic where each
    row counts ``weight`` times (a plain median of an exploded relation,
    without exploding it).

    Deterministic by the integer threshold rule (no interpolation —
    the "lower median", total-order stable under ties); one (group)
    value-sort window over the AGGREGATED (group, value) relation, so
    work is distinct-values-sized after the first shuffle.  Rows with
    non-positive weights are rejected (raise) — a silent drop would
    bias the statistic; the probe is one pushed-filter scan, skip it
    with ``check_weights=False`` when weights are validated upstream.

    Output: (group_cols..., n_values, total_weight, weighted_median).
    """
    from pyspark.sql import Window

    gcols = list(group_cols or [])
    if check_weights:
        # an eager existence probe — one pushed-filter scan; at corpus
        # scale pass check_weights=False and validate upstream instead
        bad = df.filter(F.col(weight_col).cast("long") <= 0).limit(1).collect()
        if bad:
            raise ValueError("weighted_median: non-positive weight present")
    grid = df.groupBy(*gcols, F.col(value_col).cast("double").alias("__v")).agg(
        F.sum(F.col(weight_col).cast("long")).cast("long").alias("__w")
    )
    w = (
        Window.partitionBy(*gcols).orderBy("__v")
        if gcols
        else Window.orderBy("__v")
    )
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wg = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    cum = grid.withColumn("__cw", F.sum("__w").over(wc)).withColumn(
        "__tot", F.sum("__w").over(wg)
    ).withColumn("__nv", F.count(F.lit(1)).over(wg))
    thr = F.floor((F.col("__tot") + 1) / 2).cast("long")
    hit = cum.filter(F.col("__cw") >= thr)
    return (
        hit.groupBy(*gcols)
        .agg(
            F.max("__nv").cast("long").alias("n_values"),
            F.max("__tot").cast("long").alias("total_weight"),
            F.min("__v").alias("weighted_median"),
        )
    )


def cuped_adjustment(
    df: DataFrame,
    *,
    metric_cents_col: str,
    covariate_cents_col: str,
    arm_col: str,
) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013) — the experimentation
    -platform standard that q204's raw z-test leaves on the table: use
    each unit's PRE-period covariate x to cancel between-user variance
    in the post-period metric y,

        theta  = cov(x, y) / var(x)          (POOLED across arms)
        adj(y) = y - theta * (x - mean(x))

    and compare adjusted means per arm.  Typically 30-70% variance
    reduction when x is last-period's value of the same metric — the
    difference between a 2-week and a 6-week experiment.

    Exactness: inputs are INTEGER cents; theta is the n*Sxy - Sx*Sy
    over n*Sxx - Sx² closed form (one division of exact integers),
    per-arm adjusted means are fixed chains of exact sums + single
    divisions — plain SQL replays every double.  Variance of the
    adjusted metric per arm uses the same integer-moment form with
    theta folded in algebraically (var_adj = var_y - 2*theta*cov_xy +
    theta²*var_x — no second data pass).

    Shape: ONE aggregation pass builds all pooled and per-arm BIGINT
    moments; everything after is per-arm scalar arithmetic.  Degenerate
    var(x) = 0 reports theta = 0 (no adjustment), never a division
    artifact.

    Output: one row per arm — (arm, n, mean_metric, mean_covariate,
    theta, adj_mean, var_raw, var_adj).
    """
    y = F.col(metric_cents_col).cast("long")
    x = F.col(covariate_cents_col).cast("long")
    # decimal(19,0) factors before every product-sum: long x long
    # overflows at corpus-scale cents under ANSI (the linear_trend /
    # pairwise_correlation convention)
    yd = y.cast("decimal(19,0)")
    xd = x.cast("decimal(19,0)")
    per_arm = df.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(y).cast("long").alias("sy"),
        F.sum(x).cast("long").alias("sx"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
    )
    pooled = per_arm.agg(
        F.sum("n").cast("long").alias("pn"),
        F.sum("sy").cast("long").alias("psy"),
        F.sum("sx").cast("long").alias("psx"),
        F.sum("sxy").alias("psxy"),
        F.sum("sxx").alias("psxx"),
    ).localCheckpoint(eager=True)
    j = per_arm.crossJoin(F.broadcast(pooled))

    def _d(c):
        return F.col(c).cast("decimal(19,0)")

    varx_num = (_d("pn") * F.col("psxx") - _d("psx") * _d("psx")).cast(
        "double"
    )
    cov_num = (_d("pn") * F.col("psxy") - _d("psx") * _d("psy")).cast(
        "double"
    )
    theta = F.when(varx_num > 0, cov_num / varx_num).otherwise(F.lit(0.0))
    mean_x_pooled = F.col("psx").cast("double") / F.col("pn").cast("double")
    mean_y = F.col("sy").cast("double") / F.col("n").cast("double")
    mean_x = F.col("sx").cast("double") / F.col("n").cast("double")
    adj = mean_y - theta * (mean_x - mean_x_pooled)
    nn = F.col("n").cast("double")
    var_y = (_d("n") * F.col("syy") - _d("sy") * _d("sy")).cast(
        "double"
    ) / (nn * nn)
    var_x_arm = (_d("n") * F.col("sxx") - _d("sx") * _d("sx")).cast(
        "double"
    ) / (nn * nn)
    cov_arm = (_d("n") * F.col("sxy") - _d("sx") * _d("sy")).cast(
        "double"
    ) / (nn * nn)
    var_adj = var_y - F.lit(2.0) * theta * cov_arm + theta * theta * var_x_arm
    return j.select(
        "arm",
        "n",
        mean_y.alias("mean_metric"),
        mean_x.alias("mean_covariate"),
        theta.alias("theta"),
        adj.alias("adj_mean"),
        var_y.alias("var_raw"),
        var_adj.alias("var_adj"),
    )


def _two_arms(
    df: DataFrame, arm_col: str, arms, op: str
) -> tuple[DataFrame, list]:
    """Resolve the (control, treatment) arm universe for a two-sample
    readout WITHOUT a second data-sized scan when the caller supplies
    the design.

    With ``arms=(control, treatment)`` the DESIGN defines the universe:
    no discovery scan is issued (the pre-round-11 form re-scanned the
    raw relation once per readout just to enumerate labels — at 100 TB
    that doubles every readout's scan cost), the GIVEN order is honored
    (``arms[0]`` is control — the caller designates direction), and the
    relation is narrowed with an ``isin`` predicate folded into the
    operator's own single aggregate pass, so rows carrying OTHER arm
    labels are excluded rather than misclassified (useful: a 2-arm
    readout over two arms of a k-arm experiment).

    With ``arms=None`` the observed universe is discovered by a
    distinct scan, sorted ascending, and must have exactly 2 labels —
    the back-compatible pre-round-11 behavior.

    Returns ``(possibly-narrowed df, [control, treatment])``.
    """
    if arms is not None:
        labels = list(arms)
        if len(labels) != 2 or labels[0] == labels[1] or any(
            a is None for a in labels
        ):
            raise ValueError(
                f"{op} needs exactly 2 distinct non-null arms, got {labels}"
            )
        return df.filter(F.col(arm_col).isin(labels)), labels
    labels = [r[0] for r in df.select(arm_col).distinct().orderBy(arm_col).collect()]
    if len(labels) != 2:
        raise ValueError(f"{op} needs exactly 2 arms, got {labels}")
    return df, labels


def balance_check(
    df: DataFrame,
    *,
    arm_col: str,
    covariate_cents_cols: list[str],
    threshold: float = 0.1,
    arms=None,
) -> DataFrame:
    """Standardized mean difference (SMD) per covariate between two
    arms — the randomization-sanity gate run BEFORE reading an
    experiment (|SMD| > ~0.1 means the split is imbalanced and any
    lift is suspect):

        SMD = (mean_t - mean_c) / sqrt((var_t + var_c) / 2)

    Exactness: integer-cent covariates, BIGINT moment sums in ONE
    aggregation pass for ALL covariates, per-covariate means/variances
    as fixed single-division chains — SQL replays every double.  Arms
    are the two DISTINCT values of ``arm_col`` ordered ascending
    (deterministic direction); more than two raises.  Zero pooled
    variance reports NULL smd.

    Output: one row per covariate — (covariate, n_control, n_treatment,
    mean_control, mean_treatment, smd, balanced).
    """
    from functools import reduce

    df, (ctrl, trt) = _two_arms(df, arm_col, arms, "balance_check")
    is_t = (F.col(arm_col) == trt).cast("int")
    aggs = [
        F.sum(F.lit(1) - is_t).cast("long").alias("nc"),
        F.sum(is_t).cast("long").alias("nt"),
    ]
    for c in covariate_cents_cols:
        v = F.col(c).cast("long")
        vd = v.cast("decimal(19,0)")  # v*v overflows long at corpus scale
        aggs += [
            F.sum(v * (1 - is_t)).cast("long").alias(f"sc_{c}"),
            F.sum(v * is_t).cast("long").alias(f"st_{c}"),
            F.sum(vd * vd * (1 - is_t)).alias(f"qc_{c}"),
            F.sum(vd * vd * is_t).alias(f"qt_{c}"),
        ]
    m = df.agg(*aggs).localCheckpoint(eager=True)
    outs = []
    for c in covariate_cents_cols:
        nc = F.col("nc").cast("double")
        nt = F.col("nt").cast("double")
        mc = F.col(f"sc_{c}").cast("double") / nc
        mt = F.col(f"st_{c}").cast("double") / nt
        dd = lambda col: F.col(col).cast("decimal(19,0)")
        vc = (
            dd("nc") * F.col(f"qc_{c}") - dd(f"sc_{c}") * dd(f"sc_{c}")
        ).cast("double") / (nc * nc)
        vt = (
            dd("nt") * F.col(f"qt_{c}") - dd(f"st_{c}") * dd(f"st_{c}")
        ).cast("double") / (nt * nt)
        pooled = (vt + vc) / F.lit(2.0)
        smd = F.when(pooled > 0, (mt - mc) / F.sqrt(pooled))
        outs.append(
            m.select(
                F.lit(c).alias("covariate"),
                F.col("nc").alias("n_control"),
                F.col("nt").alias("n_treatment"),
                mc.alias("mean_control"),
                mt.alias("mean_treatment"),
                smd.alias("smd"),
                F.when(smd.isNotNull(), F.abs(smd) <= F.lit(float(threshold))).alias(
                    "balanced"
                ),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


def poisson1_weight(key, b, *, seed: str = ""):
    """Poisson(1) bootstrap weight as a JVM column: the md5 coin of
    (seed || key || ':' || b) compared against the Poisson CDF quantized
    to 2^-32 INTEGER cutoffs (computed here in Python — no libm in any
    engine, so plain SQL replays every weight).  Shared by
    ``poisson_bootstrap_ci``, ``model_eval.ranking_metric_ci`` and the
    streaming bootstrap registry — one definition, one oracle shape."""
    import math

    cdf, cuts = 0.0, []
    for k in range(8):
        cdf += math.exp(-1.0) / math.factorial(k)
        cuts.append(math.floor(cdf * float(2**32)))
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed), key.cast("string"), F.lit(":"), b.cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = None
    for c in cuts:
        term = (u >= F.lit(int(c))).cast("int")
        w = term if w is None else (w + term)
    return w.cast("long")


def poisson_bootstrap_ci(
    df: DataFrame,
    value_cents_col: str,
    *,
    key_col: str,
    denom_cents_col: str | None = None,
    replicates: int = 64,
    ci: float = 0.95,
    seed: str = "",
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean — THE bootstrap
    that works at corpus scale: classic resampling needs n draws per
    replicate (a shuffle per replicate), but for large n the multinomial
    resample count of each row converges to Poisson(1), so every row can
    draw its B replicate weights INDEPENDENTLY in one pass (Chamandy et
    al., "Estimating Uncertainty for Massive Data Streams").  One map
    over (row x replicate), one B-row aggregate — no per-replicate scan,
    no driver data.

    Determinism + engine parity: the weight comes from the md5 coin
    (``sampling.hash_fraction``'s convention) compared against the
    Poisson(1) CDF quantized to 2^-32 INTEGER cutoffs computed once in
    Python — no libm in either engine, so plain SQL replays every weight
    and therefore every replicate mean bit-for-bit.  The interval is a
    rank statistic over the B means (lo = ceil(B*(1-ci)/2)-th smallest,
    hi = ceil(B*(1+ci)/2)-th, clamped) — exact, no interpolation.

    With ``denom_cents_col`` set the statistic is a RATIO —
    sum(num)/sum(den) per replicate — which is how cluster-level metrics
    (revenue per view, CTR) must be bootstrapped: pre-aggregate to one
    row per independent unit (user/session) and resample UNITS, never
    raw events (event-level resampling fakes independence and collapses
    the interval).  A replicate whose weighted denominator is 0 yields a
    NULL mean, rank-sorted last (the same convention as the mean path).

    Output: one row — (n, mean_cents, lo_cents, hi_cents, replicates);
    for ratios, mean_cents = sum(num)/sum(den) over the full frame.
    """
    import math

    from pyspark.sql import Window

    B = int(replicates)
    if B < 4:
        raise ValueError(f"replicates must be >= 4, got {B}")
    if not (0.0 < float(ci) < 1.0):
        raise ValueError(f"ci must be in (0,1), got {ci}")
    lo_rank = max(1, math.ceil(B * (1.0 - float(ci)) / 2.0))
    hi_rank = min(B, math.ceil(B * (1.0 + float(ci)) / 2.0))

    v = F.col(value_cents_col).cast("long")
    d = (
        F.col(denom_cents_col).cast("long")
        if denom_cents_col is not None
        else F.lit(1).cast("long")
    )
    rows = df.select(
        F.col(key_col).cast("string").alias("__k"), v.alias("__v"), d.alias("__d")
    ).select(
        "__k", "__v", "__d",
        F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("__b"),
    )
    per = (
        rows.withColumn("__w", poisson1_weight(F.col("__k"), F.col("__b"), seed=seed))
        .groupBy("__b")
        .agg(
            F.sum(F.col("__w") * F.col("__v")).cast("long").alias("__sw"),
            F.sum(F.col("__w") * F.col("__d")).cast("long").alias("__nw"),
        )
        .withColumn(
            "__mean",
            F.when(
                F.col("__nw") > 0,
                F.col("__sw").cast("double") / F.col("__nw").cast("double"),
            ),
        )
    )
    ranked = per.withColumn(
        "__r", F.row_number().over(Window.orderBy(F.col("__mean").asc_nulls_last()))
    )
    bounds = ranked.agg(
        F.max(F.when(F.col("__r") == lo_rank, F.col("__mean"))).alias("lo_cents"),
        F.max(F.when(F.col("__r") == hi_rank, F.col("__mean"))).alias("hi_cents"),
    )
    base = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum(v).cast("double") / F.sum(d).cast("double")).alias("mean_cents"),
    )
    return base.crossJoin(F.broadcast(bounds)).select(
        "n", "mean_cents", "lo_cents", "hi_cents", F.lit(B).alias("replicates")
    )


def bootstrap_lift_ci(
    df: DataFrame,
    value_cents_col: str,
    *,
    key_col: str,
    arm_col: str,
    replicates: int = 64,
    ci: float = 0.95,
    seed: str = "",
    arms=None,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the LIFT between two
    arms — the nonparametric sibling of ``proportion_ztest``/q204 (no
    normality, works for skewed revenue-style metrics where the z-test's
    variance estimate misleads): each unit draws the same Poisson(1)
    replicate weights as ``poisson_bootstrap_ci``, every replicate
    computes mean(treatment) - mean(control), and the interval is the
    exact rank selection over B replicate lifts.  An interval excluding
    0 is the significance call.

    Arms are the two DISTINCT values of ``arm_col`` ordered ascending
    (lift = mean(second) - mean(first), the balance_check convention);
    more than two raises.  One map over (row x replicate), a B-row
    aggregate — corpus-scale like the mean/ratio forms.

    Output: one row — (arm_control, arm_treatment, n_control,
    n_treatment, lift_cents, lo_cents, hi_cents, significant,
    replicates).
    """
    import math

    from pyspark.sql import Window

    B = int(replicates)
    if B < 4:
        raise ValueError(f"replicates must be >= 4, got {B}")
    if not (0.0 < float(ci) < 1.0):
        raise ValueError(f"ci must be in (0,1), got {ci}")
    df, arms = _two_arms(df, arm_col, arms, "bootstrap_lift_ci")
    ctrl, trt = arms
    lo_rank = max(1, math.ceil(B * (1.0 - float(ci)) / 2.0))
    hi_rank = min(B, math.ceil(B * (1.0 + float(ci)) / 2.0))

    v = F.col(value_cents_col).cast("long")
    is_t = (F.col(arm_col) == F.lit(trt)).cast("int")
    rows = df.select(
        F.col(key_col).cast("string").alias("__k"),
        v.alias("__v"),
        is_t.alias("__t"),
    ).select(
        "__k", "__v", "__t",
        F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("__b"),
    )
    per = (
        rows.withColumn("__w", poisson1_weight(F.col("__k"), F.col("__b"), seed=seed))
        .groupBy("__b")
        .agg(
            F.sum(F.col("__w") * F.col("__v") * F.col("__t")).cast("long").alias("__swt"),
            F.sum(F.col("__w") * F.col("__t")).cast("long").alias("__nwt"),
            F.sum(F.col("__w") * F.col("__v") * (1 - F.col("__t"))).cast("long").alias("__swc"),
            F.sum(F.col("__w") * (1 - F.col("__t"))).cast("long").alias("__nwc"),
        )
        .withColumn(
            "__lift",
            F.when(
                (F.col("__nwt") > 0) & (F.col("__nwc") > 0),
                F.col("__swt").cast("double") / F.col("__nwt").cast("double")
                - F.col("__swc").cast("double") / F.col("__nwc").cast("double"),
            ),
        )
    )
    ranked = per.withColumn(
        "__r", F.row_number().over(Window.orderBy(F.col("__lift").asc_nulls_last()))
    )
    bounds = ranked.agg(
        F.max(F.when(F.col("__r") == lo_rank, F.col("__lift"))).alias("lo_cents"),
        F.max(F.when(F.col("__r") == hi_rank, F.col("__lift"))).alias("hi_cents"),
    )
    base = df.agg(
        F.sum(F.lit(1) - is_t).cast("long").alias("n_control"),
        F.sum(is_t).cast("long").alias("n_treatment"),
        (
            F.sum(v * is_t).cast("double") / F.sum(is_t).cast("double")
            - F.sum(v * (1 - is_t)).cast("double")
            / F.sum(F.lit(1) - is_t).cast("double")
        ).alias("lift_cents"),
    )
    return base.crossJoin(F.broadcast(bounds)).select(
        F.lit(ctrl).cast("string").alias("arm_control"),
        F.lit(trt).cast("string").alias("arm_treatment"),
        "n_control",
        "n_treatment",
        "lift_cents",
        "lo_cents",
        "hi_cents",
        ((F.col("lo_cents") > 0) | (F.col("hi_cents") < 0)).alias("significant"),
        F.lit(B).alias("replicates"),
    )


def quantile_lift(
    df: DataFrame,
    value_cents_col: str,
    *,
    arm_col: str,
    taus: tuple[float, ...] = (0.25, 0.5, 0.75),
    by: str | None = None,
    arms=None,
) -> DataFrame:
    """Quantile treatment effects — the distributional A/B readout mean
    lift hides: for each tau, the EXACT type-1 (lower) sample quantile
    per arm (k = ceil(tau * n)-th smallest, the weighted_median rank
    rule at w=1) and their difference.  A treatment that helps the
    median user while hurting the tail shows up here and nowhere in
    q204/q247.

    Exactness: pure order statistics — one rank window per (group, arm),
    rank picked per tau, one integer difference; plain SQL replays every
    row.  Arms are the two DISTINCT ``arm_col`` values ordered ascending
    (lift = treatment - control, the balance_check convention); more
    than two raises.

    Output: ([by,] tau, n_control, n_treatment, q_control_cents,
    q_treatment_cents, lift_cents).  With ``by=``, a group where only
    one arm has rows is still emitted, with NULLs on the missing arm's
    columns (and NULL lift) — assignment imbalance must be visible, not
    silently dropped.
    """
    from pyspark.sql import Window

    if not taus:
        raise ValueError("taus must be non-empty")
    for t in taus:
        if not (0.0 < float(t) < 1.0):
            raise ValueError(f"taus must be in (0,1), got {t}")
    df, arms = _two_arms(df, arm_col, arms, "quantile_lift")
    ctrl, trt = arms
    gcols = [by] if by else []

    v = F.col(value_cents_col).cast("long")
    w = Window.partitionBy(*gcols, arm_col).orderBy(v.asc())
    ranked = (
        df.select(*gcols, F.col(arm_col).alias("__arm"), v.alias("__v"))
        .withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy(*gcols, "__arm").orderBy(F.col("__v").asc())
            ),
        )
        .localCheckpoint(eager=True)
    )
    ns = ranked.groupBy(*gcols, "__arm").agg(F.max("__r").cast("long").alias("__n"))
    spark = df.sparkSession
    tau_grid = local_rows(spark, [(float(t),) for t in taus], "tau double")
    grid = ns.crossJoin(F.broadcast(tau_grid)).withColumn(
        "__k",
        F.ceil(F.col("tau") * F.col("__n").cast("double")).cast("long"),
    )
    q = grid.join(
        ranked.select(*gcols, "__arm", F.col("__r").alias("__k"), F.col("__v").alias("__q")),
        gcols + ["__arm", "__k"],
    )
    ctrl_q = q.filter(F.col("__arm") == ctrl).select(
        *gcols, "tau",
        F.col("__n").alias("n_control"),
        F.col("__q").alias("q_control_cents"),
    )
    trt_q = q.filter(F.col("__arm") == trt).select(
        *gcols, "tau",
        F.col("__n").alias("n_treatment"),
        F.col("__q").alias("q_treatment_cents"),
    )
    # full outer on the group/tau keys: with ``by=`` a group where one
    # arm has no rows still surfaces, with NULL n/quantile/lift for the
    # missing arm — silently dropping it would hide exactly the
    # imbalance a per-group readout exists to expose (without ``by``
    # the exactly-2-arms validation guarantees both sides, and the
    # full join is row-identical to an inner one).
    return (
        ctrl_q.join(trt_q, gcols + ["tau"], "full_outer")
        .select(
            *gcols,
            "tau",
            "n_control",
            "n_treatment",
            "q_control_cents",
            "q_treatment_cents",
            (F.col("q_treatment_cents") - F.col("q_control_cents")).alias(
                "lift_cents"
            ),
        )
    )


def diff_in_diff(
    df: DataFrame,
    value_cents_col: str,
    *,
    unit_col: str,
    arm_col: str,
    is_post_col: str,
    by: str | None = None,
    arms=None,
) -> DataFrame:
    """Difference-in-differences — the quasi-experimental A/B readout
    when assignment is not randomized (a rollout, a policy change, a
    market test): the treatment effect is the change in the treated
    group's PER-UNIT pre->post delta net of the control group's, which
    cancels both fixed unit effects and the common time trend q204's
    plain comparison would misattribute.

        delta_u = sum(post cents) - sum(pre cents)   per unit
        DiD     = mean(delta | treatment) - mean(delta | control)

    with a Welch two-sample z on the unit deltas (the unit is the
    independence level, not the row — clustering by unit is what makes
    this SE honest).

    Exactness: deltas are INTEGER cents; per-arm (n, sum, sum of
    squares as decimal moments) make every mean/var one closed-form
    division; se = sqrt(v_t/n_t + v_c/n_c) and z = DiD/se are fixed
    IEEE chains (sqrt is correctly rounded per IEEE 754) — plain SQL
    replays every double.  Arms are the two DISTINCT ``arm_col`` values
    ascending (control first, the balance_check convention);
    ``is_post_col`` is explicit 0/1 because period labels have no
    canonical order.

    Output: ([by,] n_control, n_treatment, mean_delta_control,
    mean_delta_treatment, did_cents, se, z) — one row per group.
    Degenerate groups surface as NULL, never NaN/Inf: a single-unit arm
    has no ddof=1 variance (var/se/z NULL) and identical deltas
    everywhere give se = 0 (z NULL) — the fleiss_kappa convention.
    """
    df, arms = _two_arms(df, arm_col, arms, "diff_in_diff")
    ctrl, trt = arms
    gcols = [by] if by else []
    v = F.col(value_cents_col).cast("long")
    post = F.col(is_post_col).cast("int")
    deltas = df.groupBy(*gcols, F.col(unit_col).alias("__u"), F.col(arm_col).alias("__a")).agg(
        (
            F.sum(F.when(post == 1, v).otherwise(F.lit(0)))
            - F.sum(F.when(post == 0, v).otherwise(F.lit(0)))
        )
        .cast("long")
        .alias("__d")
    )
    return did_from_deltas(deltas, ctrl=ctrl, trt=trt, gcols=gcols)


def did_from_deltas(
    deltas: DataFrame, *, ctrl, trt, gcols: list[str]
) -> DataFrame:
    """Finalize a per-unit delta table ([gcols,] __a arm, __d long)
    into the diff_in_diff output — the ONE definition of the DiD moment
    math, shared by the batch operator and the streaming registry
    finalizer (``streaming/drift.did_from_registry``): per-unit
    (pre, post) integer sums are additive across batches, so the
    registry folds exactly and this finalize over its deltas is
    value-identical to the batch operator over all history."""
    dd = F.col("__d").cast("decimal(19,0)")
    m = deltas.groupBy(*gcols, "__a").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__d").cast("long").alias("s"),
        F.sum(dd * dd).cast("decimal(38,0)").alias("ss"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd
    # sample variance ddof=1, closed form over exact integer moments.
    # A single-unit arm has no ddof=1 variance — surface NULL (the
    # fleiss_kappa degenerate-input convention), not the 0/0 NaN the
    # bare division would produce; NULL then propagates through se and z.
    var = F.when(
        F.col("n") >= F.lit(2),
        (F.col("ss").cast("double") - (F.col("s").cast("double") * F.col("s").cast("double")) / nd)
        / (nd - F.lit(1.0)),
    )
    m = m.select(*gcols, "__a", F.col("n"), mean.alias("mean_delta"), var.alias("var_delta"))
    c = m.filter(F.col("__a") == ctrl).select(
        *gcols,
        F.col("n").alias("n_control"),
        F.col("mean_delta").alias("mean_delta_control"),
        F.col("var_delta").alias("__vc"),
    )
    t = m.filter(F.col("__a") == trt).select(
        *gcols,
        F.col("n").alias("n_treatment"),
        F.col("mean_delta").alias("mean_delta_treatment"),
        F.col("var_delta").alias("__vt"),
    )
    joined = (
        c.join(t, gcols, "full_outer") if gcols else c.crossJoin(t)
    )
    did = F.col("mean_delta_treatment") - F.col("mean_delta_control")
    se = F.sqrt(
        F.col("__vt") / F.col("n_treatment").cast("double")
        + F.col("__vc") / F.col("n_control").cast("double")
    )
    # se == 0 (all deltas identical in both arms) would make z = 0/0
    # NaN; degenerate groups surface as NULL instead (se NULL from a
    # single-unit arm already propagates to a NULL z through the when)
    return joined.select(
        *gcols,
        "n_control",
        "n_treatment",
        "mean_delta_control",
        "mean_delta_treatment",
        did.alias("did_cents"),
        se.alias("se"),
        F.when(se > F.lit(0.0), did / se).alias("z"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_cents_col: str,
    *,
    arm_col: str,
    by: str | None = None,
    arms=None,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) — the nonparametric two-sample
    test the experimentation family needs when cents are heavy-tailed
    enough that q204/q247 mean-based readouts are dominated by whales:
    compares RANKS, so one enormous order moves the statistic exactly
    one rank's worth.

    Exact integer construction — ON THE DISTINCT-VALUE GRID, never a
    per-row rank window (a pooled rank over rows is a global sort; the
    grid is the kaplan_meier/weighted_median convention): per value,
    (count, treatment count); a cumulative count over the value-sorted
    grid gives the min-rank, so the treatment's DOUBLED rank-sum

        S2 = sum over values of ct * (2*cum - c + 1)

    is an exact decimal integer (2*avg_rank = 2*min_rank + c - 1 per
    member); U, mu, and the tie-corrected sigma

        sigma^2 = n1*n2/12 * ((N+1) - sum(t^3 - t) / (N*(N-1)))

    are fixed IEEE chains over those integers — plain SQL replays every
    double (the oracle may rank rows instead: identical integers).
    Arms = the two DISTINCT ``arm_col`` values ascending (control,
    treatment); U is reported for the TREATMENT arm.  The normal
    approximation needs no continuity correction at registry scales
    (documented; add 0.5 upstream if n < 20 matters).

    Shape: one groupBy onto the value grid (map-side combine), one
    grid-sized cumulative window, one scalar aggregate.

    Output: ([by,] n_control, n_treatment, u_treatment, mu, sigma, z).
    Degenerate groups surface as NULL, never NaN: one-arm-empty groups
    (possible under ``by=``) report sigma NULL, and all-values-tied
    groups report a true sigma = 0 with z NULL — the fleiss_kappa
    convention.
    """
    df, arms = _two_arms(df, arm_col, arms, "mann_whitney_u")
    ctrl, trt = arms
    gcols = [by] if by else []
    v = F.col(value_cents_col).cast("long")
    base = df.select(*gcols, F.col(arm_col).alias("__a"), v.alias("__v"))
    grid = base.groupBy(*gcols, "__v").agg(
        F.count(F.lit(1)).cast("long").alias("__c"),
        F.sum((F.col("__a") == trt).cast("int")).cast("long").alias("__ct"),
    )
    return mwu_from_grid(grid, gcols=gcols)


def mwu_from_grid(grid: DataFrame, *, gcols: list[str]) -> DataFrame:
    """Finalize a pooled value grid ([gcols,] __v long, __c long total
    count, __ct long treatment count) into the mann_whitney_u output —
    the ONE definition of the rank-test math, shared by the batch
    operator and the streaming registry finalizer
    (``streaming/drift.mwu_from_registry``): per-value counts are
    additive across batches, so the registry folds exactly and this
    finalize over its grid is value-identical to the batch operator
    over all history."""
    from pyspark.sql import Window

    wg = Window.partitionBy(*gcols).orderBy(F.col("__v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = grid.withColumn("__cum", F.sum("__c").over(wg))
    cd = F.col("__c").cast("decimal(19,0)")
    ctd = F.col("__ct").cast("decimal(19,0)")
    cumd = F.col("__cum").cast("decimal(19,0)")
    # per-member doubled average rank: 2*min_rank + c - 1 with
    # min_rank = cum - c + 1  =>  2*cum - c + 1
    r2 = F.lit(2) * cumd - cd + F.lit(1)
    j = cum.groupBy(*gcols).agg(
        F.sum(ctd * r2).cast("decimal(38,0)").alias("__s2t"),
        F.sum("__ct").cast("long").alias("n_treatment"),
        (F.sum("__c") - F.sum("__ct")).cast("long").alias("n_control"),
        F.sum(cd * cd * cd - cd).cast("decimal(38,0)").alias("__tie"),
    )
    n1 = F.col("n_control").cast("double")
    n2 = F.col("n_treatment").cast("double")
    nn = n1 + n2
    u = (
        F.col("__s2t").cast("double")
        - (F.col("n_treatment") * (F.col("n_treatment") + F.lit(1))).cast("double")
    ) / F.lit(2.0)
    mu = (n1 * n2) / F.lit(2.0)
    # one-arm-empty groups would make the tie term 0/0 NaN (and NaN > 0
    # is TRUE under Spark's NaN ordering, so the z guard alone is not
    # enough): sigma is NULL unless both arms have rows — with both arms
    # present nn >= 2, the tie term is finite and sigma^2 >= 0, so the
    # sqrt cannot be NaN.  All-values-tied gives a true sigma == 0
    # (reported), and z surfaces as NULL instead of 0/0 NaN — the
    # fleiss_kappa degenerate-input convention.
    sigma = F.when(
        (F.col("n_control") > F.lit(0)) & (F.col("n_treatment") > F.lit(0)),
        F.sqrt(
            ((n1 * n2) / F.lit(12.0))
            * ((nn + F.lit(1.0)) - F.col("__tie").cast("double") / (nn * (nn - F.lit(1.0))))
        ),
    )
    return j.select(
        *gcols,
        "n_control",
        "n_treatment",
        u.alias("u_treatment"),
        mu.alias("mu"),
        sigma.alias("sigma"),
        F.when(sigma > F.lit(0.0), (u - mu) / sigma).alias("z"),
    )


def arm_gap_timeline(
    df: DataFrame,
    value_cents_col: str,
    *,
    unit_col: str,
    arm_col: str,
    period_col: str,
    arms=None,
) -> DataFrame:
    """Event-study timeline — the PRE-TREND check q251's single DiD
    number assumes away: per period, the gap between arm means of
    PER-UNIT cents (clustered at the unit, the independence level).  A
    rollout readout is only credible if the gap is flat before the
    treatment period; this is the table that shows it (and afterwards,
    the per-period effect trajectory).

    Exactness: per-(period, arm, unit) integer sums, then per-(period,
    arm) (n_units, sum) — means are single divisions, the gap one
    subtraction: plain SQL replays every double.  One-arm periods
    surface with NULLs on the missing side (the quantile_lift
    convention).

    Shape: two keyed integer aggregations (map-side combine) + a tiny
    period-grid join — nothing data-sized shuffles twice.

    Output: (period, n_control, n_treatment, mean_control_cents,
    mean_treatment_cents, gap_cents), one row per (period, both-arm
    presence).
    """
    df, arms = _two_arms(df, arm_col, arms, "arm_gap_timeline")
    ctrl, trt = arms
    v = F.col(value_cents_col).cast("long")
    per_unit = df.groupBy(
        F.col(period_col).alias("period"),
        F.col(arm_col).alias("__a"),
        F.col(unit_col).alias("__u"),
    ).agg(F.sum(v).cast("long").alias("__s"))
    per_arm = per_unit.groupBy("period", "__a").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__s").cast("long").alias("s"),
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    c = per_arm.filter(F.col("__a") == ctrl).select(
        "period",
        F.col("n").alias("n_control"),
        mean.alias("mean_control_cents"),
    )
    t = per_arm.filter(F.col("__a") == trt).select(
        "period",
        F.col("n").alias("n_treatment"),
        mean.alias("mean_treatment_cents"),
    )
    return c.join(t, ["period"], "full_outer").select(
        "period",
        "n_control",
        "n_treatment",
        "mean_control_cents",
        "mean_treatment_cents",
        (F.col("mean_treatment_cents") - F.col("mean_control_cents")).alias(
            "gap_cents"
        ),
    )


def jackknife_ratio_ci(
    df: DataFrame,
    value_cents_col: str,
    *,
    arm_col: str,
    bucket_col: str,
    z: float = 1.96,
) -> DataFrame:
    """Delete-one-bucket jackknife CI for a RATIO metric (cents per
    event) — the experimentation-platform standard for metrics whose
    denominator is itself random (revenue/session, clicks/query):
    the delta-method-free variance estimate every large A/B system
    (buckets = hashed randomization units) actually ships.

        R        = S / N                    (per arm)
        R_(-j)   = (S - s_j) / (N - n_j)    (drop bucket j)
        var_jk   = (B-1)/B * sum_j (R_(-j) - mean_j R_(-j))^2

    Exactness: (s_j, n_j) are BIGINT sums; each leave-one-out ratio is
    ONE double division, then floor-quantized to the 2^-20 dyadic grid
    (the llk/rbo convention) so the cross-bucket sums fold
    integer-exactly in any order: sum(q_j) is a BIGINT, sum(q_j^2)
    a DECIMAL(38,0), and var_jk = (B*sum(q^2) - sum(q)^2) * (B-1)
    / B^2 / 2^40 is a fixed scalar chain — plain SQL replays every
    double.  The 2^-20 grid on a cents-ratio is ~1e-6 cents of
    resolution; at B <= a few hundred buckets the quantization error is
    orders below the jackknife SE itself.

    Degenerate guards (the fleiss_kappa NULL convention): a bucket
    holding an arm's ENTIRE sample (N == n_j) has no leave-one-out
    ratio (dropped, with B reduced); B < 2 yields NULL se/ci.

    Shape: one keyed integer aggregation to (arm, bucket), a broadcast
    join of per-arm totals, one more tiny aggregation — bucket count is
    fixed (typically 10-200), so everything after the first groupBy is
    constant-sized regardless of corpus scale.

    Output: one row per arm — (arm, n_buckets, n, ratio, jk_se,
    ci_lo, ci_hi).
    """
    v = F.col(value_cents_col).cast("long")
    per_bucket = df.groupBy(
        F.col(arm_col).alias("arm"), F.col(bucket_col).alias("__b")
    ).agg(
        F.sum(v).cast("long").alias("s_j"),
        F.count(F.lit(1)).cast("long").alias("n_j"),
    )
    return jackknife_from_buckets(per_bucket, z=z)


def jackknife_from_buckets(per_bucket: DataFrame, *, z: float = 1.96) -> DataFrame:
    """Finalize a per-(arm, bucket) sums table (arm, __b, s_j long,
    n_j long) into the ``jackknife_ratio_ci`` output — the ONE
    definition of the jackknife moment math, shared by the batch
    operator and the streaming registry finalizer
    (``streaming/drift.jackknife_from_registry``): per-bucket (sum,
    count) integers are additive across batches, so the registry folds
    exactly and this finalize over its buckets is value-identical to
    the batch operator over all history."""
    totals = per_bucket.groupBy("arm").agg(
        F.sum("s_j").cast("long").alias("S"),
        F.sum("n_j").cast("long").alias("N"),
    )
    jb = per_bucket.join(F.broadcast(totals), "arm")
    r_loo = (F.col("S") - F.col("s_j")).cast("double") / (
        F.col("N") - F.col("n_j")
    ).cast("double")
    q = F.when(
        F.col("N") > F.col("n_j"),
        F.floor(r_loo * F.lit(float(1 << 20))).cast("long"),
    )
    agg = jb.select("arm", "S", "N", q.alias("q")).groupBy("arm", "S", "N").agg(
        F.count("q").cast("long").alias("B"),
        F.sum("q").cast("long").alias("sq"),
        F.sum(F.col("q").cast("decimal(19,0)") * F.col("q").cast("decimal(19,0)"))
        .cast("decimal(38,0)")
        .alias("sqq"),
    )
    bd = F.col("B").cast("double")
    num = (
        F.col("B").cast("decimal(38,0)") * F.col("sqq")
        - F.col("sq").cast("decimal(38,0)") * F.col("sq").cast("decimal(38,0)")
    ).cast("double")
    var_jk = num * (bd - F.lit(1.0)) / (bd * bd) / F.lit(float(1 << 40))
    se = F.when(F.col("B") >= 2, F.sqrt(var_jk))
    ratio = F.col("S").cast("double") / F.col("N").cast("double")
    return agg.select(
        "arm",
        F.col("B").alias("n_buckets"),
        F.col("N").alias("n"),
        ratio.alias("ratio"),
        se.alias("jk_se"),
        (ratio - F.lit(float(z)) * se).alias("ci_lo"),
        (ratio + F.lit(float(z)) * se).alias("ci_hi"),
    )


#: James-Stein SS quantization grid (cents^2): coarse enough that the
#: floored per-group terms stay BIGINT-safe (and float64-integer-exact)
#: at any corpus scale, fine enough to sit below double rounding of the
#: SS magnitudes it measures
_JS_GRID = float(1 << 16)


def james_stein_shrinkage(
    df: DataFrame,
    value_cents_col: str,
    *,
    group_col: str,
) -> DataFrame:
    """Empirical-Bayes (James-Stein) shrinkage of per-group means
    toward the grand mean — the estimator a segment-level readout
    should report instead of raw per-group means when group sizes vary:
    small groups' means are mostly noise and get pulled in hard, large
    groups keep theirs (Efron & Morris 1975; the normal-normal model
    with method-of-moments variance components).

        sigma2 (within)  = SSW / (N - k)
        tau2   (between) = max(0, (SSB - (k-1)*sigma2) / c),
                           c = (N^2 - sum_g n_g^2) / N
        c_g              = (sigma2/n_g) / (sigma2/n_g + tau2)
        shrunk_g         = mu + (1 - c_g) * (mean_g - mu)

    Exactness: per-group (n, sum, sum-of-squares) are BIGINT/DECIMAL
    moments; each group's within-SS and between-SS term is a fixed
    double chain floor-quantized to INTEGERS on a 2^16-cents^2 grid
    before the cross-group sum (sums in DECIMAL, so no long overflow at
    any corpus scale — a raw cents^2 grid overflowed BIGINT at sf0.1:
    6k orders/nation x (5e7 cents)^2 ~ 1.5e19 per group).  The coarse
    grid costs <= 2^16 cents^2 absolute per group against SS terms of
    1e9+, relative error below double's own rounding at these
    magnitudes.  Every downstream quantity is scalar arithmetic on
    those integers — plain SQL replays every double.  tau2 == 0 (no
    between-group signal) shrinks every group fully to the grand mean;
    sigma2 == tau2 == 0 (all values identical) reports c_g = 0 with
    shrunk == mean == mu.

    Shape: ONE keyed integer aggregation + a broadcast of the k-row
    group table through two tiny folds — nothing data-sized moves
    twice, k is the group cardinality (segments, domains: tens to
    thousands).

    Output: one row per group — (group, n, mean_raw, shrink_c,
    mean_shrunk), shrink_c in [0, 1] the fraction of the group's
    deviation REMOVED.
    """
    v = F.col(value_cents_col).cast("long")
    vd = v.cast("decimal(19,0)")
    # pin the FIRST keyed aggregation: everything downstream (folds,
    # broadcast joins) derives from this k-row table, so the raw
    # relation is scanned exactly once (pinning only the derived
    # scalar folds left g unpinned and the raw data scanned per fold)
    g = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(v).cast("long").alias("s_g"),
        F.sum(vd * vd).cast("decimal(38,0)").alias("ss_g"),
    ).localCheckpoint(eager=True)
    nd = F.col("n_g").cast("double")
    mean_g = F.col("s_g").cast("double") / nd
    # per-group within-SS = (n*ss - s^2)/n: exact decimal numerator,
    # one division, floor to integer cents^2 for an order-free sum
    w_num = (
        F.col("n_g").cast("decimal(38,0)") * F.col("ss_g")
        - F.col("s_g").cast("decimal(19,0)") * F.col("s_g").cast("decimal(19,0)")
    ).cast("double")
    wq = F.floor(w_num / nd / F.lit(_JS_GRID)).cast("long")
    folded = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("N"),
        F.sum("s_g").cast("long").alias("S"),
        F.sum(wq.cast("decimal(19,0)")).cast("decimal(38,0)").alias("ssw_q"),
        F.sum(F.col("n_g").cast("decimal(19,0)") * F.col("n_g").cast("decimal(19,0)"))
        .cast("decimal(38,0)")
        .alias("snn"),
    )  # derives from pinned g: 1-row fold, no pin needed
    j = g.crossJoin(F.broadcast(folded))
    mu = F.col("S").cast("double") / F.col("N").cast("double")
    # between-SS term n_g*(mean_g - mu)^2, floor-quantized like within
    bq = F.floor(nd * (mean_g - mu) * (mean_g - mu) / F.lit(_JS_GRID)).cast("long")
    j2 = j.select(
        "group", "n_g", "s_g", "k", "N", "S", "ssw_q", "snn", bq.alias("bq")
    )  # k-row projection of pinned g: recompute is cheaper than a pin
    per_group = j2
    ssb = per_group.groupBy("k", "N", "S", "ssw_q", "snn").agg(
        F.sum(F.col("bq").cast("decimal(19,0)")).cast("decimal(38,0)").alias("ssb_q")
    )
    out = per_group.join(
        F.broadcast(ssb.select("k", "ssb_q")), ["k"]
    )
    kd = F.col("k").cast("double")
    Nd = F.col("N").cast("double")
    sigma2 = F.when(
        F.col("N") > F.col("k"),
        F.col("ssw_q").cast("double") * F.lit(_JS_GRID) / (Nd - kd),
    ).otherwise(F.lit(0.0))
    c_denom = (
        F.col("N").cast("decimal(19,0)") * F.col("N").cast("decimal(19,0)")
        - F.col("snn")
    ).cast("double") / Nd
    tau2 = F.when(
        (F.col("k") > 1) & (c_denom > 0),
        F.greatest(
            F.lit(0.0),
            (F.col("ssb_q").cast("double") * F.lit(_JS_GRID) - (kd - F.lit(1.0)) * sigma2)
            / c_denom,
        ),
    ).otherwise(F.lit(0.0))
    nd2 = F.col("n_g").cast("double")
    mean_g2 = F.col("s_g").cast("double") / nd2
    mu2 = F.col("S").cast("double") / Nd
    noise = sigma2 / nd2
    shrink = F.when(noise + tau2 > 0, noise / (noise + tau2)).otherwise(F.lit(0.0))
    return out.select(
        "group",
        F.col("n_g").alias("n"),
        mean_g2.alias("mean_raw"),
        shrink.alias("shrink_c"),
        (mu2 + (F.lit(1.0) - shrink) * (mean_g2 - mu2)).alias("mean_shrunk"),
    )


#: Abramowitz & Stegun 26.2.17 coefficients (|eps| < 7.5e-8 on the CDF)
_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_INV_SQRT_2PI = 0.3989422804014327


def normal_sf_q(z: F.Column) -> F.Column:
    """Upper-tail standard normal P(Z > z) as a COLUMN expression that
    an external SQL engine replays bit-for-bit — neither Spark nor
    DuckDB ships erf, so both sides build Phi from the SAME primitive
    chain: Abramowitz & Stegun 26.2.17 (|approx error| < 7.5e-8, far
    below any decision threshold this feeds), with the one libm call
    (exp) floor-quantized to the 2^-20 grid before use (the engine's
    ln-quantization convention: a cross-libm 1-ulp disagreement crosses
    a grid boundary with ~2^-32 odds, the accepted risk class), and the
    polynomial folded in a FIXED Horner order.

    Adds <= ~1.3 * 2^-20 of absolute error on top of A&S — p-values
    are exact to ~2e-6, which is reporting precision, not inference
    precision.  Symmetric: negative z returns 1 - SF(|z|).
    """
    x = F.abs(z)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * x)
    phi_q = (
        F.floor(F.exp(-x * x / F.lit(2.0)) * F.lit(float(1 << 20)))
        / F.lit(float(1 << 20))
    ) * F.lit(_INV_SQRT_2PI)
    b1, b2, b3, b4, b5 = (F.lit(b) for b in _AS_B)
    poly = t * (b1 + t * (b2 + t * (b3 + t * (b4 + t * b5))))
    sf_abs = phi_q * poly
    return F.when(z >= 0, sf_abs).otherwise(F.lit(1.0) - sf_abs)


def chi2_sf_q(x: F.Column, df: int) -> F.Column:
    """Upper-tail chi-square P(X > x) for INTEGER ``df`` as a COLUMN
    expression plain SQL replays — the engine-exact sibling of the
    Wilson-Hilferty cube-root approximation (which carries ~3e-3
    absolute error at moderate p).  For integer df the survival
    function is closed-form through the recurrence
    ``Q(x; v+2) = Q(x; v) + (x/2)^(v/2) e^(-x/2) / Gamma(v/2 + 1)``:

    - df = 2m (even):  ``e^(-x/2) * sum_{j<m} (x/2)^j / j!`` — a
      quantized exp times a fixed-Horner polynomial with literal
      ``1/j!`` coefficients (df=2 degenerates to ``e^(-x/2)``);
    - df = 2m+1 (odd): ``2*normal_sf_q(sqrt(x)) + e^(-x/2) * sqrt(x/2)
      * sum_{1<=j<=m} (x/2)^(j-1) / Gamma(j+1/2)`` — sqrt is IEEE
      correctly-rounded on every engine, the Gamma coefficients are
      plan-time literals, and the normal SF is the shared A&S chain.

    Quantization happens on the FINAL bounded-in-[0,1] term, not the
    raw exp factor: the one libm call (exp) carries a 1-ulp cross-libm
    risk that stays RELATIVE through the deterministic polynomial
    product (absolute divergence ~ p * 2^-52), so floor-quantizing the
    product ``exp(-h) * poly`` to the 2^-20 grid both absorbs the libm
    risk (a 2^-52-scale divergence crosses a 2^-20 boundary with ~2^-32
    odds — the engine's accepted risk class) and bounds the absolute
    error at 2^-20 for EVERY df.  Quantizing the raw exp instead (the
    pre-round-11 form) amplified the grid quantum by the polynomial
    (~e^(x/2)), collapsing p to 0 for chi2 > ~27.7 at any df — a ~27%
    null false-alarm rate by df = 20.  For df <= 2 the polynomial is
    the literal 1.0, so the two forms are bit-identical and every
    existing df<=2 oracle replays unchanged.  Total absolute error:
    ~1.5e-7 A&S normal-tail (odd df only) + 2^-20 ~= 1e-6 at any df —
    ~3 orders tighter than Wilson-Hilferty's ~3e-3.
    """
    import math

    dfi = int(df)
    if dfi < 1:
        raise ValueError(f"chi2_sf_q needs integer df >= 1, got {df}")
    grid = F.lit(float(1 << 20))
    h = x / F.lit(2.0)
    if dfi % 2 == 0:
        m = dfi // 2
        coef = [1.0 / math.factorial(j) for j in range(m)]
        poly = F.lit(coef[-1])
        for j in range(m - 2, -1, -1):
            poly = F.lit(coef[j]) + h * poly
        return F.floor(F.exp(-h) * poly * grid) / grid
    m = (dfi - 1) // 2
    base = F.lit(2.0) * normal_sf_q(F.sqrt(x))
    if m == 0:
        return base
    coef = [1.0 / math.gamma(j + 0.5) for j in range(1, m + 1)]
    poly = F.lit(coef[-1])
    for j in range(m - 2, -1, -1):
        poly = F.lit(coef[j]) + h * poly
    return base + F.floor(F.exp(-h) * F.sqrt(h) * poly * grid) / grid


def obf_sequential_monitor(
    df: DataFrame,
    value_cents_col: str,
    *,
    arm_col: str,
    look_col: str,
    obf_constant: float = 2.04,
    arms=None,
) -> DataFrame:
    """O'Brien-Fleming group-sequential monitor — the peeking
    discipline a fixed-horizon z-test (q204) lacks and the SPRT (q233)
    trades composite hypotheses for: at each interim look k the
    CUMULATIVE Welch z compares against the OBF boundary
    ``c / sqrt(f_k)`` (f_k = information fraction), so early looks need
    overwhelming evidence and the final look spends almost the full
    alpha.  ``obf_constant`` is the published table value for (K,
    alpha) — e.g. 2.04 for K=5 two-sided alpha=0.05, 2.00 for K=4,
    1.98 for K=3 (Pocock & O'Brien-Fleming tables); it is a REPORTING
    constant, not fitted.

    Exactness: per-(look, arm) BIGINT/DECIMAL moments, cumulated with a
    window ORDER BY look (exact integer adds in a deterministic order);
    every mean/var/z is the DiD closed-form chain; the boundary and the
    nominal two-sided level ``2 * normal_sf_q(boundary)`` are fixed
    scalar chains — plain SQL replays every double.  Zero-variance
    looks surface NULL z, never NaN; a look where an arm contributed NO
    new rows is OMITTED from the output entirely (the two cumulative
    sides inner-join on look), not emitted with NULLs — monitor designs
    with ragged arrival should bucket looks upstream so both arms
    appear at each look.

    Shape: ONE keyed integer aggregation (map-side combine) + a
    K-row window — everything after the first groupBy is look-count
    sized.

    Output: one row per look — (look, n_control, n_treatment, z,
    info_frac, boundary, crossed, nominal_alpha), ordered by look.
    """
    df, arms = _two_arms(df, arm_col, arms, "obf_sequential_monitor")
    from pyspark.sql import Window

    ctrl, trt = arms
    v = F.col(value_cents_col).cast("long")
    vd = v.cast("decimal(19,0)")
    # pin the FIRST keyed aggregation: every downstream window/fold/join
    # derives from this (look x arm)-row table, so the raw relation is
    # scanned exactly once
    per = df.groupBy(F.col(look_col).alias("look"), F.col(arm_col).alias("__a")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).cast("long").alias("s"),
        F.sum(vd * vd).cast("decimal(38,0)").alias("ss"),
    ).localCheckpoint(eager=True)
    w = (
        Window.partitionBy("__a")
        .orderBy("look")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per.select(
        "look",
        "__a",
        F.sum("n").over(w).cast("long").alias("cn"),
        F.sum("s").over(w).cast("long").alias("cs"),
        F.sum("ss").over(w).cast("decimal(38,0)").alias("css"),
    )

    def side(arm, tag):
        return cum.filter(F.col("__a") == arm).select(
            "look",
            F.col("cn").alias(f"n_{tag}"),
            F.col("cs").alias(f"s_{tag}"),
            F.col("css").alias(f"ss_{tag}"),
        )

    j = side(ctrl, "c").join(side(trt, "t"), "look")

    def mv(tag):
        n = F.col(f"n_{tag}")
        nd = n.cast("double")
        mean = F.col(f"s_{tag}").cast("double") / nd
        var_num = (
            n.cast("decimal(19,0)") * F.col(f"ss_{tag}")
            - F.col(f"s_{tag}").cast("decimal(19,0)")
            * F.col(f"s_{tag}").cast("decimal(19,0)")
        ).cast("double")
        var = F.when(n >= 2, var_num / (nd * (nd - F.lit(1.0))))
        return mean, var, n, nd

    mean_c, var_c, n_c, nd_c = mv("c")
    mean_t, var_t, n_t, nd_t = mv("t")
    se = F.sqrt(var_t / nd_t + var_c / nd_c)
    z = F.when(se > 0, (mean_t - mean_c) / se)
    total = j.agg(F.max(F.col("n_c") + F.col("n_t")).alias("ntot"))
    out = j.crossJoin(F.broadcast(total))
    f_k = (F.col("n_c") + F.col("n_t")).cast("double") / F.col("ntot").cast("double")
    boundary = F.lit(float(obf_constant)) / F.sqrt(f_k)
    return out.select(
        "look",
        F.col("n_c").alias("n_control"),
        F.col("n_t").alias("n_treatment"),
        z.alias("z"),
        f_k.alias("info_frac"),
        boundary.alias("boundary"),
        (F.abs(z) > boundary).alias("crossed"),
        (F.lit(2.0) * normal_sf_q(boundary)).alias("nominal_alpha"),
    ).orderBy("look")


def delta_method_ratio_ci(
    df: DataFrame,
    num_cents_col: str,
    den_count_col: str,
    *,
    arm_col: str,
    unit_col: str,
    z: float = 1.96,
) -> DataFrame:
    """Delta-method CI for a RATIO metric (sum of numerator over sum of
    denominator across UNITS) — the closed-form cousin of the
    delete-one-bucket jackknife (q256), and the standard cross-check:
    when the two disagree materially the metric is heavy-tailed enough
    that bucketing choices matter.

        R = sum_u x_u / sum_u y_u,     (x, y) per-unit integer totals
        var(R) ~= (S_xx - 2 R S_xy + R^2 S_yy) / (n * ybar^2 * n)

    with S_** the ddof=0 second moments of the per-unit (x, y) pairs
    (Deng et al. 2017, cluster-level delta method).  The unit is the
    independence level (user, session), exactly like the DiD/jackknife
    conventions.

    Exactness: per-unit totals are BIGINT; (n, Sx, Sy, Sxx, Sxy, Syy)
    fold as BIGINT/DECIMAL moments; R and var(R) are fixed scalar
    chains — plain SQL replays every double.  Single-unit arms and
    zero denominators surface NULL se/ci (the fleiss convention).

    Shape: two keyed integer aggregations (unit, then arm) — nothing
    data-sized moves twice.

    Output: one row per arm — (arm, n_units, num, den, ratio, se,
    ci_lo, ci_hi).
    """
    x = F.col(num_cents_col).cast("long")
    y = F.col(den_count_col).cast("long")
    per_unit = df.groupBy(
        F.col(arm_col).alias("arm"), F.col(unit_col).alias("__u")
    ).agg(
        F.sum(x).cast("long").alias("xu"),
        F.sum(y).cast("long").alias("yu"),
    )
    xd = F.col("xu").cast("decimal(19,0)")
    yd = F.col("yu").cast("decimal(19,0)")
    m = per_unit.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xu").cast("long").alias("sx"),
        F.sum("yu").cast("long").alias("sy"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sxx"),
        F.sum(xd * yd).cast("decimal(38,0)").alias("sxy"),
        F.sum(yd * yd).cast("decimal(38,0)").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    ratio = F.when(F.col("sy") != 0, sxd / syd)
    ybar = syd / nd
    # ddof=0 central second moments via the (n*S** - S*S*)/n^2 form
    n_dec = F.col("n").cast("decimal(19,0)")
    cxx = (n_dec * F.col("sxx") - F.col("sx").cast("decimal(19,0)") * F.col("sx").cast("decimal(19,0)")).cast("double") / (nd * nd)
    cxy = (n_dec * F.col("sxy") - F.col("sx").cast("decimal(19,0)") * F.col("sy").cast("decimal(19,0)")).cast("double") / (nd * nd)
    cyy = (n_dec * F.col("syy") - F.col("sy").cast("decimal(19,0)") * F.col("sy").cast("decimal(19,0)")).cast("double") / (nd * nd)
    var_r = F.when(
        (F.col("n") >= 2) & (F.col("sy") != 0),
        (cxx - F.lit(2.0) * ratio * cxy + ratio * ratio * cyy)
        / (nd * ybar * ybar),
    )
    se = F.when(var_r >= 0, F.sqrt(var_r))
    return m.select(
        "arm",
        F.col("n").alias("n_units"),
        F.col("sx").alias("num"),
        F.col("sy").alias("den"),
        ratio.alias("ratio"),
        se.alias("se"),
        (ratio - F.lit(float(z)) * se).alias("ci_lo"),
        (ratio + F.lit(float(z)) * se).alias("ci_hi"),
    )


def post_stratified_mean(
    df: DataFrame,
    value_cents_col: str,
    *,
    arm_col: str,
    stratum_col: str,
) -> DataFrame:
    """Post-stratification estimator — reweight each arm's per-stratum
    means by the POOLED stratum shares, removing the imbalance noise
    randomization left in the stratum mix (the one-line variance
    reduction that needs no pre-period covariate, unlike CUPED):

        mu_post(arm) = sum_s W_s * mean(arm, s),   W_s = n_s / N (pooled)
        var_post(arm) ~= sum_s W_s^2 * var(arm, s) / n_{arm, s}

    Exactness: per-(arm, stratum) BIGINT/DECIMAL moments; shares and
    means are single divisions; the weighted folds sum per-stratum
    doubles floor-quantized to the 2^-20 dyadic grid (the jackknife
    convention) so cross-stratum sums are order-free.  Single-row
    cells surface NULL variance contributions (dropped from var with
    the cell count reported so starved cells are visible).

    Output: one row per arm — (arm, n, mean_raw, mean_post, se_post,
    n_starved_cells).
    """
    v = F.col(value_cents_col).cast("long")
    vd = v.cast("decimal(19,0)")
    # pin the FIRST keyed aggregation: strat/tot/j all derive from this
    # (arm x stratum)-row table, so the raw relation is scanned once
    cell = df.groupBy(
        F.col(arm_col).alias("arm"), F.col(stratum_col).alias("__s")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_c"),
        F.sum(v).cast("long").alias("s_c"),
        F.sum(vd * vd).cast("decimal(38,0)").alias("ss_c"),
    ).localCheckpoint(eager=True)
    strat = cell.groupBy("__s").agg(F.sum("n_c").cast("long").alias("n_s"))
    tot = strat.agg(F.sum("n_s").cast("long").alias("N"))
    j = cell.join(strat, "__s").crossJoin(F.broadcast(tot))
    ncd = F.col("n_c").cast("double")
    mean_c = F.col("s_c").cast("double") / ncd
    w_s = F.col("n_s").cast("double") / F.col("N").cast("double")
    grid = float(1 << 20)
    term_mean_q = F.floor(w_s * mean_c * F.lit(grid)).cast("long")
    var_num = (
        F.col("n_c").cast("decimal(19,0)") * F.col("ss_c")
        - F.col("s_c").cast("decimal(19,0)") * F.col("s_c").cast("decimal(19,0)")
    ).cast("double")
    var_c = F.when(F.col("n_c") >= 2, var_num / (ncd * (ncd - F.lit(1.0))))
    term_var_q = F.floor(w_s * w_s * var_c / ncd * F.lit(grid)).cast("long")
    # the quantized terms enter the groupBy via a projection
    agg = (
        j.select(
            "arm",
            "n_c",
            "s_c",
            term_mean_q.alias("tmq"),
            term_var_q.alias("tvq"),
        )
        .groupBy("arm")
        .agg(
            F.sum("n_c").cast("long").alias("n"),
            F.sum("s_c").cast("long").alias("s"),
            F.sum("tmq").cast("long").alias("mq"),
            F.sum("tvq").cast("long").alias("vq"),
            F.sum(F.when(F.col("tvq").isNull(), F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_starved_cells"),
        )
    )
    nd = F.col("n").cast("double")
    return agg.select(
        "arm",
        "n",
        (F.col("s").cast("double") / nd).alias("mean_raw"),
        (F.col("mq").cast("double") / F.lit(grid)).alias("mean_post"),
        F.sqrt(F.col("vq").cast("double") / F.lit(grid)).alias("se_post"),
        "n_starved_cells",
    )


def msprt_monitor(
    df: DataFrame,
    value_cents_col: str,
    *,
    arm_col: str,
    look_col: str,
    tau_cents: float,
    arms=None,
) -> DataFrame:
    """Mixture sequential probability ratio test (mSPRT, Johari et al.
    2017) — the ALWAYS-VALID inference discipline: unlike q260's
    group-sequential boundary (fixed look schedule) the mSPRT evidence
    may be read after EVERY observation without inflating alpha.  For
    the two-sample mean difference with a N(0, tau^2) mixture prior,

        log Lambda_n = ln(sqrt(V / (V + tau^2)))
                       + delta^2 * tau^2 / (2 V (V + tau^2))

    with delta the cumulative Welch mean difference and V its variance
    estimate; the always-valid p after look n is min(1, min_m<=n
    1/Lambda_m).  REPORTED IN LOG SPACE (log_lambda, neg_log10_p as a
    running max): exp(log Lambda) overflows float64 under strong
    effects, and a libm 1-ulp disagreement on a huge exp() cannot be
    absorbed by any quantization grid — ln of O(1) ratios can (the
    q249 convention: every ln floor-quantized to 2^-20).

    ``tau_cents`` is the prior scale of the effect in cents — set it
    near the minimum detectable effect; larger tau spends evidence
    faster early, smaller tau later (the standard mixture trade).

    Exactness: the same cumulative BIGINT/DECIMAL moment windows as
    q260; both ln calls floor-quantize to 2^-20; everything else is a
    fixed scalar chain — plain SQL replays every double.  Degenerate
    looks (n < 2 / zero variance) surface NULLs; a look where an arm
    contributed NO new rows is OMITTED from the output entirely (the
    two cumulative sides inner-join on look — the q260 convention),
    not emitted with NULLs.

    Output: one row per look — (look, n_control, n_treatment,
    delta_cents, v_hat, log_lambda, neg_log10_p), ordered by look;
    neg_log10_p is the running max of log10 evidence, floored at 0.
    """
    from pyspark.sql import Window

    df, arms = _two_arms(df, arm_col, arms, "msprt_monitor")
    if not float(tau_cents) > 0:
        raise ValueError(f"tau_cents must be > 0, got {tau_cents}")
    ctrl, trt = arms
    v = F.col(value_cents_col).cast("long")
    vd = v.cast("decimal(19,0)")
    # pin the FIRST keyed aggregation: every downstream window/fold/join
    # derives from this (look x arm)-row table, so the raw relation is
    # scanned exactly once
    per = df.groupBy(F.col(look_col).alias("look"), F.col(arm_col).alias("__a")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).cast("long").alias("s"),
        F.sum(vd * vd).cast("decimal(38,0)").alias("ss"),
    ).localCheckpoint(eager=True)
    w = (
        Window.partitionBy("__a")
        .orderBy("look")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per.select(
        "look",
        "__a",
        F.sum("n").over(w).cast("long").alias("cn"),
        F.sum("s").over(w).cast("long").alias("cs"),
        F.sum("ss").over(w).cast("decimal(38,0)").alias("css"),
    )

    def side(arm, tag):
        return cum.filter(F.col("__a") == arm).select(
            "look",
            F.col("cn").alias(f"n_{tag}"),
            F.col("cs").alias(f"s_{tag}"),
            F.col("css").alias(f"ss_{tag}"),
        )

    j = side(ctrl, "c").join(side(trt, "t"), "look")

    def mv(tag):
        n = F.col(f"n_{tag}")
        nd = n.cast("double")
        mean = F.col(f"s_{tag}").cast("double") / nd
        var_num = (
            n.cast("decimal(19,0)") * F.col(f"ss_{tag}")
            - F.col(f"s_{tag}").cast("decimal(19,0)")
            * F.col(f"s_{tag}").cast("decimal(19,0)")
        ).cast("double")
        var = F.when(n >= 2, var_num / (nd * (nd - F.lit(1.0))))
        return mean, var, nd

    mean_c, var_c, nd_c = mv("c")
    mean_t, var_t, nd_t = mv("t")
    delta = mean_t - mean_c
    vhat = var_t / nd_t + var_c / nd_c
    tau2 = F.lit(float(tau_cents)) * F.lit(float(tau_cents))
    grid = F.lit(float(1 << 20))

    def qln(x):
        return F.floor(F.log(x) * grid) / grid

    log_lambda = F.when(
        vhat > 0,
        F.lit(0.5) * qln(vhat / (vhat + tau2))
        + delta * delta * tau2 / (F.lit(2.0) * vhat * (vhat + tau2)),
    )
    scored = j.select(
        "look",
        F.col("n_c").alias("n_control"),
        F.col("n_t").alias("n_treatment"),
        delta.alias("delta_cents"),
        vhat.alias("v_hat"),
        log_lambda.alias("log_lambda"),
    )
    wl = Window.orderBy("look").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ln10 = 2.302585092994046
    return scored.withColumn(
        "neg_log10_p",
        F.greatest(
            F.lit(0.0), F.max(F.col("log_lambda") / F.lit(ln10)).over(wl)
        ),
    ).orderBy("look")


def ks_two_sample(
    df: DataFrame,
    value_cents_col: str,
    *,
    arm_col: str,
    by: str | None = None,
    arms=None,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test — the WHOLE-DISTRIBUTION
    drift readout: q252's rank test targets a location shift and q204 a
    mean shift; KS fires on ANY ECDF divergence (variance inflation, a
    new mode in one tail) with D = sup_x |F_c(x) - F_t(x)|.

    Exact integer construction — on the DISTINCT-VALUE grid (the
    mann_whitney_u convention, never a per-row sort): per value,
    (count, treatment count); one cumulative window gives both ECDF
    numerators, and the sup is

        D = max over values of |cum_c * n_t - cum_t * n_c| / (n_c*n_t)

    whose numerator is an exact DECIMAL integer, so the argmax and the
    statistic replay bit-for-bit in any SQL engine.  The asymptotic
    p-value uses the Kolmogorov limiting series with the standard
    small-sample correction (Stephens 1970, the Numerical Recipes
    form):

        lam = (sqrt(ne) + 0.12 + 0.11/sqrt(ne)) * D,  ne = n_c*n_t/N
        p   = 2 * sum_{j=1..5} (-1)^{j-1} exp(-2 j^2 lam^2)

    with each exp floor-quantized to the 2^-20 grid (the normal_sf_q
    convention — a cross-libm 1-ulp disagreement is absorbed) and the
    five terms folded in a FIXED left-to-right order; truncation past
    j=5 is < 1e-22 for any lam where the decision could flip.  p is
    clamped to [0, 1].

    Shape: ONE keyed aggregation onto the value grid (map-side
    combine), one grid-sized cumulative window, one scalar fold per
    group — subjects never sort globally.

    Output: ([by,] n_control, n_treatment, d_stat, ks_lambda, p_value),
    arms = the two DISTINCT ``arm_col`` values ascending (control,
    treatment).  Groups where an arm is empty (possible under ``by=``)
    surface NULL d_stat/ks_lambda/p_value — the fleiss_kappa
    degenerate-input convention.
    """
    from pyspark.sql import Window

    df, arms = _two_arms(df, arm_col, arms, "ks_two_sample")
    _, trt = arms
    gcols = [by] if by else []
    v = F.col(value_cents_col).cast("long")
    base = df.select(*gcols, F.col(arm_col).alias("__a"), v.alias("__v"))
    grid = base.groupBy(*gcols, "__v").agg(
        F.count(F.lit(1)).cast("long").alias("__c"),
        F.sum((F.col("__a") == trt).cast("int")).cast("long").alias("__ct"),
    )
    return ks_from_grid(grid, gcols=gcols)


def ks_from_grid(grid: DataFrame, *, gcols: list[str]) -> DataFrame:
    """Finalize a pooled value grid ([gcols,] __v long, __c long total
    count, __ct long treatment count) into the ks_two_sample output —
    the ONE definition of the KS math, shared by the batch operator and
    the streaming readout (``streaming/drift.ks_from_registry`` over
    the ST36 rank-test registry: per-value counts are additive across
    batches, so the SAME registry serves both the rank test and the
    distribution test)."""
    from pyspark.sql import Window

    wg = Window.partitionBy(*gcols).orderBy(F.col("__v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wfull = Window.partitionBy(*gcols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = grid.select(
        *gcols,
        F.sum("__c").over(wg).cast("decimal(19,0)").alias("__cum"),
        F.sum("__ct").over(wg).cast("decimal(19,0)").alias("__cumt"),
        F.sum("__c").over(wfull).cast("long").alias("__n"),
        F.sum("__ct").over(wfull).cast("long").alias("__nt"),
    )
    # |cum_c*n_t - cum_t*n_c| = |(cum - cum_t)*n_t - cum_t*(n - n_t)|
    ntd = F.col("__nt").cast("decimal(19,0)")
    ncd = (F.col("__n") - F.col("__nt")).cast("decimal(19,0)")
    num = F.abs(
        (F.col("__cum") - F.col("__cumt")) * ntd - F.col("__cumt") * ncd
    ).cast("decimal(38,0)")
    agg = cum.groupBy(*gcols).agg(
        F.max(num).alias("__dnum"),
        F.max(F.col("__n") - F.col("__nt")).cast("long").alias("n_control"),
        F.max("__nt").cast("long").alias("n_treatment"),
    )
    n1 = F.col("n_control").cast("double")
    n2 = F.col("n_treatment").cast("double")
    both = (F.col("n_control") > 0) & (F.col("n_treatment") > 0)
    d = F.when(both, F.col("__dnum").cast("double") / (n1 * n2))
    ne = n1 * n2 / (n1 + n2)
    lam = F.when(
        both,
        (F.sqrt(ne) + F.lit(0.12) + F.lit(0.11) / F.sqrt(ne)) * d,
    )
    g = F.lit(float(1 << 20))

    def qexp(x):
        return F.floor(F.exp(x) * g) / g

    l2 = lam * lam
    p_raw = F.lit(2.0) * (
        qexp(F.lit(-2.0) * l2)
        - qexp(F.lit(-8.0) * l2)
        + qexp(F.lit(-18.0) * l2)
        - qexp(F.lit(-32.0) * l2)
        + qexp(F.lit(-50.0) * l2)
    )
    p = F.when(both, F.least(F.lit(1.0), F.greatest(F.lit(0.0), p_raw)))
    return agg.select(
        *gcols,
        "n_control",
        "n_treatment",
        d.alias("d_stat"),
        lam.alias("ks_lambda"),
        p.alias("p_value"),
    )


def cluster_robust_lift(
    df: DataFrame,
    value_cents_col: str,
    *,
    arm_col: str,
    cluster_col: str,
    arms=None,
) -> DataFrame:
    """Cluster-randomized A/B readout — arm means with CLUSTER-ROBUST
    standard errors (Liang–Zeger sandwich for an intercept-only model,
    clusters as the independent units).  When randomization is by
    cluster (user, session, store) but rows are events, the iid q204
    SE is wrong by the design effect — often several-fold — and this
    is the readout that says so honestly:

        mean_a  = S_a / n_a                     (integer sums)
        var_a   = G_a/(G_a-1) * sum_g (S_g - n_g * mean_a)^2 / n_a^2
        lift    = mean_t - mean_c,   z = lift / sqrt(var_c + var_t)

    Exactness: per-(arm, cluster) BIGINT sums; each cluster's squared
    residual is one fixed double chain floor-quantized to the
    2^16-cents^2 grid before the cross-cluster fold (the james_stein
    overflow-safe convention — sums in DECIMAL), so the fold is
    order-free and plain SQL replays every double.  The naive iid SE
    (same Welch chain as q204) is reported alongside so the design
    effect is visible in one row.

    Shape: ONE keyed integer aggregation onto the (arm x cluster) grid
    (pinned — everything downstream derives from it, raw scanned
    once), then 2-row folds and broadcast joins.

    Output: ONE row — (n_control, n_treatment, g_control, g_treatment,
    mean_control, mean_treatment, lift_cents, se_cluster, z,
    se_naive); arms = the two DISTINCT values ascending (control,
    treatment).  An arm with fewer than 2 clusters surfaces NULL
    se_cluster/z (the variance is undefined), never NaN.
    """
    df, arms = _two_arms(df, arm_col, arms, "cluster_robust_lift")
    ctrl, trt = arms
    v = F.col(value_cents_col).cast("long")
    vd = v.cast("decimal(19,0)")
    # pin the FIRST keyed aggregation: raw scanned exactly once
    cell = df.groupBy(
        F.col(arm_col).alias("__a"), F.col(cluster_col).alias("__g")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(v).cast("long").alias("s_g"),
        F.sum(vd * vd).cast("decimal(38,0)").alias("ss_g"),
    ).localCheckpoint(eager=True)
    tot = cell.groupBy("__a").agg(
        F.count(F.lit(1)).cast("long").alias("G"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("long").alias("s"),
        F.sum("ss_g").cast("decimal(38,0)").alias("ss"),
    )
    j = cell.join(F.broadcast(tot), "__a")
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    e = F.col("s_g").cast("double") - F.col("n_g").cast("double") * mean
    eq = F.floor(e * e / F.lit(_JS_GRID)).cast("long")
    per_arm = j.groupBy("__a", "G", "n", "s", "ss").agg(
        F.sum(eq.cast("decimal(19,0)")).cast("decimal(38,0)").alias("eq_sum")
    )

    def side(arm, tag):
        return per_arm.filter(F.col("__a") == arm).select(
            F.col("G").alias(f"g_{tag}"),
            F.col("n").alias(f"n_{tag}"),
            F.col("s").alias(f"s_{tag}"),
            F.col("ss").alias(f"ss_{tag}"),
            F.col("eq_sum").alias(f"eq_{tag}"),
        )

    out = side(ctrl, "c").crossJoin(side(trt, "t"))

    def arm_cols(tag):
        nd = F.col(f"n_{tag}").cast("double")
        m = F.col(f"s_{tag}").cast("double") / nd
        gd = F.col(f"g_{tag}").cast("double")
        var_cl = F.when(
            F.col(f"g_{tag}") >= 2,
            gd
            / (gd - F.lit(1.0))
            * (F.col(f"eq_{tag}").cast("double") * F.lit(_JS_GRID))
            / (nd * nd),
        )
        # naive iid variance of the mean (Welch building block):
        # sample var / n with exact decimal numerator
        var_num = (
            F.col(f"n_{tag}").cast("decimal(19,0)") * F.col(f"ss_{tag}")
            - F.col(f"s_{tag}").cast("decimal(19,0)")
            * F.col(f"s_{tag}").cast("decimal(19,0)")
        ).cast("double")
        var_iid = F.when(
            F.col(f"n_{tag}") >= 2, var_num / (nd * nd * (nd - F.lit(1.0)))
        )
        return m, var_cl, var_iid

    mean_c, vcl_c, viid_c = arm_cols("c")
    mean_t, vcl_t, viid_t = arm_cols("t")
    se_cl = F.sqrt(vcl_c + vcl_t)
    se_naive = F.sqrt(viid_c + viid_t)
    lift = mean_t - mean_c
    return out.select(
        F.col("n_c").alias("n_control"),
        F.col("n_t").alias("n_treatment"),
        F.col("g_c").alias("g_control"),
        F.col("g_t").alias("g_treatment"),
        mean_c.alias("mean_control"),
        mean_t.alias("mean_treatment"),
        lift.alias("lift_cents"),
        se_cl.alias("se_cluster"),
        F.when(se_cl > 0, lift / se_cl).alias("z"),
        se_naive.alias("se_naive"),
    )


def srm_check(
    df: DataFrame,
    *,
    arm_col: str,
    expected_control: float = 0.5,
    alpha: float = 0.001,
    arms=None,
) -> DataFrame:
    """Sample-ratio-mismatch check — the FIRST gate every experiment
    readout should pass: if the realized arm split is statistically
    incompatible with the design ratio, the assignment pipeline is
    broken (bot filtering, redirect loss, logging lag) and every
    downstream lift number is untrustworthy.  Chi-square
    goodness-of-fit on the two arm counts; with one degree of freedom
    chi2_1 = Z^2, so the p-value is the engine's cross-engine normal
    chain:  p = 2 * normal_sf_q(sqrt(chi2)) — no gamma function needed
    (the reason this stays 2-arm; k-arm SRM wants a chi2_{k-1} CDF).

    The conventional SRM alpha is 0.001, not 0.05 (an SRM alarm stops
    the experiment, so it must essentially never false-fire;
    Fabijan et al. 2019).

    Exactness: integer counts, fixed double chains, the one exp inside
    normal_sf_q floor-quantized 2^-20 — plain SQL replays every double.
    Shape: ONE count-by-arm aggregation (2 rows), scalars after.

    Output: ONE row — (n_control, n_treatment, expected_control,
    chi2, p_value, srm).  Arms = the two DISTINCT values ascending
    (control, treatment).  An empty arm still yields a finite chi2
    (the count is 0), which is exactly when SRM must scream.
    """
    r = float(expected_control)
    if not 0.0 < r < 1.0:
        raise ValueError(f"expected_control must be in (0,1), got {r}")
    df, arms = _two_arms(df, arm_col, arms, "srm_check")
    ctrl, _ = arms
    agg = df.groupBy().agg(
        F.sum((F.col(arm_col) == ctrl).cast("int")).cast("long").alias("n_control"),
        F.sum((F.col(arm_col) != ctrl).cast("int")).cast("long").alias("n_treatment"),
    )
    return srm_from_counts(agg, expected_control=r, alpha=alpha)


def srm_from_counts(
    agg: DataFrame, *, expected_control: float = 0.5, alpha: float = 0.001
) -> DataFrame:
    """Finalize a ONE-row (n_control, n_treatment) count table into the
    srm_check output — the ONE definition of the SRM math, shared by
    the batch operator and the streaming readout
    (``streaming/drift.srm_from_registry``)."""
    r = float(expected_control)
    nc = F.col("n_control").cast("double")
    nt = F.col("n_treatment").cast("double")
    n = nc + nt
    ec = n * F.lit(r)
    et = n * F.lit(1.0 - r)
    chi2 = (nc - ec) * (nc - ec) / ec + (nt - et) * (nt - et) / et
    p = F.lit(2.0) * normal_sf_q(F.sqrt(chi2))
    return agg.select(
        "n_control",
        "n_treatment",
        F.lit(r).alias("expected_control"),
        chi2.alias("chi2"),
        p.alias("p_value"),
        (p < F.lit(float(alpha))).alias("srm"),
    )


def tost_equivalence(
    df: DataFrame,
    value_cents_col: str,
    *,
    arm_col: str,
    margin_cents: float,
    alpha: float = 0.05,
    arms=None,
) -> DataFrame:
    """TOST equivalence test (Schuirmann 1987) — the readout for "the
    new variant is NOT meaningfully different": failing to reject a
    q204 null is NOT evidence of equivalence (underpowered tests fail
    to reject everything), so ship/no-ship-by-parity decisions need two
    one-sided tests against an explicit margin:

        H0_lower: delta <= -m   rejected when z_low  = (d + m)/se big
        H0_upper: delta >= +m   rejected when z_high = (d - m)/se small
        p_tost = max(SF(z_low), SF(-z_high));  equivalent iff p < alpha

    Exactness: per-arm BIGINT/DECIMAL Welch moments (the q204 chain),
    both tail probabilities through the engine's cross-engine
    normal_sf_q (one 2^-20-quantized exp each) — plain SQL replays
    every double.  Shape: ONE keyed integer aggregation (2 rows),
    scalars after.

    Output: ONE row — (n_control, n_treatment, lift_cents, se,
    margin_cents, z_lower, z_upper, p_lower, p_upper, p_tost,
    equivalent).  Degenerate arms (n < 2 or zero variance) surface
    NULLs, never NaN.
    """
    m = float(margin_cents)
    if not m > 0:
        raise ValueError(f"margin_cents must be > 0, got {margin_cents}")
    df, arms = _two_arms(df, arm_col, arms, "tost_equivalence")
    ctrl, trt = arms
    per = _welch_moments(df, value_cents_col, arm_col=arm_col)
    return tost_from_moments(
        _moment_pivot(per, ctrl, trt), margin_cents=m, alpha=alpha
    )


def _welch_moments(df: DataFrame, value_cents_col: str, *, arm_col: str) -> DataFrame:
    """Per-arm (n, s, ss) BIGINT/DECIMAL Welch moments — the q204
    aggregation, shared by the batch two-sample ops and derivable
    EXACTLY from the ST36 per-(value, arm) grid (s = sum v*n,
    ss = sum v^2*n — integer arithmetic either way)."""
    v = F.col(value_cents_col).cast("long")
    vd = v.cast("decimal(19,0)")
    return df.groupBy(F.col(arm_col).alias("__a")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(v).cast("long").alias("s"),
        F.sum(vd * vd).cast("decimal(38,0)").alias("ss"),
    )


def _moment_pivot(per: DataFrame, ctrl, trt) -> DataFrame:
    """(__a, n, s, ss) 2-row moment table -> ONE pivoted row
    (n_c, s_c, ss_c, n_t, s_t, ss_t)."""

    def side(arm, tag):
        return per.filter(F.col("__a") == arm).select(
            F.col("n").alias(f"n_{tag}"),
            F.col("s").alias(f"s_{tag}"),
            F.col("ss").alias(f"ss_{tag}"),
        )

    return side(ctrl, "c").crossJoin(side(trt, "t"))


def _welch_mv(tag: str):
    """(mean, sample-var-or-NULL, n-as-double) columns from a pivoted
    moment row — the ONE Welch building block."""
    n = F.col(f"n_{tag}")
    nd = n.cast("double")
    mean = F.col(f"s_{tag}").cast("double") / nd
    var_num = (
        n.cast("decimal(19,0)") * F.col(f"ss_{tag}")
        - F.col(f"s_{tag}").cast("decimal(19,0)")
        * F.col(f"s_{tag}").cast("decimal(19,0)")
    ).cast("double")
    var = F.when(n >= 2, var_num / (nd * (nd - F.lit(1.0))))
    return mean, var, nd


def tost_from_moments(
    j: DataFrame, *, margin_cents: float, alpha: float = 0.05
) -> DataFrame:
    """Finalize a pivoted Welch-moment row into the tost_equivalence
    output — the ONE definition of the TOST math, shared by the batch
    operator and the streaming readout
    (``streaming/drift.tost_from_registry``)."""
    m = float(margin_cents)
    mean_c, var_c, nd_c = _welch_mv("c")
    mean_t, var_t, nd_t = _welch_mv("t")
    delta = mean_t - mean_c
    se_raw = F.sqrt(var_t / nd_t + var_c / nd_c)
    se = F.when(se_raw > 0, se_raw)
    z_low = (delta + F.lit(m)) / se
    z_high = (delta - F.lit(m)) / se
    p_low = normal_sf_q(z_low)
    p_high = normal_sf_q(-z_high)
    p_tost = F.greatest(p_low, p_high)
    return j.select(
        F.col("n_c").alias("n_control"),
        F.col("n_t").alias("n_treatment"),
        delta.alias("lift_cents"),
        se.alias("se"),
        F.lit(m).alias("margin_cents"),
        z_low.alias("z_lower"),
        z_high.alias("z_upper"),
        p_low.alias("p_lower"),
        p_high.alias("p_upper"),
        p_tost.alias("p_tost"),
        (p_tost < F.lit(float(alpha))).alias("equivalent"),
    )


def brown_forsythe(
    df: DataFrame,
    value_cents_col: str,
    *,
    arm_col: str,
    by: str | None = None,
    arms=None,
) -> DataFrame:
    """Brown-Forsythe variance test — "did the treatment change the
    SPREAD?": the robust Levene variant on absolute deviations from the
    per-arm MEDIAN, read as a Welch z on the transformed values.  The
    q204/q252 location readouts are blind to pure dispersion changes
    and q265's KS fires without saying WHAT changed; this is the
    variance-specific answer (a risk metric: a variant that helps the
    mean while widening the tails shows up here).

    Exact integer construction — on the DISTINCT-VALUE grid end to end
    (the mann_whitney_u/ks convention, never a per-row sort): per-arm
    medians are the smallest grid value whose cumulative count reaches
    ceil(n/2) (the weighted_median type-1 rank rule), deviations
    |v - med| are BIGINTs, and the Welch chain runs on BIGINT/DECIMAL
    deviation moments; p = 2 * normal_sf_q(|z|) through the quantized
    cross-engine normal — plain SQL replays every double.

    Shape: ONE keyed aggregation onto the (value x arm) grid, one
    grid-sized cumulative window for the medians, one grid-sized
    moment fold — subjects never sort globally.

    Output: ([by,] n_control, n_treatment, median_control,
    median_treatment, mad_control, mad_treatment, z, p_value); mad_* =
    mean |v - median| per arm.  Degenerate groups (an arm empty or
    under 2 rows, or zero deviation variance) surface NULL z/p — the
    fleiss_kappa convention.
    """
    df, arms = _two_arms(df, arm_col, arms, "brown_forsythe")
    _, trt = arms
    gcols = [by] if by else []
    v = F.col(value_cents_col).cast("long")
    base = df.select(*gcols, F.col(arm_col).alias("__a"), v.alias("__v"))
    grid = base.groupBy(*gcols, "__v").agg(
        F.count(F.lit(1)).cast("long").alias("__c"),
        F.sum((F.col("__a") == trt).cast("int")).cast("long").alias("__ct"),
    )
    return brown_forsythe_from_grid(grid, gcols=gcols)


def brown_forsythe_from_grid(grid: DataFrame, *, gcols: list[str]) -> DataFrame:
    """Finalize a pooled value grid ([gcols,] __v, __c, __ct) into the
    brown_forsythe output — the ONE definition of the BF math, shared
    by the batch operator and the streaming readout
    (``streaming/drift.brown_forsythe_from_registry`` over the SAME
    ST36 grid the rank/KS tests read)."""
    from pyspark.sql import Window

    per = grid.select(
        *gcols, "__v", (F.col("__c") - F.col("__ct")).alias("__n"), F.lit("c").alias("__t")
    ).unionByName(
        grid.select(*gcols, "__v", F.col("__ct").alias("__n"), F.lit("t").alias("__t"))
    ).filter(F.col("__n") > 0)
    wv = Window.partitionBy(*gcols, "__t").orderBy(F.col("__v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wfull = Window.partitionBy(*gcols, "__t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per.select(
        *gcols, "__v", "__n", "__t",
        F.sum("__n").over(wv).alias("__cum"),
        F.sum("__n").over(wfull).alias("__tot"),
    )
    med = (
        cum.filter(
            F.col("__cum") >= F.ceil(F.col("__tot").cast("double") / F.lit(2.0))
        )
        .groupBy(*gcols, "__t")
        .agg(F.min("__v").alias("__med"))
    )
    dev = cum.join(med, gcols + ["__t"])
    d = F.abs(F.col("__v") - F.col("__med"))
    dd = d.cast("decimal(19,0)")
    nd19 = F.col("__n").cast("decimal(19,0)")
    mom = dev.groupBy(*gcols, "__t").agg(
        F.sum("__n").cast("long").alias("n"),
        F.max("__med").cast("long").alias("med"),
        F.sum(F.col("__n") * d).cast("long").alias("s"),
        F.sum(nd19 * dd * dd).cast("decimal(38,0)").alias("ss"),
    )

    def side(tag):
        return mom.filter(F.col("__t") == tag).select(
            *gcols,
            F.col("n").alias(f"n_{tag}"),
            F.col("med").alias(f"med_{tag}"),
            F.col("s").alias(f"s_{tag}"),
            F.col("ss").alias(f"ss_{tag}"),
        )

    if gcols:
        j = side("c").join(side("t"), gcols, "full_outer")
    else:
        j = side("c").crossJoin(side("t"))

    def mv(tag):
        n = F.col(f"n_{tag}")
        nd = n.cast("double")
        mean = F.col(f"s_{tag}").cast("double") / nd
        var_num = (
            n.cast("decimal(19,0)") * F.col(f"ss_{tag}")
            - F.col(f"s_{tag}").cast("decimal(19,0)")
            * F.col(f"s_{tag}").cast("decimal(19,0)")
        ).cast("double")
        var = F.when(n >= 2, var_num / (nd * (nd - F.lit(1.0))))
        return mean, var, nd

    mean_c, var_c, nd_c = mv("c")
    mean_t, var_t, nd_t = mv("t")
    se_raw = F.sqrt(var_t / nd_t + var_c / nd_c)
    z = F.when(se_raw > 0, (mean_t - mean_c) / se_raw)
    p = F.lit(2.0) * normal_sf_q(F.abs(z))
    return j.select(
        *gcols,
        F.col("n_c").alias("n_control"),
        F.col("n_t").alias("n_treatment"),
        F.col("med_c").alias("median_control"),
        F.col("med_t").alias("median_treatment"),
        mean_c.alias("mad_control"),
        mean_t.alias("mad_treatment"),
        z.alias("z"),
        p.alias("p_value"),
    )


def power_mde(
    df: DataFrame,
    value_cents_col: str,
    *,
    arm_col: str,
    z_alpha: float = 1.959963984540054,
    z_power: float = 0.8416212335729143,
    arms=None,
) -> DataFrame:
    """Minimum detectable effect at the CURRENT sample — the
    experiment-design readout every "no significant difference" claim
    needs beside it: with the observed per-arm variances and counts,

        MDE = (z_alpha + z_power) * se(difference)

    is the smallest true lift this experiment would detect with the
    given power (defaults: two-sided alpha 0.05, power 0.80 — the z
    constants are PARAMETERS, documented as quantiles, so no inverse
    normal CDF enters the engine).  A q204 null with MDE >> the effect
    you care about is an underpowered shrug, not evidence of parity
    (q268's TOST is the formal version against an explicit margin;
    this is the planning number).

    Exactness: the q204 Welch moment chain (BIGINT/DECIMAL) and two
    literal multipliers — plain SQL replays every double.  Shape: ONE
    keyed integer aggregation (2 rows), scalars after.

    Output: ONE row — (n_control, n_treatment, mean_control, se,
    mde_cents, mde_rel); mde_rel = mde / |mean_control| (NULL when the
    control mean is 0).  Degenerate arms (n < 2) surface NULLs.
    """
    df, arms = _two_arms(df, arm_col, arms, "power_mde")
    ctrl, trt = arms
    per = _welch_moments(df, value_cents_col, arm_col=arm_col)
    return power_mde_from_moments(
        _moment_pivot(per, ctrl, trt), z_alpha=z_alpha, z_power=z_power
    )


def power_mde_from_moments(
    j: DataFrame,
    *,
    z_alpha: float = 1.959963984540054,
    z_power: float = 0.8416212335729143,
) -> DataFrame:
    """Finalize a pivoted Welch-moment row into the power_mde output —
    the ONE definition of the MDE math, shared by the batch operator
    and the streaming readout (``streaming/drift.power_mde_from_registry``)."""
    mean_c, var_c, nd_c = _welch_mv("c")
    _, var_t, nd_t = _welch_mv("t")
    se = F.sqrt(var_t / nd_t + var_c / nd_c)
    mde = (F.lit(float(z_alpha)) + F.lit(float(z_power))) * se
    return j.select(
        F.col("n_c").alias("n_control"),
        F.col("n_t").alias("n_treatment"),
        mean_c.alias("mean_control"),
        se.alias("se"),
        mde.alias("mde_cents"),
        F.when(F.abs(mean_c) > 0, mde / F.abs(mean_c)).alias("mde_rel"),
    )


def srm_check_k(
    df: DataFrame,
    *,
    arm_col: str,
    expected: dict | None = None,
    alpha: float = 0.001,
) -> DataFrame:
    """k-arm sample-ratio-mismatch check — the q267 gate generalized to
    multi-variant experiments: chi-square goodness-of-fit of the k arm
    counts against the design ratios, with the chi2_{k-1} tail through
    the ENGINE-EXACT closed-form integer-df survival function
    (``chi2_sf_q``: df even -> a finite Poisson sum, df odd -> the
    shared normal-SF chain plus a finite polynomial — exact to the
    2^-20 exp grid, ~3 orders tighter than Wilson-Hilferty).  The WH
    cube-root approximation,

        z = ((chi2/df)^(1/3) - (1 - 2/(9 df))) / sqrt(2/(9 df)),
        p_wh ~= normal_sf_q(z)

    is kept as a CROSS-CHECK column ``p_value_wh`` (~3e-3 absolute
    error at moderate p for df = 2, tightening in the alarm tails);
    the verdict uses the exact tail.  The 2-arm path is ``srm_check``.

    Arm universe: with explicit ``expected`` the DESIGN defines the
    arm set — every expected key appears in the output, and a design
    arm that logged ZERO rows is zero-filled so its chi2 contribution
    is its full expected count and the gate fires hard (a fully-dead
    arm is exactly the assignment loss this gate exists to catch);
    observed arms missing from ``expected`` raise.  With the default
    uniform ``expected`` the arm set is the OBSERVED one — a fully-
    missing arm is then UNDETECTABLE by construction (k shrinks and
    the remaining arms are tested as a uniform (k-1)-split); pass the
    design's ratios explicitly when dead-arm detection matters.
    ``expected`` maps arm -> design ratio (must sum to 1 within 1e-9).

    Exactness: integer counts; each arm's chi2 contribution is one
    fixed double chain floor-quantized to the 2^-20 grid before the
    cross-arm sum (order-free — the engine's fold convention); exp is
    grid-quantized and sqrt is IEEE-exact inside both tails — plain
    SQL replays every double.  Shape: ONE count-by-arm aggregation
    (k rows), a broadcast ratio join, scalars after.

    Output: one row per arm, ordered — (arm, n, expected_ratio,
    expected_n, contrib_q) with the shared verdict columns repeated
    (n_total, df, chi2, p_value, p_value_wh, srm) — the per-arm detail
    is what a firing SRM alarm gets debugged with.
    """
    obs = [r[0] for r in df.select(arm_col).distinct().orderBy(arm_col).collect()]
    if expected is None:
        if len(obs) < 2:
            raise ValueError(f"srm_check_k needs >= 2 arms, got {obs}")
        expected = {a: 1.0 / len(obs) for a in obs}
        arms = obs
    else:
        arms = sorted(expected)
        if len(arms) < 2:
            raise ValueError(f"srm_check_k needs >= 2 arms, got {arms}")
        extra = [a for a in obs if a not in expected]
        if extra:
            raise ValueError(f"expected ratios missing for arms {extra}")
    k = len(arms)
    tot_r = sum(float(expected[a]) for a in arms)
    if abs(tot_r - 1.0) > 1e-9:
        raise ValueError(f"expected ratios must sum to 1, got {tot_r}")
    if any(not 0.0 < float(expected[a]) < 1.0 for a in arms):
        raise ValueError("every expected ratio must be in (0,1)")
    spark = df.sparkSession
    # one slice (plans.local_rows rationale) with the original
    # inferred arm type preserved: arm columns are usually strings but
    # the contract never required it
    ratios = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(a, float(expected[a])) for a in arms], 1
        ),
        ["arm", "expected_ratio"],
    )
    per = df.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = per.agg(F.sum("n").cast("long").alias("n_total"))
    # the DESIGN (ratios) is the left side: a design arm with zero
    # observed rows survives the join with n = 0 and contributes its
    # full expected count to chi2
    j = (
        F.broadcast(ratios)
        .join(per, "arm", "left")
        .na.fill({"n": 0})
        .crossJoin(F.broadcast(tot))
    )
    grid = F.lit(float(1 << 20))
    en = F.col("n_total").cast("double") * F.col("expected_ratio")
    contrib = (F.col("n").cast("double") - en) * (F.col("n").cast("double") - en) / en
    cq = F.floor(contrib * grid) / grid
    detail = j.select(
        "arm", "n", "expected_ratio", en.alias("expected_n"),
        cq.alias("contrib_q"), "n_total",
    )
    dfree = float(k - 1)
    c1 = 1.0 - 2.0 / (9.0 * dfree)
    c2 = (2.0 / (9.0 * dfree)) ** 0.5
    folded = detail.agg(F.sum("contrib_q").alias("chi2"))
    # WH cross-check: cbrt is a libm call (JVM vs DuckDB differ by
    # 1 ulp) — floor-quantize its output to the 2^-20 grid
    qcbrt = F.floor(F.cbrt(F.col("chi2") / F.lit(dfree)) * grid) / grid
    z = (qcbrt - F.lit(c1)) / F.lit(c2)
    p_exact = chi2_sf_q(F.col("chi2"), k - 1)
    verdict = folded.select(
        "chi2",
        F.lit(int(k - 1)).alias("df"),
        p_exact.alias("p_value"),
        normal_sf_q(z).alias("p_value_wh"),
        (p_exact < F.lit(float(alpha))).alias("srm"),
    )
    return detail.crossJoin(F.broadcast(verdict)).select(
        "arm", "n", "expected_ratio", "expected_n", "contrib_q",
        "n_total", "df", "chi2", "p_value", "p_value_wh", "srm",
    ).orderBy("arm")


def chi2_independence(
    df: DataFrame,
    *,
    row_col: str,
    col_col: str,
    alpha: float = 0.05,
) -> DataFrame:
    """Chi-square test of independence over an r x c contingency table
    — the categorical companion of the two-sample panel (does metric
    CATEGORY depend on segment: event type by user cohort, language by
    source, conversion bucket by arm).  chi2 = sum (O - E)^2 / E with
    E = row_total * col_total / n over ALL r*c cells (a zero observed
    cell contributes its full expected count), df = (r-1)(c-1), and
    the tail through the ENGINE-EXACT closed-form integer-df survival
    function (``chi2_sf_q`` — the q272 chain).

    Exactness: cell/row/column counts are INTEGERS; E and each cell's
    contribution are fixed double chains, floor-quantized to the 2^-20
    grid per cell before the order-free cross-cell sum (the engine's
    fold convention); the tail is the quantized-exp closed form —
    plain SQL replays every double.

    Distributed shape: ONE data-sized groupBy onto the (row, col) cell
    grid; row totals, column totals, the r x c dense grid (so zero
    cells exist), and the 1-row fold are all CELL-sized; the only
    driver-side values are r and c (one cell-sized aggregate action,
    needed because the closed-form tail is built into the plan for a
    literal df).  Categories are assumed driver-describable (segments,
    arms, types — not raw ids); at 100 TB the single exchange is the
    groupBy onto the cell grid.

    Output: one row per cell, ordered — (row_key, col_key, n,
    expected_n, contrib_q) with the shared verdict repeated (n_total,
    df, chi2, p_value, cramers_v, dependent) — the per-cell detail
    shows WHICH cells drive a firing test; ``cramers_v`` =
    sqrt(chi2 / (n * min(r-1, c-1))) is the effect size the p-value
    alone hides at large n (sqrt is IEEE-exact, the chain replays).
    """
    rk = F.col(row_col).alias("row_key")
    ck = F.col(col_col).alias("col_key")
    per = (
        df.select(rk, ck)
        .groupBy("row_key", "col_key")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=True)
    )
    return chi2_from_cells(per, alpha=alpha)


def chi2_from_cells(per: DataFrame, *, alpha: float = 0.05) -> DataFrame:
    """The ONE chi-square-independence finalizer, shared by the batch
    operator (``chi2_independence``) and the streaming readout
    (``streaming/drift.chi2_independence_from_registry``): consumes the
    already-aggregated cell grid (row_key, col_key, n) — which is
    exactly what a streaming registry folds additively — and produces
    the identical output, so registry finalize == batch over all
    history is an identity, not an approximation."""
    shape = per.agg(
        F.countDistinct("row_key").alias("r"),
        F.countDistinct("col_key").alias("c"),
    ).collect()[0]
    r, c = int(shape["r"]), int(shape["c"])
    if r < 2 or c < 2:
        raise ValueError(
            f"chi2_independence needs >= 2 categories per axis, got {r} x {c}"
        )
    dfree = (r - 1) * (c - 1)
    rowt = per.groupBy("row_key").agg(F.sum("n").cast("long").alias("nr"))
    colt = per.groupBy("col_key").agg(F.sum("n").cast("long").alias("nc"))
    tot = per.agg(F.sum("n").cast("long").alias("n_total"))
    grid = rowt.crossJoin(F.broadcast(colt)).crossJoin(F.broadcast(tot))
    j = grid.join(per, ["row_key", "col_key"], "left").na.fill({"n": 0})
    g = F.lit(float(1 << 20))
    en = (
        F.col("nr").cast("double")
        * F.col("nc").cast("double")
        / F.col("n_total").cast("double")
    )
    contrib = (F.col("n").cast("double") - en) * (F.col("n").cast("double") - en) / en
    detail = j.select(
        "row_key", "col_key", "n",
        en.alias("expected_n"),
        (F.floor(contrib * g) / g).alias("contrib_q"),
        "n_total",
    )
    folded = detail.agg(
        F.sum("contrib_q").alias("chi2"),
        F.max("n_total").alias("__nt"),
    )
    p = chi2_sf_q(F.col("chi2"), dfree)
    vmin = min(r - 1, c - 1)
    verdict = folded.select(
        "chi2",
        F.lit(int(dfree)).alias("df"),
        p.alias("p_value"),
        F.sqrt(
            F.col("chi2") / (F.col("__nt").cast("double") * F.lit(float(vmin)))
        ).alias("cramers_v"),
        (p < F.lit(float(alpha))).alias("dependent"),
    )
    return detail.crossJoin(F.broadcast(verdict)).select(
        "row_key", "col_key", "n", "expected_n", "contrib_q",
        "n_total", "df", "chi2", "p_value", "cramers_v", "dependent",
    ).orderBy("row_key", "col_key")


def bh_qvalues(
    df: DataFrame,
    *,
    p_col: str,
    id_cols: list[str],
    alpha: float = 0.05,
) -> DataFrame:
    """Benjamini-Hochberg step-down Q-VALUES — the adjusted-p companion
    of the engine's per-group reject-set operator (``bh_fdr``, q228):
    that one answers "which tests survive at THIS q" (threshold-value
    reject set, per group); this one attaches to every test the
    SMALLEST q at which it would survive — the number a dashboard
    sorts, reports, and re-thresholds without re-running the panel.
    A dashboard running m tests at per-test alpha fires ~alpha*m false
    alarms; BH adjusts each p to the q-value

        q_(i) = min_{j >= i} ( m * p_(j) / j ),  capped at 1

    over the ascending p ranks, and rejecting q <= alpha controls the
    expected false-discovery proportion at alpha (Benjamini & Hochberg
    1995) under independent or positively-dependent tests.

    Exactness: rank is a deterministic row_number over (p, id) — ties
    broken by id so both engines agree; raw = p * m / rank is a fixed
    double chain (m and rank exact integers); the step-down min is a
    running MIN over ranks descending (exact — min of doubles has no
    rounding); the cap is a LEAST.  No libm anywhere — plain SQL
    replays every double bit-for-bit.

    Shape: m is the number of HYPOTHESES (metrics x segments on a
    dashboard), readout-sized by contract — the single-partition rank
    window over m rows is the kaplan_meier grid convention, not a
    data-sized sort.  The p-values themselves arrive from data-sized
    operators upstream.

    Output: one row per test, ordered by rank — (*id_cols, p_value,
    rank, m, q_value, rejected).
    """
    from pyspark.sql import Window

    if not id_cols:
        raise ValueError("bh_qvalues needs id_cols to break p-value ties deterministically")
    p = F.col(p_col).cast("double")
    base = df.select(*id_cols, p.alias("p_value"))
    w_rank = Window.orderBy("p_value", *id_cols)
    w_min = Window.orderBy(F.desc("rank")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = base.agg(F.count(F.lit(1)).cast("long").alias("m"))
    ranked = base.crossJoin(F.broadcast(tot)).withColumn(
        "rank", F.row_number().over(w_rank).cast("long")
    )
    raw = (
        F.col("p_value")
        * F.col("m").cast("double")
        / F.col("rank").cast("double")
    )
    out = ranked.withColumn("__raw", raw).withColumn(
        "q_value", F.least(F.min("__raw").over(w_min), F.lit(1.0))
    )
    return out.select(
        *id_cols, "p_value", "rank", "m", "q_value",
        (F.col("q_value") <= F.lit(float(alpha))).alias("rejected"),
    ).orderBy("rank")


def mantel_haenszel(
    df: DataFrame,
    *,
    stratum_col: str,
    treat_col: str,
    outcome_col: str,
    alpha: float = 0.05,
) -> DataFrame:
    """Mantel-Haenszel stratified 2x2 readout — the confounder-adjusted
    binary-outcome gate (conversion lift by arm, ADJUSTED for a
    stratifying covariate: region, device, cohort).  Pooling strata
    naively invites Simpson's paradox; MH combines the per-stratum
    2x2 tables

        OR_MH = sum_k(a_k d_k / n_k) / sum_k(b_k c_k / n_k)
        chi2  = (sum a_k - sum E_k)^2 / sum V_k   (1 df, no continuity
                 correction), E_k = r1_k c1_k / n_k,
                 V_k = r1_k r0_k c1_k c0_k / (n_k^2 (n_k - 1))

    with a_k = treated successes, b_k = treated failures, c_k =
    control successes, d_k = control failures, r/c the margins — and
    the tail through the engine-exact ``chi2_sf_q(., 1)``.

    Exactness: the per-stratum cells are INTEGER conditional counts
    (one groupBy); each stratum's ad/n, bc/n, E and V terms are fixed
    double chains floor-quantized to the 2^-20 grid BEFORE the
    order-free cross-stratum sums (the engine's fold convention);
    OR/chi2/p are scalar chains on the folded sums — plain SQL replays
    every double.  Single-stratum input degenerates to the plain 2x2
    test; a stratum with n_k <= 1 contributes NULL-guarded zeros to V
    (V's (n_k - 1) denominator).

    Shape: ONE data-sized groupBy onto the stratum grid; everything
    after is stratum-count sized.  Treatment/outcome must be 0/1.

    Output: one row per stratum, ordered — (stratum, a, b, c, d, n,
    or_stratum) with the shared verdict repeated (or_mh, se_log_or,
    or_mh_lo, or_mh_hi, chi2, p_value, significant); the 95% CI uses
    the Robins-Breslow-Greenland (1986) SE of ln(OR_MH) — valid under
    both sparse-strata and large-strata asymptotics — with ln/exp on
    the engine's 2^-20 quantized-libm chains; per-stratum odds ratios
    expose the heterogeneity MH averages over (NULL when b*c = 0).
    """
    t = F.col(treat_col).cast("int")
    y = F.col(outcome_col).cast("int")
    per = (
        df.select(F.col(stratum_col).alias("stratum"), t.alias("__t"), y.alias("__y"))
        .groupBy("stratum")
        .agg(
            F.sum(F.col("__t") * F.col("__y")).cast("long").alias("a"),
            F.sum(F.col("__t") * (1 - F.col("__y"))).cast("long").alias("b"),
            F.sum((1 - F.col("__t")) * F.col("__y")).cast("long").alias("c"),
            F.sum((1 - F.col("__t")) * (1 - F.col("__y"))).cast("long").alias("d"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    g = F.lit(float(1 << 20))
    nd = F.col("n").cast("double")
    ad, bd, cd, dd = (F.col(x).cast("double") for x in ("a", "b", "c", "d"))
    r1, r0 = ad + bd, cd + dd
    c1, c0 = ad + cd, bd + dd
    q = lambda e: F.floor(e * g) / g  # noqa: E731
    # Robins-Breslow-Greenland variance inputs: R = ad/n, S = bc/n,
    # P = (a+d)/n, Q = (b+c)/n — each stratum's PR, PS+QR, QS terms
    # quantized before the order-free folds, like R and S themselves
    rr = ad * dd / nd
    ss = bd * cd / nd
    pp = (ad + dd) / nd
    qq = (bd + cd) / nd
    terms = per.select(
        "stratum", "a", "b", "c", "d", "n",
        F.when((F.col("b") > 0) & (F.col("c") > 0), (ad * dd) / (bd * cd))
        .alias("or_stratum"),
        q(ad * dd / nd).alias("__adn"),
        q(bd * cd / nd).alias("__bcn"),
        q(pp * rr).alias("__pr"),
        q(pp * ss + qq * rr).alias("__psqr"),
        q(qq * ss).alias("__qs"),
        q(r1 * c1 / nd).alias("__e"),
        F.when(
            F.col("n") > 1,
            q(r1 * r0 * c1 * c0 / (nd * nd * (nd - F.lit(1.0)))),
        ).otherwise(F.lit(0.0)).alias("__v"),
    ).localCheckpoint(eager=True)
    folded = terms.agg(
        F.sum("a").cast("long").alias("__sa"),
        F.sum("__adn").alias("__sadn"),
        F.sum("__bcn").alias("__sbcn"),
        F.sum("__pr").alias("__spr"),
        F.sum("__psqr").alias("__spsqr"),
        F.sum("__qs").alias("__sqs"),
        F.sum("__e").alias("__se"),
        F.sum("__v").alias("__sv"),
    )
    chi2 = (
        (F.col("__sa").cast("double") - F.col("__se"))
        * (F.col("__sa").cast("double") - F.col("__se"))
        / F.col("__sv")
    )
    p = chi2_sf_q(F.col("chi2"), 1)
    # RBG (Robins-Breslow-Greenland 1986) SE of ln(OR_MH) and the Wald
    # CI: ln/exp are the engine's 2^-20 floor-quantized libm chains
    se2 = (
        F.col("__spr") / (F.lit(2.0) * F.col("__sadn") * F.col("__sadn"))
        + F.col("__spsqr") / (F.lit(2.0) * F.col("__sadn") * F.col("__sbcn"))
        + F.col("__sqs") / (F.lit(2.0) * F.col("__sbcn") * F.col("__sbcn"))
    )
    qln_or = F.floor(F.log(F.col("or_mh")) * g) / g
    half = F.lit(1.959963984540054) * F.col("se_log_or")
    verdict = folded.select(
        F.when(F.col("__sbcn") > 0, F.col("__sadn") / F.col("__sbcn")).alias("or_mh"),
        F.when(
            (F.col("__sadn") > 0) & (F.col("__sbcn") > 0), F.sqrt(se2)
        ).alias("se_log_or"),
        F.when(F.col("__sv") > 0, chi2).alias("chi2"),
    ).select(
        "or_mh",
        "se_log_or",
        (F.floor(F.exp(qln_or - half) * g) / g).alias("or_mh_lo"),
        (F.floor(F.exp(qln_or + half) * g) / g).alias("or_mh_hi"),
        "chi2",
        p.alias("p_value"),
        (p < F.lit(float(alpha))).alias("significant"),
    )
    return terms.select(
        "stratum", "a", "b", "c", "d", "n", "or_stratum"
    ).crossJoin(F.broadcast(verdict)).orderBy("stratum")


def poisson_rate_test(
    df: DataFrame,
    *,
    arm_col: str,
    events_col: str,
    exposure_col: str,
    alpha: float = 0.05,
) -> DataFrame:
    """Two-sample Poisson rate test — the COUNT-metric member of the
    experimentation gate family (errors per machine-hour, purchases
    per active day, crashes per session): Welch/MWU compare per-unit
    VALUES, this compares event RATES under unequal integer exposures,

        r_a = sum(events_a) / sum(exposure_a),
        z   = (r_t - r_c) / sqrt(r_pool * (1/x_c + 1/x_t)),
        r_pool = (e_c + e_t) / (x_c + x_t)

    — the Poisson score test (equivalently the conditional-binomial
    normal approximation; two-sided p through the shared quantized
    normal SF).  Arms follow the engine's two-arm convention: control
    is the LEXICALLY SMALLER label.

    Exactness: per-arm event and exposure sums are INTEGER folds
    (``events``/``exposure`` are integer units by contract — the cents
    convention for denominators); every rate/z is one fixed double
    chain with IEEE sqrt; the tail is ``normal_sf_q`` — plain SQL
    replays every double.  Zero pooled exposure or zero pooled events
    surface NULL z/p (no rate to compare), never NaN.

    Shape: ONE keyed integer aggregation (map-side combine) to 2 rows;
    scalars after — the q204 z-test shape on a different sufficient
    statistic.

    Output: ONE row — (n_control, n_treatment, events_control,
    events_treatment, exposure_control, exposure_treatment,
    rate_control, rate_treatment, rate_ratio, z, p_value, significant).
    """
    per = df.groupBy(F.col(arm_col).alias("__a")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(events_col).cast("long")).cast("long").alias("e"),
        F.sum(F.col(exposure_col).cast("long")).cast("long").alias("x"),
    )
    return poisson_rate_from_counts(per, alpha=alpha)


def poisson_rate_from_counts(per: DataFrame, *, alpha: float = 0.05) -> DataFrame:
    """The ONE Poisson-rate finalizer, shared by the batch operator
    (``poisson_rate_test``) and the streaming readout
    (``streaming/drift.poisson_rate_from_registry``): consumes the
    already-aggregated per-arm counts (__a, n, e, x) — exactly the
    additive state a streaming registry folds — and produces the
    identical output, so registry finalize == batch over all history
    is an identity."""
    arms = [r[0] for r in per.select("__a").distinct().orderBy("__a").collect()]
    if len(arms) != 2:
        raise ValueError(f"poisson_rate_test needs exactly 2 arms, got {arms}")
    ctrl, trt = arms
    c = per.filter(F.col("__a") == ctrl).select(
        F.col("n").alias("n_control"),
        F.col("e").alias("events_control"),
        F.col("x").alias("exposure_control"),
    )
    t = per.filter(F.col("__a") == trt).select(
        F.col("n").alias("n_treatment"),
        F.col("e").alias("events_treatment"),
        F.col("x").alias("exposure_treatment"),
    )
    j = c.crossJoin(t)
    ec, et = F.col("events_control").cast("double"), F.col("events_treatment").cast("double")
    xc, xt = F.col("exposure_control").cast("double"), F.col("exposure_treatment").cast("double")
    rc = F.when(F.col("exposure_control") > 0, ec / xc)
    rt = F.when(F.col("exposure_treatment") > 0, et / xt)
    rp = F.when(
        (F.col("exposure_control") > 0) & (F.col("exposure_treatment") > 0),
        (ec + et) / (xc + xt),
    )
    se = F.sqrt(rp * (F.lit(1.0) / xc + F.lit(1.0) / xt))
    z = F.when(
        (F.col("events_control") + F.col("events_treatment")) > 0, (rt - rc) / se
    )
    p = F.lit(2.0) * normal_sf_q(F.abs(z))
    return j.select(
        "n_control", "n_treatment",
        "events_control", "events_treatment",
        "exposure_control", "exposure_treatment",
        rc.alias("rate_control"),
        rt.alias("rate_treatment"),
        F.when(rc > 0, rt / rc).alias("rate_ratio"),
        z.alias("z"),
        p.alias("p_value"),
        (p < F.lit(float(alpha))).alias("significant"),
    )


def spearman_correlation(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    alpha: float = 0.05,
) -> DataFrame:
    """Spearman rank correlation — the whale-robust companion of the
    Pearson family (q134 correlates metric SERIES; this correlates two
    per-row metrics by RANK, so one mega-order can't manufacture a
    relationship): rho = Pearson over average ranks, with ties getting
    the average of their rank run (tau-style midranks).

    Exactness: ranks come from the two VALUE GRIDS (cum count below +
    (count+1)/2), so every rank is a half-integer; the engine folds
    DOUBLED ranks — pure BIGINTs — with DECIMAL(38) sums for ALL five
    folds, the linear sums included (sum of doubled ranks is ~n^2,
    which would silently wrap a BIGINT fold at n ~ 3e9 under non-ANSI
    Spark), so the entire reduction is exact integer arithmetic to
    n <= ~10^12 rows (4n^3 < 10^38) and rho is ONE fixed double chain
    on six integers; plain SQL replays it bit-for-bit.
    Significance: z = rho * sqrt(n - 1) through the shared quantized
    normal SF (the standard large-n approximation; IEEE sqrt).

    Input contract: both columns must ALREADY be integral (cents-style
    quantized) — a float/double/fractional-decimal column RAISES
    instead of being silently truncated by the long cast (the sibling
    two-sample operators' convention); quantize upstream (e.g.
    ``(value * 100).cast("long")``) to choose the grid explicitly.

    Shape: two value-grid groupBys + two grid-sized rank windows
    (single-partition over DISTINCT VALUES — the kaplan_meier grid
    convention, bounded for cents-quantized metrics), two data-sized
    rank joins (grid side broadcastable), ONE full-scan integer fold.

    Output: ONE row — (n, rho, z, p_value, significant).
    """
    from pyspark.sql import Window
    from pyspark.sql import types as T

    for c in (x_col, y_col):
        dt = df.schema[c].dataType
        ok = isinstance(
            dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.BooleanType)
        ) or (isinstance(dt, T.DecimalType) and dt.scale == 0)
        if not ok:
            raise ValueError(
                f"spearman_correlation needs integral input columns; {c} is "
                f"{dt.simpleString()} — quantize upstream (e.g. cents via "
                f"(col * 100).cast('long')) instead of relying on a silent "
                f"truncating cast"
            )
    xv = F.col(x_col).cast("long")
    yv = F.col(y_col).cast("long")
    base = df.select(xv.alias("__x"), yv.alias("__y"))

    def rank_map(col: str):
        grid = base.groupBy(F.col(col).alias("__v")).agg(
            F.count(F.lit(1)).cast("long").alias("__c")
        )
        w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
        # doubled average rank: 2*(below + (c+1)/2) = 2*below + c + 1
        return grid.select(
            "__v",
            (
                F.lit(2) * F.coalesce(F.sum("__c").over(w), F.lit(0))
                + F.col("__c")
                + F.lit(1)
            ).cast("long").alias("__r2"),
        )

    rx = rank_map("__x").select(F.col("__v").alias("__x"), F.col("__r2").alias("__rx"))
    ry = rank_map("__y").select(F.col("__v").alias("__y"), F.col("__r2").alias("__ry"))
    j = base.join(rx, "__x").join(ry, "__y")
    dec = "decimal(38,0)"
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("__rx").cast(dec)).cast(dec).alias("sx"),
        F.sum(F.col("__ry").cast(dec)).cast(dec).alias("sy"),
        F.sum(F.col("__rx").cast(dec) * F.col("__rx").cast(dec)).cast(dec).alias("sxx"),
        F.sum(F.col("__ry").cast(dec) * F.col("__ry").cast(dec)).cast(dec).alias("syy"),
        F.sum(F.col("__rx").cast(dec) * F.col("__ry").cast(dec)).cast(dec).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    cov = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    vx = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double")
    vy = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double")
    rho = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    z = rho * F.sqrt(nd - F.lit(1.0))
    p = F.lit(2.0) * normal_sf_q(F.abs(z))
    return agg.select(
        "n",
        rho.alias("rho"),
        z.alias("z"),
        p.alias("p_value"),
        (p < F.lit(float(alpha))).alias("significant"),
    )
