"""CDC-style merge/upsert — the warehouse MERGE INTO, batch-expressed.

SCD1 (latest-wins) upsert of an updates batch into a target snapshot:
union both sides, rank per key by (version, side) and keep the winner.
One shuffle on the key; with a bucketed target
(``sources.bucketed.save_bucketed``) the target side never re-shuffles
and only the day's batch moves — the incremental-dedup precedent
(``operators/dedup.incremental_exact_dedup``).

Why a window, not a join: MERGE semantics need "newest version per key
across BOTH relations", which is exactly one rank — an anti-join + union
formulation shuffles the same data twice and still can't break version
ties inside the updates batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["merge_upsert", "snapshot_diff", "dataset_fingerprint"]


def dataset_fingerprint(
    df: DataFrame,
    *,
    by: str | list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Order/partitioning-invariant content manifest per group:
    (keys..., n_rows, n_bytes, checksum).  The checksum is the exact
    decimal SUM of each row's 60-bit md5 prefix over ``id:text`` —
    addition commutes, so any partitioning, any engine, any row order
    produces the same value, and equal fingerprints mean byte-equal
    content multisets w.h.p. (a collision needs md5-prefix sums to
    coincide).

    This is the validation handshake for migrations, CDC pipelines and
    replica audits: fingerprint source and destination independently —
    wherever they live — and compare manifest rows instead of moving or
    joining 100 TB.  Companion of ``snapshot_diff`` (which finds WHICH
    rows differ; the fingerprint is the cheap always-on check that
    decides whether to run it).

    Scale shape: one scan, one grouped aggregation; partial aggregation
    collapses per-task, the shuffle carries one row per group."""
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    row_hash = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.col(text_col))),
            1,
            15,
        ),
        16,
        10,
    ).cast("decimal(38,0)")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.length(text_col)).cast("long").alias("n_bytes"),
        # string, not decimal: the checksum is an identity to COMPARE,
        # and decimal columns lose exactness through some client layers
        # (e.g. pandas lowering decimal128 to float64)
        F.sum(row_hash).cast("decimal(38,0)").cast("string").alias("checksum"),
    )


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    *,
    key_cols: str | list[str],
    version_col: str | None = None,
) -> DataFrame:
    """Latest-wins upsert: rows in ``updates`` replace same-key rows in
    ``target``; unmatched keys insert.  With ``version_col``, the
    higher version wins regardless of side (late-arriving CDC events);
    ties break toward ``updates``.  Deletes are an upstream filter
    (ship a tombstone column and drop post-merge), not this operator.

    Columns must match (unionByName); output schema == input schema.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    cols = target.columns
    if set(cols) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: target {sorted(cols)} vs updates {sorted(updates.columns)}"
        )
    t = target.withColumn("__side", F.lit(0))
    u = updates.select(*cols).withColumn("__side", F.lit(1))
    unioned = t.unionByName(u)
    order = (
        [F.col(version_col).desc(), F.col("__side").desc()]
        if version_col
        else [F.col("__side").desc()]
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*cols)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key_cols: str | list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Table-version diff: classify every key as added / removed /
    changed / unchanged between two snapshots, with the exact set of
    changed columns — the audit query behind every CDC pipeline and
    the regression gate for reproducible rebuilds.

    One full-outer equi-join on the keys (AQE-skew-safe, both sides
    prune to keys + compared columns); change detection is null-safe
    per-column equality folded into an array expression, so the whole
    classification is a pure map over the join.

    Output: (keys..., status string, changed_cols array<string>).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    cols = compare_cols or [c for c in old.columns if c not in keys]
    missing = [c for c in cols if c not in new.columns]
    if missing:
        raise ValueError(f"compare columns absent from new snapshot: {missing}")
    o = old.select(*keys, *[F.col(c).alias(f"__o_{c}") for c in cols]).withColumn(
        "__in_old", F.lit(True)
    )
    n = new.select(*keys, *[F.col(c).alias(f"__n_{c}") for c in cols]).withColumn(
        "__in_new", F.lit(True)
    )
    j = o.join(n, keys, "full_outer")
    changed = F.sort_array(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
                    )
                    for c in cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.size(changed) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *keys,
        status.alias("status"),
        F.when(status == "changed", changed)
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )


def golden_records(
    df: DataFrame,
    *,
    cluster_col: str,
    id_col: str,
    rules: dict[str, str],
    ts_col: str | None = None,
) -> DataFrame:
    """Survivorship merge — the last step of entity resolution: collapse
    each duplicate cluster (from ``dedup_clusters`` / ``exact_dedup`` /
    any blocking) into ONE golden record, field by field, under
    explicit, deterministic rules:

    - ``longest``       : longest value (tie: smallest value)
    - ``most_frequent`` : cluster mode (tie: smallest value)
    - ``latest``        : value of the row with max ``ts_col``
                          (tie: smallest id)
    - ``earliest``      : min ``ts_col`` (tie: smallest id)
    - ``min`` / ``max`` : plain extrema
    - ``first``         : value of the smallest-id row

    Every rule is a window ordering with a TOTAL tie-break, so the
    golden record is a pure function of the cluster's contents —
    reproducible on any engine/partitioning (nulls sort last; an
    all-null field survives as null).

    Scale shape: one shuffle on the cluster key; each ruled field adds
    a window over that same partitioning (no extra exchange — the sort
    per rule reuses the cluster clustering), plus a per-(cluster,
    value) count window for ``most_frequent``.  Output: (cluster_col,
    n_members, <ruled fields>).
    """
    from pyspark.sql import Window

    base = df
    picks = []
    full = lambda w: w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    for field, rule in rules.items():
        c = F.col(field)
        if rule == "longest":
            order = [F.length(c).desc_nulls_last(), c.asc_nulls_last()]
        elif rule == "most_frequent":
            cnt_col = f"__cnt_{field}"
            base = base.withColumn(
                cnt_col,
                F.count(F.when(c.isNotNull(), 1)).over(
                    Window.partitionBy(cluster_col, field)
                ),
            )
            order = [F.col(cnt_col).desc_nulls_last(), c.asc_nulls_last()]
        elif rule in ("latest", "earliest"):
            if ts_col is None:
                raise ValueError(f"rule {rule!r} for {field!r} needs ts_col")
            ts = F.col(ts_col)
            order = [
                ts.desc_nulls_last() if rule == "latest" else ts.asc_nulls_last(),
                F.col(id_col).asc_nulls_last(),
            ]
        elif rule == "min":
            order = [c.asc_nulls_last()]
        elif rule == "max":
            order = [c.desc_nulls_last()]
        elif rule == "first":
            order = [F.col(id_col).asc_nulls_last()]
        else:
            raise ValueError(f"unknown survivorship rule {rule!r} for {field!r}")
        w = Window.partitionBy(cluster_col).orderBy(*order)
        picks.append(F.first(c).over(full(w)).alias(f"__pick_{field}"))

    staged = base.select(cluster_col, *picks)
    return staged.groupBy(cluster_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        *[
            F.min(f"__pick_{field}").alias(field)
            for field in rules
        ],
    )


def fellegi_sunter_score(
    pairs: DataFrame,
    *,
    comparisons: dict[str, tuple[float, float]],
    upper: float | None = None,
    lower: float | None = None,
    out_col: str = "score",
) -> DataFrame:
    """Fellegi-Sunter probabilistic record-linkage scoring (Fellegi &
    Sunter 1969; the Splink/dedupe.io model): each comparison field
    ``name`` (a BOOLEAN agreement column on ``pairs``, produced by the
    caller's blocking+comparison step) carries parameters ``(m, u)`` —
    P(agree | true match) and P(agree | non-match).  The pair's match
    weight is

        score = sum over fields of  log2(m/u)            if agree
                                    log2((1-m)/(1-u))    if disagree

    i.e. the log-likelihood ratio of the comparison vector under
    conditional independence.  NULL agreement (field unavailable)
    contributes 0 — the FS convention for missing comparators.

    With ``upper``/``lower`` set, adds the classic three-way ``verdict``:
    'match' (score >= upper), 'possible' (lower <= score < upper),
    'non_match' — the clerical-review band.

    Determinism: the per-field weights are Python-computed double
    literals and the score is a chained addition in SORTED field order —
    a fixed IEEE expression any engine replays bit-for-bit (the SQL
    oracle spells the same weights via %.17e).  Pure map over the pairs
    relation: zero shuffle; pair GENERATION (blocking) is the caller's
    scale knob, as in every ER pipeline.

    Output: ``pairs`` + (w_<field> double per field, score, [verdict]).
    """
    if not comparisons:
        raise ValueError("comparisons must name at least one agreement column")
    import math

    score = F.lit(0.0)
    out = pairs
    for name in sorted(comparisons):
        m, u = comparisons[name]
        if not (0.0 < m < 1.0 and 0.0 < u < 1.0):
            raise ValueError(f"m/u for {name!r} must be in (0,1): {(m, u)}")
        w_agree = math.log2(m / u)
        w_dis = math.log2((1.0 - m) / (1.0 - u))
        w = (
            F.when(F.col(name).isNull(), F.lit(0.0))
            .when(F.col(name), F.lit(w_agree))
            .otherwise(F.lit(w_dis))
        )
        out = out.withColumn(f"w_{name}", w)
        score = score + F.col(f"w_{name}")
    out = out.withColumn(out_col, score)
    if upper is not None and lower is not None:
        out = out.withColumn(
            "verdict",
            F.when(F.col(out_col) >= F.lit(float(upper)), F.lit("match"))
            .when(F.col(out_col) >= F.lit(float(lower)), F.lit("possible"))
            .otherwise(F.lit("non_match")),
        )
    return out
