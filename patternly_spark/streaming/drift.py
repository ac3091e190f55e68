"""Streaming drift monitor — the continuous twin of
``operators/drift.categorical_drift``.

Monitoring semantics: every microbatch is scored against a PINNED
reference distribution (the corpus mix the pipeline was tuned on) and
one drift row per batch is appended — "did THIS arrival window drift?".
That is deliberately per-batch, not per-event-time-window: the alert a
drift monitor raises is about what just arrived, and it must fire even
when event times are skewed or replayed.  For event-time drift over
closed history, run the batch operator with ``by=<time bucket>``.

Batch-parity law (pinned in tests): the row appended for a microbatch
equals ``categorical_drift(batch_df, cat_col, ref=ref)`` on exactly the
rows of that batch — the statistic is stateless given the reference, so
the streaming wrapper adds sequencing (batch_id), never new math.

Scale shape: the per-batch work is one (cat) count shuffle over the
microbatch plus a category-sized grid — the reference is read once and
broadcast; no state store is needed at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from patternly_spark.operators.drift import categorical_drift, ks_drift
from patternly_spark.streaming.exactly_once import (
    read_latest_snapshot,
    read_registry,
    write_batch_partition,
    write_snapshot,
)

__all__ = [
    "streaming_drift",
    "streaming_ks_drift",
    "streaming_ema",
    "streaming_cusum",
    "streaming_seasonal_monitor",
    "seasonal_alerts_from_registry",
    "streaming_did_registry",
    "did_from_registry",
    "streaming_rank_test_registry",
    "mwu_from_registry",
    "streaming_contingency_registry",
    "chi2_independence_from_registry",
    "streaming_rate_registry",
    "poisson_rate_from_registry",
]


def streaming_drift(
    stream_df: DataFrame,
    ref: DataFrame,
    cat_col: str,
    output_path: str,
    *,
    checkpoint_path: str,
    psi_eps: float | None = None,
    trigger_once: bool = False,
):
    """foreachBatch wrapper: score each microbatch's ``cat_col`` mix
    against the static ``ref`` (cat, ref_cnt) counts and append
    (batch_id, n, chi2, psi, unseen_frac) to ``output_path``.

    Empty microbatches append nothing (no distribution to score)."""
    kwargs = {} if psi_eps is None else {"psi_eps": psi_eps}

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        stats = categorical_drift(batch_df, cat_col, ref=ref, **kwargs)
        out = stats.select(
            F.lit(int(batch_id)).cast("long").alias("batch_id"),
            "n",
            "chi2",
            "psi",
            "unseen_frac",
        )
        # stats of an empty batch is an empty frame; the write is a no-op.
        # per-batch partition write: a foreachBatch retry overwrites its
        # own partition instead of appending a duplicate drift row.
        write_batch_partition(out, output_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_ks_drift(
    stream_df: DataFrame,
    ref: DataFrame,
    value_col: str,
    output_path: str,
    *,
    checkpoint_path: str,
    trigger_once: bool = False,
):
    """Numeric twin of ``streaming_drift``: score each microbatch's
    ``value_col`` sample against a PINNED one-column reference sample
    with the exact two-sample KS statistic and append
    (batch_id, n_obs, n_ref, ks) to ``output_path``.

    Same batch-parity law: the appended row equals
    ``ks_drift(batch_df, value_col, ref=ref)`` on exactly that batch's
    rows — the statistic is stateless given the reference, so the
    wrapper adds sequencing, never new math.  The reference must be
    bounded (hash_sample it at corpus scale — see ks_drift's docstring);
    it is broadcast per batch, no state store.

    Empty microbatches append nothing."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        stats = ks_drift(batch_df, value_col, ref=ref)
        out = stats.select(
            F.lit(int(batch_id)).cast("long").alias("batch_id"),
            "n_obs",
            "n_ref",
            "ks",
        )
        write_batch_partition(out, output_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_ema(
    stream_df: DataFrame,
    value_col: str,
    output_path: str,
    *,
    by: str | list[str],
    order_col: str | list[str],
    checkpoint_path: str,
    registry_path: str,
    alpha: float = 0.25,
    trigger_once: bool = False,
):
    """Stateful streaming EMA: each microbatch folds its per-key events
    (in ``order_col`` order) CONTINUING from the carried state in the
    parquet registry at ``registry_path`` (keys..., ema), emits the
    per-event EMA rows to ``output_path``, and overwrites the registry
    with each key's new last state.

    Parity law (pinned in tests): when batches arrive per-key
    time-ordered — the watermarking contract every per-key recurrence
    needs — the concatenated emissions equal the batch ``ema`` of the
    union, because the registry carries exactly acc[last] of the fold.

    Scale shape: the registry is key-cardinality-sized (one double per
    key), broadcast into the batch fold; read-merge-overwrite is
    sequential across microbatches, localCheckpoint-pinned before
    overwriting the files it was read from."""
    from patternly_spark.operators.temporal import ema

    keys = [by] if isinstance(by, str) else list(by)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        init, _ = read_latest_snapshot(spark, registry_path, before_batch=batch_id)
        out = ema(
            batch_df, value_col, by=keys, order_col=order_col,
            alpha=alpha, init=init,
        ).localCheckpoint(eager=True)
        write_batch_partition(out, output_path, batch_id)

        order = [order_col] if isinstance(order_col, str) else list(order_col)
        from pyspark.sql import Window

        w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order])
        last = (
            out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(*keys, "ema")
        )
        if init is not None:
            untouched = init.join(last.select(*keys), keys, "left_anti")
            last = last.unionByName(untouched)
        write_snapshot(last.localCheckpoint(eager=True), registry_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_cusum(
    stream_df: DataFrame,
    value_col: str,
    output_path: str,
    *,
    by: str | list[str],
    order_col: str | list[str],
    checkpoint_path: str,
    registry_path: str,
    target: float,
    slack: float = 0.5,
    threshold: float = 5.0,
    trigger_once: bool = False,
):
    """Stateful streaming CUSUM: each microbatch folds its per-key
    events continuing from the (keys..., cusum_hi, cusum_lo) registry,
    emits the per-event statistic + alarm rows, and overwrites the
    registry with each key's new state — so a shift that straddles
    microbatch boundaries accumulates exactly as the batch fold would.

    Parity law (pinned in tests): per-key time-ordered batches emit
    exactly the batch ``cusum`` of the union.  Same registry mechanics
    as ``streaming_ema`` (key-cardinality state, localCheckpoint-pinned
    read-merge-overwrite)."""
    from patternly_spark.operators.drift import cusum

    keys = [by] if isinstance(by, str) else list(by)
    order = [order_col] if isinstance(order_col, str) else list(order_col)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        init, _ = read_latest_snapshot(spark, registry_path, before_batch=batch_id)
        out = cusum(
            batch_df, value_col, by=keys, order_col=order,
            target=target, slack=slack, threshold=threshold,
            init=init,
        ).localCheckpoint(eager=True)
        write_batch_partition(out, output_path, batch_id)

        from pyspark.sql import Window

        w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order])
        last = (
            out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(*keys, "cusum_hi", "cusum_lo")
        )
        if init is not None:
            untouched = init.join(last.select(*keys), keys, "left_anti")
            last = last.unionByName(untouched)
        write_snapshot(last.localCheckpoint(eager=True), registry_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_seasonal_monitor(
    stream_df: DataFrame,
    registry_path: str,
    *,
    checkpoint_path: str,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    trigger_once: bool = False,
):
    """Incremental seasonal-baseline monitor — the streaming twin of the
    q141 composition.  The expensive pass (rolling the raw event stream
    up to exact hourly totals) runs incrementally: each microbatch folds
    its per-(type, hour) integer-cent totals additively into the parquet
    registry, which stays one row per type-hour — O(types x hours),
    independent of event volume.  Each row also carries ``max_sec``
    (largest event second observed for that hour); the registry-wide max
    is the stream's event-time high-water mark, so hour-closedness needs
    no side channel.

    Alerts are not emitted per batch: the seasonal profile evolves with
    every closed hour, so provisional per-batch z-scores would disagree
    with the final profile by construction.  Instead
    ``seasonal_alerts_from_registry`` replays the exact q141 z-scoring
    over the compact registry at read time — cheap (type-hour rows, not
    events) and parity-testable: after draining the stream it equals the
    batch composition restricted to closed hours (pinned in tests).

    Read-merge-overwrite is sequential across microbatches; the merged
    registry is localCheckpoint-pinned before overwriting the files it
    was read from (task-retry safety, the streaming-upsert hazard)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sec = F.unix_timestamp(F.col(ts_col))
        hourly = (
            batch_df.groupBy(
                F.col(type_col).alias("event_type"),
                (F.floor(sec / 3600) * 3600).cast("long").alias("h"),
            )
            .agg(
                (F.sum(F.col(value_col).cast("decimal(18,2)")) * 100)
                .cast("long")
                .alias("cents"),
                F.max(sec).cast("long").alias("max_sec"),
            )
        )
        existing, _ = read_latest_snapshot(spark, registry_path, before_batch=batch_id)
        if existing is not None:
            hourly = (
                hourly.unionByName(existing)
                .groupBy("event_type", "h")
                .agg(
                    F.sum("cents").cast("long").alias("cents"),
                    F.max("max_sec").cast("long").alias("max_sec"),
                )
            )
        write_snapshot(hourly.localCheckpoint(eager=True), registry_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def seasonal_alerts_from_registry(registry: DataFrame, *, z_threshold: float = 2.0, min_n: int = 3) -> DataFrame:
    """Replay the q141 seasonal z-scoring over a
    ``streaming_seasonal_monitor`` registry: hours closed by the
    event-time high-water mark (an event at >= h+3600 was seen) form the
    per-(type, hour-of-day) profile from exact integer-cent sums, and
    each closed hour is z-scored against its cell.  Identical arithmetic
    to the batch composition — the streaming path adds incremental
    rollup, never new math."""
    from pyspark.sql import Window

    hwm = F.max("max_sec").over(Window.partitionBy())
    closed = (
        registry.withColumn("__hwm", hwm)
        .filter(F.col("h") + 3600 <= F.col("__hwm"))
        .select("event_type", "h", "cents")
    )
    hod = ((F.col("h") % 86400) / 3600).cast("int")
    prof = closed.groupBy("event_type", hod.alias("hod")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(
            F.col("cents").cast("decimal(19,0)") * F.col("cents").cast("decimal(19,0)")
        ).alias("s2"),
    )
    j = closed.withColumn("hod", hod).join(F.broadcast(prof), ["event_type", "hod"])
    n = F.col("n").cast("double")
    mean_c = F.col("s").cast("double") / n
    std_c = F.sqrt(
        F.greatest(
            (
                F.col("s2").cast("double")
                - F.col("s").cast("double") * F.col("s").cast("double") / n
            )
            / (n - F.lit(1.0)),
            F.lit(0.0),
        )
    )
    z = (F.col("cents").cast("double") - mean_c) / std_c
    return (
        j.withColumn("mean_c", mean_c)
        .withColumn("std_c", std_c)
        .filter((F.col("n") >= int(min_n)) & (F.col("std_c") > 0.0))
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= float(z_threshold))
        .select(
            "event_type",
            "h",
            (F.col("cents").cast("double") / F.lit(100.0)).alias("hour_total"),
            (F.col("mean_c") / F.lit(100.0)).alias("baseline_mean"),
            (F.col("std_c") / F.lit(100.0)).alias("baseline_std"),
            "z",
        )
    )


def streaming_holt(
    stream_df: DataFrame,
    value_col: str,
    output_path: str,
    *,
    by: str | list[str],
    order_col: str | list[str],
    checkpoint_path: str,
    registry_path: str,
    alpha: float = 0.5,
    beta: float = 0.25,
    trigger_once: bool = False,
):
    """Stateful streaming Holt smoothing — ``streaming_ema``'s
    trend-aware twin: each microbatch folds its per-key events
    CONTINUING from the (level, trend) state carried in the parquet
    registry, emits the per-event rows, and overwrites the registry
    with each key's last state.

    Parity law (pinned in tests): per-key time-ordered batch arrival
    => concatenated emissions equal the batch ``holt_smoothing`` of
    the union (the registry carries exactly acc[last] of the fold).

    State is key-cardinality-sized (two doubles per key)."""
    from patternly_spark.operators.temporal import holt_smoothing

    keys = [by] if isinstance(by, str) else list(by)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        init, _ = read_latest_snapshot(spark, registry_path, before_batch=batch_id)
        out = holt_smoothing(
            batch_df, value_col, by=keys, order_col=order_col,
            alpha=alpha, beta=beta, init=init,
        ).localCheckpoint(eager=True)
        write_batch_partition(out, output_path, batch_id)

        order = [order_col] if isinstance(order_col, str) else list(order_col)
        from pyspark.sql import Window

        w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order])
        last = (
            out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(*keys, "level", "trend")
        )
        if init is not None:
            untouched = init.join(last.select(*keys), keys, "left_anti")
            last = last.unionByName(untouched)
        write_snapshot(last.localCheckpoint(eager=True), registry_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_survival_registry(
    stream_df: DataFrame,
    registry_path: str,
    *,
    checkpoint_path: str,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
    trigger_once: bool = False,
):
    """foreachBatch survival registry: fold each microbatch's subjects
    into the persisted (group, t, d, c) event/censoring-count grid by
    (group, t) integer addition — the additive half of ``kaplan_meier``
    (and ``logrank_test``, which runs off the same grid).  Finalize any
    time with ``operators/temporal.kaplan_meier_from_grid`` on the
    registry; registry == batch over all history (union-parity pinned).

    Contract: a subject arrives ONCE, with its final (duration, event)
    — the natural shape when journeys close (churned or observation
    window ended).  Re-sent subjects double-count, as in any additive
    registry.  State is grid-sized (groups x distinct durations), never
    subject-sized.
    """
    from pyspark.sql import functions as F

    gcols = list(group_cols or [])

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        grid = batch_df.groupBy(
            *gcols, F.col(duration_col).cast("long").alias("t")
        ).agg(
            F.sum(F.col(event_col).cast("int")).cast("long").alias("d"),
            F.sum(F.lit(1) - F.col(event_col).cast("int"))
            .cast("long")
            .alias("c"),
        )
        existing, _ = read_latest_snapshot(spark, registry_path, before_batch=batch_id)
        if existing is not None:
            grid = (
                grid.unionByName(existing)
                .groupBy(*gcols, "t")
                .agg(
                    F.sum("d").cast("long").alias("d"),
                    F.sum("c").cast("long").alias("c"),
                )
            )
        write_snapshot(grid.localCheckpoint(eager=True), registry_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_sprt_registry(
    stream_df: DataFrame,
    registry_path: str,
    *,
    checkpoint_path: str,
    ts_col: str,
    outcome_col: str,
    group_cols: list[str],
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.05,
    units: int = 1 << 20,
    trigger_once: bool = False,
):
    """Streaming Wald SPRT — the test that EXISTS for this setting
    (peek after every microbatch, error rates still hold): persist per
    group (n_obs, llr_units, decision, n_at_decision,
    llr_at_decision_units) and extend the integer LLR walk with each
    batch's observations; a decision, once reached, is FROZEN (the
    sequential-test contract).  Registry == batch ``sprt_test`` over
    all history (union-parity pinned) under the arrival contract:
    batches deliver observations in (ts) order per group — the natural
    shape of an event stream.

    All arithmetic is the batch operator's quantized-integer walk, so
    the carry is two integers per group; state is group-count-sized
    forever.
    """
    import math

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    u = int(units)
    inc1 = math.floor(math.log(p1 / p0) * u)
    inc0 = math.floor(math.log((1.0 - p1) / (1.0 - p0)) * u)
    hi = math.floor(math.log((1.0 - beta) / alpha) * u)
    lo = math.floor(math.log(beta / (1.0 - alpha)) * u)
    gcols = list(group_cols)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev, _ = read_latest_snapshot(spark, registry_path, before_batch=batch_id)
        w = Window.partitionBy(*gcols).orderBy(
            F.col(ts_col), F.col(outcome_col)
        )
        wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        inc = (
            F.when(F.col(outcome_col).cast("int") == 1, F.lit(inc1))
            .otherwise(F.lit(inc0))
            .cast("long")
        )
        walk = batch_df.select(*gcols, F.col(ts_col), F.col(outcome_col)).withColumn(
            "__ci", F.sum(inc).over(wc)
        ).withColumn("__r", F.row_number().over(w))
        if prev is not None:
            carry = prev.select(
                *gcols,
                F.col("n_obs").alias("__pn"),
                F.col("llr_units").alias("__pl"),
                F.col("decision").alias("__pd"),
                F.col("n_at_decision").alias("__pnd"),
                F.col("llr_at_decision_units").alias("__pld"),
            )
            walk = walk.join(F.broadcast(carry), gcols, "left")
        else:
            walk = (
                walk.withColumn("__pn", F.lit(None).cast("long"))
                .withColumn("__pl", F.lit(None).cast("long"))
                .withColumn("__pd", F.lit(None).cast("string"))
                .withColumn("__pnd", F.lit(None).cast("long"))
                .withColumn("__pld", F.lit(None).cast("long"))
            )
        llr_i = F.coalesce(F.col("__pl"), F.lit(0)) + F.col("__ci")
        r_i = F.coalesce(F.col("__pn"), F.lit(0)) + F.col("__r")
        dec_i = F.when(llr_i >= hi, F.lit("accept_h1")).when(
            llr_i <= lo, F.lit("accept_h0")
        )
        staged = walk.withColumn("__llr_i", llr_i).withColumn(
            "__r_i", r_i
        ).withColumn("__dec_i", F.when(F.col("__pd").isNull(), dec_i))
        agg = staged.groupBy(*gcols).agg(
            F.max("__r_i").cast("long").alias("n_obs"),
            F.max(F.struct(F.col("__r_i"), F.col("__llr_i").alias("l")))[
                "l"
            ].cast("long").alias("llr_units"),
            F.min(
                F.when(
                    F.col("__dec_i").isNotNull(),
                    F.struct("__r_i", "__dec_i", "__llr_i"),
                )
            ).alias("__cross"),
            F.max("__pd").alias("__pd"),
            F.max("__pnd").cast("long").alias("__pnd"),
            F.max("__pld").cast("long").alias("__pld"),
        )
        updated = agg.select(
            *gcols,
            "n_obs",
            "llr_units",
            F.coalesce(F.col("__pd"), F.col("__cross.__dec_i")).alias("decision"),
            F.coalesce(F.col("__pnd"), F.col("__cross.__r_i"))
            .cast("long")
            .alias("n_at_decision"),
            F.coalesce(F.col("__pld"), F.col("__cross.__llr_i"))
            .cast("long")
            .alias("llr_at_decision_units"),
        )
        if prev is not None:
            untouched = prev.join(
                updated.select(*gcols).distinct(), gcols, "left_anti"
            )
            updated = updated.unionByName(untouched)
        write_snapshot(updated.localCheckpoint(eager=True), registry_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sprt_from_registry(spark, registry_path: str, *, units: int = 1 << 20):
    """Read the streaming SPRT registry in the batch ``sprt_test``
    output schema (llr columns de-scaled to nats)."""
    from pyspark.sql import functions as F

    reg = read_registry(spark, registry_path)
    fu = float(int(units))
    return reg.select(
        *[c for c in reg.columns if c not in (
            "llr_units", "decision", "n_at_decision", "llr_at_decision_units")],
        F.coalesce(F.col("decision"), F.lit("continue")).alias("decision"),
        F.col("n_at_decision"),
        (F.col("llr_units").cast("double") / fu).alias("llr_final"),
        (F.col("llr_at_decision_units").cast("double") / fu).alias(
            "llr_at_decision"
        ),
    )


def streaming_bootstrap_registry(
    stream_df: DataFrame,
    registry_path: str,
    *,
    checkpoint_path: str,
    value_cents_col: str,
    key_col: str,
    replicates: int = 64,
    seed: str = "",
    trigger_once: bool = False,
):
    """Streaming Poisson-bootstrap registry — the online uncertainty
    monitor ``poisson_bootstrap_ci`` (q244) implies: per-replicate
    (sum w*v, sum w, n, sum v) are ADDITIVE integers, so folding each
    microbatch's B-row partial table into the registry keeps the exact
    bootstrap state of ALL history in B rows forever.  Finalize any time
    with ``bootstrap_ci_from_registry`` — value-identical to running the
    batch operator over every row ever seen (union-parity pinned), the
    q181/ST22 additive-registry law.

    Same (replicates, seed) for the registry's lifetime; row keys
    globally unique across batches (the standard registry contract).
    Exactly-once via versioned snapshots (streaming/exactly_once).
    """
    B = int(replicates)
    if B < 4:
        raise ValueError(f"replicates must be >= 4, got {B}")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        # the ONE md5 Poisson(1) coin definition — any drift between this
        # and the batch operator would silently break the pinned
        # union-parity between registry finalization and
        # poisson_bootstrap_ci over the concatenated history
        from patternly_spark.operators.drift import poisson1_weight

        spark = batch_df.sparkSession
        v = F.col(value_cents_col).cast("long")
        rows = batch_df.select(
            F.col(key_col).cast("string").alias("__k"), v.alias("__v")
        ).select(
            "__k", "__v",
            F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("__b"),
        )
        part = (
            rows.withColumn("__w", poisson1_weight(F.col("__k"), F.col("__b"), seed=seed))
            .groupBy(F.col("__b").alias("b"))
            .agg(
                F.sum(F.col("__w") * F.col("__v")).cast("long").alias("sw"),
                F.sum("__w").cast("long").alias("nw"),
                # every replicate group sees each base row exactly once,
                # so per-b count/sum ARE the batch's (n, sum v) — exact
                # integers, no division
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("__v").cast("long").alias("sv"),
            )
        )
        existing, _ = read_latest_snapshot(spark, registry_path, before_batch=batch_id)
        if existing is not None:
            part = (
                part.unionByName(existing)
                .groupBy("b")
                .agg(
                    F.sum("sw").cast("long").alias("sw"),
                    F.sum("nw").cast("long").alias("nw"),
                    F.sum("n").cast("long").alias("n"),
                    F.sum("sv").cast("long").alias("sv"),
                )
            )
        write_snapshot(part.localCheckpoint(eager=True), registry_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def bootstrap_ci_from_registry(
    spark, registry_path: str, *, ci: float = 0.95
):
    """Finalize the folded bootstrap registry into the q244 output row —
    identical to the batch ``poisson_bootstrap_ci`` over all rows ever
    streamed (the rank-selection half is replicate-count-sized)."""
    import math

    from pyspark.sql import Window

    reg = read_registry(spark, registry_path)
    B = reg.count()
    lo_rank = max(1, math.ceil(B * (1.0 - float(ci)) / 2.0))
    hi_rank = min(B, math.ceil(B * (1.0 + float(ci)) / 2.0))
    per = reg.withColumn(
        "__mean",
        F.when(
            F.col("nw") > 0,
            F.col("sw").cast("double") / F.col("nw").cast("double"),
        ),
    )
    ranked = per.withColumn(
        "__r", F.row_number().over(Window.orderBy(F.col("__mean").asc_nulls_last()))
    )
    bounds = ranked.agg(
        F.max(F.when(F.col("__r") == lo_rank, F.col("__mean"))).alias("lo_cents"),
        F.max(F.when(F.col("__r") == hi_rank, F.col("__mean"))).alias("hi_cents"),
    )
    # every b row carries the identical folded (n, sv) — max, not sum,
    # so mean_cents is the SAME double division the batch operator does
    base = reg.agg(
        F.max("n").cast("long").alias("n"),
        (F.max("sv").cast("double") / F.max("n").cast("double")).alias("mean_cents"),
    )
    return base.crossJoin(F.broadcast(bounds)).select(
        "n", "mean_cents", "lo_cents", "hi_cents", F.lit(B).cast("int").alias("replicates")
    )


def streaming_did_registry(
    stream_df: DataFrame,
    registry_path: str,
    *,
    checkpoint_path: str,
    unit_col: str,
    arm_col: str,
    is_post_col: str,
    value_cents_col: str,
    trigger_once: bool = False,
):
    """foreachBatch difference-in-differences registry (ST35): fold each
    microbatch's per-(arm, unit) integer (pre_cents, post_cents) sums
    into the persisted state by addition — a unit's rows may arrive in
    any batch and any order (pre and post interleaved), because the
    per-unit delta is a LINEAR function of additive sums.  State is
    unit-sized (the independence level DiD clusters on), never
    row-sized.  Finalize any time with ``did_from_registry`` —
    value-identical to ``operators/drift.diff_in_diff`` over all
    history (union-parity pinned).  Exactly-once via versioned
    snapshots (streaming/exactly_once)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        v = F.col(value_cents_col).cast("long")
        post = F.col(is_post_col).cast("int")
        # unit is kept as a STRING key: the batch diff_in_diff groups on
        # the unit column as-is (any type), and a cast to long would turn
        # string/decimal unit ids into NULL — silently collapsing every
        # unit into one pseudo-unit per arm and corrupting the DiD.  The
        # string cast preserves distinctness for every unit type, so
        # union-parity with the batch operator holds regardless of type.
        part = batch_df.groupBy(
            F.col(arm_col).cast("string").alias("arm"),
            F.col(unit_col).cast("string").alias("unit"),
        ).agg(
            F.sum(F.when(post == 1, v).otherwise(F.lit(0)))
            .cast("long")
            .alias("post_cents"),
            F.sum(F.when(post == 0, v).otherwise(F.lit(0)))
            .cast("long")
            .alias("pre_cents"),
        )
        existing, _ = read_latest_snapshot(spark, registry_path, before_batch=batch_id)
        if existing is not None:
            part = (
                part.unionByName(existing)
                .groupBy("arm", "unit")
                .agg(
                    F.sum("post_cents").cast("long").alias("post_cents"),
                    F.sum("pre_cents").cast("long").alias("pre_cents"),
                )
            )
        write_snapshot(part.localCheckpoint(eager=True), registry_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def did_from_registry(spark, registry_path: str) -> DataFrame:
    """DiD readout from a ``streaming_did_registry`` state: per-unit
    delta = post - pre (exact integers), then the ONE shared moment
    math (``operators/drift.did_from_deltas``) — value-identical to the
    batch operator over every row ever folded."""
    from patternly_spark.operators.drift import did_from_deltas

    reg = read_registry(spark, registry_path)
    arms = [r[0] for r in reg.select("arm").distinct().orderBy("arm").collect()]
    if len(arms) != 2:
        raise ValueError(f"did_from_registry needs exactly 2 arms, got {arms}")
    deltas = reg.select(
        F.col("arm").alias("__a"),
        (F.col("post_cents") - F.col("pre_cents")).cast("long").alias("__d"),
    )
    return did_from_deltas(deltas, ctrl=arms[0], trt=arms[1], gcols=[])


def streaming_rank_test_registry(
    stream_df: DataFrame,
    registry_path: str,
    *,
    checkpoint_path: str,
    arm_col: str,
    value_cents_col: str,
    quantize_to: int | None = None,
    trigger_once: bool = False,
):
    """foreachBatch Mann-Whitney registry (ST36): fold each
    microbatch's pooled value grid — per distinct cents value, (total
    count, treatment count) — into the persisted grid by integer
    addition.  State is value-grid-sized (distinct cents values), never
    row-sized; rows may arrive in any batch and order (counts commute).
    The treatment arm is pinned as the LEXICALLY GREATER of the two arm
    labels (the batch operator's ascending-arms convention) and
    validated at finalize.  Finalize any time with
    ``mwu_from_registry`` — value-identical to
    ``operators/drift.mann_whitney_u`` over all history (union-parity
    pinned).  Exactly-once via versioned snapshots.

    **State-size contract** (ST42): the grid holds one row per
    (distinct value, arm).  On a cents-quantized metric that is
    bounded by the price domain; on a HIGH-CARDINALITY continuous
    domain (latency micros, raw sensor readings) it approaches row
    count.  ``quantize_to`` bounds it: values fold as their bucket
    MIDPOINT ``v - pmod(v, q) + q div 2`` (pure integer arithmetic,
    floor-aligned for negatives), so state is
    ``<= (value_range / q + 1) * 2`` rows REGARDLESS of stream length.
    Every readout of this registry then answers EXACTLY for the
    quantized metric (union-parity with the batch operator over
    pre-quantized values is an identity); as estimates of the
    unquantized metric the error bounds are: per-value displacement
    <= q/2, hence Welch-moment readouts (TOST / power-MDE) shift means
    by <= q/2 per arm; KS/MWU compare the quantized ECDFs — the KS D
    statistic differs from the unquantized one by at most the largest
    CDF mass either sample places inside one bucket; Brown-Forsythe's
    type-1 medians and absolute deviations move by <= q each; the SRM
    readout counts rows and is UNAFFECTED by quantization.
    ``quantize_to`` is a WRITE-time contract — fix it per registry
    (folding batches with different q would mix incompatible grids);
    the readout functions need no parameter because the grid already
    IS the quantized metric."""
    if quantize_to is not None and int(quantize_to) < 1:
        raise ValueError(f"quantize_to must be >= 1, got {quantize_to}")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        vcol = F.col(value_cents_col).cast("long")
        if quantize_to is not None and int(quantize_to) > 1:
            q = F.lit(int(quantize_to))
            vcol = (vcol - F.pmod(vcol, q) + F.lit(int(quantize_to) // 2)).cast(
                "long"
            )
        # per-batch partial grid keeps per-arm counts separately so the
        # treatment label needs no cross-batch agreement at fold time
        part = batch_df.groupBy(
            vcol.alias("__v"),
            F.col(arm_col).cast("string").alias("arm"),
        ).agg(F.count(F.lit(1)).cast("long").alias("n"))
        existing, _ = read_latest_snapshot(spark, registry_path, before_batch=batch_id)
        if existing is not None:
            part = (
                part.unionByName(existing)
                .groupBy("__v", "arm")
                .agg(F.sum("n").cast("long").alias("n"))
            )
        write_snapshot(part.localCheckpoint(eager=True), registry_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def mwu_from_registry(spark, registry_path: str) -> DataFrame:
    """Mann-Whitney readout from a ``streaming_rank_test_registry``
    state: collapse the per-(value, arm) counts to the ([,] __v, __c,
    __ct) grid the ONE shared finalizer
    (``operators/drift.mwu_from_grid``) consumes — value-identical to
    the batch operator over every row ever folded."""
    from patternly_spark.operators.drift import mwu_from_grid

    reg = read_registry(spark, registry_path)
    arms = [r[0] for r in reg.select("arm").distinct().orderBy("arm").collect()]
    if len(arms) != 2:
        raise ValueError(f"mwu_from_registry needs exactly 2 arms, got {arms}")
    trt = arms[1]
    grid = reg.groupBy("__v").agg(
        F.sum("n").cast("long").alias("__c"),
        F.sum(F.when(F.col("arm") == trt, F.col("n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("__ct"),
    )
    return mwu_from_grid(grid, gcols=[])


def ks_from_registry(spark, registry_path: str) -> DataFrame:
    """Kolmogorov-Smirnov readout from the SAME
    ``streaming_rank_test_registry`` state (ST36) — the per-(value,
    arm) counts it folds are exactly the pooled ECDF grid
    ``operators/drift.ks_from_grid`` consumes, so one registry serves
    BOTH the rank test (location shift) and the KS test (any
    distributional shift) with no extra state.  Value-identical to
    ``operators/drift.ks_two_sample`` over every row ever folded."""
    from patternly_spark.operators.drift import ks_from_grid

    reg = read_registry(spark, registry_path)
    arms = [r[0] for r in reg.select("arm").distinct().orderBy("arm").collect()]
    if len(arms) != 2:
        raise ValueError(f"ks_from_registry needs exactly 2 arms, got {arms}")
    trt = arms[1]
    grid = reg.groupBy("__v").agg(
        F.sum("n").cast("long").alias("__c"),
        F.sum(F.when(F.col("arm") == trt, F.col("n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("__ct"),
    )
    return ks_from_grid(grid, gcols=[])


def _grid_from_rank_registry(spark, registry_path: str):
    """(grid, arms) from a ``streaming_rank_test_registry`` state: the
    ([,] __v, __c, __ct) pooled grid every two-sample finalizer
    consumes, plus the ascending arm labels."""
    reg = read_registry(spark, registry_path)
    arms = [r[0] for r in reg.select("arm").distinct().orderBy("arm").collect()]
    if len(arms) != 2:
        raise ValueError(f"two-sample readout needs exactly 2 arms, got {arms}")
    trt = arms[1]
    grid = reg.groupBy("__v").agg(
        F.sum("n").cast("long").alias("__c"),
        F.sum(F.when(F.col("arm") == trt, F.col("n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("__ct"),
    )
    return grid, arms


def _moments_from_grid(grid: DataFrame) -> DataFrame:
    """Per-arm Welch moments derived EXACTLY from the value grid:
    n = sum counts, s = sum v*n (BIGINT), ss = sum v^2*n (DECIMAL) —
    integer arithmetic identical to the batch per-row aggregation."""
    vd = F.col("__v").cast("decimal(19,0)")

    def arm_moments(cnt, tag):
        return grid.agg(
            F.lit(tag).alias("__a"),
            F.sum(cnt).cast("long").alias("n"),
            F.sum(F.col("__v") * cnt).cast("long").alias("s"),
            F.sum(vd * vd * cnt.cast("decimal(19,0)")).cast("decimal(38,0)").alias("ss"),
        )

    return arm_moments(F.col("__c") - F.col("__ct"), "c").unionByName(
        arm_moments(F.col("__ct"), "t")
    )


def brown_forsythe_from_registry(spark, registry_path: str) -> DataFrame:
    """Brown-Forsythe readout over the ST36 grid — zero extra state;
    value-identical to ``operators/drift.brown_forsythe`` over every
    row ever folded (the ONE shared ``brown_forsythe_from_grid``)."""
    from patternly_spark.operators.drift import brown_forsythe_from_grid

    grid, _ = _grid_from_rank_registry(spark, registry_path)
    return brown_forsythe_from_grid(grid, gcols=[])


def tost_from_registry(
    spark, registry_path: str, *, margin_cents: float, alpha: float = 0.05
) -> DataFrame:
    """TOST equivalence readout over the ST36 grid — zero extra state;
    the margin is a READOUT-time parameter (not baked into state);
    value-identical to ``operators/drift.tost_equivalence``."""
    from patternly_spark.operators.drift import _moment_pivot, tost_from_moments

    if not float(margin_cents) > 0:
        raise ValueError(f"margin_cents must be > 0, got {margin_cents}")
    grid, _ = _grid_from_rank_registry(spark, registry_path)
    per = _moments_from_grid(grid)
    return tost_from_moments(
        _moment_pivot(per, "c", "t"), margin_cents=margin_cents, alpha=alpha
    )


def power_mde_from_registry(
    spark,
    registry_path: str,
    *,
    z_alpha: float = 1.959963984540054,
    z_power: float = 0.8416212335729143,
) -> DataFrame:
    """Power/MDE readout over the ST36 grid — zero extra state;
    value-identical to ``operators/drift.power_mde``."""
    from patternly_spark.operators.drift import (
        _moment_pivot,
        power_mde_from_moments,
    )

    grid, _ = _grid_from_rank_registry(spark, registry_path)
    per = _moments_from_grid(grid)
    return power_mde_from_moments(
        _moment_pivot(per, "c", "t"), z_alpha=z_alpha, z_power=z_power
    )


def srm_from_registry(
    spark,
    registry_path: str,
    *,
    expected_control: float = 0.5,
    alpha: float = 0.001,
) -> DataFrame:
    """SRM readout over the ST36 grid — zero extra state; the design
    ratio is a READOUT-time parameter; value-identical to
    ``operators/drift.srm_check``."""
    from patternly_spark.operators.drift import srm_from_counts

    if not 0.0 < float(expected_control) < 1.0:
        raise ValueError(
            f"expected_control must be in (0,1), got {expected_control}"
        )
    grid, _ = _grid_from_rank_registry(spark, registry_path)
    agg = grid.agg(
        F.sum(F.col("__c") - F.col("__ct")).cast("long").alias("n_control"),
        F.sum("__ct").cast("long").alias("n_treatment"),
    )
    return srm_from_counts(agg, expected_control=expected_control, alpha=alpha)


def streaming_jackknife_registry(
    stream_df: DataFrame,
    registry_path: str,
    *,
    checkpoint_path: str,
    arm_col: str,
    bucket_col: str,
    value_cents_col: str,
    trigger_once: bool = False,
):
    """foreachBatch jackknife-ratio registry (ST38): fold each
    microbatch's per-(arm, bucket) integer (sum_cents, n) into the
    persisted state by addition — a bucket's rows may arrive in any
    batch and any order, because the leave-one-out ratio is a function
    of additive per-bucket sums only.  State is bucket-sized (arms x
    randomization buckets — tens to hundreds of rows), never
    row-sized.  Finalize any time with ``jackknife_from_registry`` —
    value-identical to ``operators/drift.jackknife_ratio_ci`` over all
    history (union-parity pinned).  Exactly-once via versioned
    snapshots (streaming/exactly_once).

    Arms and buckets are kept as STRING keys (the ST35 convention: a
    cast to long would NULL-collapse string/decimal ids and corrupt the
    readout; strings preserve distinctness for every id type)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        v = F.col(value_cents_col).cast("long")
        part = batch_df.groupBy(
            F.col(arm_col).cast("string").alias("arm"),
            F.col(bucket_col).cast("string").alias("bucket"),
        ).agg(
            F.sum(v).cast("long").alias("s_j"),
            F.count(F.lit(1)).cast("long").alias("n_j"),
        )
        existing, _ = read_latest_snapshot(spark, registry_path, before_batch=batch_id)
        if existing is not None:
            part = (
                part.unionByName(existing)
                .groupBy("arm", "bucket")
                .agg(
                    F.sum("s_j").cast("long").alias("s_j"),
                    F.sum("n_j").cast("long").alias("n_j"),
                )
            )
        write_snapshot(part.localCheckpoint(eager=True), registry_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def jackknife_from_registry(spark, registry_path: str, *, z: float = 1.96) -> DataFrame:
    """Jackknife ratio readout from a ``streaming_jackknife_registry``
    state: the ONE shared moment math
    (``operators/drift.jackknife_from_buckets``) over the folded
    per-bucket sums — value-identical to the batch operator over every
    row ever folded."""
    from patternly_spark.operators.drift import jackknife_from_buckets

    reg = read_registry(spark, registry_path)
    per_bucket = reg.select(
        "arm", F.col("bucket").alias("__b"), "s_j", "n_j"
    )
    return jackknife_from_buckets(per_bucket, z=z)


def streaming_contingency_registry(
    stream_df: DataFrame,
    registry_path: str,
    *,
    checkpoint_path: str,
    row_col: str,
    col_col: str,
    trigger_once: bool = False,
):
    """foreachBatch contingency registry (ST43): fold each microbatch's
    (row category, column category) CELL COUNTS into the persisted grid
    by integer addition — cells commute, rows may arrive in any batch
    and order.  State is CELL-sized (r x c observed category pairs:
    event types x cohorts, languages x sources), never row-sized — the
    categorical sibling of the ST36 value grid, naturally bounded
    because categories are driver-describable by the q273 contract.
    Finalize any time with ``chi2_independence_from_registry`` —
    value-identical to ``operators/drift.chi2_independence`` over all
    history (the ONE shared ``chi2_from_cells`` finalizer; ``alpha`` is
    a READOUT-time parameter).  Exactly-once via versioned snapshots."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = batch_df.groupBy(
            F.col(row_col).cast("string").alias("row_key"),
            F.col(col_col).cast("string").alias("col_key"),
        ).agg(F.count(F.lit(1)).cast("long").alias("n"))
        existing, _ = read_latest_snapshot(spark, registry_path, before_batch=batch_id)
        if existing is not None:
            part = (
                part.unionByName(existing)
                .groupBy("row_key", "col_key")
                .agg(F.sum("n").cast("long").alias("n"))
            )
        write_snapshot(part.localCheckpoint(eager=True), registry_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def chi2_independence_from_registry(
    spark, registry_path: str, *, alpha: float = 0.05
) -> DataFrame:
    """Chi-square independence readout from a
    ``streaming_contingency_registry`` state — the folded cell grid IS
    the (row_key, col_key, n) input of the ONE shared
    ``chi2_from_cells`` finalizer, so finalize == batch
    ``chi2_independence`` over every row ever folded (identity, not
    approximation)."""
    from patternly_spark.operators.drift import chi2_from_cells

    reg = read_registry(spark, registry_path)
    return chi2_from_cells(reg, alpha=alpha)


def streaming_rate_registry(
    stream_df: DataFrame,
    registry_path: str,
    *,
    checkpoint_path: str,
    arm_col: str,
    events_col: str,
    exposure_col: str,
    trigger_once: bool = False,
):
    """foreachBatch Poisson-rate registry (ST44): fold each
    microbatch's per-arm (units, events, exposure) integer triples by
    addition — the count-metric gate's sufficient statistic is purely
    additive, so rows may arrive in any batch and order.  State is
    ARM-sized (two rows), the smallest registry in the family.
    Finalize any time with ``poisson_rate_from_registry`` —
    value-identical to ``operators/drift.poisson_rate_test`` over all
    history (the ONE shared ``poisson_rate_from_counts`` finalizer;
    ``alpha`` is a READOUT-time parameter).  Exactly-once via
    versioned snapshots."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = batch_df.groupBy(
            F.col(arm_col).cast("string").alias("__a")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col(events_col).cast("long")).cast("long").alias("e"),
            F.sum(F.col(exposure_col).cast("long")).cast("long").alias("x"),
        )
        existing, _ = read_latest_snapshot(spark, registry_path, before_batch=batch_id)
        if existing is not None:
            part = (
                part.unionByName(existing)
                .groupBy("__a")
                .agg(
                    F.sum("n").cast("long").alias("n"),
                    F.sum("e").cast("long").alias("e"),
                    F.sum("x").cast("long").alias("x"),
                )
            )
        write_snapshot(part.localCheckpoint(eager=True), registry_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def poisson_rate_from_registry(
    spark, registry_path: str, *, alpha: float = 0.05
) -> DataFrame:
    """Poisson-rate readout from a ``streaming_rate_registry`` state —
    the folded (__a, n, e, x) rows ARE the input of the ONE shared
    ``poisson_rate_from_counts`` finalizer, so finalize == batch
    ``poisson_rate_test`` over every row ever folded."""
    from patternly_spark.operators.drift import poisson_rate_from_counts

    reg = read_registry(spark, registry_path)
    return poisson_rate_from_counts(reg, alpha=alpha)
