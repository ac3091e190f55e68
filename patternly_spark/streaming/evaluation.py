"""Streaming retrieval-evaluation registry.

The batch ``ranking_metrics`` (q212) splits into an ADDITIVE integer-sum
half (`operators/model_eval._ranking_sums`: one row of n_queries + per-k
precision/recall/NDCG/MRR sums in 2^-20 units) and a finalize half
(`_sums_to_metrics`).  Integer sums over disjoint query sets fold by
column-wise addition, so an online evaluation — ANN quality tracked as
fresh query batches stream in — persists just that one row and stays
EXACTLY equal to the batch metric over all history (union-parity pinned
in tests).

Contract: each microbatch carries COMPLETE ranked lists for new queries
(the ANN search emits whole top-k lists; a query's list never spans
batches).  Re-scored queries are new observations, not upserts — the
corpus mean is over query-EVALUATIONS, same as running the batch metric
over the concatenated history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["streaming_ranking_registry", "ranking_registry_metrics"]


def streaming_ranking_registry(
    stream_df: DataFrame,
    registry_path: str,
    *,
    checkpoint_path: str,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    k_values: tuple[int, ...] = (1, 5, 10),
    units: int = 1 << 20,
    trigger_once: bool = False,
):
    """foreachBatch wrapper: fold each microbatch's ranking sums into
    the persisted 1-row registry by column-wise integer addition.
    Exactly-once under foreachBatch retries: batch N folds on top of the
    latest committed snapshot with id < N and writes snapshot N
    (``exactly_once.write_snapshot``), so a crash-and-retry re-reads the
    same predecessor and rewrites snapshot N byte-identically — no
    double-fold, no overwrite-in-place data-loss window."""
    from patternly_spark.operators.model_eval import _ranking_sums
    from patternly_spark.streaming.exactly_once import (
        read_latest_snapshot,
        write_snapshot,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sums = _ranking_sums(
            batch_df,
            query_col=query_col,
            rank_col=rank_col,
            rel_col=rel_col,
            k_values=k_values,
            units=units,
        )
        existing, _ = read_latest_snapshot(
            spark, registry_path, before_batch=batch_id
        )
        merged = (
            sums.unionByName(existing).agg(
                *[F.sum(c).cast("long").alias(c) for c in sums.columns]
            )
            if existing is not None
            else sums
        )
        write_snapshot(merged.localCheckpoint(eager=True), registry_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ranking_registry_metrics(
    spark: SparkSession,
    registry_path: str,
    *,
    k_values: tuple[int, ...] = (1, 5, 10),
    units: int = 1 << 20,
) -> DataFrame:
    """Finalize the persisted registry into the q212 metric table —
    identical to running batch ``ranking_metrics`` over every ranked
    list ever folded in."""
    from patternly_spark.operators.model_eval import _sums_to_metrics
    from patternly_spark.streaming.exactly_once import read_registry

    tot = read_registry(spark, registry_path)
    return _sums_to_metrics(tot, k_values=k_values, units=units)


def streaming_conformal_monitor(
    stream_df: DataFrame,
    qhat_df: DataFrame,
    registry_path: str,
    *,
    checkpoint_path: str,
    score_col: str,
    by: str | None = None,
    trigger_once: bool = False,
):
    """Streaming conformal-coverage monitor — the deployment half of
    ``model_eval.conformal_calibration`` (q242/q243): the conformal
    guarantee only holds while production data stays exchangeable with
    the calibration set, so the thing to watch online is EMPIRICAL
    COVERAGE against the FROZEN calibration quantiles.

    FROZEN-SNAPSHOT policy (the ST24 frozen-IDF precedent): ``qhat_df``
    is the calibration output — ([by,] alpha, q_hat) — pinned at
    monitor creation; recomputing q_hat per batch would make coverage
    trivially ~1-alpha and blind the monitor.  Each microbatch folds
    (n_test, n_covered) per (group, alpha) additively into the registry
    (exactly-once snapshots), so ``conformal_coverage_from_registry``
    always equals evaluating the frozen q_hat over ALL rows seen —
    union-parity pinned.  Coverage drifting below 1-alpha is the
    recalibrate signal (rebuild the calibration set, swap the
    snapshot — never mix).
    """
    from patternly_spark.streaming.exactly_once import (
        read_latest_snapshot,
        write_snapshot,
    )

    gcols = [by] if by else []
    pinned = qhat_df.select(*gcols, "alpha", "q_hat").localCheckpoint(eager=True)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        s = F.col(score_col).cast("double")
        side = batch_df.select(*gcols, s.alias("__t"))
        joined = (
            side.join(F.broadcast(pinned), gcols)
            if gcols
            else side.crossJoin(F.broadcast(pinned))
        )
        part = joined.groupBy(*gcols, "alpha", "q_hat").agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(F.col("q_hat").isNull() | (F.col("__t") <= F.col("q_hat")), 1)
                .otherwise(0)
            ).cast("long").alias("n_covered"),
        )
        existing, _ = read_latest_snapshot(spark, registry_path, before_batch=batch_id)
        if existing is not None:
            part = (
                part.unionByName(existing)
                .groupBy(*gcols, "alpha", "q_hat")
                .agg(
                    F.sum("n_test").cast("long").alias("n_test"),
                    F.sum("n_covered").cast("long").alias("n_covered"),
                )
            )
        write_snapshot(part.localCheckpoint(eager=True), registry_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def conformal_coverage_from_registry(spark: SparkSession, registry_path: str) -> DataFrame:
    """Coverage table from the folded monitor registry — for each
    ([group,] alpha): n_test, n_covered, coverage, and ``holding``
    (coverage >= 1 - alpha, the guarantee's online health bit)."""
    from patternly_spark.streaming.exactly_once import read_registry

    reg = read_registry(spark, registry_path)
    cov = F.col("n_covered").cast("double") / F.col("n_test").cast("double")
    return reg.select(
        *[c for c in reg.columns if c not in ("n_test", "n_covered")],
        "n_test",
        "n_covered",
        cov.alias("coverage"),
        (cov >= (F.lit(1.0) - F.col("alpha"))).alias("holding"),
    )
