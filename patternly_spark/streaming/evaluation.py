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
