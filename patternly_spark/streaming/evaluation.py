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
    Read-merge-overwrite is sequential across microbatches; the merged
    row is localCheckpoint-pinned before overwriting the files it was
    read from (the streaming_hll_registry pattern)."""
    from patternly_spark.operators.model_eval import _ranking_sums

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
        try:
            existing = spark.read.parquet(registry_path)
            merged = sums.unionByName(existing).agg(
                *[F.sum(c).cast("long").alias(c) for c in sums.columns]
            )
        except Exception:
            merged = sums
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            registry_path
        )

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

    tot = spark.read.parquet(registry_path)
    return _sums_to_metrics(tot, k_values=k_values, units=units)
