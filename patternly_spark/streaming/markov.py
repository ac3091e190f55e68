"""Streaming transition-matrix registry — the continuous twin of the
q154 empirical Markov statistics.

The subtlety a naive per-batch count misses: the transition BETWEEN two
microbatches (a user's last event of batch k, first event of batch k+1)
belongs to the matrix too.  The registry therefore persists two
relations:

- ``{path}/counts``: additive (from_type, to_type, n_trans) — merged
  per batch with a plain groupBy-sum (commutative, so registry ==
  batch matrix of all history, pinned in tests);
- ``{path}/state``: ONE row per user — the latest (event-time, id,
  type) seen — prepended to the next batch before pair formation, so
  cross-batch transitions are counted exactly once.

Exactness contract (same as the streaming EMA/CUSUM folds): per-user
arrival must be event-time ordered across batches — an event older than
the stored last event would mis-sequence its pair.  State is one row
per active user (key-cardinality, not traffic-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["streaming_transition_registry", "transition_matrix_from_registry"]


def streaming_transition_registry(
    stream_df: DataFrame,
    registry_path: str,
    *,
    checkpoint_path: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    trigger_once: bool = False,
):
    """foreachBatch wrapper maintaining the counts + last-event state
    described in the module docstring.  Read-merge-overwrite is
    sequential across microbatches; both relations are
    localCheckpoint-pinned before overwriting the files they were read
    from."""
    counts_path = f"{registry_path}/counts"
    state_path = f"{registry_path}/state"

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        b = batch_df.select(
            F.col(user_col).alias("user"),
            F.unix_micros(F.col(ts_col)).alias("t"),
            F.col(id_col).cast("long").alias("eid"),
            F.col(type_col).alias("et"),
        )
        from patternly_spark.streaming.exactly_once import (
            read_latest_snapshot,
            write_snapshot,
        )

        state, _ = read_latest_snapshot(spark, state_path, before_batch=batch_id)
        allr = b.unionByName(state) if state is not None else b
        w = Window.partitionBy("user").orderBy("t", "eid")
        pairs = (
            allr.select(
                "user",
                F.col("et").alias("from_type"),
                F.lead("et").over(w).alias("to_type"),
            )
            .filter(F.col("to_type").isNotNull())
        )
        new_counts = pairs.groupBy("from_type", "to_type").agg(
            F.count(F.lit(1)).cast("long").alias("n_trans")
        )
        existing, _ = read_latest_snapshot(spark, counts_path, before_batch=batch_id)
        if existing is not None:
            new_counts = (
                new_counts.unionByName(existing)
                .groupBy("from_type", "to_type")
                .agg(F.sum("n_trans").cast("long").alias("n_trans"))
            )
        ws = Window.partitionBy("user").orderBy(F.desc("t"), F.desc("eid"))
        new_state = (
            allr.withColumn("__r", F.row_number().over(ws))
            .filter(F.col("__r") == 1)
            .select("user", "t", "eid", "et")
        )
        write_snapshot(new_counts.localCheckpoint(eager=True), counts_path, batch_id)
        write_snapshot(new_state.localCheckpoint(eager=True), state_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def transition_matrix_from_registry(counts: DataFrame) -> DataFrame:
    """Row-normalized probabilities from a counts registry — identical
    arithmetic to the batch q154 tail."""
    totals = counts.groupBy("from_type").agg(
        F.sum("n_trans").cast("long").alias("n_from")
    )
    return counts.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        F.col("n_trans").cast("long").alias("n_trans"),
        "n_from",
        (F.col("n_trans").cast("double") / F.col("n_from").cast("double")).alias("prob"),
    )
