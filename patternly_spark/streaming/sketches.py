"""Streaming Count-Min sketch — the continuous twin of
``operators/sketches.count_min_counters``.

CMS counters are cell-wise ADDITIVE, so the incremental registry is the
whole design: sketch each microbatch, add it into the persisted counter
grid, overwrite.  The registry never exceeds ``depth * width`` rows no
matter how much history has streamed through — the rare sketch whose
state is exactly bounded — and after any prefix of batches it equals
the batch sketch of every row seen so far (parity law pinned in tests).
Point-query the registry at any time with
``operators/sketches.count_min_lookup``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from patternly_spark.streaming.exactly_once import (
    read_latest_snapshot,
    write_snapshot,
)

from patternly_spark.operators.sketches import count_min_counters, mg_merge, mg_summaries

__all__ = [
    "streaming_count_min",
    "streaming_frequent_items",
    "streaming_hll_registry",
    "streaming_log2_histogram",
]


def streaming_count_min(
    stream_df: DataFrame,
    item_col: str,
    registry_path: str,
    *,
    checkpoint_path: str,
    depth: int = 4,
    width: int = 1024,
    seed: str = "",
    trigger_once: bool = False,
):
    """foreachBatch wrapper: sketch each microbatch and fold it into the
    parquet counter grid at ``registry_path`` (j, cell, cnt).

    Exactly-once under foreachBatch retries via streaming/exactly_once
    (versioned snapshots — a replay re-folds on the predecessor and
    rewrites its own snapshot).  ``depth``/``width``/``seed`` must stay fixed for
    a registry's lifetime — counters of different grids do not add."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        grid = count_min_counters(
            batch_df, item_col, depth=depth, width=width, seed=seed
        )
        existing, _ = read_latest_snapshot(spark, registry_path, before_batch=batch_id)
        if existing is not None:
            grid = (
                grid.unionByName(existing)
                .groupBy("j", "cell")
                .agg(F.sum("cnt").cast("long").alias("cnt"))
            )
        write_snapshot(grid.localCheckpoint(eager=True), registry_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_frequent_items(
    stream_df: DataFrame,
    group_col: str,
    item_col: str,
    registry_path: str,
    *,
    checkpoint_path: str,
    capacity: int = 64,
    trigger_once: bool = False,
):
    """foreachBatch wrapper: fold each microbatch's Misra-Gries summary
    into the persisted summary registry at ``registry_path`` (group,
    item, w, dec), pruning back to ``capacity`` items per group each
    fold (Agarwal et al. mergeable-summary merge) — so the registry
    stays O(capacity) per group over unbounded history while the
    lo <= true <= hi contract holds for every retained item.  Read the
    answer any time with ``operators/sketches.mg_finalize`` on the
    registry.  Read-merge-overwrite is sequential across microbatches;
    the merged summary is localCheckpoint-pinned before overwriting the
    files it was read from."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        summary = mg_summaries(batch_df, group_col, item_col, capacity=capacity)
        existing, _ = read_latest_snapshot(spark, registry_path, before_batch=batch_id)
        if existing is not None:
            summary = summary.unionByName(existing)
        merged = mg_merge(summary, group_col, item_col, capacity=capacity)
        write_snapshot(merged.localCheckpoint(eager=True), registry_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_hll_registry(
    stream_df: DataFrame,
    item_col: str,
    registry_path: str,
    *,
    checkpoint_path: str,
    p: int = 12,
    seed: str = "",
    by: str | None = None,
    trigger_once: bool = False,
):
    """foreachBatch wrapper: fold each microbatch's HyperLogLog
    registers into the persisted register table with
    ``groupBy(reg).max(rho)`` — the HLL union is associative and
    commutative, so registry == registers of all history (pinned in
    tests), with at most 2^p rows per group forever.  Read the distinct
    estimate any time with ``operators/sketches.hll_estimate`` on the
    registry.  Read-merge-overwrite is sequential across microbatches;
    the merged table is localCheckpoint-pinned before overwriting the
    files it was read from."""
    from patternly_spark.operators.sketches import hll_merge, hll_registers

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        regs = hll_registers(batch_df, item_col, p=p, seed=seed, by=by)
        existing, _ = read_latest_snapshot(spark, registry_path, before_batch=batch_id)
        if existing is not None:
            regs = hll_merge(regs, existing, by=by)
        write_snapshot(regs.localCheckpoint(eager=True), registry_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_log2_histogram(
    stream_df: DataFrame,
    value_col: str,
    registry_path: str,
    *,
    checkpoint_path: str,
    by: str | None = None,
    trigger_once: bool = False,
):
    """foreachBatch wrapper: fold each microbatch's log2 histogram into
    the persisted bucket counts (additive groupBy-sum — registry ==
    batch sketch of all history, pinned in tests), at most 64 rows per
    group forever.  Quantiles any time via
    ``operators/sketches.log2_quantile`` on the registry."""
    from patternly_spark.operators.sketches import log2_histogram, log2_histogram_merge

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        h = log2_histogram(batch_df, value_col, by=by)
        existing, _ = read_latest_snapshot(spark, registry_path, before_batch=batch_id)
        if existing is not None:
            h = log2_histogram_merge(h, existing, by=by)
        write_snapshot(h.localCheckpoint(eager=True), registry_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
