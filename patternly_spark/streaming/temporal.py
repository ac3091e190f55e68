"""Streaming deployment shape for Kleinberg burst detection (ST37).

There is deliberately NO bounded-state streaming Kleinberg twin: the
Viterbi decode is GLOBAL over each key's full gap series — a single new
event changes n (and with it the base rate lam0 = n/T, the burst rate,
and the ``gamma * ln n`` entry cost), which can flip state assignments
arbitrarily far in the past.  Any fixed per-key summary that could fold
additively would change the decoded answer; a "streaming Kleinberg"
with bounded state would be a different (and silently weaker) detector.

The deployment shape is therefore REGISTRY + BATCH REPLAY:

- ``streaming_event_log_registry`` appends each microbatch's raw
  (key, ts[, id]) event rows exactly-once (per-batch ``_batch_id=``
  partitions with dynamic partition overwrite — a retry replaces its
  own orphan, the ST32 append primitive);
- ``bursts_from_event_log`` runs the batch q249 operator
  (``operators/temporal.kleinberg_bursts``) over the accumulated log
  at readout time — value-identical to a batch run over all history
  BY CONSTRUCTION, because it IS the batch operator over all history.

State is the event log itself (row-sized, like any bronze table), not
an operator summary; at 100 TB the log lives partitioned by
``_batch_id/_day`` and readouts prune to the keys/time ranges under
investigation before the per-key decode (``keys=`` broadcast semi-join;
``min_ts_us``/``max_ts_us`` partition-prune whole day directories at
the file listing — PartitionFilters pinned by tests).  The decode is
per-key-bounded — the sessionize contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["streaming_event_log_registry", "bursts_from_event_log"]


def streaming_event_log_registry(
    stream_df: DataFrame,
    registry_path: str,
    *,
    checkpoint_path: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str | None = None,
    trigger_once: bool = False,
):
    """foreachBatch append of raw (key, ts_us[, id]) event rows —
    exactly-once via per-batch dynamic-partition-overwrite (the ST32
    append primitive).  Timestamps are stored as epoch MICROSECONDS
    (the engine's cross-engine timestamp convention) so the batch
    replay needs no timezone-sensitive parsing.

    Layout: ``_batch_id=<n>/_day=<epoch_day>/`` — the coarse UTC-day
    sub-partition is what lets ``bursts_from_event_log(min_ts_us=...)``
    prune a 100 TB log at the FILE LISTING (PartitionFilters), not by
    scanning rows (round-8 verdict item 4).  Pointing this writer at a
    registry whose earlier batches were written WITHOUT ``_day`` is
    REFUSED by ``write_batch_partition`` (the mixed tree would be
    unreadable — 'conflicting directory structures'); migrate such a
    log by reading it and rewriting its batches under the new scheme.
    Homogeneous legacy logs (all batches flat) stay readable and fall
    back to the row-level time filter at readout."""
    from patternly_spark.streaming.exactly_once import write_batch_partition

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        ts_type = batch_df.schema[ts_col].dataType.simpleString()
        tcol = (
            F.unix_micros(F.col(ts_col))
            if ts_type.startswith("timestamp")
            else F.col(ts_col).cast("long")
        )
        cols = [F.col(key_col).alias("key"), tcol.alias("ts_us")]
        if id_col is not None:
            cols.append(F.col(id_col).cast("long").alias("eid"))
        part = batch_df.select(*cols).withColumn(
            # same integer-div day key as the ITS registry (`div`
            # truncates toward zero; consistent with its_from_daily)
            "_day", F.expr("ts_us div 86400000000").cast("long")
        )
        write_batch_partition(
            part, registry_path, batch_id, sub_partition_cols=("_day",)
        )

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def bursts_from_event_log(
    spark: SparkSession,
    registry_path: str,
    *,
    s: float = 2.0,
    gamma: float = 1.0,
    min_events: int = 3,
    keys: DataFrame | None = None,
    min_ts_us: int | None = None,
    max_ts_us: int | None = None,
) -> DataFrame:
    """Burst intervals over the events under investigation — the batch
    q249 operator replayed over the (pruned) accumulated log, hence
    value-identical to a batch run over the same window (the parity is
    an identity, not an approximation).

    Pruning — how a 100 TB log stays readable:

    - ``keys`` (a 1-column DataFrame) restricts to the keys under
      investigation via a broadcast semi-join BEFORE the per-key
      Viterbi decode;
    - ``min_ts_us`` / ``max_ts_us`` restrict the time range.  On logs
      written by ``streaming_event_log_registry`` the coarse filter
      lands on the ``_day`` PARTITION column, so out-of-range days are
      pruned at the file listing (PartitionFilters in the scan —
      pinned by tests/test_bursts.py), with an exact row-level ts_us
      filter on the edge days; legacy logs without ``_day`` fall back
      to the row filter alone.

    NOTE the semantics of time pruning: Kleinberg's decode is global
    over each key's gap series, so a windowed readout IS the analysis
    of that window (base rate, entry costs, and states are computed
    from the window), exactly as a batch run over the same window —
    not a crop of the all-history decode.
    """
    from patternly_spark.operators.temporal import kleinberg_bursts
    from patternly_spark.streaming.exactly_once import read_appended

    events = read_appended(spark, registry_path)
    if events is None:
        raise ValueError(f"no events appended under {registry_path}")
    if min_ts_us is not None or max_ts_us is not None:
        day_us = 86_400_000_000

        def _trunc_day(x: int) -> int:
            # match the writer's `ts_us div 86400000000` (SQL div
            # truncates toward zero); Python // floors, which disagrees
            # on negative (pre-1970) stamps.  trunc is monotonic, so
            # _day >= trunc(lo) / _day <= trunc(hi) never drops an
            # in-range row.
            x = int(x)
            return x // day_us if x >= 0 else -((-x) // day_us)

        if "_day" in events.columns:
            if min_ts_us is not None:
                events = events.filter(F.col("_day") >= F.lit(_trunc_day(min_ts_us)))
            if max_ts_us is not None:
                events = events.filter(F.col("_day") <= F.lit(_trunc_day(max_ts_us)))
        if min_ts_us is not None:
            events = events.filter(F.col("ts_us") >= F.lit(int(min_ts_us)))
        if max_ts_us is not None:
            events = events.filter(F.col("ts_us") <= F.lit(int(max_ts_us)))
    if "_day" in events.columns:
        events = events.drop("_day")
    if keys is not None:
        kdf = keys.toDF("key").select(F.col("key"))
        events = events.join(F.broadcast(kdf), "key", "left_semi")
    has_id = "eid" in events.columns
    return kleinberg_bursts(
        events,
        key_col="key",
        ts_col="ts_us",
        id_col="eid" if has_id else None,
        s=s,
        gamma=gamma,
        min_events=min_events,
    )


def streaming_its_registry(
    stream_df: DataFrame,
    registry_path: str,
    *,
    checkpoint_path: str,
    ts_col: str = "ts",
    value_cents_col: str = "cents",
    trigger_once: bool = False,
):
    """foreachBatch interrupted-time-series registry (ST39): fold each
    microbatch's per-epoch-day integer cent totals into the persisted
    state by addition — a day's rows may arrive in any batch and any
    order, because the segmented-OLS moments are functions of additive
    daily sums only.  State is day-count-sized (one row per observed
    day), never row-sized.  Finalize any time with
    ``its_from_registry`` — value-identical to
    ``operators/temporal.interrupted_time_series`` over all history
    (union-parity pinned).  Exactly-once via versioned snapshots
    (streaming/exactly_once).

    The registry IS the launch-monitoring deployment shape: fold the
    metric stream continuously, read the level/slope-change verdict
    whenever asked, move the ``break_day`` parameter at READOUT time
    (it is not baked into the state)."""
    from patternly_spark.streaming.exactly_once import (
        read_latest_snapshot,
        write_snapshot,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ts_type = batch_df.schema[ts_col].dataType.simpleString()
        us = (
            F.unix_micros(F.col(ts_col))
            if ts_type.startswith("timestamp")
            else F.col(ts_col).cast("long")
        )
        part = (
            batch_df.select(
                us.alias("__us"),
                F.col(value_cents_col).cast("long").alias("v"),
            )
            # same integer-div day key as the batch operator (`div`
            # truncates; a pmod-based floor would disagree pre-1970)
            .withColumn("d", F.expr("__us div 86400000000").cast("long"))
            .groupBy("d")
            .agg(F.sum("v").cast("long").alias("y"))
        )
        existing, _ = read_latest_snapshot(spark, registry_path, before_batch=batch_id)
        if existing is not None:
            part = (
                part.unionByName(existing)
                .groupBy("d")
                .agg(F.sum("y").cast("long").alias("y"))
            )
        write_snapshot(part.localCheckpoint(eager=True), registry_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def its_from_registry(
    spark: SparkSession, registry_path: str, *, break_day: int | None = None
) -> DataFrame:
    """ITS readout from a ``streaming_its_registry`` state: the ONE
    shared segmented-OLS math (``operators/temporal.its_from_daily``)
    over the folded daily totals — value-identical to the batch
    operator over every row ever folded, with ``break_day`` chosen at
    readout time."""
    from patternly_spark.operators.temporal import its_from_daily
    from patternly_spark.streaming.exactly_once import read_registry

    daily = read_registry(spark, registry_path).select("d", "y")
    return its_from_daily(daily, break_day=break_day)
