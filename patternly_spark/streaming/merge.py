"""Streaming CDC upsert — maintain a latest-wins keyed snapshot from a
change stream (the streaming twin of ``operators/merge.merge_upsert``).

Shape: foreachBatch.  Each microbatch (1) collapses ITSELF to one
winner per key (intra-batch ties/versions resolved exactly as the batch
operator does), then (2) upserts into the parquet snapshot.  Restart
safety comes from ``streaming/exactly_once``: the full-rewrite layout
uses versioned snapshots (a foreachBatch retry re-merges on the
predecessor and rewrites its own snapshot), and the key-partitioned
layout relies on upsert idempotency plus dynamic partition overwrite.

The snapshot rewrite is the honest cost of parquet (no deletion
vectors): each batch rewrites the snapshot partition-complete.  At
scale, partition the snapshot by a stable key hash
(``partition_cols=["__kp"]`` with key-hash buckets) so a batch
rewrites only the partitions its keys touch — dynamic partition
overwrite, the standard no-lakehouse upsert layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from patternly_spark.operators.merge import merge_upsert
from patternly_spark.streaming.exactly_once import (
    read_latest_snapshot,
    write_snapshot,
)

__all__ = ["streaming_upsert", "streaming_scd2_registry"]


def streaming_upsert(
    stream: DataFrame,
    snapshot_path: str,
    *,
    checkpoint_path: str,
    key_cols: str | list[str],
    version_col: str | None = None,
    num_key_partitions: int | None = None,
    trigger_once: bool = False,
):
    """Run a change stream into a latest-wins parquet snapshot.

    With ``num_key_partitions`` set, the snapshot is laid out in key-hash
    partitions (``__kp``) and each microbatch overwrites ONLY the
    partitions containing its keys (dynamic partition overwrite) instead
    of the whole snapshot.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cols = [c for c in batch_df.columns]
        batch = merge_upsert(
            batch_df.limit(0), batch_df, key_cols=keys, version_col=version_col
        )
        if num_key_partitions:
            # key-hash-partitioned layout: dynamic partition overwrite of
            # only the touched partitions.  Retry-safe WITHOUT snapshots
            # because upsert is idempotent — re-merging the same batch into
            # an already-merged partition picks the same winners (latest
            # wins; a row tied with its own earlier copy is the same row).
            try:
                spark.read.parquet(snapshot_path)
                have_snap = True
            except Exception:
                have_snap = False
            kp = F.abs(F.hash(*[F.col(k) for k in keys])) % int(num_key_partitions)
            batch_p = batch.withColumn("__kp", kp)
            if not have_snap:
                batch_p.write.partitionBy("__kp").mode("overwrite").parquet(snapshot_path)
                return
            touched = [r["__kp"] for r in batch_p.select("__kp").distinct().collect()]
            snap_p = spark.read.parquet(snapshot_path).filter(
                F.col("__kp").isin(touched)
            )
            merged = merge_upsert(
                snap_p.select(*cols), batch, key_cols=keys, version_col=version_col
            ).withColumn("__kp", kp)
            # same read-while-overwrite hazard as the full rewrite: pin the
            # merged rows before deleting the partitions they were read from
            # (a task retry after commit begins must not rescan dead files)
            merged = merged.localCheckpoint(eager=True)
            prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                merged.write.partitionBy("__kp").mode("overwrite").parquet(snapshot_path)
            finally:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
            return
        # full-rewrite layout: versioned snapshots (exactly_once) — a
        # foreachBatch retry re-merges on top of the PREDECESSOR snapshot
        # and rewrites its own, and a crash mid-write never deletes the
        # only copy (static overwrite would).
        snap, _ = read_latest_snapshot(spark, snapshot_path, before_batch=batch_id)
        merged = (
            merge_upsert(snap.select(*cols), batch, key_cols=keys, version_col=version_col)
            if snap is not None
            else batch
        )
        write_snapshot(merged.localCheckpoint(eager=True), snapshot_path, batch_id)

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_scd2_registry(
    stream_changes,
    registry_path: str,
    *,
    checkpoint_path: str,
    key_col: str = "key",
    ts_col: str = "ts",
    attr_cols: list[str],
    trigger_once: bool = False,
):
    """Streaming SCD type-2 registry — the q196 twin: fold each
    microbatch of change events into the versioned-interval table at
    ``registry_path`` so the registry always equals
    ``scd2_intervals`` over every event seen (pinned by test), under
    the per-key TIME-ORDERED arrival contract (the streaming_holt
    precedent: a batch's events for a key all follow the key's open
    version; late events need a rebuild, same as any SCD2 store).

    Per batch, only TOUCHED keys rework: their open (is_current) rows
    re-enter as synthetic change events at their own valid_from — so
    the no-op collapse sees the open version's attributes exactly as
    scd2_intervals would — and the batch's events append; closed
    history and untouched keys pass through byte-identical.
    localCheckpoint before the overwrite (read and write share the
    path).
    """
    from pyspark.sql import DataFrame

    from patternly_spark.operators.temporal import scd2_intervals

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        events = batch_df.select(
            F.col(key_col), F.col(ts_col), *[F.col(c) for c in attr_cols]
        )
        registry, _ = read_latest_snapshot(
            spark, registry_path, before_batch=batch_id
        )
        if registry is None:
            updated = scd2_intervals(
                events, key_col=key_col, ts_col=ts_col, attr_cols=attr_cols
            )
        else:
            touched_keys = events.select(key_col).distinct()
            touched = registry.join(touched_keys, key_col, "left_semi")
            untouched = registry.join(touched_keys, key_col, "left_anti")
            closed = touched.filter(~F.col("is_current"))
            # synthetic open-version rows carry __syn=0 so they sort
            # STRICTLY BEFORE a batch event at the identical ts — without
            # the tiebreak the rebuilt history is nondeterministic when a
            # change lands exactly at the open version's valid_from
            open_as_events = touched.filter(F.col("is_current")).select(
                F.col(key_col),
                F.col("valid_from").alias(ts_col),
                *[F.col(c) for c in attr_cols],
                F.lit(0).alias("__syn"),
            )
            rebuilt = scd2_intervals(
                open_as_events.unionByName(events.withColumn("__syn", F.lit(1))),
                key_col=key_col,
                ts_col=ts_col,
                attr_cols=attr_cols,
                order_tiebreak=["__syn"],
            )
            # a rebuilt version that starts where closed history ends
            # stays open-ended only if nothing follows it; closed rows
            # keep their original intervals untouched
            updated = untouched.unionByName(closed).unionByName(rebuilt)
        write_snapshot(updated.localCheckpoint(eager=True), registry_path, batch_id)

    writer = stream_changes.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
