"""Streaming CDC upsert — maintain a latest-wins keyed snapshot from a
change stream (the streaming twin of ``operators/merge.merge_upsert``).

Shape: foreachBatch.  Each microbatch (1) collapses ITSELF to one
winner per key (intra-batch ties/versions resolved exactly as the batch
operator does), then (2) upserts into the parquet snapshot.  Microbatch
execution is sequential, so read-then-overwrite is race-free by
construction — the ``streaming/dedup.streaming_neardup_dedup`` registry
precedent.

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

__all__ = ["streaming_upsert"]


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
        try:
            snap = spark.read.parquet(snapshot_path).select(*cols)
            have_snap = True
        except Exception:
            snap = None
            have_snap = False
        if num_key_partitions:
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
        merged = (
            merge_upsert(snap, batch, key_cols=keys, version_col=version_col)
            if have_snap
            else batch
        )
        # full rewrite must not read-while-overwriting the same files
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(snapshot_path)

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
        try:
            registry = spark.read.parquet(registry_path)
        except Exception:
            registry = None
        if registry is None:
            updated = scd2_intervals(
                events, key_col=key_col, ts_col=ts_col, attr_cols=attr_cols
            )
        else:
            touched_keys = events.select(key_col).distinct()
            touched = registry.join(touched_keys, key_col, "left_semi")
            untouched = registry.join(touched_keys, key_col, "left_anti")
            closed = touched.filter(~F.col("is_current"))
            open_as_events = touched.filter(F.col("is_current")).select(
                F.col(key_col),
                F.col("valid_from").alias(ts_col),
                *[F.col(c) for c in attr_cols],
            )
            rebuilt = scd2_intervals(
                open_as_events.unionByName(events),
                key_col=key_col,
                ts_col=ts_col,
                attr_cols=attr_cols,
            )
            # a rebuilt version that starts where closed history ends
            # stays open-ended only if nothing follows it; closed rows
            # keep their original intervals untouched
            updated = untouched.unionByName(closed).unionByName(rebuilt)
        updated.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            registry_path
        )

    writer = stream_changes.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
