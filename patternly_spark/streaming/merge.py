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
