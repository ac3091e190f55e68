"""Streaming shard ingest — the continuous twin of the training-shard
sink (``sources/shards.py``).

A batch build ranks the whole corpus to balance shards by token count;
a stream cannot rank what hasn't arrived, so the streaming layout is
HASH sharding (md5 of the id, mod n_shards): deterministic, stateless,
and uniform over ids — the standard trade: ±a few percent balance for
an assignment that never needs global state.

The manifest is where streaming gets interesting: every fingerprint
component is ADDITIVE (row counts, byte counts, and the checksum — an
integer SUM of per-row md5 prefixes — all commute), so the per-shard
manifest registry folds exactly, and after any prefix of batches it
equals ``dataset_fingerprint`` of every row appended so far (parity law
pinned in tests).  ``sources/shards.verify_shards`` then audits the
accumulated files against the accumulated registry — the same
integrity handshake, continuously maintained.

Contract: doc ids must not repeat across batches (the same append-only
contract every additive registry in this package has)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_ingest_shards", "hash_shard"]

_MANIFEST_DIR = "_manifest"


def hash_shard(id_col, n_shards: int):
    """Deterministic portable shard id: 60-bit md5 prefix of the id,
    mod n_shards (matches ``('0x'||substr(md5(id),1,15))::BIGINT % n``
    in an external SQL engine)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")
        % F.lit(int(n_shards))
    ).cast("int")


def streaming_ingest_shards(
    stream_df: DataFrame,
    path: str,
    *,
    checkpoint_path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_once: bool = False,
):
    """foreachBatch wrapper: hash-shard each microbatch, append it under
    ``path`` (partition column ``shard``), and fold its per-shard
    fingerprint into the manifest registry at ``path/_manifest``
    (shard, n_rows, n_bytes, checksum).

    Exactly-once under foreachBatch retries (streaming/exactly_once):
    data files land under (shard, _batch_id) with dynamic partition
    overwrite — a retry REPLACES its own files — and the manifest folds
    through versioned snapshots, so a crash-and-replay never
    double-counts.  ``verify_shards`` remains the independent integrity
    handshake."""
    from patternly_spark.operators.merge import dataset_fingerprint

    manifest_path = os.path.join(path, _MANIFEST_DIR)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        from patternly_spark.streaming.exactly_once import (
            BATCH_COL,
            read_latest_snapshot,
            write_snapshot,
        )

        sharded = batch_df.withColumn("shard", hash_shard(id_col, n_shards))
        sharded = sharded.localCheckpoint(eager=True)
        # second-level _batch_id partition: a foreachBatch retry
        # OVERWRITES its own files instead of appending duplicates
        (
            sharded.withColumn(BATCH_COL, F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("shard", BATCH_COL)
            .parquet(path)
        )

        fresh = dataset_fingerprint(
            sharded, by="shard", id_col=id_col, text_col=text_col
        )
        existing, _ = read_latest_snapshot(spark, manifest_path, before_batch=batch_id)
        merged = fresh
        if existing is not None:
            merged = (
                fresh.unionByName(existing)
                .groupBy("shard")
                .agg(
                    F.sum("n_rows").cast("long").alias("n_rows"),
                    F.sum("n_bytes").cast("long").alias("n_bytes"),
                    F.sum(F.col("checksum").cast("decimal(38,0)"))
                    .cast("decimal(38,0)")
                    .cast("string")
                    .alias("checksum"),
                )
            )
        write_snapshot(
            merged.localCheckpoint(eager=True).coalesce(1), manifest_path, batch_id
        )

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
