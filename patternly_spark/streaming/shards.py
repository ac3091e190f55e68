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

    Read-merge-overwrite of the manifest is sequential across
    microbatches; the merged manifest is localCheckpoint-pinned before
    overwriting the files it was read from (task-retry safety).  Data
    files only ever APPEND — a retry of the data write can duplicate a
    batch's files, which ``verify_shards`` will catch as a checksum
    mismatch (that is the point of the manifest)."""
    from patternly_spark.operators.merge import dataset_fingerprint

    manifest_path = os.path.join(path, _MANIFEST_DIR)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sharded = batch_df.withColumn("shard", hash_shard(id_col, n_shards))
        sharded = sharded.localCheckpoint(eager=True)
        sharded.write.partitionBy("shard").mode("append").parquet(path)

        fresh = dataset_fingerprint(
            sharded, by="shard", id_col=id_col, text_col=text_col
        )
        merged = fresh
        try:
            existing = spark.read.parquet(manifest_path)
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
        except Exception:
            pass
        merged.localCheckpoint(eager=True).coalesce(1).write.mode(
            "overwrite"
        ).parquet(manifest_path)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
