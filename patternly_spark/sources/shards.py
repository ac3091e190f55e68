"""Training-shard sink: weight-balanced shard layout + audit manifest.

The last mile of a curation pipeline: the cleaned corpus must land on
disk as N shards a trainer streams independently, with (a) balanced
work per shard (token counts, not row counts), (b) partition-pruned
access (read shard 7 without touching the other 999), and (c) a
manifest that proves, later and cheaply, that what the trainer read is
what the pipeline wrote.

Composition of existing operators, deliberately: ``assign_shards``
(serpentine weight balancing) x partitioned parquet write x
``dataset_fingerprint`` (order-invariant checksums).  The manifest is
computed from the SHARD-ASSIGNED frame before the write and verified
against a read-back in tests — any writer-side row loss or duplication
moves a checksum.

Scale shape: one rank for the assignment (range-partitioned sort of a
manifest-sized (id, weight) relation — see assign_shards), one join
back on id (AQE-splittable), one partitioned write.  Reading one shard
prunes on the ``shard`` partition column (pinned by the partition-
filter plan test).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_training_shards", "read_shard", "verify_shards"]

_MANIFEST_DIR = "_manifest"


def write_training_shards(
    docs: DataFrame,
    path: str,
    *,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    weight_col: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Write ``docs`` as ``n_shards`` token-balanced parquet partitions
    under ``path`` (partition column ``shard``) plus a per-shard
    manifest at ``path/_manifest``; returns the manifest (shard,
    n_rows, n_bytes, checksum, weight_tokens)."""
    from patternly_spark.operators.merge import dataset_fingerprint
    from patternly_spark.operators.packing import assign_shards

    assignment = assign_shards(
        docs, id_col=id_col, text_col=text_col,
        weight_col=weight_col, n_shards=n_shards,
    )
    sharded = docs.join(assignment.select(id_col, "weight", "shard"), id_col)
    # one write, one pass: pin the assigned frame so the manifest and the
    # data files come from the same materialization (a recompute between
    # the two would re-run the corpus scan)
    sharded = sharded.localCheckpoint(eager=True)
    sharded.write.partitionBy("shard").mode(mode).parquet(path)

    manifest = (
        dataset_fingerprint(sharded, by="shard", id_col=id_col, text_col=text_col)
        .join(
            sharded.groupBy("shard").agg(
                F.sum("weight").cast("long").alias("weight_tokens")
            ),
            "shard",
        )
        .select("shard", "n_rows", "n_bytes", "checksum", "weight_tokens")
    )
    manifest.coalesce(1).write.mode(mode).parquet(os.path.join(path, _MANIFEST_DIR))
    return manifest


def read_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """Read one shard — the filter lands in PartitionFilters, so only
    that shard's files are touched (plan-pinned in tests).  A streaming
    ingest layout adds a second-level ``_batch_id`` partition (its
    exactly-once retry unit); it is dropped here — consumers see the
    same schema either way."""
    df = spark.read.parquet(path).filter(F.col("shard") == int(shard))
    if "_batch_id" in df.columns:
        df = df.drop("_batch_id")
    return df


def verify_shards(
    spark: SparkSession,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Re-fingerprint the shard files and diff against the stored
    manifest: (shard, ok, n_rows_expected, n_rows_actual,
    checksum_expected, checksum_actual).  The cheap integrity handshake
    before a training run — one scan of the data, no joins wider than
    the shard count."""
    from patternly_spark.operators.merge import dataset_fingerprint

    from patternly_spark.streaming.exactly_once import read_registry

    data = spark.read.parquet(path)
    if "_batch_id" in data.columns:
        data = data.drop("_batch_id")
    actual = dataset_fingerprint(data, by="shard", id_col=id_col, text_col=text_col)
    expected = read_registry(spark, os.path.join(path, _MANIFEST_DIR))
    return (
        expected.select(
            "shard",
            F.col("n_rows").alias("n_rows_expected"),
            F.col("checksum").alias("checksum_expected"),
        )
        .join(
            actual.select(
                "shard",
                F.col("n_rows").alias("n_rows_actual"),
                F.col("checksum").alias("checksum_actual"),
            ),
            "shard",
            "full",
        )
        .select(
            "shard",
            (
                F.col("n_rows_expected").eqNullSafe(F.col("n_rows_actual"))
                & F.col("checksum_expected").eqNullSafe(F.col("checksum_actual"))
            ).alias("ok"),
            "n_rows_expected",
            "n_rows_actual",
            "checksum_expected",
            "checksum_actual",
        )
    )
