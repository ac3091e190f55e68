"""Streaming multimodal dedup: an incremental perceptual-hash registry.

New media arrive in microbatches; each batch is dHashed through the
real codec path (`operators/multimodal.image_dhash`), banded-joined
against the persisted hash registry PLUS itself, and every near-dup
pair involving a new image is emitted exactly once — the union of
emissions across batches equals the batch ``image_neardup_pairs`` over
all media ever seen (union-parity pinned in tests).

State is one (id, dhash) row per decodable image.  This reference
implementation re-bands registry+batch per trigger (correct and simple);
the at-scale variant probes only the NEW side's (block, value) keys
against a bucketed registry — same algebra, partition-pruned reads (the
positional-index upsert precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_image_dedup_registry"]


def streaming_image_dedup_registry(
    stream_df: DataFrame,
    registry_path: str,
    pairs_path: str,
    *,
    checkpoint_path: str,
    id_col: str = "media_id",
    payload_col: str = "payload",
    hash_size: int = 8,
    max_hamming: int = 4,
    trigger_once: bool = False,
):
    """foreachBatch wrapper: hash the batch, emit near-dup pairs that
    involve >= 1 new image (appended to ``pairs_path``), fold the new
    hashes into ``registry_path``."""
    from patternly_spark.operators.multimodal import image_dhash
    from patternly_spark.streaming.exactly_once import (
        read_latest_snapshot,
        write_batch_partition,
        write_snapshot,
    )

    nbits = int(hash_size) * int(hash_size)
    nb = int(max_hamming) + 1
    if nb > nbits:
        raise ValueError(
            f"max_hamming + 1 = {nb} exceeds the {nbits}-bit hash "
            f"(hash_size={int(hash_size)}); raise hash_size or lower max_hamming"
        )
    width = nbits // nb

    def _blocks(hashes: DataFrame) -> DataFrame:
        return hashes.select(
            "id",
            "dhash",
            "is_new",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("bi"),
                            F.shiftright(F.col("dhash"), i * width)
                            .bitwiseAND(F.lit((1 << width) - 1))
                            .alias("bv"),
                        )
                        for i in range(nb)
                    ]
                )
            ).alias("__b"),
        ).select(
            "id", "dhash", "is_new",
            F.col("__b.bi").alias("bi"), F.col("__b.bv").alias("bv"),
        )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new = (
            image_dhash(
                batch_df, id_col=id_col, payload_col=payload_col,
                hash_size=hash_size,
            )
            .filter(F.col("ok"))
            .select(F.col(id_col).alias("id"), "dhash")
            .localCheckpoint(eager=True)
        )
        existing, _ = read_latest_snapshot(spark, registry_path, before_batch=batch_id)
        if existing is not None:
            # a re-sent id is not "new" (idempotent re-ingest)
            new = new.join(existing.select("id"), "id", "left_anti")
            allh = existing.withColumn("is_new", F.lit(False)).unionByName(
                new.withColumn("is_new", F.lit(True))
            )
        else:
            allh = new.withColumn("is_new", F.lit(True))
        allh = allh.localCheckpoint(eager=True)
        blocks = _blocks(allh)
        cand = (
            blocks.select(
                F.col("id").alias("id_a"), F.col("dhash").alias("ha"),
                F.col("is_new").alias("na"), "bi", "bv",
            )
            .join(
                blocks.select(
                    F.col("id").alias("id_b"), F.col("dhash").alias("hb"),
                    F.col("is_new").alias("nb_"), "bi", "bv",
                ),
                ["bi", "bv"],
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(F.col("na") | F.col("nb_"))
            .select("id_a", "id_b", "ha", "hb")
            .distinct()
        )
        ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        pairs = cand.select(
            "id_a", "id_b", ham.cast("int").alias("hamming")
        ).filter(F.col("hamming") <= int(max_hamming))
        write_batch_partition(pairs, pairs_path, batch_id)
        write_snapshot(allh.select("id", "dhash"), registry_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
