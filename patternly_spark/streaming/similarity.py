"""Incremental exact cosine all-pairs — the streaming-registry twin of
``operators/similarity_allpairs.cosine_allpairs_join`` (q173), the way
``streaming/dedup.incremental_set_similarity_join`` twins the set PPJoin
(q162): every qualifying pair is emitted exactly once, in the batch that
completes it, and the union over batches equals the batch join over the
concatenated corpus — value-exact, because the int8 quantization and
grid cells are PER-VECTOR (no corpus statistics), so nothing about a
vector's representation drifts as the registry grows.

Registry: one parquet row per seen vector — (id, codes, n2,
c0..c{d-1}) — written once and never rewritten (append-only).  At
100 TB, bucket it by the cell columns (``sources.bucketed``) so a
batch's neighbor-cell probes prune to matching buckets instead of
scanning history.

Every batch must use the SAME (threshold, block_dims) the registry was
built with — the stored cells are geometry at that radius; the wrapper
pins them.  Doc ids must be globally unique across batches (the
standard incremental-registry contract here).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from patternly_spark.operators.similarity_allpairs import (
    _cells_base,
    _gemm_verify,
    _replicate_probes,
    _with_split,
)

__all__ = [
    "empty_cosine_registry",
    "incremental_cosine_allpairs",
    "streaming_cosine_allpairs",
    "streaming_covariance_registry",
    "covariance_from_registry",
]


def empty_cosine_registry(spark, *, block_dims: int = 2) -> DataFrame:
    """Zero-row (id, codes, n2, c0..c{d-1}) seed registry."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    return spark.createDataFrame(
        [],
        StructType(
            [
                StructField("id", LongType()),
                StructField("codes", ArrayType(IntegerType())),
                StructField("n2", LongType()),
            ]
            + [StructField(f"c{j}", LongType()) for j in range(int(block_dims))]
        ),
    )


def incremental_cosine_allpairs(
    new_vecs: DataFrame,
    registry: DataFrame,
    *,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_dims: int = 2,
    home_splits: int = 8,
    round_digits: int | None = 6,
):
    """Exact cosine pairs of a batch against itself AND the registry.

    Two GEMM passes share one quantize: (1) batch x batch — the batch
    join's ordered probe/home flow; (2) batch-probes x registry-homes —
    ids are disjoint by contract, so every cross pair appears in exactly
    one group (the registry vector's home cell) and the output is
    normalized to id_a < id_b.  The registry side is semi-join-pruned to
    the cells the batch actually probes before anything is grouped, so
    per-batch cost scales with the batch's neighborhood, not with
    history.

    Returns ``(pairs, new_registry_rows)`` — append the rows for the
    next batch.
    """
    t = float(threshold)
    if not (-1.0 <= t <= 1.0):
        raise ValueError(f"threshold must be in [-1, 1], got {t}")
    d = int(block_dims)
    r = math.sqrt(max(2.0 * (1.0 - t), 1e-12))
    splits = max(int(home_splits), 1)
    cells = [f"c{j}" for j in range(d)]

    base = _cells_base(new_vecs, r=r, id_col=id_col, vec_col=vec_col, block_dims=d)
    probe = _replicate_probes(base, d, splits)

    # batch x batch (ordered: each unordered pair once)
    bb_home = _with_split(base, splits, 1)
    bb = _gemm_verify(
        bb_home.unionByName(probe.select(*bb_home.columns)),
        block_dims=d,
        threshold=t,
        ordered=True,
    )

    # batch x registry: registry homes pruned to probed cells
    probed_cells = probe.select(*cells).distinct()
    reg_home = _with_split(
        registry.join(probed_cells, cells, "left_semi"), splits, 1
    )
    br = _gemm_verify(
        reg_home.unionByName(probe.select(*reg_home.columns)),
        block_dims=d,
        threshold=t,
        ordered=False,
    )

    pairs = bb.unionByName(br)
    if round_digits is not None:
        pairs = pairs.withColumn("qcosine", F.round("qcosine", round_digits))
    return pairs, base


def streaming_cosine_allpairs(
    stream_vecs: DataFrame,
    registry_path: str,
    output_path: str,
    *,
    checkpoint_path: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_dims: int = 2,
    home_splits: int = 8,
    trigger_once: bool = False,
):
    """foreachBatch wrapper: each microbatch runs
    ``incremental_cosine_allpairs`` against the parquet registry at
    ``registry_path``, appends qualifying pairs to ``output_path`` and
    the batch's vector rows to the registry.  Microbatches are
    sequential, so read-then-append is race-free by construction."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            registry = spark.read.parquet(registry_path)
        except Exception:
            registry = empty_cosine_registry(spark, block_dims=block_dims)
        pairs, new_rows = incremental_cosine_allpairs(
            batch_df,
            registry,
            threshold=threshold,
            id_col=id_col,
            vec_col=vec_col,
            block_dims=block_dims,
            home_splits=home_splits,
        )
        pairs.write.mode("append").parquet(output_path)
        new_rows.write.mode("append").parquet(registry_path)

    writer = stream_vecs.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_covariance_registry(
    stream_vecs: DataFrame,
    registry_path: str,
    *,
    checkpoint_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trigger_once: bool = False,
):
    """Incremental embedding-covariance registry — the streaming twin of
    ``operators/quantized.embedding_covariance`` (q181): the statistic's
    sufficient stats (gram, sum_i, sum_j, n per upper-triangle cell) are
    ADDITIVE integers, so folding each microbatch's partial table into
    the parquet registry gives exactly the batch covariance of all
    history (the q161/q148 additive-registry law; parity pinned in
    tests).  State is d(d+1)/2 rows forever — ~2k at d=64 — regardless
    of stream volume.

    Finalize with ``covariance_from_registry`` (recomputes the cov
    column from the folded integers) and ``whitening_matrix`` for the
    current transform — a representation-drift monitor reads successive
    registry snapshots.
    """
    from patternly_spark.operators.quantized import embedding_covariance

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = embedding_covariance(batch_df, id_col=id_col, vec_col=vec_col).select(
            "i", "j", "gram", "sum_i", "sum_j", "n"
        )
        try:
            existing = spark.read.parquet(registry_path)
            part = (
                part.unionByName(existing)
                .groupBy("i", "j")
                .agg(
                    F.sum("gram").alias("gram"),
                    F.sum("sum_i").alias("sum_i"),
                    F.sum("sum_j").alias("sum_j"),
                    F.sum("n").alias("n"),
                )
            )
        except Exception:
            pass
        part.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            registry_path
        )

    writer = stream_vecs.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def covariance_from_registry(registry: DataFrame) -> DataFrame:
    """(i, j, n, gram, sum_i, sum_j, cov) from folded sufficient stats —
    the same projection ``embedding_covariance`` ends with, so a folded
    registry and a batch run over the union produce identical rows."""
    return registry.select(
        "i",
        "j",
        "n",
        "gram",
        "sum_i",
        "sum_j",
        (
            (F.col("n") * F.col("gram") - F.col("sum_i") * F.col("sum_j")).cast(
                "double"
            )
            / (F.col("n") * F.col("n")).cast("double")
        ).alias("cov"),
    )
