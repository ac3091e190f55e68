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

from patternly_spark.plans import empty_rows
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
    "empty_tfidf_registry",
    "incremental_tfidf_allpairs",
    "streaming_tfidf_allpairs",
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

    return empty_rows(
        spark,
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
    the batch's vector rows to the registry.  Exactly-once under
    foreachBatch retries (``exactly_once.write_batch_partition``): each
    batch's rows land in their own ``_batch_id`` partition, a retry
    OVERWRITES its partition instead of appending beside the orphan,
    and the registry read excludes partitions >= the current batch so
    an orphaned earlier attempt is never treated as history."""
    from patternly_spark.streaming.exactly_once import (
        read_appended,
        write_batch_partition,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        registry = read_appended(spark, registry_path, before_batch=batch_id)
        if registry is None:
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
        write_batch_partition(pairs, output_path, batch_id)
        write_batch_partition(new_rows, registry_path, batch_id)

    writer = stream_vecs.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def empty_tfidf_registry(spark) -> DataFrame:
    """Zero-row (id, term, w, n2, is_prefix) seed registry for
    ``incremental_tfidf_allpairs``."""
    return empty_rows(
        spark, "id long, term string, w long, n2 long, is_prefix boolean"
    )


def incremental_tfidf_allpairs(
    new_docs: DataFrame,
    registry: DataFrame,
    idf_stats: DataFrame,
    *,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    idf_quantize_bits: int = 16,
    round_digits: int | None = 6,
):
    """Incremental exact TF-IDF cosine all-pairs — the sparse-weighted
    member's registry twin (batch operator:
    ``operators/similarity_allpairs.tfidf_cosine_allpairs`` / q176),
    completing the all-pairs family: q162 sets have ST20, q173 dense
    vectors ST21, this gives weighted sparse vectors the same
    exactly-once contract.

    IDF POLICY — FROZEN SNAPSHOT (the design decision that makes the
    operator coherent): TF-IDF weights depend on corpus statistics
    (df, N), which drift as documents arrive; recomputing them per
    batch would silently change the cosine of already-emitted pairs and
    break union parity.  So the registry is pinned to a
    ``build_idf_snapshot`` relation chosen at creation (the reference
    corpus); every batch weights its terms with the FROZEN (df, N) —
    terms unseen in the snapshot weight at df=0 (maximal IDF) for every
    document alike.  The law: the union of emitted pairs over batches
    equals ``tfidf_cosine_allpairs(concat, idf_stats=snapshot)``
    exactly (value-exact; pinned by test).  To refresh IDF, build a new
    snapshot and REBUILD the registry (a versioned-registry swap) —
    mixing weights from two snapshots in one registry is never valid.
    Same precedent as ST20's fixed xxhash64 prefix order: frozen
    statistics are the correct incremental trade.

    Each batch joins itself (each unordered pair once) and the pruned
    registry: candidate generation is the same symmetric prefix filter
    as the batch operator (prefix flags are per-document deterministic
    under the frozen df, so they are computed once and STORED).  The
    registry side is term-equi-joined on the batch's prefix terms and
    semi-join-pruned to candidate ids before any norm/dot work — cost
    scales with the batch's neighborhood, not history.  At 100 TB,
    bucket the registry by term (``sources.bucketed``) so the probe
    prunes to matching buckets.

    Same (threshold, idf_quantize_bits, snapshot) for every batch; doc
    ids globally unique across batches (the standard registry
    contract).

    Returns ``(pairs, new_registry_rows)`` — append the rows for the
    next batch.
    """
    from patternly_spark.operators.similarity_allpairs import (
        _tfidf_prefix,
        _tfidf_weighted,
    )

    t = float(threshold)
    if not (0.0 < t <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {t}")
    scale = float(2 ** int(idf_quantize_bits))

    weighted_b = _tfidf_weighted(
        new_docs, id_col=id_col, text_col=text_col, scale=scale, idf_stats=idf_stats
    ).localCheckpoint(eager=True)
    norms_b = weighted_b.groupBy("id").agg(
        F.sum(F.col("w") * F.col("w")).alias("n2")
    )
    prefix_b = _tfidf_prefix(weighted_b, t).localCheckpoint(eager=True)

    new_rows = (
        weighted_b.join(norms_b, "id")
        .join(
            prefix_b.withColumn("is_prefix", F.lit(True)), ["id", "term"], "left"
        )
        .select(
            "id",
            "term",
            "w",
            "n2",
            F.coalesce(F.col("is_prefix"), F.lit(False)).alias("is_prefix"),
        )
    )

    # batch x batch: the batch operator's own candidate/dot/cosine flow
    cand_bb = (
        prefix_b.select(F.col("id").alias("doc_a"), "term")
        .join(prefix_b.select(F.col("id").alias("doc_b"), "term"), "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    dots_bb = (
        cand_bb.join(
            weighted_b.select(
                F.col("id").alias("doc_a"), "term", F.col("w").alias("wa")
            ),
            "doc_a",
        )
        .join(
            weighted_b.select(
                F.col("id").alias("doc_b"), "term", F.col("w").alias("wb")
            ),
            ["doc_b", "term"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    bb = (
        dots_bb.join(
            norms_b.select(F.col("id").alias("doc_a"), F.col("n2").alias("na2")),
            "doc_a",
        )
        .join(
            norms_b.select(F.col("id").alias("doc_b"), F.col("n2").alias("nb2")),
            "doc_b",
        )
        .select("doc_a", "doc_b", "dot", "na2", "nb2")
    )

    # batch x registry: registry prefixes probed by batch prefix terms,
    # then postings pruned to candidate ids (ids disjoint by contract)
    reg_pref = registry.filter(F.col("is_prefix")).select(
        F.col("id").alias("doc_r"), "term"
    )
    cand_br = (
        prefix_b.select(F.col("id").alias("doc_n"), "term")
        .join(reg_pref, "term")
        .select("doc_n", "doc_r")
        .distinct()
        .localCheckpoint(eager=True)
    )
    reg_post = registry.join(
        cand_br.select(F.col("doc_r").alias("id")).distinct(), "id", "left_semi"
    ).select("id", "term", "w", "n2")
    dots_br = (
        cand_br.join(
            weighted_b.select(
                F.col("id").alias("doc_n"), "term", F.col("w").alias("wa")
            ),
            "doc_n",
        )
        .join(
            reg_post.select(
                F.col("id").alias("doc_r"), "term", F.col("w").alias("wb")
            ),
            ["doc_r", "term"],
        )
        .groupBy("doc_n", "doc_r")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    br = (
        dots_br.join(
            norms_b.select(F.col("id").alias("doc_n"), F.col("n2").alias("nn2")),
            "doc_n",
        )
        .join(
            reg_post.select("id", "n2").distinct().select(
                F.col("id").alias("doc_r"), F.col("n2").alias("nr2")
            ),
            "doc_r",
        )
        .select(
            F.least("doc_n", "doc_r").alias("doc_a"),
            F.greatest("doc_n", "doc_r").alias("doc_b"),
            "dot",
            # cosine denominator multiplies the two sqrts — IEEE
            # multiplication commutes, so least/greatest order cannot
            # change the value vs the batch operator
            F.col("nn2").alias("na2"),
            F.col("nr2").alias("nb2"),
        )
    )

    pairs = (
        bb.unionByName(br)
        .withColumn(
            "__cos",
            F.col("dot").cast("double")
            / (
                F.sqrt(F.col("na2").cast("double"))
                * F.sqrt(F.col("nb2").cast("double"))
            ),
        )
        .filter(F.col("__cos") >= F.lit(t))
        .select(
            "doc_a",
            "doc_b",
            (
                F.round(F.col("__cos"), round_digits)
                if round_digits is not None
                else F.col("__cos")
            ).alias("cosine"),
        )
    )
    return pairs, new_rows


def streaming_tfidf_allpairs(
    stream_docs: DataFrame,
    registry_path: str,
    output_path: str,
    *,
    checkpoint_path: str,
    idf_path: str,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    idf_quantize_bits: int = 16,
    trigger_once: bool = False,
    retention_batches: int | None = None,
    retire_expired: bool = False,
):
    """foreachBatch wrapper: each microbatch runs
    ``incremental_tfidf_allpairs`` against the parquet registry at
    ``registry_path`` under the FROZEN IDF snapshot at ``idf_path``
    (build it with ``build_idf_snapshot(...).write.parquet(idf_path)``
    BEFORE starting — a missing snapshot is an error, never an implicit
    refresh), appends qualifying pairs to ``output_path`` and the
    batch's postings to the registry.  Exactly-once under foreachBatch
    retries via per-``_batch_id`` partition writes (see
    ``streaming_cosine_allpairs``).

    RETENTION HORIZON (ST24b — the bounded sibling): with
    ``retention_batches=K``, batch N probes only the postings of
    batches ``[N-K, N)`` — a partition-pruned read, so per-trigger cost
    is bounded by the horizon's posting mass instead of growing
    linearly with ALL history (the measured ST24 wall: 9 -> 50 s/trigger
    as accumulated postings reached 13 MB).  The contract is exact but
    deliberately NARROWER: the union of emitted pairs equals the batch
    operator over all history RESTRICTED to pairs whose batch distance
    is <= K (same-batch pairs always emit) — the trailing-window dedup
    semantic production pipelines actually run, stated instead of
    approximated.  ``retire_expired=True`` additionally DELETES
    partitions older than the horizon after each batch (physical
    storage bound; a retry of batch N reads batches >= N-K, which
    retirement never touches).  ``retention_batches=None`` keeps the
    full-history exact contract (ST24)."""
    from patternly_spark.streaming.exactly_once import (
        read_appended,
        retire_batch_partitions,
        write_batch_partition,
    )

    if retention_batches is not None and int(retention_batches) < 1:
        raise ValueError(
            f"retention_batches must be >= 1, got {retention_batches}"
        )
    if retire_expired and retention_batches is None:
        raise ValueError("retire_expired requires retention_batches")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        idf_stats = spark.read.parquet(idf_path)
        min_b = (
            int(batch_id) - int(retention_batches)
            if retention_batches is not None
            else None
        )
        registry = read_appended(
            spark, registry_path, before_batch=batch_id, min_batch=min_b
        )
        if registry is None:
            registry = empty_tfidf_registry(spark)
        pairs, new_rows = incremental_tfidf_allpairs(
            batch_df,
            registry,
            idf_stats,
            threshold=threshold,
            id_col=id_col,
            text_col=text_col,
            idf_quantize_bits=idf_quantize_bits,
        )
        write_batch_partition(pairs, output_path, batch_id)
        write_batch_partition(new_rows, registry_path, batch_id)
        if retire_expired and min_b is not None and min_b > 0:
            retire_batch_partitions(spark, registry_path, below_batch=min_b)

    writer = stream_docs.writeStream.foreachBatch(_process).option(
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
    from patternly_spark.streaming.exactly_once import (
        read_latest_snapshot,
        write_snapshot,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = embedding_covariance(batch_df, id_col=id_col, vec_col=vec_col).select(
            "i", "j", "gram", "sum_i", "sum_j", "n"
        )
        existing, _ = read_latest_snapshot(spark, registry_path, before_batch=batch_id)
        if existing is not None:
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
        write_snapshot(part.localCheckpoint(eager=True), registry_path, batch_id)

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
