"""Streaming deduplication: first-seen exact dedup over an unbounded stream.

Batch dedup sees the whole corpus at once; a stream cannot, so STATE is
the design problem — remembering every content hash forever is a leak at
100 TB/day.  ``dropDuplicatesWithinWatermark`` keys state by the
normalized content hash and evicts an entry once the event-time
watermark passes it, so state is bounded by the duplicate horizon (how
far apart duplicates can arrive), not by stream length.

Uses the same ``fingerprint`` normalization as
``operators.dedup.exact_dedup`` so batch and stream agree on what counts
as a duplicate (equivalence pinned in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from patternly_spark.functions.text import fingerprint
from patternly_spark.plans import empty_rows


from patternly_spark.streaming.exactly_once import (
    read_appended,
    read_latest_snapshot,
    write_batch_partition,
    write_snapshot,
)


def streaming_exact_dedup(
    docs: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first-arriving row per normalized content hash.

    ``watermark`` is the dedup horizon: two identical documents arriving
    further apart than this (in event time) are BOTH kept — the price of
    bounded state.  Size it to the real-world dup lag (re-crawls,
    retries), not to the corpus lifetime; cross-horizon dups are caught
    by the batch ``exact_dedup`` compaction pass downstream.
    """
    hashed = docs.withColumn("content_hash", fingerprint(text_col, 32))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def empty_band_registry(spark) -> DataFrame:
    """Zero-row (band_id, band_hash, canonical_id) frame — the seed
    registry for ``incremental_neardup_dedup`` before any batch ran."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    return empty_rows(
        spark,
        StructType(
            [
                StructField("band_id", LongType()),
                StructField("band_hash", StringType()),
                StructField("canonical_id", LongType()),
            ]
        ),
    )


def empty_semantic_registry(spark, *, vec_col: str = "embedding") -> DataFrame:
    """Zero-row (sig, canonical_id, <vec_col>) frame — the seed registry
    for ``incremental_semantic_dedup`` before any batch ran."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    return empty_rows(
        spark,
        StructType(
            [
                StructField("sig", LongType()),
                StructField("canonical_id", LongType()),
                StructField(vec_col, ArrayType(DoubleType())),
            ]
        ),
    )


def incremental_neardup_dedup(
    new_docs: DataFrame,
    registry: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
):
    """Near-dup dedup of an ingestion batch against an accumulated LSH
    band registry AND against itself — the foreachBatch/daily-compaction
    shape of streaming MinHash dedup.

    ``registry``: (band_id, band_hash, canonical_id) — every band key
    ever seen, mapped to the surviving (canonical) document that owns it.
    At scale, materialize it bucketed by (band_id, band_hash) (see
    ``sources.bucketed``) so the 100 TB side never re-shuffles; only the
    batch's band keys move.

    Returns ``(result, new_registry_rows)``:

    - ``result``: (id_col, canonical_id, is_dup, is_new_canonical) over
      the batch — candidate-level semantics (band collision == dup),
      matching ``lsh_candidate_pairs`` + ``dedup_clusters`` on a batch.
    - ``new_registry_rows``: the batch's band keys mapped to their final
      canonical ids — append these to the registry for the next batch.

    Batch-internal transitivity is handled by connected components over
    the batch's own collisions, seeded with registry matches; a component
    inherits the smallest matched canonical, else its own min doc id.
    Known divergence from a full batch re-run: a later doc that collides
    with TWO already-registered canonicals does not merge their clusters
    (it joins the smaller-id one) — online dedup can't rewrite history;
    a periodic batch ``neardup_dedup_corpus`` compaction heals this.
    """
    from patternly_spark.operators.dedup import lsh_band_keys, minhash_signatures
    from patternly_spark.operators.graph import connected_components

    sigs = minhash_signatures(
        new_docs,
        id_col=id_col,
        text_col=text_col,
        shingle_size=shingle_size,
        num_hashes=num_hashes,
    )
    bk = lsh_band_keys(sigs, id_col=id_col, num_hashes=num_hashes, bands=bands)

    # external matches: batch doc -> smallest already-registered canonical
    ext = (
        bk.join(registry, ["band_id", "band_hash"])
        .groupBy(id_col)
        .agg(F.min("canonical_id").alias("__ext"))
    )

    # batch-internal collision edges via per-bucket min doc (star edges
    # carry the same connectivity as all pairs, linear not quadratic)
    bucket_min = bk.groupBy("band_id", "band_hash").agg(F.min(id_col).alias("__root"))
    edges = (
        bk.join(bucket_min, ["band_id", "band_hash"])
        .filter(F.col(id_col) != F.col("__root"))
        .select(F.col(id_col).alias("src"), F.col("__root").alias("dst"))
        .distinct()
    )
    comp = connected_components(edges, "src", "dst").select(
        F.col("node").alias(id_col), F.col("component")
    )

    ids = new_docs.select(F.col(id_col).cast("long").alias(id_col))
    labeled = (
        ids.join(comp, id_col, "left")
        .withColumn("component", F.coalesce("component", F.col(id_col)))
        .join(ext, id_col, "left")
    )
    # component canonical: smallest external canonical seen by ANY member,
    # else the component's own min doc id (= the component label)
    comp_canon = labeled.groupBy("component").agg(
        F.min("__ext").alias("__comp_ext")
    )
    result = (
        labeled.join(comp_canon, "component")
        .withColumn(
            "canonical_id", F.coalesce("__comp_ext", F.col("component"))
        )
        .select(
            id_col,
            "canonical_id",
            (F.col(id_col) != F.col("canonical_id")).alias("is_dup"),
            (
                F.col("__comp_ext").isNull() & (F.col(id_col) == F.col("component"))
            ).alias("is_new_canonical"),
        )
    )
    new_registry_rows = (
        bk.join(result.select(id_col, "canonical_id"), id_col)
        .groupBy("band_id", "band_hash")
        .agg(F.min("canonical_id").alias("canonical_id"))
    )
    return result, new_registry_rows


def streaming_neardup_dedup(
    stream_docs: DataFrame,
    registry_path: str,
    output_path: str,
    *,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    trigger_once: bool = False,
):
    """foreachBatch wrapper: each microbatch runs
    ``incremental_neardup_dedup`` against the parquet registry at
    ``registry_path``, appends the flagged batch to ``output_path`` and
    the new band keys to the registry.  Exactly-once under foreachBatch retries via streaming/exactly_once (per-_batch_id partition writes / versioned snapshots).
    """

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        registry = read_appended(spark, registry_path, before_batch=batch_id)
        if registry is None:
            registry = empty_band_registry(spark)
        result, new_rows = incremental_neardup_dedup(
            batch_df,
            registry,
            id_col=id_col,
            text_col=text_col,
            shingle_size=shingle_size,
            num_hashes=num_hashes,
            bands=bands,
        )
        write_batch_partition(result, output_path, batch_id)
        write_batch_partition(new_rows, registry_path, batch_id)

    writer = stream_docs.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_semantic_dedup(
    new_vecs: DataFrame,
    registry: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    num_planes: int = 4,
    seed: int = 42,
):
    """Semantic (embedding-cosine) dedup of an ingestion batch against an
    accumulated registry of kept representatives AND against itself —
    the third member of the incremental family (exact hashes:
    ``incremental_exact_dedup``; MinHash bands:
    ``incremental_neardup_dedup``; this one: SemDeDup cells).

    ``registry``: (sig long, canonical_id, embedding) — one row per KEPT
    representative, keyed by its hyperplane cell.  The batch assigns
    cells with the SAME seeded planes, resolves within-batch duplicate
    groups (`semantic_dedup` on the batch), then each surviving batch
    canonical checks its cell's registry representatives by cosine; a
    hit re-canonicalizes the whole batch group onto the registry owner.
    At scale, materialize the registry bucketed by ``sig``
    (``sources.bucketed``) so only the batch's cells shuffle.

    Returns ``(result, new_registry_rows)``:

    - ``result``: (id, canonical_id, is_dup, is_new_canonical) — TOTAL
      over the batch.
    - ``new_registry_rows``: (sig, canonical_id, embedding) for batch
      canonicals that matched nothing — append to the registry.
    """
    import numpy as np

    from patternly_spark.functions.vectors import dot, hyperplane_signature, norm
    from patternly_spark.operators.dedup import semantic_dedup

    if num_planes is None:
        # auto-sizing would re-derive the cell grid per batch, making
        # registry signatures incomparable across batches
        raise ValueError(
            "incremental_semantic_dedup needs an explicit num_planes: "
            "registry signatures must use the same cell grid every batch"
        )
    if new_vecs.isEmpty():
        # an empty microbatch has no first row to infer the vector dim
        # from; short-circuit with empty, correctly-typed results so the
        # foreachBatch wrapper survives idle triggers
        from pyspark.sql.types import BooleanType, LongType, StructField, StructType

        spark = new_vecs.sparkSession
        id_type = new_vecs.schema[id_col].dataType
        result = empty_rows(
            spark,
            StructType(
                [
                    StructField(id_col, id_type),
                    StructField("canonical_id", id_type),
                    StructField("is_dup", BooleanType()),
                    StructField("is_new_canonical", BooleanType()),
                ]
            ),
        )
        return result, empty_semantic_registry(spark, vec_col=vec_col)

    dim = len(new_vecs.select(vec_col).first()[0])
    planes = np.random.default_rng(seed).normal(size=(num_planes, dim))

    batch = semantic_dedup(
        new_vecs, id_col=id_col, vec_col=vec_col, threshold=threshold,
        num_planes=num_planes, seed=seed,
    ).withColumnRenamed("cluster_id", "__batch_canonical")

    reps = batch.filter(F.col("is_canonical")).join(
        new_vecs.select(F.col(id_col), F.col(vec_col)), id_col
    ).select(
        F.col(id_col).alias("__bc"),
        F.col(vec_col).alias("__bvec"),
        hyperplane_signature(F.col(vec_col), planes).alias("sig"),
        norm(F.col(vec_col)).alias("__bn"),
    )
    reg = registry.select(
        "sig",
        F.col("canonical_id").alias("__existing"),
        F.col(vec_col).alias("__rvec"),
        norm(F.col(vec_col)).alias("__rn"),
    )
    cos = dot(F.col("__bvec"), F.col("__rvec")) / (F.col("__bn") * F.col("__rn"))
    hits = (
        reps.join(reg, "sig")
        .filter(cos >= threshold)
        .groupBy("__bc")
        .agg(F.min("__existing").alias("__owner"))
    )
    resolved = reps.join(hits, "__bc", "left").select(
        "__bc", "sig", "__bvec", F.col("__owner")
    )
    mapped = batch.join(
        resolved.withColumnRenamed("__bc", "__batch_canonical"),
        "__batch_canonical",
        "left",
    )
    canonical = F.coalesce(F.col("__owner"), F.col("__batch_canonical"))
    result = mapped.select(
        id_col,
        canonical.alias("canonical_id"),
        (F.col(id_col) != canonical).alias("is_dup"),
        (
            F.col("__owner").isNull() & (F.col(id_col) == F.col("__batch_canonical"))
        ).alias("is_new_canonical"),
    )
    new_rows = resolved.filter(F.col("__owner").isNull()).select(
        "sig", F.col("__bc").alias("canonical_id"), F.col("__bvec").alias(vec_col)
    )
    return result, new_rows


def streaming_semantic_dedup(
    stream_vecs: DataFrame,
    registry_path: str,
    output_path: str,
    *,
    checkpoint_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    num_planes: int = 4,
    seed: int = 42,
    trigger_once: bool = False,
):
    """foreachBatch wrapper for ``incremental_semantic_dedup``: each
    microbatch resolves against the parquet representative registry at
    ``registry_path``, appends the flagged batch to ``output_path`` and
    the new representatives to the registry.  Sequential microbatches
    make read-then-append race-free (the neardup-registry precedent)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        registry = read_appended(spark, registry_path, before_batch=batch_id)
        if registry is None:
            registry = empty_semantic_registry(spark, vec_col=vec_col)
        result, new_rows = incremental_semantic_dedup(
            batch_df,
            registry,
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
            num_planes=num_planes,
            seed=seed,
        )
        write_batch_partition(result, output_path, batch_id)
        write_batch_partition(new_rows, registry_path, batch_id)

    writer = stream_vecs.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_boilerplate_registry(
    stream_df: DataFrame,
    registry_path: str,
    *,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str | None = "\n",
    block_tokens: int | None = None,
    trigger_once: bool = False,
):
    """Incremental corpus-frequency registry for boilerplate detection:
    fold each microbatch's span document-frequency table
    (operators/dedup.span_doc_freq) into the parquet registry at
    ``registry_path`` (h, doc_freq).

    Document frequency is ADDITIVE across batches with disjoint doc
    sets, so the parity law is exact: after any prefix of batches the
    registry equals ``span_doc_freq`` of the union of those batches'
    rows (pinned in tests).  A document split across two microbatches
    would double-count — feed whole documents per batch (the same
    contract the exact-dedup registry has for doc ids).

    Clean any frame against the current registry with
    ``operators/dedup.apply_boilerplate_registry`` — boilerplate
    learned over the whole stream filters batches that never saw each
    other.

    Scale shape: the registry holds one row per DISTINCT span ever
    seen (h, long) — it grows with distinct content like the LSH band
    registry, not with traffic; the fold is one groupBy(h) over
    registry + batch table, localCheckpoint-pinned before overwriting
    the files it was read from (task-retry safety)."""
    from patternly_spark.operators.dedup import span_doc_freq

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        freq = span_doc_freq(
            batch_df, id_col=id_col, text_col=text_col,
            delimiter=delimiter, block_tokens=block_tokens,
        )
        existing, _ = read_latest_snapshot(spark, registry_path, before_batch=batch_id)
        if existing is not None:
            freq = (
                freq.unionByName(existing)
                .groupBy("h")
                .agg(F.sum("doc_freq").cast("long").alias("doc_freq"))
            )
        write_snapshot(freq.localCheckpoint(eager=True), registry_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def empty_similarity_registry(spark):
    """Zero-row seed registries for ``incremental_set_similarity_join``:
    ``(sets, prefix)`` — per-doc shingle sets (id, sh) and the exploded
    prefix index (s, id)."""
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    sets = empty_rows(
        spark,
        StructType(
            [
                StructField("id", LongType()),
                StructField("sh", ArrayType(StringType())),
            ]
        ),
    )
    prefix = empty_rows(
        spark,
        StructType(
            [StructField("s", StringType()), StructField("id", LongType())]
        ),
    )
    return sets, prefix


def incremental_set_similarity_join(
    new_docs: DataFrame,
    registry_sets: DataFrame,
    registry_prefix: DataFrame,
    *,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
):
    """EXACT all-pairs Jaccard join of an ingestion batch against itself
    AND against every previously-seen document — the incremental
    (streaming-registry) twin of ``operators/dedup.set_similarity_join``
    (q162), the way ``incremental_neardup_dedup`` twins the LSH path but
    with NO probabilistic recall: every pair with Jaccard >= threshold
    involving a batch document is emitted, exactly once, in the batch
    that completes the pair.

    Canonical prefix order: the batch variant orders shingles by
    ``(xxhash64(s), s)`` — a FIXED, data-independent total order —
    instead of the batch operator's document-frequency-ascending order.
    The prefix-filter completeness theorem holds for ANY fixed global
    order; df-ascending is only the performance-optimal choice, and it
    cannot be used incrementally because frequencies drift as the
    registry grows (a prefix computed under yesterday's frequencies
    would not block against today's).  The hash order costs larger
    prefix buckets than df-order would (documented trade); buckets stay
    hash-uniform, never adversarially hot.

    Union-parity law (pinned in tests): the union of results over any
    batch sequence equals ``set_similarity_join`` over the concatenated
    corpus — exactness makes the result order-independent, so the
    incremental path has a value-exact batch oracle.

    Doc ids must be globally unique across batches (the same contract
    every incremental registry here has).

    Scale shape: the batch's prefix shingles equi-join the persisted
    prefix index (at 100 TB: bucket the registry by ``s`` so only batch
    keys move — ``sources.bucketed``); the verify joins shingle sets by
    id for candidate pairs only.  Registry growth is one sets row + a
    ~(1-t)·|sh| prefix slice per document — linear in corpus size.

    Returns ``(pairs, new_sets, new_prefix)``:

    - ``pairs``: (doc_a, doc_b, jaccard) with doc_a < doc_b — new
      qualifying pairs only (>= 1 endpoint in the batch).
    - ``new_sets`` / ``new_prefix``: append to the registries for the
      next batch.
    """
    from pyspark.sql import Window

    from patternly_spark.operators.dedup import with_shingles

    t = float(threshold)
    sh = with_shingles(
        new_docs.select(id_col, text_col), text_col, shingle_size, out_col="__sh"
    )
    sets_b = sh.select(
        F.col(id_col).cast("long").alias("id"), F.col("__sh").alias("sh")
    )
    tok = sets_b.select("id", F.explode_outer("sh").alias("s"))
    ranked = tok.withColumn(
        "__r",
        F.row_number().over(
            Window.partitionBy("id").orderBy(F.asc(F.xxhash64("s")), F.asc("s"))
        ),
    )
    n = sets_b.select("id", F.size("sh").alias("n"))
    prefix_b = (
        ranked.join(n, "id")
        .filter(
            F.col("__r")
            <= F.col("n")
            - F.ceil(F.lit(t) * F.col("n").cast("double")).cast("int")
            + 1
        )
        .select("s", "id")
    )

    # candidates: batch x batch plus batch x registry (both orders
    # normalized to doc_a < doc_b; registry ids can be on either side)
    bb = (
        prefix_b.select(F.col("id").alias("doc_a"), "s")
        .join(prefix_b.select(F.col("id").alias("doc_b"), "s"), "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    br = (
        prefix_b.select(F.col("id").alias("__b"), "s")
        .join(registry_prefix.select(F.col("id").alias("__r"), "s"), "s")
        .select(
            F.least("__b", "__r").alias("doc_a"),
            F.greatest("__b", "__r").alias("doc_b"),
        )
    )
    cand = bb.unionByName(br).distinct()

    all_sets = sets_b.unionByName(registry_sets)
    jac = (
        cand.join(
            all_sets.select(F.col("id").alias("doc_a"), F.col("sh").alias("sh_a")),
            "doc_a",
        )
        .join(
            all_sets.select(F.col("id").alias("doc_b"), F.col("sh").alias("sh_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= t)
    )
    return jac, sets_b, prefix_b


def streaming_set_similarity_join(
    stream_docs: DataFrame,
    registry_path: str,
    output_path: str,
    *,
    checkpoint_path: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
    trigger_once: bool = False,
):
    """foreachBatch wrapper: each microbatch runs
    ``incremental_set_similarity_join`` against the parquet registries
    under ``registry_path`` (``/sets`` and ``/prefix``), appends the
    qualifying pairs to ``output_path`` and the batch's sets/prefix rows
    to the registries.  Exactly-once under foreachBatch retries via streaming/exactly_once (per-_batch_id partition writes / versioned snapshots)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        reg_sets = read_appended(spark, f"{registry_path}/sets", before_batch=batch_id)
        reg_prefix = read_appended(
            spark, f"{registry_path}/prefix", before_batch=batch_id
        )
        if reg_sets is None or reg_prefix is None:
            reg_sets, reg_prefix = empty_similarity_registry(spark)
        pairs, new_sets, new_prefix = incremental_set_similarity_join(
            batch_df,
            reg_sets,
            reg_prefix,
            threshold=threshold,
            id_col=id_col,
            text_col=text_col,
            shingle_size=shingle_size,
        )
        write_batch_partition(pairs, output_path, batch_id)
        write_batch_partition(new_sets, f"{registry_path}/sets", batch_id)
        write_batch_partition(new_prefix, f"{registry_path}/prefix", batch_id)

    writer = stream_docs.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
