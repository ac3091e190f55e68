"""Sequence packing: lay documents end-to-end into fixed token budgets.

Pretraining pipelines concatenate tokenized documents and chop the
stream into fixed-length blocks ("concat-and-chunk").  This operator
assigns every document its block coordinates WITHOUT materializing the
token stream: a running token offset per document is enough to know
which block a document starts in, at what offset, and how many block
boundaries it straddles.

Scale shape: a single global ordering would be one giant sort, so the
corpus is first split into ``n_shards`` deterministic shards
(``id % n_shards``) and packed independently within each — the window
runs per shard, the one exchange is hash-partitioned on the shard key,
and shards are balanced by construction.  Real pipelines pack
per-output-file exactly like this; cross-shard block ids never collide
(``bin_id = bin_in_shard * n_shards + shard``).

Determinism: ordering is (shard, id), token counts are the portable
whitespace formula — identical output on any engine/partitioning, and
replicable in plain window SQL (the DuckDB oracle runs the same
arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from patternly_spark.functions.text import token_count, tokens


def pack_sequences(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens: Column | None = None,
    budget: int = 2048,
    n_shards: int = 16,
) -> DataFrame:
    """Concat-and-chunk block coordinates for every document.

    Returns (id_col, shard int, n_tokens int, bin_id long,
    offset_in_bin long, n_bins_spanned long): the document's tokens
    occupy ``bin_id`` starting at ``offset_in_bin`` and spill into the
    next ``n_bins_spanned - 1`` blocks of the same shard.

    ``n_tokens`` defaults to the whitespace token count of ``text_col``;
    pass a Column to pack by a precomputed tokenizer's counts instead.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    toks = token_count(text_col) if n_tokens is None else n_tokens.cast("int")
    base = docs.select(
        id_col,
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
        toks.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    bin_in_shard = F.floor(start / budget)
    # last token's offset; empty docs (n_tokens=0) span their start bin
    end = start + F.greatest(F.col("n_tokens").cast("long") - 1, F.lit(0))
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        (bin_in_shard * n_shards + F.col("shard")).cast("long").alias("bin_id"),
        F.pmod(start, F.lit(budget)).cast("long").alias("offset_in_bin"),
        (F.floor(end / budget) - bin_in_shard + 1).cast("long").alias("n_bins_spanned"),
    )


def chunk_documents(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    embedding/RAG prep step (a long doc becomes several ``chunk_tokens``
    windows sliding by ``chunk_tokens - overlap``).

    Output: (id_col, chunk_id long, n_chunk_tokens int, chunk_text
    string).  A chunk starts at every stride multiple that still
    contributes tokens beyond the previous chunk's coverage
    (``start < n - overlap``; a doc shorter than one chunk yields
    exactly one).  All per-row array expressions — zero shuffle, chunks
    are born in their document's partition; arithmetic is pure-integer
    so an external SQL oracle replays it exactly.
    """
    if overlap < 0 or overlap >= chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap
    staged = (
        docs.withColumn("__toks", tokens(text_col))
        .withColumn("__n", F.size("__toks"))
        .withColumn(
            "__c",
            F.greatest(F.lit(1), F.expr(f"(__n - {overlap} + {stride} - 1) div {stride}")),
        )
    )
    # explode_outer: InferFiltersFromGenerate would re-inline the
    # sequence (and its __c subtree) into a size() predicate; the
    # sequence is never empty (__c >= 1)
    ex = staged.select(
        id_col,
        "__toks",
        "__n",
        F.explode_outer(F.sequence(F.lit(0), F.col("__c") - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride
    return ex.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.least(F.lit(chunk_tokens), F.col("__n") - start).cast("int").alias("n_chunk_tokens"),
        F.concat_ws(" ", F.slice("__toks", start + 1, F.lit(chunk_tokens))).alias("chunk_text"),
    )


def content_defined_chunks(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    kgram: int = 4,
    boundary_mod: int = 16,
) -> DataFrame:
    """Content-defined chunking (Rabin-Karp CDC, the dedup-storage /
    incremental-sync primitive): a chunk boundary falls BEFORE every
    token position whose k-gram hash ≡ 0 (mod ``boundary_mod``), so
    boundaries are a function of CONTENT, not offsets — insert a
    paragraph at the top of a document and every chunk after the edit
    region re-aligns byte-identically (fixed-size chunking shifts every
    subsequent chunk, defeating downstream chunk-hash dedup).  Expected
    chunk length ≈ ``boundary_mod`` tokens.

    Output: (id, chunk_idx, start_tok, end_tok, n_tokens, chunk_text)
    with half-open token spans covering the document exactly.

    Scale shape: gram hashes come out of ONE posexplode (each md5
    evaluated exactly once, as rows — the array-expression form
    degenerates to O(n_grams^2) md5 via CollapseProject re-inlining,
    the same hazard winnow_fingerprints documents); only the SPARSE
    boundary positions (~n/boundary_mod ints per doc) shuffle back
    through a groupBy(id), and span construction is array arithmetic
    on materialized columns.  md5-derived, so an external SQL engine
    replays every boundary bit-for-bit (q124)."""
    from patternly_spark.functions.text import shingle_hash

    k = int(kgram)
    mod = int(boundary_mod)
    if k < 1 or mod < 1:
        raise ValueError("kgram and boundary_mod must be >= 1")

    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit(""))
    staged = docs.select(F.col(id_col), toks.alias("__toks")).filter(
        F.size("__toks") > 0
    )
    n = F.size("__toks")
    gram_idx = F.sequence(F.lit(1), F.greatest(n - k, F.lit(0)))
    grams = F.when(
        n >= k + 1,
        F.transform(
            gram_idx,
            lambda i: F.struct(
                i.alias("p"),
                F.concat_ws(
                    " ",
                    *[F.element_at(F.col("__toks"), (i + j + 1).cast("int")) for j in range(k)],
                ).alias("g"),
            ),
        ),
    )  # null (no interior grams) -> posexplode emits nothing
    # one generator materializes the grams as rows: each md5 runs once
    cand = staged.select(F.col(id_col), F.explode(grams).alias("__pg")).select(
        id_col, F.col("__pg.p").alias("__p"), F.col("__pg.g").alias("__g")
    )
    mids = (
        cand.filter(shingle_hash(F.col("__g")) % mod == 0)
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list("__p")).alias("__mids"))
    )
    joined = staged.join(mids, id_col, "left").select(
        id_col,
        "__toks",
        F.concat(
            F.array(F.lit(0)),
            F.coalesce("__mids", F.array().cast("array<int>")),
            F.array(F.size("__toks")),
        ).alias("__bounds"),
    )
    spans = F.transform(
        F.sequence(F.lit(0), F.size("__bounds") - 2),
        lambda i: F.struct(
            F.element_at(F.col("__bounds"), (i + 1).cast("int")).alias("s"),
            F.element_at(F.col("__bounds"), (i + 2).cast("int")).alias("e"),
        ),
    )
    exploded = joined.select(
        id_col, "__toks", F.posexplode(spans).alias("chunk_idx", "__sp")
    )
    s, e = F.col("__sp.s"), F.col("__sp.e")
    return exploded.select(
        id_col,
        "chunk_idx",
        s.cast("long").alias("start_tok"),
        e.cast("long").alias("end_tok"),
        (e - s).cast("long").alias("n_tokens"),
        F.concat_ws(" ", F.slice("__toks", s + 1, e - s)).alias("chunk_text"),
    )


def length_bucket_stats(
    docs: DataFrame,
    *,
    n_buckets: int = 8,
    batch_size: int = 32,
    by: str | list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    weight_col: str | None = None,
) -> DataFrame:
    """Length-bucketed batching audit: assign documents to rank-exact
    length buckets (``sampling.quality_bins`` on token count), form
    deterministic fixed-size batches inside each bucket (ascending
    (length, id) order), and account the padding a padded-batch trainer
    would pay: every sequence in a batch pads to the batch max.

    Output per (keys..., bucket): n_docs, n_batches, real_tokens,
    padded_tokens, waste_frac = 1 - real/padded.  The whole point of
    length bucketing is driving waste_frac down vs one global bucket —
    run with n_buckets=1 for the baseline and compare.

    Every aggregate is an integer (token counts, batch maxima); the one
    double division happens last, so a SQL oracle matches bit-for-bit.

    Scale shape: bucket assignment is the quality_bins rank window
    (partition by ``by`` — per-group windows at corpus scale, see that
    docstring); batch formation is a second window WITHIN (keys,
    bucket), i.e. ~1/n_buckets of a group per task; the stats are two
    grouped aggregations.  No data movement beyond those windows — this
    is an audit over a manifest-sized relation (id, length), not the
    text."""
    from patternly_spark.operators.sampling import quality_bins
    from pyspark.sql import Window

    if n_buckets < 1 or batch_size < 1:
        raise ValueError("n_buckets and batch_size must be >= 1")
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    w = (
        F.col(weight_col)
        if weight_col is not None
        else F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    )
    lens = docs.select(*keys, F.col(id_col), w.cast("long").alias("tok_len"))
    binned = quality_bins(
        lens, "tok_len", n_bins=n_buckets, by=by or None, id_col=id_col, out_col="bucket"
    )
    bw = Window.partitionBy(*keys, "bucket").orderBy(
        F.col("tok_len").asc(), F.col(id_col).asc()
    )
    batched = binned.withColumn(
        "batch", F.floor((F.row_number().over(bw) - 1) / F.lit(int(batch_size)))
    )
    per_batch = batched.groupBy(*keys, "bucket", "batch").agg(
        F.count(F.lit(1)).alias("bn"),
        F.max("tok_len").alias("bmax"),
        F.sum("tok_len").alias("breal"),
    )
    padded = F.sum(F.col("bmax") * F.col("bn")).cast("long")
    return per_batch.groupBy(*keys, "bucket").agg(
        F.sum("bn").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_batches"),
        F.sum("breal").cast("long").alias("real_tokens"),
        padded.alias("padded_tokens"),
        (
            F.lit(1.0)
            - F.sum("breal").cast("double") / F.sum(F.col("bmax") * F.col("bn")).cast("double")
        ).alias("waste_frac"),
    )


def assign_shards(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    weight_col: str | None = None,
    text_col: str = "text",
    n_shards: int = 16,
) -> DataFrame:
    """Weight-balanced shard assignment: (id_col, weight, shard).

    Serpentine (boustrophedon) round-robin over documents ranked by
    descending weight: rank r goes to shard ``r % n`` on even passes and
    ``n-1 - (r % n)`` on odd passes, so every shard gets one document
    from each weight stratum — shard totals differ by at most one
    stratum's spread, without the sequential greedy bin-packing loop
    that can't distribute.  Deterministic (ties rank by id).

    The rank is one global sort — at 100 TB use ``repartitionByRange``
    semantics (Spark's rank window already range-partitions); the output
    is the (doc -> shard) map a writer joins against, not moved data.

    ``weight_col=None`` weighs by whitespace token count of ``text_col``.
    """
    from pyspark.sql import Window

    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    w = (
        F.col(weight_col)
        if weight_col is not None
        else F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    )
    ranked = docs.select(
        F.col(id_col), w.cast("long").alias("weight")
    ).withColumn(
        "__r",
        F.row_number().over(Window.orderBy(F.desc("weight"), F.asc(id_col))) - 1,
    )
    n = F.lit(int(n_shards))
    pos = F.col("__r") % n
    odd_pass = (F.floor(F.col("__r") / n) % 2) == 1
    shard = F.when(odd_pass, n - 1 - pos).otherwise(pos)
    return ranked.select(id_col, "weight", shard.cast("int").alias("shard"))
