"""Deduplication operators for training-data pipelines at 100 TB scale.

Five families (each has a queries() entry on the documents table):

- exact          : md5-normalized hash groupBy — one shuffle on a 16-byte
                   key, the canonical-id join is a map-side broadcast at
                   small dup rates.
- MinHash + LSH  : shingle -> k portable hash functions -> banded
                   signatures -> self-join on (band_id, band_hash).  The
                   join key space is huge, so the shuffle fans out evenly;
                   only candidate pairs (hash-equal bands) are compared.
- SimHash        : 64-bit weighted-bit fingerprint; near-dups differ in
                   few bits — bucket by 4 16-bit sub-keys (Hamming <= 3
                   guarantee via pigeonhole) and verify within buckets.
- n-gram Jaccard : exact verification metric on candidate pairs.
- embedding near-dup : cosine over an embedding column above threshold,
                   LSH-bucketed by random hyperplane signs.

Everything is built-in column expressions (no Python UDFs): hashes are
md5-derived so an external SQL oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from patternly_spark.plans import local_rows

from patternly_spark.functions.text import fingerprint, shingle_hash, shingles, with_shingles

_MERSENNE = 2147483647  # 2^31 - 1
# fixed affine hash-family parameters (seeded, public): (a, b) pairs.
# All a < 2^31 so (h % M) * a stays below 2^62 (no long overflow).
_HASH_PARAMS = [
    (1103515245, 12345),
    (1140671485, 12820163),
    (214013, 2531011),
    (22695477, 1),
    (1664525, 1013904223),
    (69069, 362437),
    (1181783497, 7919),
    (1597334677, 851723965),
]


def exact_dedup(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate detection by normalized content hash.

    Output: (doc_id, content_hash, canonical_id, is_dup) — canonical is
    the minimum doc_id per hash group.  Plan: one hash-partitioned
    groupBy (map-side partial min) + one equi-join back; both stages
    prune to (id, 16-byte hash) columns before shuffling.
    """
    from pyspark.sql import Window

    hashed = docs.select(F.col(id_col), fingerprint(text_col, 32).alias("content_hash"))
    # single shuffle: windowed min over the hash partition (vs the naive
    # groupBy + join-back, which shuffles the same data twice)
    w = Window.partitionBy("content_hash")
    return hashed.select(
        id_col,
        "content_hash",
        F.min(id_col).over(w).alias("canonical_id"),
        (F.col(id_col) != F.min(id_col).over(w)).alias("is_dup"),
    )


def incremental_exact_dedup(
    new_docs: DataFrame,
    canon: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dedup a new ingestion batch against an existing canon AND itself.

    ``canon`` is (content_hash, canonical_id) — the accumulated corpus
    registry.  At scale, materialize it with
    ``sources.bucketed.save_bucketed(..., bucket_by='content_hash')``:
    the canon (the 100 TB side) then joins WITHOUT re-shuffling — only
    the day's batch shuffles into the bucket layout (plan pinned in
    tests/test_dedup_similarity.py).

    Output: (doc_id, content_hash, canonical_id, is_dup,
    is_new_canonical).  canonical_id prefers the canon's id; a hash new
    to the canon gets the batch's min id, with ``is_new_canonical``
    marking the rows to append to the registry.
    """
    batch = exact_dedup(new_docs, id_col=id_col, text_col=text_col).withColumnRenamed(
        "canonical_id", "__batch_canonical"
    )
    joined = batch.join(
        canon.select("content_hash", F.col("canonical_id").alias("__existing")),
        "content_hash",
        "left",
    )
    canonical = F.coalesce(F.col("__existing"), F.col("__batch_canonical"))
    return joined.select(
        id_col,
        "content_hash",
        canonical.alias("canonical_id"),
        (F.col(id_col) != canonical).alias("is_dup"),
        (
            F.col("__existing").isNull()
            & (F.col(id_col) == F.col("__batch_canonical"))
        ).alias("is_new_canonical"),
    )


def minhash_signatures(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """(doc_id, minhash_0..k-1): per-document MinHash signature.

    Shape: explode shingles -> hash each shingle ONCE -> k affine
    transforms as map-side-combined min aggregates -> one groupBy(doc_id)
    whose shuffle carries only k longs per document.  (The all-array
    form — k array_min(transform(shingles,...)) columns — re-evaluates
    the shingle+md5 expression once per hash function because Catalyst
    re-inlines single-referenced aliases, k-upling the dominant cost;
    the explode form computes each md5 exactly once and was measured 30x
    faster at sf0.1.)  Duplicate shingles don't affect the min, so no
    distinct is needed before aggregation.
    """
    staged = with_shingles(docs.select(id_col, text_col), text_col, shingle_size)
    # explode_outer, not explode: InferFiltersFromGenerate would inline a
    # size(shingles)>0 predicate that re-evaluates the whole tokenizer
    # pipeline per row (measured 7x cost); shingle arrays are never empty
    # (with_shingles emits [""] for empty text), so outer == inner here.
    exploded = staged.select(F.col(id_col), F.explode_outer("shingles").alias("__shingle"))
    hashed = exploded.select(
        id_col, (shingle_hash(F.col("__shingle")) % _MERSENNE).alias("__h")
    )
    aggs = []
    for j in range(num_hashes):
        a, b = _HASH_PARAMS[j % len(_HASH_PARAMS)]
        a, b = a + j, b + j
        aggs.append(F.min((F.col("__h") * a + b) % _MERSENNE).alias(f"minhash_{j}"))
    return hashed.groupBy(id_col).agg(*aggs)


def _pairs_in_buckets(
    keyed: DataFrame, bucket_cols: list[str], id_col: str,
    out_a: str = "doc_a", out_b: str = "doc_b",
    max_bucket_size: int = 2000,
) -> DataFrame:
    """All ordered pairs (a < b) of ids sharing a bucket.

    collect-then-emit instead of a bucket-keyed self-join: a self-join
    evaluates the (possibly expensive) upstream subtree twice and
    shuffles it twice; this shape shuffles it once into sorted per-bucket
    id arrays and emits the pairs with array expressions.  Per-bucket
    work is quadratic in bucket size under EITHER shape — bucket keys
    are hashes, so sizes stay near-uniform.

    ``max_bucket_size`` guards the one way this shape is weaker than the
    join: a degenerate bucket (e.g. millions of byte-identical documents
    landing in one LSH band) would materialize its quadratic pair array
    inside a single row.  Buckets above the cap degrade to STAR edges
    ``min(id) -> member`` — O(n) rows instead of O(n^2) — which keep the
    whole bucket connected through downstream verification + connected
    components (a mega-duplicate cluster must still reach the CC input;
    dropping it would leave exactly the MOST-duplicated content un-deduped
    at corpus scale).  Pairwise semantics are unchanged for buckets at or
    under the cap, so small-scale results (and oracle hashes) are
    identical.  2000 ids cap the per-row pair array at ~2M structs
    (~32 MB); the star path's only per-row cost is the O(n) sorted id
    array every collect-shape bucket already materializes.
    """
    grouped = (
        keyed.groupBy(*bucket_cols)
        .agg(F.array_sort(F.collect_set(id_col)).alias("__ids"))
        .filter(F.size("__ids") > 1)
    )
    idx = F.sequence(F.lit(0), F.size("__ids") - 2)
    all_pairs = F.flatten(
        F.transform(
            idx,
            lambda i: F.transform(
                F.slice(F.col("__ids"), (i + 2).cast("int"), F.size("__ids")),
                lambda b: F.struct(
                    F.element_at(F.col("__ids"), (i + 1).cast("int")).alias("a"),
                    b.alias("b"),
                ),
            ),
        )
    )
    # over-cap fallback: connect every member to the bucket minimum
    star = F.transform(
        F.slice(F.col("__ids"), 2, F.size("__ids")),
        lambda b: F.struct(F.element_at(F.col("__ids"), 1).alias("a"), b.alias("b")),
    )
    pairs = F.when(F.size("__ids") <= max_bucket_size, all_pairs).otherwise(star)
    return grouped.select(F.explode_outer(pairs).alias("p")).select(
        F.col("p.a").alias(out_a), F.col("p.b").alias(out_b)
    )


def lsh_band_keys(
    signatures: DataFrame,
    *,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """(id, band_id, band_hash): one row per (doc, band).  Band keys are
    md5-combined so bucket skew matches hash uniformity.  Shared by the
    batch candidate-pair path and the incremental/streaming registry
    (streaming/dedup.py), so both agree on what collides."""
    rows_per_band = num_hashes // bands
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"minhash_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_structs.append(
            F.struct(F.lit(b).alias("band_id"), F.md5(F.concat_ws("_", *[c.cast("string") for c in cols])).alias("band_hash"))
        )
    return signatures.select(
        F.col(id_col), F.explode_outer(F.array(*band_structs)).alias("band")
    ).select(id_col, F.col("band.band_id").alias("band_id"), F.col("band.band_hash").alias("band_hash"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    *,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Banded LSH: docs agreeing on all rows of any band become a
    candidate pair.  Output: (doc_a, doc_b) with doc_a < doc_b, distinct.

    Plan: explode to (band_id, band_hash, doc_id), one shuffle into
    per-bucket id sets, emit pairs (see _pairs_in_buckets).
    """
    exploded = lsh_band_keys(
        signatures, id_col=id_col, num_hashes=num_hashes, bands=bands
    )
    return _pairs_in_buckets(exploded, ["band_id", "band_hash"], id_col).distinct()


def minhash_dedup(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Full near-dup pipeline: signatures -> LSH candidates -> exact
    n-gram Jaccard verification -> (doc_a, doc_b, jaccard) above
    threshold."""
    sigs = minhash_signatures(
        docs, id_col=id_col, text_col=text_col, shingle_size=shingle_size, num_hashes=num_hashes
    )
    cand = lsh_candidate_pairs(sigs, id_col=id_col, num_hashes=num_hashes, bands=bands)
    sh = with_shingles(docs.select(id_col, text_col), text_col, shingle_size, out_col="sh").drop(text_col)
    verified = (
        cand.join(sh.withColumnRenamed(id_col, "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed(id_col, "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


def neardup_dedup_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """The whole near-dup removal pass as one call: MinHash -> banded LSH
    -> exact Jaccard verification -> connected components -> a TOTAL
    (doc_id, cluster_id, is_canonical) map over the corpus.  Filtering
    ``is_canonical`` is the dedup; joining back on cluster_id recovers
    each group.  Every stage is the scale-shaped operator documented on
    its own function; nothing new is materialized between them, so
    Catalyst plans the pipeline end-to-end."""
    from patternly_spark.operators.graph import dedup_clusters

    pairs = minhash_dedup(
        docs,
        id_col=id_col,
        text_col=text_col,
        shingle_size=shingle_size,
        num_hashes=num_hashes,
        bands=bands,
        jaccard_threshold=jaccard_threshold,
    )
    return dedup_clusters(
        pairs.select("doc_a", "doc_b"), docs.select(id_col), id_col=id_col
    )


def simhash_signatures(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    shingle_size: int = 1,
) -> DataFrame:
    """SimHash: sign of the per-bit sum of shingle-hash bits.

    (doc_id, simhash long).  Bit i of the signature is 1 iff more
    shingles have bit i set than unset in their 64-bit md5-derived hash.

    Shape: explode the (already-distinct) shingle array, build the 64-bit
    hash ONCE per shingle, then reduce with ``bits`` conditional-sum
    aggregates — one map-side-combined groupBy(doc_id) shuffle carrying
    ``bits`` ints per document.  (The all-array form re-evaluates the
    md5 pipeline once per bit — 64x the dominant cost at the default
    width; see minhash_signatures for the same Catalyst re-inlining
    rationale.)
    """
    staged = with_shingles(docs.select(id_col, text_col), text_col, shingle_size)
    # explode_outer, not explode: InferFiltersFromGenerate would inline a
    # size(shingles)>0 predicate that re-evaluates the whole tokenizer
    # pipeline per row (measured 7x cost); shingle arrays are never empty
    # (with_shingles emits [""] for empty text), so outer == inner here.
    exploded = staged.select(F.col(id_col), F.explode_outer("shingles").alias("__shingle"))
    h_lo = shingle_hash(F.col("__shingle"))
    h_hi = F.conv(F.substring(F.md5(F.col("__shingle")), 9, 8), 16, 10).cast("long")
    hashed = exploded.select(id_col, (F.shiftleft(h_hi, 32) + h_lo).alias("__h"))

    votes = [
        F.sum(
            F.when(F.shiftright(F.col("__h"), i) % 2 != 0, 1).otherwise(-1)
        ).alias(f"__v{i}")
        for i in range(bits)
    ]
    voted = hashed.groupBy(id_col).agg(*votes)
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.shiftleft(
            F.when(F.col(f"__v{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")), i
        )
    return voted.select(F.col(id_col), sig.alias("simhash"))


def simhash_neardup_pairs(
    signatures: DataFrame,
    *,
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Hamming-<=3 pairs via the pigeonhole trick: split the 64-bit key
    into 4 16-bit blocks; any pair within distance 3 agrees on >= 1
    block.  Shape: explode to (block_id, block_value, doc_id) — ONE
    evaluation of the signature pipeline — emit per-bucket pairs
    (collect-then-emit, see _pairs_in_buckets), then re-attach the two
    signatures with equi-joins for the exact Hamming verify."""
    block_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("block_id"),
                (F.shiftright(F.col("simhash"), 16 * b) % 65536).alias("block_value"),
            )
            for b in range(4)
        ]
    )
    exploded = signatures.select(
        F.col(id_col), F.explode_outer(block_structs).alias("blk")
    ).select(
        id_col,
        F.col("blk.block_id").alias("block_id"),
        F.col("blk.block_value").alias("block_value"),
    )
    cand = _pairs_in_buckets(exploded, ["block_id", "block_value"], id_col).distinct()
    sa = signatures.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sim_a"))
    sb = signatures.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sim_b"))
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for given (doc_a, doc_b) pairs."""
    sh = with_shingles(docs.select(id_col, text_col), text_col, n, out_col="sh").drop(text_col)
    return (
        pairs.join(sh.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sh.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")).cast("double")
            ).alias("jaccard"),
        )
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-duplicates: cosine >= threshold, LSH-bucketed by
    random-hyperplane sign signature so the self-join is keyed (shuffle
    O(N), compare only within buckets).  High-cosine pairs agree on most
    hyperplane signs; we bucket on the full signature and on signatures
    with one flipped bit to keep recall at the 0.95 regime."""
    import numpy as np

    from patternly_spark.functions.vectors import dot, hyperplane_signature, norm

    dim = len(embeddings.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(num_planes, dim))

    def signature() -> Column:
        # literal expressions for small plane sets, broadcast+pandas-UDF
        # beyond LITERAL_BUDGET (functions/vectors.py)
        return hyperplane_signature(F.col(vec_col), planes)

    # norm computed ONCE per vector here, not once per candidate pair —
    # cos = dot/(norm_l*norm_r) is the identical IEEE expression cosine()
    # folds, so results (and oracle hashes) are bit-equal
    keyed = embeddings.select(
        id_col, vec_col, signature().alias("sig"), norm(F.col(vec_col)).alias("nrm")
    )
    # probe buckets: exact signature + each 1-bit flip (multi-probe LSH)
    probes = F.array(*([F.col("sig")] + [F.col("sig").bitwiseXOR(F.lit(1 << i)) for i in range(num_planes)]))
    probed = keyed.select(id_col, vec_col, "nrm", F.col("sig"), F.explode(probes).alias("bucket"))
    l = probed.alias("l")
    r = keyed.alias("r")
    cos = dot(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}")) / (F.col("l.nrm") * F.col("r.nrm"))
    # threshold BEFORE the multi-probe dedup (deterministic per-row filter
    # commutes with distinct), so the dedup shuffle carries only the
    # surviving near-dup pairs — 3 scalars each — instead of every
    # candidate pair
    return (
        l.join(r, (F.col("l.bucket") == F.col("r.sig")) & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(
            F.col(f"l.{id_col}").alias("vec_a"),
            F.col(f"r.{id_col}").alias("vec_b"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .distinct()
        .select("vec_a", "vec_b", "cos")
    )


def semantic_dedup(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    num_planes: int | None = 4,
    target_cell_size: int = 1024,
    max_cell_size: int = 4096,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): assign
    every embedding to a cell, compare ONLY within cells, link pairs with
    cosine >= threshold, keep one representative per connected group.

    The cell assignment is a random-hyperplane sign signature (the same
    deterministic, SQL-replicable primitive as ``embedding_neardup_pairs``)
    standing in for SemDeDup's k-means cells: within-cell-only comparison
    is the approximation that makes the pass O(sum of cell^2) instead of
    O(N^2).

    Cell sizing is the engine's job, not the caller's:
    ``num_planes=None`` derives the plane count from the corpus count so
    the EXPECTED cell holds ~``target_cell_size`` vectors
    (ceil(log2(N / target)); one count() driver action on a column-pruned
    scan).  An explicit ``num_planes`` pins the cell grid (needed by the
    incremental/registry path, where signatures must be stable across
    batches).

    Cells that overflow ``max_cell_size`` anyway (a hot region of
    embedding space — e.g. millions of boilerplate pages embedding to the
    same point) degrade from the O(cell^2) pairwise join to STAR
    comparisons against the cell's min-id representative: O(cell) work,
    and a mega-duplicate cell still reaches connected components as one
    group instead of stalling the stage.  Pairwise semantics are
    unchanged for cells at or under the cap.

    Returns a TOTAL map over the corpus: (id, cluster_id, is_canonical)
    with cluster_id = min id of the duplicate group; singletons are their
    own cluster — filter ``is_canonical`` to materialize the kept set.
    """
    import math

    import numpy as np

    from patternly_spark.functions.vectors import dot, hyperplane_signature, norm
    from patternly_spark.operators.graph import dedup_clusters

    if num_planes is None:
        n_total = embeddings.select(id_col).count()
        num_planes = max(1, min(24, math.ceil(math.log2(max(n_total, 1) / target_cell_size)))) if n_total > target_cell_size else 1

    dim = len(embeddings.select(vec_col).first()[0])
    planes = np.random.default_rng(seed).normal(size=(num_planes, dim))

    keyed = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_signature(F.col(vec_col), planes).alias("sig"),
        norm(F.col(vec_col)).alias("nrm"),
    )
    # per-cell count + min id, joined back on the same sig key the
    # pairwise join shuffles on (one extra cells-sized aggregate)
    cells = keyed.groupBy("sig").agg(
        F.count(F.lit(1)).alias("__n"), F.min(id_col).alias("__cmin")
    )
    kl = keyed.join(cells, "sig")
    # under-cap cells: exact pairwise within the cell.  The cosine is
    # evaluated in an Arrow kernel that replays functions/vectors.dot
    # and .norm EXACTLY — a zero-seeded fold, sequential over dims,
    # vectorized over pairs — because Catalyst higher-order folds run
    # INTERPRETED (the q173 lesson: a 64-dim fold over millions of
    # pairs costs ~30x the identical numpy arithmetic).  Values are
    # bit-identical: each per-dim step is the same double multiply-add
    # in the same order, and cos = dot / (nrm_a * nrm_b) is the same
    # final expression (q44's oracle hash pins this).
    thr = float(threshold)

    # the kernel sorts/casts ids as int64 (and the star path must union
    # type-compatibly with it) — a string/decimal id would silently
    # become NULL under the cast and its pairs would vanish; refuse it
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    id_type = embeddings.schema[id_col].dataType
    if not isinstance(id_type, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"semantic_dedup needs an integral {id_col!r} (got "
            f"{id_type.simpleString()}): map ids to long first, e.g. via "
            "zipWithIndex/monotonically_increasing_id + a join back"
        )

    def _cell_pairs(pdf):
        import numpy as np
        import pandas as pd

        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64")})
        pdf = pdf.sort_values("__id", kind="mergesort")
        ids = pdf["__id"].to_numpy()
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["__vec"]])
        d = X.shape[1]
        nacc = np.zeros(n)
        for k in range(d):
            nacc = nacc + X[:, k] * X[:, k]
        nrm = np.sqrt(nacc)
        ia, ib = np.triu_indices(n, 1)
        out_a, out_b = [], []
        # slab the pair space so a 4096-cell never allocates >~100 MB
        for lo in range(0, len(ia), 2_000_000):
            sa, sb = ia[lo:lo + 2_000_000], ib[lo:lo + 2_000_000]
            acc = np.zeros(len(sa))
            for k in range(d):
                acc = acc + X[sa, k] * X[sb, k]
            cos = acc / (nrm[sa] * nrm[sb])
            keep = cos >= thr
            out_a.append(ids[sa][keep])
            out_b.append(ids[sb][keep])
        return pd.DataFrame({
            "doc_a": np.concatenate(out_a).astype("int64"),
            "doc_b": np.concatenate(out_b).astype("int64"),
        })

    pairwise = (
        kl.filter(F.col("__n") <= max_cell_size)
        .select(
            "sig",
            F.col(id_col).cast("long").alias("__id"),
            F.col(vec_col).alias("__vec"),
        )
        .groupBy("sig")
        .applyInPandas(_cell_pairs, schema="doc_a long, doc_b long")
    )
    # over-cap cells: every member vs the cell's min-id representative
    reps = kl.filter((F.col("__n") > max_cell_size) & (F.col(id_col) == F.col("__cmin"))).select(
        "sig", F.col(id_col).alias("doc_a"), F.col(vec_col).alias("__rvec"), F.col("nrm").alias("__rn")
    )
    members = kl.filter((F.col("__n") > max_cell_size) & (F.col(id_col) != F.col("__cmin")))
    star_cos = dot(F.col(vec_col), F.col("__rvec")) / (F.col("nrm") * F.col("__rn"))
    star = (
        members.join(reps, "sig")
        .filter(star_cos >= threshold)
        .select("doc_a", F.col(id_col).alias("doc_b"))
    )
    return dedup_clusters(pairwise.unionByName(star), docs=embeddings, id_col=id_col)


def _spans_expr(text_col: str, delimiter: str | None, block_tokens: int | None):
    """Span array + rejoin delimiter shared by the corpus-level and
    intra-document dedup operators."""
    if block_tokens is None and delimiter is None:
        raise ValueError("need delimiter or block_tokens")
    if block_tokens is not None:
        k = int(block_tokens)
        toks = F.split(F.trim(F.col(text_col)), r"\s+")
        n_blocks = F.greatest(F.ceil(F.size(toks) / k), F.lit(1)).cast("int")
        spans = F.transform(
            F.sequence(F.lit(0), n_blocks - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, (i * k + 1).cast("int"), k)),
        )
        return spans, " "
    import re as _re

    return F.split(F.col(text_col), _re.escape(delimiter)), delimiter


def intradoc_span_dedup(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str | None = "\n",
    block_tokens: int | None = None,
) -> DataFrame:
    """WITHIN-document span dedup: drop every repeat of a span inside the
    same document (in-page boilerplate / template repetition — the
    Gopher repetition filters' surgical cousin: remove the repeats, keep
    the document).  Corpus-global keep-first is ``span_dedup``.

    Pure array expressions — a narrow projection with ZERO shuffle at
    any corpus size (the dedup never leaves the row).  Keep-first is
    positional: span at index i survives iff its first occurrence in the
    doc is at i.  Per-row cost is O(spans^2) string compares (JVM,
    codegen) — fine for real documents; chop pathological span counts
    upstream.

    Output: (id, n_spans, n_kept, text_deduped).
    """
    spans, join_delim = _spans_expr(text_col, delimiter, block_tokens)
    sp = F.filter(spans, lambda x: x != F.lit(""))
    # bind the cleaned span array once so array_position scans the
    # materialized array, not a re-evaluated subtree
    with_sp = docs.select(F.col(id_col), sp.alias("__sp"))
    kept = F.filter(
        F.col("__sp"),
        lambda x, i: F.array_position(F.col("__sp"), x) == (i + 1).cast("long"),
    )
    return with_sp.select(
        id_col,
        F.size("__sp").cast("long").alias("n_spans"),
        F.size(kept).cast("long").alias("n_kept"),
        F.array_join(kept, join_delim).alias("text_deduped"),
    )


def span_dedup(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str | None = "\n",
    block_tokens: int | None = None,
    drop_empty: bool = True,
) -> DataFrame:
    """Span-level corpus deduplication (C4-style): split every document
    into spans, keep only the globally FIRST occurrence of each distinct
    span (ordered by (doc_id, position)), and reassemble documents from
    their surviving spans.

    Span definition: ``delimiter`` mode splits on a literal delimiter
    (lines, sentences); ``block_tokens=k`` mode uses non-overlapping
    k-token blocks (the C4 paper's "three-sentence span" analog for
    unstructured text).  Exactly one of the two applies (block mode wins
    when both are set).

    Output is TOTAL over the input ids: (id, n_spans, n_kept,
    text_deduped); a document whose every span first appeared in an
    earlier document survives with n_kept = 0 and empty text.

    Scale plan (the skew question is the whole design):

    - first-occurrence per span = ``min(struct(id, pos))`` AGGREGATION on
      the span hash, NOT a window over it.  A window must materialize
      each hash partition in one task, and span dedup is precisely the
      workload with pathological hot keys (boilerplate lines repeated
      billions of times); partial aggregation collapses a hot span to
      one row per map task before the shuffle.
    - the join back (lines x firsts on the 16-byte hash) is AQE
      skew-splittable, unlike a window.
    - reassembly is one groupBy(id) carrying (pos, span, kept); the
      kept-only collect uses collect_list(when(kept, ...)) null-skipping
      so n_spans/n_kept/text come out of a single shuffle.

    Spans are hashed with md5 so an external SQL oracle reproduces the
    keep-set bit-for-bit (driver query q49).
    """
    spans, join_delim = _spans_expr(text_col, delimiter, block_tokens)
    lines = docs.select(F.col(id_col), F.posexplode(spans).alias("pos", "span"))
    if drop_empty:
        lines = lines.filter(F.col("span") != "")
    lines = lines.withColumn("h", F.md5("span"))

    firsts = lines.groupBy("h").agg(F.min(F.struct(id_col, "pos")).alias("first"))
    flagged = lines.join(firsts, "h").withColumn(
        "kept",
        (F.col(id_col) == F.col("first")[id_col]) & (F.col("pos") == F.col("first")["pos"]),
    )
    agg = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        F.concat_ws(
            join_delim,
            F.transform(
                F.array_sort(F.collect_list(F.when(F.col("kept"), F.struct("pos", "span")))),
                lambda x: x["span"],
            ),
        ).alias("text_deduped"),
    )
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
        )
    )


def minhash_calibration(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 1,
    num_hashes: int = 8,
    n_bins: int = 8,
    pair_offset: int = 1,
) -> DataFrame:
    """MinHash estimator calibration: how well does component agreement
    of k-hash signatures track exact shingle-set Jaccard?  The answer
    decides how many hashes (and which LSH band geometry) a corpus needs
    BEFORE paying for a full dedup run — the measurement a 100 TB
    pipeline does on a sample first.

    Probe pairs are (id, id + pair_offset) — a fixed deterministic
    pairing, NOT the LSH candidates, so the curve is unbiased by the
    candidate filter (LSH pairs are conditioned on agreement).

    Per pair: est = (#equal signature components)/k; exact = Jaccard of
    the distinct shingle sets.  Pairs bucket by floor(est * n_bins)
    (clamped) and each bin reports n_pairs, mean_est, mean_exact.

    Cross-engine exactness: every aggregated quantity is an INTEGER —
    equal-component counts sum exactly, and the per-pair exact Jaccard
    is quantized to the 2^-20 dyadic grid (floor(j * 2^20) is a bigint)
    before summing, so sums are order/partitioning-invariant and a SQL
    oracle reproduces the means bit-for-bit (single final double
    division on identical operands).

    Scale shape: signatures and shingle sets come out of one corpus
    scan + one groupBy(id); the pair join is an equi-join on id; the
    final agg has n_bins rows.  O(sample) — meant to run on a
    hash-sampled slice (operators/sampling.hash_sample) at full scale.
    """
    k = int(num_hashes)
    if k < 1 or n_bins < 1:
        raise ValueError("num_hashes and n_bins must be >= 1")
    sigs = minhash_signatures(
        docs, id_col=id_col, text_col=text_col,
        shingle_size=shingle_size, num_hashes=k,
    )
    if shingle_size == 1:
        toks = F.array_distinct(F.split(F.col(text_col), " "))
    else:
        toks = F.array_distinct(shingles(F.col(text_col), shingle_size))
    sets = docs.select(F.col(id_col), toks.alias("__toks"))
    sided = sets.join(sigs, id_col)
    sig_arr = F.array(*[F.col(f"minhash_{j}") for j in range(k)])
    a = sided.select(
        F.col(id_col).alias("__ida"), sig_arr.alias("__sa"), F.col("__toks").alias("__ta")
    )
    b = sided.select(
        (F.col(id_col) - F.lit(int(pair_offset))).alias("__ida"),
        sig_arr.alias("__sb"),
        F.col("__toks").alias("__tb"),
    )
    pairs = a.join(b, "__ida").select(
        "__ida",
        F.size(F.filter(F.zip_with("__sa", "__sb", lambda x, y: x == y), lambda e: e))
        .alias("__eq"),
        (
            F.size(F.array_intersect("__ta", "__tb")).cast("double")
            / F.size(F.array_union("__ta", "__tb")).cast("double")
        ).alias("__j"),
    )
    scale = F.lit(float(1 << 20))
    binned = pairs.select(
        F.least(
            F.floor(F.col("__eq").cast("double") / F.lit(float(k)) * F.lit(int(n_bins))).cast("int"),
            F.lit(int(n_bins) - 1),
        ).alias("bin"),
        "__eq",
        F.floor(F.col("__j") * scale).cast("long").alias("__jq"),
    )
    n = F.count(F.lit(1))
    return binned.groupBy("bin").agg(
        n.cast("long").alias("n_pairs"),
        (F.sum("__eq").cast("double") / (n.cast("double") * F.lit(float(k))))
        .alias("mean_est"),
        ((F.sum("__jq").cast("double") / scale) / n.cast("double")).alias("mean_exact"),
    )


def boilerplate_removal(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str | None = "\n",
    block_tokens: int | None = None,
    max_doc_freq: int = 2,
    drop_empty: bool = True,
    broadcast_hot: bool = True,
) -> DataFrame:
    """Corpus-frequency boilerplate removal (ccnet / MassiveText-style
    line filtering): drop every span whose DOCUMENT frequency exceeds
    ``max_doc_freq`` from ALL documents.  This is the complement of
    ``span_dedup``: keep-first dedup preserves one copy of a duplicated
    span inside whatever document happened to come first, but nav bars /
    cookie banners / share buttons should not survive even once inside
    an unrelated page — a span frequent across documents is boilerplate,
    not content, so every occurrence goes.

    Span definition matches ``span_dedup`` (``delimiter`` mode or
    non-overlapping ``block_tokens`` blocks).  Frequency is counted in
    DOCUMENTS (a span repeated inside one page counts once), so an
    intra-doc refrain is not mistaken for corpus boilerplate.

    Output is TOTAL over the input ids: (id, n_spans, n_kept,
    text_clean).

    Scale plan:

    - document frequency = distinct(h, id) then count per h.  The
      distinct is one shuffle whose partial aggregation collapses
      intra-doc repeats map-side; the count runs on already-distinct
      pairs.  Never a window over the span hash (hot boilerplate keys).
    - the over-threshold set is the DISTINCT boilerplate vocabulary —
      even at 100 TB that is millions of 16-byte hashes (tens of MB),
      so the flag-back join broadcasts it (``broadcast_hot=False``
      falls back to an AQE skew-splittable shuffle join for degenerate
      corpora where most spans are hot).
    - reassembly is the same single groupBy(id) as ``span_dedup``.

    Spans are md5-hashed so an external SQL oracle reproduces the drop
    set bit-for-bit (driver query q115).
    """
    if max_doc_freq < 1:
        raise ValueError("max_doc_freq must be >= 1")
    lines, join_delim = _span_lines(
        docs, id_col=id_col, text_col=text_col,
        delimiter=delimiter, block_tokens=block_tokens, drop_empty=drop_empty,
    )
    hot = (
        lines.select("h", id_col)
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") > F.lit(int(max_doc_freq)))
        .select("h")
    )
    return _clean_against_hot(
        docs, lines, hot, id_col=id_col, join_delim=join_delim,
        broadcast_hot=broadcast_hot,
    )


def _span_lines(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    delimiter: str | None,
    block_tokens: int | None,
    drop_empty: bool,
):
    """(id, pos, span, h=md5(span)) exploded span relation + the
    reassembly delimiter — the shared front half of the corpus-frequency
    operators."""
    spans, join_delim = _spans_expr(text_col, delimiter, block_tokens)
    lines = docs.select(F.col(id_col), F.posexplode(spans).alias("pos", "span"))
    if drop_empty:
        lines = lines.filter(F.col("span") != "")
    return lines.withColumn("h", F.md5("span")), join_delim


def _clean_against_hot(
    docs: DataFrame,
    lines: DataFrame,
    hot: DataFrame,
    *,
    id_col: str,
    join_delim: str,
    broadcast_hot: bool,
) -> DataFrame:
    """Drop every line whose hash is in ``hot`` (one-column 'h' frame)
    and reassemble — the shared back half of boilerplate_removal and
    apply_boilerplate_registry."""
    hot = hot.select("h", F.lit(True).alias("__hot"))
    if broadcast_hot:
        hot = F.broadcast(hot)
    flagged = lines.join(hot, "h", "left").withColumn(
        "kept", F.col("__hot").isNull()
    )
    agg = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        F.concat_ws(
            join_delim,
            F.transform(
                F.array_sort(F.collect_list(F.when(F.col("kept"), F.struct("pos", "span")))),
                lambda x: x["span"],
            ),
        ).alias("text_clean"),
    )
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def span_doc_freq(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str | None = "\n",
    block_tokens: int | None = None,
    drop_empty: bool = True,
) -> DataFrame:
    """(h, doc_freq): per-span document frequency — the additive half of
    boilerplate_removal, exposed so an incremental registry can fold
    batches (doc_freq of disjoint doc sets ADDS; see
    streaming/dedup.streaming_boilerplate_registry)."""
    lines, _ = _span_lines(
        docs, id_col=id_col, text_col=text_col,
        delimiter=delimiter, block_tokens=block_tokens, drop_empty=drop_empty,
    )
    return (
        lines.select("h", id_col)
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("long").alias("doc_freq"))
    )


def apply_boilerplate_registry(
    docs: DataFrame,
    registry: DataFrame,
    *,
    max_doc_freq: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str | None = "\n",
    block_tokens: int | None = None,
    drop_empty: bool = True,
    broadcast_hot: bool = True,
) -> DataFrame:
    """Clean ``docs`` against an externally maintained (h, doc_freq)
    registry (e.g. the streaming registry): drop every span whose
    registry doc_freq exceeds ``max_doc_freq``.  Same output contract
    and scale shape as ``boilerplate_removal`` — the only difference is
    where the frequencies come from, so corpus-wide boilerplate learned
    over time filters batches that never saw each other."""
    if max_doc_freq < 1:
        raise ValueError("max_doc_freq must be >= 1")
    lines, join_delim = _span_lines(
        docs, id_col=id_col, text_col=text_col,
        delimiter=delimiter, block_tokens=block_tokens, drop_empty=drop_empty,
    )
    hot = registry.filter(F.col("doc_freq") > F.lit(int(max_doc_freq))).select("h")
    return _clean_against_hot(
        docs, lines, hot, id_col=id_col, join_delim=join_delim,
        broadcast_hot=broadcast_hot,
    )


def exact_substring_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 8,
) -> DataFrame:
    """Corpus-global exact-substring duplication spans — the Spark-first
    answer to suffix-array ExactSubstr dedup (Lee et al. 2022,
    arXiv:2107.06499 §4.1; reference has no corpus dedup at all).

    The suffix array is unnecessary for POSITION COVERAGE: a token
    position lies inside some duplicated substring of >= L tokens iff it
    lies inside some duplicated L-token window (any duplicated substring
    of length >= L is tiled by duplicated L-windows; a duplicated
    L-window IS such a substring).  So:

    1. hash every L-token window (md5 over a 0x1f-joined slice — an
       external SQL oracle reproduces it bit-for-bit),
    2. keep-first: a window's globally first occurrence by (doc_id, pos)
       stays; every other occurrence of a repeated window marks its L
       positions duplicated,
    3. merge overlapping duplicated windows per document into maximal
       spans (gaps-and-islands).

    Output: (doc_id, span_start, span_end, span_tokens) with half-open
    token coordinates [start, end).

    Scale shape: the gram relation is ~one row per corpus token but each
    row is (id, int, 16-byte hash) — the same fan-out MinHash shingling
    already pays.  First-occurrence is a partial-aggregating groupBy on
    the hash (hot boilerplate grams collapse map-side; never a window
    over the hash), the join back is AQE-skew-splittable, and the island
    merge windows over doc_id — per-document data, never a global sort.
    """
    L = int(min_tokens)
    if L < 2:
        raise ValueError("min_tokens must be >= 2")
    from pyspark.sql import Window

    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit(""))
    with_t = docs.select(F.col(id_col), toks.alias("__t"))
    n = F.size("__t")
    grams = with_t.select(
        id_col,
        F.posexplode(
            F.when(
                n >= L,
                F.transform(
                    F.sequence(F.lit(0), n - L),
                    lambda i: F.md5(F.concat_ws("\x1f", F.slice("__t", i + 1, L))),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos", "h"),
    )
    firsts = grams.groupBy("h").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.min(F.struct(id_col, "pos")).alias("__first"),
    )
    dup = (
        grams.join(firsts, "h")
        .filter(
            (F.col("__cnt") > 1)
            & ~(
                (F.col(id_col) == F.col("__first")[id_col])
                & (F.col("pos") == F.col("__first")["pos"])
            )
        )
        .select(id_col, "pos")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + L).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = dup.withColumn(
        "__new", F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0)
    ).withColumn(
        "__island", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy(id_col, "__island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + L).alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )


def exact_substring_dedup(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 8,
) -> DataFrame:
    """Remove every ``exact_substring_spans`` span from its document and
    reassemble the survivors (whitespace-normalized).  Output is TOTAL
    over input ids: (doc_id, n_tokens, n_removed, text_deduped).

    One extra shuffle beyond the span computation: spans collapse to one
    row per affected doc (groupBy id), then a left join back to the
    token arrays; the position filter is a per-row array expression.
    """
    spans = exact_substring_spans(
        docs, id_col=id_col, text_col=text_col, min_tokens=min_tokens
    )
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit(""))
    with_t = docs.select(F.col(id_col), toks.alias("__t"))
    joined = with_t.join(per_doc, id_col, "left")
    covered = lambda i: F.exists(  # noqa: E731
        F.col("__spans"), lambda s: (i >= s["span_start"]) & (i < s["span_end"])
    )
    kept = F.when(F.col("__spans").isNull(), F.col("__t")).otherwise(
        F.filter(F.col("__t"), lambda x, i: ~covered(i))
    )
    return joined.select(
        id_col,
        F.size("__t").cast("long").alias("n_tokens"),
        (F.size("__t") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(kept, " ").alias("text_deduped"),
    )


def edit_distance_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    left_col: str = "doc_a",
    right_col: str = "doc_b",
) -> DataFrame:
    """Exact edit-distance verification of candidate pairs: join the two
    texts onto the (doc_a, doc_b) candidate list and score Levenshtein
    distance plus a normalized similarity ``1 - lev / max(len)``.

    The cost model is the point: Levenshtein is O(|a|x|b|) per pair, so
    it NEVER runs corpus x corpus — only on an LSH/fingerprint-bucketed
    candidate list (q22/q27/q50), where the quadratic cost is bounded by
    the bucket recall.  Two equi-joins on the id (dictionary-encoded
    parquet scans prune to (id, text)); the distance itself is a JVM
    built-in (F.levenshtein), zero Python.
    """
    texts = docs.select(F.col(id_col), F.col(text_col))
    a = texts.withColumnRenamed(id_col, left_col).withColumnRenamed(text_col, "__ta")
    b = texts.withColumnRenamed(id_col, right_col).withColumnRenamed(text_col, "__tb")
    joined = pairs.join(a, left_col).join(b, right_col)
    lev = F.levenshtein("__ta", "__tb")
    denom = F.greatest(F.length("__ta"), F.length("__tb"))
    return joined.select(
        left_col,
        right_col,
        lev.cast("long").alias("lev"),
        F.when(denom == 0, F.lit(1.0))
        .otherwise(F.lit(1.0) - lev.cast("double") / denom.cast("double"))
        .alias("sim"),
    )


def pair_set_agreement(
    methods: "dict[str, DataFrame]",
    *,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Agreement matrix between duplicate-pair sets — the evaluation a
    pipeline runs before trusting one dedup method over another: how
    many pairs do exact-after-normalization, LSH candidates, and
    verified near-dup actually share on THIS corpus?

    Each input relation is normalized to unordered distinct pairs
    (least, greatest); output has one row per unordered method pair:
    (method_a, method_b, n_a, n_b, n_common, overlap_jaccard) with
    overlap_jaccard = |A∩B| / |A∪B| (0 when both empty).

    Counts are integers and the jaccard is one double division —
    engine-exact.  Scale shape (r11 optimization): ONE pass — every
    method's pair relation is scanned exactly once into a union tagged
    with a per-method bit, one groupBy (a, b) bit_or collapses
    duplicates within AND across methods, and a second (tiny) aggregate
    counts pairs per membership mask.  The <= 2^k mask counts (k =
    number of methods, a caller-enumerated handful) are a bounded
    driver readout — the k×k-matrix contract — from which every matrix
    cell is integer arithmetic.  The previous shape re-evaluated each
    (possibly expensive: LSH, verification joins) input subtree once
    per matrix cell it appeared in — O(k) full scans per method and
    k(k-1)/2 equi-joins; this is one data-sized shuffle total."""
    names = sorted(methods)
    if len(names) < 2:
        return None
    spark = methods[names[0]].sparkSession
    tagged = None
    for idx, name in enumerate(names):
        t = methods[name].select(
            F.least(F.col(a_col), F.col(b_col)).alias("a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
            F.lit(1 << idx).alias("m"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    mask_counts = {
        r["mask"]: r["n"]
        for r in (
            tagged.groupBy("a", "b")
            .agg(F.bit_or("m").alias("mask"))
            .groupBy("mask")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        )
    }

    def _n(*bits: int) -> int:
        want = 0
        for b in bits:
            want |= 1 << b
        return sum(n for mask, n in mask_counts.items() if mask & want == want)

    rows = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            n_a, n_b, n_common = _n(i), _n(j), _n(i, j)
            denom = float(n_a + n_b - n_common)
            jac = (float(n_common) / denom) if denom > 0.0 else 0.0
            rows.append((names[i], names[j], n_a, n_b, n_common, jac))
    return local_rows(
        spark,
        rows,
        "method_a string, method_b string, n_a long, n_b long, "
        "n_common long, overlap_jaccard double",
    )


def set_similarity_join(
    docs: DataFrame,
    *,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
) -> DataFrame:
    """EXACT all-pairs Jaccard join via prefix filtering (the
    AllPairs/PPJoin family) — the deterministic counterpart to
    MinHash+LSH: every pair with shingle-set Jaccard >= threshold is
    found (no probabilistic recall), and nothing below survives the
    verify.

    Prefix-filter theorem: order each set by a GLOBAL canonical order
    (document frequency ascending, shingle ascending — rarest first);
    two sets with Jaccard >= t must share an element within the first
    ``n - ceil(t*n) + 1`` elements of each.  Blocking on prefix
    elements therefore keeps completeness while pruning the candidate
    space to pairs sharing a RARE shingle.

    Scale shape: shingle df is one map-side-combined groupBy; the
    canonical rank is a per-document window over its (distinct)
    shingles; the block join keys on the prefix shingle (rare by
    construction — the frequency-ascending order is precisely what
    keeps buckets small); the verify is the exact q23-style
    intersect/union on candidate pairs only.  Output: (doc_a, doc_b,
    jaccard) with doc_a < doc_b.
    """
    from pyspark.sql import Window

    t = float(threshold)
    sh = with_shingles(docs.select(id_col, text_col), text_col, shingle_size, out_col="__sh")
    sets = sh.select(F.col(id_col).alias("id"), F.col("__sh").alias("sh"))
    # the exploded (id, shingle) relation feeds FIVE downstream passes
    # (df census, ranking, sizes, and both verify sides); without pinning
    # it, each pass re-runs the corpus scan + tokenize + shingle cascade
    # — the dominant cost.  localCheckpoint materializes it once (same
    # pattern as the CC rounds / positional-index upsert); at 100 TB
    # write it out or persist(MEMORY_AND_DISK) under caller control.
    tok = sets.select("id", F.explode_outer("sh").alias("s")).localCheckpoint(
        eager=True
    )
    df_ = tok.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("df"))
    ranked = tok.join(df_, "s").withColumn(
        "__r",
        F.row_number().over(Window.partitionBy("id").orderBy(F.asc("df"), F.asc("s"))),
    )
    n = tok.groupBy("id").agg(F.count(F.lit(1)).cast("int").alias("n"))
    pref = (
        ranked.join(n, "id")
        .filter(
            F.col("__r")
            <= F.col("n") - F.ceil(F.lit(t) * F.col("n").cast("double")).cast("int") + 1
        )
        .select("id", "s")
    )
    cand = (
        pref.select(F.col("id").alias("doc_a"), "s")
        .join(pref.select(F.col("id").alias("doc_b"), "s"), "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # verify as a COUNTING join over the already-exploded shingle relation
    # instead of per-pair array_intersect/array_union scans: one hash join
    # (doc_b, s) + one groupBy, fully inside whole-stage codegen — ~4x
    # faster at sf0.1 (array set-ops re-scan both ~50-element arrays per
    # candidate).  |union| = na + nb - c is the same integer |A∪B| the
    # array form computes, so the jaccard double is bit-identical.  Every
    # candidate shares a prefix shingle, so c >= 1 and no pair is lost.
    inter = (
        cand.join(tok.select(F.col("id").alias("doc_a"), "s"), "doc_a")
        .join(tok.select(F.col("id").alias("doc_b"), "s"), ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    jac = (
        inter.join(n.select(F.col("id").alias("doc_a"), F.col("n").alias("__na")), "doc_a")
        .join(n.select(F.col("id").alias("doc_b"), F.col("n").alias("__nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("__c").cast("double")
                / (F.col("__na") + F.col("__nb") - F.col("__c")).cast("double")
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= t)


def set_containment_join(
    docs: DataFrame,
    *,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
) -> DataFrame:
    """EXACT asymmetric set-CONTAINMENT join: every ordered pair
    (inner, outer) with |S(inner) & S(outer)| / |S(inner)| >= threshold
    — the doc-inside-doc detector (quoted articles, concatenated
    crawls, boilerplate-wrapped reposts) that Jaccard misses by
    construction: a 100-word doc fully quoted inside a 10k-word doc has
    Jaccard ~0.01 but containment 1.0.

    Prefix-filter theorem (asymmetric form): order the INNER set by
    global df-ascending rank; a pair with containment >= t must share
    an element within the inner's first n - ceil(t*n) + 1 shingles.
    The OUTER side indexes ALL its shingles (any superset can contain
    the inner), so candidates = inner-prefix x full inverted index —
    still rare-shingle-bounded on the probe side.  Verify is q162's
    counting join; containment = overlap / n_inner, one integer-ratio
    division.

    Scale shape identical to ``set_similarity_join`` (same pinned token
    relation, same census/rank/verify passes) plus one full-index join
    keyed on prefix shingles — rare by construction.  Both directions
    of a mutually-containing pair are emitted; dedupe downstream if a
    symmetric report is wanted.

    Output: (inner_doc, outer_doc, overlap, n_inner, containment).
    """
    from pyspark.sql import Window

    t = float(threshold)
    sh = with_shingles(docs.select(id_col, text_col), text_col, shingle_size, out_col="__sh")
    sets = sh.select(F.col(id_col).alias("id"), F.col("__sh").alias("sh"))
    tok = sets.select("id", F.explode_outer("sh").alias("s")).localCheckpoint(
        eager=True
    )
    df_ = tok.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("df"))
    ranked = tok.join(df_, "s").withColumn(
        "__r",
        F.row_number().over(Window.partitionBy("id").orderBy(F.asc("df"), F.asc("s"))),
    )
    n = tok.groupBy("id").agg(F.count(F.lit(1)).cast("int").alias("n"))
    pref = (
        ranked.join(n, "id")
        .filter(
            F.col("__r")
            <= F.col("n") - F.ceil(F.lit(t) * F.col("n").cast("double")).cast("int") + 1
        )
        .select("id", "s")
    )
    cand = (
        pref.select(F.col("id").alias("inner_doc"), "s")
        .join(tok.select(F.col("id").alias("outer_doc"), "s"), "s")
        .filter(F.col("inner_doc") != F.col("outer_doc"))
        .select("inner_doc", "outer_doc")
        .distinct()
    )
    # size lower bound: overlap <= min(n_inner, n_outer), so containment
    # >= t forces n_outer >= ceil(t * n_inner) — prune candidates BEFORE
    # the verify join (pure pruning: cannot drop a qualifying pair)
    cand = (
        cand.join(
            n.select(F.col("id").alias("inner_doc"), F.col("n").alias("__ni")),
            "inner_doc",
        )
        .join(
            n.select(F.col("id").alias("outer_doc"), F.col("n").alias("__no")),
            "outer_doc",
        )
        .filter(
            F.col("__no")
            >= F.ceil(F.lit(t) * F.col("__ni").cast("double")).cast("int")
        )
        .select("inner_doc", "outer_doc")
    )
    inter = (
        cand.join(tok.select(F.col("id").alias("inner_doc"), "s"), "inner_doc")
        .join(tok.select(F.col("id").alias("outer_doc"), "s"), ["outer_doc", "s"])
        .groupBy("inner_doc", "outer_doc")
        .agg(F.count(F.lit(1)).cast("long").alias("overlap"))
    )
    out = inter.join(
        n.select(F.col("id").alias("inner_doc"), F.col("n").alias("n_inner")),
        "inner_doc",
    ).select(
        "inner_doc",
        "outer_doc",
        "overlap",
        "n_inner",
        (
            F.col("overlap").cast("double") / F.col("n_inner").cast("double")
        ).alias("containment"),
    )
    return out.filter(F.col("containment") >= t)


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str,
    *,
    id_col: str = "doc_id",
    window: int = 3,
    prefix_block: int = 0,
    max_dist: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood entity-resolution blocking: sort records by
    the (dirty) key, pair each record with its next ``window - 1``
    neighbors — the classic Hernandez-Stolfo method, complementary to
    SymSpell blocking (``fuzzy_key_join`` needs bounded edit distance;
    sorted neighborhood catches prefix-preserving corruptions of any
    length).  With ``max_dist`` set, pairs are verified with exact
    Levenshtein.

    ``prefix_block > 0`` sorts WITHIN key-prefix partitions instead of
    globally — the 100 TB shape (a global total order is one
    range-partitioned sort; prefix blocks are embarrassingly parallel
    and only lose pairs straddling a prefix boundary, the documented
    trade of every SN deployment).

    Output: (id_a, id_b, key_a, key_b[, dist]) with neighbors emitted
    once (id_a is the earlier record in sort order).
    """
    from pyspark.sql import Window

    keys = [F.substring(F.col(key_col), 1, int(prefix_block)).alias("__blk")] if prefix_block else []
    base = df.select(*keys, F.col(id_col).alias("__id"), F.col(key_col).alias("__k"))
    w = (
        Window.partitionBy("__blk") if prefix_block else Window.partitionBy()
    ).orderBy(F.asc("__k"), F.asc("__id"))
    out = None
    for j in range(1, int(window)):
        nxt = base.select(
            *(["__blk"] if prefix_block else []),
            "__id",
            "__k",
            F.lead("__id", j).over(w).alias("__nid"),
            F.lead("__k", j).over(w).alias("__nk"),
        ).filter(F.col("__nid").isNotNull())
        out = nxt if out is None else out.unionByName(nxt)
    res = out.select(
        F.col("__id").alias("id_a"),
        F.col("__nid").alias("id_b"),
        F.col("__k").alias("key_a"),
        F.col("__nk").alias("key_b"),
    )
    if max_dist is not None:
        res = res.withColumn(
            "dist", F.levenshtein(F.col("key_a"), F.col("key_b")).cast("int")
        ).filter(F.col("dist") <= int(max_dist))
    return res


def duplicate_spans(
    docs: DataFrame,
    *,
    ngram: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_repeats: int = 2,
) -> DataFrame:
    """Exact repeated-substring span report — the ExactSubstr shape of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better" (arXiv:2107.06499): COVERAGE semantics — every maximal
    token span in which each token is covered by at least one
    ``ngram``-token window occurring >= ``min_repeats`` times across
    the corpus (including within one document).  Adjacent/overlapping
    repeated windows merge into one span (the island merge joins
    flagged start positions up to n apart), so a merged span may
    contain interior windows that are not themselves repeated — the
    guarantee is per-token coverage, not per-window repetition.  Where
    the paper builds a
    monolithic suffix array, the Spark-native formulation is a rolling
    n-gram census + gaps-and-islands merge — same detected spans for
    span lengths >= ngram (a repeat of length L >= n is exactly a run of
    L - n + 1 repeated n-grams), expressible as three shuffles:

      1. positional n-grams: one pass, per-row slice+join (no UDF);
      2. census: groupBy(gram) -> total occurrences (map-side combined);
      3. islands: per-doc window over flagged positions — a span starts
         where a flagged position clears the running max end (interval
         merge), spans close at max(pos)+n-1.

    Grams are grouped by their TEXT here (exact, zero collision risk —
    what makes the brute-force SQL oracle value-exact); at 100 TB group
    by xxhash64(gram) instead (collision odds 2^-64 per pair) so the
    shuffle carries 8 bytes, not 100-char strings — the shape is
    unchanged.

    Output: (doc_id, span_start, span_end, span_tokens) — token indices,
    0-based inclusive; span_tokens = end - start + 1 >= ngram.
    """
    from pyspark.sql import Window

    n = int(ngram)
    if n < 1:
        raise ValueError(f"ngram must be >= 1, got {n}")
    toks = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__t"),
    ).withColumn("__t", F.filter("__t", lambda x: x != ""))
    # sequence(a, b) DESCENDS when a > b, so docs shorter than n must get
    # an empty gram array, not a phantom descending index range
    gram_arr = F.when(
        F.size("__t") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("__t") - n),
            lambda i: F.array_join(F.slice("__t", i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = toks.select("id", F.posexplode(gram_arr).alias("pos", "gram"))
    dup = grams.groupBy("gram").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    flagged = (
        grams.join(dup.filter(F.col("cnt") >= int(min_repeats)), "gram")
        .select("id", "pos")
    )
    w = Window.partitionBy("id").orderBy("pos")
    prev_max_end = F.max(F.col("pos") + F.lit(n - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = (
        flagged.withColumn(
            "__new",
            F.when(
                prev_max_end.isNull() | (F.col("pos") > prev_max_end + 1), 1
            ).otherwise(0),
        )
        .withColumn("__island", F.sum("__new").over(w))
        .groupBy("id", "__island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(n - 1)).cast("long").alias("span_end"),
        )
        .select(
            F.col("id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).cast("long").alias(
                "span_tokens"
            ),
        )
    )
    return islands


def affix_overlap_join(
    docs: DataFrame,
    *,
    k: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Shard-boundary stitching join: pairs (doc_a, doc_b) where the
    LAST ``k`` tokens of doc_a equal the FIRST ``k`` tokens of doc_b —
    the signature of one logical document split across two crawl/shard
    records (truncation + re-crawl, paginated scrapes, log rotation).
    Exact-substring dedup (``duplicate_spans``) reports the overlap as
    a repeat; this operator recovers the STITCH ORDER so the two
    fragments can be rejoined instead of deduplicated.

    Execution: each doc contributes one head-affix row and one
    tail-affix row (both per-row slice expressions, zero shuffle until
    the join); the join is a single equi-join on the affix string.
    At 100 TB join on ``xxhash64(affix)`` so the shuffle carries 8
    bytes (2^-64 collision odds per pair), same documented trade as
    ``duplicate_spans``.  Docs with fewer than ``k`` tokens contribute
    nothing (an affix shorter than k matches half the corpus — the
    caller lowers k consciously, the operator never does).  Self-pairs
    (a doc whose own head equals its tail) are excluded.

    Output: (doc_a, doc_b, affix) — doc_a's tail stitches onto doc_b's
    head; the pair is ORDERED (stitch direction matters), so (a, b)
    and (b, a) can both appear (a cyclic duplicate pair).
    """
    kk = int(k)
    if kk < 1:
        raise ValueError(f"k must be >= 1, got {kk}")
    toks = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
        ).alias("__t"),
    ).filter(F.size("__t") >= kk)
    head = toks.select(
        F.col("id").alias("doc_b"),
        F.array_join(F.slice("__t", 1, kk), " ").alias("affix"),
    )
    tail = toks.select(
        F.col("id").alias("doc_a"),
        F.array_join(
            F.slice("__t", F.size("__t") - F.lit(kk) + 1, kk), " "
        ).alias("affix"),
    )
    return (
        tail.join(head, "affix")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b", "affix")
    )


def remove_duplicate_spans(
    docs: DataFrame,
    *,
    ngram: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_repeats: int = 2,
) -> DataFrame:
    """The ACTION step of ``duplicate_spans`` (Lee et al. ExactSubstr):
    cut every detected repeated span out of the text and return the
    cleaned corpus — the operation that actually de-memorizes training
    data, not just reports it.

    Composition law (tested): tokens kept == tokens NOT covered by any
    ``duplicate_spans`` row at the same (ngram, min_repeats); docs with
    no spans pass through with text joined from their own tokens
    (whitespace-normalized — the one caveat, documented).

    Shape: the span table is doc-keyed and far smaller than the corpus;
    spans collect per doc (collect_list over the doc key — bounded by
    spans-per-doc), the keep/drop test is a per-token F.exists over
    that array (no UDF, no shuffle beyond the one span join).

    Output: (id, text, n_tokens_before, n_tokens_removed).
    """
    from pyspark.sql import Window  # noqa: F401  (parity with siblings)

    spans = duplicate_spans(
        docs,
        ngram=ngram,
        id_col=id_col,
        text_col=text_col,
        min_repeats=min_repeats,
    )
    span_lists = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(F.col("span_start").alias("a"), F.col("span_end").alias("b"))
        ).alias("__spans")
    )
    # MUST match duplicate_spans' tokenization (empties filtered) or
    # span indices shift
    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
        ).alias("__t"),
    )
    joined = toks.join(span_lists, id_col, "left").withColumn(
        "__spans",
        F.coalesce(
            F.col("__spans"),
            F.array().cast("array<struct<a: bigint, b: bigint>>"),
        ),
    )
    kept = F.filter(
        F.transform(
            F.col("__t"),
            lambda w, i: F.struct(w.alias("w"), i.cast("long").alias("i")),
        ),
        lambda s: ~F.exists(
            F.col("__spans"), lambda sp: (s["i"] >= sp["a"]) & (s["i"] <= sp["b"])
        ),
    )
    return joined.select(
        F.col(id_col),
        F.array_join(F.transform(kept, lambda s: s["w"]), " ").alias(text_col),
        F.size("__t").cast("long").alias("n_tokens_before"),
        (F.size("__t") - F.size(kept)).cast("long").alias("n_tokens_removed"),
    )
