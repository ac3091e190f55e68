"""Similarity search over embedding columns.

- ``cosine_topk``      : brute-force exact top-k — the baseline.  A
                         broadcast of the (small) query set against the
                         full corpus: narrow scan, per-partition partial
                         top-k via window rank, one final shuffle on
                         query_id.  At 100 TB the corpus side stays
                         partition-parallel; only k rows per query move.
- ``lsh_bucketed_topk``: approximate scale path — random-hyperplane LSH
                         buckets with multi-probe, so each query compares
                         against a small candidate slice instead of the
                         full corpus (IVF-style cost model).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from patternly_spark.plans import local_rows

from patternly_spark.functions.vectors import (
    cosine,
    dot,
    hyperplane_signature,
    nearest_centroids,
    norm,
)


def _cos_precomputed() -> "F.Column":
    """cosine with per-vector norms hoisted out of the pair loop: the
    caller attaches ``qn``/``cn`` norm columns once per vector, so each
    candidate pair costs one dot fold instead of dot + two norms.
    dot/(qn*cn) is the identical IEEE expression ``cosine()`` folds, so
    results are bit-equal."""
    return dot(F.col("query_vec"), F.col("corpus_vec")) / (F.col("qn") * F.col("cn"))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    Output: (query_id, neighbor_id, cosine_sim, rank).  Self-matches are
    excluded.  Ranking ties break on neighbor_id (deterministic).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("corpus_vec"),
        norm(F.col(vec_col)).alias("cn"),
    )
    sim = _cos_precomputed()
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def topk_recall(
    exact: DataFrame,
    approx: DataFrame,
    *,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Recall@k of an approximate top-k result against the exact one —
    the acceptance metric every ANN deployment needs BEFORE trading
    brute-force for buckets: run both on a sampled query set, gate the
    rollout on the recall this operator reports.

    Inputs are two (query_id, neighbor_id, ...) top-k relations (extra
    columns ignored).  Output per query: n_exact, n_approx, n_common
    and recall = n_common / n_exact (ground-truth-relative, so short
    exact lists near corpus edges don't distort the metric).  Queries
    the approximate index returned nothing for still appear (recall 0)
    — silent candidate starvation is exactly what this measures.

    Cross-engine exact: counts are integers; recall is one double
    division on identical operands.  Scale shape: two per-query count
    aggregations plus one equi-join on (query, neighbor) — all keyed by
    query_id, trivially small next to the top-k computations themselves.
    """
    ex = exact.select(F.col(query_col).alias("__q"), F.col(neighbor_col).alias("__n"))
    ap = approx.select(F.col(query_col).alias("__q"), F.col(neighbor_col).alias("__n"))
    n_exact = ex.groupBy("__q").agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    n_approx = ap.groupBy("__q").agg(F.count(F.lit(1)).cast("long").alias("n_approx"))
    n_common = (
        ex.join(ap, ["__q", "__n"])
        .groupBy("__q")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        n_exact.join(n_approx, "__q", "left")
        .join(n_common, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            "n_exact",
            F.coalesce("n_approx", F.lit(0)).alias("n_approx"),
            F.coalesce("n_common", F.lit(0)).alias("n_common"),
            (
                F.coalesce("n_common", F.lit(0)).cast("double")
                / F.col("n_exact").cast("double")
            ).alias("recall"),
        )
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: compare only within matching LSH buckets
    (signature + all 1-bit-flip probes).  Recall grows with probes;
    cost is corpus_bucket_size x queries instead of corpus x queries.
    """
    import numpy as np

    dim = len(corpus.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(num_planes, dim))

    def sig_col(vec):
        # literal expressions for small plane sets, broadcast+pandas-UDF
        # beyond LITERAL_BUDGET (functions/vectors.py)
        return hyperplane_signature(vec, planes)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("corpus_vec"),
        norm(F.col(vec_col)).alias("cn"),
        sig_col(F.col(vec_col)).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        norm(F.col(vec_col)).alias("qn"),
        sig_col(F.col(vec_col)).alias("qsig"),
    )
    probes = F.array(*([F.col("qsig")] + [F.col("qsig").bitwiseXOR(F.lit(1 << i)) for i in range(num_planes)]))
    q_probed = q.select("query_id", "query_vec", "qn", F.explode(probes).alias("bucket"))
    scored = (
        c.join(F.broadcast(q_probed), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cos_precomputed(), 6).alias("cosine_sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def _lloyd_kmeans(X, k: int, seed: int, iters: int = 20):
    """Seeded k-means++ init + Lloyd iterations on a driver-side sample.
    Deterministic for a fixed sample; empty cells re-seed to the farthest
    point so exactly k centroids come back."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n = X.shape[0]
    # k-means++ seeding; once every point is a centroid (k >= n) the
    # remaining mass is zero — fall back to uniform picks (duplicate
    # centroids are fine: argmin tie-break and the empty-cell reseed
    # both handle them)
    centroids = [X[rng.integers(n)]]
    d2 = ((X - centroids[0]) ** 2).sum(1)
    for _ in range(1, k):
        total = d2.sum()
        if total > 0:
            centroids.append(X[rng.choice(n, p=d2 / total)])
        else:
            centroids.append(X[rng.integers(n)])
        d2 = np.minimum(d2, ((X - centroids[-1]) ** 2).sum(1))
    C = np.array(centroids)
    for _ in range(iters):
        d = (X * X).sum(1, keepdims=True) - 2.0 * (X @ C.T) + (C * C).sum(1)
        assign = d.argmin(1)
        # group members by stable argsort instead of k boolean masks
        # (O(n log n) once vs O(k*n)); each slice lists the cluster's
        # rows in ascending index order — the same rows in the same
        # order X[assign == ci] yields, so the pairwise-summation mean
        # is bit-identical to the masked version this replaces.
        order = np.argsort(assign, kind="stable")
        bounds = np.searchsorted(assign[order], np.arange(k + 1))
        reseed = None
        for ci in range(k):
            lo, hi = bounds[ci], bounds[ci + 1]
            if hi > lo:
                C[ci] = X[order[lo:hi]].mean(0)
            else:
                if reseed is None:
                    reseed = X[d.min(1).argmax()]
                C[ci] = reseed
    return C


def _train_coarse_quantizer(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_lists: int,
    seed: int,
    train_sample: int,
):
    """Bounded deterministic hash-sample of the corpus -> driver-side
    seeded Lloyd.  Deterministic for a fixed corpus regardless of its
    partitioning: the sample is id-ORDERED before training — without
    that, collect() returns partition order and the seeded k-means
    init (hence every centroid) silently depends on the physical
    layout."""
    total = corpus.count()
    sample = corpus
    if total > train_sample:
        # keep ids whose 32-bit hash falls under the target fraction
        frac_mod = max(int(total / train_sample), 1)
        sample = corpus.filter(
            F.pmod(F.hash(F.col(id_col)), F.lit(frac_mod)) == 0
        )
    X = _collect_id_sorted(sample, id_col, vec_col)
    return _lloyd_kmeans(X, n_lists, seed)


def _collect_id_sorted(sample: DataFrame, id_col: str, vec_col: str):
    """collect() then sort driver-side by id — the same matrix an
    ``orderBy(id).collect()`` yields (ids are unique), WITHOUT the
    range-partitioned sort: on a vanilla 200-shuffle-partition session
    the orderBy costs two extra jobs (range sampling + 200-task sort)
    that dominate a bounded-sample collect (the q57 driver-bench
    regression)."""
    import numpy as np

    rows = sample.select(id_col, vec_col).collect()
    rows.sort(key=lambda r: r[0])
    return np.array([r[1] for r in rows], dtype=np.float64)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 3,
    seed: int = 42,
    train_sample: int = 100_000,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a coarse quantizer
    partitions the corpus into ``n_lists`` cells; each query scans only
    its ``n_probe`` nearest cells.

    Scale shape (FAISS-style): the coarse quantizer trains on a bounded
    deterministic hash-sample of at most ``train_sample`` vectors — a
    coarse quantizer does not improve past ~256 x n_lists training points,
    so a full-corpus distributed KMeans would be pure waste at 100 TB.
    Centroids broadcast to executors (literal or pandas-UDF per
    LITERAL_BUDGET); corpus cell assignment is a narrow map; the probe
    join is an equi-join on cell id, so per-query work is
    n_probe/n_lists of the corpus instead of all of it.  At 100 TB the
    corpus side would additionally be written bucketed by cell id so
    repeated query batches skip the assignment scan.
    """
    centroids = _train_coarse_quantizer(
        corpus, id_col, vec_col, n_lists, seed, train_sample
    )

    def nearest_cells(vcol, n: int):
        """array of the n nearest centroid ids by squared L2 — literal
        column expressions under LITERAL_BUDGET, broadcast+pandas-UDF
        above (functions/vectors.py)."""
        return nearest_centroids(vcol, centroids, n)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("corpus_vec"),
        norm(F.col(vec_col)).alias("cn"),
        F.element_at(nearest_cells(F.col(vec_col), 1), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        norm(F.col(vec_col)).alias("qn"),
        F.explode(nearest_cells(F.col(vec_col), n_probe)).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cos_precomputed(), 6).alias("cosine_sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def _plane_sig_expr(planes, vec_col: str):
    return hyperplane_signature(F.col(vec_col), planes)


def save_lsh_index(
    corpus: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 6,
    seed: int = 42,
) -> None:
    """Materialize an ANN index: the corpus written PARTITIONED BY its
    LSH signature, so repeated query batches prune the scan to their
    probe buckets (Hive-style partition pruning — at 100 TB a query
    batch touching 7 of 64 buckets reads ~11% of the data and computes
    zero corpus signatures).  Plane set derives from (seed, num_planes,
    dim) and is re-derived at query time — nothing to store."""
    import numpy as np

    dim = len(corpus.select(vec_col).first()[0])
    planes = np.random.default_rng(seed).normal(size=(num_planes, dim))
    (
        corpus.select(
            id_col,
            vec_col,
            # persist the norm so query time pays one dot per pair
            norm(F.col(vec_col)).alias("nrm"),
            _plane_sig_expr(planes, vec_col).alias("sig"),
        )
        .write.mode("overwrite")
        .partitionBy("sig")
        .parquet(path)
    )


def lsh_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Query a saved LSH index.  Query vectors are collected (the query
    batch is the small/broadcast side by construction), their probe
    buckets (signature + 1-bit flips) computed driver-side, and the index
    scan filtered to exactly those partitions — check .explain for
    PartitionFilters.  Results match lsh_bucketed_topk on the same
    corpus/params (pinned by test)."""
    import numpy as np

    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        raise ValueError("lsh_index_topk: empty query batch")
    dim = len(q_rows[0][vec_col])
    planes = np.random.default_rng(seed).normal(size=(num_planes, dim))

    from patternly_spark.functions.vectors import LITERAL_BUDGET

    use_matmul = planes.size > LITERAL_BUDGET
    probe_rows = []
    all_buckets: set[int] = set()
    for r in q_rows:
        v = np.asarray(r[vec_col], dtype=np.float64)
        sig = 0
        for i, p in enumerate(planes):
            if use_matmul:
                # index was written by the pandas-UDF path -> numpy dot
                acc = float(v @ p)
            else:
                # same left-fold the Spark expression uses -> identical sign
                acc = 0.0
                for a, b in zip(v, p):
                    acc += float(a) * float(b)
            sig += (1 if acc >= 0 else 0) << i
        probes = [sig] + [sig ^ (1 << i) for i in range(num_planes)]
        all_buckets.update(probes)
        for b in probes:
            probe_rows.append((int(r[id_col]), list(map(float, r[vec_col])), int(b)))

    probed = local_rows(
        spark, probe_rows, "query_id long, query_vec array<double>, sig int"
    )
    index = spark.read.parquet(path).filter(F.col("sig").isin(sorted(all_buckets)))
    # older indexes predate the persisted norm column
    corpus_nrm = F.col("nrm") if "nrm" in index.columns else norm(F.col(vec_col))
    scored = (
        index.join(F.broadcast(probed), "sig")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(
                dot(F.col("query_vec"), F.col(vec_col))
                / (norm(F.col("query_vec")) * corpus_nrm),
                6,
            ).alias("cosine_sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def save_ivf_index(
    corpus: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    seed: int = 42,
    train_sample: int = 100_000,
) -> None:
    """Materialize an IVF index: train the coarse quantizer (bounded
    sample + driver Lloyd), then write the corpus PARTITIONED BY its cell
    id with the per-vector norm precomputed.  Repeated query batches then
    prune the scan to their n_probe cells (Hive-style partition pruning)
    and pay one dot per candidate — the at-scale complement to the
    per-call ``ivf_topk``.  Centroids are persisted next to the data so
    query time re-derives nothing."""
    import json as _json

    centroids = _train_coarse_quantizer(
        corpus, id_col, vec_col, n_lists, seed, train_sample
    )
    (
        corpus.select(
            id_col,
            vec_col,
            norm(F.col(vec_col)).alias("nrm"),
            F.element_at(nearest_centroids(F.col(vec_col), centroids, 1), 1).alias("cell"),
        )
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    with open(f"{path}/_ivf_centroids.json", "w") as f:
        _json.dump({"seed": seed, "centroids": centroids.tolist()}, f)


def ivf_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 3,
) -> DataFrame:
    """Query a saved IVF index.  Query vectors are collected (the query
    batch is the small side by construction), their n_probe nearest cells
    computed driver-side from the persisted centroids, and the index scan
    filtered to exactly those partitions (check .explain for
    PartitionFilters).  Results match ``ivf_topk`` with the same
    (n_lists, seed, train_sample) on the same corpus."""
    import json as _json

    import numpy as np

    with open(f"{path}/_ivf_centroids.json") as f:
        centroids = np.asarray(_json.load(f)["centroids"], dtype=np.float64)

    q_rows = queries.select(id_col, vec_col).collect()
    if not q_rows:
        raise ValueError("ivf_index_topk: empty query batch")

    probe_rows = []
    all_cells: set[int] = set()
    for r in q_rows:
        v = np.asarray(r[vec_col], dtype=np.float64)
        d = ((centroids - v) ** 2).sum(1)
        cells = np.argsort(d, kind="stable")[:n_probe]
        all_cells.update(int(c) for c in cells)
        for c in cells:
            probe_rows.append((int(r[id_col]), list(map(float, r[vec_col])), int(c)))

    probed = local_rows(
        spark, probe_rows, "query_id long, query_vec array<double>, cell int"
    )
    index = spark.read.parquet(path).filter(F.col("cell").isin(sorted(all_cells)))
    corpus_nrm = F.col("nrm") if "nrm" in index.columns else norm(F.col(vec_col))
    scored = (
        index.join(F.broadcast(probed), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(
                dot(F.col("query_vec"), F.col(vec_col))
                / (norm(F.col("query_vec")) * corpus_nrm),
                6,
            ).alias("cosine_sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the memory-compression scale path for ANN.
# A 64-dim float vector is 256 bytes; its PQ code is m bytes (m=8 here) —
# a 100 TB embedding corpus becomes ~3 TB of codes that fit hot storage,
# and the ADC scan reads ONLY the code column (column pruning does the
# rest).  FAISS's IVF-PQ = ivf_topk's cell routing + these codes; both
# compose (filter the code scan by cell id).
# ---------------------------------------------------------------------------


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 3,
    m: int = 8,
    n_codes: int = 256,
    seed: int = 42,
    train_sample: int = 100_000,
) -> DataFrame:
    """IVF-PQ approximate top-k — the FAISS ``IndexIVFPQ`` shape, and
    the memory/scan end-point of the ANN family at 100 TB: a coarse
    quantizer restricts each query to ``n_probe`` of ``n_lists`` cells
    (IVF), and within cells the scan reads ``m``-byte PQ codes of the
    RESIDUAL (vector minus its cell centroid) instead of float vectors.

    Training is driver-side on one bounded deterministic hash-sample
    (coarse centroids, then per-subspace residual codebooks — neither
    improves past ~256x their cell/code count, so distributed training
    would be waste).  The corpus pass is ONE Arrow-batched UDF emitting
    (cell, codes) per vector — at scale this runs once and persists,
    bucketed by cell.  Per query the driver builds one ADC
    lookup-table per probed cell from the query residual; scoring is a
    broadcast equi-join on cell + m array lookups per row — scan cost
    n_probe/n_lists of the corpus, no float vectors read, one final
    top-k shuffle.

    Output: (query_id, neighbor_id, approx_dist, rank) — ADC estimate of
    squared L2, lower = closer.  Approximate and centroid-dependent, so
    verified by recall-vs-exact tests rather than a SQL oracle (the
    q57/q97 family policy).
    """
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    centroids = np.asarray(
        _train_coarse_quantizer(corpus, id_col, vec_col, n_lists, seed, train_sample),
        dtype=np.float64,
    )
    dim = centroids.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m

    # residual codebooks from the same bounded-sample policy
    total = corpus.count()
    sample = corpus
    if total > train_sample:
        frac_mod = max(int(total / train_sample), 1)
        sample = corpus.filter(
            F.pmod(F.hash(F.col(id_col)), F.lit(frac_mod)) == 0
        )
    # id-ordered (driver-side sort): see _collect_id_sorted
    X = _collect_id_sorted(sample, id_col, vec_col)
    d2 = (X * X).sum(1, keepdims=True) - 2.0 * (X @ centroids.T) + (centroids * centroids).sum(1)
    R = X - centroids[np.argmin(d2, axis=1)]
    codebooks = np.stack(
        [_lloyd_kmeans(R[:, j * dsub:(j + 1) * dsub], n_codes, seed + j) for j in range(m)]
    )

    @pandas_udf("cell int, codes array<int>")
    def _assign(vs: pd.Series) -> pd.DataFrame:
        V = np.vstack(vs.to_numpy()).astype(np.float64)
        dc = (V * V).sum(1, keepdims=True) - 2.0 * (V @ centroids.T) + (centroids * centroids).sum(1)
        cell = np.argmin(dc, axis=1)
        res = V - centroids[cell]
        cols = []
        for j in range(m):
            S = res[:, j * dsub:(j + 1) * dsub]
            C = codebooks[j]
            d = (S * S).sum(1, keepdims=True) - 2.0 * (S @ C.T) + (C * C).sum(1)
            cols.append(np.argmin(d, axis=1))
        codes = np.stack(cols, axis=1).astype("int32")
        return pd.DataFrame(
            {"cell": cell.astype("int32"), "codes": [row.tolist() for row in codes]}
        )

    encoded = corpus.select(
        F.col(id_col).alias("neighbor_id"), _assign(F.col(vec_col)).alias("e")
    ).select("neighbor_id", F.col("e.cell").alias("cell"), F.col("e.codes").alias("codes"))

    # driver-side probe tables: one ADC table per (query, probed cell),
    # grouped by cell for the kernel (cell -> [(query_id, (m, n_codes)
    # table), ...]).  Broadcast in the closure — n_probe*Q tables of
    # m*n_codes doubles.
    qrows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    probes: dict[int, list] = {}
    for r in qrows:
        qv = np.asarray(r[1], dtype=np.float64)
        dcq = ((centroids - qv) ** 2).sum(1)
        for cell in np.argsort(dcq, kind="stable")[:n_probe]:
            rq = qv - centroids[cell]
            tab = np.stack(
                [
                    ((codebooks[j] - rq[j * dsub:(j + 1) * dsub]) ** 2).sum(1)
                    for j in range(m)
                ]
            )
            probes.setdefault(int(cell), []).append((int(r[0]), tab))

    # Arrow kernel replacing the broadcast-join + interpreted-fold +
    # full-shuffle window (see pq_topk for the rationale): per batch,
    # rows of each probed cell are scored with numpy LUT lookups in the
    # identical left-fold addition order, each query keeps a per-batch
    # local top-k over all its probed cells, and only parts*Q*k rows
    # reach the final window — partition-count-insensitive.
    def _score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            C = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            per_q: dict[int, list] = {}
            for cell in np.unique(cells):
                entries = probes.get(int(cell))
                if not entries:
                    continue
                mask = cells == cell
                ids_c, C_c = ids[mask], C[mask]
                for qid, tab in entries:
                    D = np.zeros(len(ids_c))
                    for j in range(m):
                        D += tab[j][C_c[:, j]]
                    per_q.setdefault(qid, []).append((ids_c, D))
            out_q, out_n, out_d = [], [], []
            for qid, chunks in per_q.items():
                iq = np.concatenate([c[0] for c in chunks])
                dq = np.concatenate([c[1] for c in chunks])
                keep = iq != qid
                iq, dq = iq[keep], dq[keep]
                sel = np.lexsort((iq, dq))[:k]
                out_q.append(np.full(len(sel), qid, dtype=np.int64))
                out_n.append(iq[sel])
                out_d.append(dq[sel])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q) if out_q else [],
                    "neighbor_id": np.concatenate(out_n) if out_n else [],
                    "approx_dist": np.concatenate(out_d) if out_d else [],
                }
            )

    local = encoded.mapInPandas(
        _score, schema="query_id long, neighbor_id long, approx_dist double"
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_dist"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "approx_dist", "rank")
    )


def train_pq_codebooks(
    corpus: DataFrame,
    *,
    m: int = 8,
    n_codes: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    train_sample: int = 100_000,
):
    """Per-subspace k-means codebooks: (m, n_codes, dim/m) ndarray.

    Trains on a bounded deterministic hash-sample (same policy as the IVF
    coarse quantizer: codebooks don't improve past ~256 x n_codes points,
    so full-corpus training would be waste).  dim must divide by m.

    ``n_codes`` defaults to 256 — the FAISS-standard 8 bits per
    subquantizer.  Fewer bits matter: on near-uniform high-dimensional
    corpora (nearest neighbor barely closer than the median pair, e.g.
    the synthetic testdata embeddings) 4-bit codebooks put the PQ
    reconstruction error at the scale of the inter-point spread and
    rank-1 recall collapses to ~0; 8 bits recovers it (measured
    0/10 -> 7/10 on the sf0.01 embeddings).  Clustered/lower-intrinsic-
    dim data tolerates fewer bits.
    """
    import numpy as np

    dim = len(corpus.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    total = corpus.count()
    sample = corpus
    if total > train_sample:
        frac_mod = max(int(total / train_sample), 1)
        sample = corpus.filter(
            F.pmod(F.hash(F.col(id_col)), F.lit(frac_mod)) == 0
        )
    # id-ordered (driver-side sort): see _collect_id_sorted
    # (partition-order collects make the codebooks depend on physical
    # layout)
    X = _collect_id_sorted(sample, id_col, vec_col)
    dsub = dim // m
    return np.stack(
        [
            _lloyd_kmeans(X[:, j * dsub : (j + 1) * dsub], n_codes, seed + j)
            for j in range(m)
        ]
    )


def pq_encode(
    corpus: DataFrame,
    codebooks,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id_col, codes array<int> length m): nearest codeword per
    subspace.  Encoding is a narrow map (nearest_centroids literal
    expressions per subspace, pandas-UDF past LITERAL_BUDGET); at scale
    this runs once per corpus and the codes are persisted, so queries
    never touch the float vectors again.
    """
    import numpy as np

    codebooks = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, dsub = codebooks.shape
    if m * n_codes * dsub <= 512:
        # small codebooks: stay JVM-side with literal expressions
        code_cols = [
            F.element_at(
                nearest_centroids(
                    F.slice(F.col(vec_col), j * dsub + 1, dsub), codebooks[j], 1
                ),
                1,
            )
            for j in range(m)
        ]
        return corpus.select(F.col(id_col), F.array(*code_cols).alias("codes"))

    # past that, ONE Arrow-batched UDF encoding every subspace beats the
    # m x n_codes x dsub literal expression tree by ~10x (measured at
    # 8x16x8: codegen evaluates 128 fold subtrees per row; here it is m
    # small matmuls per batch).  np.argmin's first-min tie-break matches
    # the literal path's (dist, cell) ascending sort.
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def _codes(vs: pd.Series) -> pd.Series:
        X = np.vstack(vs.to_numpy()).astype(np.float64)
        cols = []
        for j in range(m):
            S = X[:, j * dsub : (j + 1) * dsub]
            C = codebooks[j]
            d = (S * S).sum(1, keepdims=True) - 2.0 * (S @ C.T) + (C * C).sum(1)
            cols.append(np.argmin(d, axis=1))
        out = np.stack(cols, axis=1).astype("int32")
        return pd.Series([row.tolist() for row in out])

    return corpus.select(F.col(id_col), _codes(F.col(vec_col)).alias("codes"))


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes.

    Per query the driver precomputes the (m x n_codes) table of squared
    L2 distances from the query's subvectors to every codeword; the scan
    then scores each corpus row with m array lookups — no float vectors
    read, no shuffle until the final per-query top-k window.

    Output: (query_id, neighbor_id, approx_dist, rank) — approx_dist is
    the ADC estimate of squared L2 distance (lower = closer).
    """
    import numpy as np

    codebooks = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, dsub = codebooks.shape
    qrows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    qids = np.array([int(r[0]) for r in qrows], dtype=np.int64)
    # (Q, m, n_codes) ADC tables, broadcast in the kernel closure (tiny:
    # Q*m*n_codes doubles).
    T = np.stack(
        [
            np.stack(
                [
                    ((codebooks[j] - np.asarray(r[1], np.float64)[j * dsub : (j + 1) * dsub]) ** 2).sum(1)
                    for j in range(m)
                ]
            )
            for r in qrows
        ]
    ) if qrows else np.zeros((0, m, n_codes))
    nq = len(qids)

    # Arrow kernel: vectorized LUT scoring + per-batch local top-k.  The
    # interpreted F.aggregate fold this replaces evaluated m element_at
    # chains per (row x query) on a crossJoin-exploded intermediate and
    # then shuffled ALL of it into a window — cost scaled with
    # spark.sql.shuffle.partitions (the q57 driver-bench regression).
    # Here the scan is narrow, per-batch numpy fancy-indexing replays the
    # identical left-fold addition order (D starts at 0.0 and adds
    # tab[j] in j order — bit-equal doubles), and only parts*Q*k rows
    # reach the final window.
    def _score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            C = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            D = np.zeros((nq, len(ids)))
            for j in range(m):
                D += T[:, j, :][:, C[:, j]]
            out_q, out_n, out_d = [], [], []
            for qi in range(nq):
                mask = ids != qids[qi]
                dq, iq = D[qi][mask], ids[mask]
                sel = np.lexsort((iq, dq))[:k]
                out_q.append(np.full(len(sel), qids[qi], dtype=np.int64))
                out_n.append(iq[sel])
                out_d.append(dq[sel])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q) if out_q else [],
                    "neighbor_id": np.concatenate(out_n) if out_n else [],
                    "approx_dist": np.concatenate(out_d) if out_d else [],
                }
            )

    local = codes.select(F.col(id_col), "codes").mapInPandas(
        _score, schema="query_id long, neighbor_id long, approx_dist double"
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_dist"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "approx_dist", "rank")
    )



def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    pool: int = 12,
    lam_tenths: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein 1998) — the re-ranker between retrieval and a context
    window: plain top-k hands the LLM ``k`` near-duplicates of the
    best hit; MMR greedily picks the candidate maximizing

        lam * rel(q, c)  -  (1 - lam) * max_{s in selected} sim(c, s)

    so each slot buys NEW information.  ``lam_tenths`` is lambda in
    tenths (7 = the standard 0.7).

    Cross-engine exact by construction: relevance and
    candidate-candidate cosines floor-quantize to the 2^-20 dyadic
    grid (the q24 convention, integer BIGINTs), and the MMR score is
    the pure-INTEGER form ``lam_tenths * rel_q - (10 - lam_tenths) *
    max_cc_q`` — no double ever enters a comparison, so the greedy
    argmax (ties: lowest candidate id) is bit-deterministic and a SQL
    engine replays the identical selection with ``k`` unrolled CTE
    steps.

    Scale shape: relevance is a broadcast of the (small) query set
    against the partition-parallel corpus — the only data-sized stage —
    with the pool cut ranked on the QUANTIZED relevance (so pool
    membership itself is engine-deterministic, not just the final
    order) and executed in two phases — a partition-parallel
    per-(query, partition) top-pool pre-cut, then a global top-pool
    over the <= pool x n_partitions survivors — so no single task ever
    sees a whole corpus for one query; everything after operates on
    |Q| * pool candidate rows and
    |Q| * pool^2 candidate-pair rows (both driver-visible constants by
    contract).  The greedy loop is k-1 keyed joins on tiny
    localCheckpoint-pinned relations, partition-parallel per query.

    Output: (query_id, rank, cand_id, score_q) — rank 1..k per query
    (fewer when the pool exhausts first: k > pool returns pool rows),
    score_q the integer MMR score at selection time (scale: 2^-20
    cosine units x 10).
    """
    if not 0 <= int(lam_tenths) <= 10:
        raise ValueError(f"lam_tenths must be in [0, 10], got {lam_tenths}")
    lam = int(lam_tenths)
    grid = float(1 << 20)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("vn"),
    )
    rel_q = F.floor(
        dot(F.col("v"), F.col("qv")) / (F.col("vn") * F.col("qn")) * F.lit(grid)
    ).cast("long")
    pool_w = Window.partitionBy("query_id").orderBy(
        F.desc("rel_q"), F.asc("cand_id")
    )
    # two-phase pool cut: a single global row_number per query funnels
    # EVERY corpus row for that query into one task (a skew cliff at
    # large corpus x few queries).  Phase 1 keeps the top-pool per
    # (query, corpus-partition) — fully partition-parallel, and a
    # guaranteed superset of the global top-pool under the same strict
    # (rel_q desc, cand_id asc) total order (cand_id is unique, so the
    # cut is exact, not approximate).  Phase 2's global window then
    # ranks only <= pool x n_partitions rows per query.
    pre_w = Window.partitionBy("query_id", "__pid").orderBy(
        F.desc("rel_q"), F.asc("cand_id")
    )
    cand = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", "v", "vn", rel_q.alias("rel_q"))
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__p", F.row_number().over(pre_w))
        .filter(F.col("__p") <= int(pool))
        .drop("__pid", "__p")
        .withColumn("__r", F.row_number().over(pool_w))
        .filter(F.col("__r") <= int(pool))
        .drop("__r")
        .localCheckpoint(eager=True)
    )
    a = cand.select("query_id", F.col("cand_id").alias("a"), F.col("v").alias("va"), F.col("vn").alias("na"))
    bset = cand.select("query_id", F.col("cand_id").alias("b"), F.col("v").alias("vb"), F.col("vn").alias("nb"))
    cc = (
        a.join(bset, "query_id")
        .filter(F.col("a") != F.col("b"))
        .select(
            "query_id",
            "a",
            "b",
            F.floor(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")) * F.lit(grid)
            )
            .cast("long")
            .alias("cc_q"),
        )
        .localCheckpoint(eager=True)
    )
    relq = cand.select("query_id", "cand_id", "rel_q")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_q"), F.asc("cand_id")
    )
    first = (
        relq.withColumn("score_q", F.col("rel_q") * F.lit(lam))
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select("query_id", F.lit(1).alias("rank"), "cand_id", "score_q")
    )
    selected = first.localCheckpoint(eager=True)
    for step in range(2, int(k) + 1):
        remaining = relq.join(
            selected.select("query_id", "cand_id"), ["query_id", "cand_id"], "left_anti"
        )
        maxcc = (
            cc.join(
                selected.select("query_id", F.col("cand_id").alias("b")),
                ["query_id", "b"],
            )
            .groupBy("query_id", "a")
            .agg(F.max("cc_q").alias("max_cc_q"))
        )
        scored = remaining.join(
            maxcc,
            (remaining["query_id"] == maxcc["query_id"])
            & (remaining["cand_id"] == maxcc["a"]),
        ).select(
            remaining["query_id"],
            "cand_id",
            (F.col("rel_q") * F.lit(lam) - F.col("max_cc_q") * F.lit(10 - lam)).alias(
                "score_q"
            ),
        )
        pick = (
            scored.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") == 1)
            .select("query_id", F.lit(step).alias("rank"), "cand_id", "score_q")
        )
        selected = selected.unionByName(pick).localCheckpoint(eager=True)
    return selected
