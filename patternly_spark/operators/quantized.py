"""Compressed-embedding search: int8 scalar quantization, binary sign
sketches with Hamming-prefilter rerank, and matryoshka truncation
evaluation.

Why this family exists: at 100 TB an `array<float>` embedding column is
often the single largest column in the corpus (64-dim float = 256 B/row;
a 1e11-row corpus carries ~25 TB of floats).  Production vector search
ships compressed representations instead:

- ``int8_quantize``       : 4x smaller (absmax per-vector scalar
                            quantization, the sentence-transformers /
                            faiss SQ8 scheme).  Quantized cosine needs
                            ONLY the integer codes — the per-vector
                            scales cancel out of the ratio — so search
                            over int8 codes is exact integer arithmetic
                            and engine-portable bit-for-bit.
- ``sign_pack``           : 32x smaller (1 bit/dim packed into LONGs);
                            Hamming distance via xor+bit_count is the
                            cheapest possible candidate generator.
- ``hamming_rerank_topk`` : the standard two-stage ANN: Hamming top-C
                            prefilter over packed bits, exact cosine
                            rerank of the C candidates.  Cost per query
                            drops from O(N·dim) float ops to O(N) xor
                            ops + O(C·dim) float ops.
- ``truncated_topk`` /
  ``matryoshka_recall``   : evaluate how much recall survives keeping
                            only the first d dims (matryoshka
                            representation learning) — the acceptance
                            gate before truncating a corpus's embedding
                            column at rest.

Scale notes: every search here is the broadcast-queries x corpus-scan
shape of ``similarity.cosine_topk`` — the corpus side never shuffles;
per-partition window rank keeps only k (or C) rows per query moving.
Reference parity: the reference engine has no compressed-vector search;
this extends SURVEY.md §2.12 (training-data pipeline: similarity
search) with the standard compression ladder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from patternly_spark.functions.vectors import dot, norm

__all__ = [
    "int8_quantize",
    "int8_topk",
    "mutual_knn",
    "sign_pack",
    "hamming_rerank_topk",
    "truncated_topk",
    "matryoshka_recall",
]


def int8_quantize(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: list[str] | None = None,
) -> DataFrame:
    """Per-vector absmax int8 quantization: ``scale = max|x| / 127``,
    ``code_i = floor(x_i/scale + 0.5)`` (round-half-up via floor, the
    same closed form on every engine — no banker's/away-from-zero
    divergence).  Output: (id, scale DOUBLE, codes ARRAY<INT>).

    Codes are exactly representable in int8 (|code| <= 127 by
    construction); they are carried as INT because integer dot products
    of codes are the unit the search path consumes.  All-zero vectors
    get scale=1 (codes all zero) rather than a 0/0.

    One narrow projection, no shuffle: at 100 TB this is a map-only
    column rewrite that parquet-compresses ~4x smaller than the float
    column it replaces.
    """
    v = F.col(vec_col)
    absmax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    # guard on the QUOTIENT, not absmax: a subnormal absmax (< ~1e-321)
    # underflows absmax/127 to exactly 0.0, which would divide by zero
    # downstream (hypothesis found this; the all-zero vector shares the path)
    scale = F.when(absmax / F.lit(127.0) > 0.0, absmax / F.lit(127.0)).otherwise(
        F.lit(1.0)
    )
    cols = [F.col(id_col)] + [F.col(c) for c in (keep or [])]
    return (
        df.select(*cols, scale.alias("scale"), v.alias("__v"))
        .withColumn(
            "codes",
            F.transform(
                F.col("__v"),
                lambda x: F.floor(x.cast("double") / F.col("scale") + F.lit(0.5)).cast("int"),
            ),
        )
        .drop("__v")
    )


def _int_dot(a, b) -> "F.Column":
    """Integer dot product of two code arrays (exact: 64 dims x 127^2
    stays far below 2^53, so even a DOUBLE-summing engine is exact)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def int8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact top-k by cosine **computed over int8 codes**.  The
    per-vector scales cancel out of cosine(scale_a*qa, scale_b*qb), so
    the similarity is ``dot_int(qa,qb) / (sqrt(dot_int(qa,qa)) *
    sqrt(dot_int(qb,qb)))`` — integer sums + one sqrt/divide, exact on
    every engine regardless of fold order.

    Output: (query_id, neighbor_id, qcosine, rank) — the compressed
    twin of ``similarity.cosine_topk`` (same shape: broadcast queries,
    corpus-side scan, per-partition rank; only k rows/query shuffle).
    """
    qz = int8_quantize(queries, id_col=id_col, vec_col=vec_col)
    cz = int8_quantize(corpus, id_col=id_col, vec_col=vec_col)
    q = qz.select(
        F.col(id_col).alias("query_id"),
        F.col("codes").alias("qc"),
        F.sqrt(_int_dot(F.col("codes"), F.col("codes")).cast("double")).alias("qn"),
    )
    c = cz.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("codes").alias("cc"),
        F.sqrt(_int_dot(F.col("codes"), F.col("codes")).cast("double")).alias("cn"),
    )
    sim = _int_dot(F.col("qc"), F.col("cc")).cast("double") / (F.col("qn") * F.col("cn"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("qcosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qcosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "qcosine", "rank")
    )


def sign_pack(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: list[str] | None = None,
) -> DataFrame:
    """Binary sign sketch: 32 dims packed per LONG word (dim ``32w + j``
    contributes bit ``31 - j`` of word ``w`` — a big-endian fold, the
    one packing a sequential ``acc*2 + bit`` reduction produces without
    shift primitives).  Output: (id, sig ARRAY<LONG>) — ceil(dim/32)
    longs per vector (a 64-dim corpus carries TWO longs: 16x smaller
    than float32).

    Hamming distance between two sketches = popcount(xor) summed over
    words — identical to counting dims whose signs disagree, which is
    the closed form an external SQL oracle replays without bit packing.
    32 bits per word keeps the fold's ``acc*2`` far from LONG overflow
    (ANSI-safe).
    """
    v = F.col(vec_col)
    bits = F.zip_with(
        v,
        F.sequence(F.lit(0), F.size(v) - 1),
        lambda x, i: F.struct(x.alias("x"), i.alias("i")),
    )
    n_words = F.floor((F.size(v) + 31) / F.lit(32)).cast("int")
    sig = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda w_: F.aggregate(
            F.filter(bits, lambda s: F.floor(s["i"] / 32).cast("int") == w_),
            F.lit(0).cast("long"),
            lambda acc, s: acc * F.lit(2).cast("long")
            + F.when(s["x"] >= 0.0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")),
        ),
    )
    cols = [F.col(id_col)] + [F.col(c) for c in (keep or [])]
    return df.select(*cols, sig.alias("sig"))


def _hamming(a, b) -> "F.Column":
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def hamming_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    candidates: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Two-stage ANN: Hamming top-``candidates`` prefilter over packed
    sign bits, exact cosine rerank of the survivors.

    Stage 1 scans xor+popcount over one long per 64 dims — the cheapest
    candidate generator there is (no float math, no bucket tuning, no
    recall cliff from empty buckets).  Stage 2 re-scores ``candidates``
    rows per query with full-precision cosine.  Both stages are
    broadcast-queries x corpus-scan with per-partition window rank:
    corpus never shuffles, C rows per query move.

    Deterministic: prefilter ties break on neighbor_id; rerank ties on
    neighbor_id.  Output: (query_id, neighbor_id, hamming, cosine_sim,
    rank).
    """
    qs = sign_pack(queries, id_col=id_col, vec_col=vec_col, keep=[vec_col]).select(
        F.col(id_col).alias("query_id"),
        F.col("sig").alias("qsig"),
        F.col(vec_col).alias("query_vec"),
        norm(F.col(vec_col)).alias("qn"),
    )
    cs = sign_pack(corpus, id_col=id_col, vec_col=vec_col, keep=[vec_col]).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("sig").alias("csig"),
        F.col(vec_col).alias("corpus_vec"),
        norm(F.col(vec_col)).alias("cn"),
    )
    pre = (
        cs.crossJoin(F.broadcast(qs))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("hamming", _hamming(F.col("qsig"), F.col("csig")))
    )
    wpre = Window.partitionBy("query_id").orderBy(F.asc("hamming"), F.asc("neighbor_id"))
    cand = pre.withColumn("__c", F.row_number().over(wpre)).filter(F.col("__c") <= candidates)
    sim = dot(F.col("query_vec"), F.col("corpus_vec")) / (F.col("qn") * F.col("cn"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("cosine_sim", sim)
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "hamming", "cosine_sim", "rank")
    )


def truncated_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    trunc_dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k using only the FIRST ``trunc_dim`` dims of
    every vector (matryoshka truncation).  Same plan shape as
    ``cosine_topk``; the slice happens in the projection so the scan
    moves trunc_dim floats, not dim."""
    sl = lambda c: F.slice(F.col(c), 1, trunc_dim)  # noqa: E731
    q = queries.select(
        F.col(id_col).alias("query_id"),
        sl(vec_col).alias("query_vec"),
        norm(sl(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        sl(vec_col).alias("corpus_vec"),
        norm(sl(vec_col)).alias("cn"),
    )
    sim = dot(F.col("query_vec"), F.col("corpus_vec")) / (F.col("qn") * F.col("cn"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
    )


def matryoshka_recall(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    dims: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Micro-averaged recall@k of truncated-dim search against full-dim
    exact search, one row per truncation width: (trunc_dim, n_exact,
    n_common, recall).  ``recall = SUM(n_common)/SUM(n_exact)`` — two
    integer sums and one double division, engine-exact (per-query
    double averaging would be fold-order-sensitive; micro-averaging is
    not).

    This is the acceptance gate for truncating an embedding column at
    rest: run it on a sampled query set, pick the smallest dim whose
    recall clears the bar."""
    from patternly_spark.operators.similarity import cosine_topk

    exact = cosine_topk(corpus, queries, k=k, id_col=id_col, vec_col=vec_col).select(
        "query_id", "neighbor_id"
    )
    out = None
    for d in dims:
        ap = truncated_topk(
            corpus, queries, trunc_dim=d, k=k, id_col=id_col, vec_col=vec_col
        ).select("query_id", "neighbor_id")
        both = exact.join(ap, ["query_id", "neighbor_id"]).select(F.lit(d).alias("trunc_dim"))
        ex = exact.select(F.lit(d).alias("trunc_dim"))
        agg = (
            ex.groupBy("trunc_dim")
            .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
            .join(
                both.groupBy("trunc_dim").agg(
                    F.count(F.lit(1)).cast("long").alias("n_common")
                ),
                "trunc_dim",
                "left",
            )
        )
        out = agg if out is None else out.unionByName(agg)
    return out.select(
        "trunc_dim",
        "n_exact",
        F.coalesce("n_common", F.lit(0)).alias("n_common"),
        (
            F.coalesce("n_common", F.lit(0)).cast("double")
            / F.col("n_exact").cast("double")
        ).alias("recall"),
    )


def embedding_covariance(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed exact covariance of the int8-quantized embedding
    matrix — the statistic under PCA whitening, representation-drift
    monitoring, and ZCA preprocessing, computed the way distributed
    linear algebra should be: per-Arrow-batch partial Gram matrices
    C^T C in int64 (exact — |code| <= 127 so a 10^11-row corpus stays
    under 2^63 per cell), reduced by ONE groupBy over d*(d+1)/2 cell
    keys.  Nothing corpus-sized ever shuffles: each batch emits at most
    one d x d triangle (~2k rows at d=64).

    Quantized codes (not raw floats) keep every sum integer-exact and
    fold-order-free — the q135/q173 portability trade.

    Output (upper triangle, i <= j, 0-based dims):
    (i, j, n, gram, sum_i, sum_j, cov) where
    cov = (n*gram - sum_i*sum_j) / n^2 — the population covariance of
    the codes, every intermediate exact in int64, the final division
    deterministic IEEE.  (n*gram fits int64 up to n ~ 7e8 rows; past
    that, cast the final projection to DECIMAL(38,0) — the partial-Gram
    reduction itself is safe to ~5e17 rows per cell.)

    Eigen-decomposing the returned d x d (driver-side numpy — a 64x64
    problem) gives the whitening/ZCA transform; see
    ``whitening_matrix``.
    """
    import numpy as np
    import pandas as pd

    codes = int8_quantize(df, id_col=id_col, vec_col=vec_col).select("codes")

    def _partial(it):
        for pdf in it:
            if not len(pdf):
                continue
            C = np.array(pdf["codes"].tolist(), dtype=np.int64)
            G = C.T @ C
            s = C.sum(axis=0)
            d = C.shape[1]
            iu = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": iu[0].astype(np.int64),
                    "j": iu[1].astype(np.int64),
                    "gram": G[iu].astype(np.int64),
                    "si": s[iu[0]].astype(np.int64),
                    "sj": s[iu[1]].astype(np.int64),
                    "n": np.full(len(iu[0]), len(pdf), dtype=np.int64),
                }
            )

    parts = codes.mapInPandas(
        _partial, "i long, j long, gram long, si long, sj long, n long"
    )
    agg = parts.groupBy("i", "j").agg(
        F.sum("gram").alias("gram"),
        F.sum("si").alias("sum_i"),
        F.sum("sj").alias("sum_j"),
        F.sum("n").alias("n"),
    )
    return agg.select(
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


def whitening_matrix(cov_df: DataFrame, *, eps: float = 1e-6):
    """Driver-side PCA-whitening transform from ``embedding_covariance``
    output: W = diag(1/sqrt(eig+eps)) @ V^T of the d x d covariance — a
    64x64 eigenproblem, deliberately NOT distributed (shipping it to the
    cluster is overhead, the ``analysis.py`` X8 convention).  Returns
    (W, eigenvalues) as numpy arrays; apply with
    ``(codes - mean) @ W.T`` in any downstream kernel."""
    import numpy as np

    rows = cov_df.select("i", "j", "cov").collect()
    d = max(int(r["j"]) for r in rows) + 1
    S = np.zeros((d, d))
    for r in rows:
        S[int(r["i"]), int(r["j"])] = r["cov"]
        S[int(r["j"]), int(r["i"])] = r["cov"]
    vals, vecs = np.linalg.eigh(S)
    W = (vecs / np.sqrt(np.maximum(vals, 0.0) + eps)).T
    return W, vals


def mutual_knn(
    df: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
    candidates: DataFrame | None = None,
    max_exact_rows: int = 2_000_000,
) -> DataFrame:
    """Mutual k-nearest-neighbor graph over an embedding column: the
    pairs (a, b) where each is in the OTHER's exact top-k by quantized
    cosine — the reciprocal-NN criterion that underlies density-based
    embedding clustering and label-noise detection (mutual pairs are
    far more likely to be same-class than one-sided neighbors).

    Execution: the int8 code matrix is broadcast (numpy, via a Spark
    broadcast variable) and each corpus partition computes one float64
    GEMM block against it (exact over int8 codes), keeping only its
    rows' top-k — k rows per vector ever shuffle, and the mutual check
    is a self-join of that O(N*k) edge list on the reversed key.

    Scale contract: exact mode requires the code matrix to fit a
    broadcast (~(d+1)*4 bytes/vector — tens of millions of vectors).
    Beyond that bound, pass ``candidates=`` — any
    (query_id, neighbor_id[, ...]) relation, e.g. the output of
    ``ivf_topk`` / ``lsh_index_topk`` — and the corpus is NEVER
    collected: each candidate pair is scored by an equi-join to the
    vector relation (both sides), ranked per query among its candidates
    (same (-qcosine, neighbor_id) order as exact mode), and fed to the
    identical mutual self-join.  Candidate mode is exact iff the
    candidate set contains each vector's true top-k.  Zero vectors
    (undefined cosine) are excluded.

    ``max_exact_rows`` enforces the scale contract: exact mode counts
    the corpus first (one cheap job) and RAISES above the bound instead
    of silently collecting 10^8 vectors onto the driver — route big
    corpora through ``candidates=`` (ivf_topk / lsh_index_topk output).

    Output: (id_a, id_b, qcosine, rank_ab, rank_ba) with id_a < id_b —
    rank_ab is b's rank in a's list and vice versa; qcosine is the
    (symmetric) quantized cosine.
    """
    import numpy as np
    import pandas as pd

    kk = int(k)
    if candidates is not None:
        tk = _candidate_knn_edges(
            df, candidates, k=kk, id_col=id_col, vec_col=vec_col
        )
        return _mutual_join(tk, round_digits)

    # bounded probe, not a full count: limit(bound+1) stops scanning the
    # moment the bound is exceeded, so the guard costs one short job on
    # a huge corpus instead of a full pass
    over = df.limit(int(max_exact_rows) + 1).count() > int(max_exact_rows)
    if over:
        raise ValueError(
            f"mutual_knn exact mode collects the corpus to the driver and "
            f"this one exceeds max_exact_rows={int(max_exact_rows)}.  "
            f"Pass candidates= (ivf_topk / lsh_index_topk output) for "
            f"large corpora, or raise max_exact_rows explicitly if the "
            f"driver can hold it."
        )

    def _np_codes(vecs):
        """absmax int8 codes — the same closed form int8_quantize folds
        (floor(x/scale + 0.5), scale = absmax/127 guarded), so numpy and
        the column expression produce identical integers."""
        X = np.asarray(vecs, dtype=np.float64)
        amax = np.abs(X).max(axis=1)
        scale = np.where(amax / 127.0 > 0.0, amax / 127.0, 1.0)
        return np.floor(X / scale[:, None] + 0.5)

    # broadcast side: one narrow collect of raw vectors (bounded by the
    # scale contract), quantized driver-side — the column-expression
    # quantize is interpreted per element and costs seconds even at 2k
    # rows, while the numpy form is identical arithmetic
    vec_rows = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).collect()
    if not vec_rows:
        from patternly_spark.plans import empty_rows

        return empty_rows(
            df.sparkSession,
            "id_a long, id_b long, qcosine double, rank_ab int, rank_ba int",
        )
    ids_all = np.array([r["id"] for r in vec_rows], dtype=np.int64)
    C_all = _np_codes([r["v"] for r in vec_rows])
    n2_all = (C_all * C_all).sum(axis=1)
    keep = n2_all > 0
    ids_all, C_all = ids_all[keep], C_all[keep]
    norms_all = np.sqrt((C_all * C_all).sum(axis=1))
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((ids_all, C_all, norms_all))

    def _topk(it):
        b_ids, b_C, b_norm = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            Q = _np_codes(pdf["v"].tolist())
            qids = pdf["id"].to_numpy()
            qn2 = (Q * Q).sum(axis=1)
            qkeep = qn2 > 0
            if not qkeep.any():
                continue
            Q, qids = Q[qkeep], qids[qkeep]
            qnorm = np.sqrt((Q * Q).sum(axis=1))
            # dot / (sqrt(na)*sqrt(nb)) — the exact IEEE expression the
            # SQL oracle evaluates (NOT dot * inv * inv, which rounds
            # differently in the last ulp)
            S = (Q @ b_C.T) / np.outer(qnorm, b_norm)
            # exclude self; rank by (-qcosine, neighbor_id)
            self_mask = qids[:, None] == b_ids[None, :]
            S = np.where(self_mask, -np.inf, S)
            order = np.lexsort((b_ids[None, :].repeat(len(qids), 0), -S), axis=1)
            top = order[:, :kk]
            # top has min(kk, corpus_size) columns — a corpus smaller
            # than k must not desync the repeat/tile lengths
            kk_eff = top.shape[1]
            out_q = np.repeat(qids, kk_eff)
            out_n = b_ids[top].ravel()
            out_s = np.take_along_axis(S, top, axis=1).ravel()
            out_r = np.tile(np.arange(1, kk_eff + 1), len(qids))
            fin = np.isfinite(out_s)
            yield pd.DataFrame(
                {
                    "query_id": out_q[fin],
                    "neighbor_id": out_n[fin],
                    "qcosine": out_s[fin],
                    "rank": out_r[fin].astype(np.int32),
                }
            )

    tk = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).mapInPandas(_topk, "query_id long, neighbor_id long, qcosine double, rank int")
    return _mutual_join(tk, round_digits)


def _mutual_join(tk: DataFrame, round_digits: int | None) -> DataFrame:
    """Reciprocal filter over a (query_id, neighbor_id, qcosine, rank)
    edge list — shared by exact and candidate modes."""
    if round_digits is not None:
        tk = tk.withColumn("qcosine", F.round("qcosine", round_digits))
    # both sides of the mutual self-join read tk: pin the O(N*k) edge
    # list once instead of running the scoring scan twice
    tk = tk.localCheckpoint(eager=True)
    a = tk.select(
        F.col("query_id").alias("id_a"),
        F.col("neighbor_id").alias("id_b"),
        "qcosine",
        F.col("rank").alias("rank_ab"),
    )
    b = tk.select(
        F.col("neighbor_id").alias("id_a"),
        F.col("query_id").alias("id_b"),
        F.col("rank").alias("rank_ba"),
    )
    return (
        a.join(b, ["id_a", "id_b"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "qcosine", "rank_ab", "rank_ba")
    )


def _candidate_knn_edges(
    df: DataFrame,
    candidates: DataFrame,
    *,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Score candidate pairs distributed (no corpus collect): equi-join
    vectors onto both pair sides, one Arrow-batched GEMM-free scoring
    pass (per-row int8 quantize + dot, vectorized over the batch), then
    a per-query rank window capped at k with the exact-mode order
    (-qcosine, neighbor_id).  O(|candidates|) work, two hash joins +
    one window shuffle — no driver materialization of anything."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    kk = int(k)
    cand = (
        candidates.select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("neighbor_id").cast("long").alias("neighbor_id"),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .distinct()
    )
    vecs = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v")
    )
    pairs = cand.join(
        vecs.select(F.col("id").alias("query_id"), F.col("v").alias("qv")),
        "query_id",
    ).join(
        vecs.select(F.col("id").alias("neighbor_id"), F.col("v").alias("nv")),
        "neighbor_id",
    )

    def _np_codes(vecs_list):
        X = np.asarray(vecs_list, dtype=np.float64)
        amax = np.abs(X).max(axis=1)
        scale = np.where(amax / 127.0 > 0.0, amax / 127.0, 1.0)
        return np.floor(X / scale[:, None] + 0.5)

    def _score(it):
        for pdf in it:
            if not len(pdf):
                continue
            Q = _np_codes(pdf["qv"].tolist())
            Nv = _np_codes(pdf["nv"].tolist())
            qn = np.sqrt((Q * Q).sum(axis=1))
            nn = np.sqrt((Nv * Nv).sum(axis=1))
            keep = (qn > 0) & (nn > 0)
            if not keep.any():
                continue
            # dot / (sqrt(na)*sqrt(nb)) — identical IEEE expression to
            # exact mode and the SQL oracle
            dot = (Q[keep] * Nv[keep]).sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy()[keep],
                    "neighbor_id": pdf["neighbor_id"].to_numpy()[keep],
                    "qcosine": dot / (qn[keep] * nn[keep]),
                }
            )

    scored = pairs.mapInPandas(
        _score, "query_id long, neighbor_id long, qcosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("qcosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= kk)
        .select("query_id", "neighbor_id", "qcosine", "rank")
    )


def class_centroid_cosines(
    df: DataFrame,
    *,
    label_col: str = "label",
    vec_col: str = "embedding",
    quantize_bits: int = 20,
) -> DataFrame:
    """Pairwise cosine between CLASS CENTROIDS — the class-geometry
    matrix behind label-noise screens and coarse-class merging: two
    classes whose centroids cosine near 1 are candidates for collapse
    (or for label confusion); a class whose centroid is near-orthogonal
    to all others is coherent and separable.  Complements
    ``embedding_class_profile`` (q171, per-class centroid NORM) with
    the between-class angles.

    Engine-exact by the q171 construction: components floor-quantize to
    2^-``quantize_bits`` integers, per-(label, dim) sums S are
    integer-exact in any fold order, and the centroid scale factors
    1/(n*2^bits) CANCEL in cosine — so cos(centroid_a, centroid_b) =
    sum_d(S_ad * S_bd) / (sqrt(sum S_ad^2) * sqrt(sum S_bd^2)), an
    integer-dot expression any engine replays bit-identically.

    Scale shape: ONE (label, dim) groupBy over the exploded corpus (the
    only corpus-sized shuffle, map-side combined); everything after is
    |labels| x dims rows — a self-join on dim over a relation of a few
    hundred rows.  Classes with a zero-vector sum (cosine undefined)
    are excluded, documented like ``int8_topk``'s zero-vector rule.

    Output: (label_a, label_b, cosine) with label_a < label_b.
    """
    scale = float(2 ** int(quantize_bits))
    q = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(
            F.transform(
                vec_col,
                lambda x: F.floor(x.cast("double") * F.lit(scale)).cast("long"),
            )
        ).alias("dim", "xq"),
    )
    per_dim = q.groupBy("label", "dim").agg(
        F.sum("xq").cast("long").alias("s")
    )
    # tiny relation (|labels| x dims) read three times below: pin it
    per_dim = per_dim.localCheckpoint(eager=True)
    norms = per_dim.groupBy("label").agg(
        F.sum(
            F.col("s").cast("decimal(38,0)") * F.col("s").cast("decimal(38,0)")
        ).alias("n2")
    ).filter(F.col("n2") > 0)
    dots = (
        per_dim.select(F.col("label").alias("label_a"), "dim", F.col("s").alias("sa"))
        .join(
            per_dim.select(
                F.col("label").alias("label_b"), "dim", F.col("s").alias("sb")
            ),
            "dim",
        )
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(
                F.col("sa").cast("decimal(38,0)") * F.col("sb").cast("decimal(38,0)")
            ).alias("dot")
        )
    )
    return (
        dots.join(
            norms.select(F.col("label").alias("label_a"), F.col("n2").alias("na2")),
            "label_a",
        )
        .join(
            norms.select(F.col("label").alias("label_b"), F.col("n2").alias("nb2")),
            "label_b",
        )
        .select(
            "label_a",
            "label_b",
            (
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double"))
                )
            ).alias("cosine"),
        )
    )
