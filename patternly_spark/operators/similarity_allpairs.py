"""Exact all-pairs cosine-similarity join — the dense-vector twin of
``dedup.set_similarity_join`` (set PPJoin): every pair of vectors whose
quantized cosine is >= threshold is returned (no probabilistic recall,
unlike the hyperplane-LSH path q94/q44 take), and nothing below the
threshold survives the verify.

Why its own module: the join is a grid-blocked GEMM, a different
execution shape from the broadcast-queries scans in ``similarity.py``.

Similarity definition: cosine over per-vector absmax **int8 codes**
(``quantized.int8_quantize``) — the engine-portable similarity q135
proved hash-exact: integer dot / (sqrt . sqrt) of exact integer norms
has no float fold-order sensitivity, so the join threshold is a
deterministic predicate on every engine (and SQL-replayable, which is
what lets the all-pairs result carry a full value-hash oracle).  For
bit-identical *float* cosine semantics the int8 step is the documented
(and standard: faiss SQ8) trade.

Candidate generation — Euclidean grid blocking (fixed-radius near
neighbors): for unit vectors, cos(a,b) >= t  =>  ||a-b||^2 = 2 - 2cos
<= 2(1-t), so EVERY coordinate differs by at most r = sqrt(2(1-t)).
Bucketing coordinate j at ``floor(u_j / r)`` therefore puts every
qualifying pair within ONE cell of each other on every blocked axis —
completeness is per-coordinate geometry, not probability.  Each vector
is shipped once as a "home" row and replicated to its 3^block_dims
neighbor cells as "probe" rows; an unordered pair (a<b) is emitted by
exactly one group — the home cell of b, where exactly one replica of a
lands (a vector's replica cells are all distinct).

Verify — per-cell blocked GEMM: within a group the probe x home dot
matrix is ONE numpy float64 matmul (BLAS).  float64 GEMM over int8
codes is EXACT: |code| <= 127, so every product <= 127^2 and every
64-term sum < 2^21 — integers far below 2^53, no rounding anywhere.
This replaces a 2M-row pair join + per-row array fold (the naive plan,
~30 s at sf0.1) with a handful of Arrow batches + one dgemm (~1 s).

Skew: an isotropic corpus at a loose threshold degenerates to one
populated cell — brute force, the information-theoretic floor for exact
dense all-pairs when every pair is nearly equidistant.  ``home_splits``
salts the home side so even the degenerate cell becomes `splits`
balanced GEMM tasks (probes are replicated to every split; home rows
are hash-partitioned across them), which is also the 100 TB answer for
a hot cell: work per task is bounded by |cell|/splits x |neighborhood|.

Scale shape at 100 TB: quantize is a map-only rewrite; the grouping is
one shuffle on (cell, split); clustered corpora (the near-duplicate
case this join exists for) give small cells and tiny neighborhoods; no
window over the full corpus, no driver collect, no per-row Python.

Reference parity: the reference engine has no vector surface at all;
this extends SURVEY.md §2.12 (dedup / similarity-search families) with
the exact-threshold member the LSH paths can't provide.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cosine_allpairs_join", "tfidf_cosine_allpairs"]


def _cells_base(
    df: DataFrame, *, r: float, id_col: str, vec_col: str, block_dims: int
) -> DataFrame:
    """(id, codes, n2, c0..c{d-1}): int8 codes, integer squared norm,
    and the grid cell of each blocked coordinate at width ``r``.  Zero
    vectors (undefined cosine) are dropped here.

    Computed in one Arrow-batched numpy pass: the closed forms are
    identical to ``int8_quantize`` + ``_int_dot`` (floor(x/scale+0.5),
    integer sums, floor((code/sqrt(n2))/r)) but the column-expression
    versions run interpreted per element (higher-order functions don't
    codegen) and cost seconds even at 2k rows."""

    def _mk(it):
        for pdf in it:
            if not len(pdf):
                continue
            X = np.asarray(pdf["__v"].tolist(), dtype=np.float64)
            amax = np.abs(X).max(axis=1)
            scale = np.where(amax / 127.0 > 0.0, amax / 127.0, 1.0)
            C = np.floor(X / scale[:, None] + 0.5)
            n2 = (C * C).sum(axis=1)
            keep = n2 > 0
            if not keep.any():
                continue
            C, n2 = C[keep], n2[keep]
            ids = pdf["__id"].to_numpy()[keep]
            rt = np.sqrt(n2)
            out = {
                "id": ids.astype(np.int64),
                "codes": list(C.astype(np.int32)),
                "n2": n2.astype(np.int64),
            }
            for j in range(block_dims):
                out[f"c{j}"] = np.floor((C[:, j] / rt) / r).astype(np.int64)
            yield pd.DataFrame(out)

    schema = "id long, codes array<int>, n2 long, " + ", ".join(
        f"c{j} long" for j in range(block_dims)
    )
    return df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    ).mapInPandas(_mk, schema)


def _with_split(base: DataFrame, splits: int, role: int) -> DataFrame:
    return base.withColumn(
        "split", F.pmod(F.xxhash64(F.col("id")), F.lit(splits)).cast("int")
    ).withColumn("role", F.lit(role))


def _replicate_probes(base: DataFrame, block_dims: int, splits: int) -> DataFrame:
    """Each vector copied to its 3^d neighbor cells x every home split.
    (Generators can't nest inside expressions, so explode the offset
    first and shift the cell in a second projection.)"""
    probe = base
    for j in range(block_dims):
        probe = (
            probe.withColumn(
                f"__o{j}", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
            )
            .withColumn(f"c{j}", F.col(f"c{j}") + F.col(f"__o{j}"))
            .drop(f"__o{j}")
        )
    return (
        probe.withColumn(
            "split", F.explode(F.sequence(F.lit(0), F.lit(splits - 1)))
        )
        .withColumn("split", F.col("split").cast("int"))
        .withColumn("role", F.lit(0))
    )


def _gemm_verify(
    both: DataFrame, *, block_dims: int, threshold: float, ordered: bool
) -> DataFrame:
    """Per-(cell, split) probe x home dot matrix as ONE numpy float64
    matmul (BLAS) — exact over int8 codes (sums < 2^21 << 2^53).
    ``ordered=True`` keeps probe.id < home.id (self-join: each unordered
    pair exactly once); ``ordered=False`` keeps all probe x home pairs
    with the output normalized to id_a < id_b (disjoint-id join: each
    cross pair appears in exactly one group — the home's cell)."""
    t = float(threshold)

    def _verify(pdf: pd.DataFrame) -> pd.DataFrame:
        h = pdf[pdf["role"] == 1]
        p = pdf[pdf["role"] == 0]
        if h.empty or p.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "qcosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "qcosine": "float64"}
            )
        H = np.array(h["codes"].tolist(), dtype=np.float64)
        P = np.array(p["codes"].tolist(), dtype=np.float64)
        G = P @ H.T
        # sqrt each norm BEFORE the outer product: the oracle (and the
        # repo convention, see mutual_knn) computes dot/(sqrt(a)*sqrt(b)),
        # and sqrt(a*b) can differ from sqrt(a)*sqrt(b) in the last ulp —
        # enough to flip a borderline pair across the threshold.
        qc = G / np.outer(
            np.sqrt(p["n2"].to_numpy(dtype=np.float64)),
            np.sqrt(h["n2"].to_numpy(dtype=np.float64)),
        )
        pid = p["id"].to_numpy()
        hid = h["id"].to_numpy()
        if ordered:
            mask = (pid[:, None] < hid[None, :]) & (qc >= t)
        else:
            mask = (pid[:, None] != hid[None, :]) & (qc >= t)
        pi, hi = np.nonzero(mask)
        a, b = pid[pi], hid[hi]
        return pd.DataFrame(
            {
                "id_a": np.minimum(a, b).astype(np.int64),
                "id_b": np.maximum(a, b).astype(np.int64),
                "qcosine": qc[pi, hi],
            }
        )

    return both.groupBy(*[f"c{j}" for j in range(block_dims)], "split").applyInPandas(
        _verify, "id_a long, id_b long, qcosine double"
    )


def cosine_allpairs_join(
    df: DataFrame,
    *,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_dims: int = 2,
    home_splits: int = 8,
    round_digits: int | None = 6,
) -> DataFrame:
    """All pairs (id_a < id_b) with int8-quantized cosine >= threshold.

    Zero vectors (integer norm 0) have undefined cosine and are
    excluded, documented like ``int8_topk``.

    Output: (id_a, id_b, qcosine) — qcosine rounded to ``round_digits``
    (the threshold itself is applied to the unrounded value).
    """
    t = float(threshold)
    if not (-1.0 <= t <= 1.0):
        raise ValueError(f"threshold must be in [-1, 1], got {t}")
    r = math.sqrt(max(2.0 * (1.0 - t), 1e-12))
    d = int(block_dims)
    if d < 1:
        raise ValueError("block_dims must be >= 1")
    splits = max(int(home_splits), 1)

    base = _cells_base(df, r=r, id_col=id_col, vec_col=vec_col, block_dims=d)
    home = _with_split(base, splits, 1)
    probe = _replicate_probes(base, d, splits)
    both = home.unionByName(probe.select(*home.columns))
    out = _gemm_verify(both, block_dims=d, threshold=t, ordered=True)
    if round_digits is not None:
        out = out.withColumn("qcosine", F.round("qcosine", round_digits))
    return out


def build_idf_snapshot(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Freeze a corpus's IDF statistics: (term, df, n_docs) — n_docs
    replicated per row (constant column, RLE-free in parquet) so the
    snapshot is one self-contained relation that persists as a plain
    parquet table.  Feed it to ``tfidf_cosine_allpairs(idf_stats=...)``
    or the incremental registry (``streaming/similarity_tfidf``): a
    FROZEN snapshot is what makes incremental TF-IDF joins coherent —
    weights never drift as new documents arrive, so a pair's cosine is
    the same number in whichever batch completes it."""
    tok = (
        docs.select(
            F.col(id_col).cast("long").alias("id"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    n = docs.select(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .crossJoin(F.broadcast(n))
    )


def _tfidf_weighted(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    scale: float,
    idf_stats: DataFrame | None,
) -> DataFrame:
    """(id, term, df, w) integer-weighted postings.  With ``idf_stats``
    (a ``build_idf_snapshot`` relation) the weights come from the FROZEN
    (df, n_docs); terms absent from the snapshot weight at df=0 —
    the maximal IDF, deterministically, for every batch."""
    tok = (
        docs.select(
            F.col(id_col).cast("long").alias("id"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    if idf_stats is None:
        n_docs = docs.select(F.count(F.lit(1)).cast("double").alias("__n"))
        df_ = tok.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
        joined = tok.join(df_, "term").crossJoin(F.broadcast(n_docs))
    else:
        first = idf_stats.select("n_docs").first()
        if first is None:
            raise ValueError("idf_stats snapshot is empty — build it first")
        n = float(first["n_docs"])
        joined = tok.join(
            idf_stats.select("term", "df"), "term", "left"
        ).select(
            "id",
            "term",
            "tf",
            F.coalesce(F.col("df"), F.lit(0)).cast("long").alias("df"),
            F.lit(n).alias("__n"),
        )
    return joined.select(
        "id",
        "term",
        "df",
        (
            F.col("tf")
            * F.floor(
                F.log(
                    (F.col("__n") + F.lit(1.0))
                    / (F.col("df") + F.lit(1)).cast("double")
                )
                * F.lit(scale)
            ).cast("long")
        ).alias("w"),
    ).filter(F.col("w") > 0)


def _tfidf_prefix(weighted: DataFrame, t: float) -> DataFrame:
    """(id, term) prefix rows under the rare-first canonical order: a
    row is prefix iff the suffix mass from it onward is still
    >= n2 * t^2/4 (the excluded tail is strictly below the symmetric
    prefix-filter bound — see tfidf_cosine_allpairs)."""
    from pyspark.sql import Window

    w_order = Window.partitionBy("id").orderBy(F.asc("df"), F.asc("term"))
    norms = weighted.groupBy("id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    return (
        weighted.withColumn(
            "__suf",
            F.sum(F.col("w") * F.col("w")).over(
                w_order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
            ),
        )
        .join(norms, "id")
        .filter(
            F.col("__suf").cast("double")
            >= F.col("n2").cast("double") * F.lit(t * t / 4.0)
        )
        .select("id", "term")
    )


def tfidf_cosine_allpairs(
    docs: DataFrame,
    *,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    idf_quantize_bits: int = 16,
    round_digits: int | None = 6,
    idf_stats: DataFrame | None = None,
) -> DataFrame:
    """EXACT all-pairs TF-IDF cosine join over SPARSE term vectors — the
    weighted member of the all-pairs family: ``set_similarity_join``
    does unweighted sets (Jaccard), ``cosine_allpairs_join`` does dense
    embeddings (grid cells), this does the classic sparse
    bag-of-words cosine where PREFIX FILTERING is at its strongest
    (the L2AP/AllPairs setting the literature built it for).

    Weighting, engine-exact by construction: w(term, doc) =
    tf * floor(ln((N+1)/(df+1)) * 2^bits) — an INTEGER.  Integer dots
    and squared norms make the cosine a deterministic expression on any
    engine (the long->double casts and sqrt/division are identical IEEE
    operations), so the full result is SQL-replayable and the oracle
    can be the brute-force cross join: it proves the pruned plan's
    completeness, not just its precision.

    Prefix filter (symmetric, join-friendly form): order each vector's
    terms by document frequency ASCENDING (rarest first — the same
    canonical order as the set PPJoin, and the reason candidate buckets
    key on RARE terms); a vector's prefix is the head that leaves
    suffix norm < t/2 of its L2 norm.  If two vectors share NO prefix
    term, every common term lies in one tail or the other, so
    dot <= ||tail_a|| + ||tail_b|| < t — any qualifying pair shares a
    prefix term and survives the equi-join block.  (t/2 per side is the
    price of a symmetric prefix-prefix equi-join; the asymmetric
    index-probe bound of L2AP doesn't fit a shuffle join.)

    Scale shape at 100 TB: tokenize + tf is one map-side groupBy; df is
    one term-keyed agg; the prefix selection is a per-doc window over
    its own terms; candidates block on (rare) prefix terms; the verify
    joins candidate pairs' term lists only.  Stop-word-like terms sort
    to the tails and never key a block.  No driver collect except the
    1-row corpus count (broadcast).

    ``idf_stats`` (a ``build_idf_snapshot`` relation) freezes (df,
    n_docs) to an external reference corpus: weights come from the
    snapshot instead of the input — the contract that makes the
    incremental registry's union-over-batches equal one batch run over
    the concatenated corpus.  Terms absent from the snapshot weight at
    df=0 (maximal IDF) for every document alike.  When the snapshot IS
    this corpus's own census, the result is identical to running
    without it (pinned by test).

    Output: (doc_a, doc_b, cosine) with doc_a < doc_b, cosine >= t.
    Documents with no terms (or all-zero weights) never join.
    """
    t = float(threshold)
    if not (0.0 < t <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {t}")
    scale = float(2 ** int(idf_quantize_bits))

    weighted = _tfidf_weighted(
        docs, id_col=id_col, text_col=text_col, scale=scale, idf_stats=idf_stats
    )
    # `weighted` (tokenize -> tf groupBy -> df join -> 1-row count
    # crossJoin) feeds norms, suffix, and BOTH sides of the dot join;
    # without a cut Catalyst re-expands the whole subtree at every
    # reference (~8x re-tokenization of the corpus — a 100 TB killer).
    # Same trap-list rule already applied to q162's token relation and
    # mutual_knn's edge list: pin the small intermediate once.
    weighted = weighted.localCheckpoint(eager=True)
    norms = weighted.groupBy("id").agg(
        F.sum(F.col("w") * F.col("w")).alias("n2")
    )
    suffix = _tfidf_prefix(weighted, t)
    cand = (
        suffix.select(F.col("id").alias("doc_a"), "term")
        .join(suffix.select(F.col("id").alias("doc_b"), "term"), "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # cand is read by both arms of the two-sided dot join below; pin it
    # so the prefix self-join runs once, not twice.
    cand = cand.localCheckpoint(eager=True)
    dots = (
        cand.join(
            weighted.select(F.col("id").alias("doc_a"), "term", F.col("w").alias("wa")),
            "doc_a",
        )
        .join(
            weighted.select(F.col("id").alias("doc_b"), "term", F.col("w").alias("wb")),
            ["doc_b", "term"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    out = (
        dots.join(norms.select(F.col("id").alias("doc_a"), F.col("n2").alias("na2")), "doc_a")
        .join(norms.select(F.col("id").alias("doc_b"), F.col("n2").alias("nb2")), "doc_b")
        .withColumn(
            "__cos",
            F.col("dot").cast("double")
            / (F.sqrt(F.col("na2").cast("double")) * F.sqrt(F.col("nb2").cast("double"))),
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
    return out
