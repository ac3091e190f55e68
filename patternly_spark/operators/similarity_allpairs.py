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

__all__ = ["cosine_allpairs_join"]


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
    from patternly_spark.operators.quantized import _int_dot, int8_quantize

    t = float(threshold)
    if not (-1.0 <= t <= 1.0):
        raise ValueError(f"threshold must be in [-1, 1], got {t}")
    r = math.sqrt(max(2.0 * (1.0 - t), 1e-12))
    d = int(block_dims)
    if d < 1:
        raise ValueError("block_dims must be >= 1")
    splits = max(int(home_splits), 1)

    codes = int8_quantize(df, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("id"), "codes"
    )
    base = (
        codes.withColumn("n2", _int_dot(F.col("codes"), F.col("codes")))
        .filter(F.col("n2") > 0)
        .select(
            "id",
            "codes",
            "n2",
            *[
                # n2 > 0 is already filtered, but ANSI mode may evaluate
                # the projection before the filter prunes — guard the /0
                F.floor(
                    F.when(
                        F.col("n2") > 0,
                        F.element_at("codes", j + 1).cast("double")
                        / F.sqrt(F.col("n2")),
                    )
                    / F.lit(r)
                )
                .cast("long")
                .alias(f"c{j}")
                for j in range(d)
            ],
        )
    )

    home = base.select(
        "id",
        "codes",
        "n2",
        *[F.col(f"c{j}") for j in range(d)],
        F.pmod(F.xxhash64(F.col("id")), F.lit(splits)).cast("int").alias("split"),
        F.lit(1).alias("role"),
    )
    # probe side: replicate to the 3^d neighbor cells x every home split
    # (generators can't nest inside expressions, so explode the offset
    # first and shift the cell in a second projection)
    probe = base
    for j in range(d):
        probe = (
            probe.withColumn(
                f"__o{j}", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
            )
            .withColumn(f"c{j}", F.col(f"c{j}") + F.col(f"__o{j}"))
            .drop(f"__o{j}")
        )
    probe = (
        probe.withColumn(
            "split", F.explode(F.sequence(F.lit(0), F.lit(splits - 1)))
        )
        .withColumn("split", F.col("split").cast("int"))
        .withColumn("role", F.lit(0))
    )

    both = home.unionByName(probe.select(*home.columns))

    def _verify(pdf: pd.DataFrame) -> pd.DataFrame:
        h = pdf[pdf["role"] == 1]
        p = pdf[pdf["role"] == 0]
        if h.empty or p.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "qcosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "qcosine": "float64"}
            )
        H = np.array(h["codes"].tolist(), dtype=np.float64)
        P = np.array(p["codes"].tolist(), dtype=np.float64)
        # float64 GEMM over int8 codes is exact (sums < 2^21 << 2^53)
        G = P @ H.T
        qc = G / np.sqrt(
            np.outer(
                p["n2"].to_numpy(dtype=np.float64), h["n2"].to_numpy(dtype=np.float64)
            )
        )
        pid = p["id"].to_numpy()
        hid = h["id"].to_numpy()
        mask = (pid[:, None] < hid[None, :]) & (qc >= t)
        pi, hi = np.nonzero(mask)
        return pd.DataFrame(
            {
                "id_a": pid[pi].astype(np.int64),
                "id_b": hid[hi].astype(np.int64),
                "qcosine": qc[pi, hi],
            }
        )

    out = both.groupBy(*[f"c{j}" for j in range(d)], "split").applyInPandas(
        _verify, "id_a long, id_b long, qcosine double"
    )
    if round_digits is not None:
        out = out.withColumn("qcosine", F.round("qcosine", round_digits))
    return out
