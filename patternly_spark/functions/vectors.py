"""Vector math over array<float|double> embedding columns.

Built-in higher-order functions only (zip_with / aggregate) — JVM-side,
no UDF, so similarity scans vectorize under whole-stage codegen and scale
linearly with partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


# ---------------------------------------------------------------------------
# hyperplane / centroid application with a literal-size budget
# ---------------------------------------------------------------------------

#: above this many embedded literals (num_planes*dim or n_lists*dim) the
#: plan bloats — constant-fold time, plan serialization, and codegen all
#: degrade — so we switch from literal column expressions to a broadcast
#: numpy matrix applied in an Arrow-batched pandas UDF.
LITERAL_BUDGET = 4096


def hyperplane_signature(vec: Column, planes) -> Column:
    """LSH sign signature: bit i = (vec . planes[i] >= 0).

    Small plane sets inline as literal expressions (JVM-side, zero Python);
    past LITERAL_BUDGET the planes ship once per executor as an Arrow-batched
    pandas UDF closure and the signature is one numpy matmul per batch.
    Both paths produce identical bits except for dot products within float
    rounding of zero.
    """
    planes = np.asarray(planes, dtype=np.float64)
    if planes.size <= LITERAL_BUDGET:
        sig = F.lit(0)
        for i, p in enumerate(planes):
            arr = F.array(*[F.lit(float(v)) for v in p])
            d = F.aggregate(
                F.zip_with(vec, arr, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            sig = sig + F.shiftleft(F.when(d >= 0, F.lit(1)).otherwise(F.lit(0)), i)
        return sig

    from pyspark.sql.functions import pandas_udf

    bits = (1 << np.arange(planes.shape[0], dtype=np.int64))

    @pandas_udf("int")
    def _sig(vs: pd.Series) -> pd.Series:
        m = np.vstack(vs.to_numpy())
        dots = m.astype(np.float64) @ planes.T
        return pd.Series(((dots >= 0) * bits).sum(axis=1).astype("int32"))

    return _sig(vec)


def nearest_centroids(vec: Column, centroids, n: int) -> Column:
    """array<int> of the n nearest centroid ids by squared L2, ascending
    (ties break on centroid id — same order as sorting (dist, id) structs).
    Literal expressions under LITERAL_BUDGET, broadcast + pandas UDF above.
    """
    centroids = np.asarray(centroids, dtype=np.float64)
    if centroids.size <= LITERAL_BUDGET:
        dists = []
        for ci, cvec in enumerate(centroids):
            arr = F.array(*[F.lit(float(x)) for x in cvec])
            d = F.aggregate(
                F.zip_with(vec, arr, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            dists.append(F.struct(d.alias("d"), F.lit(ci).alias("cell")))
        ranked = F.array_sort(F.array(*dists))
        return F.transform(F.slice(ranked, 1, n), lambda s: s["cell"])

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def _cells(vs: pd.Series) -> pd.Series:
        m = np.vstack(vs.to_numpy()).astype(np.float64)
        # ||x-c||^2 expanded: one (batch x lists) matmul, no 3-D broadcast
        d = (m * m).sum(1, keepdims=True) - 2.0 * (m @ centroids.T) + (centroids * centroids).sum(1)
        idx = np.argsort(d, axis=1, kind="stable")[:, :n]
        return pd.Series([row.astype("int32").tolist() for row in idx])

    return _cells(vec)


def hash_embedding(hashes: Column, dim: int = 16) -> Column:
    """Deterministic bag-of-words embedding from 32-bit token hashes:
    component i is the sum over tokens of ±1 by bit i of the token's
    hash (a random-projection / feature-hashing sketch).  All-integer
    arithmetic → bit-identical in any engine, which makes downstream
    cosine math exactly reproducible (sqrt and / are correctly-rounded
    IEEE ops, unlike ln).

    ``hashes`` MUST be a materialized array<bigint> column (e.g.
    ``F.transform(toks, shingle_hash)`` bound via withColumn): it is
    referenced ``dim`` times here, and a bound reference keeps
    CollapseProject from re-inlining the md5s per component (the
    tokenizer-once trap, see functions/text.py).
    """
    # ONE fold over the hash array with an array accumulator — per-dim
    # aggregates (16 separate folds) re-walk the hashes per component,
    # measured ~10x slower at sf0.1
    zero = F.array_repeat(F.lit(0).cast("long"), dim)
    summed = F.aggregate(
        hashes,
        zero,
        # call_function: the SQL shiftright accepts a column shift amount
        # (the python F.shiftright wrapper insists on a literal int)
        lambda acc, h: F.transform(
            acc, lambda x, i: x + (F.call_function("shiftright", h, i) % 2) * 2 - 1
        ),
    )
    return F.transform(summed, lambda x: x.cast("double"))


def random_projection(vec: Column, planes, *, scale: float | None = None) -> Column:
    """Johnson-Lindenstrauss projection: array<double> of vec . planes[i]
    (optionally x ``scale``, canonically 1/sqrt(k)) — the cheap
    dimensionality reduction in front of clustering / dedup / ANN when
    the raw embedding width is the cost driver.

    Literal-expression dot folds under LITERAL_BUDGET (JVM-side, zero
    Python), one Arrow-batched matmul per batch above it.  The literal
    path's left-fold order is bit-reproducible cross-engine (the q94/q96
    oracle precedent); the UDF path matches within SIMD re-association.
    """
    planes = np.asarray(planes, dtype=np.float64)
    if planes.size <= LITERAL_BUDGET:
        comps = []
        for p in planes:
            arr = F.array(*[F.lit(float(v)) for v in p])
            d = F.aggregate(
                F.zip_with(vec, arr, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            comps.append(d * F.lit(float(scale)) if scale is not None else d)
        return F.array(*comps)

    from pyspark.sql.functions import pandas_udf

    s = 1.0 if scale is None else float(scale)

    @pandas_udf("array<double>")
    def _proj(vs: pd.Series) -> pd.Series:
        m = np.vstack(vs.to_numpy()).astype(np.float64)
        out = (m @ planes.T) * s
        return pd.Series([row.tolist() for row in out])

    return _proj(vec)
