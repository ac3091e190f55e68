"""Compressed-embedding search (operators/quantized): int8 scalar
quantization, binary sign sketches + Hamming rerank, matryoshka
truncation — all checked against plain-numpy references."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from patternly_spark.operators.quantized import (
    hamming_rerank_topk,
    int8_quantize,
    int8_topk,
    matryoshka_recall,
    sign_pack,
    truncated_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_int8_quantize_matches_numpy(spark, emb):
    pdf = emb.limit(25).toPandas()
    qz = int8_quantize(emb.limit(25)).toPandas().set_index("vec_id")
    for r in pdf.itertuples():
        x = np.array(r.embedding, dtype=np.float64)
        am = float(np.abs(x).max())
        scale = am / 127.0 if am > 0 else 1.0
        codes = np.floor(x / scale + 0.5).astype(int)
        row = qz.loc[r.vec_id]
        assert row["scale"] == pytest.approx(scale, abs=0.0)
        assert (np.array(row["codes"]) == codes).all()
        assert int(np.abs(codes).max()) <= 127


def test_int8_quantize_zero_vector(spark):
    df = spark.createDataFrame([(0, [0.0, 0.0, 0.0])], "vec_id long, embedding array<double>")
    row = int8_quantize(df).collect()[0]
    assert row["scale"] == 1.0 and list(row["codes"]) == [0, 0, 0]


def test_int8_topk_close_to_exact_and_deterministic(spark, emb):
    from patternly_spark.operators.similarity import cosine_topk

    probes = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine_sim)
        for r in cosine_topk(emb, probes, k=5).collect()
    }
    quant = {
        (r.query_id, r.rank): (r.neighbor_id, r.qcosine)
        for r in int8_topk(emb, probes, k=5).collect()
    }
    assert set(exact) == set(quant)
    # int8 absmax keeps cosine within ~1e-2 of exact; rank-1 neighbor agrees
    for (q, rk), (nid, sim) in exact.items():
        qn, qs = quant[(q, rk)]
        assert abs(qs - sim) < 2e-2
    agree = sum(exact[(q, 1)][0] == quant[(q, 1)][0] for q in range(5))
    assert agree >= 4


def test_sign_pack_words_match_numpy(spark, emb):
    pdf = emb.limit(10).toPandas()
    sp = sign_pack(emb.limit(10)).toPandas().set_index("vec_id")
    for r in pdf.itertuples():
        x = np.array(r.embedding)
        dim = len(x)
        words = []
        for w in range((dim + 31) // 32):
            acc = 0
            for j in range(32):
                i = 32 * w + j
                if i < dim:
                    acc = acc * 2 + (1 if x[i] >= 0 else 0)
            words.append(acc)
        assert [int(g) for g in sp.loc[r.vec_id]["sig"]] == words


def test_hamming_rerank_matches_numpy_hamming(spark, emb):
    pdf = emb.filter(F.col("vec_id") < 6).toPandas().set_index("vec_id")
    out = hamming_rerank_topk(
        emb.filter(F.col("vec_id") < 6), emb.filter(F.col("vec_id") < 6), k=5, candidates=5
    ).collect()
    assert len(out) == 6 * 5
    for r in out:
        a = np.array(pdf.loc[r.query_id]["embedding"])
        b = np.array(pdf.loc[r.neighbor_id]["embedding"])
        assert r.hamming == int(((a >= 0) != (b >= 0)).sum())


def test_hamming_prefilter_bounds_candidates(spark, emb):
    probes = emb.filter(F.col("vec_id") < 3)
    out = hamming_rerank_topk(emb, probes, k=50, candidates=8).toPandas()
    # rerank can never return more than the prefilter admitted
    assert (out.groupby("query_id").size() <= 8).all()


def test_truncated_topk_equals_exact_at_full_dim(spark, emb):
    from patternly_spark.operators.similarity import cosine_topk

    probes = emb.filter(F.col("vec_id") < 5)
    full = truncated_topk(emb, probes, trunc_dim=64, k=5).collect()
    exact = cosine_topk(emb, probes, k=5).collect()
    assert {(r.query_id, r.rank, r.neighbor_id) for r in full} == {
        (r.query_id, r.rank, r.neighbor_id) for r in exact
    }


def test_matryoshka_recall_monotone_and_bounded(spark, emb):
    probes = emb.filter(F.col("vec_id") < 10)
    rows = {
        r.trunc_dim: r
        for r in matryoshka_recall(emb, probes, dims=[8, 32, 64], k=10).collect()
    }
    assert rows[64].recall == 1.0  # full dim reproduces exact search
    for d, r in rows.items():
        assert r.n_exact == 100 and 0.0 <= r.recall <= 1.0
        assert r.n_common <= r.n_exact


def test_sign_pack_partial_last_word(spark):
    # dim = 40: one full 32-bit word + one 8-bit partial word
    import random

    random.seed(7)
    vec = [random.uniform(-1, 1) for _ in range(40)]
    df = spark.createDataFrame([(0, vec)], "vec_id long, embedding array<double>")
    got = [int(w) for w in sign_pack(df).collect()[0]["sig"]]
    words = []
    for w in range(2):
        acc = 0
        for j in range(32):
            i = 32 * w + j
            if i < 40:
                acc = acc * 2 + (1 if vec[i] >= 0 else 0)
        words.append(acc)
    assert got == words
    # hamming between 40-dim vectors still counts sign disagreements
    neg = [-v for v in vec]
    df2 = spark.createDataFrame(
        [(0, vec), (1, neg)], "vec_id long, embedding array<double>"
    )
    out = hamming_rerank_topk(df2, df2, k=1, candidates=2).collect()
    assert all(r.hamming == 40 for r in out)


def test_embedding_covariance_exact_and_partition_invariant(spark, emb):
    """Partial int64 Grams reduced across Arrow batches == numpy closed
    form, identically at 1 and 13 partitions (integer sums are
    fold-order-free — the whole point of quantizing first)."""
    import numpy as np

    from patternly_spark.operators.quantized import embedding_covariance

    pdf = emb.orderBy("vec_id").toPandas()
    X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    amax = np.abs(X).max(1)
    scale = np.where(amax / 127.0 > 0.0, amax / 127.0, 1.0)
    C = np.floor(X / scale[:, None] + 0.5).astype(np.int64)
    n = len(C)
    G = C.T @ C
    s = C.sum(0)

    for parts in [1, 13]:
        rows = embedding_covariance(emb.repartition(parts)).collect()
        assert len(rows) == 64 * 65 // 2
        for r in rows:
            i, j = int(r.i), int(r.j)
            assert i <= j
            assert (r.n, r.gram, r.sum_i, r.sum_j) == (n, G[i, j], s[i], s[j])
            assert r.cov == float(n * G[i, j] - s[i] * s[j]) / float(n * n)


def test_whitening_matrix_decorrelates(spark, emb):
    import numpy as np

    from patternly_spark.operators.quantized import (
        embedding_covariance,
        whitening_matrix,
    )

    W, vals = whitening_matrix(embedding_covariance(emb))
    assert W.shape == (64, 64) and (vals >= -1e-9).all()
    pdf = emb.orderBy("vec_id").toPandas()
    X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    amax = np.abs(X).max(1)
    scale = np.where(amax / 127.0 > 0.0, amax / 127.0, 1.0)
    C = np.floor(X / scale[:, None] + 0.5)
    Cc = C - C.mean(0)
    S = (Cc.T @ Cc) / len(C)
    WS = W @ S @ W.T
    assert np.abs(np.diag(WS) - 1.0).max() < 1e-3
    off = WS - np.diag(np.diag(WS))
    assert np.abs(off).max() < 1e-3


def test_mutual_knn_matches_bruteforce(spark, emb):
    """Mutual pairs == numpy double-ranked reciprocal check; symmetry of
    qcosine and correct per-direction ranks."""
    import numpy as np

    from patternly_spark.operators.quantized import mutual_knn

    k = 4
    got = {
        (r.id_a, r.id_b): (r.rank_ab, r.rank_ba, r.qcosine)
        for r in mutual_knn(emb, k=k, round_digits=None).collect()
    }

    pdf = emb.orderBy("vec_id").toPandas()
    ids = pdf["vec_id"].to_numpy()
    X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    amax = np.abs(X).max(1)
    scale = np.where(amax / 127.0 > 0.0, amax / 127.0, 1.0)
    C = np.floor(X / scale[:, None] + 0.5)
    norms = np.sqrt((C * C).sum(1))
    # sqrt(na)*sqrt(nb), NOT sqrt(na*nb): the operator (and its SQL
    # oracle) evaluate the former; the two differ in the last ulp
    S = (C @ C.T) / np.outer(norms, norms)
    np.fill_diagonal(S, -np.inf)
    ranks = {}
    for qi in range(len(ids)):
        order = sorted(range(len(ids)), key=lambda j: (-S[qi, j], ids[j]))[:k]
        for rnk, j in enumerate(order, start=1):
            ranks[(ids[qi], ids[j])] = rnk
    want = {}
    for (a, b), rab in ranks.items():
        rba = ranks.get((b, a))
        if rba is not None and a < b:
            want[(a, b)] = (rab, rba, S[np.where(ids == a)[0][0], np.where(ids == b)[0][0]])
    assert set(got) == set(want)
    for key in got:
        assert got[key][0] == want[key][0] and got[key][1] == want[key][1]
        assert got[key][2] == want[key][2]


def test_embedding_matrix_operators_handle_empty_input(spark):
    from patternly_spark.operators.quantized import embedding_covariance, mutual_knn

    vecs = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert embedding_covariance(vecs).count() == 0
    assert mutual_knn(vecs, k=3).count() == 0


def test_mutual_knn_corpus_smaller_than_k(spark):
    """k > corpus size must not desync the repeat/tile lengths in the
    executor (regression: 'arrays must all be same length')."""
    from patternly_spark.operators.quantized import mutual_knn

    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    rows = mutual_knn(vecs, k=10).collect()
    # every pair is mutual when everyone is in everyone's top-k
    assert {(r.id_a, r.id_b) for r in rows} == {(1, 2), (1, 3), (2, 3)}


def test_mutual_knn_exact_mode_refuses_oversized_corpus(spark, emb, monkeypatch):
    """The scale-contract guard: above max_exact_rows, exact mode raises
    BEFORE any driver collect — the 10^8-vector foot-gun cannot fire
    silently."""
    import pytest

    import pyspark.sql.dataframe as D

    from patternly_spark.operators.quantized import mutual_knn

    sub = emb.limit(40).localCheckpoint(eager=True)

    def _no_collect(self, *a, **kw):
        raise AssertionError("guard must fire before any collect")

    monkeypatch.setattr(D.DataFrame, "collect", _no_collect)
    with pytest.raises(ValueError, match="max_exact_rows"):
        mutual_knn(sub, k=4, max_exact_rows=10)


def test_mutual_knn_candidate_mode_matches_exact(spark, emb, monkeypatch):
    """Candidate mode with a complete candidate set (all pairs) must
    reproduce exact mode bit-for-bit, and must never collect the
    corpus to the driver."""
    import pyspark.sql.dataframe as D

    from patternly_spark.operators.quantized import mutual_knn

    sub = emb.limit(40).localCheckpoint(eager=True)
    ids = sub.select(F.col("vec_id").alias("query_id"))
    cand = ids.crossJoin(sub.select(F.col("vec_id").alias("neighbor_id")))

    exact = {
        (r.id_a, r.id_b): (r.rank_ab, r.rank_ba, r.qcosine)
        for r in mutual_knn(sub, k=4).collect()
    }

    orig_collect = D.DataFrame.collect

    def _no_collect(self, *a, **kw):
        raise AssertionError("candidate mode must not collect the corpus")

    monkeypatch.setattr(D.DataFrame, "collect", _no_collect)
    out = mutual_knn(sub, k=4, candidates=cand)
    monkeypatch.setattr(D.DataFrame, "collect", orig_collect)

    got = {(r.id_a, r.id_b): (r.rank_ab, r.rank_ba, r.qcosine) for r in out.collect()}
    assert got == exact


def test_mutual_knn_ivf_candidate_mode_on_planted_clusters(spark):
    """ivf_topk output plugs directly into candidates=: on a corpus of
    tight planted clusters (true neighbors share the IVF cell) the
    approximate candidate path agrees with exact mode."""
    import numpy as np

    from patternly_spark.operators.quantized import mutual_knn
    from patternly_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 16)) * 10.0
    rows = []
    vid = 0
    for c in centers:
        for _ in range(10):
            rows.append((vid, (c + rng.normal(size=16) * 0.05).tolist()))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {
        (r.id_a, r.id_b): (r.rank_ab, r.rank_ba)
        for r in mutual_knn(df, k=3).collect()
    }
    cand = ivf_topk(df, df, k=8, n_lists=4, n_probe=2, seed=11)
    got = {
        (r.id_a, r.id_b): (r.rank_ab, r.rank_ba)
        for r in mutual_knn(df, k=3, candidates=cand).collect()
    }
    assert got == exact


def test_class_centroid_cosines_matches_numpy(spark, emb):
    """Between-class centroid cosines == the numpy replay of the same
    integer-sum expression (scale factors cancel, so the statistic is
    exactly the cosine of the per-class quantized sum vectors)."""
    from patternly_spark.operators.quantized import class_centroid_cosines

    got = {
        (r.label_a, r.label_b): r.cosine
        for r in class_centroid_cosines(emb).collect()
    }
    pdf = emb.toPandas()
    import numpy as np

    sums = {}
    for lab, g in pdf.groupby("label"):
        X = np.floor(
            np.array(g["embedding"].tolist(), dtype=np.float64) * 1048576.0
        )
        sums[lab] = X.sum(axis=0)
    labs = sorted(sums)
    want = {}
    for i, a in enumerate(labs):
        for b in labs[i + 1 :]:
            na, nb = (sums[a] ** 2).sum(), (sums[b] ** 2).sum()
            if na > 0 and nb > 0:
                want[(a, b)] = float(
                    (sums[a] * sums[b]).sum() / (np.sqrt(na) * np.sqrt(nb))
                )
    assert set(got) == set(want)
    for k in got:
        assert got[k] == want[k], (k, got[k], want[k])


def test_class_centroid_cosines_clone_and_zero_classes(spark):
    from patternly_spark.operators.quantized import class_centroid_cosines

    rows = []
    base = [float(x) for x in [1.0, 2.0, -0.5, 3.0]]
    for i in range(5):
        rows.append((i, base, 0))
        rows.append((100 + i, base, 1))          # label 1 clones label 0
    rows.append((200, [1.0, 0.0, 0.0, 0.0], 2))  # label 2: cancels to zero
    rows.append((201, [-1.0, 0.0, 0.0, 0.0], 2))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = {(r.label_a, r.label_b): r.cosine for r in class_centroid_cosines(df).collect()}
    # zero-sum class 2 excluded entirely; clone pair cosine ~ 1
    assert set(got) == {(0, 1)}
    assert abs(got[(0, 1)] - 1.0) < 1e-12
