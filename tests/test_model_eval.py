"""Model-evaluation operators: ROC-AUC vs a brute-force pair-counting
replica (tie handling included), calibration-table semantics, partition
invariance."""

import itertools

import pytest
from pyspark.sql import functions as F

from patternly_spark.operators.model_eval import calibration_bins, roc_auc


def _auc_brute(pairs):
    """P(random positive outranks random negative), ties 1/2 — the
    definitionally-correct O(P*N) replica."""
    pos = [s for s, l in pairs if l]
    neg = [s for s, l in pairs if not l]
    if not pos or not neg:
        return None
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p, n in itertools.product(pos, neg)
    )
    return wins / (len(pos) * len(neg))


def test_roc_auc_matches_pair_counting(spark):
    rows = [
        (0.1, False), (0.2, False), (0.2, True), (0.3, False),
        (0.5, True), (0.5, True), (0.5, False), (0.9, True),
        (0.9, False), (0.05, False), (0.7, True),
    ]
    df = spark.createDataFrame(rows, "score double, label boolean")
    got = roc_auc(df, label_col="label", score_col="score").collect()[0]
    want = _auc_brute(rows)
    assert got["n_pos"] == 5 and got["n_neg"] == 6
    assert got["auc"] == pytest.approx(want, abs=0)  # integer-exact path


def test_roc_auc_grouped_and_degenerate(spark):
    rows = (
        [("a", 0.1 * i, i % 2 == 0) for i in range(1, 9)]
        + [("b", 0.5, True), ("b", 0.5, True)]  # no negatives -> NULL
        + [("c", 0.2, False)]  # no positives -> NULL
    )
    df = spark.createDataFrame(rows, "g string, score double, label boolean")
    out = {r["g"]: r for r in roc_auc(
        df, label_col="label", score_col="score", group_cols=["g"]
    ).collect()}
    want_a = _auc_brute([(s, l) for g, s, l in rows if g == "a"])
    assert out["a"]["auc"] == pytest.approx(want_a, abs=0)
    assert out["b"]["auc"] is None and out["c"]["auc"] is None


def test_roc_auc_perfect_and_reversed(spark):
    rows = [(float(i), i >= 5) for i in range(10)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    assert roc_auc(df, label_col="label", score_col="score").collect()[0]["auc"] == 1.0
    rev = spark.createDataFrame(
        [(float(-i), i >= 5) for i in range(10)], "score double, label boolean"
    )
    assert roc_auc(rev, label_col="label", score_col="score").collect()[0]["auc"] == 0.0


def test_roc_auc_partition_invariance(spark):
    rows = [(float((7 * i) % 13) / 16.0, i % 3 == 0) for i in range(200)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    a = roc_auc(df.coalesce(1), label_col="label", score_col="score").collect()[0]
    b = roc_auc(df.repartition(32), label_col="label", score_col="score").collect()[0]
    assert a["auc"] == b["auc"] and a["n_pos"] == b["n_pos"]


def test_calibration_bins_semantics(spark):
    # dyadic scores; bin 0 gets 2 rows (one pos), bin 9 catches score 1.0
    rows = [(0.0, False), (1.0 / 16, True), (5.0 / 8, False), (1.0, True)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    out = {r["bin"]: r for r in calibration_bins(
        df, label_col="label", score_col="score", bins=10
    ).collect()}
    assert set(out) == {0, 6, 9}
    b0 = out[0]
    assert b0["n"] == 2 and b0["n_pos"] == 1
    assert b0["mean_score"] == (0.0 + 1.0 / 16) / 2
    assert b0["frac_pos"] == 0.5
    assert b0["gap"] == b0["mean_score"] - 0.5
    # brier_term sums to the group Brier score
    brier = sum(r["brier_term"] for r in out.values())
    want = sum((s - (1.0 if l else 0.0)) ** 2 for s, l in rows) / len(rows)
    assert brier == pytest.approx(want, rel=1e-15)


def test_calibration_bins_grouped_totals(spark):
    rows = [("x", i / 32.0, i % 2 == 0) for i in range(32)] + [
        ("y", i / 8.0, i % 4 == 0) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "g string, score double, label boolean")
    out = calibration_bins(
        df, label_col="label", score_col="score", bins=4, group_cols=["g"]
    ).collect()
    for g, tot in (("x", 32), ("y", 8)):
        rows_g = [r for r in out if r["g"] == g]
        assert sum(r["n"] for r in rows_g) == tot
        # per-group brier_term denominates by the GROUP total
        brier = sum(r["brier_term"] for r in rows_g)
        want = sum(
            (s - (1.0 if l else 0.0)) ** 2 for gg, s, l in rows if gg == g
        ) / tot
        assert brier == pytest.approx(want, rel=1e-12)


def test_readability_counts_and_scores(spark):
    from patternly_spark.functions.text import with_readability

    df = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran! Did it?"),
            (2, "hello world"),          # no terminators -> 1 sentence
            (3, ""),                      # empty -> zero counts, NULL scores
            (4, "Rhythm myth"),           # y as vowel: 2 syllables
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in with_readability(df, "text").collect()}
    assert (out[1]["n_words"], out[1]["n_sentences"]) == (8, 3)
    assert out[2]["n_sentences"] == 1 and out[2]["n_words"] == 2
    assert out[3]["n_words"] == 0 and out[3]["flesch"] is None
    assert out[4]["n_syllables"] == 2
    # formula spot check on doc 2: hello(2)+world(1)=3 syllables
    w, s, y = 2.0, 1.0, 3.0
    assert out[2]["flesch"] == 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
    assert out[2]["fk_grade"] == 0.39 * (w / s) + 11.8 * (y / w) - 15.59


def test_ranking_metrics_hand_computed(spark):
    import math

    from patternly_spark.operators.model_eval import ranking_metrics

    u = 1 << 20
    # q1: rel at ranks 2,3 of 5; q2: rel at rank 1 only; q3: none (dropped)
    rows = (
        [(1, r, r in (2, 3)) for r in range(1, 6)]
        + [(2, r, r == 1) for r in range(1, 6)]
        + [(3, r, False) for r in range(1, 6)]
    )
    df = spark.createDataFrame(rows, "query_id long, rank int, rel boolean")
    out = {r["k"]: r for r in ranking_metrics(
        df, k_values=(1, 3), units=u
    ).collect()}
    assert out[1]["n_queries"] == 2
    # P@1: q1 0/1, q2 1/1 -> mean 1/2
    assert out[1]["mean_precision"] == (0 + 1) / (1 * 2)
    # P@3: q1 2/3, q2 1/3 -> (2+1)/(3*2)
    assert out[3]["mean_precision"] == 3 / 6
    # R@3: q1 2/2=1, q2 1/1=1 -> 1.0 exactly (quantization exact on 1.0)
    assert out[3]["mean_recall"] == 1.0
    # MRR@3: q1 1/2, q2 1/1 -> quantized floor then mean
    m1 = math.floor((1.0 / 2.0) * u)
    m2 = math.floor(1.0 * u)
    assert out[3]["mean_mrr"] == (m1 + m2) / (u * 2.0)
    # NDCG@3 replica
    disc = [math.floor((1.0 / math.log2(r + 1.0)) * u) for r in range(1, 4)]
    pref = [0, disc[0], disc[0] + disc[1], disc[0] + disc[1] + disc[2]]
    q1 = math.floor((disc[1] + disc[2]) / pref[2] * u)
    q2 = math.floor(disc[0] / pref[1] * u)
    assert out[3]["mean_ndcg"] == (q1 + q2) / (u * 2.0)


def test_ranking_metrics_perfect_ranking(spark):
    from patternly_spark.operators.model_eval import ranking_metrics

    rows = [(q, r, r <= 3) for q in range(5) for r in range(1, 11)]
    df = spark.createDataFrame(rows, "query_id long, rank int, rel boolean")
    out = {r["k"]: r for r in ranking_metrics(df, k_values=(3, 10)).collect()}
    # all 3 relevant in top-3: P@3 = R@3 = NDCG@3 = MRR = 1
    for m in ("mean_precision", "mean_recall", "mean_ndcg", "mean_mrr"):
        assert out[3][m] == 1.0, m
    assert out[10]["mean_precision"] == 3 / 10


def test_isotonic_matches_pava_reference(spark):
    from patternly_spark.operators.model_eval import isotonic_calibration

    # scores with a violation: raw rates 0.0, 1.0, 0.0, 1.0 by score
    rows = (
        [("g", 0.1, 0)] * 4
        + [("g", 0.2, 1)] * 2 + [("g", 0.2, 0)] * 1
        + [("g", 0.3, 0)] * 3 + [("g", 0.3, 1)] * 1
        + [("g", 0.4, 1)] * 5
    )
    df = spark.createDataFrame(rows, "g string, score double, label int")
    got = {
        r["score"]: r
        for r in isotonic_calibration(
            df, score_col="score", label_col="label", group_cols=["g"]
        ).collect()
    }
    # PAVA by hand: grid (y_sum, n) = (0,4), (2,3), (1,4), (5,5)
    # 2/3 > 1/4 violation -> merge to (3,7); 0/4 < 3/7 ok; 3/7 < 5/5 ok
    assert got[0.1]["fit"] == 0.0
    assert got[0.2]["fit"] == 3.0 / 7.0
    assert got[0.3]["fit"] == 3.0 / 7.0
    assert got[0.4]["fit"] == 1.0
    assert got[0.2]["n"] == 3 and got[0.2]["positives"] == 2
    # monotone
    fits = [got[s]["fit"] for s in sorted(got)]
    assert all(x <= y for x, y in zip(fits, fits[1:]))


def test_isotonic_partition_invariant_and_guard(spark):
    import pytest

    from patternly_spark.operators.model_eval import isotonic_calibration

    rows = [
        ("a", (i * 7 % 13) / 13.0, 1 if (i * 11 % 17) < ((i * 7 % 13) + 2) else 0)
        for i in range(200)
    ] + [("b", i / 10.0, i % 2) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, score double, label int")
    one = isotonic_calibration(
        df.coalesce(1), score_col="score", label_col="label", group_cols=["g"]
    ).orderBy("g", "score").collect()
    many = isotonic_calibration(
        df.repartition(32), score_col="score", label_col="label", group_cols=["g"]
    ).orderBy("g", "score").collect()
    assert [tuple(r) for r in one] == [tuple(r) for r in many]
    for g in ("a", "b"):
        fits = [r["fit"] for r in one if r["g"] == g]
        assert all(x <= y for x, y in zip(fits, fits[1:]))
    with pytest.raises(ValueError, match="max_grid"):
        isotonic_calibration(
            df, score_col="score", label_col="label", group_cols=["g"], max_grid=5
        )


def test_streaming_ranking_registry_equals_batch(spark, tmp_path):
    from patternly_spark.operators.model_eval import ranking_metrics
    from patternly_spark.streaming.evaluation import (
        ranking_registry_metrics,
        streaming_ranking_registry,
    )

    schema = "query_id long, rank int, rel boolean"
    # two batches of complete ranked lists for disjoint query sets
    b0 = [(q, r, (q + r) % 3 == 0) for q in range(20) for r in range(1, 11)]
    b1 = [(q, r, (q * r) % 4 == 1) for q in range(20, 50) for r in range(1, 11)]
    src = str(tmp_path / "src")
    spark.createDataFrame(b0, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)

    reg = str(tmp_path / "registry")
    q = streaming_ranking_registry(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        reg,
        checkpoint_path=str(tmp_path / "ckpt"),
        k_values=(1, 5, 10),
        trigger_once=True,
    )
    q.awaitTermination(120)

    got = ranking_registry_metrics(spark, reg, k_values=(1, 5, 10)).orderBy("k")
    want = ranking_metrics(
        spark.createDataFrame(b0 + b1, schema), k_values=(1, 5, 10)
    ).orderBy("k")
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_threshold_sweep_hand_computed(spark):
    from patternly_spark.operators.model_eval import threshold_sweep

    # scores: 0.9+, 0.7-, 0.5+, 0.3- (+ = label 1)
    rows = [(0.9, 1), (0.7, 0), (0.5, 1), (0.3, 0)]
    df = spark.createDataFrame(rows, "s double, l int")
    out = {r["threshold"]: r for r in threshold_sweep(
        df, score_col="s", label_col="l"
    ).collect()}
    assert len(out) == 4
    # t=0.9: tp=1 fp=0 fn=1 tn=2 -> P=1, R=.5, F1=2/3
    r = out[0.9]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (1, 0, 1, 2)
    assert r["precision"] == 1.0 and r["recall"] == 0.5
    assert r["f1"] == 2.0 / 3.0
    # t=0.5: tp=2 fp=1 fn=0 -> P=2/3, R=1, F1=4/5
    r = out[0.5]
    assert (r["tp"], r["fp"], r["fn"]) == (2, 1, 0)
    assert r["f1"] == 4.0 / 5.0 and r["is_best"]
    # t=0.3: tp=2 fp=2 -> F1=2/3; only one is_best
    assert sum(1 for r in out.values() if r["is_best"]) == 1


def test_threshold_sweep_grouped_partition_invariant_and_degenerate(spark):
    from patternly_spark.operators.model_eval import threshold_sweep

    rows = [("a", (i % 10) / 10.0, 1 if i % 3 == 0 else 0) for i in range(90)]
    rows += [("allneg", 0.5, 0), ("allneg", 0.7, 0)]
    df = spark.createDataFrame(rows, "g string, s double, l int")
    one = threshold_sweep(
        df.coalesce(1), score_col="s", label_col="l", group_cols=["g"]
    ).orderBy("g", "threshold").collect()
    many = threshold_sweep(
        df.repartition(32), score_col="s", label_col="l", group_cols=["g"]
    ).orderBy("g", "threshold").collect()
    assert [tuple(r) for r in one] == [tuple(r) for r in many]
    # degenerate all-negative group: recall NULL, f1 0/..>0? tp=0 -> f1 defined
    neg = [r for r in one if r["g"] == "allneg"]
    assert all(r["recall"] is None for r in neg)
    assert all(r["tp"] == 0 for r in neg)


def test_clustering_agreement_identical_independent_and_sklearn_form(spark):
    from patternly_spark.operators.model_eval import clustering_agreement

    # identical clusterings: ARI == rand == precision == recall == 1
    rows = [(i, i % 3, i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, a int, b int")
    out = clustering_agreement(df, label_a="a", label_b="b").collect()[0]
    assert out["ari"] == 1.0 and out["rand_index"] == 1.0
    assert out["pair_f1"] == 1.0
    # hand-computed 2x2 contingency [[2,1],[1,2]] (n=6)
    rows2 = (
        [(0, 0)] * 2 + [(0, 1)] * 1 + [(1, 0)] * 1 + [(1, 1)] * 2
    )
    df2 = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows2)], "id long, a int, b int"
    )
    o = clustering_agreement(df2, label_a="a", label_b="b").collect()[0]
    # same_both = C(2,2)*2 + C(1,2)*2 = 2; same_a = same_b = 2*C(3,2) = 6
    assert o["same_both"] == 2 and o["same_a"] == 6 and o["same_b"] == 6
    assert o["total_pairs"] == 15
    tp, sa, sb, tot = 2.0, 6.0, 6.0, 15.0
    exp = sa * sb / tot
    assert o["ari"] == (tp - exp) / ((sa + sb) / 2.0 - exp)
    assert o["rand_index"] == (tp + (tot - sa - sb + tp)) / tot
    assert o["pair_f1"] == 2 * tp / (sa + sb)
    # trivial clusterings (everything one cluster in both): ARI NULL
    df3 = spark.createDataFrame([(i, 0, 0) for i in range(5)], "id long, a int, b int")
    o3 = clustering_agreement(df3, label_a="a", label_b="b").collect()[0]
    assert o3["ari"] is None and o3["rand_index"] == 1.0
