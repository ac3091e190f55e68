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
