"""Round-6 additions: Mondrian + marginal split-conformal calibration and
the Poisson-bootstrap CI."""

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# conformal_calibration (Mondrian / group-conditional)
# ---------------------------------------------------------------------------


def test_mondrian_conformal_per_group_quantiles(spark):
    """Two groups with different score scales: each group gets ITS OWN
    q_hat and coverage — the marginal quantile would over-cover the
    small-scale group and under-cover the large-scale one."""
    from patternly_spark.operators.model_eval import conformal_calibration

    cal = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 100)]
        + [("b", float(10 * i)) for i in range(1, 100)],
        "g string, s double",
    )
    test = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 101)]
        + [("b", float(10 * i)) for i in range(1, 101)],
        "g string, s double",
    )
    out = {
        r["g"]: r
        for r in conformal_calibration(
            cal, test, score_col="s", alphas=(0.1,), by="g"
        ).collect()
    }
    assert out["a"]["q_hat"] == 90.0 and out["b"]["q_hat"] == 900.0
    assert out["a"]["coverage"] == 0.9 and out["b"]["coverage"] == 0.9


# ---------------------------------------------------------------------------
# conformal_calibration
# ---------------------------------------------------------------------------


def test_conformal_quantile_hand_computed(spark):
    """cal = 1..99, alpha = 0.1: k = ceil(100 * 0.9) = 90 -> q_hat = 90;
    test = 1..100 -> coverage = 90/100."""
    from patternly_spark.operators.model_eval import conformal_calibration

    cal = spark.createDataFrame([(float(i),) for i in range(1, 100)], "s double")
    test = spark.createDataFrame([(float(i),) for i in range(1, 101)], "s double")
    out = conformal_calibration(cal, test, score_col="s", alphas=(0.1,)).collect()[0]
    assert out["n_cal"] == 99 and out["k"] == 90
    assert out["q_hat"] == 90.0
    assert out["n_test"] == 100 and out["n_covered"] == 90
    assert out["coverage"] == 0.9


def test_conformal_vacuous_alpha_gives_null_qhat(spark):
    """k > n (tiny calibration set): q_hat NULL, coverage 1.0 — the
    infinite-interval convention."""
    from patternly_spark.operators.model_eval import conformal_calibration

    cal = spark.createDataFrame([(1.0,), (2.0,)], "s double")
    test = spark.createDataFrame([(9.9,), (0.1,)], "s double")
    out = conformal_calibration(cal, test, score_col="s", alphas=(0.1,)).collect()[0]
    # k = ceil(3 * 0.9) = 3 > n_cal = 2
    assert out["k"] == 3 and out["q_hat"] is None
    assert out["coverage"] == 1.0


def test_conformal_guarantee_on_exchangeable_data(spark):
    """Exchangeable scores: empirical coverage >= 1 - alpha (the
    finite-sample guarantee, deterministic here via the fixed coin)."""
    from patternly_spark.operators.model_eval import conformal_calibration
    from patternly_spark.operators.sampling import hash_fraction

    df = spark.createDataFrame(
        [(i, float((i * 2654435761) % 10007)) for i in range(4000)],
        "id long, s double",
    )
    is_cal = hash_fraction(F.col("id")) < 0.5
    out = conformal_calibration(
        df.filter(is_cal), df.filter(~is_cal), score_col="s", alphas=(0.1, 0.2)
    ).collect()
    for r in out:
        assert r["coverage"] >= 1.0 - r["alpha"] - 0.02  # finite-sample slack


# ---------------------------------------------------------------------------
# poisson_bootstrap_ci
# ---------------------------------------------------------------------------


def test_poisson_bootstrap_interval_brackets_mean(spark):
    from patternly_spark.operators.drift import poisson_bootstrap_ci

    rows = [(i, 1000 + (i % 200)) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, cents long")
    out = poisson_bootstrap_ci(df, "cents", key_col="id", replicates=64).collect()[0]
    assert out["n"] == 5000 and out["replicates"] == 64
    assert out["lo_cents"] < out["mean_cents"] < out["hi_cents"]
    # a tight population: the CI is narrow relative to the spread
    assert out["hi_cents"] - out["lo_cents"] < 20.0
    # deterministic
    again = poisson_bootstrap_ci(df, "cents", key_col="id", replicates=64).collect()[0]
    assert tuple(out) == tuple(again)


def test_poisson_bootstrap_python_replica(spark):
    """Replicate means match a plain-Python replay of the identical
    md5 coin + integer CDF cutoffs — the engine adds distribution,
    never new math."""
    import hashlib
    import math

    from patternly_spark.operators.drift import poisson_bootstrap_ci

    rows = [(i, 100 * (i + 1)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, cents long")
    B = 8
    out = poisson_bootstrap_ci(
        df, "cents", key_col="id", replicates=B, ci=0.5
    ).collect()[0]

    cdf, cuts = 0.0, []
    for k in range(8):
        cdf += math.exp(-1.0) / math.factorial(k)
        cuts.append(math.floor(cdf * float(2**32)))
    means = []
    for b in range(B):
        sw = nw = 0
        for i, cents in rows:
            u = int(hashlib.md5(f"{i}:{b}".encode()).hexdigest()[:8], 16)
            w = sum(1 for c in cuts if u >= c)
            sw += w * cents
            nw += w
        means.append(sw / nw if nw else None)
    ms = sorted(m for m in means if m is not None)
    lo_rank = max(1, math.ceil(B * 0.25))
    hi_rank = min(B, math.ceil(B * 0.75))
    assert out["lo_cents"] == ms[lo_rank - 1]
    assert out["hi_cents"] == ms[hi_rank - 1]


def test_poisson_bootstrap_validates_params(spark):
    from patternly_spark.operators.drift import poisson_bootstrap_ci

    df = spark.createDataFrame([(1, 1)], "id long, cents long")
    with pytest.raises(ValueError, match="replicates"):
        poisson_bootstrap_ci(df, "cents", key_col="id", replicates=2)
    with pytest.raises(ValueError, match="ci"):
        poisson_bootstrap_ci(df, "cents", key_col="id", ci=1.5)


def test_streaming_bootstrap_registry_equals_batch(spark, tmp_path):
    """Additive-sufficient-stats law: the folded registry after all
    triggers finalizes to EXACTLY the batch poisson_bootstrap_ci over
    the union — including the interval bounds (every replicate weight
    depends only on (key, b), so batch boundaries cannot move it)."""
    from patternly_spark.operators.drift import poisson_bootstrap_ci
    from patternly_spark.streaming.drift import (
        bootstrap_ci_from_registry,
        streaming_bootstrap_registry,
    )

    rows = [(i, 500 + 7 * (i % 97)) for i in range(900)]
    df = spark.createDataFrame(rows, "id long, cents long")
    src = str(tmp_path / "src")
    for lo, hi in [(0, 300), (300, 600), (600, 900)]:
        spark.createDataFrame(
            [r for r in rows if lo <= r[0] < hi], "id long, cents long"
        ).coalesce(1).write.mode("append").parquet(src)

    q = streaming_bootstrap_registry(
        spark.readStream.schema("id long, cents long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        str(tmp_path / "reg"),
        checkpoint_path=str(tmp_path / "ckpt"),
        value_cents_col="cents",
        key_col="id",
        replicates=16,
        trigger_once=True,
    )
    q.awaitTermination(120)

    got = bootstrap_ci_from_registry(spark, str(tmp_path / "reg")).collect()[0]
    want = poisson_bootstrap_ci(
        df, "cents", key_col="id", replicates=16
    ).collect()[0]
    assert tuple(got) == tuple(want)


def test_poisson_bootstrap_ratio_mode(spark):
    """Ratio statistic: per-replicate weighted num/den; the full-frame
    point estimate is sum(num)/sum(den); interval brackets it on a
    tight synthetic population."""
    from patternly_spark.operators.drift import poisson_bootstrap_ci

    rows = [(i, 200 + (i % 11), 100 + (i % 7)) for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, num long, den long")
    out = poisson_bootstrap_ci(
        df, "num", key_col="id", denom_cents_col="den", replicates=64
    ).collect()[0]
    want_point = sum(r[1] for r in rows) / sum(r[2] for r in rows)
    assert out["mean_cents"] == want_point
    assert out["lo_cents"] < want_point < out["hi_cents"]
    assert out["hi_cents"] - out["lo_cents"] < 0.2  # tight population


def test_ranking_metric_ci_brackets_point_estimate(spark):
    """The interval brackets the full-sample metric, and the metric
    value equals ranking_metrics' mean for the same k."""
    import random

    from patternly_spark.operators.model_eval import (
        ranking_metric_ci,
        ranking_metrics,
    )

    rng = random.Random(5)
    rows = [
        (q, r, rng.random() < (0.8 if r <= 3 else 0.3))
        for q in range(80)
        for r in range(1, 11)
    ]
    df = spark.createDataFrame(rows, "query_id long, rank int, rel boolean")
    out = ranking_metric_ci(df, metric="ndcg", k=10, replicates=32).collect()[0]
    point = {
        r["k"]: r["mean_ndcg"] for r in ranking_metrics(df, k_values=(10,)).collect()
    }[10]
    assert out["value"] == point
    assert out["lo"] <= point <= out["hi"]
    assert out["lo"] < out["hi"]

    # per-metric routing + guards
    p = ranking_metric_ci(df, metric="precision", k=5, replicates=16).collect()[0]
    assert 0.0 <= p["lo"] <= p["value"] <= p["hi"] <= 1.0
    import pytest

    with pytest.raises(ValueError, match="metric"):
        ranking_metric_ci(df, metric="f1")


def test_bootstrap_lift_detects_planted_effect_and_not_null(spark):
    from patternly_spark.operators.drift import bootstrap_lift_ci

    # planted +300c lift, tight noise -> interval excludes 0
    rows = [(i, "t" if i % 2 else "c", 1000 + (i % 50) + (300 if i % 2 else 0))
            for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, arm string, cents long")
    out = bootstrap_lift_ci(df, "cents", key_col="id", arm_col="arm").collect()[0]
    assert out["arm_control"] == "c" and out["arm_treatment"] == "t"
    assert out["significant"] and out["lo_cents"] > 0
    assert abs(out["lift_cents"] - 300.0) < 5.0

    # exchangeable arms -> interval contains 0
    null_rows = [(i, "t" if i % 2 else "c", 1000 + ((i * 7) % 211)) for i in range(2000)]
    ndf = spark.createDataFrame(null_rows, "id long, arm string, cents long")
    nout = bootstrap_lift_ci(ndf, "cents", key_col="id", arm_col="arm").collect()[0]
    assert not nout["significant"]

    import pytest

    three = spark.createDataFrame([(1, "a", 1), (2, "b", 1), (3, "x", 1)],
                                  "id long, arm string, cents long")
    with pytest.raises(ValueError, match="2 arms"):
        bootstrap_lift_ci(three, "cents", key_col="id", arm_col="arm")


def test_streaming_conformal_monitor_equals_batch(spark, tmp_path):
    """Frozen-q_hat union-parity: the coverage table from the folded
    registry after all triggers equals conformal_calibration(cal,
    union-of-stream) for the SAME calibration set, per group."""
    from patternly_spark.operators.model_eval import conformal_calibration
    from patternly_spark.streaming.evaluation import (
        conformal_coverage_from_registry,
        streaming_conformal_monitor,
    )

    cal = spark.createDataFrame(
        [("a", float(i)) for i in range(1, 100)]
        + [("b", float(2 * i)) for i in range(1, 100)],
        "g string, s double",
    )
    test_rows = [("a", float((i * 13) % 140)) for i in range(120)] + [
        ("b", float((i * 29) % 260)) for i in range(120)
    ]
    df = spark.createDataFrame(test_rows, "g string, s double")
    src = str(tmp_path / "src")
    for lo, hi in [(0, 80), (80, 160), (160, 240)]:
        spark.createDataFrame(
            test_rows[lo:hi], "g string, s double"
        ).coalesce(1).write.mode("append").parquet(src)

    # the frozen calibration quantiles (q_hat only depends on cal; the
    # test side must cover every group for its rows to appear)
    qhat = conformal_calibration(
        cal, cal, score_col="s", alphas=(0.1, 0.2), by="g"
    ).select("g", "alpha", "q_hat")

    q = streaming_conformal_monitor(
        spark.readStream.schema("g string, s double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        qhat,
        str(tmp_path / "reg"),
        checkpoint_path=str(tmp_path / "ckpt"),
        score_col="s",
        by="g",
        trigger_once=True,
    )
    q.awaitTermination(120)

    got = {
        (r["g"], r["alpha"]): (r["n_test"], r["n_covered"], r["coverage"], r["holding"])
        for r in conformal_coverage_from_registry(
            spark, str(tmp_path / "reg")
        ).collect()
    }
    want = {
        (r["g"], r["alpha"]): (
            r["n_test"],
            r["n_covered"],
            r["coverage"],
            r["coverage"] >= 1.0 - r["alpha"],
        )
        for r in conformal_calibration(
            cal, df, score_col="s", alphas=(0.1, 0.2), by="g"
        ).collect()
    }
    assert got == want and len(got) == 4


def test_quantile_lift_hand_computed(spark):
    """Control 1..100, treatment 1..100 shifted +50: every tau's lift
    is exactly 50 (type-1 quantiles of identical shapes shift rigidly);
    guards raise on bad taus / arm counts."""
    from patternly_spark.operators.drift import quantile_lift

    rows = [(i, "a", i) for i in range(1, 101)] + [
        (100 + i, "b", i + 50) for i in range(1, 101)
    ]
    df = spark.createDataFrame(rows, "id long, arm string, cents long")
    out = {r["tau"]: r for r in quantile_lift(df, "cents", arm_col="arm").collect()}
    assert set(out) == {0.25, 0.5, 0.75}
    for tau, r in out.items():
        k = -(-int(tau * 100) // 1)  # ceil(tau*100) for these taus
        assert r["q_control_cents"] == k
        assert r["q_treatment_cents"] == k + 50
        assert r["lift_cents"] == 50
        assert r["n_control"] == 100 and r["n_treatment"] == 100

    import pytest

    with pytest.raises(ValueError, match="taus"):
        quantile_lift(df, "cents", arm_col="arm", taus=(1.5,))
    three = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "x", 1)], "id long, arm string, cents long"
    )
    with pytest.raises(ValueError, match="2 arms"):
        quantile_lift(three, "cents", arm_col="arm")


def test_quantile_lift_one_arm_group_surfaces_with_nulls(spark):
    """With by=, a group where only one arm has rows must still appear —
    NULLs on the missing arm's columns, NULL lift — instead of being
    silently dropped by the group/tau join (assignment-imbalance
    visibility)."""
    from patternly_spark.operators.drift import quantile_lift

    rows = (
        [(i, "a", "g1", i) for i in range(1, 11)]
        + [(100 + i, "b", "g1", i + 5) for i in range(1, 11)]
        + [(200 + i, "a", "g2", i) for i in range(1, 11)]  # g2: control only
        + [(300 + i, "b", "g3", i) for i in range(1, 11)]  # g3: treatment only
    )
    df = spark.createDataFrame(rows, "id long, arm string, seg string, cents long")
    out = quantile_lift(df, "cents", arm_col="arm", by="seg", taus=(0.5,)).collect()
    by_seg = {r["seg"]: r for r in out}
    assert set(by_seg) == {"g1", "g2", "g3"}
    assert by_seg["g1"]["lift_cents"] == 5
    g2, g3 = by_seg["g2"], by_seg["g3"]
    assert g2["n_control"] == 10 and g2["n_treatment"] is None
    assert g2["q_treatment_cents"] is None and g2["lift_cents"] is None
    assert g3["n_treatment"] == 10 and g3["n_control"] is None
    assert g3["q_control_cents"] is None and g3["lift_cents"] is None
    assert g3["tau"] == 0.5  # join keys survive the outer join


def test_diff_in_diff_hand_computed(spark):
    """Control units drift +10; treated units drift +10 plus a +50
    effect: DiD recovers exactly 50 with the Welch z of the unit
    deltas."""
    from patternly_spark.operators.drift import diff_in_diff

    rows = []
    for u in range(10):  # control: pre = 100+u, post = 110+u (+noise u%3)
        rows.append((u, "a", 0, 100 + u))
        rows.append((u, "a", 1, 110 + u + (u % 3)))
    for u in range(10, 22):  # treatment: same drift + 50
        rows.append((u, "b", 0, 100 + u))
        rows.append((u, "b", 1, 160 + u + (u % 3)))
    df = spark.createDataFrame(rows, "unit long, arm string, is_post int, cents long")
    out = diff_in_diff(
        df, "cents", unit_col="unit", arm_col="arm", is_post_col="is_post"
    ).collect()[0]
    import numpy as np

    dc = np.array([10 + (u % 3) for u in range(10)], dtype=float)
    dt = np.array([60 + (u % 3) for u in range(10, 22)], dtype=float)
    assert out["n_control"] == 10 and out["n_treatment"] == 12
    assert out["did_cents"] == pytest.approx(dt.mean() - dc.mean())
    se = np.sqrt(dt.var(ddof=1) / 12 + dc.var(ddof=1) / 10)
    assert out["se"] == pytest.approx(se)
    assert out["z"] == pytest.approx((dt.mean() - dc.mean()) / se)
    # units appearing only pre (delta = -pre) still count: contract is
    # per-unit sums, documented
    with pytest.raises(ValueError, match="2 arms"):
        diff_in_diff(
            spark.createDataFrame([(1, "x", 0, 5)], "unit long, arm string, is_post int, cents long"),
            "cents", unit_col="unit", arm_col="arm", is_post_col="is_post",
        )


def test_mann_whitney_hand_computed_with_ties(spark):
    """Tiny two-sample with ties, U/mu/sigma/z checked against the
    textbook construction (average ranks, tie-corrected variance)."""
    from patternly_spark.operators.drift import mann_whitney_u

    a = [1, 2, 2, 5]          # control
    b = [2, 6, 7, 8, 8]       # treatment
    rows = [(i, "a", v) for i, v in enumerate(a)] + [
        (100 + i, "b", v) for i, v in enumerate(b)
    ]
    df = spark.createDataFrame(rows, "id long, arm string, cents long")
    out = mann_whitney_u(df, "cents", arm_col="arm").collect()[0]

    import numpy as np

    pooled = sorted(a + b)
    # average ranks
    def avg_rank(v):
        idx = [i + 1 for i, x in enumerate(pooled) if x == v]
        return sum(idx) / len(idx)

    r_t = sum(avg_rank(v) for v in b)
    n1, n2 = len(a), len(b)
    u = r_t - n2 * (n2 + 1) / 2
    mu = n1 * n2 / 2
    nn = n1 + n2
    from collections import Counter

    tie = sum(c**3 - c for c in Counter(pooled).values())
    sigma = np.sqrt((n1 * n2 / 12) * ((nn + 1) - tie / (nn * (nn - 1))))
    assert out["n_control"] == n1 and out["n_treatment"] == n2
    assert out["u_treatment"] == pytest.approx(u)
    assert out["mu"] == pytest.approx(mu)
    assert out["sigma"] == pytest.approx(sigma)
    assert out["z"] == pytest.approx((u - mu) / sigma)


def test_mann_whitney_rank_shift_invariance(spark):
    """Rank test law: multiplying one whale's value by 1000 moves
    nothing (same ranks), while the mean-based lift would explode."""
    from patternly_spark.operators.drift import mann_whitney_u

    rows = [(i, "a", 10 + i) for i in range(20)] + [
        (100 + i, "b", 15 + i) for i in range(20)
    ]
    base = spark.createDataFrame(rows, "id long, arm string, cents long")
    whale = spark.createDataFrame(
        rows[:-1] + [(119, "b", (15 + 19) * 1000)], "id long, arm string, cents long"
    )
    z1 = mann_whitney_u(base, "cents", arm_col="arm").collect()[0]["z"]
    z2 = mann_whitney_u(whale, "cents", arm_col="arm").collect()[0]["z"]
    assert z1 == z2


def test_streaming_did_registry_equals_batch(spark, tmp_path):
    """Additive per-unit sums: finalize after 3 triggers == batch
    diff_in_diff over the union, tuple-exact — a unit's pre and post
    rows arrive in DIFFERENT batches and still reconstruct."""
    from patternly_spark.operators.drift import diff_in_diff
    from patternly_spark.streaming.drift import (
        did_from_registry,
        streaming_did_registry,
    )

    rows = []
    for u in range(30):
        arm = "a" if u % 2 == 0 else "b"
        rows.append((u, arm, 0, 100 + u))
        rows.append((u, arm, 1, 130 + u + (u % 5) + (20 if arm == "b" else 0)))
    schema = "unit long, arm string, is_post int, cents long"
    df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "src")
    # slice by row parity so pre/post of the same unit straddle batches
    thirds = [rows[0::3], rows[1::3], rows[2::3]]
    for b in thirds:
        spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(src)

    q = streaming_did_registry(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        str(tmp_path / "reg"),
        checkpoint_path=str(tmp_path / "ckpt"),
        unit_col="unit",
        arm_col="arm",
        is_post_col="is_post",
        value_cents_col="cents",
        trigger_once=True,
    )
    q.awaitTermination(120)

    got = did_from_registry(spark, str(tmp_path / "reg")).collect()[0]
    want = diff_in_diff(
        df, "cents", unit_col="unit", arm_col="arm", is_post_col="is_post"
    ).collect()[0]
    assert tuple(got) == tuple(want)


def test_streaming_rank_test_registry_equals_batch(spark, tmp_path):
    """Additive value-grid counts: finalize after 3 triggers == batch
    mann_whitney_u over the union, tuple-exact (incl. tie correction —
    ties straddle batches)."""
    from patternly_spark.operators.drift import mann_whitney_u
    from patternly_spark.streaming.drift import (
        mwu_from_registry,
        streaming_rank_test_registry,
    )

    rows = [(i, "a" if i % 2 == 0 else "b", (i * 7) % 40) for i in range(120)]
    schema = "id long, arm string, cents long"
    df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "src")
    for b in [rows[0::3], rows[1::3], rows[2::3]]:
        spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(src)

    q = streaming_rank_test_registry(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        str(tmp_path / "reg"),
        checkpoint_path=str(tmp_path / "ckpt"),
        arm_col="arm",
        value_cents_col="cents",
        trigger_once=True,
    )
    q.awaitTermination(120)

    got = mwu_from_registry(spark, str(tmp_path / "reg")).collect()[0]
    want = mann_whitney_u(df, "cents", arm_col="arm").collect()[0]
    assert tuple(got) == tuple(want)
    # state is value-grid-sized: <= 40 distinct values x 2 arms
    from patternly_spark.streaming.exactly_once import read_registry

    assert read_registry(spark, str(tmp_path / "reg")).count() <= 80

    # the SAME registry serves the KS readout (ST40): finalize ==
    # batch ks_two_sample over the union, tuple-exact
    from patternly_spark.operators.drift import ks_two_sample
    from patternly_spark.streaming.drift import ks_from_registry

    ks_got = ks_from_registry(spark, str(tmp_path / "reg")).collect()[0]
    ks_want = ks_two_sample(df, "cents", arm_col="arm").collect()[0]
    assert tuple(ks_got) == tuple(ks_want)

    # ...and the rest of the two-sample panel (ST41): Brown-Forsythe,
    # TOST, power/MDE, SRM — all exact over the same grid, margins and
    # design ratios as READOUT-time parameters
    from patternly_spark.operators.drift import (
        brown_forsythe,
        power_mde,
        srm_check,
        tost_equivalence,
    )
    from patternly_spark.streaming.drift import (
        brown_forsythe_from_registry,
        power_mde_from_registry,
        srm_from_registry,
        tost_from_registry,
    )

    reg_path = str(tmp_path / "reg")
    assert tuple(brown_forsythe_from_registry(spark, reg_path).collect()[0]) == tuple(
        brown_forsythe(df, "cents", arm_col="arm").collect()[0]
    )
    assert tuple(
        tost_from_registry(spark, reg_path, margin_cents=5.0).collect()[0]
    ) == tuple(
        tost_equivalence(df, "cents", arm_col="arm", margin_cents=5.0).collect()[0]
    )
    assert tuple(power_mde_from_registry(spark, reg_path).collect()[0]) == tuple(
        power_mde(df, "cents", arm_col="arm").collect()[0]
    )
    assert tuple(
        srm_from_registry(spark, reg_path, expected_control=0.5).collect()[0]
    ) == tuple(srm_check(df, arm_col="arm", expected_control=0.5).collect()[0])


def test_streaming_rank_test_registry_bounded_state(spark, tmp_path):
    """ST42 (round-9 verdict item 1): on a HIGH-CARDINALITY continuous
    domain the ST36 grid approaches row count; ``quantize_to`` bounds
    state to (range/q + 1) * 2 rows regardless of stream length, and
    every readout of the quantized registry is TUPLE-EXACT against its
    batch operator over the pre-quantized values (the documented
    contract: the registry answers exactly for the quantized metric).
    Negative values pin the floor-aligned bucket arithmetic."""
    from patternly_spark.operators.drift import (
        brown_forsythe,
        ks_two_sample,
        mann_whitney_u,
        power_mde,
        srm_check,
        tost_equivalence,
    )
    from patternly_spark.streaming.drift import (
        brown_forsythe_from_registry,
        ks_from_registry,
        mwu_from_registry,
        power_mde_from_registry,
        srm_from_registry,
        streaming_rank_test_registry,
        tost_from_registry,
    )
    from patternly_spark.streaming.exactly_once import read_registry

    # ~3000 distinct raw values spread over [-50_000, 50_000): the
    # unbounded grid would hold ~3000 rows/arm and keep growing
    rows = [
        (i, "a" if i % 2 == 0 else "b", ((i * 7919) % 100_000) - 50_000)
        for i in range(3000)
    ]
    schema = "id long, arm string, cents long"
    src = str(tmp_path / "src")
    for b in [rows[0::3], rows[1::3], rows[2::3]]:
        spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(src)

    qz = 1000
    q = streaming_rank_test_registry(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        str(tmp_path / "reg"),
        checkpoint_path=str(tmp_path / "ckpt"),
        arm_col="arm",
        value_cents_col="cents",
        quantize_to=qz,
        trigger_once=True,
    )
    q.awaitTermination(120)

    reg_path = str(tmp_path / "reg")
    # state-size contract: <= (range/q + 1) buckets x 2 arms, NOT ~3000
    n_state = read_registry(spark, reg_path).count()
    assert n_state <= (100_000 // qz + 1) * 2, n_state
    assert n_state < 300  # an order below the raw distinct-value grid

    # the quantized batch twin: bucket midpoint, floor-aligned (Python
    # % is floor-mod, matching pmod)
    qrows = [(i, a, v - (v % qz) + qz // 2) for (i, a, v) in rows]
    qdf = spark.createDataFrame(qrows, schema)

    assert tuple(mwu_from_registry(spark, reg_path).collect()[0]) == tuple(
        mann_whitney_u(qdf, "cents", arm_col="arm").collect()[0]
    )
    assert tuple(ks_from_registry(spark, reg_path).collect()[0]) == tuple(
        ks_two_sample(qdf, "cents", arm_col="arm").collect()[0]
    )
    assert tuple(brown_forsythe_from_registry(spark, reg_path).collect()[0]) == tuple(
        brown_forsythe(qdf, "cents", arm_col="arm").collect()[0]
    )
    assert tuple(
        tost_from_registry(spark, reg_path, margin_cents=500.0).collect()[0]
    ) == tuple(
        tost_equivalence(qdf, "cents", arm_col="arm", margin_cents=500.0).collect()[0]
    )
    assert tuple(power_mde_from_registry(spark, reg_path).collect()[0]) == tuple(
        power_mde(qdf, "cents", arm_col="arm").collect()[0]
    )
    assert tuple(
        srm_from_registry(spark, reg_path, expected_control=0.5).collect()[0]
    ) == tuple(srm_check(qdf, arm_col="arm", expected_control=0.5).collect()[0])

    with pytest.raises(ValueError, match="quantize_to"):
        streaming_rank_test_registry(
            spark.readStream.schema(schema).parquet(src),
            reg_path,
            checkpoint_path=str(tmp_path / "ckpt2"),
            arm_col="arm",
            value_cents_col="cents",
            quantize_to=0,
        )


def test_streaming_contingency_registry_equals_batch(spark, tmp_path):
    """ST43: additive (row, col) cell counts — finalize after 3 triggers
    == batch chi2_independence over the union, tuple-exact (cells
    straddle batches; alpha is a readout-time parameter)."""
    from patternly_spark.operators.drift import chi2_independence
    from patternly_spark.streaming.drift import (
        chi2_independence_from_registry,
        streaming_contingency_registry,
    )
    from patternly_spark.streaming.exactly_once import read_registry

    rows = [("s" + str(i % 3), "c" + str((i * 7) % 5)) for i in range(150)]
    schema = "seg string, cat string"
    df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "src")
    for b in [rows[0::3], rows[1::3], rows[2::3]]:
        spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(src)

    q = streaming_contingency_registry(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        str(tmp_path / "reg"),
        checkpoint_path=str(tmp_path / "ckpt"),
        row_col="seg",
        col_col="cat",
        trigger_once=True,
    )
    q.awaitTermination(120)

    got = chi2_independence_from_registry(spark, str(tmp_path / "reg")).collect()
    want = chi2_independence(df, row_col="seg", col_col="cat").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # state is cell-sized: <= 3 x 5 observed category pairs
    assert read_registry(spark, str(tmp_path / "reg")).count() <= 15
    # alpha is a readout-time parameter
    strict = chi2_independence_from_registry(
        spark, str(tmp_path / "reg"), alpha=1e-12
    ).collect()[0]
    assert strict["dependent"] is False


def test_streaming_rate_registry_equals_batch(spark, tmp_path):
    """ST44: additive per-arm (units, events, exposure) triples —
    finalize after 3 triggers == batch poisson_rate_test over the
    union, tuple-exact; alpha is a readout-time parameter; state is
    arm-sized (2 rows)."""
    from patternly_spark.operators.drift import poisson_rate_test
    from patternly_spark.streaming.drift import (
        poisson_rate_from_registry,
        streaming_rate_registry,
    )
    from patternly_spark.streaming.exactly_once import read_registry

    rows = [
        ("a" if i % 2 == 0 else "b", (i * 3) % 7, 5 + (i % 11))
        for i in range(120)
    ]
    schema = "arm string, ev long, exp long"
    df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "src")
    for b in [rows[0::3], rows[1::3], rows[2::3]]:
        spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(src)

    q = streaming_rate_registry(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        str(tmp_path / "reg"),
        checkpoint_path=str(tmp_path / "ckpt"),
        arm_col="arm",
        events_col="ev",
        exposure_col="exp",
        trigger_once=True,
    )
    q.awaitTermination(120)

    got = poisson_rate_from_registry(spark, str(tmp_path / "reg")).collect()[0]
    want = poisson_rate_test(
        df, arm_col="arm", events_col="ev", exposure_col="exp"
    ).collect()[0]
    assert tuple(got) == tuple(want)
    assert read_registry(spark, str(tmp_path / "reg")).count() == 2
    strict = poisson_rate_from_registry(
        spark, str(tmp_path / "reg"), alpha=1e-12
    ).collect()[0]
    assert strict["significant"] is False


def test_arm_gap_timeline_hand_computed(spark):
    """Per-period clustered gap: hand case incl. a period where one arm
    is absent (NULLs, the one-arm-visibility convention) and a unit
    with multiple rows in a period (clustered sum, not row mean)."""
    from patternly_spark.operators.drift import arm_gap_timeline

    rows = [
        # period 0: a-units {1: 10+20, 2: 30}; b-units {3: 40}
        (1, "a", 0, 10), (1, "a", 0, 20), (2, "a", 0, 30), (3, "b", 0, 40),
        # period 1: only treatment
        (3, "b", 1, 70),
    ]
    df = spark.createDataFrame(rows, "unit long, arm string, period long, cents long")
    out = {r["period"]: r for r in arm_gap_timeline(
        df, "cents", unit_col="unit", arm_col="arm", period_col="period"
    ).collect()}
    p0 = out[0]
    assert p0["n_control"] == 2 and p0["n_treatment"] == 1
    assert p0["mean_control_cents"] == pytest.approx((30 + 30) / 2)
    assert p0["mean_treatment_cents"] == 40.0
    assert p0["gap_cents"] == pytest.approx(40 - 30)
    p1 = out[1]
    assert p1["n_control"] is None and p1["gap_cents"] is None
    assert p1["mean_treatment_cents"] == 70.0
    with pytest.raises(ValueError, match="2 arms"):
        arm_gap_timeline(
            spark.createDataFrame([(1, "x", 0, 1)], "unit long, arm string, period long, cents long"),
            "cents", unit_col="unit", arm_col="arm", period_col="period",
        )
