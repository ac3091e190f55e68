"""Round-9 operators: two-sample KS (drift.ks_two_sample) and
cluster-robust lift (drift.cluster_robust_lift)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from patternly_spark.operators.drift import cluster_robust_lift, ks_two_sample


def _ks_reference(a, b):
    """From-scratch two-sample KS on integer samples: exact rational D
    via the pooled distinct-value grid, then the Kolmogorov limiting p
    with the engine's 2^-20 exp quantization — an independent
    implementation path (per-sample ECDFs, no window)."""
    a, b = np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64)
    vals = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), vals, side="right")
    fb = np.searchsorted(np.sort(b), vals, side="right")
    dnum = np.max(np.abs(fa * len(b) - fb * len(a)))
    d = dnum / (len(a) * len(b))
    ne = len(a) * len(b) / (len(a) + len(b))
    lam = (np.sqrt(ne) + 0.12 + 0.11 / np.sqrt(ne)) * d
    g = float(1 << 20)
    q = lambda x: np.floor(np.exp(x) * g) / g
    p = 2.0 * (
        q(-2 * lam**2) - q(-8 * lam**2) + q(-18 * lam**2)
        - q(-32 * lam**2) + q(-50 * lam**2)
    )
    return d, lam, min(1.0, max(0.0, p))


def _to_df(spark, a, b):
    rows = [("a", int(v)) for v in a] + [("b", int(v)) for v in b]
    return spark.createDataFrame(rows, "arm string, cents long")


def test_ks_matches_numpy_reference(spark):
    rng = np.random.default_rng(7)
    a = rng.integers(0, 500, 400)
    b = rng.integers(0, 500, 300) + rng.integers(0, 60, 300)
    out = ks_two_sample(_to_df(spark, a, b), "cents", arm_col="arm").collect()[0]
    d, lam, p = _ks_reference(a, b)
    assert out["n_control"] == 400 and out["n_treatment"] == 300
    assert out["d_stat"] == pytest.approx(d, rel=1e-12)
    assert out["ks_lambda"] == pytest.approx(lam, rel=1e-12)
    assert out["p_value"] == pytest.approx(p, rel=1e-9)


def test_ks_fires_on_variance_shift_that_rank_test_misses(spark):
    """The reason KS earns a row beside q252: equal-median arms with
    different spread — Mann-Whitney z stays small, KS p goes tiny."""
    from patternly_spark.operators.drift import mann_whitney_u

    rng = np.random.default_rng(3)
    a = np.round(rng.normal(0, 10, 2500)).astype(int)
    b = np.round(rng.normal(0, 40, 2500)).astype(int)  # same center, 4x spread
    df = _to_df(spark, a, b)
    ks = ks_two_sample(df, "cents", arm_col="arm").collect()[0]
    mwu = mann_whitney_u(df, "cents", arm_col="arm").collect()[0]
    assert ks["p_value"] < 1e-6
    assert abs(mwu["z"]) < 3.0


def test_ks_identical_and_degenerate(spark):
    rng = np.random.default_rng(5)
    a = rng.integers(0, 100, 300)
    out = ks_two_sample(_to_df(spark, a, a), "cents", arm_col="arm").collect()[0]
    assert out["d_stat"] == 0.0 and out["p_value"] == 1.0
    # by= group where one arm is empty -> NULL stats, row still emitted
    rows = [("g1", "a", 1), ("g1", "b", 2), ("g1", "a", 3), ("g1", "b", 5),
            ("g2", "a", 1), ("g2", "a", 2)]
    df = spark.createDataFrame(rows, "grp string, arm string, cents long")
    got = {r["grp"]: r for r in
           ks_two_sample(df, "cents", arm_col="arm", by="grp").collect()}
    assert got["g2"]["d_stat"] is None and got["g2"]["p_value"] is None
    assert got["g1"]["d_stat"] is not None
    with pytest.raises(ValueError, match="exactly 2 arms"):
        ks_two_sample(df.filter("arm = 'a'"), "cents", arm_col="arm")


def test_ks_partition_invariance(spark):
    rng = np.random.default_rng(11)
    a = rng.integers(0, 50, 500)
    b = rng.integers(10, 60, 500)
    df = _to_df(spark, a, b)
    ref = ks_two_sample(df.coalesce(1), "cents", arm_col="arm").collect()[0]
    for parts in (7, 32):
        got = ks_two_sample(df.repartition(parts), "cents", arm_col="arm").collect()[0]
        assert got["d_stat"] == ref["d_stat"]
        assert got["p_value"] == ref["p_value"]


# ---------------------------------------------------------------------------


def _crl_reference(arm, cluster, y):
    """From-scratch numpy cluster sandwich with the engine's 2^16
    residual grid."""
    out = {}
    for tag, name in (("a", "c"), ("b", "t")):
        m = np.asarray(arm) == tag
        cl = np.asarray(cluster)[m]
        yy = np.asarray(y, dtype=np.int64)[m]
        uniq = np.unique(cl)
        s_g = np.array([yy[cl == g].sum() for g in uniq], dtype=np.float64)
        n_g = np.array([(cl == g).sum() for g in uniq], dtype=np.float64)
        n, s, G = yy.size, yy.sum(), uniq.size
        mean = s / n
        e = s_g - n_g * mean
        eq = np.floor(e * e / 65536.0).sum()
        var = G / (G - 1) * (eq * 65536.0) / (n * n) if G >= 2 else None
        out[name] = (n, G, mean, var)
    return out


def test_cluster_robust_matches_numpy_and_design_effect(spark):
    """Planted within-cluster correlation: the cluster SE must match the
    from-scratch sandwich AND exceed the naive iid SE several-fold."""
    rng = np.random.default_rng(13)
    rows = []
    arm_l, cl_l, y_l = [], [], []
    for u in range(120):
        tag = "a" if u % 2 == 0 else "b"
        base = int(rng.normal(0, 800))  # strong cluster-level shock
        for _ in range(int(rng.integers(5, 15))):
            yv = base + int(rng.normal(0, 30)) + (50 if tag == "b" else 0)
            rows.append((tag, u, yv))
            arm_l.append(tag); cl_l.append(u); y_l.append(yv)
    df = spark.createDataFrame(rows, "arm string, user long, cents long")
    out = cluster_robust_lift(
        df, "cents", arm_col="arm", cluster_col="user"
    ).collect()[0]
    ref = _crl_reference(arm_l, cl_l, y_l)
    (n_c, g_c, mean_c, var_c), (n_t, g_t, mean_t, var_t) = ref["c"], ref["t"]
    assert out["n_control"] == n_c and out["g_control"] == g_c
    assert out["mean_control"] == pytest.approx(mean_c, rel=1e-12)
    assert out["lift_cents"] == pytest.approx(mean_t - mean_c, rel=1e-12)
    assert out["se_cluster"] == pytest.approx(np.sqrt(var_c + var_t), rel=1e-12)
    assert out["z"] == pytest.approx(
        (mean_t - mean_c) / np.sqrt(var_c + var_t), rel=1e-12
    )
    # the design effect is visible: clustered SE >> naive iid SE
    assert out["se_cluster"] > 3.0 * out["se_naive"]


def test_cluster_robust_degenerate_and_guards(spark):
    # an arm with ONE cluster: variance undefined -> NULL se/z
    rows = [("a", 1, 10), ("a", 1, 12), ("b", 2, 20), ("b", 3, 25)]
    df = spark.createDataFrame(rows, "arm string, user long, cents long")
    out = cluster_robust_lift(df, "cents", arm_col="arm", cluster_col="user").collect()[0]
    assert out["se_cluster"] is None and out["z"] is None
    assert out["lift_cents"] == pytest.approx(22.5 - 11.0)
    three = spark.createDataFrame(
        [("a", 1, 1), ("b", 2, 1), ("c", 3, 1)], "arm string, user long, cents long"
    )
    with pytest.raises(ValueError, match="exactly 2 arms"):
        cluster_robust_lift(three, "cents", arm_col="arm", cluster_col="user")


def test_cluster_robust_partition_invariance(spark):
    rng = np.random.default_rng(17)
    rows = [
        ("a" if u % 2 else "b", u, int(rng.normal(100, 50)))
        for u in range(80)
        for _ in range(6)
    ]
    df = spark.createDataFrame(rows, "arm string, user long, cents long")
    ref = cluster_robust_lift(
        df.coalesce(1), "cents", arm_col="arm", cluster_col="user"
    ).collect()[0]
    got = cluster_robust_lift(
        df.repartition(32), "cents", arm_col="arm", cluster_col="user"
    ).collect()[0]
    assert got["se_cluster"] == ref["se_cluster"]
    assert got["lift_cents"] == ref["lift_cents"]


# ---------------------------------------------------------------------------


def test_srm_check_fires_on_real_mismatch_only(spark):
    """A clean 50/50 split passes; a 45/55 split on 10k units alarms at
    the conventional 0.001; chi2 matches the hand formula."""
    from patternly_spark.operators.drift import srm_check

    n = 10_000
    clean = spark.createDataFrame(
        [("a" if i % 2 == 0 else "b",) for i in range(n)], "arm string"
    )
    out = srm_check(clean, arm_col="arm").collect()[0]
    assert out["chi2"] == pytest.approx(0.0)
    assert out["srm"] is False and out["p_value"] > 0.99

    skew = spark.createDataFrame(
        [("a" if i % 20 < 9 else "b",) for i in range(n)], "arm string"
    )  # 45/55
    out = srm_check(skew, arm_col="arm").collect()[0]
    nc, nt = out["n_control"], out["n_treatment"]
    e = (nc + nt) / 2.0
    want_chi2 = (nc - e) ** 2 / e + (nt - e) ** 2 / e
    assert out["chi2"] == pytest.approx(want_chi2, rel=1e-12)
    assert out["srm"] is True and out["p_value"] < 1e-6

    with pytest.raises(ValueError, match="exactly 2 arms"):
        srm_check(clean.limit(0).union(
            spark.createDataFrame([("a",)], "arm string")), arm_col="arm")
    with pytest.raises(ValueError, match="expected_control"):
        srm_check(clean, arm_col="arm", expected_control=1.5)


def test_srm_p_matches_chi2_sf(spark):
    """p = 2*SF(sqrt(chi2)) equals the chi2_1 survival function (checked
    against the exact erfc identity, within the documented ~2e-6
    quantized-SF tolerance)."""
    import math

    from patternly_spark.operators.drift import srm_check

    df = spark.createDataFrame(
        [("a",)] * 5100 + [("b",)] * 4900, "arm string"
    )
    out = srm_check(df, arm_col="arm").collect()[0]
    exact = math.erfc(math.sqrt(out["chi2"] / 2.0))  # chi2_1 SF
    assert out["p_value"] == pytest.approx(exact, abs=5e-6)


def test_tost_equivalence_behaviors(spark):
    """A true-null A/B with tight spread is declared equivalent at a
    generous margin and NOT equivalent at a tiny one; a planted shift
    beyond the margin is never equivalent; p's match a from-scratch
    numpy chain."""
    from patternly_spark.operators.drift import tost_equivalence

    rng = np.random.default_rng(21)
    null_rows = [
        ("a" if i % 2 == 0 else "b", int(rng.normal(1000, 40)))
        for i in range(4000)
    ]
    df = spark.createDataFrame(null_rows, "arm string, cents long")
    wide = tost_equivalence(df, "cents", arm_col="arm", margin_cents=50.0).collect()[0]
    assert wide["equivalent"] is True and wide["p_tost"] < 0.05
    narrow = tost_equivalence(df, "cents", arm_col="arm", margin_cents=0.5).collect()[0]
    assert narrow["equivalent"] is False

    shifted = spark.createDataFrame(
        [("a", int(rng.normal(1000, 40))) for _ in range(2000)]
        + [("b", int(rng.normal(1200, 40))) for _ in range(2000)],
        "arm string, cents long",
    )
    out = tost_equivalence(shifted, "cents", arm_col="arm", margin_cents=50.0).collect()[0]
    assert out["equivalent"] is False and out["lift_cents"] > 150

    # numpy reference for the full chain on the null fixture
    a = np.array([c for t, c in null_rows if t == "a"], dtype=np.float64)
    b = np.array([c for t, c in null_rows if t == "b"], dtype=np.float64)
    d = b.mean() - a.mean()
    se = np.sqrt(b.var(ddof=1) / b.size + a.var(ddof=1) / a.size)
    assert wide["lift_cents"] == pytest.approx(d, rel=1e-9)
    assert wide["se"] == pytest.approx(se, rel=1e-9)
    assert wide["z_lower"] == pytest.approx((d + 50.0) / se, rel=1e-9)
    assert wide["z_upper"] == pytest.approx((d - 50.0) / se, rel=1e-9)
    import math
    p_low = 0.5 * math.erfc((d + 50.0) / se / math.sqrt(2))
    p_high = 1.0 - 0.5 * math.erfc((d - 50.0) / se / math.sqrt(2))
    assert wide["p_lower"] == pytest.approx(p_low, abs=5e-6)
    assert wide["p_upper"] == pytest.approx(p_high, abs=5e-6)

    with pytest.raises(ValueError, match="margin_cents"):
        tost_equivalence(df, "cents", arm_col="arm", margin_cents=0.0)


def test_tost_degenerate_surfaces_nulls(spark):
    from patternly_spark.operators.drift import tost_equivalence

    # all values identical: se == 0 -> NULLs, never NaN
    df = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 5), ("b", 5)], "arm string, cents long"
    )
    out = tost_equivalence(df, "cents", arm_col="arm", margin_cents=1.0).collect()[0]
    assert out["se"] is None and out["p_tost"] is None and out["equivalent"] is None


# ---------------------------------------------------------------------------


def test_brown_forsythe_detects_spread_change_only(spark):
    """The q265-test fixture inverted: same-center arms with 4x spread
    -> BF fires; a pure location shift with equal spread -> BF stays
    quiet (that's q204/q252's job); moments match a from-scratch numpy
    chain."""
    import math

    from patternly_spark.operators.drift import brown_forsythe

    rng = np.random.default_rng(29)
    a = np.round(rng.normal(0, 10, 2000)).astype(int)
    b = np.round(rng.normal(0, 40, 2000)).astype(int)
    out = brown_forsythe(_to_df(spark, a, b), "cents", arm_col="arm").collect()[0]
    assert out["p_value"] < 1e-9 and out["z"] > 0

    # numpy reference on the same definition (type-1 median, |dev| Welch)
    def ref(x):
        x = np.sort(x)
        med = x[int(np.ceil(len(x) / 2.0)) - 1]
        d = np.abs(x - med).astype(np.float64)
        return med, d.mean(), d.var(ddof=1), len(d)

    med_a, mad_a, var_a, n_a = ref(a)
    med_b, mad_b, var_b, n_b = ref(b)
    assert out["median_control"] == med_a and out["median_treatment"] == med_b
    assert out["mad_control"] == pytest.approx(mad_a, rel=1e-12)
    assert out["mad_treatment"] == pytest.approx(mad_b, rel=1e-12)
    want_z = (mad_b - mad_a) / math.sqrt(var_b / n_b + var_a / n_a)
    assert out["z"] == pytest.approx(want_z, rel=1e-12)
    exact_p = math.erfc(abs(want_z) / math.sqrt(2))
    assert out["p_value"] == pytest.approx(exact_p, abs=5e-6)

    shifted = _to_df(spark, a, a + 500)  # pure location shift
    quiet = brown_forsythe(shifted, "cents", arm_col="arm").collect()[0]
    assert abs(quiet["z"]) < 2.0  # |dev| distribution unchanged


def test_brown_forsythe_by_groups_and_degenerate(spark):
    from patternly_spark.operators.drift import brown_forsythe

    rows = [("g1", "a", v) for v in (1, 2, 3, 4, 50)] + [
        ("g1", "b", v) for v in (1, 2, 3, 4, 5)
    ] + [("g2", "a", 7)]  # g2: one-armed AND single-row
    df = spark.createDataFrame(rows, "grp string, arm string, cents long")
    got = {r["grp"]: r for r in
           brown_forsythe(df, "cents", arm_col="arm", by="grp").collect()}
    assert got["g1"]["median_control"] == 3 and got["g1"]["median_treatment"] == 3
    assert got["g2"]["z"] is None and got["g2"]["n_treatment"] is None


def test_power_mde_matches_hand_chain_and_shrinks_with_n(spark):
    import math

    from patternly_spark.operators.drift import power_mde

    rng = np.random.default_rng(31)
    a = np.round(rng.normal(1000, 100, 500)).astype(int)
    b = np.round(rng.normal(1000, 100, 500)).astype(int)
    out = power_mde(_to_df(spark, a, b), "cents", arm_col="arm").collect()[0]
    se = math.sqrt(
        np.var(b.astype(float), ddof=1) / len(b)
        + np.var(a.astype(float), ddof=1) / len(a)
    )
    want = (1.959963984540054 + 0.8416212335729143) * se
    assert out["se"] == pytest.approx(se, rel=1e-12)
    assert out["mde_cents"] == pytest.approx(want, rel=1e-12)
    assert out["mde_rel"] == pytest.approx(want / abs(a.mean()), rel=1e-9)

    # 4x the sample -> ~half the MDE (1/sqrt(n) law)
    a4 = np.round(rng.normal(1000, 100, 2000)).astype(int)
    b4 = np.round(rng.normal(1000, 100, 2000)).astype(int)
    big = power_mde(_to_df(spark, a4, b4), "cents", arm_col="arm").collect()[0]
    assert big["mde_cents"] == pytest.approx(out["mde_cents"] / 2.0, rel=0.15)


# ---------------------------------------------------------------------------


def test_partition_quality_hand_computed(spark):
    """Two 4-cliques joined by one bridge, labeled by clique: m = 13;
    each community has e_intra = 6, cut = 1, volume = 13; hand
    modularity Q = 2*(6/13 - (13/26)^2) = 2*6/13 - 1/2."""
    from patternly_spark.operators.graph import partition_quality

    cl1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    cl2 = [(a + 10, b + 10) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(cl1 + cl2 + [(0, 10)], "src long, dst long")
    labels = spark.createDataFrame(
        [(i, "L") for i in range(4)] + [(i + 10, "R") for i in range(4)],
        "node long, label string",
    )
    rows = {r["community"]: r for r in
            partition_quality(edges, labels).collect()}
    for c in ("L", "R"):
        r = rows[c]
        assert r["n_nodes"] == 4 and r["e_intra"] == 6 and r["cut"] == 1
        assert r["volume"] == 13
        assert r["q_contrib"] == pytest.approx(6 / 13 - (13 / 26) ** 2, rel=1e-12)
        assert r["conductance"] == pytest.approx(1 / 13, rel=1e-12)
    q_total = sum(r["q_contrib"] for r in rows.values())
    assert q_total == pytest.approx(2 * 6 / 13 - 0.5, rel=1e-12)

    # a single community over the whole graph: cut 0, conductance NULL,
    # q_contrib = 1 - 1 = 0
    whole = spark.createDataFrame(
        [(i, "all") for i in list(range(4)) + [i + 10 for i in range(4)]],
        "node long, label string",
    )
    r = partition_quality(edges, whole).collect()[0]
    assert r["cut"] == 0 and r["conductance"] is None
    assert r["q_contrib"] == pytest.approx(0.0, abs=1e-12)


def test_partition_quality_guards(spark):
    from patternly_spark.operators.graph import partition_quality

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    labels = spark.createDataFrame([(1, "a"), (2, "a")], "node long, label string")
    with pytest.raises(ValueError, match="unlabeled edge endpoints"):
        partition_quality(edges, labels).collect()
    with pytest.raises(ValueError, match="empty edge set"):
        partition_quality(
            edges.limit(0),
            spark.createDataFrame([(1, "a")], "node long, label string"),
        )
    # round-10: duplicate node keys raise (a doubly-labeled node would
    # double-count its edges/degree silently otherwise — ADVICE r9)
    dup = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (3, "a")], "node long, label string"
    )
    with pytest.raises(ValueError, match="duplicate node keys"):
        partition_quality(edges, dup).collect()


def test_partition_quality_guard_is_one_action(spark, monkeypatch):
    """Round-9 verdict item 4: the three guards (m, unlabeled
    endpoints, duplicate labels) must ride ONE piggybacked driver
    action, not three — count DataFrame.collect calls during the
    operator build (the success path samples nothing)."""
    try:  # Spark 4: the classic subclass overrides collect
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover - Spark 3 layout
        from pyspark.sql import DataFrame
    from patternly_spark.operators.graph import partition_quality

    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b],
        "src long, dst long",
    )
    labels = spark.createDataFrame(
        [(i, "L") for i in range(4)], "node long, label string"
    )
    calls = {"n": 0}
    real_collect = DataFrame.collect

    def counting_collect(self):
        calls["n"] += 1
        return real_collect(self)

    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    out = partition_quality(edges, labels)
    assert calls["n"] == 1, f"guard spent {calls['n']} driver actions, want 1"
    monkeypatch.setattr(DataFrame, "collect", real_collect)
    rows = out.collect()
    assert rows[0]["e_intra"] == 6 and rows[0]["cut"] == 0


def test_partition_quality_grades_lpa_communities(spark):
    """Composition with q140: LPA labels on two planted cliques score
    near the ideal two-community modularity; a random labeling scores
    worse — the readout separates good partitions from bad ones."""
    from patternly_spark.operators.graph import label_propagation, partition_quality

    cl1 = [(a, b) for a in range(6) for b in range(6) if a < b]
    cl2 = [(a + 20, b + 20) for a in range(6) for b in range(6) if a < b]
    edges = spark.createDataFrame(cl1 + cl2 + [(0, 20)], "src long, dst long")
    lpa = label_propagation(edges, iterations=5).withColumnRenamed("label", "label")
    q_lpa = sum(
        r["q_contrib"]
        for r in partition_quality(edges, lpa, label_col="label").collect()
    )
    nodes = [i for i in range(6)] + [i + 20 for i in range(6)]
    rand = spark.createDataFrame(
        [(n, "x" if n % 2 == 0 else "y") for n in nodes], "node long, label string"
    )
    q_rand = sum(
        r["q_contrib"] for r in partition_quality(edges, rand).collect()
    )
    assert q_lpa > 0.4 and q_lpa > q_rand + 0.3


def test_srm_check_k_behaviors(spark):
    """Uniform 3-way split passes; a 20/40/40 split on 9k units alarms;
    chi2 matches the hand formula (on the quantized-contribution grid);
    the round-10 exact closed-form tail matches exp(-chi2/2) to the
    2^-20 exp grid while the retained Wilson-Hilferty cross-check
    column sits within (and measurably uses) its documented ~3e-3
    band; ratio guards raise."""
    import math

    from patternly_spark.operators.drift import srm_check_k

    n = 9000
    clean = spark.createDataFrame(
        [("abc"[i % 3],) for i in range(n)], "arm string"
    )
    out = srm_check_k(clean, arm_col="arm").collect()
    assert len(out) == 3 and out[0]["chi2"] == pytest.approx(0.0)
    assert out[0]["srm"] is False and out[0]["df"] == 2

    skew = spark.createDataFrame(
        [("a" if i % 10 < 2 else ("b" if i % 10 < 6 else "c"),) for i in range(n)],
        "arm string",
    )
    rows = {r["arm"]: r for r in srm_check_k(skew, arm_col="arm").collect()}
    g = float(1 << 20)
    want_chi2 = sum(
        math.floor((rows[a]["n"] - n / 3.0) ** 2 / (n / 3.0) * g) / g for a in "abc"
    )
    r0 = rows["a"]
    assert r0["chi2"] == pytest.approx(want_chi2, rel=1e-12)
    assert r0["srm"] is True and r0["p_value"] < 1e-6
    # exact-tail spot-check on a moderate chi2 (df=2: SF is exactly
    # exp(-x/2), and the engine's p_value is that value on the 2^-20
    # exp grid); the WH cross-check column carries its documented
    # ~3e-3 absolute error here — visibly different from the exact
    # tail (proving the verdict no longer rides the approximation)
    mid = spark.createDataFrame(
        [("a",)] * 3075 + [("b",)] * 3000 + [("c",)] * 2925, "arm string"
    )
    r = srm_check_k(mid, arm_col="arm").collect()[0]
    exact = math.exp(-r["chi2"] / 2.0)
    assert r["p_value"] == pytest.approx(exact, abs=2e-6)
    assert r["p_value"] == math.floor(exact * g) / g
    assert r["p_value_wh"] == pytest.approx(exact, abs=4e-3)
    assert abs(r["p_value_wh"] - r["p_value"]) > 1e-4  # WH is NOT the exact tail

    with pytest.raises(ValueError, match="sum to 1"):
        srm_check_k(clean, arm_col="arm", expected={"a": 0.5, "b": 0.4, "c": 0.2})
    with pytest.raises(ValueError, match="missing for arms"):
        srm_check_k(clean, arm_col="arm", expected={"a": 0.5, "b": 0.5})
    with pytest.raises(ValueError, match=">= 2 arms"):
        srm_check_k(clean.filter("arm = 'a'"), arm_col="arm")


def test_srm_check_k_dead_arm_and_odd_df(spark):
    """ADVICE r9: with explicit ``expected`` the DESIGN defines the arm
    set — a 3-arm design whose arm c logged ZERO rows must fire the
    gate hard (previously c silently dropped out and the remaining
    arms were tested as a uniform 2-split -> srm=false for exactly the
    catastrophic assignment loss the gate exists to catch).  Also pins
    the odd-df (k=4 -> df=3) closed-form tail against an independent
    Python replication of the same chain."""
    import math

    from patternly_spark.operators.drift import srm_check_k

    thirds = {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}
    dead = spark.createDataFrame(
        [("a",)] * 1500 + [("b",)] * 1500, "arm string"
    )
    rows = {r["arm"]: r for r in
            srm_check_k(dead, arm_col="arm", expected=thirds).collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["c"]["n"] == 0
    assert rows["c"]["expected_n"] == pytest.approx(1000.0)
    assert rows["a"]["srm"] is True and rows["a"]["df"] == 2
    assert rows["a"]["p_value"] < 1e-12
    # the uniform DEFAULT cannot see the dead arm (documented): k
    # shrinks to the observed 2 arms and the 1500/1500 split is clean
    auto = srm_check_k(dead, arm_col="arm").collect()[0]
    assert auto["df"] == 1 and auto["srm"] is False

    # odd df: 4 designed arms, mildly skewed realization -> df = 3
    quad = spark.createDataFrame(
        [("a",)] * 1030 + [("b",)] * 1000 + [("c",)] * 990 + [("d",)] * 980,
        "arm string",
    )
    r = srm_check_k(quad, arm_col="arm").collect()[0]
    assert r["df"] == 3
    x = r["chi2"]
    # independent replication of the closed-form odd-df chain (A&S
    # normal SF + the one-term Gamma(3/2) polynomial), unquantized —
    # the engine's grid quantizations sit ~1e-6 below it
    t = 1.0 / (1.0 + 0.2316419 * math.sqrt(x))
    b = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
    poly = t * (b[0] + t * (b[1] + t * (b[2] + t * (b[3] + t * b[4]))))
    nsf = math.exp(-x / 2.0) * 0.3989422804014327 * poly
    want = 2.0 * nsf + math.exp(-x / 2.0) * math.sqrt(x / 2.0) / math.gamma(1.5)
    assert r["p_value"] == pytest.approx(want, abs=1e-5)
    # WH error grows toward large p (measured ~4e-3 here at p ~= 0.7,
    # df=3) — exactly why the verdict now rides the closed form
    assert r["p_value_wh"] == pytest.approx(want, abs=8e-3)
    assert abs(r["p_value_wh"] - r["p_value"]) > 1e-3
