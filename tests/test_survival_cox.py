"""Cox proportional hazards (operators/temporal.cox_ph)."""

import numpy as np
import pytest

from patternly_spark.operators.temporal import cox_ph


def _sim(n=400, seed=5):
    """Exponential survival with hazard exp(0.8*x0 - 0.5*x1), uniform
    censoring: the classic PH simulation."""
    rng = np.random.default_rng(seed)
    X = np.column_stack([rng.integers(0, 2, n).astype(float), rng.normal(size=n)])
    lam = 0.05 * np.exp(0.8 * X[:, 0] - 0.5 * X[:, 1])
    t_event = rng.exponential(1.0 / lam)
    t_cens = rng.uniform(5, 60, n)
    t = np.minimum(t_event, t_cens)
    e = (t_event <= t_cens).astype(int)
    # integer-ish durations so Breslow ties actually occur
    return np.ceil(t).astype(int), e, X


def _ref_newton(t, e, X, iters=4):
    """From-scratch subject-level Breslow Newton — an independent
    implementation path (no grid, no suffix sums)."""
    n, p = X.shape
    beta = np.zeros(p)
    Hinv = np.eye(p)
    for _ in range(iters):
        w = np.exp(X @ beta)
        g = np.zeros(p)
        H = np.zeros((p, p))
        for ti in np.unique(t[e == 1]):
            risk = t >= ti
            d = int(((t == ti) & (e == 1)).sum())
            s0 = w[risk].sum()
            s1 = (X[risk] * w[risk, None]).sum(0)
            s2 = (X[risk].T * w[risk]) @ X[risk]
            g += X[(t == ti) & (e == 1)].sum(0) - d * s1 / s0
            H += d * (s2 / s0 - np.outer(s1 / s0, s1 / s0))
        Hinv = np.linalg.inv(H)
        beta = beta + Hinv @ g
    return beta, Hinv


def test_cox_ph_matches_numpy_reference(spark):
    t, e, X = _sim()
    rows = [(int(t[i]), int(e[i]), float(X[i, 0]), float(X[i, 1])) for i in range(len(t))]
    df = spark.createDataFrame(rows, "dur long, ev int, x0 double, x1 double")
    got = {
        r["covariate"]: r
        for r in cox_ph(
            df, duration_col="dur", event_col="ev", covariate_cols=["x0", "x1"]
        ).collect()
    }
    beta, Hinv = _ref_newton(t, e, X)
    for j, c in enumerate(["x0", "x1"]):
        assert got[c]["beta"] == pytest.approx(beta[j], rel=1e-8)
        assert got[c]["se"] == pytest.approx(np.sqrt(Hinv[j, j]), rel=1e-8)
        assert got[c]["hazard_ratio"] == pytest.approx(np.exp(beta[j]), rel=1e-8)
    # the planted effects are recovered with correct signs and rough size
    assert 0.4 < got["x0"]["beta"] < 1.2
    assert -0.9 < got["x1"]["beta"] < -0.2


def test_cox_ph_null_covariate_near_zero(spark):
    # a covariate independent of the hazard gets |z| small
    rng = np.random.default_rng(9)
    n = 300
    t = np.ceil(rng.exponential(20, n)).astype(int)
    e = (rng.random(n) < 0.8).astype(int)
    x = rng.normal(size=n)
    df = spark.createDataFrame(
        [(int(t[i]), int(e[i]), float(x[i])) for i in range(n)],
        "dur long, ev int, x double",
    )
    out = cox_ph(df, duration_col="dur", event_col="ev", covariate_cols=["x"]).collect()[0]
    assert abs(out["z"]) < 2.5


def test_cox_ph_partition_invariance_and_guards(spark):
    t, e, X = _sim(n=120, seed=7)
    rows = [(int(t[i]), int(e[i]), float(X[i, 0]), float(X[i, 1])) for i in range(len(t))]
    a = cox_ph(
        spark.createDataFrame(rows, "dur long, ev int, x0 double, x1 double").coalesce(1),
        duration_col="dur", event_col="ev", covariate_cols=["x0", "x1"],
    ).collect()
    b = cox_ph(
        spark.createDataFrame(rows, "dur long, ev int, x0 double, x1 double").repartition(16),
        duration_col="dur", event_col="ev", covariate_cols=["x0", "x1"],
    ).collect()
    # grid sums are per-time aggregates of commutative doubles; beta may
    # differ only by float association inside a time bucket
    for ra, rb in zip(sorted(a), sorted(b)):
        assert ra["beta"] == pytest.approx(rb["beta"], rel=1e-12)
    with pytest.raises(ValueError, match="at least one"):
        cox_ph(
            spark.createDataFrame(rows, "dur long, ev int, x0 double, x1 double"),
            duration_col="dur", event_col="ev", covariate_cols=[],
        )


def test_logistic_matches_numpy_reference(spark):
    """From-scratch numpy IRLS on the identical likelihood: beta/se/z
    equal at rel 1e-8, planted effect recovered with correct signs."""
    from patternly_spark.operators.model_eval import logistic_regression

    rng = np.random.default_rng(3)
    n = 500
    X = np.column_stack([rng.normal(size=n), rng.integers(0, 2, n).astype(float)])
    lin = -0.5 + 1.2 * X[:, 0] - 0.8 * X[:, 1]
    y = (rng.random(n) < 1.0 / (1.0 + np.exp(-lin))).astype(int)
    df = spark.createDataFrame(
        [(int(y[i]), float(X[i, 0]), float(X[i, 1])) for i in range(n)],
        "y int, x0 double, x1 double",
    )
    got = {
        r["feature"]: r
        for r in logistic_regression(
            df, label_col="y", feature_cols=["x0", "x1"]
        ).collect()
    }

    Xd = np.column_stack([np.ones(n), X])
    beta = np.zeros(3)
    hinv = np.eye(3)
    for _ in range(6):
        mu = 1.0 / (1.0 + np.exp(-(Xd @ beta)))
        g = Xd.T @ (y - mu)
        H = (Xd.T * (mu * (1 - mu))) @ Xd
        hinv = np.linalg.inv(H)
        beta = beta + hinv @ g
    for a, name in enumerate(["__intercept", "x0", "x1"]):
        assert got[name]["beta"] == pytest.approx(beta[a], rel=1e-8)
        assert got[name]["se"] == pytest.approx(np.sqrt(hinv[a, a]), rel=1e-8)
    assert 0.8 < got["x0"]["beta"] < 1.6 and -1.3 < got["x1"]["beta"] < -0.4
    with pytest.raises(ValueError, match="at least one"):
        logistic_regression(df, label_col="y", feature_cols=[])


def test_newton_convergence_telemetry(spark):
    """Round-8 verdict item 3: the fixed-budget solvers must SAY whether
    the budget sufficed.  Well-conditioned fixture + full budget ->
    rel_step tiny and converged=True; a starved budget (iters=1) on the
    same data -> rel_step visibly large and converged=False; an
    ill-conditioned (near-collinear) logistic fit under-converges at
    the default budget and the diagnostic says so."""
    from patternly_spark.operators.model_eval import logistic_regression

    t, e, X = _sim(n=300, seed=11)
    rows = [(int(t[i]), int(e[i]), float(X[i, 0]), float(X[i, 1])) for i in range(len(t))]
    df = spark.createDataFrame(rows, "dur long, ev int, x0 double, x1 double")
    full = cox_ph(
        df, duration_col="dur", event_col="ev", covariate_cols=["x0", "x1"]
    ).collect()[0]
    assert full["rel_step"] < 1e-5 and full["converged"] is True
    assert full["grad_norm"] < 1e-2
    starved = cox_ph(
        df, duration_col="dur", event_col="ev", covariate_cols=["x0", "x1"],
        iters=1, max_iters=1,  # pin the cap: the round-10 adaptive budget
        # would otherwise continue past the starved budget by design
    ).collect()[0]
    assert starved["rel_step"] == pytest.approx(1.0)  # one step from beta=0
    assert starved["converged"] is False

    rng = np.random.default_rng(4)
    n = 400
    x0 = rng.normal(size=n)
    y_sep = (x0 > 0.0).astype(int)  # perfectly separable: MLE diverges
    ldf = spark.createDataFrame(
        [(int(y_sep[i]), float(x0[i])) for i in range(n)], "y int, x0 double"
    )
    ill = logistic_regression(
        ldf, label_col="y", feature_cols=["x0"], max_iters=8
    ).collect()[0]
    # a perfectly separable fit under-converges at ANY budget (beta is
    # marching to infinity — the MLE does not exist) AND the telemetry
    # reports it; max_iters=8 keeps the test fast, the adaptive-default
    # cap is exercised by test_newton_adaptive_budget
    assert ill["rel_step"] > 1e-2 and ill["converged"] is False
    # a well-conditioned (noisy-label) fit at the same 6-step budget
    # reports convergence — the diagnostic separates the two regimes
    y_ok = (rng.random(n) < 1.0 / (1.0 + np.exp(-(2.0 * x0)))).astype(int)
    okdf = spark.createDataFrame(
        [(int(y_ok[i]), float(x0[i])) for i in range(n)], "y int, x0 double"
    )
    ok = logistic_regression(okdf, label_col="y", feature_cols=["x0"]).collect()[0]
    assert ok["rel_step"] < 1e-5 and ok["converged"] is True


def test_newton_adaptive_budget(spark):
    """Round-9 verdict item 3: the convergence telemetry must DRIVE the
    budget, not just blame it.  A quasi-separable logistic fixture
    (true beta = 12, weak class overlap) needs ~10 Newton steps: the
    fixed-budget era (max_iters=iters=6) ends converged=False; the
    adaptive default continues while rel_step > tol and converges —
    and the betas match a from-scratch numpy Newton run with the SAME
    adaptive stopping rule at rel 1e-8.  Bad budget arguments raise
    up front (iters=0 used to NameError at the telemetry line)."""
    from patternly_spark.operators.model_eval import logistic_regression

    rng = np.random.default_rng(7)
    n = 500
    x0 = rng.normal(size=n)
    y = (rng.random(n) < 1.0 / (1.0 + np.exp(-12.0 * x0))).astype(int)
    df = spark.createDataFrame(
        [(int(y[i]), float(x0[i])) for i in range(n)], "y int, x0 double"
    )
    fixed = logistic_regression(
        df, label_col="y", feature_cols=["x0"], iters=6, max_iters=6
    ).collect()[0]
    assert fixed["converged"] is False  # the round-8 silent regime

    rows = logistic_regression(df, label_col="y", feature_cols=["x0"]).collect()
    got = {r["feature"]: r for r in rows}
    assert got["x0"]["converged"] is True
    assert got["x0"]["rel_step"] < 1e-5

    # from-scratch numpy Newton with the identical adaptive rule
    X = np.column_stack([np.ones(n), x0.astype(float)])
    yf = y.astype(float)
    beta = np.zeros(2)
    for it in range(1, 25):
        mu = 1.0 / (1.0 + np.exp(-(X @ beta)))
        g = X.T @ (yf - mu)
        H = (X.T * (mu * (1.0 - mu))) @ X
        step = np.linalg.inv(H) @ g
        beta = beta + step
        rel = np.max(np.abs(step)) / max(np.max(np.abs(beta)), 1e-12)
        if it >= 6 and rel < 1e-5:
            break
    assert got["__intercept"]["beta"] == pytest.approx(beta[0], rel=1e-8)
    assert got["x0"]["beta"] == pytest.approx(beta[1], rel=1e-8)

    with pytest.raises(ValueError, match="iters must be >= 1"):
        logistic_regression(df, label_col="y", feature_cols=["x0"], iters=0)
    with pytest.raises(ValueError, match="max_iters"):
        logistic_regression(
            df, label_col="y", feature_cols=["x0"], iters=6, max_iters=3
        )
    with pytest.raises(ValueError, match="iters must be >= 1"):
        cox_ph(
            spark.createDataFrame([(1, 1, 0.5)], "dur long, ev int, x0 double"),
            duration_col="dur", event_col="ev", covariate_cols=["x0"], iters=0,
        )
    with pytest.raises(ValueError, match="tol must be > 0"):
        logistic_regression(df, label_col="y", feature_cols=["x0"], tol=0.0)


def test_ipw_ate_surfaces_propensity_telemetry(spark):
    """ipw_ate must carry the propensity fit's convergence telemetry in
    its single readout row (q261 consumes those betas)."""
    from patternly_spark.operators.model_eval import ipw_ate

    rng = np.random.default_rng(12)
    n = 400
    x = rng.normal(size=n)
    tr = (rng.random(n) < 1.0 / (1.0 + np.exp(-x))).astype(int)
    y = (100 * (2.0 + 0.5 * x + 1.0 * tr + rng.normal(size=n))).astype(int)
    df = spark.createDataFrame(
        [(int(tr[i]), int(y[i]), float(x[i])) for i in range(n)],
        "t int, y_cents long, x double",
    )
    out = ipw_ate(
        df, treat_col="t", outcome_cents_col="y_cents", feature_cols=["x"]
    ).collect()[0]
    assert out["propensity_converged"] is True
    assert out["propensity_rel_step"] < 1e-5
    starved = ipw_ate(
        df, treat_col="t", outcome_cents_col="y_cents", feature_cols=["x"],
        iters=1, max_iters=1,  # pin the cap past the adaptive default
    ).collect()[0]
    assert starved["propensity_converged"] is False


def test_fleiss_kappa_hand_computed(spark):
    """Textbook panel: 4 items x 3 raters with known counts; kappa
    checked against the hand formula, perfect agreement gives 1, and a
    ragged panel raises."""
    from patternly_spark.operators.model_eval import fleiss_kappa

    panels = {1: ["a", "a", "a"], 2: ["a", "a", "b"], 3: ["b", "b", "b"], 4: ["a", "b", "b"]}
    rows = [(i, c) for i, cats in panels.items() for c in cats]
    df = spark.createDataFrame(rows, "item long, cat string")
    out = fleiss_kappa(df, item_col="item", category_col="cat").collect()[0]
    # hand: n=3, N=4; sum nij^2 = 9 + (4+1) + 9 + (1+4) = 28
    # p_bar = (28 - 12) / (12*2) = 16/24; nj: a=6, b=6 -> C=72
    # p_e = 72/144 = 0.5; kappa = (2/3 - 1/2)/(1/2) = 1/3
    assert out["n_items"] == 4 and out["n_raters"] == 3
    assert out["p_bar"] == pytest.approx(16 / 24)
    assert out["p_e"] == pytest.approx(0.5)
    assert out["kappa"] == pytest.approx(1 / 3)

    # unanimous items over TWO categories: p_bar = 1, p_e < 1 -> kappa 1
    perfect = spark.createDataFrame(
        [(i, "x" if i % 2 == 0 else "y") for i in range(6) for _ in range(4)],
        "item long, cat string",
    )
    assert fleiss_kappa(perfect, item_col="item", category_col="cat").collect()[0][
        "kappa"
    ] == pytest.approx(1.0)

    # single-category corpus: p_e = 1 -> kappa undefined, NULL
    degenerate = spark.createDataFrame(
        [(i, "x") for i in range(5) for _ in range(4)], "item long, cat string"
    )
    assert (
        fleiss_kappa(degenerate, item_col="item", category_col="cat").collect()[0][
            "kappa"
        ]
        is None
    )

    ragged = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a")], "item long, cat string"
    )
    with pytest.raises(ValueError, match="constant rater count"):
        fleiss_kappa(ragged, item_col="item", category_col="cat")
