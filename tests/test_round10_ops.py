"""Round-10 operators: the engine-exact integer-df chi-square survival
function (drift.chi2_sf_q) and the chi-square independence test
(drift.chi2_independence)."""

import math

import pytest
from pyspark.sql import functions as F

from patternly_spark.operators.drift import chi2_independence, chi2_sf_q


def _chi2_sf_reference(x: float, df: int) -> float:
    """From-scratch closed-form integer-df chi2 SF (unquantized A&S
    normal tail for odd df) — an independent implementation path."""
    h = x / 2.0
    eq = math.exp(-h)
    if df % 2 == 0:
        m = df // 2
        return eq * sum(h**j / math.factorial(j) for j in range(m))
    t = 1.0 / (1.0 + 0.2316419 * math.sqrt(x))
    b = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
    poly = t * (b[0] + t * (b[1] + t * (b[2] + t * (b[3] + t * b[4]))))
    nsf = math.exp(-x / 2.0) * 0.3989422804014327 * poly
    base = 2.0 * nsf
    m = (df - 1) // 2
    if m == 0:
        return base
    return base + eq * math.sqrt(h) * sum(
        h ** (j - 1) / math.gamma(j + 0.5) for j in range(1, m + 1)
    )


def test_chi2_sf_q_matches_published_critical_values(spark):
    """The closed form at the textbook critical values: SF(crit_05, df)
    must be 0.05 within the documented error (A&S ~1.5e-7 plus the
    2^-20 exp-grid quantum amplified by the polynomial factor — a few
    e-5 by df ~ 5-8), for even AND odd df; also pins the column
    expression against the independent Python replication."""
    crits = {
        1: 3.841458820694124,
        2: 5.991464547107979,
        3: 7.814727903251179,
        4: 9.487729036781154,
        5: 11.070497693516351,
        8: 15.50731305586545,
    }
    rows = [(df, x) for df, x in crits.items()]
    sdf = spark.createDataFrame(rows, "df int, x double")
    for df, x in crits.items():
        got = (
            sdf.filter(F.col("df") == df)
            .select(chi2_sf_q(F.col("x"), df).alias("p"))
            .collect()[0]["p"]
        )
        assert got == pytest.approx(0.05, abs=5e-5), (df, got)
        assert got == pytest.approx(_chi2_sf_reference(x, df), abs=5e-5)
    # grid sanity: SF(0) = 1 for even df; ~1 for odd (through the
    # normal chain); monotone decreasing in x
    z = spark.range(1).select(
        chi2_sf_q(F.lit(0.0), 2).alias("p2"),
        chi2_sf_q(F.lit(0.0), 3).alias("p3"),
        chi2_sf_q(F.lit(5.0), 4).alias("lo"),
        chi2_sf_q(F.lit(1.0), 4).alias("hi"),
    ).collect()[0]
    assert z["p2"] == pytest.approx(1.0, abs=2e-6)
    assert z["p3"] == pytest.approx(1.0, abs=1e-5)
    assert z["lo"] < z["hi"]
    with pytest.raises(ValueError, match="df >= 1"):
        chi2_sf_q(F.lit(1.0), 0)


def test_chi2_independence_hand_computed(spark):
    """Classic 2x2 [[10,20],[30,40]]: chi2 = n(ad-bc)^2/(r1 r2 c1 c2)
    = 100 * 200^2 / (30*70*40*60) = 0.7936...; df = 1 (the odd-df
    normal-chain tail), p ~= 0.373 — independent of the category
    labels' order."""
    rows = (
        [("r0", "c0")] * 10 + [("r0", "c1")] * 20
        + [("r1", "c0")] * 30 + [("r1", "c1")] * 40
    )
    df = spark.createDataFrame(rows, "seg string, cat string")
    out = chi2_independence(df, row_col="seg", col_col="cat").collect()
    assert len(out) == 4
    want_chi2 = 100 * (10 * 40 - 20 * 30) ** 2 / (30 * 70 * 40 * 60)
    r = out[0]
    assert r["df"] == 1
    assert r["chi2"] == pytest.approx(want_chi2, abs=1e-5)
    assert r["p_value"] == pytest.approx(
        _chi2_sf_reference(want_chi2, 1), abs=1e-5
    )
    assert r["dependent"] is False
    # Cramer's V effect size: sqrt(chi2 / (n * min(r-1, c-1)))
    assert r["cramers_v"] == pytest.approx(math.sqrt(want_chi2 / 100), abs=1e-5)
    cells = {(x["row_key"], x["col_key"]): x for x in out}
    assert cells[("r0", "c0")]["n"] == 10
    assert cells[("r0", "c0")]["expected_n"] == pytest.approx(30 * 40 / 100)
    # per-cell contribution is the quantized (O-E)^2/E
    g = float(1 << 20)
    e00 = 30 * 40 / 100
    assert cells[("r0", "c0")]["contrib_q"] == math.floor(
        (10 - e00) ** 2 / e00 * g
    ) / g


def test_chi2_independence_zero_cell_and_guards(spark):
    """A zero observed cell appears in the dense grid and contributes
    its full expected count ((0-E)^2/E = E); [[5,0],[5,10]] gives
    chi2 = 20/3 -> dependent at alpha=0.05.  One category per axis
    raises."""
    rows = [("a", "x")] * 5 + [("b", "x")] * 5 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, "seg string, cat string")
    out = {(r["row_key"], r["col_key"]): r for r in
           chi2_independence(df, row_col="seg", col_col="cat").collect()}
    assert ("a", "y") in out and out[("a", "y")]["n"] == 0
    assert out[("a", "y")]["expected_n"] == pytest.approx(2.5)
    r = out[("a", "x")]
    assert r["chi2"] == pytest.approx(20.0 / 3.0, abs=1e-5)
    assert r["dependent"] is True and r["p_value"] < 0.01

    with pytest.raises(ValueError, match=">= 2 categories"):
        chi2_independence(
            spark.createDataFrame([("a", "x"), ("a", "y")], "seg string, cat string"),
            row_col="seg", col_col="cat",
        )


def test_chi2_independence_independent_fixture_accepts(spark):
    """A perfectly proportional table ([[10,20],[20,40]]) has chi2 = 0
    and p ~= 1 — the test must NOT fire."""
    rows = (
        [("r0", "c0")] * 10 + [("r0", "c1")] * 20
        + [("r1", "c0")] * 20 + [("r1", "c1")] * 40
    )
    df = spark.createDataFrame(rows, "seg string, cat string")
    r = chi2_independence(df, row_col="seg", col_col="cat").collect()[0]
    assert r["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert r["p_value"] == pytest.approx(1.0, abs=1e-5)
    assert r["dependent"] is False


def test_bh_qvalues_hand_computed(spark):
    """Textbook step-down: p = [.005, .01, .03, .04], m = 4 -> raw
    m*p/rank = [.02, .02, .04, .04]; the running min from the bottom
    gives q = [.02, .02, .04, .04]; all reject at alpha = .05, only the
    first two at alpha = .03.  The cap clamps q at 1, and ties break by
    id deterministically."""
    from patternly_spark.operators.drift import bh_qvalues

    df = spark.createDataFrame(
        [("t1", 0.01), ("t2", 0.04), ("t3", 0.03), ("t4", 0.005)],
        "test string, p double",
    )
    out = bh_qvalues(df, p_col="p", id_cols=["test"], alpha=0.05).collect()
    assert [r["test"] for r in out] == ["t4", "t1", "t3", "t2"]
    assert [r["rank"] for r in out] == [1, 2, 3, 4]
    qs = [r["q_value"] for r in out]
    assert qs == pytest.approx([0.02, 0.02, 0.04, 0.04])
    assert all(r["rejected"] for r in out)
    strict = bh_qvalues(df, p_col="p", id_cols=["test"], alpha=0.03).collect()
    assert [r["rejected"] for r in strict] == [True, True, False, False]

    # cap at 1 and deterministic tie-break by id
    df2 = spark.createDataFrame(
        [("a", 0.9), ("b", 0.9)], "test string, p double"
    )
    out2 = bh_qvalues(df2, p_col="p", id_cols=["test"]).collect()
    assert [r["test"] for r in out2] == ["a", "b"]
    assert out2[0]["q_value"] == pytest.approx(0.9)  # min(1.8, 0.9)... step-down
    assert out2[1]["q_value"] == pytest.approx(0.9)
    assert not out2[0]["rejected"]

    with pytest.raises(ValueError, match="id_cols"):
        bh_qvalues(df, p_col="p", id_cols=[])


def test_bh_qvalues_matches_reference_on_random_panel(spark):
    """200-test random panel: q-values match a from-scratch numpy BH
    step-down exactly (no libm in the chain)."""
    import numpy as np

    from patternly_spark.operators.drift import bh_qvalues

    rng = np.random.default_rng(10)
    ps = rng.random(200) ** 2
    df = spark.createDataFrame(
        [(f"t{i:03d}", float(ps[i])) for i in range(200)], "test string, p double"
    )
    out = bh_qvalues(df, p_col="p", id_cols=["test"]).collect()
    order = np.argsort(ps, kind="stable")
    sp = ps[order]
    m = len(sp)
    raw = sp * m / np.arange(1, m + 1)
    q = np.minimum.accumulate(raw[::-1])[::-1]
    q = np.minimum(q, 1.0)
    got = np.array([r["q_value"] for r in out])
    assert np.array_equal(got, q)


def test_mantel_haenszel_hand_computed(spark):
    """Two hand strata: s1 = [[4,6],[2,8]], s2 = [[10,10],[5,15]] ->
    OR_MH = (1.6 + 3.75) / (0.6 + 1.25) = 2.8919..., MH chi2 =
    (14 - 10.5)^2 / (8400/7600 + 150000/62400) = 3.4909..., p ~= .062
    (not significant at .05 — borderline by construction); per-stratum
    odds ratios exposed alongside."""
    from patternly_spark.operators.drift import mantel_haenszel

    def stratum(s, a, b, c, d):
        return (
            [(s, 1, 1)] * a + [(s, 1, 0)] * b + [(s, 0, 1)] * c + [(s, 0, 0)] * d
        )

    rows = stratum(1, 4, 6, 2, 8) + stratum(2, 10, 10, 5, 15)
    df = spark.createDataFrame(rows, "st long, t int, y int")
    out = mantel_haenszel(
        df, stratum_col="st", treat_col="t", outcome_col="y"
    ).collect()
    assert len(out) == 2
    by = {r["stratum"]: r for r in out}
    assert (by[1]["a"], by[1]["b"], by[1]["c"], by[1]["d"]) == (4, 6, 2, 8)
    assert by[1]["or_stratum"] == pytest.approx(4 * 8 / (6 * 2))
    assert by[2]["or_stratum"] == pytest.approx(10 * 15 / (10 * 5))
    want_or = (1.6 + 3.75) / (0.6 + 1.25)
    want_chi2 = (14 - 10.5) ** 2 / (8400 / 7600 + 150000 / 62400)
    r = out[0]
    assert r["or_mh"] == pytest.approx(want_or, abs=1e-5)
    assert r["chi2"] == pytest.approx(want_chi2, abs=1e-4)
    assert r["p_value"] == pytest.approx(
        _chi2_sf_reference(want_chi2, 1), abs=1e-4
    )
    assert r["significant"] is False
    # Robins-Breslow-Greenland CI, hand-folded: sum(PR)=3.30375,
    # sum(PS+QR)=3.1875, sum(QS)=0.70875 over sum(R)=5.35, sum(S)=1.85
    se2 = (
        3.30375 / (2 * 5.35**2)
        + 3.1875 / (2 * 5.35 * 1.85)
        + 0.70875 / (2 * 1.85**2)
    )
    assert r["se_log_or"] == pytest.approx(math.sqrt(se2), abs=1e-6)
    lo = math.exp(math.log(want_or) - 1.959963984540054 * math.sqrt(se2))
    hi = math.exp(math.log(want_or) + 1.959963984540054 * math.sqrt(se2))
    assert r["or_mh_lo"] == pytest.approx(lo, abs=2e-4)
    assert r["or_mh_hi"] == pytest.approx(hi, abs=2e-4)
    assert r["or_mh_lo"] < 1.0 < r["or_mh_hi"]  # CI agrees with p > .05

    # Simpson guard: strata individually FLAT (OR = 1) but sizes and
    # base rates arranged so the POOLED table looks positive — MH must
    # report ~1 (adjusted), not the confounded pooled lift
    flat = (
        stratum(1, 8, 2, 8, 2)      # high-rate stratum, mostly treated... OR=1
        + stratum(2, 2, 8, 2, 8)    # low-rate stratum, OR=1
    )
    fdf = spark.createDataFrame(flat, "st long, t int, y int")
    fr = mantel_haenszel(
        fdf, stratum_col="st", treat_col="t", outcome_col="y"
    ).collect()[0]
    assert fr["or_mh"] == pytest.approx(1.0, abs=1e-9)
    assert fr["significant"] is False

    # or_stratum NULL when a cross cell is 0; tiny stratum (n = 1)
    # contributes zero variance instead of dividing by zero
    edge = stratum(1, 3, 0, 2, 5) + [(2, 1, 1)]
    er = mantel_haenszel(
        spark.createDataFrame(edge, "st long, t int, y int"),
        stratum_col="st", treat_col="t", outcome_col="y",
    ).collect()
    eby = {r["stratum"]: r for r in er}
    assert eby[1]["or_stratum"] is None  # b = 0
    assert eby[2]["n"] == 1


def test_poisson_rate_test_hand_computed(spark):
    """Hand case: control 20 events / 1000 exposure units vs treatment
    40 / 1000 -> pooled rate .03, z = (0.04 - 0.02)/sqrt(.03*(2/1000))
    = 2.582..., two-sided p ~= .0098 -> significant; rate_ratio = 2.
    Arm order follows the lexical convention; zero-event input
    surfaces NULLs, and a one-arm input raises."""
    import math

    from patternly_spark.operators.drift import poisson_rate_test

    rows = [("a", 2, 100)] * 10 + [("b", 4, 100)] * 10
    df = spark.createDataFrame(rows, "arm string, ev long, exp long")
    r = poisson_rate_test(
        df, arm_col="arm", events_col="ev", exposure_col="exp"
    ).collect()[0]
    assert (r["events_control"], r["events_treatment"]) == (20, 40)
    assert (r["exposure_control"], r["exposure_treatment"]) == (1000, 1000)
    assert r["rate_control"] == pytest.approx(0.02)
    assert r["rate_treatment"] == pytest.approx(0.04)
    assert r["rate_ratio"] == pytest.approx(2.0)
    want_z = (0.04 - 0.02) / math.sqrt(0.03 * (1 / 1000 + 1 / 1000))
    assert r["z"] == pytest.approx(want_z, abs=1e-9)
    assert r["p_value"] == pytest.approx(
        2 * _chi2_sf_reference(want_z * want_z, 1) / 2, abs=1e-4
    )  # 2*normal_sf(z) == chi2_sf(z^2, 1)
    assert r["significant"] is True

    # unequal exposures move the verdict: same event counts, one arm
    # with 4x the exposure -> rates differ 4x
    rows2 = [("a", 2, 400)] * 10 + [("b", 2, 100)] * 10
    r2 = poisson_rate_test(
        spark.createDataFrame(rows2, "arm string, ev long, exp long"),
        arm_col="arm", events_col="ev", exposure_col="exp",
    ).collect()[0]
    assert r2["rate_ratio"] == pytest.approx(4.0)

    zero = spark.createDataFrame(
        [("a", 0, 10), ("b", 0, 10)], "arm string, ev long, exp long"
    )
    rz = poisson_rate_test(
        zero, arm_col="arm", events_col="ev", exposure_col="exp"
    ).collect()[0]
    assert rz["z"] is None and rz["p_value"] is None

    with pytest.raises(ValueError, match="exactly 2 arms"):
        poisson_rate_test(
            spark.createDataFrame([("a", 1, 1)], "arm string, ev long, exp long"),
            arm_col="arm", events_col="ev", exposure_col="exp",
        )


def test_spearman_correlation_behaviors(spark):
    """Perfect monotone (nonlinear!) -> rho = 1; reversed -> -1;
    constant column -> NULL rho; a tied fixture matches a from-scratch
    numpy midrank reference exactly (the fold is pure integers)."""
    import numpy as np

    from patternly_spark.operators.drift import spearman_correlation

    xs = [1, 2, 3, 5, 8, 13, 21]
    mono = spark.createDataFrame(
        [(x, x * x * x) for x in xs], "x long, y long"  # monotone, nonlinear
    )
    r = spearman_correlation(mono, x_col="x", y_col="y").collect()[0]
    assert r["rho"] == pytest.approx(1.0, abs=1e-12) and r["n"] == 7
    rev = spark.createDataFrame([(x, -x) for x in xs], "x long, y long")
    assert spearman_correlation(rev, x_col="x", y_col="y").collect()[0][
        "rho"
    ] == pytest.approx(-1.0, abs=1e-12)

    const = spark.createDataFrame([(x, 7) for x in xs], "x long, y long")
    rc = spearman_correlation(const, x_col="x", y_col="y").collect()[0]
    assert rc["rho"] is None and rc["significant"] is None

    rng = np.random.default_rng(3)
    x = rng.integers(0, 50, size=400)   # heavy ties
    y = x + rng.integers(0, 30, size=400)
    df = spark.createDataFrame(
        [(int(x[i]), int(y[i])) for i in range(400)], "x long, y long"
    )
    got = spearman_correlation(df, x_col="x", y_col="y").collect()[0]

    def midranks(a):
        order = np.argsort(a, kind="stable")
        ranks = np.empty(len(a), dtype=float)
        sa = a[order]
        i = 0
        while i < len(a):
            j = i
            while j + 1 < len(a) and sa[j + 1] == sa[i]:
                j += 1
            ranks[order[i:j + 1]] = (i + j) / 2 + 1
            i = j + 1
        return ranks

    rx, ry = midranks(x.astype(np.int64)), midranks(y.astype(np.int64))
    ref = np.corrcoef(rx, ry)[0, 1]
    assert got["rho"] == pytest.approx(ref, abs=1e-12)
    assert got["significant"] is True and got["p_value"] < 1e-6
