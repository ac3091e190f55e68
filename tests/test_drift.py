"""Drift monitor: chi2/PSI vs a Python replica, grid semantics,
partition invariance, and streaming batch-parity."""

import math

import pytest
from pyspark.sql import functions as F

from patternly_spark.operators.drift import DRIFT_SCALE, PSI_EPS, categorical_drift


def _replica(obs: dict[str, int], ref: dict[str, int], psi_eps: float = PSI_EPS):
    """Python twin of the per-cell math: quantized term sums."""
    n = sum(obs.values())
    big_n = sum(ref.values())
    chi_q = 0
    psi_q = 0
    seen = 0
    for cat, c in ref.items():
        o = obs.get(cat, 0)
        seen += o
        dev = float(o) * float(big_n) - float(n) * float(c)
        chi_term = dev * dev / (float(n) * float(c) * float(big_n))
        chi_q += math.floor(chi_term * DRIFT_SCALE)
        p_obs = max(float(o) / float(n), psi_eps)
        p_ref = float(c) / float(big_n)
        lnr = math.floor(math.log(p_obs / p_ref) * DRIFT_SCALE) / DRIFT_SCALE
        psi_q += math.floor(((float(o) / float(n)) - p_ref) * lnr * DRIFT_SCALE)
    return {
        "n": n,
        "chi2": chi_q / DRIFT_SCALE,
        "psi": psi_q / DRIFT_SCALE,
        "unseen_frac": (n - seen) / n,
    }


@pytest.fixture(scope="module")
def skewed(spark):
    # day 0 matches the reference mix; day 1 is heavily drifted;
    # day 2 contains a category the reference has never seen
    rows = []
    mixes = {
        0: {"a": 80, "b": 15, "c": 5},
        1: {"a": 5, "b": 15, "c": 80},
        2: {"a": 70, "b": 15, "c": 5, "NEW": 10},
    }
    for day, mix in mixes.items():
        for cat, k in mix.items():
            rows += [(day, cat)] * k
    return spark.createDataFrame(rows, "day int, cat string"), mixes


def test_drift_matches_python_replica(spark, skewed):
    df, mixes = skewed
    ref = spark.createDataFrame(
        [("a", 80), ("b", 15), ("c", 5)], "cat string, ref_cnt long"
    )
    got = {
        r["day"]: r
        for r in categorical_drift(df, "cat", by="day", ref=ref).collect()
    }
    refd = {"a": 80, "b": 15, "c": 5}
    for day, mix in mixes.items():
        want = _replica(mix, refd)
        for k, v in want.items():
            assert got[day][k] == v, (day, k, got[day][k], v)
    # matched day scores ~0, drifted day scores big, strictly ordered
    assert got[0]["chi2"] == 0.0 and got[0]["psi"] <= 0.0 + 1e-9
    assert got[1]["chi2"] > 100 and got[1]["psi"] > 1.0
    assert got[2]["unseen_frac"] == 0.1 and got[0]["unseen_frac"] == 0.0


def test_drift_missing_category_counts_against(spark):
    # group never emits 'b': the b-cell must contribute its expected
    # mass to chi2 (grid join, not inner join)
    df = spark.createDataFrame([(0, "a")] * 50, "g int, cat string")
    ref = spark.createDataFrame([("a", 50), ("b", 50)], "cat string, ref_cnt long")
    row = categorical_drift(df, "cat", by="g", ref=ref).collect()[0]
    want = _replica({"a": 50}, {"a": 50, "b": 50})
    assert row["chi2"] == want["chi2"] and row["chi2"] > 40  # ~n for a 50% miss
    assert row["psi"] == want["psi"]


def test_drift_self_reference_default(spark, skewed):
    df, _ = skewed
    # ref=None: global mix as reference; statistics still exact vs replica
    out = {r["day"]: r for r in categorical_drift(df, "cat", by="day").collect()}
    glob = {"a": 155, "b": 45, "c": 90, "NEW": 10}
    mixes = {
        0: {"a": 80, "b": 15, "c": 5},
        1: {"a": 5, "b": 15, "c": 80},
        2: {"a": 70, "b": 15, "c": 5, "NEW": 10},
    }
    for day, mix in mixes.items():
        want = _replica(mix, glob)
        assert out[day]["chi2"] == want["chi2"], day
        assert out[day]["unseen_frac"] == 0.0


def test_drift_partition_invariant(spark, skewed):
    df, _ = skewed
    a = sorted(map(tuple, categorical_drift(df, "cat", by="day").collect()))
    b = sorted(
        map(tuple, categorical_drift(df.repartition(13), "cat", by="day").collect())
    )
    assert a == b


def test_streaming_drift_batch_parity(spark, tmp_path):
    from patternly_spark.streaming.drift import streaming_drift

    schema = "cat string, v long"
    src = str(tmp_path / "src")
    b0 = [("a", 1)] * 40 + [("b", 1)] * 10
    b1 = [("a", 1)] * 5 + [("b", 1)] * 55
    spark.createDataFrame(b0, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    ref = spark.createDataFrame([("a", 80), ("b", 20)], "cat string, ref_cnt long")

    q = streaming_drift(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        ref,
        "cat",
        str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        trigger_once=True,
    )
    q.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "out")).toPandas()
    assert len(out) == 2 and set(out.batch_id) == {0, 1}
    # batch-parity law: each emitted row == the batch operator on that
    # microbatch's rows (file-arrival order maps batch 0 -> first file)
    by_n = {int(r.n): r for r in out.itertuples()}
    for batch_rows in (b0, b1):
        bdf = spark.createDataFrame(batch_rows, schema)
        want = categorical_drift(bdf, "cat", ref=ref).collect()[0]
        got = by_n[int(want["n"])]
        assert (got.chi2, got.psi, got.unseen_frac) == (
            want["chi2"],
            want["psi"],
            want["unseen_frac"],
        )


def test_streaming_ks_drift_batch_parity(spark, tmp_path):
    from patternly_spark.operators.drift import ks_drift
    from patternly_spark.streaming.drift import streaming_ks_drift

    schema = "v double"
    src = str(tmp_path / "src")
    b0 = [(float(x),) for x in range(50)]            # matches the reference
    b1 = [(float(x) + 40.0,) for x in range(50)]     # shifted sample
    spark.createDataFrame(b0, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    ref = spark.createDataFrame([(float(x),) for x in range(50)], schema)

    q = streaming_ks_drift(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        ref,
        "v",
        str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"),
        trigger_once=True,
    )
    q.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "out")).toPandas()
    assert len(out) == 2 and set(out.batch_id) == {0, 1}
    # batch-parity law: each emitted row == the batch operator on that
    # microbatch's rows; identify batches by their ks value ordering
    got = {}
    for r in out.itertuples():
        got[int(r.batch_id)] = (int(r.n_obs), int(r.n_ref), float(r.ks))
    for rows in (b0, b1):
        bdf = spark.createDataFrame(rows, schema)
        want = ks_drift(bdf, "v", ref=ref).collect()[0]
        key = (int(want["n_obs"]), int(want["n_ref"]), float(want["ks"]))
        assert key in got.values(), (key, got)
    # the matched batch drifts: identical sample -> ks 0; shifted -> 0.8
    assert sorted(v[2] for v in got.values()) == [0.0, 0.8]


def _ks_replica(a, b):
    pts = sorted(set(a) | set(b))
    best = 0.0
    for v in pts:
        fa = sum(1 for x in a if x <= v) / len(a)
        fb = sum(1 for x in b if x <= v) / len(b)
        best = max(best, abs(fa - fb))
    return best


def test_ks_drift_exact_vs_replica(spark):
    from patternly_spark.operators.drift import ks_drift

    import numpy as np

    rng = np.random.default_rng(7)
    a = [float(x) for x in rng.normal(0, 1, 300)]
    b = [float(x) for x in rng.normal(0.7, 1, 250)]  # shifted group
    rows = [("same", v) for v in a] + [("shift", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    ref = spark.createDataFrame([(v,) for v in a], "v double")
    got = {r["g"]: r for r in ks_drift(df, "v", by="g", ref=ref).collect()}
    assert got["same"]["ks"] == 0.0  # identical sample vs itself
    want = _ks_replica(b, a)
    assert got["shift"]["ks"] == want
    assert got["shift"]["ks"] > 0.2  # a 0.7-sigma shift is visible
    assert (got["shift"]["n_obs"], got["shift"]["n_ref"]) == (250, 300)


def test_ks_drift_disjoint_is_one_and_partition_invariant(spark):
    from patternly_spark.operators.drift import ks_drift

    rows = [("lo", float(i)) for i in range(100)] + [
        ("hi", float(1000 + i)) for i in range(80)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    ref = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    got = {r["g"]: r["ks"] for r in ks_drift(df, "v", by="g", ref=ref).collect()}
    assert got["lo"] == 0.0 and got["hi"] == 1.0
    again = {r["g"]: r["ks"] for r in
             ks_drift(df.repartition(9), "v", by="g", ref=ref).collect()}
    assert got == again


def test_streaming_ema_continues_recurrence_across_batches(spark, tmp_path):
    """Stateful parity law: two per-key time-ordered microbatches emit
    exactly the batch ema() of the union — the registry carries each
    key's last state between folds."""
    from patternly_spark.operators.temporal import ema
    from patternly_spark.streaming.drift import streaming_ema

    schema = "k string, t long, v double"
    b0 = [("u", 0, 4.0), ("u", 1, 8.0), ("w", 0, 2.0)]
    b1 = [("u", 2, 0.0), ("w", 1, 6.0), ("x", 0, 1.0)]
    src = str(tmp_path / "src")
    spark.createDataFrame(b0, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)

    q = streaming_ema(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        "v",
        str(tmp_path / "out"),
        by="k",
        order_col="t",
        checkpoint_path=str(tmp_path / "ckpt"),
        registry_path=str(tmp_path / "reg"),
        trigger_once=True,
    )
    q.awaitTermination(120)

    got = {
        (r["k"], r["t"]): r["ema"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    want = {
        (r["k"], r["t"]): r["ema"]
        for r in ema(
            spark.createDataFrame(b0 + b1, schema), "v", by="k", order_col="t"
        ).collect()
    }
    assert got == want
    # registry holds each key's final state (incl. the batch-0-only key)
    from patternly_spark.streaming.exactly_once import read_registry

    reg = {r["k"]: r["ema"] for r in read_registry(spark, str(tmp_path / "reg")).collect()}
    assert set(reg) == {"u", "w", "x"}
    assert reg["u"] == want[("u", 2)] and reg["x"] == 1.0


def test_linear_trend_recovers_known_line(spark):
    """y = 3x + 7 (exact dyadic points) fits slope 3, intercept 7 per
    group; a flat group fits slope 0; single-point groups return null."""
    from patternly_spark.operators.drift import linear_trend

    rows = (
        [("up", float(i), 3.0 * i + 7.0) for i in range(10)]
        + [("flat", float(i), 5.0) for i in range(10)]
        + [("one", 1.0, 2.0)]
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in linear_trend(df, "x", "y", by="g").collect()}
    assert abs(out["up"]["slope"] - 3.0) < 1e-5 and abs(out["up"]["intercept"] - 7.0) < 1e-4
    assert abs(out["flat"]["slope"]) < 1e-9
    assert out["one"]["slope"] is None and out["one"]["n"] == 1


def test_cusum_detects_persistent_shift_not_spike(spark):
    """CUSUM's reason to exist: a +3 persistent shift accumulates to an
    alarm while a single big spike (which MAD would flag) decays back —
    and an in-control stream never alarms."""
    from patternly_spark.operators.drift import cusum

    rows = []
    # in-control: alternating ±1 around target 10
    rows += [("ok", t, 10.0 + (1.0 if t % 2 else -1.0)) for t in range(40)]
    # shifted: +3 from t=20 on
    rows += [("shift", t, 10.0 + (3.0 if t >= 20 else 0.0)) for t in range(40)]
    # spike: one +30 excursion at t=20, otherwise on target
    rows += [("spike", t, 40.0 if t == 20 else 10.0) for t in range(40)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = cusum(
        df, "v", by="k", order_col="t", target=10.0, slack=1.0, threshold=20.0
    ).toPandas()
    by_k = {k: g.sort_values("t") for k, g in out.groupby("k")}
    assert not by_k["ok"]["alarm"].any()
    assert by_k["shift"]["alarm"].any()
    assert by_k["shift"][by_k["shift"].alarm].iloc[0]["t"] >= 20
    # the spike pushes hi to 40-10-1 = 29, then on-target values decay
    # it by slack each step (29 - 19 = 10 at the end): briefly alarmed,
    # decaying back under threshold — not a persistent-shift verdict
    assert not by_k["spike"].iloc[-1]["alarm"]
    assert by_k["spike"].iloc[-1]["cusum_hi"] == 10.0
    assert by_k["spike"]["cusum_hi"].max() == 29.0


def test_streaming_cusum_accumulates_across_batches(spark, tmp_path):
    """A persistent shift split across two microbatches must accumulate
    through the registry exactly as the batch fold of the union —
    including a key that alarms ONLY because of carried state."""
    from pyspark.sql import functions as F

    from patternly_spark.operators.drift import cusum
    from patternly_spark.streaming.drift import streaming_cusum

    schema = "k string, t long, v double"
    # 'u' runs +2 above target in both batches: neither batch alone
    # reaches threshold 7 (4 steps x 1 net), the union does
    b0 = [("u", t, 12.0) for t in range(4)]
    b1 = [("u", 4 + t, 12.0) for t in range(4)]
    src = str(tmp_path / "src")
    spark.createDataFrame(b0, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)

    q = streaming_cusum(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        "v",
        str(tmp_path / "out"),
        by="k",
        order_col="t",
        checkpoint_path=str(tmp_path / "ckpt"),
        registry_path=str(tmp_path / "reg"),
        target=10.0,
        slack=1.0,
        threshold=7.0,
        trigger_once=True,
    )
    q.awaitTermination(120)

    got = {
        (r["k"], r["t"]): (r["cusum_hi"], r["alarm"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    want = {
        (r["k"], r["t"]): (r["cusum_hi"], r["alarm"])
        for r in cusum(
            spark.createDataFrame(b0 + b1, schema), "v",
            by="k", order_col="t", target=10.0, slack=1.0, threshold=7.0,
        ).collect()
    }
    assert got == want
    assert got[("u", 3)] == (4.0, False)   # end of batch 0: no alarm yet
    assert got[("u", 7)] == (8.0, True)    # carried state crosses in batch 1


def test_pairwise_correlation_known_relationships(spark):
    """Perfectly correlated, anti-correlated and independent series
    over shared keys; degenerate (constant) series return null."""
    from patternly_spark.operators.drift import pairwise_correlation

    rows = []
    for k in range(16):
        rows += [("up", k, float(k)), ("down", k, float(-2 * k)), ("flat", k, 5.0)]
        rows += [("alt", k, 1.0 if k % 2 else -1.0)]
    df = spark.createDataFrame(rows, "s string, k long, v double")
    out = {(r["series_a"], r["series_b"]): r for r in pairwise_correlation(df, "s", "k", "v").collect()}
    assert abs(out[("down", "up")]["corr"] + 1.0) < 1e-9
    assert out[("flat", "up")]["corr"] is None          # zero variance side
    assert abs(out[("alt", "up")]["corr"]) < 0.2        # near-independent
    assert out[("down", "up")]["n"] == 16


def test_theil_sen_exact_median_slope(spark):
    from patternly_spark.operators.drift import theil_sen_trend

    # y = 2x except one gross outlier at x=3 -> slope median stays 2
    rows = [("a", 0.0, 0.0), ("a", 1.0, 2.0), ("a", 2.0, 4.0),
            ("a", 3.0, 100.0), ("a", 4.0, 8.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = theil_sen_trend(
        df, x_col="x", y_col="y", group_cols=["g"]
    ).collect()[0]
    assert out["n_points"] == 5 and out["n_pairs"] == 10
    # pairwise slopes: hand-enumerate, median of 10 = mean of 5th,6th
    pts = [(0.0, 0.0), (1.0, 2.0), (2.0, 4.0), (3.0, 100.0), (4.0, 8.0)]
    slopes = sorted(
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(pts)
        for (x2, y2) in pts[i + 1:]
    )
    want = (slopes[4] + slopes[5]) / 2
    assert out["slope"] == want
    res = sorted(y - want * x for x, y in pts)
    assert out["intercept"] == res[2]


def test_theil_sen_dedups_x_and_guards_width(spark):
    import pytest

    from patternly_spark.operators.drift import theil_sen_trend

    # duplicate x averaged first: (1, 0) and (1, 4) -> (1, 2)
    rows = [("a", 0.0, 1.0), ("a", 1.0, 0.0), ("a", 1.0, 4.0), ("a", 2.0, 5.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = theil_sen_trend(df, x_col="x", y_col="y", group_cols=["g"]).collect()[0]
    assert out["n_points"] == 3 and out["n_pairs"] == 3
    # points (0,1),(1,2),(2,5): slopes 1, 2, 3 -> median 2
    assert out["slope"] == 2.0
    with pytest.raises(ValueError, match="max_points"):
        theil_sen_trend(
            df, x_col="x", y_col="y", group_cols=["g"], max_points=2
        )


def test_theil_sen_partition_invariant_grouped(spark):
    from patternly_spark.operators.drift import theil_sen_trend

    rows = [
        (g, float(i), float(i) * s + (7.0 if i == 5 else 0.0) + 0.1 * ((i * 13) % 5))
        for g, s in (("u", 1.5), ("v", -0.5))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    one = theil_sen_trend(
        df.coalesce(1), x_col="x", y_col="y", group_cols=["g"]
    ).orderBy("g").collect()
    many = theil_sen_trend(
        df.repartition(32), x_col="x", y_col="y", group_cols=["g"]
    ).orderBy("g").collect()
    assert [tuple(r) for r in one] == [tuple(r) for r in many]
    by = {r["g"]: r for r in one}
    assert abs(by["u"]["slope"] - 1.5) < 0.2
    assert abs(by["v"]["slope"] + 0.5) < 0.2


def test_mutual_information_hand_computed(spark):
    import math

    from patternly_spark.operators.drift import mutual_information

    u = 1 << 20
    # 2x2 contingency: counts [[3,1],[1,3]], n=8
    rows = (
        [("a", "x")] * 3 + [("a", "y")] * 1 + [("b", "x")] * 1 + [("b", "y")] * 3
    )
    df = spark.createDataFrame(rows, "xc string, yc string")
    out = mutual_information(df, x_col="xc", y_col="yc").collect()[0]
    assert out["n"] == 8 and out["cells"] == 4

    def q(v):
        return math.floor(v * u) / u

    def term(c, cx, cy, n):
        lnq = q(math.log((c * n) / (cx * cy)))
        return math.floor(c / n * lnq * u)

    mi_u = sum(term(c, cx, cy, 8) for c, cx, cy in
               [(3, 4, 4), (1, 4, 4), (1, 4, 4), (3, 4, 4)])
    assert out["mi"] == mi_u / u

    def hterm(c, cm, n):
        lnq = q(math.log(n / cm))
        return math.floor(c / n * lnq * u)

    hx_u = sum(hterm(c, cx, 8) for c, cx in [(3, 4), (1, 4), (1, 4), (3, 4)])
    assert out["h_x"] == hx_u / u == out["h_y"]
    assert out["nmi"] == (mi_u / u) / math.sqrt((hx_u / u) ** 2)


def test_mutual_information_independence_and_identity(spark):
    import math

    from patternly_spark.operators.drift import mutual_information

    # independent columns -> MI ~ 0 (within quantization bias)
    rows = [(f"g", str(i % 3), str((i // 3) % 4)) for i in range(120)]
    df = spark.createDataFrame(rows, "g string, xc string, yc string")
    out = mutual_information(
        df, x_col="xc", y_col="yc", group_cols=["g"]
    ).collect()[0]
    assert abs(out["mi"]) < 1e-4
    # identical columns -> MI == H(X), NMI == 1 (up to quantization)
    rows = [("g", str(i % 5), str(i % 5)) for i in range(100)]
    df2 = spark.createDataFrame(rows, "g string, xc string, yc string")
    o2 = mutual_information(
        df2, x_col="xc", y_col="yc", group_cols=["g"]
    ).collect()[0]
    assert abs(o2["mi"] - math.log(5)) < 1e-4
    assert abs(o2["nmi"] - 1.0) < 1e-4
    # partition invariance
    a = mutual_information(
        df.coalesce(1), x_col="xc", y_col="yc", group_cols=["g"]
    ).collect()
    b = mutual_information(
        df.repartition(32), x_col="xc", y_col="yc", group_cols=["g"]
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bh_fdr_textbook_example(spark):
    from patternly_spark.operators.drift import bh_fdr

    # classic: m=10, q=0.25; p sorted: .010 .013 .014 .190 .350 .500 .630 .670 .750 .810
    ps = [0.010, 0.013, 0.014, 0.190, 0.350, 0.500, 0.630, 0.670, 0.750, 0.810]
    rows = [(i, p) for i, p in enumerate(ps)]
    df = spark.createDataFrame(rows, "tid long, p double")
    out = {r["tid"]: r for r in bh_fdr(
        df, p_col="p", id_cols=["tid"], fdr_q=0.25
    ).collect()}
    # k*q/m: .025 .05 .075 .1 ... p_(3)=.014 <= .075 is the largest pass
    assert [out[i]["reject"] for i in range(10)] == [True] * 3 + [False] * 7
    assert out[0]["m_tests"] == 10
    assert out[3]["bh_critical"] == 4 * 0.25 / 10


def test_bh_fdr_none_pass_and_tie_determinism(spark):
    from patternly_spark.operators.drift import bh_fdr

    # all large p: nothing rejected
    df = spark.createDataFrame([(i, 0.9) for i in range(5)], "tid long, p double")
    out = bh_fdr(df, p_col="p", id_cols=["tid"], fdr_q=0.05).collect()
    assert all(not r["reject"] for r in out)
    # ties at the threshold: all equal-p rows share a verdict
    rows = [(0, 0.01), (1, 0.01), (2, 0.01), (3, 0.9), (4, 0.9)]
    df2 = spark.createDataFrame(rows, "tid long, p double")
    got = {r["tid"]: r["reject"] for r in bh_fdr(
        df2, p_col="p", id_cols=["tid"], fdr_q=0.1
    ).collect()}
    assert got[0] == got[1] == got[2]
    # grouped + partition invariance
    rows = [("g%d" % (i % 3), i, ((i * 17) % 100) / 100.0) for i in range(120)]
    df3 = spark.createDataFrame(rows, "g string, tid long, p double")
    a = bh_fdr(df3.coalesce(1), p_col="p", id_cols=["tid"], group_cols=["g"]).orderBy("g", "tid").collect()
    b = bh_fdr(df3.repartition(32), p_col="p", id_cols=["tid"], group_cols=["g"]).orderBy("g", "tid").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_robust_means_hand_computed(spark):
    from patternly_spark.operators.drift import robust_means

    # cents: one gross outlier; n=10, trim .1 -> k=1
    vals = [100, 110, 120, 130, 140, 150, 160, 170, 180, 100000]
    df = spark.createDataFrame([(v,) for v in vals], "c long")
    out = robust_means(df, value_cents_col="c", trim=0.1).collect()[0]
    assert out["n"] == 10 and out["k_trimmed"] == 1
    assert out["mean"] == sum(vals) / 10.0
    assert out["trimmed_mean"] == sum(sorted(vals)[1:9]) / 8.0
    wins = sorted(vals)
    wins[0], wins[-1] = wins[1], wins[-2]
    assert out["winsorized_mean"] == sum(wins) / 10.0
    # outlier moved the raw mean but not the robust ones
    assert out["mean"] > 2 * out["trimmed_mean"]


def test_robust_means_overtrim_and_partition_invariance(spark):
    from patternly_spark.operators.drift import robust_means

    df = spark.createDataFrame([("g", 5), ("g", 7)], "g string, c long")
    out = robust_means(
        df, value_cents_col="c", group_cols=["g"], trim=0.49
    ).collect()[0]
    # k = floor(.49*2) = 0 -> fine; with n=1, k=0 stays fine; force overtrim:
    df1 = spark.createDataFrame([("g", 5), ("g", 6), ("g", 7)], "g string, c long")
    o1 = robust_means(
        df1, value_cents_col="c", group_cols=["g"], trim=0.4
    ).collect()[0]
    # k = floor(1.2) = 1, middle = 1 row -> trimmed == median
    assert o1["trimmed_mean"] == 6.0
    rows = [("a", (i * 37) % 500) for i in range(200)] + [
        ("b", (i * 11) % 90) for i in range(77)
    ]
    dfx = spark.createDataFrame(rows, "g string, c long")
    a = robust_means(dfx.coalesce(1), value_cents_col="c", group_cols=["g"]).orderBy("g").collect()
    b = robust_means(dfx.repartition(32), value_cents_col="c", group_cols=["g"]).orderBy("g").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert out["n"] == 2


def test_sprt_decides_and_matches_python_replay(spark):
    import math

    from patternly_spark.operators.drift import sprt_test

    u = 1 << 20
    p0, p1, al, be = 0.2, 0.5, 0.05, 0.05
    # group "hot" converts 60% -> accept_h1; "cold" 5% -> accept_h0;
    # "tiny" has 2 rows -> continue
    rows = []
    for i in range(60):
        rows.append(("hot", i, 1 if (i * 7) % 10 < 6 else 0))
        rows.append(("cold", i, 1 if (i * 7) % 20 == 0 else 0))
    rows += [("tiny", 0, 1), ("tiny", 1, 0)]
    df = spark.createDataFrame(rows, "g string, ts long, y int")
    out = {r["g"]: r for r in sprt_test(
        df, ts_col="ts", outcome_col="y", group_cols=["g"],
        p0=p0, p1=p1, alpha=al, beta=be,
    ).collect()}
    assert out["hot"]["decision"] == "accept_h1"
    assert out["cold"]["decision"] == "accept_h0"
    assert out["tiny"]["decision"] == "continue"
    assert out["tiny"]["n_at_decision"] is None

    # python replay of the integer walk for "hot"
    inc1 = math.floor(math.log(p1 / p0) * u)
    inc0 = math.floor(math.log((1 - p1) / (1 - p0)) * u)
    hi = math.floor(math.log((1 - be) / al) * u)
    seq = sorted([(t, y) for g, t, y in rows if g == "hot"])
    llr, nd = 0, None
    for k, (_t, y) in enumerate(seq, 1):
        llr += inc1 if y else inc0
        if nd is None and llr >= hi:
            nd, llr_at = k, llr
    assert out["hot"]["n_at_decision"] == nd
    assert out["hot"]["llr_at_decision"] == llr_at / u
    assert out["hot"]["llr_final"] == llr / u


def test_sprt_partition_invariant(spark):
    from patternly_spark.operators.drift import sprt_test

    rows = [("g", i // 3, (i * 11) % 3 == 0) for i in range(90)]  # ts ties
    df = spark.createDataFrame(rows, "g string, ts long, y boolean")
    a = sprt_test(df.coalesce(1), ts_col="ts", outcome_col="y",
                  group_cols=["g"], p0=0.2, p1=0.4).collect()
    b = sprt_test(df.repartition(32), ts_col="ts", outcome_col="y",
                  group_cols=["g"], p0=0.2, p1=0.4).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_weighted_median_hand_and_guard(spark):
    import pytest

    from patternly_spark.operators.drift import weighted_median

    # values 1..4 with weights 1,1,1,7 -> total 10, thr 5 -> median 4
    rows = [("g", 1.0, 1), ("g", 2.0, 1), ("g", 3.0, 1), ("g", 4.0, 7)]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    out = weighted_median(
        df, value_col="v", weight_col="w", group_cols=["g"]
    ).collect()[0]
    assert out["weighted_median"] == 4.0
    assert out["total_weight"] == 10 and out["n_values"] == 4
    # unweighted case degenerates to the plain lower median
    rows2 = [("h", float(v), 1) for v in (5, 1, 9, 3)]
    df2 = spark.createDataFrame(rows2, "g string, v double, w long")
    o2 = weighted_median(
        df2, value_col="v", weight_col="w", group_cols=["g"]
    ).collect()[0]
    assert o2["weighted_median"] == 3.0  # thr ceil(4/2)=2 -> 2nd smallest
    with pytest.raises(ValueError, match="non-positive"):
        weighted_median(
            spark.createDataFrame([("g", 1.0, 0)], "g string, v double, w long"),
            value_col="v", weight_col="w", group_cols=["g"],
        )
    # duplicate values aggregate; partition invariance
    rows3 = [("k", float(i % 5), (i % 3) + 1) for i in range(60)]
    df3 = spark.createDataFrame(rows3, "g string, v double, w long")
    a = weighted_median(df3.coalesce(1), value_col="v", weight_col="w",
                        group_cols=["g"]).collect()
    b = weighted_median(df3.repartition(32), value_col="v", weight_col="w",
                        group_cols=["g"]).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_streaming_sprt_registry_equals_batch(spark, tmp_path):
    from patternly_spark.operators.drift import sprt_test
    from patternly_spark.streaming.drift import (
        sprt_from_registry,
        streaming_sprt_registry,
    )

    kw = dict(p0=0.2, p1=0.5, alpha=0.05, beta=0.05)
    schema = "g string, ts long, y int"
    # early: crosses h1 within batch 0; late: crosses only across both
    # batches; never: stays undecided; fresh: appears only in batch 1
    b0 = [("early", i, 1) for i in range(15)] + [
        ("late", i, 1 if i % 2 == 0 else 0) for i in range(8)
    ] + [("never", i, 1 if i % 3 == 0 else 0) for i in range(6)]
    b1 = [("early", 100 + i, 0) for i in range(10)] + [
        ("late", 100 + i, 1 if i % 2 == 0 else 0) for i in range(30)
    ] + [("never", 100 + i, 1 if i % 3 == 0 else 0) for i in range(6)] + [
        ("fresh", 100 + i, 1) for i in range(20)
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(b0, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)

    reg = str(tmp_path / "registry")
    q = streaming_sprt_registry(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        reg,
        checkpoint_path=str(tmp_path / "ckpt"),
        ts_col="ts",
        outcome_col="y",
        group_cols=["g"],
        trigger_once=True,
        **kw,
    )
    q.awaitTermination(180)

    got = sprt_from_registry(spark, reg).orderBy("g").collect()
    want = sprt_test(
        spark.createDataFrame(b0 + b1, schema),
        ts_col="ts", outcome_col="y", group_cols=["g"], **kw,
    ).orderBy("g").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    by = {r["g"]: r for r in got}
    assert by["early"]["decision"] == "accept_h1"
    assert by["never"]["decision"] == "continue"
    assert by["fresh"]["decision"] == "accept_h1"


def test_cuped_matches_numpy_and_reduces_variance(spark):
    import numpy as np

    from patternly_spark.operators.drift import cuped_adjustment

    rng = np.random.default_rng(3)
    base = rng.integers(100, 10_000, size=400)  # per-user propensity
    x = base + rng.integers(-50, 50, size=400)  # pre-period (cents)
    arm = np.arange(400) % 2
    y = base + rng.integers(-50, 50, size=400) + arm * 40  # +40c lift
    rows = [(int(a), int(yy), int(xx)) for a, yy, xx in zip(arm, y, x)]
    df = spark.createDataFrame(rows, "arm int, y long, x long")
    out = {r["arm"]: r for r in cuped_adjustment(
        df, metric_cents_col="y", covariate_cents_col="x", arm_col="arm"
    ).collect()}
    # numpy replica
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    # integer closed form replica (exact)
    n = 400
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int((x.astype(object) * y).sum())
    sxx = int((x.astype(object) * x).sum())
    theta_exact = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    assert out[0]["theta"] == theta_exact and abs(theta_exact - theta) < 1e-9
    for a in (0, 1):
        assert out[a]["var_adj"] < out[a]["var_raw"] * 0.1  # big reduction
    # adjusted lift close to the planted 40c, raw lift noisier is not
    # guaranteed on one draw, but adjusted must be within a few cents
    lift_adj = out[1]["adj_mean"] - out[0]["adj_mean"]
    assert abs(lift_adj - 40.0) < 15.0
    # degenerate covariate: theta 0, adj == raw mean
    df2 = spark.createDataFrame([(0, 5, 7), (1, 9, 7)], "arm int, y long, x long")
    o2 = cuped_adjustment(
        df2, metric_cents_col="y", covariate_cents_col="x", arm_col="arm"
    ).collect()
    assert all(r["theta"] == 0.0 and r["adj_mean"] == r["mean_metric"] for r in o2)


def test_balance_check_hand_and_guard(spark):
    import math

    import pytest

    from patternly_spark.operators.drift import balance_check

    # balanced covariate x; imbalanced covariate z
    rows = [(i % 2, 100 + (i % 5), (i % 2) * 50 + (i % 7)) for i in range(140)]
    df = spark.createDataFrame(rows, "arm int, x long, z long")
    out = {r["covariate"]: r for r in balance_check(
        df, arm_col="arm", covariate_cents_cols=["x", "z"]
    ).collect()}
    assert out["x"]["balanced"] is True and abs(out["x"]["smd"]) < 0.05
    assert out["z"]["balanced"] is False and out["z"]["smd"] > 5
    # exact replica of x's smd
    import numpy as np
    a = np.array([r for r in rows if r[0] == 0], dtype=object)
    b = np.array([r for r in rows if r[0] == 1], dtype=object)
    def stats(vals):
        n = len(vals); s = sum(vals); q = sum(v * v for v in vals)
        return s / n, (n * q - s * s) / (n * n)
    mc, vc = stats([r[1] for r in rows if r[0] == 0])
    mt, vt = stats([r[1] for r in rows if r[0] == 1])
    want = (mt - mc) / math.sqrt((vt + vc) / 2.0)
    assert out["x"]["smd"] == want
    with pytest.raises(ValueError, match="2 arms"):
        balance_check(
            spark.createDataFrame([(0, 1), (1, 1), (2, 1)], "arm int, x long"),
            arm_col="arm", covariate_cents_cols=["x"],
        )
