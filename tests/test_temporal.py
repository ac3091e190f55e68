"""asof_join / sessionize (operators/temporal.py): direction semantics,
same-instant inclusivity, tolerance, and session gap strictness."""

import pytest
from pyspark.sql import functions as F

from patternly_spark.operators.temporal import asof_join, sessionize


@pytest.fixture()
def streams(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 7, "d")],
        "user_id long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 15, 2.0), (2, 9, 3.0)],
        "user_id long, ts long, v double",
    )
    return left, right


def test_asof_backward_includes_same_instant(streams):
    left, right = streams
    out = asof_join(left, right, on="ts", by="user_id", right_cols=["v"]).toPandas()
    got = {r.tag: (r.ts_matched, r.v_matched) for r in out.itertuples()}
    assert got["a"] == (10, 1.0)   # same instant matches
    assert got["b"] == (15, 2.0)   # latest at-or-before
    assert got["c"][0] is None or got["c"][0] != got["c"][0]  # nothing before ts=5
    assert got["d"][0] is None or got["d"][0] != got["d"][0]  # user 2: right at 9 > 7


def test_asof_forward(streams):
    left, right = streams
    out = asof_join(
        left, right, on="ts", by="user_id", right_cols=["v"], direction="forward"
    ).toPandas()
    got = {r.tag: (r.ts_matched, r.v_matched) for r in out.itertuples()}
    assert got["a"] == (10, 1.0)   # same instant matches forward too
    assert got["c"] == (10, 1.0)   # earliest at-or-after 5
    assert got["d"] == (9, 3.0)
    assert got["b"][0] is None or got["b"][0] != got["b"][0]  # nothing after 20


def test_asof_tolerance(streams):
    left, right = streams
    out = asof_join(
        left, right, on="ts", by="user_id", right_cols=["v"], tolerance=3
    ).toPandas()
    got = {r.tag: r.v_matched for r in out.itertuples()}
    assert got["a"] == 1.0          # |10-10| = 0
    assert got["b"] != got["b"] or got["b"] is None  # |20-15| = 5 > 3 -> null


def test_asof_preserves_left_row_count(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    left = spark.createDataFrame(
        [(int(rng.integers(5)), int(t)) for t in rng.integers(0, 1000, 300)],
        "user_id long, ts long",
    )
    right = spark.createDataFrame(
        [(int(rng.integers(5)), int(t), float(t)) for t in rng.integers(0, 1000, 100)],
        "user_id long, ts long, v double",
    ).groupBy("user_id", "ts").agg(F.max("v").alias("v"))
    out = asof_join(left, right, on="ts", by="user_id", right_cols=["v"])
    assert out.count() == left.count()
    # every match is at-or-before and is the max such time
    pdf = out.toPandas()
    rp = right.toPandas()
    for row in pdf.itertuples():
        cands = rp[(rp.user_id == row.user_id) & (rp.ts <= row.ts)]
        if len(cands) == 0:
            assert row.ts_matched != row.ts_matched or row.ts_matched is None
        else:
            assert row.ts_matched == cands.ts.max()


def test_sessionize_gap_inclusive_at_boundary(spark):
    # session_window merges INCLUSIVELY at exactly the gap (next.start <=
    # prev.end): with gap=10s, +9s and +10s both merge, +11s does not
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:00:10"),   # exactly the gap -> merges
        (1, "2024-01-01 00:00:21"),   # 11s after previous -> new session
        (2, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.to_timestamp("ts").alias("ts")
    )
    s = sessionize(df, ts_col="ts", by="user_id", gap="10 seconds").toPandas()
    u1 = s[s.user_id == 1].sort_values("session_start")
    assert len(u1) == 2 and u1.n_events.tolist() == [2, 1]
    assert len(s[s.user_id == 2]) == 1


def test_asof_join_plan_single_shuffle(spark, streams=None):
    """Scale shape: union-merge as-of join = ONE hash exchange on the key
    (for the window sort), never a range/nested-loop join."""
    left = spark.range(100).select(
        F.col("id").alias("user_id"), (F.col("id") * 7 % 50).alias("ts")
    )
    right = spark.range(40).select(
        F.col("id").alias("user_id"), (F.col("id") * 3 % 50).alias("ts"),
        F.rand(1).alias("v"),
    )
    out = asof_join(left, right, on="ts", by="user_id", right_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 shuffle, got {n_exchanges}:\n{plan[:2000]}"


def test_asof_join_matches_pandas_merge_asof(spark):
    """Independent-implementation cross-check: pandas merge_asof computes
    the same backward at-or-before semantics."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    left_pd = pd.DataFrame({
        "user_id": rng.integers(0, 6, 400),
        "ts": rng.integers(0, 5000, 400),
    }).sort_values("ts").reset_index(drop=True)
    right_pd = (
        pd.DataFrame({
            "user_id": rng.integers(0, 6, 150),
            "ts": rng.integers(0, 5000, 150),
            "v": rng.normal(size=150),
        })
        .drop_duplicates(["user_id", "ts"])
        .sort_values("ts")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left_pd, right_pd, on="ts", by="user_id",
        direction="backward", suffixes=("", "_matched"),
    )

    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    got = (
        asof_join(left, right, on="ts", by="user_id", right_cols=["v"])
        .toPandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    want = want.sort_values(["user_id", "ts"]).reset_index(drop=True)
    assert len(got) == len(want)
    vg, vw = got.v_matched.to_numpy(), want.v.to_numpy()
    both_nan = np.isnan(vg) & np.isnan(vw)
    assert ((vg == vw) | both_nan).all()


def test_streaming_asof_matches_batch_asof(spark, streams):
    """streaming_asof_join (interval-containment form) must agree with
    asof_join(direction=backward) row-for-row on the same batch data."""
    from patternly_spark.operators.temporal import streaming_asof_join

    left, right = streams
    a = (
        asof_join(left, right, on="ts", by="user_id", right_cols=["v"])
        .orderBy("user_id", "ts")
        .toPandas()
    )
    b = (
        streaming_asof_join(left, right, on="ts", by="user_id", right_cols=["v"])
        .select(a.columns.tolist())
        .orderBy("user_id", "ts")
        .toPandas()
    )
    assert a.equals(b)


def test_streaming_asof_true_stream(spark, streams, tmp_path):
    """Same operator through an actual streaming query: parquet source ->
    availableNow -> memory sink, joined against the static snapshot."""
    from patternly_spark.operators.temporal import streaming_asof_join
    from patternly_spark.streaming.windows import run_stream_to_memory

    left, right = streams
    path = str(tmp_path / "left_stream")
    left.write.mode("overwrite").parquet(path)
    src = spark.readStream.schema(left.schema).parquet(path)

    got = (
        run_stream_to_memory(
            streaming_asof_join(src, right, on="ts", by="user_id", right_cols=["v"]),
            "asof_stream_test",
        )
        .orderBy("user_id", "ts")
        .toPandas()
    )
    want = (
        asof_join(left, right, on="ts", by="user_id", right_cols=["v"])
        .select(got.columns.tolist())
        .orderBy("user_id", "ts")
        .toPandas()
    )
    assert got.equals(want)


@pytest.fixture(scope="module")
def ts_streams(spark):
    from datetime import datetime

    t0 = datetime(2025, 6, 1, 12, 0, 0)

    def at(mins, secs=0):
        return t0.replace(minute=0, second=0) + __import__("datetime").timedelta(
            minutes=mins, seconds=secs
        )

    left = spark.createDataFrame(
        [
            (1, 10, at(10)),   # matches right at minute 8
            (2, 10, at(30)),   # right at 8 is 22 min back: outside 10-min tolerance
            (3, 10, at(45)),   # matches right at 41
            (4, 20, at(5)),    # no right rows for user 20 yet -> null
            (5, 20, at(50)),   # matches right at 49
            (6, 10, at(41)),   # exact-instant match (inclusive)
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, at(8), 1.0),
            (10, at(41), 2.0),
            (20, at(49), 3.0),
            (20, at(55), 4.0),  # after every left event for user 20
        ],
        "user_id long, ts timestamp, v double",
    )
    return left, right


def test_stream_stream_asof_batch_semantics(spark, ts_streams):
    from patternly_spark.operators.temporal import stream_stream_asof_join

    left, right = ts_streams
    out = {
        r["event_id"]: r
        for r in stream_stream_asof_join(
            left, right, on="ts", by="user_id", right_cols=["v"],
            tolerance="10 minutes",
        ).collect()
    }
    assert len(out) == 6
    assert out[1]["v_matched"] == 1.0
    assert out[2]["v_matched"] is None          # beyond lookback
    assert out[3]["v_matched"] == 2.0
    assert out[4]["v_matched"] is None          # cold start
    assert out[5]["v_matched"] == 3.0           # not the later 4.0
    assert out[6]["v_matched"] == 2.0           # inclusive at the instant
    assert out[6]["ts_matched"] == out[6]["ts"]


def test_stream_stream_asof_matches_tolerant_asof_join(spark, ts_streams):
    """On batch data the stream-stream form must agree with
    asof_join(tolerance=600s) row-for-row."""
    from patternly_spark.operators.temporal import stream_stream_asof_join

    left, right = ts_streams
    a = (
        asof_join(left, right, on="ts", by="user_id", right_cols=["v"], tolerance=600)
        .orderBy("event_id")
        .toPandas()
    )
    b = (
        stream_stream_asof_join(
            left, right, on="ts", by="user_id", right_cols=["v"], tolerance="10 minutes"
        )
        .select(a.columns.tolist())
        .orderBy("event_id")
        .toPandas()
    )
    assert a.equals(b)


def test_stream_stream_asof_true_stream(spark, ts_streams, tmp_path):
    """Both sides as real streaming sources; watermark-delayed append
    emission must reproduce the batch result exactly."""
    from patternly_spark.operators.temporal import stream_stream_asof_join
    from patternly_spark.streaming.windows import run_stream_to_memory

    left, right = ts_streams
    # append watermark-advancing sentinels far past every real event:
    # a row only FINALIZES once the global watermark passes its event
    # time plus the join's tolerance correction, so without later data
    # the stream tail stays in state (correct streaming semantics —
    # it would emit in the next incremental run)
    from datetime import datetime
    sentinel_t = datetime(2025, 6, 1, 14, 0, 0)
    left_s = left.unionByName(
        spark.createDataFrame([(999, 999, sentinel_t)], left.schema)
    )
    right_s = right.unionByName(
        spark.createDataFrame([(999, sentinel_t, 0.0)], right.schema)
    )
    lpath, rpath = str(tmp_path / "l"), str(tmp_path / "r")
    left_s.write.mode("overwrite").parquet(lpath)
    right_s.write.mode("overwrite").parquet(rpath)
    lsrc = spark.readStream.schema(left.schema).parquet(lpath)
    rsrc = spark.readStream.schema(right.schema).parquet(rpath)

    got = (
        run_stream_to_memory(
            stream_stream_asof_join(
                lsrc, rsrc, on="ts", by="user_id", right_cols=["v"],
                tolerance="10 minutes",
            ),
            "ss_asof_test",
        )
        .filter("event_id < 900")
        .orderBy("event_id")
        .toPandas()
    )
    want = (
        stream_stream_asof_join(
            left, right, on="ts", by="user_id", right_cols=["v"],
            tolerance="10 minutes",
        )
        .select(got.columns.tolist())
        .orderBy("event_id")
        .toPandas()
    )
    assert got.equals(want)


def test_ema_recurrence_and_partition_invariance(spark):
    """ema_1 = v_1; ema_t = a*v_t + (1-a)*ema_{t-1} in order; identical
    under repartitioning (the fold order is total)."""
    from patternly_spark.operators.temporal import ema

    rows = [("u", i, float(v)) for i, v in enumerate([4, 8, 0, 16])] + [("w", 0, 2.0)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = {(r["k"], r["t"]): r["ema"] for r in ema(df, "v", by="k", order_col="t", alpha=0.25).collect()}
    assert out[("u", 0)] == 4.0
    assert out[("u", 1)] == 0.25 * 8 + 0.75 * 4.0
    assert out[("u", 2)] == 0.75 * out[("u", 1)]
    assert out[("u", 3)] == 0.25 * 16 + 0.75 * out[("u", 2)]
    assert out[("w", 0)] == 2.0

    again = {
        (r["k"], r["t"]): r["ema"]
        for r in ema(df.repartition(5), "v", by="k", order_col="t", alpha=0.25).collect()
    }
    assert again == out


def test_discords_find_planted_anomaly_and_skip_short_keys(spark):
    """The planted flat-spike segment in a sine stream is the rank-1
    discord (within a window of the plant); keys shorter than 2*window
    emit nothing; deterministic under repartitioning."""
    import numpy as np

    from patternly_spark.operators.temporal import discords

    t = np.arange(300)
    x = np.sin(t / 5.0)
    x[100:116] = 3.0
    rows = [("s", int(i), float(v)) for i, v in enumerate(x)]
    rows += [("short", i, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, t long, v double")

    out = discords(df, "v", by="k", order_col="t", window=16, top_k=3).collect()
    assert all(r["k"] == "s" for r in out)          # short key emits nothing
    best = [r for r in out if r["rank"] == 1][0]
    assert 85 <= best["pos"] <= 115

    again = discords(
        df.repartition(7), "v", by="k", order_col="t", window=16, top_k=3
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_holt_smoothing_matches_python_replay(spark):
    """Coupled level/trend recurrences fold-exact (== on doubles with
    dyadic coefficients), per key, with forecast = level + trend."""
    from patternly_spark.operators.temporal import holt_smoothing

    series = {1: [10.0, 12.0, 14.0, 16.0, 18.0, 25.0, 11.0], 2: [5.0, 5.0], 3: [7.0]}
    rows = [(k, t, v) for k, vs in series.items() for t, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    out = holt_smoothing(df, "v", by="k", order_col="t", alpha=0.5, beta=0.25)
    got = {
        (r.k, r.t): (r.level, r.trend, r.forecast_next)
        for r in out.collect()
    }

    def replay(vs, a=0.5, b=0.25):
        res = []
        l, tr = vs[0], 0.0
        res.append((l, tr))
        for v in vs[1:]:
            nl = a * v + (1 - a) * (l + tr)
            ntr = b * (nl - l) + (1 - b) * tr
            l, tr = nl, ntr
            res.append((l, tr))
        return res

    for k, vs in series.items():
        for t, (l, tr) in enumerate(replay(vs)):
            assert got[(k, t)] == (l, tr, l + tr), (k, t)


def test_holt_smoothing_tracks_linear_trend(spark):
    """On an exact linear series the forecast converges to the next
    point (level->line, trend->slope)."""
    from patternly_spark.operators.temporal import holt_smoothing

    rows = [(1, t, float(3 * t + 2)) for t in range(40)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    last = (
        holt_smoothing(df, "v", by="k", order_col="t", alpha=0.5, beta=0.5)
        .orderBy("t")
        .collect()[-1]
    )
    assert abs(last.trend - 3.0) < 1e-3
    assert abs(last.forecast_next - (3 * 40 + 2)) < 1e-2


def test_holt_smoothing_validations(spark):
    import pytest as _pytest

    from patternly_spark.operators.temporal import holt_smoothing

    df = spark.createDataFrame([(1, 0, 1.0)], "k long, t long, v double")
    with _pytest.raises(ValueError):
        holt_smoothing(df, "v", by="k", order_col="t", alpha=0.0)
    with _pytest.raises(ValueError):
        holt_smoothing(df, "v", by="k", order_col="t", beta=1.5)


def test_acf_matches_numpy_closed_form(spark):
    """Integer-closed-form ACF == numpy at every lag; constant series
    yield NULL; n_pairs accounting correct at series edges."""
    import numpy as np

    from patternly_spark.operators.temporal import acf

    rng = np.random.default_rng(3)
    vals = [float(v) for v in np.round(rng.normal(10, 2, 50), 2)]
    rows = [(1, t, v) for t, v in enumerate(vals)] + [(2, t, 5.0) for t in range(10)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    res = {
        (r.k, r.lag): (r.n_pairs, r.acf)
        for r in acf(df, "v", by="k", order_col="t", max_lag=3).collect()
    }
    cents = [int(round(v * 100)) for v in vals]
    for lag in [1, 2, 3]:
        x = np.array(cents[:-lag], dtype=np.int64)
        y = np.array(cents[lag:], dtype=np.int64)
        n = len(x)
        num = float(n * (x * y).sum() - x.sum() * y.sum())
        dx = float(n * (x * x).sum() - x.sum() ** 2)
        dy = float(n * (y * y).sum() - y.sum() ** 2)
        assert res[(1, lag)] == (n, num / (np.sqrt(dx) * np.sqrt(dy)))
    assert all(res[(2, lag)][1] is None for lag in [1, 2, 3])


def test_acf_detects_planted_period(spark):
    from patternly_spark.operators.temporal import acf

    rows = [(1, t, float(10 + (5 if t % 4 == 0 else 0))) for t in range(80)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    res = {r.lag: r.acf for r in acf(df, "v", by="k", order_col="t", max_lag=4).collect()}
    assert res[4] > 0.9          # the planted period
    assert res[1] < res[4] and res[2] < res[4]


def test_acf_validations(spark):
    import pytest as _pytest

    from patternly_spark.operators.temporal import acf

    df = spark.createDataFrame([(1, 0, 1.0)], "k long, t long, v double")
    with _pytest.raises(ValueError):
        acf(df, "v", by="k", order_col="t", max_lag=0)


def test_cross_correlation_finds_planted_shift(spark):
    """Series B = A delayed by 2 positions: the peak must sit at lag +2
    with correlation exactly 1.0; values match the closed form."""
    import numpy as np

    from patternly_spark.operators.temporal import cross_correlation

    rng = np.random.default_rng(4)
    base = [float(v) for v in np.round(rng.normal(10, 2, 40), 2)]
    rows = [(1, "A", t, v) for t, v in enumerate(base)]
    rows += [
        (1, "B", t, base[t - 2] if t >= 2 else 10.0) for t in range(len(base))
    ]
    df = spark.createDataFrame(rows, "k long, s string, t long, v double")
    res = {
        r.lag: (r.n_pairs, r.xcorr)
        for r in cross_correlation(
            df, "v", "s", "A", "B", by="k", order_col="t", max_lag=3
        ).collect()
    }
    assert set(res) == set(range(-3, 4))
    # the closed form's final sqrt/divide can land an ulp past 1.0
    assert abs(res[2][1] - 1.0) < 1e-12
    assert all(res[l][1] < 0.5 for l in res if l != 2)
    # pair accounting: lag l pairs a_i with b_{i+l}, overlap shrinks by |l|
    for l in res:
        assert res[l][0] == 40 - abs(l)


def test_cross_correlation_validations(spark):
    import pytest as _pytest

    from patternly_spark.operators.temporal import cross_correlation

    df = spark.createDataFrame([(1, "A", 0, 1.0)], "k long, s string, t long, v double")
    with _pytest.raises(ValueError):
        cross_correlation(df, "v", "s", "A", "B", by="k", order_col="t", max_lag=0)


def test_scd2_intervals_collapse_and_intervals(spark):
    """No-op changes open no version; intervals tile [first_ts, open);
    NULL attributes compare null-safely (NULL->NULL is a no-op,
    NULL->value is a change); first row always opens a version."""
    from patternly_spark.operators.temporal import scd2_intervals

    rows = [
        # user 1: A A B B A  -> versions A@1, B@3, A@5
        (1, 1, 10, "A"), (1, 2, 11, "A"), (1, 3, 12, "B"),
        (1, 4, 13, "B"), (1, 5, 14, "A"),
        # user 2: NULL NULL X NULL -> versions NULL@1, X@3, NULL@4
        (2, 1, 20, None), (2, 2, 21, None), (2, 3, 22, "X"),
        (2, 4, 23, None),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, event_type string")
    got = sorted(
        (r.user_id, r.valid_from, r.valid_to, r.is_current, r.event_type)
        for r in scd2_intervals(
            df, key_col="user_id", ts_col="ts",
            attr_cols=["event_type"], order_tiebreak=["event_id"],
        ).collect()
    )
    assert got == [
        (1, 1, 3, False, "A"),
        (1, 3, 5, False, "B"),
        (1, 5, None, True, "A"),
        (2, 1, 3, False, None),
        (2, 3, 4, False, "X"),
        (2, 4, None, True, None),
    ]


def test_scd2_multi_attr_change_on_any(spark):
    """A change in ANY attribute column opens a new version."""
    from patternly_spark.operators.temporal import scd2_intervals

    rows = [(1, 1, "A", "x"), (1, 2, "A", "y"), (1, 3, "A", "y")]
    df = spark.createDataFrame(rows, "k long, ts long, a string, b string")
    got = sorted(
        (r.valid_from, r.valid_to, r.a, r.b)
        for r in scd2_intervals(
            df, key_col="k", ts_col="ts", attr_cols=["a", "b"]
        ).collect()
    )
    assert got == [(1, 2, "A", "x"), (2, None, "A", "y")]


def test_kaplan_meier_textbook(spark):
    from patternly_spark.operators.temporal import kaplan_meier

    # classic toy: events at t=1 (1 of 5), t=3 (1 of 3); censored at 2, 4, 5
    rows = [(1, True), (2, False), (3, True), (4, False), (5, False)]
    df = spark.createDataFrame(rows, "dur long, event boolean")
    out = {r["t"]: r for r in kaplan_meier(
        df, duration_col="dur", event_col="event"
    ).collect()}
    assert out[1]["n_at_risk"] == 5 and out[1]["d_events"] == 1
    assert out[1]["survival"] == 1.0 - 1.0 / 5.0
    # censoring at 2 leaves survival unchanged
    assert out[2]["d_events"] == 0 and out[2]["survival"] == out[1]["survival"]
    # at t=3: 3 at risk, 1 event -> 0.8 * (1 - 1/3)
    assert out[3]["n_at_risk"] == 3
    assert out[3]["survival"] == (1.0 - 1.0 / 5.0) * (1.0 - 1.0 / 3.0)
    assert out[5]["survival"] == out[3]["survival"]


def test_kaplan_meier_grouped_and_partition_invariant(spark):
    from patternly_spark.operators.temporal import kaplan_meier

    rows = [("a", (i % 7) + 1, i % 2 == 0) for i in range(60)] + [
        ("b", (i % 5) + 1, i % 3 == 0) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "g string, dur long, event boolean")
    one = kaplan_meier(
        df.coalesce(1), duration_col="dur", event_col="event", group_cols=["g"]
    ).orderBy("g", "t").collect()
    many = kaplan_meier(
        df.repartition(32), duration_col="dur", event_col="event", group_cols=["g"]
    ).orderBy("g", "t").collect()
    assert [tuple(r) for r in one] == [tuple(r) for r in many]
    # survival is non-increasing within each group
    for g in ("a", "b"):
        ss = [r["survival"] for r in one if r["g"] == g]
        assert all(x >= y for x, y in zip(ss, ss[1:]))


def test_logrank_hand_computed(spark):
    import math

    from patternly_spark.operators.temporal import logrank_test

    u = 1 << 20
    rows = [("A", t, True) for t in (1, 2, 3)] + [("B", t, True) for t in (4, 5, 6)]
    df = spark.createDataFrame(rows, "g string, dur long, event boolean")
    out = {r["g"]: r for r in logrank_test(
        df, duration_col="dur", event_col="event", group_col="g", units=u
    ).collect()}
    # replicate the quantized arithmetic exactly
    ea = sum(math.floor(1 * n_a / n * u) for n_a, n in ((3, 6), (2, 5), (1, 4)))
    eb = sum(
        math.floor(1 * n_b / n * u)
        for n_b, n in ((3, 6), (3, 5), (3, 4), (3, 3), (2, 2), (1, 1))
    )
    assert out["A"]["observed"] == 3 and out["B"]["observed"] == 3
    assert out["A"]["expected"] == ea / u
    assert out["B"]["expected"] == eb / u
    chi = (
        math.floor((3 - ea / u) ** 2 / (ea / u) * u)
        + math.floor((3 - eb / u) ** 2 / (eb / u) * u)
    )
    assert out["A"]["chi2"] == chi / u == out["B"]["chi2"]
    assert out["A"]["n_subjects"] == 3


def test_logrank_identical_groups_and_partition_invariance(spark):
    from patternly_spark.operators.temporal import logrank_test

    # two identical cohorts: observed == expected exactly at every time
    rows = [(g, (i % 9) + 1, i % 2 == 0) for g in ("x", "y") for i in range(50)]
    df = spark.createDataFrame(rows, "g string, dur long, event boolean")
    one = logrank_test(
        df.coalesce(1), duration_col="dur", event_col="event", group_col="g"
    ).orderBy("g").collect()
    many = logrank_test(
        df.repartition(32), duration_col="dur", event_col="event", group_col="g"
    ).orderBy("g").collect()
    assert [tuple(r) for r in one] == [tuple(r) for r in many]
    for r in one:
        assert abs(r["expected"] - r["observed"]) < 1e-4
        assert r["chi2"] < 1e-6


def _hw_reference(vals, m, a, b, g):
    l = sum(vals[:m]) / float(m)
    bt = 0.0
    seas = [v - l for v in vals[:m]]
    out = []
    for v in vals[m:]:
        sprev = seas[0]
        lnew = a * (v - sprev) + (1.0 - a) * (l + bt)
        bnew = b * (lnew - l) + (1.0 - b) * bt
        snew = g * (v - lnew) + (1.0 - g) * sprev
        seas = seas[1:] + [snew]
        l, bt = lnew, bnew
        out.append((v, l, bt, snew, l + bt + seas[0]))
    return out


def test_holt_winters_matches_python_reference(spark):
    from patternly_spark.operators.temporal import holt_winters

    vals = [10.0, 20.0, 15.0, 11.0, 22.0, 16.0, 13.0, 25.0, 18.0, 12.0]
    rows = [("k", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    got = (
        holt_winters(df, "v", by="k", order_col="t", period=3)
        .orderBy("t")
        .collect()
    )
    want = _hw_reference(vals, 3, 0.5, 0.25, 0.25)
    assert len(got) == len(want) == 7
    for r, (v, l, b, s, f) in zip(got, want):
        assert (r["value"], r["level"], r["trend"], r["season"],
                r["forecast_next"]) == (v, l, b, s, f)


def test_holt_winters_short_keys_dropped_and_partition_invariant(spark):
    from patternly_spark.operators.temporal import holt_winters

    rows = [("long", i, float((i % 7) * 3 + i)) for i in range(40)] + [
        ("short", i, float(i)) for i in range(7)
    ]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    one = holt_winters(
        df.coalesce(1), "v", by="k", order_col="t", period=7
    ).orderBy("k", "t").collect()
    many = holt_winters(
        df.repartition(32), "v", by="k", order_col="t", period=7
    ).orderBy("k", "t").collect()
    assert [tuple(r) for r in one] == [tuple(r) for r in many]
    # "short" has exactly period rows -> no output; "long" emits 40-7
    assert {r["k"] for r in one} == {"long"}
    assert len(one) == 33
    # seasonal component tracks the planted period-7 cycle: high at i%7==6
    import statistics
    by_phase = {}
    for r in one:
        by_phase.setdefault(r["t"] % 7, []).append(r["season"])
    mean_by_phase = {p: statistics.mean(v) for p, v in by_phase.items()}
    assert max(mean_by_phase, key=mean_by_phase.get) == 6


def test_streaming_survival_registry_equals_batch(spark, tmp_path):
    from patternly_spark.operators.temporal import (
        kaplan_meier,
        kaplan_meier_from_grid,
    )
    from patternly_spark.streaming.drift import streaming_survival_registry

    schema = "g string, dur long, event boolean"
    b0 = [("a", (i % 9) + 1, i % 2 == 0) for i in range(40)]
    b1 = [("a", (i % 6) + 2, i % 3 == 0) for i in range(30)] + [
        ("b", (i % 4) + 1, i % 2 == 1) for i in range(20)
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(b0, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)

    reg = str(tmp_path / "registry")
    q = streaming_survival_registry(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        reg,
        checkpoint_path=str(tmp_path / "ckpt"),
        duration_col="dur",
        event_col="event",
        group_cols=["g"],
        trigger_once=True,
    )
    q.awaitTermination(120)

    from patternly_spark.streaming.exactly_once import read_registry

    got = kaplan_meier_from_grid(
        read_registry(spark, reg), group_cols=["g"]
    ).orderBy("g", "t").collect()
    want = kaplan_meier(
        spark.createDataFrame(b0 + b1, schema),
        duration_col="dur",
        event_col="event",
        group_cols=["g"],
    ).orderBy("g", "t").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
