"""Kleinberg 2-state burst detection (operators/temporal)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from patternly_spark.operators.temporal import (
    kleinberg_burst_states,
    kleinberg_bursts,
)


def _series(spark, times, key="u"):
    rows = [(key, int(t), i) for i, t in enumerate(times)]
    return spark.createDataFrame(rows, "k string, t long, id long")


def test_burst_detected_in_dense_cluster(spark):
    # 10 gaps of 100us, then 10 gaps of 5us (the burst), then 10 of 100us
    times, t = [0], 0
    for gap in [100] * 10 + [5] * 10 + [100] * 10:
        t += gap
        times.append(t)
    out = kleinberg_bursts(
        _series(spark, times), key_col="k", ts_col="t", id_col="id"
    ).collect()
    assert len(out) == 1
    b = out[0]
    # the burst spans exactly the dense cluster: events 10..20
    assert b["burst_start_us"] == times[10]
    assert b["burst_end_us"] == times[20]
    assert b["n_gaps"] == 10


def test_uniform_series_has_no_burst(spark):
    times = [i * 50 for i in range(40)]
    assert (
        kleinberg_bursts(
            _series(spark, times), key_col="k", ts_col="t", id_col="id"
        ).count()
        == 0
    )


def test_single_short_gap_suppressed_by_transition_cost(spark):
    # one mildly short gap in a long uniform run: entering the burst
    # state costs gamma*ln(n), which a single 2x-rate gap cannot repay
    times, t = [0], 0
    for i, gap in enumerate([100] * 30):
        t += gap if i != 15 else 50
        times.append(t)
    assert (
        kleinberg_bursts(
            _series(spark, times), key_col="k", ts_col="t", id_col="id"
        ).count()
        == 0
    )


def test_states_match_reference_viterbi(spark):
    # from-scratch float64 Viterbi (independent implementation shape)
    # over a pseudo-random gap series: state sequences must be identical
    import math

    rng = np.random.default_rng(11)
    gaps = np.where(
        (np.arange(60) >= 20) & (np.arange(60) < 33),
        rng.integers(1, 8, 60),
        rng.integers(50, 200, 60),
    )
    times = np.concatenate([[0], np.cumsum(gaps)]).tolist()

    def _qln(v):
        return math.floor(math.log(v) * 1048576.0) / 1048576.0

    t = np.asarray(times, dtype=np.int64)
    n = len(t) - 1
    lam0 = float(n) / float(t[-1] - t[0])
    lam1 = 2.0 * lam0
    ln0, ln1, up = _qln(lam0), _qln(lam1), 1.0 * _qln(float(n))
    x = (t[1:] - t[:-1]).astype(float)
    c = np.full(2, np.inf)
    c[0] = lam0 * x[0] - ln0
    c[1] = up + (lam1 * x[0] - ln1)
    ptr = np.zeros((n, 2), dtype=int)
    for i in range(1, n):
        ptr[i, 0] = 0 if c[0] <= c[1] else 1
        ptr[i, 1] = 1 if c[1] <= c[0] + up else 0
        c = np.array(
            [
                c[ptr[i, 0]] + (lam0 * x[i] - ln0),
                (c[1] if ptr[i, 1] else c[0] + up) + (lam1 * x[i] - ln1),
            ]
        )
    want = np.zeros(n, dtype=int)
    want[-1] = 0 if c[0] <= c[1] else 1
    for i in range(n - 1, 0, -1):
        want[i - 1] = ptr[i, want[i]]

    got = (
        kleinberg_burst_states(
            _series(spark, times), key_col="k", ts_col="t", id_col="id"
        )
        .orderBy("gap_idx")
        .collect()
    )
    assert [r["state"] for r in got] == want.tolist()
    assert [r["gap_idx"] for r in got] == list(range(1, n + 1))


def test_partition_invariance_and_guards(spark):
    times = [0, 10, 12, 13, 300, 600]
    df1 = _series(spark, times).coalesce(1)
    df2 = _series(spark, times).repartition(16)
    a = sorted(map(tuple, kleinberg_burst_states(df1, key_col="k", ts_col="t", id_col="id").collect()))
    b = sorted(map(tuple, kleinberg_burst_states(df2, key_col="k", ts_col="t", id_col="id").collect()))
    assert a == b and a
    # guards: s <= 1 rejected; short keys and zero-span keys dropped
    with pytest.raises(ValueError, match="s must be"):
        kleinberg_bursts(df1, key_col="k", ts_col="t", s=1.0)
    short = _series(spark, [0, 5])
    assert kleinberg_burst_states(short, key_col="k", ts_col="t").count() == 0
    flat = _series(spark, [7, 7, 7, 7])
    assert kleinberg_burst_states(flat, key_col="k", ts_col="t").count() == 0


def test_timestamp_column_and_multi_key(spark):
    # timestamp input converts via unix_micros; keys decode independently
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(12):
        rows.append(("a", base + dt.timedelta(seconds=i * 100), i))
    t = 0
    for i, gap in enumerate([100] * 8 + [2] * 8 + [100] * 8):
        t += gap
        rows.append(("b", base + dt.timedelta(seconds=t), 100 + i))
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long")
    out = kleinberg_bursts(df, key_col="k", ts_col="ts", id_col="id").collect()
    assert {r["k"] for r in out} == {"b"}


def test_oracle_parity_q249(spark):
    # the global oracle-parity harness covers q249 with every other
    # entry; this pins the recursive-CTE oracle directly at sf0.01
    import duckdb

    import __spark_entry__ as e

    con = duckdb.connect()
    for t in e.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'"
        )
    got = sorted(
        map(tuple, e.queries()["q249_kleinberg_bursts"](spark, "/root/testdata/sf0.01").collect())
    )
    want = sorted(map(tuple, con.execute(e.oracle_sql()["q249_kleinberg_bursts"]).fetchall()))
    con.close()
    assert got == want and got
