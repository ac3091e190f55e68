"""Range join (bucketed interval join) and hypertable rollup cascade.

The law tests compare the bucketed equi-join / cascaded rollup against
the naive (predicate-join / direct-aggregation) formulation — they must
be row-identical, including at bucket boundaries and for negative axis
values.  The plan test pins the at-scale shape: a hash-joinable
equi-join, never a BroadcastNestedLoopJoin / cartesian.
"""

import pytest
from pyspark.sql import functions as F

from patternly_spark.operators.ranges import range_join
from patternly_spark.operators.rollup import hypertable_rollup


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def points_and_intervals(spark):
    # points straddle bucket boundaries (width 10): -21, -10, -1, 0, 9, 10, 35
    pts = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(
            [("a", -21), ("a", -10), ("a", -1), ("a", 0), ("a", 9),
             ("b", 10), ("b", 35), ("b", 100)]
        )],
        "pid long, key string, t long",
    )
    # intervals include boundary-exact ends, negatives, multi-bucket spans
    ivs = spark.createDataFrame(
        [
            (0, "a", -25, -10),   # negative, ends exactly on a point
            (1, "a", -1, 9),      # crosses 0
            (2, "a", 0, 0),       # degenerate single instant
            (3, "b", 5, 40),      # spans 4+ buckets
            (4, "b", 36, 99),     # ends just before a point
            (5, "c", 0, 1000),    # key with no points
        ],
        "iid long, key string, s long, e long",
    )
    return pts, ivs


def test_point_in_interval_matches_naive_join(spark, points_and_intervals):
    pts, ivs = points_and_intervals
    got = range_join(
        pts, ivs, left_point="t", right_start="s", right_end="e",
        by="key", bucket_width=10,
    )
    naive = pts.join(ivs, "key").filter((F.col("s") <= F.col("t")) & (F.col("t") <= F.col("e")))
    assert _rows(got, ["pid", "iid"]) == _rows(naive, ["pid", "iid"])
    assert len(_rows(got, ["pid", "iid"])) > 0


def test_interval_overlap_matches_naive_and_emits_once(spark, points_and_intervals):
    _, ivs = points_and_intervals
    left = ivs.select(
        F.col("iid").alias("lid"), "key",
        F.col("s").alias("ls"), F.col("e").alias("le"),
    )
    got = range_join(
        left, ivs, left_start="ls", left_end="le", right_start="s", right_end="e",
        by="key", bucket_width=10,
    )
    naive = left.join(ivs, "key").filter((F.col("ls") <= F.col("e")) & (F.col("s") <= F.col("le")))
    got_rows = [tuple(r) for r in got.select("lid", "iid").collect()]
    # exactly-once: no pair may appear twice despite multi-bucket co-occurrence
    assert len(got_rows) == len(set(got_rows))
    assert sorted(got_rows) == _rows(naive, ["lid", "iid"])


def test_range_join_without_keys(spark, points_and_intervals):
    pts, ivs = points_and_intervals
    got = range_join(
        pts, ivs, left_point="t", right_start="s", right_end="e", bucket_width=10,
    )
    naive = pts.crossJoin(ivs.drop("key")).filter(
        (F.col("s") <= F.col("t")) & (F.col("t") <= F.col("e"))
    )
    assert _rows(got, ["pid", "iid"]) == _rows(naive, ["pid", "iid"])


def test_range_join_plan_is_equi_join(spark, points_and_intervals):
    pts, ivs = points_and_intervals
    got = range_join(
        pts, ivs, left_point="t", right_start="s", right_end="e",
        by="key", bucket_width=10,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_range_join_arg_validation(spark, points_and_intervals):
    pts, ivs = points_and_intervals
    with pytest.raises(ValueError, match="either left_point"):
        range_join(pts, ivs, left_point="t", left_start="t",
                   right_start="s", right_end="e", bucket_width=10)
    with pytest.raises(ValueError, match="both left_start"):
        range_join(pts, ivs, left_start="t", left_end=None,
                   right_start="s", right_end="e", bucket_width=10)
    with pytest.raises(ValueError, match="positive"):
        range_join(pts, ivs, left_point="t", right_start="s", right_end="e",
                   bucket_width=0)


@pytest.fixture(scope="module")
def ticks(spark):
    # axis values cross zero so floor-division (not truncation) is exercised
    rows = [(t, "x" if t % 3 else "y", float(t) * 0.5) for t in range(-100, 100, 7)]
    return spark.createDataFrame(rows, "t long, k string, v double")


def test_rollup_cascade_matches_direct_aggregation(spark, ticks):
    widths = [10, 50, 100]
    got = hypertable_rollup(ticks, axis="t", value="v", by="k", widths=widths)
    for w in widths:
        direct = (
            ticks.groupBy(
                "k", ((F.col("t") - F.pmod("t", F.lit(w))) ).alias("window_start")
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.col("v").cast("decimal(24,10)")).cast("double").alias("total"),
                F.min("v").alias("vmin"),
                F.max("v").alias("vmax"),
            )
        )
        g = got.filter(F.col("level") == w)
        cols = ["k", "window_start", "n", "total", "vmin", "vmax"]
        assert _rows(g, cols) == _rows(direct, cols), f"level {w}"
        # avg derived from the same decimal sum
        for r in g.collect():
            assert r["avg"] == r["total"] / r["n"]


def test_rollup_without_keys(spark, ticks):
    got = hypertable_rollup(ticks, axis="t", value="v", widths=[10, 20])
    n_total = ticks.count()
    for w in (10, 20):
        assert (
            got.filter(F.col("level") == w).agg(F.sum("n")).collect()[0][0] == n_total
        )


def test_rollup_width_validation(spark, ticks):
    with pytest.raises(ValueError, match="non-empty"):
        hypertable_rollup(ticks, axis="t", value="v", widths=[])
    with pytest.raises(ValueError, match="ascending"):
        hypertable_rollup(ticks, axis="t", value="v", widths=[100, 10])
    with pytest.raises(ValueError, match="divide"):
        hypertable_rollup(ticks, axis="t", value="v", widths=[10, 25])


def test_rollup_strategies_identical(spark, ticks):
    kw = dict(axis="t", value="v", by="k", widths=[10, 50, 100])
    a = hypertable_rollup(ticks, strategy="explode", **kw)
    b = hypertable_rollup(ticks, strategy="cascade", **kw)
    cols = ["level", "window_start", "k", "n", "total", "vmin", "vmax", "avg"]
    assert _rows(a, cols) == _rows(b, cols)
    with pytest.raises(ValueError, match="explode|cascade"):
        hypertable_rollup(ticks, strategy="nope", **kw)


def test_rollup_explode_is_single_scan_single_shuffle(spark, ticks):
    out = hypertable_rollup(ticks, axis="t", value="v", widths=[10, 100])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_gapfill_locf_and_linear(spark):
    from patternly_spark.operators.rollup import gapfill

    # group g: buckets 0, 30, 40 present (width 10) -> gaps at 10, 20
    rows = [("g", 3, 1.0), ("g", 34, 4.0), ("g", 45, 10.0), ("h", 7, 2.0)]
    df = spark.createDataFrame(rows, "k string, t long, v double")

    out = {
        (r["k"], r["window_start"]): r
        for r in gapfill(df, axis="t", value="v", width=10, by="k", agg="max", method="linear").collect()
    }
    assert set(out) == {("g", 0), ("g", 10), ("g", 20), ("g", 30), ("g", 40), ("h", 0)}
    assert out[("g", 0)]["val"] == 1.0 and out[("g", 0)]["n"] == 1
    assert out[("g", 10)]["val"] is None and out[("g", 10)]["n"] == 0
    # linear between (0, 1.0) and (30, 4.0): 10 -> 2.0, 20 -> 3.0
    assert out[("g", 10)]["val_filled"] == 2.0
    assert out[("g", 20)]["val_filled"] == 3.0
    assert out[("g", 40)]["val_filled"] == 10.0
    assert out[("h", 0)]["val_filled"] == 2.0

    locf = {
        (r["k"], r["window_start"]): r["val_filled"]
        for r in gapfill(df, axis="t", value="v", width=10, by="k", agg="max", method="locf").collect()
    }
    assert locf[("g", 10)] == 1.0 and locf[("g", 20)] == 1.0 and locf[("g", 30)] == 4.0

    none = {
        (r["k"], r["window_start"]): r["val_filled"]
        for r in gapfill(df, axis="t", value="v", width=10, by="k", agg="max", method="none").collect()
    }
    assert none[("g", 10)] is None and none[("g", 0)] == 1.0


def test_gapfill_no_gaps_is_identity_shape(spark):
    from patternly_spark.operators.rollup import gapfill

    df = spark.createDataFrame(
        [("g", 1, 5.0), ("g", 11, 6.0), ("g", 21, 7.0)], "k string, t long, v double"
    )
    rows = gapfill(df, axis="t", value="v", width=10, by="k", agg="count", method="linear").collect()
    assert len(rows) == 3
    assert all(r["n"] == 1 and r["val"] == 1 and r["val_filled"] == 1 for r in rows)


def test_gapfill_single_shuffle_no_join(spark):
    from patternly_spark.operators.rollup import gapfill

    df = spark.createDataFrame([("g", 1, 5.0)], "k string, t long, v double")
    plan = gapfill(df, axis="t", value="v", width=10, by="k")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_rollup_distinct_counts_entities_once_per_bucket(spark):
    from patternly_spark.operators.rollup import rollup_distinct

    rows = [  # (t, user): user 1 appears twice in bucket 0 -> counts once
        (1, 1), (5, 1), (12, 2), (15, 1), (25, 3),
    ]
    df = spark.createDataFrame(rows, "t long, u long")
    out = {
        (r["level"], r["window_start"]): r["n_entities"]
        for r in rollup_distinct(df, axis="t", entity="u", widths=[10, 20]).collect()
    }
    assert out[(10, 0)] == 1 and out[(10, 10)] == 2 and out[(10, 20)] == 1
    assert out[(20, 0)] == 2 and out[(20, 20)] == 1

    approx = {
        (r["level"], r["window_start"]): r["n_entities"]
        for r in rollup_distinct(df, axis="t", entity="u", widths=[10, 20], exact=False).collect()
    }
    assert set(approx) == set(out)
    for k in out:  # tiny cardinalities: HLL++ is exact here
        assert approx[k] == out[k]
