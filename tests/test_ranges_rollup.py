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
