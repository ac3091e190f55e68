"""Sketch-profile operator: approx sketches vs exact ground truth."""

import pytest
from pyspark.sql import functions as F

from patternly_spark.streaming.exactly_once import read_registry

from patternly_spark.operators.sketches import sketch_profile


@pytest.fixture(scope="module")
def data(spark):
    # 3 groups with known-distinct users and a known value distribution
    rows = []
    for g, (n_users, n_rows) in enumerate([(50, 2000), (200, 3000), (7, 500)]):
        for i in range(n_rows):
            rows.append((f"g{g}", i % n_users, float(i % 1000)))
    return spark.createDataFrame(rows, "grp string, user long, value double")


def test_exact_profile(spark, data):
    out = {
        r["grp"]: r
        for r in sketch_profile(
            data, by="grp", distinct_cols=["user"], quantile_cols=["value"],
            quantile_probs=[0.5, 0.9], exact=True,
        ).collect()
    }
    assert out["g0"]["n"] == 2000 and out["g0"]["nd_user"] == 50
    assert out["g1"]["nd_user"] == 200
    assert out["g2"]["nd_user"] == 7
    # g2 values are 0..499 uniform: exact interpolated median = 249.5
    assert out["g2"]["q50_value"] == 249.5


def test_approx_within_tolerance_of_exact(spark, data):
    kw = dict(by="grp", distinct_cols=["user"], quantile_cols=["value"],
              quantile_probs=[0.5, 0.9, 0.99])
    exact = {r["grp"]: r for r in sketch_profile(data, exact=True, **kw).collect()}
    approx = {r["grp"]: r for r in sketch_profile(data, exact=False, **kw).collect()}
    for g in exact:
        # HLL++ at rsd=0.02: allow 3 sigma
        assert abs(approx[g]["nd_user"] - exact[g]["nd_user"]) <= max(
            3, 0.06 * exact[g]["nd_user"]
        ), g
        # approx_percentile at accuracy 10k: rank error <= n/10k -> value
        # error bounded by a few adjacent values (values are 0..999 ints)
        for c in ("q50_value", "q90_value", "q99_value"):
            assert abs(approx[g][c] - exact[g][c]) <= 2.0, (g, c)
        assert approx[g]["n"] == exact[g]["n"]


def test_global_profile_without_keys(spark, data):
    row = sketch_profile(data, distinct_cols=["user"], exact=True).collect()[0]
    assert row["n"] == 5500
    assert row["nd_user"] == 200  # user ids overlap across groups


def test_single_aggregation_pass(spark, data):
    out = sketch_profile(
        data, by="grp", distinct_cols=["user"], quantile_cols=["value"], exact=False
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one hash-partitioning exchange for the groupBy; sketches merge in it
    assert plan.count("Exchange hashpartitioning") == 1


def test_top_items_per_group_exact(spark):
    from patternly_spark.operators.sketches import top_items_per_group

    rows = [("g1", "a")] * 5 + [("g1", "b")] * 3 + [("g1", "c")] * 1 + [("g2", "x")] * 2
    df = spark.createDataFrame(rows, "g string, item string")
    out = top_items_per_group(df, "g", "item", k=2).collect()
    got = {(r["g"], r["item"]): (r["cnt"], r["rank"]) for r in out}
    assert got == {("g1", "a"): (5, 1), ("g1", "b"): (3, 2), ("g2", "x"): (2, 1)}


def _skewed(spark, n_groups=3, heavy=200, tail=400, seed=5):
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    for g in range(n_groups):
        for h in range(4):  # 4 heavy items per group
            rows += [(f"g{g}", f"heavy{h}")] * (heavy - 10 * h)
        for t in range(tail):  # long tail of singletons
            rows.append((f"g{g}", f"tail{rng.integers(10_000)}"))
    rng.shuffle(rows)
    return spark.createDataFrame(rows, "g string, item string").repartition(8)


def test_frequent_items_bounds_contain_truth(spark):
    from patternly_spark.operators.sketches import frequent_items

    df = _skewed(spark)
    truth = {
        (r["g"], r["item"]): r["cnt"]
        for r in df.groupBy("g", "item").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    got = frequent_items(df, "g", "item", capacity=32).collect()
    assert got, "sketch returned nothing"
    for r in got:
        true = truth[(r["g"], r["item"])]
        assert r["count_lo"] <= true <= r["count_hi"], (r, true)


def test_frequent_items_superset_of_exact_topk(spark):
    from patternly_spark.operators.sketches import frequent_items, top_items_per_group

    df = _skewed(spark)
    exact = top_items_per_group(df, "g", "item", k=4).collect()
    kept = {
        (r["g"], r["item"])
        for r in frequent_items(df, "g", "item", capacity=32).collect()
    }
    for r in exact:
        assert (r["g"], r["item"]) in kept, r


def test_frequent_items_bounded_output(spark):
    from patternly_spark.operators.sketches import frequent_items

    df = _skewed(spark)
    out = frequent_items(df, "g", "item", capacity=16).toPandas()
    # <= capacity survivors per (group, partition); far fewer than the domain
    assert out.groupby("g").size().max() <= 16 * 8


def test_histogram_buckets_and_edges(spark):
    from patternly_spark.operators.sketches import histogram

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(11)] + [("b", 5.0), ("b", 5.0)],
        "k string, v double",
    )
    out = {(r["k"], r["bucket"]): r for r in histogram(df, "v", by="k", bins=5).collect()}
    # group a: lo=0 hi=10, w=2 -> buckets 0..4, the top edge (10.0) folds into 4
    assert {k[1] for k in out if k[0] == "a"} == {0, 1, 2, 3, 4}
    assert out[("a", 0)]["n"] == 2 and out[("a", 4)]["n"] == 3
    assert out[("a", 0)]["lo"] == 0.0 and out[("a", 0)]["hi"] == 10.0
    # degenerate group: everything in bucket 0
    assert out[("b", 0)]["n"] == 2
    assert sum(r["n"] for r in out.values()) == 13


def test_count_min_upper_bound_and_exact_when_sparse(spark):
    from patternly_spark.operators.sketches import count_min_counters, count_min_lookup

    # 20 distinct items, width 4096 -> collision-free with overwhelming
    # margin, so every estimate equals the exact count; a planted heavy
    # hitter checks weighting by multiplicity.
    rows = [(f"item{i % 20}",) for i in range(500)] + [("item3",)] * 77
    df = spark.createDataFrame(rows, "item string")
    counters = count_min_counters(df, "item", depth=4, width=4096)
    items = df.select("item").distinct()
    est = {r["item"]: r["cms_est"] for r in
           count_min_lookup(counters, items, "item", depth=4, width=4096).collect()}
    exact = {r["item"]: r["n"] for r in
             df.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert est == exact


def test_count_min_never_underestimates_under_collisions(spark):
    from patternly_spark.operators.sketches import count_min_counters, count_min_lookup

    # width 8 with 200 distinct items forces heavy collisions: the
    # one-sided CMS guarantee (est >= exact) must still hold everywhere.
    df = spark.createDataFrame([(f"w{i % 200}",) for i in range(2000)], "item string")
    counters = count_min_counters(df, "item", depth=3, width=8)
    est = {r["item"]: r["cms_est"] for r in
           count_min_lookup(counters, df.select("item").distinct(), "item",
                            depth=3, width=8).collect()}
    exact = {r["item"]: r["n"] for r in
             df.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(est[i] >= exact[i] for i in exact)
    # total mass per hash row is conserved: sum of counters in each j == N
    per_row = {r["j"]: r["s"] for r in
               counters.groupBy("j").agg(F.sum("cnt").alias("s")).collect()}
    assert set(per_row.values()) == {2000}


def test_count_min_partition_invariant_and_mergeable(spark):
    from patternly_spark.operators.sketches import count_min_counters, count_min_lookup

    rows = [(f"t{i % 50}",) for i in range(1000)]
    df = spark.createDataFrame(rows, "item string")
    a = count_min_counters(df, "item", depth=4, width=64).orderBy("j", "cell")
    b = count_min_counters(df.repartition(13), "item", depth=4, width=64).orderBy("j", "cell")
    assert a.collect() == b.collect()
    # merging sketches of two halves == sketch of the union (cell-wise sum)
    from patternly_spark.operators.sampling import hash_fraction
    left = df.filter(hash_fraction(F.col("item")) < 0.5)
    right = df.filter(hash_fraction(F.col("item")) >= 0.5)
    merged = (
        count_min_counters(left, "item", depth=4, width=64)
        .unionByName(count_min_counters(right, "item", depth=4, width=64))
        .groupBy("j", "cell").agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    assert merged.orderBy("j", "cell").collect() == a.collect()
    # unseen item probes to 0 when its cells were never touched
    unseen = spark.createDataFrame([("never-seen-item-xyz",)], "item string")
    est = count_min_lookup(count_min_counters(df, "item", depth=4, width=4096),
                           unseen, "item", depth=4, width=4096).collect()
    assert est[0]["cms_est"] == 0


def test_streaming_count_min_equals_batch_sketch(spark, tmp_path):
    from patternly_spark.operators.sketches import count_min_counters, count_min_lookup
    from patternly_spark.streaming.sketches import streaming_count_min

    schema = "item string"
    src = str(tmp_path / "src")
    b0 = [(f"x{i % 30}",) for i in range(400)]
    b1 = [(f"x{i % 50}",) for i in range(300)] + [("hot",)] * 40
    spark.createDataFrame(b0, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)

    reg = str(tmp_path / "registry")
    q = streaming_count_min(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        "item",
        reg,
        checkpoint_path=str(tmp_path / "ckpt"),
        depth=4,
        width=64,
        trigger_once=True,
    )
    q.awaitTermination(120)

    # registry parity: counters after both batches == batch sketch of union
    union = spark.createDataFrame(b0 + b1, schema)
    want = count_min_counters(union, "item", depth=4, width=64).orderBy("j", "cell")
    got = read_registry(spark, reg).orderBy("j", "cell")
    assert got.collect() == want.collect()
    # and the registry answers point queries like the batch sketch
    est = count_min_lookup(
        read_registry(spark, reg),
        spark.createDataFrame([("hot",)], schema),
        "item",
        depth=4,
        width=64,
    ).collect()
    assert est[0]["cms_est"] >= 40


def test_mg_merge_preserves_bounds_and_prunes(spark):
    from patternly_spark.operators.sketches import mg_finalize, mg_merge, mg_summaries

    df = _skewed(spark)
    truth = {
        (r["g"], r["item"]): r["cnt"]
        for r in df.groupBy("g", "item").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    s = mg_summaries(df, "g", "item", capacity=32)
    merged = mg_merge(s, "g", "item", capacity=32).cache()
    # pruned: at most capacity items per group, in summary form
    assert merged.groupBy("g").count().agg(F.max("count")).collect()[0][0] <= 32
    fin = mg_finalize(merged, "g", "item").collect()
    assert fin, "merge emptied the summary"
    for r in fin:
        true = truth[(r["g"], r["item"])]
        assert r["count_lo"] <= true <= r["count_hi"], (r, true)
    # heavy items (4 per group, ~200 each vs tail singletons) survive pruning
    kept = {(r["g"], r["item"]) for r in fin}
    for g in ("g0", "g1", "g2"):
        for h in range(4):
            assert (g, f"heavy{h}") in kept
    merged.unpersist()


def test_streaming_frequent_items_registry(spark, tmp_path):
    from patternly_spark.operators.sketches import mg_finalize
    from patternly_spark.streaming.sketches import streaming_frequent_items

    schema = "g string, item string"
    src = str(tmp_path / "src")
    b0 = [("g", "hot")] * 120 + [("g", f"t{i}") for i in range(200)]
    b1 = [("g", "hot")] * 80 + [("g", "warm")] * 60 + [("g", f"u{i}") for i in range(200)]
    spark.createDataFrame(b0, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)

    reg = str(tmp_path / "registry")
    q = streaming_frequent_items(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        "g",
        "item",
        reg,
        checkpoint_path=str(tmp_path / "ckpt"),
        capacity=16,
        trigger_once=True,
    )
    q.awaitTermination(120)

    registry = read_registry(spark, reg)
    assert registry.count() <= 16  # pruned to capacity
    fin = {r["item"]: r for r in mg_finalize(registry, "g", "item").collect()}
    # the planted heavy hitters survive two folds and bound their truth
    assert "hot" in fin and fin["hot"]["count_lo"] <= 200 <= fin["hot"]["count_hi"]
    assert "warm" in fin and fin["warm"]["count_lo"] <= 60 <= fin["warm"]["count_hi"]


def test_hll_registers_estimate_and_merge(spark):
    from patternly_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    for n, tol in [(100, 0.03), (5000, 0.05), (50000, 0.05)]:
        df = spark.range(n).select(F.col("id").cast("string").alias("x"))
        est = hll_estimate(hll_registers(df, "x", p=12), p=12).collect()[0]
        assert abs(est.estimate - n) / n < tol, (n, est.estimate)
    # union property: merge(regs(a), regs(b)) == regs(a ∪ b)
    a = spark.range(0, 3000).select(F.col("id").cast("string").alias("x"))
    b = spark.range(2000, 6000).select(F.col("id").cast("string").alias("x"))
    u = a.unionByName(b)
    merged = hll_merge(hll_registers(a, "x"), hll_registers(b, "x"))
    assert sorted(merged.collect()) == sorted(hll_registers(u, "x").collect())
    # partitioning-invariant
    assert sorted(hll_registers(u.repartition(13), "x").collect()) == sorted(
        hll_registers(u, "x").collect()
    )
    # register count bounded by 2^p
    assert hll_registers(u, "x", p=6).count() <= 64


def test_streaming_hll_registry_equals_batch(spark, tmp_path):
    from patternly_spark.operators.sketches import hll_estimate, hll_registers
    from patternly_spark.streaming.sketches import streaming_hll_registry

    schema = "item string"
    src = str(tmp_path / "src")
    b0 = [(f"u{i}",) for i in range(800)]
    b1 = [(f"u{i}",) for i in range(500, 1500)]  # overlap: true distinct 1500
    spark.createDataFrame(b0, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)

    reg = str(tmp_path / "registry")
    q = streaming_hll_registry(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        "item",
        reg,
        checkpoint_path=str(tmp_path / "ckpt"),
        p=12,
        trigger_once=True,
    )
    q.awaitTermination(120)

    got = read_registry(spark, reg)
    want = hll_registers(spark.createDataFrame(b0 + b1, schema), "item", p=12)
    assert sorted(got.collect()) == sorted(want.collect())
    est = hll_estimate(got, p=12).collect()[0]
    assert abs(est.estimate - 1500) / 1500 < 0.05


def test_log2_histogram_quantiles_within_factor2(spark):
    import random

    import numpy as np

    from patternly_spark.operators.sketches import (
        log2_histogram,
        log2_histogram_merge,
        log2_quantile,
    )

    random.seed(3)
    vals = [random.randint(1, 200_000) for _ in range(4000)] + [0] * 7
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    h = log2_histogram(df, "v")
    assert h.count() <= 64  # bounded state
    for q in (0.5, 0.9, 0.99):
        est = log2_quantile(h, q).collect()[0]
        true = float(np.quantile(vals, q))
        assert est.n == len(vals)
        assert true / 2 <= est.q_estimate <= true * 2, (q, est.q_estimate, true)
    # additive merge == sketch of the union
    a = spark.createDataFrame([(v,) for v in vals[:1500]], "v long")
    b = spark.createDataFrame([(v,) for v in vals[1500:]], "v long")
    m = log2_histogram_merge(log2_histogram(a, "v"), log2_histogram(b, "v"))
    assert sorted(m.collect()) == sorted(h.collect())
    # zeros land in bucket 0 and the 0-quantile of a zero-heavy sample is 0
    zdf = spark.createDataFrame([(0,)] * 10 + [(5,)], "v long")
    z = log2_quantile(log2_histogram(zdf, "v"), 0.5).collect()[0]
    assert z.q_bucket == 0 and z.q_estimate == 0.0


def test_streaming_log2_histogram_equals_batch(spark, tmp_path):
    from patternly_spark.operators.sketches import log2_histogram
    from patternly_spark.streaming.sketches import streaming_log2_histogram

    schema = "g string, v long"
    src = str(tmp_path / "src")
    b0 = [("a", i * 7 % 1000) for i in range(300)]
    b1 = [("a", i * 13 % 50_000) for i in range(300)] + [("b", 3)] * 5
    spark.createDataFrame(b0, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)

    reg = str(tmp_path / "reg")
    q = streaming_log2_histogram(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        "v",
        reg,
        checkpoint_path=str(tmp_path / "ckpt"),
        by="g",
        trigger_once=True,
    )
    q.awaitTermination(120)
    got = read_registry(spark, reg)
    want = log2_histogram(spark.createDataFrame(b0 + b1, schema), "v", by="g")
    assert sorted(got.collect()) == sorted(want.collect())
