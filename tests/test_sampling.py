"""Deterministic hash sampling (operators/sampling.py): rate accuracy,
partitioning invariance, nested-sample property, per-stratum rates."""

import pytest
from pyspark.sql import functions as F

from patternly_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
)


def test_hash_sample_rate_and_determinism(spark):
    df = spark.range(20000).select(F.col("id").alias("k"))
    kept = hash_sample(df, "k", 0.3)
    n = kept.count()
    assert abs(n / 20000 - 0.3) < 0.02
    # partitioning-invariant: same rows regardless of layout
    ids_a = {r.k for r in kept.collect()}
    ids_b = {r.k for r in hash_sample(df.repartition(17), "k", 0.3).collect()}
    assert ids_a == ids_b


def test_hash_sample_nested(spark):
    # a smaller-rate sample is a subset of a larger-rate one (same seed) —
    # the property that makes re-sampling a grown corpus stable
    df = spark.range(5000).select(F.col("id").alias("k"))
    small = {r.k for r in hash_sample(df, "k", 0.1).collect()}
    big = {r.k for r in hash_sample(df, "k", 0.5).collect()}
    assert small <= big
    # a different seed draws an independent sample
    other = {r.k for r in hash_sample(df, "k", 0.1, seed="b").collect()}
    assert other != small


def test_stratified_rates(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(10000)]
    df = spark.createDataFrame(rows, "k long, s string")
    out = stratified_hash_sample(df, "k", "s", {"a": 1.0, "b": 0.2}).toPandas()
    a, b = (out.s == "a").sum(), (out.s == "b").sum()
    assert a == 5000
    assert abs(b / 5000 - 0.2) < 0.03
    # unlisted strata use default_rate=0.0
    df2 = spark.createDataFrame([(1, "zz")], "k long, s string")
    assert stratified_hash_sample(df2, "k", "s", {"a": 1.0}).count() == 0


def test_mixture_weights_math(spark):
    """Binding source keeps rate 1.0; realized token mixture equals the
    target shares exactly; untargeted sources get rate 0."""
    from patternly_spark.operators.sampling import mixture_weights

    docs = spark.createDataFrame(
        # src_a: 4 tokens/doc x 5 docs = 20 tokens; src_b: 40; src_c: 100
        [(i, "a b c d", "src_a") for i in range(5)]
        + [(100 + i, "a b c d e f g h", "src_b") for i in range(5)]
        + [(200 + i, " ".join(["w"] * 20), "src_c") for i in range(5)],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in mixture_weights(docs, {"src_a": 0.5, "src_b": 0.5}).collect()}
    # achievable = min(20/0.5, 40/0.5) = 40 -> src_a binds at rate 1.0
    assert out["src_a"]["sampling_rate"] == 1.0
    assert out["src_b"]["sampling_rate"] == 0.5
    assert out["src_a"]["expected_tokens"] == 20.0
    assert out["src_b"]["expected_tokens"] == 20.0
    assert out["src_c"]["sampling_rate"] == 0.0 and out["src_c"]["target_share"] == 0.0
    assert out["src_c"]["n_tokens"] == 100


def test_quality_bins_rank_exact(spark):
    from patternly_spark.operators.sampling import quality_bins

    df = spark.createDataFrame(
        [(i, "s", float(i)) for i in range(20)], "doc_id long, source string, score double"
    )
    out = {r["doc_id"]: r["bin"] for r in quality_bins(df, "score", n_bins=4, by="source").collect()}
    assert out[0] == 1 and out[4] == 1  # lowest 5 scores -> bin 1
    assert out[19] == 4 and out[15] == 4
    assert sorted(set(out.values())) == [1, 2, 3, 4]


def test_importance_sample_rates_and_determinism(spark):
    from pyspark.sql import functions as F
    from patternly_spark.operators.sampling import importance_sample

    df = spark.createDataFrame([(i,) for i in range(4000)], "doc_id long")
    # p = 0 keeps nothing, p = 1 keeps everything
    assert importance_sample(df, F.lit(0.0)).count() == 0
    assert importance_sample(df, F.lit(1.0)).count() == 4000
    # p = 0.3 keeps ~30%, deterministically
    kept1 = importance_sample(df, F.lit(0.3)).collect()
    kept2 = importance_sample(df, F.lit(0.3)).collect()
    assert sorted(r["doc_id"] for r in kept1) == sorted(r["doc_id"] for r in kept2)
    assert 0.25 < len(kept1) / 4000 < 0.35
    # different seed draws an independent sample
    kept3 = importance_sample(df, F.lit(0.3), seed="b").collect()
    assert sorted(r["doc_id"] for r in kept3) != sorted(r["doc_id"] for r in kept1)
    # out-of-range probabilities clamp instead of misbehaving
    assert importance_sample(df, F.lit(7.5)).count() == 4000
    assert importance_sample(df, F.lit(-2.0)).count() == 0


def test_weighted_sample_proportional_and_deterministic(spark):
    from pyspark.sql import functions as F
    from patternly_spark.operators.sampling import weighted_sample

    # two weight classes: weight 10 vs weight 1 — heavy rows should
    # dominate the sample
    rows = [(i, 10.0 if i < 500 else 1.0) for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(df, "w", 200, key_col="doc_id").collect()
    assert len(got) == 200
    heavy = sum(1 for r in got if r["w"] == 10.0)
    # E[heavy] ~ 200 * (500*10)/(500*10+4500*1) ~ 105; demand clear dominance
    assert heavy > 70
    again = weighted_sample(df, "w", 200, key_col="doc_id").collect()
    assert sorted(r["doc_id"] for r in got) == sorted(r["doc_id"] for r in again)
    # zero/negative weights never sampled
    df2 = spark.createDataFrame([(1, 0.0), (2, -3.0), (3, 1.0)], "doc_id long, w double")
    assert [r["doc_id"] for r in weighted_sample(df2, "w", 10).collect()] == [3]


def test_weighted_sample_per_group(spark):
    from patternly_spark.operators.sampling import weighted_sample

    rows = [(i, "a" if i % 2 == 0 else "b", 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, g string, w double")
    got = weighted_sample(df, "w", 5, key_col="doc_id", by="g").collect()
    from collections import Counter

    assert Counter(r["g"] for r in got) == {"a": 5, "b": 5}


def test_quantile_normalize_maps_group_onto_global(spark):
    from patternly_spark.operators.normalize import quantile_normalize

    # group a: 1..10; group b: 101..110 — after normalization both groups
    # span the GLOBAL distribution (min..max), erasing the group shift
    rows = [(i, "a", float(i)) for i in range(1, 11)]
    rows += [(100 + i, "b", float(100 + i)) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "doc_id long, g string, v double")
    out = {r["doc_id"]: r["v_qn"] for r in quantile_normalize(df, "v", by="g", id_col="doc_id").collect()}
    lo, hi = min(out.values()), max(out.values())
    assert lo == 1.0 and hi == 110.0
    # within-group rank 0 -> global min; rank 1 -> global max, both groups
    assert out[1] == 1.0 and out[10] == 110.0
    assert out[101] == 1.0 and out[110] == 110.0
    # the same within-group rank maps to the same global value
    assert out[5] == out[105]


def test_assign_split_deterministic_and_proportional(spark):
    from patternly_spark.operators.sampling import assign_split

    df = spark.range(0, 20_000).withColumnRenamed("id", "k")
    out = assign_split(df, "k").groupBy("split").count().collect()
    sizes = {r["split"]: r["count"] for r in out}
    assert set(sizes) == {"train", "val", "test"}
    # md5 uniformity: 80/10/10 within a generous tolerance at n=20k
    assert abs(sizes["train"] / 20_000 - 0.8) < 0.02
    assert abs(sizes["val"] / 20_000 - 0.1) < 0.01
    assert abs(sizes["test"] / 20_000 - 0.1) < 0.01
    # partitioning-invariant and additive: same rows, same labels
    from patternly_spark.operators.sampling import assign_split as asg
    a = {r["k"]: r["split"] for r in asg(df, "k").collect()}
    b = {r["k"]: r["split"] for r in asg(df.repartition(17), "k").collect()}
    assert a == b
    sub = {r["k"]: r["split"] for r in asg(df.filter("k < 5000"), "k").collect()}
    assert all(a[k] == v for k, v in sub.items())


def test_leakage_safe_split_never_straddles(spark):
    from pyspark.sql import functions as F

    from patternly_spark.operators.sampling import leakage_safe_split

    docs = spark.range(0, 3000).select(F.col("id").alias("doc_id"))
    # chains of 3: (0,1),(1,2), (3,4),(4,5), ... -> 1000 clusters of 3
    base = spark.range(0, 3000).filter("id % 3 < 2")
    pairs = base.select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    out = leakage_safe_split(docs, pairs).cache()
    per_cluster = out.groupBy("cluster_id").agg(
        F.count_distinct("split").alias("n_splits"), F.count(F.lit(1)).alias("n")
    )
    assert per_cluster.filter("n_splits > 1").count() == 0
    assert per_cluster.filter("n != 3").count() == 0
    # all 3000 docs assigned exactly once
    assert out.count() == 3000 and out.select("doc_id").distinct().count() == 3000
    out.unpersist()


def test_epoch_mixture_sample_copies_and_budget(spark):
    from patternly_spark.operators.sampling import epoch_mixture_sample

    # 3 sources x 400 docs x 10 tokens = 4000 tokens each
    rows = [
        (s * 1000 + i, f"s{s}", " ".join(["tok"] * 10))
        for s in range(3)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # budget 8000: s0 rate 1.0 (exact one epoch), s1 rate 0.75 (coin),
    # s2 untargeted (dropped); shares 0.5/0.375
    out = epoch_mixture_sample(
        df, {"s0": 0.5, "s1": 0.375, "s2": 0.125}, 8000.0
    ).cache()
    per = {r["source"]: r for r in
           out.groupBy("source").agg(
               F.count(F.lit(1)).alias("rows"), F.max("epoch").alias("maxe")
           ).collect()}
    # s0: rate exactly 1.0 -> every doc exactly once
    assert per["s0"]["rows"] == 400 and per["s0"]["maxe"] == 1
    # s1: rate 0.75 -> binomial(400, .75); md5 uniformity keeps it near 300
    assert 260 <= per["s1"]["rows"] <= 340 and per["s1"]["maxe"] == 1
    # s2: rate 0.25 -> near 100
    assert 70 <= per["s2"]["rows"] <= 130
    # epochs are dense 1..n_copies per doc
    bad = out.groupBy("doc_id", "n_copies").agg(
        F.count(F.lit(1)).alias("k"), F.max("epoch").alias("m"), F.min("epoch").alias("lo")
    ).filter("k != n_copies OR m != n_copies OR lo != 1").count()
    assert bad == 0
    # partitioning invariance
    again = epoch_mixture_sample(
        df.repartition(11), {"s0": 0.5, "s1": 0.375, "s2": 0.125}, 8000.0
    )
    assert sorted(map(tuple, out.select("doc_id", "epoch").collect())) == sorted(
        map(tuple, again.select("doc_id", "epoch").collect())
    )
    out.unpersist()


def test_epoch_mixture_upsamples_rare_source(spark):
    from patternly_spark.operators.sampling import epoch_mixture_sample

    rows = [(i, "rare", " ".join(["t"] * 10)) for i in range(10)] + [
        (100 + i, "big", " ".join(["t"] * 10)) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # rare has 100 tokens, target 50% of a 2000-token budget -> rate 10
    out = epoch_mixture_sample(df, {"rare": 0.5, "big": 0.5}, 2000.0)
    rare = out.filter("source = 'rare'")
    assert rare.count() == 100  # exactly 10 epochs x 10 docs, coin frac 0
    assert rare.groupBy().max("epoch").collect()[0][0] == 10
    # big: rate 0.1 -> ~100 of 1000 docs
    nbig = out.filter("source = 'big'").count()
    assert 60 <= nbig <= 140


def test_epoch_shuffle_fresh_order_per_epoch_and_contiguous(spark):
    """Each epoch is a fresh deterministic permutation: per-(epoch,
    shard) positions are 0..n-1 contiguous, every doc appears once per
    epoch, and epoch orders differ; identical under repartitioning."""
    from patternly_spark.operators.sampling import epoch_shuffle

    docs = spark.createDataFrame([(i,) for i in range(64)], "doc_id long")
    out = epoch_shuffle(docs, n_epochs=2, n_shards=4).toPandas()
    assert len(out) == 128
    for (ep, sh), grp in out.groupby(["epoch", "shard"]):
        assert sorted(grp["pos"]) == list(range(len(grp)))
    per_epoch = {
        ep: grp.sort_values("doc_id")[["shard", "pos"]].to_records(index=False).tolist()
        for ep, grp in out.groupby("epoch")
    }
    assert per_epoch[0] != per_epoch[1]  # fresh permutation per epoch

    again = epoch_shuffle(docs.repartition(7), n_epochs=2, n_shards=4).toPandas()
    a = out.sort_values(["epoch", "doc_id"], ignore_index=True)
    b = again.sort_values(["epoch", "doc_id"], ignore_index=True)
    assert a.equals(b)


def test_temperature_mixture_properties(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n), src) for i, (n, src) in enumerate(
            [(100, "big")] * 8 + [(10, "small")] * 2 + [(40, "mid")] * 5
        )],
        "doc_id long, text string, source string",
    )
    from patternly_spark.operators.sampling import temperature_mixture

    rows = {r.source: r for r in temperature_mixture(docs, tau=0.5).collect()}
    assert set(rows) == {"big", "small", "mid"}
    # temperature < 1 up-weights small sources relative to natural share
    assert rows["small"].temp_share > rows["small"].raw_share
    assert rows["big"].temp_share < rows["big"].raw_share
    # shares normalize; binding source keeps rate 1.0, others downsample
    assert sum(r.temp_share for r in rows.values()) == pytest.approx(1.0)
    assert max(r.sampling_rate for r in rows.values()) == pytest.approx(1.0)
    assert all(0.0 < r.sampling_rate <= 1.0 + 1e-12 for r in rows.values())
    # expected tokens consistent with rate * available tokens
    for r in rows.values():
        assert r.expected_tokens == pytest.approx(r.sampling_rate * r.n_tokens)
    # tau=1 reproduces the natural mixture: every rate ~1, shares ~raw
    nat = {r.source: r for r in temperature_mixture(docs, tau=1.0).collect()}
    for r in nat.values():
        assert r.temp_share == pytest.approx(r.raw_share, abs=1e-6)
        assert r.sampling_rate == pytest.approx(1.0, abs=1e-5)


def test_ring_negatives_properties(spark):
    from patternly_spark.operators.sampling import ring_negatives

    docs = spark.createDataFrame([(i,) for i in range(60)], "doc_id long")
    out = ring_negatives(docs, k=3, n_buckets=4, seed="t").toPandas()
    # never self, slots in range
    assert (out.doc_id != out.neg_id).all()
    assert set(out.slot) == {1, 2, 3}
    # every anchor with a big-enough bucket gets k distinct negatives
    per = out.groupby("doc_id").neg_id.nunique()
    assert (per >= 2).all() and (per <= 3).all()
    # partitioning-invariant and re-run-stable (pure function of ids+seed)
    again = ring_negatives(docs.repartition(7), k=3, n_buckets=4, seed="t").toPandas()
    key = lambda df: sorted(map(tuple, df[["doc_id", "slot", "neg_id"]].values))  # noqa: E731
    assert key(out) == key(again)
    # different seed -> different assignment
    other = ring_negatives(docs, k=3, n_buckets=4, seed="u").toPandas()
    assert key(out) != key(other)


def test_ring_negatives_tiny_bucket_wraps_without_self(spark):
    from patternly_spark.operators.sampling import ring_negatives

    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    out = ring_negatives(docs, k=3, n_buckets=1, seed="").toPandas()
    # ring of 2: every slot wraps to the single other doc, never self
    assert (out.doc_id != out.neg_id).all()
    assert set(out.groupby("doc_id").neg_id.nunique()) == {1}
