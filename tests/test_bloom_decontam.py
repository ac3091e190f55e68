"""Bloom decontamination: one-sided vs exact, fpr scaling, plan shape."""

import pytest
from pyspark.sql import functions as F

from patternly_spark.operators.decontam import (
    benchmark_bloom_bits,
    bloom_decontaminate,
    decontaminate,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(120):
        words = [f"w{(i * 7 + j) % 400}" for j in range(12)]
        rows.append((i, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bloom_never_under_exact(spark, corpus):
    bench = corpus.filter("doc_id % 10 = 0")
    exact = {r["doc_id"]: r for r in decontaminate(corpus, bench, threshold=0.3).collect()}
    bloom = {r["doc_id"]: r for r in
             bloom_decontaminate(corpus, bench, threshold=0.3,
                                 num_bits=256, num_hashes=3).collect()}
    assert set(exact) == set(bloom)
    for d in exact:
        assert bloom[d]["n_shingles"] == exact[d]["n_shingles"]
        assert bloom[d]["n_hits"] >= exact[d]["n_hits"], d  # one-sided
        if exact[d]["contaminated"]:
            assert bloom[d]["contaminated"], d  # can only over-flag


def test_bloom_tightens_with_more_bits(spark, corpus):
    bench = corpus.filter("doc_id % 10 = 0")
    exact = {r["doc_id"]: r["n_hits"] for r in
             decontaminate(corpus, bench).collect()}

    def excess(num_bits):
        got = bloom_decontaminate(corpus, bench, num_bits=num_bits, num_hashes=3)
        return sum(r["n_hits"] - exact[r["doc_id"]] for r in got.collect())

    tight = excess(1 << 20)
    loose = excess(256)
    assert tight == 0  # 1M bits for ~300 shingles: no collisions
    assert loose > 0  # 256 bits: real false positives


def test_bloom_bits_bounded_and_deterministic(spark, corpus):
    bench = corpus.filter("doc_id % 10 = 0")
    bits = benchmark_bloom_bits(bench, num_bits=512, num_hashes=3)
    n = bits.count()
    assert n <= 512
    assert bits.agg(F.max("bit")).collect()[0][0] < 512
    assert bits.agg(F.min("bit")).collect()[0][0] >= 0
    again = benchmark_bloom_bits(bench.repartition(7), num_bits=512, num_hashes=3)
    assert sorted(r["bit"] for r in again.collect()) == sorted(
        r["bit"] for r in bits.collect()
    )


def test_bloom_probe_plan_is_broadcast_only(spark, corpus):
    bench = corpus.filter("doc_id % 10 = 0")
    out = bloom_decontaminate(corpus, bench, num_bits=4096, num_hashes=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cross_source_overlap_known_sharing(spark):
    from patternly_spark.operators.decontam import cross_source_overlap

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # one 8-gram
    docs = spark.createDataFrame(
        [
            (1, shared + " iota", "A"),          # grams: 2 (8-gram window x2)
            (2, shared, "B"),                     # the shared 8-gram exactly
            (3, "totally different words here x y z w q", "C"),
        ],
        "doc_id long, text string, source string",
    )
    out = {(r.source_a, r.source_b): r for r in cross_source_overlap(docs).collect()}
    ab = out[("A", "B")]
    assert ab.shared == 1 and ab.n_b == 1 and ab.n_a == 2
    assert ab.containment == 1.0  # B is fully contained in A
    assert ("A", "C") not in out and ("B", "C") not in out  # no overlap rows


def test_ngram_novelty_planted_copy_disjoint_and_short(spark):
    """A verbatim copy of a reference doc scores novelty 0.0; a
    disjoint-vocabulary doc scores 1.0; docs too short for any gram
    report (0 grams, novelty 1.0); a half-restated doc lands between."""
    from patternly_spark.operators.decontam import ngram_novelty

    ref = spark.createDataFrame(
        [(100, "r1 r2 r3 r4 r5 r6"), (101, "s1 s2 s3 s4 s5")],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [
            (1, "r1 r2 r3 r4 r5 r6"),             # exact copy
            (2, "x1 x2 x3 x4 x5"),                # disjoint
            (3, "tiny doc"),                      # < n tokens
            (4, "r1 r2 r3 r4 z9 z8 z7 z6"),       # grams: 1 hit of 5
        ],
        "doc_id long, text string",
    )
    got = {
        r.id: (r.n_grams, r.n_novel, r.novelty)
        for r in ngram_novelty(probes, ref, n=4).collect()
    }
    assert got[1] == (3, 0, 0.0)
    assert got[2] == (2, 2, 1.0)
    assert got[3] == (0, 0, 1.0)
    assert got[4] == (5, 4, 4 / 5)
