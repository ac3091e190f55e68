"""Semantics tests for dedup / similarity / text / multimodal operators
with constructed duplicates and near-duplicates (validated against plain
Python reference computations)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from patternly_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_dedup,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_signatures,
    simhash_neardup_pairs,
    embedding_neardup_pairs,
)
from patternly_spark.operators.similarity import cosine_topk, lsh_bucketed_topk


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the birds sing in the tall green trees outside"
)


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(42)
    vocab = BASE.split()
    rows = []
    for i in range(40):
        toks = rng.choice(vocab, size=30).tolist()
        rows.append((i, " ".join(toks)))
    # 40,41: exact duplicates of 0;  42: near-dup of 1 (one token changed)
    rows.append((40, rows[0][1]))
    rows.append((41, rows[0][1]))
    t1 = rows[1][1].split()
    t1[5] = "zebra"
    rows.append((42, " ".join(t1)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = exact_dedup(docs).toPandas().sort_values("doc_id")
    dups = out[out.is_dup]
    assert set(dups.doc_id) == {40, 41}
    assert set(dups.canonical_id) == {0}


def test_minhash_lsh_finds_near_dups(docs):
    found = minhash_dedup(docs, shingle_size=3, num_hashes=8, bands=4, jaccard_threshold=0.5)
    pairs = {(int(a), int(b)) for a, b in found.select("doc_a", "doc_b").collect()}
    # exact dups always collide on every band
    assert (0, 40) in pairs and (0, 41) in pairs and (40, 41) in pairs
    # the near-dup pair must be found (high jaccard -> some band agrees)
    assert (1, 42) in pairs


def test_minhash_signature_matches_python_reference(docs):
    import hashlib

    sigs = minhash_signatures(docs, shingle_size=1, num_hashes=2).toPandas().set_index("doc_id")
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    M = 2147483647
    for doc_id in (0, 5, 42):
        toks = list(dict.fromkeys(texts[doc_id].split()))
        hs = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % M for t in toks]
        exp0 = min((h * 1103515245 + 12345) % M for h in hs)
        exp1 = min((h * 1140671486 + 12820164) % M for h in hs)
        assert sigs.loc[doc_id, "minhash_0"] == exp0
        assert sigs.loc[doc_id, "minhash_1"] == exp1


def test_ngram_jaccard(docs, spark):
    pairs = spark.createDataFrame([(1, 42), (0, 40)], "doc_a long, doc_b long")
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, pairs, n=3).collect()}
    assert out[(0, 40)] == 1.0
    assert 0.5 < out[(1, 42)] < 1.0


def test_simhash_near_dups(docs):
    sigs = simhash_signatures(docs, bits=64, shingle_size=1)
    pairs = simhash_neardup_pairs(sigs, max_hamming=3)
    got = {(int(a), int(b)) for a, b in pairs.select("doc_a", "doc_b").collect()}
    assert {(0, 40), (0, 41), (40, 41)}.issubset(got)
    # hamming 0 for exact dups
    hm = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs.collect()}
    assert hm[(0, 40)] == 0


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(60, 16)).astype(np.float32)
    vecs[50] = vecs[3] + rng.normal(0, 0.01, 16).astype(np.float32)  # near-dup of 3
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pairs_bucket_cap(spark):
    # degenerate bucket: byte-identical docs all share every fingerprint;
    # above the cap the bucket degrades to min-id star edges (O(n) rows,
    # no quadratic pair array), below it pairs emit normally
    from patternly_spark.functions.text import fingerprint_candidate_pairs

    docs = spark.createDataFrame(
        [(i, "the same exact sentence repeated for every document here") for i in range(8)],
        "doc_id long, text string",
    )
    normal = fingerprint_candidate_pairs(docs)
    assert normal.count() == 8 * 7 // 2

    from patternly_spark.operators.dedup import _pairs_in_buckets
    from pyspark.sql import functions as F

    keyed = docs.select("doc_id", F.lit(1).alias("bucket"))
    capped = _pairs_in_buckets(keyed, ["bucket"], "doc_id", max_bucket_size=5)
    # bucket of 8 > cap 5 -> star edges 0->1..7, keeping the bucket
    # connected without the quadratic blowup
    got = sorted((r["doc_a"], r["doc_b"]) for r in capped.collect())
    assert got == [(0, i) for i in range(1, 8)]


def test_overcap_megacluster_single_cluster(spark):
    # the 100 TB failure mode: thousands of byte-identical boilerplate
    # docs land in ONE LSH bucket per band, far above max_bucket_size.
    # Star edges must carry them through verification + connected
    # components as a single cluster with one canonical survivor.
    from patternly_spark.operators.dedup import neardup_dedup_corpus

    n = 5000
    docs = spark.createDataFrame(
        [(i, "exactly the same boilerplate text shared by every page") for i in range(n)],
        "doc_id long, text string",
    )
    out = neardup_dedup_corpus(docs).toPandas()
    assert len(out) == n
    assert out["cluster_id"].nunique() == 1
    assert int(out["is_canonical"].sum()) == 1
    canon = out[out["is_canonical"]]["doc_id"].iloc[0]
    assert canon == 0  # min id is canonical


def test_overcap_megacluster_incremental(spark):
    # same planted mega-cluster through the incremental/streaming registry
    # path (streaming/dedup.py) — over-cap band buckets must still link
    # every batch member to one canonical.
    from patternly_spark.streaming.dedup import empty_band_registry, incremental_neardup_dedup

    n = 3000
    docs = spark.createDataFrame(
        [(i, "exactly the same boilerplate text shared by every page") for i in range(n)],
        "doc_id long, text string",
    )
    result, _new_rows = incremental_neardup_dedup(docs, empty_band_registry(spark))
    out = result.toPandas()
    assert len(out) == n
    assert set(out["canonical_id"]) == {0}
    assert int(out["is_new_canonical"].sum()) == 1
    assert int(out["is_dup"].sum()) == n - 1


def test_cosine_topk_matches_numpy(emb):
    vecs = np.array([r["embedding"] for r in emb.orderBy("vec_id").collect()])
    out = cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=3).toPandas()
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    for q in range(5):
        s = sims[q].copy()
        s[q] = -np.inf
        expected = np.argsort(np.round(-s, 6), kind="stable")[:3]
        got = out[out.query_id == q].sort_values("rank").neighbor_id.tolist()
        assert got == expected.tolist(), f"query {q}: {got} vs {expected}"


def test_embedding_neardup(emb):
    pairs = embedding_neardup_pairs(emb, threshold=0.95, num_planes=8)
    got = {(int(a), int(b)) for a, b in pairs.select("vec_a", "vec_b").collect()}
    assert (3, 50) in got


def test_lsh_topk_recall(emb):
    exact = cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=3).toPandas()
    approx = lsh_bucketed_topk(emb, emb.filter(F.col("vec_id") < 10), k=3, num_planes=4).toPandas()
    # rank-1 neighbor recall with multi-probe at 16-dim should be high
    hits = 0
    for q in range(10):
        e1 = exact[(exact.query_id == q) & (exact["rank"] == 1)].neighbor_id.iloc[0]
        a = approx[approx.query_id == q].neighbor_id.tolist()
        hits += int(e1 in a)
    assert hits >= 7


def test_ivf_topk_recall(emb):
    from patternly_spark.operators.similarity import ivf_topk

    exact = cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=3).toPandas()
    approx = ivf_topk(emb, emb.filter(F.col("vec_id") < 10), k=3, n_lists=4, n_probe=2).toPandas()
    hits = 0
    for q in range(10):
        e1 = exact[(exact.query_id == q) & (exact["rank"] == 1)].neighbor_id.iloc[0]
        a = approx[approx.query_id == q].neighbor_id.tolist()
        hits += int(e1 in a)
    assert hits >= 7


def test_multimodal_plumbing(spark):
    from patternly_spark.operators.multimodal import extract_features, sample_frames, resize_images

    rows = [(i, "image", bytes([i] * (100 + i)), "image/fake", 10, 10, None) for i in range(5)]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, mime string, width int, height int, duration_ms int"
    )
    feats = extract_features(media, dim=4).toPandas().sort_values("media_id")
    assert len(feats) == 5
    assert feats.n_bytes.tolist() == [100, 101, 102, 103, 104]
    assert all(len(f) == 4 for f in feats.features)
    # deterministic across runs
    feats2 = extract_features(media, dim=4).toPandas().sort_values("media_id")
    assert all((np.array(a) == np.array(b)).all() for a, b in zip(feats.features, feats2.features))

    frames = sample_frames(media, every_n_bytes=30, max_frames=4).toPandas()
    assert frames.groupby("media_id").size().max() <= 4
    resized = resize_images(media, width=64, height=48).toPandas()
    assert (resized.width == 64).all() and (resized.height == 48).all()


def test_lsh_index_partition_pruning(emb, spark, tmp_path):
    from patternly_spark.operators.similarity import (
        lsh_bucketed_topk, lsh_index_topk, save_lsh_index,
    )

    path = str(tmp_path / "ann_index")
    save_lsh_index(emb, path, num_planes=4)
    queries = emb.filter(F.col("vec_id") < 8)
    got = lsh_index_topk(spark, path, queries, k=3, num_planes=4)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "sig" in plan.split("PartitionFilters")[1][:120], \
        "probe filter must prune index partitions"
    want = lsh_bucketed_topk(emb, queries, k=3, num_planes=4).toPandas()
    gp = got.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    wp = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert gp.equals(wp), "index query must match the direct LSH top-k"


def test_hyperplane_udf_path_matches_literal_path(emb, spark, monkeypatch):
    """VERDICT #8: past LITERAL_BUDGET the signature computation switches
    to a broadcast+pandas-UDF; forcing the switch at a small dim must give
    the same signatures as the literal path (same planes, same bits)."""
    import patternly_spark.functions.vectors as V
    from patternly_spark.functions.vectors import hyperplane_signature

    rng = np.random.default_rng(3)
    planes = rng.normal(size=(6, 16))
    lit = emb.select("vec_id", hyperplane_signature(F.col("embedding"), planes).alias("sig")).toPandas()
    monkeypatch.setattr(V, "LITERAL_BUDGET", 0)
    udf = emb.select("vec_id", hyperplane_signature(F.col("embedding"), planes).alias("sig")).toPandas()
    assert lit.sort_values("vec_id").sig.tolist() == udf.sort_values("vec_id").sig.tolist()


def test_nearest_centroids_udf_path_matches_literal_path(emb, spark, monkeypatch):
    import patternly_spark.functions.vectors as V
    from patternly_spark.functions.vectors import nearest_centroids

    rng = np.random.default_rng(4)
    cents = rng.normal(size=(8, 16))
    lit = emb.select("vec_id", nearest_centroids(F.col("embedding"), cents, 3).alias("cells")).toPandas()
    monkeypatch.setattr(V, "LITERAL_BUDGET", 0)
    udf = emb.select("vec_id", nearest_centroids(F.col("embedding"), cents, 3).alias("cells")).toPandas()
    a = [list(x) for x in lit.sort_values("vec_id").cells]
    b = [list(x) for x in udf.sort_values("vec_id").cells]
    assert a == b


def test_high_dim_ann_plan_stays_small(spark):
    """At dim=1024 x 8 planes (8192 literals > LITERAL_BUDGET) the plan
    must not embed the plane matrix; operators stay usable end-to-end."""
    from patternly_spark.operators.similarity import lsh_bucketed_topk
    from patternly_spark.operators.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(40, 1024)).astype(np.float32)
    vecs[30] = vecs[2] + rng.normal(0, 0.001, 1024).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    topk = lsh_bucketed_topk(df, df.filter(F.col("vec_id") < 4), k=3, num_planes=8)
    plan = topk._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 200_000, f"plan embeds the plane matrix: {len(plan)} chars"
    assert "ArrowEvalPython" in topk._jdf.queryExecution().executedPlan().toString()
    assert topk.count() > 0

    pairs = embedding_neardup_pairs(df, threshold=0.99, num_planes=8).toPandas()
    assert {(2, 30)} == set(zip(pairs.vec_a, pairs.vec_b))


def test_ivf_index_partition_pruning_and_parity(emb, spark, tmp_path):
    from patternly_spark.operators.similarity import (
        ivf_index_topk, ivf_topk, save_ivf_index,
    )

    path = str(tmp_path / "ivf_index")
    save_ivf_index(emb, path, n_lists=8)
    queries = emb.filter(F.col("vec_id") < 8)
    got = ivf_index_topk(spark, path, queries, k=3, n_probe=3)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan.split("PartitionFilters")[1][:120], \
        "probe filter must prune index partitions"
    want = ivf_topk(emb, queries, k=3, n_lists=8, n_probe=3).toPandas()
    gp = got.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    wp = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert gp.equals(wp), "index query must match the direct IVF top-k"


def test_incremental_exact_dedup_resolves_against_canon(spark):
    from patternly_spark.operators.dedup import exact_dedup, incremental_exact_dedup

    canon_docs = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "lorem ipsum dolor")],
        "doc_id long, text string",
    )
    canon = (
        exact_dedup(canon_docs)
        .filter(~F.col("is_dup"))
        .select("content_hash", "canonical_id")
    )
    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox"),   # dup of canon id 0
            (11, "brand new document"),    # new hash, batch canonical
            (12, "brand new document"),    # in-batch dup of 11
            (13, "another new one"),       # new hash
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in incremental_exact_dedup(batch, canon).collect()
    }
    assert out[10]["canonical_id"] == 0 and out[10]["is_dup"] is True
    assert out[10]["is_new_canonical"] is False
    assert out[11]["canonical_id"] == 11 and out[11]["is_new_canonical"] is True
    assert out[12]["canonical_id"] == 11 and out[12]["is_dup"] is True
    assert out[12]["is_new_canonical"] is False
    assert out[13]["is_new_canonical"] is True
    # appending the flagged rows reproduces a consistent registry
    assert sum(r["is_new_canonical"] for r in out.values()) == 2


def test_incremental_dedup_bucketed_canon_skips_canon_shuffle(spark, tmp_path):
    """The canon side (the 100 TB side) must not re-shuffle when it is
    bucketed by content_hash: the join plan carries exactly one Exchange
    (the new batch) plus the batch's own dedup-window exchange."""
    from patternly_spark.operators.dedup import exact_dedup, incremental_exact_dedup
    from patternly_spark.sources.bucketed import read_bucketed, save_bucketed

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    registry = (
        exact_dedup(docs).filter(~F.col("is_dup")).select("content_hash", "canonical_id")
    )
    save_bucketed(
        registry, "canon_b", bucket_by="content_hash", n_buckets=4,
        path=str(tmp_path / "canon_b"),
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        batch = spark.createDataFrame(
            [(9001, "fresh batch doc")], "doc_id long, text string"
        )
        out = incremental_exact_dedup(batch, read_bucketed(spark, "canon_b"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        # exchanges: batch-side window partitioning + batch-side join
        # repartition into the canon's bucket layout — none on the scan
        assert "SortMergeJoin" in plan
        n_exchanges = plan.count("Exchange")
        assert n_exchanges <= 2, f"canon side re-shuffled:\n{plan[:2000]}"
        assert out.count() == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS canon_b")


def test_incremental_dedup_empty_canon_first_ingestion(spark):
    from patternly_spark.operators.dedup import incremental_exact_dedup

    canon = spark.createDataFrame([], "content_hash string, canonical_id long")
    batch = spark.createDataFrame(
        [(1, "first doc"), (2, "first doc"), (3, "other doc")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in incremental_exact_dedup(batch, canon).collect()}
    assert out[1]["is_new_canonical"] is True and out[1]["canonical_id"] == 1
    assert out[2]["is_dup"] is True and out[2]["canonical_id"] == 1
    assert out[3]["is_new_canonical"] is True


def test_semantic_dedup_groups_and_canonicals(spark):
    from patternly_spark.operators.dedup import semantic_dedup
    import numpy as np

    rng = np.random.default_rng(7)
    base_a = rng.normal(size=16)
    base_b = rng.normal(size=16)
    rows = []
    # duplicate groups as scalar multiples: scaling preserves every
    # hyperplane sign (same cell guaranteed) and cosine exactly 1 —
    # additive noise could flip a sign near a plane boundary, which is
    # precisely the within-cell-only approximation this operator makes
    for i, s in enumerate((1.0, 1.1, 0.9)):           # group A: ids 0,1,2
        rows.append((i, (base_a * s).tolist()))
    for i, s in zip((3, 4), (1.0, 1.2)):              # group B: ids 3,4
        rows.append((i, (base_b * s).tolist()))
    for i in range(5, 10):
        rows.append((i, rng.normal(size=16).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in semantic_dedup(emb, threshold=0.99).collect()}
    # total map over the corpus
    assert set(out) == set(range(10))
    # identical-direction vectors share a cell, link, and take min id
    assert out[1]["cluster_id"] == 0 and out[2]["cluster_id"] == 0
    assert out[4]["cluster_id"] == 3
    assert out[0]["is_canonical"] and out[3]["is_canonical"]
    assert not out[1]["is_canonical"] and not out[4]["is_canonical"]
    # random vectors at dim 16 stay singletons at 0.99
    for i in range(5, 10):
        assert out[i]["cluster_id"] == i and out[i]["is_canonical"]


def test_semantic_dedup_rejects_non_integral_ids(spark):
    # the pairwise Arrow kernel casts ids to long — a string id would
    # become NULL and its pairs would silently vanish; must refuse
    from patternly_spark.operators.dedup import semantic_dedup
    import pytest

    emb = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [1.0, 0.0])],
        "vec_id string, embedding array<double>",
    )
    with pytest.raises(TypeError, match="integral"):
        semantic_dedup(emb, threshold=0.9)


def test_semantic_dedup_autosize_planes(spark):
    # num_planes=None: the engine derives the cell grid from the corpus
    # count (target_cell_size bound), instead of trusting a caller
    # constant; result is still a TOTAL map with the planted group linked
    import numpy as np

    from patternly_spark.operators.dedup import semantic_dedup

    rng = np.random.default_rng(11)
    base = rng.normal(size=16)
    rows = [(i, (base * (1.0 + 0.01 * i)).tolist()) for i in range(3)]
    rows += [(i, rng.normal(size=16).tolist()) for i in range(3, 40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # target_cell_size=8 over 40 vectors -> ceil(log2(40/8)) = 3 planes
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            emb, threshold=0.99, num_planes=None, target_cell_size=8
        ).collect()
    }
    assert set(out) == set(range(40))
    assert out[1]["cluster_id"] == 0 and out[2]["cluster_id"] == 0
    assert int(sum(out[i]["is_canonical"] for i in range(3))) == 1


def test_semantic_dedup_overcap_cell_star(spark):
    # a cell above max_cell_size degrades to star comparisons against the
    # min-id representative: identical vectors still collapse to ONE
    # cluster, with O(cell) not O(cell^2) comparisons
    import numpy as np

    from patternly_spark.operators.dedup import semantic_dedup

    rng = np.random.default_rng(13)
    base = rng.normal(size=16)
    n = 50
    rows = [(i, base.tolist()) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = (
        semantic_dedup(emb, threshold=0.99, num_planes=2, max_cell_size=10)
        .toPandas()
    )
    assert len(out) == n
    assert out["cluster_id"].nunique() == 1
    assert int(out["is_canonical"].sum()) == 1
    assert out[out["is_canonical"]]["vec_id"].iloc[0] == 0


def test_incremental_semantic_rejects_autosize(spark):
    import pytest as _pytest

    from patternly_spark.streaming.dedup import (
        empty_semantic_registry,
        incremental_semantic_dedup,
    )

    emb = spark.createDataFrame(
        [(0, [1.0] * 4)], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="num_planes"):
        incremental_semantic_dedup(
            emb, empty_semantic_registry(spark), num_planes=None
        )


def test_span_dedup_delimiter_keep_first(spark):
    """Keep-first is global in (doc_id, pos) order; reassembly preserves
    each doc's surviving-span order; fully-deduped docs survive with
    empty text (TOTAL output).  Reference semantics: C4 span dedup
    (Raffel et al. 2020, sec 2.2)."""
    from patternly_spark.operators.dedup import span_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha\nbeta\nalpha"),      # in-doc dup: second 'alpha' drops
            (2, "beta\ngamma"),             # 'beta' seen in doc 1 -> drops
            (3, "alpha\nbeta"),             # everything seen -> empty
            (4, ""),                        # no spans at all
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in span_dedup(docs, delimiter="\n").collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["text_deduped"] == "alpha\nbeta" and out[1]["n_kept"] == 2
    assert out[1]["n_spans"] == 3
    assert out[2]["text_deduped"] == "gamma" and out[2]["n_kept"] == 1
    assert out[3]["text_deduped"] == "" and out[3]["n_kept"] == 0 and out[3]["n_spans"] == 2
    assert out[4]["text_deduped"] == "" and out[4]["n_spans"] == 0


def test_span_dedup_block_mode_covers_all_tokens(spark):
    """Block mode: non-overlapping k-token spans tile the doc (last block
    may be short); a unique doc keeps everything verbatim."""
    from patternly_spark.operators.dedup import span_dedup

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c x y z")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in span_dedup(docs, block_tokens=3).collect()}
    assert out[1]["text_deduped"] == "a b c d e f g"
    assert out[1]["n_spans"] == 3  # 'a b c', 'd e f', 'g'
    # doc 2 loses its first block ('a b c', first seen in doc 1)
    assert out[2]["text_deduped"] == "x y z"
    assert out[2]["n_kept"] == 1 and out[2]["n_spans"] == 2


def test_boilerplate_removal_drops_all_occurrences(spark):
    """Corpus-frequency boilerplate: a line whose DOCUMENT frequency
    exceeds max_doc_freq drops from every doc, including the first one
    (the semantic difference vs keep-first span_dedup); intra-doc
    repeats count once toward the frequency; infrequent repeats stay."""
    from patternly_spark.operators.dedup import boilerplate_removal

    docs = spark.createDataFrame(
        [
            (1, "nav\nnav\ncontent one"),   # 'nav' twice here counts ONCE
            (2, "nav\ncontent two"),
            (3, "nav\ncontent three"),      # doc_freq('nav') = 3 > 2 -> gone
            (4, "rare\ncontent four"),
            (5, "rare\ncontent five"),      # doc_freq('rare') = 2 <= 2 -> stays
            (6, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate_removal(docs, delimiter="\n", max_doc_freq=2).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5, 6}
    assert out[1]["text_clean"] == "content one" and out[1]["n_spans"] == 3
    assert out[1]["n_kept"] == 1
    assert out[2]["text_clean"] == "content two"
    assert out[3]["text_clean"] == "content three"
    assert out[4]["text_clean"] == "rare\ncontent four" and out[4]["n_kept"] == 2
    assert out[5]["text_clean"] == "rare\ncontent five"
    assert out[6]["text_clean"] == "" and out[6]["n_spans"] == 0


def test_boilerplate_removal_broadcasts_hot_set(spark):
    """The over-threshold vocabulary joins back as a broadcast (the flag
    join must not shuffle the full line relation twice)."""
    from patternly_spark.operators.dedup import boilerplate_removal

    docs = spark.createDataFrame(
        [(i, "nav\nbody %d" % i) for i in range(8)],
        "doc_id long, text string",
    )
    from patternly_spark.plans import assert_plan

    out = boilerplate_removal(docs, delimiter="\n", max_doc_freq=2)
    assert_plan(out, no_python=True, require_broadcast_join=True)


def test_minhash_calibration_extremes_and_exactness(spark):
    """Identical adjacent docs land in the top bin with mean_est =
    mean_exact = 1.0; disjoint adjacent docs land in bin 0 with
    mean_exact = 0.0.  A mixed pair's mean_exact equals the 2^-20
    dyadic quantization of its true Jaccard (the cross-engine-exact
    aggregation contract)."""
    import math

    from patternly_spark.operators.dedup import minhash_calibration

    docs = spark.createDataFrame(
        [
            (0, "a b c d"), (1, "a b c d"),          # identical pair
            (10, "p q r s"), (11, "w x y z"),        # disjoint pair
            (20, "m n o p q"), (21, "m n zz ww vv"), # jaccard = 2/8
        ],
        "doc_id long, text string",
    )
    rows = {r["bin"]: r for r in minhash_calibration(docs, num_hashes=8, n_bins=8).collect()}
    assert rows[7]["n_pairs"] == 1 and rows[7]["mean_est"] == 1.0
    assert rows[7]["mean_exact"] == 1.0
    low_bins = [b for b in rows if b < 7]
    assert sum(rows[b]["n_pairs"] for b in low_bins) == 2
    # the disjoint pair contributes exact 0; the 2/8 pair contributes its
    # dyadic-quantized jaccard — the weighted sum matches plain Python
    expected = 0.0 + math.floor((2 / 8) * (1 << 20)) / (1 << 20)
    total_exact = sum(rows[b]["mean_exact"] * rows[b]["n_pairs"] for b in low_bins)
    assert abs(total_exact - expected) < 1e-12


def test_topk_recall_perfect_partial_and_starved(spark):
    """recall = |common| / |exact| per query; a query the approximate
    index returned nothing for still appears with recall 0 (candidate
    starvation is the failure the metric exists to expose)."""
    from patternly_spark.operators.similarity import topk_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21), (3, 30)],
        "query_id long, neighbor_id long",
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 99)],
        "query_id long, neighbor_id long",
    )
    out = {r["query_id"]: r for r in topk_recall(exact, approx).collect()}
    assert out[1]["recall"] == 1.0 and out[1]["n_common"] == 2
    assert out[2]["recall"] == 0.5 and out[2]["n_approx"] == 2
    assert out[3]["recall"] == 0.0 and out[3]["n_approx"] == 0  # starved


def test_containment_pairs_detects_inclusion(spark):
    """A short doc quoted verbatim inside a longer doc: containment of
    the short one approaches 1 while the long one's stays well below —
    the asymmetry symmetric Jaccard misses."""
    from patternly_spark.functions.text import containment_pairs

    inner = "the quick brown fox jumps over the lazy dog again and again today"
    outer = (
        "unrelated preamble words here padding the front matter considerably "
        + inner
        + " and a long trailing section of other content follows with many extra words"
    )
    docs = spark.createDataFrame(
        [(1, inner), (2, outer), (3, "completely different content about spark plans")],
        "doc_id long, text string",
    )
    rows = containment_pairs(docs, kgram=5, window=4).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in rows}
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    assert r["containment_a_in_b"] >= 0.8          # inner mostly inside outer
    assert r["containment_b_in_a"] < r["containment_a_in_b"]
    assert all(3 not in p for p in pairs)


def test_intradoc_span_dedup_zero_shuffle(spark):
    """In-doc repeats drop, first occurrences stay, cross-doc repeats are
    untouched; and the plan contains no Exchange (pure projection)."""
    from patternly_spark.operators.dedup import intradoc_span_dedup

    docs = spark.createDataFrame(
        [(1, "menu\nbody one\nmenu\nbody two\nmenu"), (2, "menu\nother")],
        "doc_id long, text string",
    )
    out = intradoc_span_dedup(docs, delimiter="\n")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["text_deduped"] == "menu\nbody one\nbody two"
    assert rows[1]["n_spans"] == 5 and rows[1]["n_kept"] == 3
    assert rows[2]["text_deduped"] == "menu\nother"  # cross-doc repeat kept
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pq_encode_codes_shape(emb):
    from patternly_spark.operators.similarity import pq_encode, train_pq_codebooks

    cb = train_pq_codebooks(emb, m=8, n_codes=16)
    assert cb.shape == (8, 16, 2)
    codes = pq_encode(emb, cb).toPandas().sort_values("vec_id")
    assert len(codes) == 60
    assert all(len(c) == 8 for c in codes.codes)
    assert all(0 <= v < 16 for c in codes.codes for v in c)
    # deterministic re-encode
    codes2 = pq_encode(emb, cb).toPandas().sort_values("vec_id")
    assert [list(c) for c in codes.codes] == [list(c) for c in codes2.codes]


def test_pq_topk_recall_vs_exact_l2(emb):
    from patternly_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    X = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()], dtype=np.float64
    )
    cb = train_pq_codebooks(emb, m=8, n_codes=16)
    codes = pq_encode(emb, cb)
    approx = pq_topk(codes, emb.filter(F.col("vec_id") < 10), cb, k=3).toPandas()
    hits = 0
    for q in range(10):
        d2 = ((X - X[q]) ** 2).sum(1)
        d2[q] = np.inf
        exact_nn = int(d2.argmin())
        got = approx[approx.query_id == q].neighbor_id.tolist()
        assert len(got) == 3
        hits += int(exact_nn in got)
    assert hits >= 7, hits


def test_pq_finds_planted_near_dup(emb):
    from patternly_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    cb = train_pq_codebooks(emb, m=8, n_codes=16)
    codes = pq_encode(emb, cb)
    out = pq_topk(codes, emb.filter(F.col("vec_id") == 3), cb, k=1).toPandas()
    assert out.neighbor_id.tolist() == [50]


def test_exactsubstr_spans_planted_duplicate(spark):
    from patternly_spark.operators.dedup import exact_substring_spans

    # doc 0 and doc 1 share a 12-token run; everything else is unique
    shared = " ".join(f"s{i}" for i in range(12))
    a = "a0 a1 a2 " + shared + " a3 a4"
    b = "b0 " + shared + " b1 b2 b3"
    c = "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9"
    docs = spark.createDataFrame([(0, a), (1, b), (2, c)], "doc_id long, text string")
    spans = exact_substring_spans(docs, min_tokens=8).collect()
    # keep-first: doc 0 (first occurrence) keeps its copy; only doc 1 marked
    assert len(spans) == 1
    (r,) = spans
    # shared run sits at token positions 1..12 in doc 1
    assert (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"]) == (1, 1, 13, 12)


def test_exactsubstr_spans_islands_merge_overlaps(spark):
    from patternly_spark.operators.dedup import exact_substring_spans

    # two duplicated 8-gram regions in one doc separated by unique tokens:
    # two distinct maximal spans, not one merged blob
    r1 = " ".join(f"x{i}" for i in range(8))
    r2 = " ".join(f"y{i}" for i in range(8))
    src = r1 + " " + r2  # doc 0 holds the first occurrences contiguously
    tgt = r1 + " gap0 gap1 gap2 " + r2
    docs = spark.createDataFrame([(0, src), (1, tgt)], "doc_id long, text string")
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in exact_substring_spans(docs, min_tokens=8).collect()
    }
    assert spans == {(1, 0, 8), (1, 11, 19)}


def test_exactsubstr_dedup_removes_only_covered_tokens(spark):
    from patternly_spark.operators.dedup import exact_substring_dedup

    shared = " ".join(f"s{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(0, "a0 " + shared + " a1"), (1, "b0 b1 " + shared), (2, "c0 c1 c2")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in exact_substring_dedup(docs, min_tokens=8).collect()}
    assert out[0]["n_removed"] == 0  # first occurrence survives intact
    assert out[1]["n_removed"] == 10
    assert out[1]["text_deduped"] == "b0 b1"
    assert out[2]["n_removed"] == 0 and out[2]["text_deduped"] == "c0 c1 c2"
    assert out[1]["n_tokens"] == 12


def test_mad_outliers_fences(spark):
    from patternly_spark.operators.normalize import mad_outliers

    # group a: median 5, MAD 1; 100.0 is the only point beyond 3*MAD
    vals = [3.0, 4.0, 5.0, 6.0, 7.0, 100.0]
    df = spark.createDataFrame([("a", v) for v in vals], "k string, v double")
    out = {r["v"]: r for r in mad_outliers(df, "v", by="k", k=3.0).collect()}
    assert out[100.0]["is_outlier"] and not out[7.0]["is_outlier"]
    assert out[5.0]["med"] == 5.5 and out[5.0]["mad"] == 1.5


def test_edit_distance_pairs_levenshtein(spark):
    from patternly_spark.operators.dedup import edit_distance_pairs

    docs = spark.createDataFrame(
        [(1, "kitten"), (2, "sitting"), (3, ""), (4, "")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "doc_a long, doc_b long")
    out = {(r["doc_a"], r["doc_b"]): r for r in edit_distance_pairs(docs, pairs).collect()}
    assert out[(1, 2)]["lev"] == 3
    assert abs(out[(1, 2)]["sim"] - (1 - 3 / 7)) < 1e-12
    assert out[(3, 4)]["lev"] == 0 and out[(3, 4)]["sim"] == 1.0


def test_ivf_pq_topk_recall_and_planted(emb):
    """IVF-PQ: residual-coded scan restricted to probed cells must still
    find the exact-L2 nearest neighbor for most queries and the planted
    near-dup with high probes."""
    from patternly_spark.operators.similarity import ivf_pq_topk

    X = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()], dtype=np.float64
    )
    out = ivf_pq_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=3,
        n_lists=4, n_probe=3, m=8, n_codes=16,
    ).toPandas()
    hits = 0
    for q in range(10):
        d2 = ((X - X[q]) ** 2).sum(1)
        d2[q] = np.inf
        got = out[out.query_id == q].neighbor_id.tolist()
        assert len(got) <= 3
        hits += int(int(d2.argmin()) in got)
    assert hits >= 7, hits

    planted = ivf_pq_topk(
        emb, emb.filter(F.col("vec_id") == 3), k=1,
        n_lists=4, n_probe=4, m=8, n_codes=16,
    ).toPandas()
    assert planted.neighbor_id.tolist() == [50]


def test_ivf_pq_deterministic_across_partitionings(emb):
    from patternly_spark.operators.similarity import ivf_pq_topk

    q = emb.filter(F.col("vec_id") < 5)
    a = ivf_pq_topk(emb.repartition(1), q, k=3, n_lists=4, n_probe=2).toPandas()
    b = ivf_pq_topk(emb.repartition(13), q, k=3, n_lists=4, n_probe=2).toPandas()
    key = ["query_id", "rank"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )


def test_pq_default_bits_recall_on_testdata(spark):
    """Regression guard for the DEFAULT codebook width: on the
    near-uniform sf0.01 testdata embeddings (nearest neighbor barely
    closer than the median pair), 4-bit PQ collapses to ~0 rank-1
    recall; the 8-bit default must keep it usable for both the flat and
    IVF-restricted scans."""
    from patternly_spark.operators.similarity import (
        ivf_pq_topk,
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    X = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()], dtype=np.float64
    )
    q = emb.filter(F.col("vec_id") < 10)

    def recall(df):
        h = 0
        for i in range(10):
            d2 = ((X - X[i]) ** 2).sum(1)
            d2[i] = np.inf
            h += int(int(d2.argmin()) in df[df.query_id == i].neighbor_id.tolist())
        return h

    cb = train_pq_codebooks(emb)  # default 8-bit
    assert recall(pq_topk(pq_encode(emb, cb), q, cb, k=3).toPandas()) >= 6
    assert recall(ivf_pq_topk(emb, q, k=3, n_lists=8, n_probe=3).toPandas()) >= 5


def test_pair_set_agreement_counts_and_edges(spark):
    from patternly_spark.operators.dedup import pair_set_agreement

    A = spark.createDataFrame([(1, 2), (3, 4), (5, 6)], "doc_a long, doc_b long")
    # reversed order + duplicate rows must normalize away
    B = spark.createDataFrame([(2, 1), (1, 2), (4, 3), (7, 8)], "doc_a long, doc_b long")
    C = spark.createDataFrame([], "doc_a long, doc_b long")
    out = {
        (r.method_a, r.method_b): r
        for r in pair_set_agreement({"a": A, "b": B, "c": C}).collect()
    }
    ab = out[("a", "b")]
    assert (ab.n_a, ab.n_b, ab.n_common) == (3, 3, 2)
    assert ab.overlap_jaccard == pytest.approx(2 / 4)
    ac = out[("a", "c")]
    assert (ac.n_a, ac.n_b, ac.n_common) == (3, 0, 0) and ac.overlap_jaccard == 0.0
    assert len(out) == 3  # unordered method pairs only


def test_set_similarity_join_complete_vs_bruteforce(spark):
    import itertools

    from patternly_spark.operators.dedup import set_similarity_join

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g x"),      # high overlap with 1
            (3, "a b c d q r s t"),      # partial overlap
            (4, "z y x w v u t s"),      # disjoint-ish
            (5, "a b c d e f g h"),      # exact duplicate of 1
            (6, "m"),                    # short-text fallback shingle
        ],
        "doc_id long, text string",
    )
    out = {(r.doc_a, r.doc_b): r.jaccard for r in set_similarity_join(docs, threshold=0.4).collect()}

    def sh3(text):
        t = text.split()
        return (
            set(" ".join(t[i : i + 3]) for i in range(len(t) - 2))
            if len(t) >= 3
            else {" ".join(t)}
        )

    sets = {i: sh3(t) for i, t in [(1, "a b c d e f g h"), (2, "a b c d e f g x"),
                                   (3, "a b c d q r s t"), (4, "z y x w v u t s"),
                                   (5, "a b c d e f g h"), (6, "m")]}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        if j >= 0.4:
            want[(a, b)] = j
    assert set(out) == set(want)        # completeness AND no false positives
    for k in out:
        assert out[k] == pytest.approx(want[k], abs=1e-12)
    assert out[(1, 5)] == 1.0           # exact duplicate found at jaccard 1


def test_sorted_neighborhood_pairs_blocks_and_verify(spark):
    from patternly_spark.operators.dedup import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(1, "alpha-001"), (2, "alpha-002"), (3, "alpha-950"), (4, "beta-001"), (5, "beta-002")],
        "doc_id long, k string",
    )
    # window 2: only adjacent-in-sort pairs
    out = {(r.id_a, r.id_b) for r in sorted_neighborhood_pairs(df, "k", id_col="doc_id", window=2).collect()}
    assert out == {(1, 2), (2, 3), (3, 4), (4, 5)}
    # levenshtein verify drops the cross-family and far pairs
    ver = {(r.id_a, r.id_b): r.dist for r in sorted_neighborhood_pairs(
        df, "k", id_col="doc_id", window=2, max_dist=2
    ).collect()}
    assert set(ver) == {(1, 2), (4, 5)}  # -002/-950 is dist 3; cross-family worse
    # prefix blocking never pairs across blocks
    blk = {(r.id_a, r.id_b) for r in sorted_neighborhood_pairs(
        df, "k", id_col="doc_id", window=3, prefix_block=4
    ).collect()}
    assert (3, 4) not in blk and (1, 2) in blk and (4, 5) in blk


# ---------------------------------------------------------------------------
# cosine_allpairs_join (exact dense-vector all-pairs; the q162 metric twin)
# ---------------------------------------------------------------------------


def _quantized_cosine_matrix(X):
    """The operator's exact similarity in closed numpy form: absmax int8
    codes, integer dot / (sqrt . sqrt) — q135's engine-portable cosine."""
    X = np.asarray(X, dtype=np.float64)
    amax = np.abs(X).max(axis=1)
    scale = np.where(amax / 127.0 > 0.0, amax / 127.0, 1.0)
    C = np.floor(X / scale[:, None] + 0.5)
    n2 = (C * C).sum(axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        # sqrt each norm BEFORE the outer product — the operator's (and
        # the DuckDB oracle's, and mutual_knn's) exact IEEE expression;
        # sqrt(a*b) differs in the last ulp and flips borderline pairs
        S = (C @ C.T) / np.outer(np.sqrt(n2), np.sqrt(n2))
    return S, n2


def _brute_pairs(X, t):
    S, n2 = _quantized_cosine_matrix(X)
    n = len(X)
    return {
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if n2[i] > 0 and n2[j] > 0 and S[i, j] >= t
    }


@pytest.mark.parametrize(
    "threshold,block_dims,home_splits",
    [(0.9, 2, 8), (0.9, 3, 1), (0.5, 1, 4), (0.99, 2, 2)],
)
def test_cosine_allpairs_complete_vs_bruteforce(spark, threshold, block_dims, home_splits):
    """Planted near-duplicate clusters + isotropic noise + a zero vector:
    the blocked plan must return EXACTLY the brute-force pair set (completeness
    AND precision), at several blocking granularities and skew splits."""
    from patternly_spark.operators.similarity_allpairs import cosine_allpairs_join

    rng = np.random.default_rng(7)
    vecs = []
    for c in rng.normal(size=(12, 16)):            # planted clusters
        for _ in range(6):
            vecs.append(c + rng.normal(scale=0.02, size=16))
    for _ in range(60):                            # isotropic background
        vecs.append(rng.normal(size=16))
    vecs.append(np.zeros(16))                      # undefined cosine: excluded
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    res = cosine_allpairs_join(
        df,
        threshold=threshold,
        block_dims=block_dims,
        home_splits=home_splits,
        round_digits=None,
    ).collect()
    got = {(r.id_a, r.id_b): r.qcosine for r in res}

    X = np.array([r[1] for r in rows])
    want = _brute_pairs(X, threshold)
    assert set(got) == want
    # values are the exact closed-form quantized cosine (float64 GEMM over
    # int8 codes is integer-exact, so == not approx)
    S, _ = _quantized_cosine_matrix(X)
    for (i, j), v in got.items():
        assert v == S[i, j]
    zero_id = len(vecs) - 1
    assert all(zero_id not in p for p in got)


def test_cosine_allpairs_pair_emitted_exactly_once(spark):
    """Duplicate vectors in the same cell: the probe/home role split must
    emit each unordered pair once (no distinct in the plan to mask a
    double-count)."""
    from patternly_spark.operators.similarity_allpairs import cosine_allpairs_join

    v = [1.0, 2.0, 3.0, 4.0]
    df = spark.createDataFrame(
        [(i, v) for i in range(5)], "vec_id long, embedding array<double>"
    )
    res = cosine_allpairs_join(df, threshold=0.9, home_splits=3).collect()
    pairs = [(r.id_a, r.id_b) for r in res]
    assert sorted(pairs) == [(i, j) for i in range(5) for j in range(i + 1, 5)]
    assert all(r.qcosine == 1.0 for r in res)


def test_cosine_allpairs_threshold_validation(spark):
    from patternly_spark.operators.similarity_allpairs import cosine_allpairs_join

    df = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        cosine_allpairs_join(df, threshold=1.5)
    with pytest.raises(ValueError):
        cosine_allpairs_join(df, threshold=0.5, block_dims=0)


def test_tfidf_cosine_allpairs_complete_vs_bruteforce(spark):
    """Planted near-dup texts + distinct background, brute-force parity
    with the exact integer-weight formula — set equality AND value
    equality (the weights are integers, so == not approx)."""
    import collections
    import itertools
    import math

    from patternly_spark.operators.similarity_allpairs import tfidf_cosine_allpairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "the quick brown fox leaps over a lazy dog"),
        (4, "completely different content about spark engines"),
        (5, "the quick brown fox jumps over the lazy dog"),
        (6, "spark engines process content fast and different"),
        (7, ""),                      # empty: excluded
        (8, "dog dog dog dog"),       # single-term vector
        (9, "unique singleton terms nowhere else zebra quagga"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def brute(t):
        N = len(rows)
        toks = {i: collections.Counter(txt.split()) for i, txt in rows}
        dfreq = collections.Counter()
        for c in toks.values():
            for term in c:
                dfreq[term] += 1
        W = {}
        for i, c in toks.items():
            wi = {
                term: tf * math.floor(math.log((N + 1) / (dfreq[term] + 1)) * 65536.0)
                for term, tf in c.items()
            }
            W[i] = {k: v for k, v in wi.items() if v > 0}
        out = {}
        for a, b in itertools.combinations(sorted(W), 2):
            wa, wb = W[a], W[b]
            if not wa or not wb:
                continue
            dot = sum(wa[k] * wb[k] for k in wa.keys() & wb.keys())
            cos = dot / (
                math.sqrt(float(sum(v * v for v in wa.values())))
                * math.sqrt(float(sum(v * v for v in wb.values())))
            )
            if cos >= t:
                out[(a, b)] = cos
        return out

    for t in [0.3, 0.5, 0.8, 0.95]:
        got = {
            (r.doc_a, r.doc_b): r.cosine
            for r in tfidf_cosine_allpairs(df, threshold=t, round_digits=None).collect()
        }
        want = brute(t)
        assert set(got) == set(want), f"t={t}"
        for k in got:
            assert got[k] == want[k], f"t={t} {k}"
    # exact duplicates score exactly 1.0 and survive any threshold
    top = {
        (r.doc_a, r.doc_b): r.cosine
        for r in tfidf_cosine_allpairs(df, threshold=0.999, round_digits=None).collect()
    }
    assert top == {(1, 5): 1.0}


def test_tfidf_cosine_allpairs_threshold_validation(spark):
    from patternly_spark.operators.similarity_allpairs import tfidf_cosine_allpairs

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        tfidf_cosine_allpairs(df, threshold=0.0)
    with pytest.raises(ValueError):
        tfidf_cosine_allpairs(df, threshold=1.5)


def test_duplicate_spans_exact_semantics(spark):
    """Maximal repeated-span detection: cross-doc shares, exact dups,
    within-doc repeats, too-short docs, and correct interval merging of
    overlapping flagged grams."""
    from patternly_spark.operators.dedup import duplicate_spans

    rows = [
        (1, "a b c d e f g h i j"),   # shares c..g run with 2; full dup of 4
        (2, "x y c d e f g z w v"),
        (3, "p q r s t u v w"),       # unique: no spans
        (4, "a b c d e f g h i j"),   # exact duplicate of 1
        (5, "m m m m m m"),           # within-doc repeated 4-gram
        (6, "one two"),               # shorter than ngram: no grams
    ]
    res = {
        (r.doc_id, r.span_start, r.span_end): r.span_tokens
        for r in duplicate_spans(
            spark.createDataFrame(rows, "doc_id long, text string"), ngram=4
        ).collect()
    }
    assert res == {
        (1, 0, 9): 10,   # whole doc (dup of 4)
        (4, 0, 9): 10,
        (2, 2, 6): 5,    # "c d e f g": grams at pos 2 and 3 merged
        (5, 0, 5): 6,    # "m m m m" x3 internally -> full doc
    }


def test_duplicate_spans_disjoint_islands_stay_separate(spark):
    from patternly_spark.operators.dedup import duplicate_spans

    # two repeated 3-gram regions separated by unique middles
    rows = [
        (1, "a b c u1 u2 u3 x y z"),
        (2, "a b c v1 v2 v3 x y z"),
    ]
    res = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(
            spark.createDataFrame(rows, "doc_id long, text string"), ngram=3
        ).collect()
    )
    assert res == [(1, 0, 2), (1, 6, 8), (2, 0, 2), (2, 6, 8)]


def test_duplicate_spans_min_repeats_threshold(spark):
    from patternly_spark.operators.dedup import duplicate_spans

    rows = [(1, "a b c d"), (2, "a b c e"), (3, "a b c f")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # "a b c" occurs 3x: passes min_repeats=3; "b c d" etc occur once
    r3 = duplicate_spans(df, ngram=3, min_repeats=3).collect()
    assert sorted((r.doc_id, r.span_start, r.span_end) for r in r3) == [
        (1, 0, 2), (2, 0, 2), (3, 0, 2)
    ]
    r4 = duplicate_spans(df, ngram=3, min_repeats=4).collect()
    assert r4 == []


def test_new_allpairs_operators_handle_empty_input(spark):
    """Zero-row inputs produce zero-row outputs with the right schema —
    the edge a driver hits on an empty partition/filter."""
    from patternly_spark.operators.dedup import duplicate_spans, set_similarity_join
    from patternly_spark.operators.similarity_allpairs import (
        cosine_allpairs_join,
        tfidf_cosine_allpairs,
    )

    docs = spark.createDataFrame([], "doc_id long, text string")
    vecs = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert set_similarity_join(docs, threshold=0.5).count() == 0
    assert duplicate_spans(docs, ngram=4).count() == 0
    assert tfidf_cosine_allpairs(docs, threshold=0.5).count() == 0
    out = cosine_allpairs_join(vecs, threshold=0.5)
    assert out.count() == 0
    assert [f.name for f in out.schema] == ["id_a", "id_b", "qcosine"]


def test_affix_overlap_join_planted_stitch(spark):
    """Ordered stitch recovery: tail(A)==head(B) yields exactly (A, B),
    never the reverse; short docs and self-pairs are excluded; a cyclic
    pair appears in both directions."""
    from patternly_spark.operators.dedup import affix_overlap_join

    mid = "m1 m2 m3 m4"
    a = "a1 a2 a3 " + mid              # tail-4 == mid
    b = mid + " b1 b2 b3"              # head-4 == mid
    short = "s1 s2"                    # < k tokens: contributes nothing
    cyc1 = "x1 x2 x3 x4 y1 y2 y3 y4"   # tail-4 = y*, head-4 = x*
    cyc2 = "y1 y2 y3 y4 x1 x2 x3 x4"   # tail-4 = x*, head-4 = y*
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, short), (4, cyc1), (5, cyc2)],
        "doc_id long, text string",
    )
    got = {(r.doc_a, r.doc_b): r.affix for r in affix_overlap_join(docs, k=4).collect()}
    assert got == {
        (1, 2): mid,
        (4, 5): "y1 y2 y3 y4",
        (5, 4): "x1 x2 x3 x4",
    }


def test_affix_overlap_join_excludes_self_loop(spark):
    """A doc whose own head equals its tail must not pair with itself."""
    from patternly_spark.operators.dedup import affix_overlap_join

    docs = spark.createDataFrame(
        [(1, "p q p q p q p q")], "doc_id long, text string"
    )
    assert affix_overlap_join(docs, k=2).count() == 0


def test_set_containment_join_finds_doc_inside_doc(spark):
    from patternly_spark.operators.dedup import set_containment_join

    inner = "alpha beta gamma delta epsilon zeta"
    outer = (
        "prologue text here and more filler words now "
        + inner
        + " trailing content goes on and on with extra tokens"
    )
    other = "completely different content about other topics entirely here"
    docs = spark.createDataFrame(
        [(1, inner), (2, outer), (3, other)], "doc_id long, text string"
    )
    got = {
        (r["inner_doc"], r["outer_doc"]): r
        for r in set_containment_join(docs, threshold=0.8).collect()
    }
    assert (1, 2) in got
    r = got[(1, 2)]
    assert r["containment"] == 1.0  # every inner 3-shingle appears in outer
    assert (2, 1) not in got  # asymmetric: big doc not contained in small
    assert all(k[0] != 3 and k[1] != 3 for k in got)


def test_set_containment_join_complete_vs_bruteforce(spark):
    from patternly_spark.operators.dedup import set_containment_join

    # small vocab forces overlaps; verify completeness AND precision
    words = ["w%d" % i for i in range(12)]
    docs = []
    for d in range(30):
        toks = [words[(d * 7 + i * (1 + d % 3)) % 12] for i in range(4 + d % 5)]
        docs.append((d, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    t = 0.6
    got = {
        (r["inner_doc"], r["outer_doc"]): r["containment"]
        for r in set_containment_join(df, threshold=t).collect()
    }

    def sh3(text):
        toks = text.split()
        if len(toks) >= 3:
            return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        return {text}

    want = {}
    sets = {d: sh3(t_) for d, t_ in docs}
    for a in sets:
        for b in sets:
            if a != b:
                c = len(sets[a] & sets[b]) / len(sets[a])
                if c >= t:
                    want[(a, b)] = c
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_remove_duplicate_spans_composition_law(spark):
    from patternly_spark.operators.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )

    chorus = " ".join(f"c{i}" for i in range(6))
    docs = [
        (1, "intro one two three " + chorus + " outro alpha beta"),
        (2, "different opening here " + chorus + " closing words now"),
        (3, "totally unique content with no repeats at all here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cleaned = {r["doc_id"]: r for r in remove_duplicate_spans(
        df, ngram=4, min_repeats=2
    ).collect()}
    spans = duplicate_spans(df, ngram=4, min_repeats=2).collect()
    covered = {}
    for r in spans:
        covered.setdefault(r["doc_id"], set()).update(
            range(r["span_start"], r["span_end"] + 1)
        )
    for d, text in docs:
        toks = text.split()
        keep = [w for i, w in enumerate(toks) if i not in covered.get(d, set())]
        assert cleaned[d]["text"] == " ".join(keep), d
        assert cleaned[d]["n_tokens_before"] == len(toks)
        assert cleaned[d]["n_tokens_removed"] == len(toks) - len(keep)
    # the chorus is gone from both carriers; untouched doc passes through
    assert "c0" not in cleaned[1]["text"] and "c5" not in cleaned[2]["text"]
    assert cleaned[3]["text"] == docs[2][1]
    assert cleaned[3]["n_tokens_removed"] == 0
    # re-detection on the cleaned corpus finds nothing
    re_spans = duplicate_spans(
        spark.createDataFrame(
            [(k, v["text"]) for k, v in cleaned.items()],
            "doc_id long, text string",
        ),
        ngram=4, min_repeats=2,
    ).collect()
    assert re_spans == []
