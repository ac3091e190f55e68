"""BM25 / TF-IDF retrieval operator semantics."""

import math

import pytest
from pyspark.sql import functions as F

from patternly_spark.operators.retrieval import (
    bm25_retrieve,
    bm25_scores,
    corpus_stats,
    tfidf_scores,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark spark spark join"),          # high tf for 'spark'
        (1, "spark join"),                      # short, one hit each
        (2, "join join hash hash hash filter"),  # no 'spark'
        (3, "filter scan sort merge window group agg"),  # no query terms
        (4, "spark " + "pad " * 50),            # long doc: length-penalized
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_corpus_stats(spark, corpus):
    st = corpus_stats(corpus, ["spark", "join", "zzz"])
    assert st["n"] == 5
    assert st["df"] == {"spark": 3, "join": 3, "zzz": 0}
    assert st["total_dl"] == 4 + 2 + 6 + 7 + 51


def test_bm25_scores_and_ordering(spark, corpus):
    out = {r["doc_id"]: r["bm25"] for r in bm25_scores(corpus, ["spark"]).collect()}
    # only docs containing 'spark'
    assert set(out) == {0, 1, 4}
    # higher tf beats lower tf at comparable length
    assert out[0] > out[1]
    # long doc with single hit scores below the short single-hit doc
    assert out[4] < out[1]
    # all scores positive (non-negative idf form)
    assert all(v > 0 for v in out.values())


def test_bm25_retrieve_topk(spark, corpus):
    top = bm25_retrieve(corpus, ["spark", "join"], k=2).collect()
    assert [r["rank"] for r in top] == [1, 2]
    assert top[0]["bm25"] >= top[1]["bm25"]


def test_bm25_accepts_precomputed_stats(spark, corpus):
    terms = ["spark", "join"]
    st = corpus_stats(corpus, terms)
    a = sorted(map(tuple, bm25_scores(corpus, terms).collect()))
    b = sorted(map(tuple, bm25_scores(corpus, terms, stats=st).collect()))
    assert a == b


def test_idf_quantization_close_to_exact(spark, corpus):
    terms = ["spark", "join"]
    exact = {r["doc_id"]: r["bm25"] for r in bm25_scores(corpus, terms).collect()}
    quant = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(corpus, terms, idf_quantize_bits=20).collect()
    }
    for d in exact:
        assert math.isclose(exact[d], quant[d], rel_tol=1e-5)


def test_tfidf_matches_closed_form(spark, corpus):
    st = corpus_stats(corpus, ["spark"])
    idf = math.log(st["n"] / st["df"]["spark"])
    out = {r["doc_id"]: r["tfidf"] for r in tfidf_scores(corpus, ["spark"]).collect()}
    assert out == {0: 3 * idf, 1: 1 * idf, 4: 1 * idf}


def test_empty_terms_raise(spark, corpus):
    with pytest.raises(ValueError):
        bm25_scores(corpus, [])
    with pytest.raises(ValueError):
        tfidf_scores(corpus, [])


def test_bm25_plan_has_no_explode_or_python(spark, corpus):
    # scoring is a single filter+project pass: no Generate (explode), no
    # Python evaluation, no join/exchange beyond the stats collect
    out = bm25_scores(corpus, ["spark"], stats=corpus_stats(corpus, ["spark"]))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan
    assert "Python" not in plan
    assert "Exchange" not in plan


def test_hash_embedding_closed_form(spark):
    import hashlib

    from patternly_spark.functions.text import shingle_hash
    from patternly_spark.functions.vectors import hash_embedding

    toks = ["alpha", "beta", "alpha"]
    df = spark.createDataFrame([(0, toks)], "id long, toks array<string>")
    out = (
        df.withColumn("h", F.transform("toks", shingle_hash))
        .select(hash_embedding(F.col("h"), 8).alias("emb"))
        .collect()[0]["emb"]
    )
    want = [0.0] * 8
    for t in toks:
        h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        for i in range(8):
            want[i] += ((h >> i) % 2) * 2 - 1
    assert out == want


def test_hash_embedding_norm_positive_for_odd_token_counts(spark):
    # each token contributes ±1 per dim, so an odd token count can never
    # sum to zero in any component -> norm > 0 guaranteed
    from patternly_spark.functions.text import shingle_hash
    from patternly_spark.functions.vectors import hash_embedding, norm

    df = spark.createDataFrame(
        [(i, [f"t{i}", f"u{i}", f"v{i}"]) for i in range(50)],
        "id long, toks array<string>",
    )
    rows = (
        df.withColumn("h", F.transform("toks", shingle_hash))
        .select(norm(hash_embedding(F.col("h"), 16)).alias("n"))
        .collect()
    )
    assert all(r["n"] > 0 for r in rows)


def test_collocations_closed_form(spark):
    import math

    from patternly_spark.operators.retrieval import collocations, pmi

    # "new york" 3x; "york new" 1x (from "york new york"); tokens: 12
    rows = [
        (0, "new york new york"),
        (1, "new york is big"),
        (2, "big is big win"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["a"], r["b"]): r for r in collocations(df, min_count=2).collect()}
    ny = out[("new", "york")]
    # counts: bigrams total = 3+3+3 = 9; tokens total = 12
    assert ny["n_ab"] == 3 and ny["n_a"] == 3 and ny["n_b"] == 3
    want_lift = (3 / 9) / ((3 / 12) * (3 / 12))
    assert ny["lift"] == want_lift
    # min_count filters the 1x pairs
    assert ("york", "new") not in out
    # pmi helper is ln(lift)
    got_pmi = (
        collocations(df, min_count=2)
        .select(pmi("lift").alias("p"), "a", "b")
        .filter("a = 'new'")
        .collect()[0]["p"]
    )
    assert abs(got_pmi - math.log(want_lift)) < 1e-12


def test_collocations_single_token_docs_ignored(spark):
    from patternly_spark.operators.retrieval import collocations

    df = spark.createDataFrame(
        [(0, "solo"), (1, "a b a b a b")], "doc_id long, text string"
    )
    out = collocations(df, min_count=1).collect()
    pairs = {(r["a"], r["b"]) for r in out}
    assert pairs == {("a", "b"), ("b", "a")}
    # 'solo' still counts toward the unigram total
    ab = next(r for r in out if (r["a"], r["b"]) == ("a", "b"))
    assert ab["n_a"] == 3 and ab["n_ab"] == 3


def test_rrf_fuse_scores_and_ranks(spark):
    from patternly_spark.operators.retrieval import rrf_fuse

    r1 = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank long")
    r2 = spark.createDataFrame([(3, 1), (4, 2)], "doc_id long, rank long")
    out = {r["doc_id"]: r for r in rrf_fuse([r1, r2], k=60.0).collect()}
    # doc 3: in both lists -> 1/63 + 1/61; doc 1 only r1 -> 1/61
    assert abs(out[3]["rrf_score"] - (1 / 63 + 1 / 61)) < 1e-15
    assert abs(out[1]["rrf_score"] - 1 / 61) < 1e-15
    assert abs(out[4]["rrf_score"] - 1 / 62) < 1e-15
    # doc 3 beats everything; tie between doc 1 (1/61) and nothing else
    assert out[3]["fused_rank"] == 1 and out[1]["fused_rank"] == 2
    # docs 2 and 4 tie at 1/62: the id tiebreak puts doc 2 first
    assert out[2]["fused_rank"] == 3 and out[4]["fused_rank"] == 4


def test_rrf_fuse_repeated_doc_counts_best_rank(spark):
    from patternly_spark.operators.retrieval import rrf_fuse

    r1 = spark.createDataFrame([(1, 5), (1, 2)], "doc_id long, rank long")
    (row,) = rrf_fuse([r1], k=60.0).collect()
    assert abs(row["rrf_score"] - 1 / 62) < 1e-15


def test_chi2_keywords_finds_group_marker(spark):
    from patternly_spark.operators.retrieval import chi2_keywords

    # 'marker' appears in every A doc and no B doc; 'common' everywhere
    rows = [(i, "A", "common marker filler%d" % i) for i in range(10)]
    rows += [(100 + i, "B", "common other filler%d" % i) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = chi2_keywords(df, top_k=2, min_df=2)
    top = {r["source"]: r["token"] for r in out.collect() if r["rank"] == 1}
    assert top["A"] == "marker" and top["B"] == "other"
    # 'common' (everywhere) never ranks above the group markers
    chi = {(r["source"], r["token"]): r["chi2"] for r in out.collect()}
    assert ("A", "common") not in chi


def test_positional_index_and_phrase_search(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox the quick brown"),
            (2, "quick brown quick brown quick"),
            (3, "nothing here"),
            (4, "a a a a"),
        ],
        "doc_id long, text string",
    )
    from patternly_spark.operators.retrieval import phrase_search, positional_index

    idx = positional_index(docs)
    assert idx.columns == ["term", "doc_id", "pos"]
    assert idx.filter("doc_id = 1 AND term = 'quick'").count() == 2

    out = {r.doc_id: r for r in phrase_search(docs, "quick brown").collect()}
    assert set(out) == {1, 2}
    assert out[1].n_matches == 2 and out[1].first_pos == 1
    assert out[2].n_matches == 2 and out[2].first_pos == 0

    # overlapping matches count individually (positional semantics)
    tri = {r.doc_id: r for r in phrase_search(docs, "a a a").collect()}
    assert tri[4].n_matches == 2 and tri[4].first_pos == 0

    # single-term phrase degenerates to postings counts
    one = {r.doc_id: r for r in phrase_search(docs, "quick").collect()}
    assert one[2].n_matches == 3

    # absent phrase -> empty result
    assert phrase_search(docs, "brown fox jumps").count() == 0

    # a prebuilt (persisted) index gives identical results
    via_idx = {r.doc_id: r for r in phrase_search(docs, "quick brown", index=idx).collect()}
    assert {k: (v.n_matches, v.first_pos) for k, v in via_idx.items()} == {
        k: (v.n_matches, v.first_pos) for k, v in out.items()
    }


def test_persisted_positional_index_prunes_and_matches(spark, tmp_path):
    from patternly_spark.operators.retrieval import (
        phrase_search,
        positional_index,
        read_positional_index,
        save_positional_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox the quick brown"),
            (2, "quick brown quick brown quick"),
            (3, "nothing here"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "pos_index")
    save_positional_index(positional_index(docs), path, n_term_buckets=16)

    rd = read_positional_index(spark, path, terms=["quick", "brown"], n_term_buckets=16)
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert (
        "PartitionFilters: [" in plan
        and "term_bucket" in plan.split("PartitionFilters")[1][:200]
    ), "term-bucket predicate must prune index partitions"

    direct = {r.doc_id: r for r in phrase_search(docs, "quick brown").collect()}
    via = {r.doc_id: r for r in phrase_search(docs, "quick brown", index=rd).collect()}
    assert {k: (v.n_matches, v.first_pos) for k, v in via.items()} == {
        k: (v.n_matches, v.first_pos) for k, v in direct.items()
    }


def test_fuzzy_key_join_complete_at_dist1(spark):
    from patternly_spark.operators.retrieval import deletion_variants, fuzzy_key_join

    left = spark.createDataFrame(
        [("table",), ("tble",), ("chai",), ("zzz",)], "k string"
    )
    right = spark.createDataFrame(
        [("table",), ("tables",), ("chair",), ("stable",)], "q string"
    )
    out = {(r.k, r.q): r.dist for r in fuzzy_key_join(left, right, left_key="k", right_key="q").collect()}
    # deletion (tables->table), insertion (chai->chair), substitution-free
    # exact (table->table), and the typo'd probe (tble->table)
    assert out[("table", "table")] == 0
    assert out[("table", "tables")] == 1
    assert out[("tble", "table")] == 1
    assert out[("chai", "chair")] == 1
    # distance-2 pairs excluded (table vs stable is dist 1 though: s+)
    assert ("zzz", "table") not in out
    assert out[("table", "stable")] == 1
    # same-name keys get a disambiguated right column
    same = fuzzy_key_join(left, left.withColumnRenamed("k", "k"), left_key="k", right_key="k")
    assert same.columns == ["k", "k_right", "dist"]
    # variants include the string itself and each single deletion
    v = left.filter("k = 'tble'").select(deletion_variants("k").alias("v")).collect()[0]["v"]
    assert set(v) == {"tble", "ble", "tle", "tbe", "tbl"}


def test_update_positional_index_upserts(spark, tmp_path):
    from patternly_spark.operators.retrieval import (
        phrase_search,
        positional_index,
        read_positional_index,
        save_positional_index,
        update_positional_index,
    )

    v1 = spark.createDataFrame(
        [(1, "old words here"), (2, "quick brown fox")], "doc_id long, text string"
    )
    path = str(tmp_path / "idx")
    save_positional_index(positional_index(v1), path, n_term_buckets=8)

    # doc 1 rewritten, doc 99 added
    changed = spark.createDataFrame(
        [(1, "quick brown now"), (99, "quick brown too")], "doc_id long, text string"
    )
    update_positional_index(spark, path, changed, n_term_buckets=8)

    idx = read_positional_index(spark, path, n_term_buckets=8)
    # old postings of doc 1 gone, new present
    assert idx.filter("doc_id = 1 AND term = 'old'").count() == 0
    assert idx.filter("doc_id = 1 AND term = 'quick'").count() == 1
    # untouched doc 2 intact; new doc 99 present
    assert idx.filter("doc_id = 2 AND term = 'fox'").count() == 1
    got = {
        r.doc_id
        for r in phrase_search(v1, "quick brown", index=idx).collect()
    }
    assert got == {1, 2, 99}
    # updating into a non-existent path bootstraps a fresh index
    p2 = str(tmp_path / "fresh")
    update_positional_index(spark, p2, changed, n_term_buckets=8)
    assert read_positional_index(spark, p2, n_term_buckets=8).count() > 0


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
    return d[n]


def test_fuzzy_key_join_complete_at_dist2_exhaustive(spark):
    """EVERY string over {a,b} up to length 4, self-joined at max_dist=2,
    must reproduce the brute-force Levenshtein<=2 pair set exactly —
    covers deletions, insertions, substitutions, and transpositions (a
    transposition is distance 2 in plain Levenshtein) in one sweep,
    including the empty string and length-1 edge cases of the depth-2
    neighborhood."""
    import itertools

    from patternly_spark.operators.retrieval import fuzzy_key_join

    strs = [""]
    for L in range(1, 5):
        strs += ["".join(p) for p in itertools.product("ab", repeat=L)]
    df = spark.createDataFrame([(s,) for s in strs], "k string")
    res = fuzzy_key_join(df, df, left_key="k", right_key="k", max_dist=2).collect()
    got = {(r["k"], r["k_right"]): r["dist"] for r in res}
    exp = {
        (a, b): _lev(a, b) for a in strs for b in strs if _lev(a, b) <= 2
    }
    assert got == exp


@pytest.mark.parametrize(
    "a,b,dist",
    [
        ("abcdefgh", "abXdefYh", 2),   # two substitutions
        ("abcdefgh", "Xabcdefgh", 1),  # one insertion
        ("abcdefgh", "XabcdefghY", 2), # two insertions
        ("abcdefgh", "abdcefgh", 2),   # transposition
        ("abcdefgh", "Xabcdefg", 2),   # shift (insert front, delete back)
        ("abcdefgh", "acdefg", 2),     # two deletions
    ],
)
def test_fuzzy_key_join_dist2_edit_types(spark, a, b, dist):
    from patternly_spark.operators.retrieval import fuzzy_key_join

    left = spark.createDataFrame([(a,)], "k string")
    right = spark.createDataFrame([(b,)], "q string")
    res = fuzzy_key_join(left, right, left_key="k", right_key="q", max_dist=2).collect()
    assert [(r["k"], r["q"], r["dist"]) for r in res] == [(a, b, dist)]


def test_fuzzy_key_join_radius_boundaries(spark):
    """max_dist >= 3 routes to PassJoin (no longer raises — the round-5
    upgrade); a non-positive radius is still rejected."""
    from patternly_spark.operators.retrieval import fuzzy_key_join

    df = spark.createDataFrame([("x",)], "k string")
    # routes to passjoin: self-match at distance 0 (self-pairs allowed
    # here — fuzzy join semantics keep the identical key)
    rows = fuzzy_key_join(df, df, left_key="k", right_key="k", max_dist=3).collect()
    assert [(r.k, r.k_right, r.dist) for r in rows] == [("x", "x", 0)]


def test_deletion_variants_depth2_counts(spark):
    """Fan-out algebra: 1 + L + L(L-1)/2 distinct variants for a string
    of L distinct characters; short strings degrade gracefully."""
    from patternly_spark.operators.retrieval import deletion_variants

    df = spark.createDataFrame(
        [("abcde",), ("ab",), ("a",), ("",)], "k string"
    )
    out = {
        r["k"]: sorted(r["v"])
        for r in df.select("k", deletion_variants("k", depth=2).alias("v")).collect()
    }
    assert len(out["abcde"]) == 1 + 5 + 10
    assert set(out["ab"]) == {"ab", "a", "b", ""}
    assert set(out["a"]) == {"a", ""}
    assert out[""] == [""]


def test_rbo_overlap_identity_disjoint_and_replay(spark):
    """Identical lists score the full truncated mass (~1 - p^k);
    disjoint lists score 0; random rankings match the per-match
    quantized python replay exactly."""
    import math
    import random

    from patternly_spark.operators.retrieval import rbo_overlap

    k, p, bits = 5, 0.8, 20
    scale = 2**bits
    wq = [
        math.floor(
            sum((1.0 - p) * p ** (d - 1) / d for d in range(m, k + 1)) * scale
        )
        for m in range(1, k + 1)
    ]

    ident = [(0, f"i{r}", r) for r in range(1, k + 1)]
    disj_a = [(1, f"a{r}", r) for r in range(1, k + 1)]
    disj_b = [(1, f"b{r}", r) for r in range(1, k + 1)]
    rng = random.Random(5)
    items = [f"x{j}" for j in range(8)]
    rand_a = [(2, it, r + 1) for r, it in enumerate(rng.sample(items, k))]
    rand_b = [(2, it, r + 1) for r, it in enumerate(rng.sample(items, k))]

    schema = "query_id long, item_id string, rank int"
    run_a = spark.createDataFrame(ident + disj_a + rand_a, schema)
    run_b = spark.createDataFrame(ident + disj_b + rand_b, schema)
    got = {
        r.query_id: (r.n_common, r.rbo)
        for r in rbo_overlap(run_a, run_b, k=k, p=p, quantize_bits=bits).collect()
    }
    # identity: every item matches at its own rank -> full mass
    full = sum(wq[r - 1] for r in range(1, k + 1)) / scale
    assert got[0] == (k, full)
    assert abs(full - (1.0 - p**k)) < 1e-4
    assert got[1] == (0, 0.0)
    # replay the random case per-match
    pos_a = {it: r for (_, it, r) in rand_a}
    pos_b = {it: r for (_, it, r) in rand_b}
    common = set(pos_a) & set(pos_b)
    want = sum(wq[max(pos_a[it], pos_b[it]) - 1] for it in common) / scale
    assert got[2] == (len(common), want)


def test_rbo_overlap_ranks_beyond_k_ignored(spark):
    from patternly_spark.operators.retrieval import rbo_overlap

    a = spark.createDataFrame(
        [(0, "x", 1), (0, "y", 7)], "query_id long, item_id string, rank int"
    )
    b = spark.createDataFrame(
        [(0, "x", 1), (0, "y", 2)], "query_id long, item_id string, rank int"
    )
    rows = rbo_overlap(a, b, k=3, p=0.5).collect()
    assert len(rows) == 1 and rows[0].n_common == 1  # y's rank 7 > k on side a


def test_passjoin_exhaustive_parity_with_bruteforce(spark):
    """PassJoin at tau=3 returns EXACTLY the brute-force Levenshtein
    pair set (completeness AND precision) over random short keys
    including empty and sub-segment-length strings."""
    import itertools
    import random

    from patternly_spark.operators.retrieval import passjoin_fuzzy_key_join

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = random.Random(31)
    alpha = "abc"
    lkeys = list({"".join(rng.choices(alpha, k=rng.randint(0, 9))) for _ in range(70)})
    rkeys = list({"".join(rng.choices(alpha, k=rng.randint(0, 9))) for _ in range(70)})
    lf = spark.createDataFrame([(k,) for k in lkeys], "name string")
    rf = spark.createDataFrame([(k,) for k in rkeys], "term string")

    tau = 3
    got = {
        (r.name, r.term): r.dist
        for r in passjoin_fuzzy_key_join(
            lf, rf, left_key="name", right_key="term", max_dist=tau
        ).collect()
    }
    want = {
        (a, b): lev(a, b)
        for a, b in itertools.product(lkeys, rkeys)
        if lev(a, b) <= tau
    }
    assert got == want


def test_fuzzy_key_join_routes_large_radius_to_passjoin(spark):
    """max_dist=4 no longer raises; agreement with brute force on a
    planted set exercising every edit type at distance 3-4."""
    from patternly_spark.operators.retrieval import fuzzy_key_join

    lf = spark.createDataFrame(
        [("kangaroo",), ("elephant",), ("zzzz",)], "name string"
    )
    rf = spark.createDataFrame(
        [("kangaro",), ("kangarooxyz",), ("elphnt",), ("eleph",), ("qqqq",)],
        "term string",
    )
    got = {
        (r.name, r.term): r.dist
        for r in fuzzy_key_join(
            lf, rf, left_key="name", right_key="term", max_dist=4
        ).collect()
    }
    assert got == {
        ("kangaroo", "kangaro"): 1,
        ("kangaroo", "kangarooxyz"): 3,
        ("elephant", "elphnt"): 2,
        ("elephant", "eleph"): 3,
        ("zzzz", "qqqq"): 4,
    }
