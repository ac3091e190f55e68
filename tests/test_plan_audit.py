"""plan_audit / assert_plan — the consolidated plan-shape guard."""

import pytest
from pyspark.sql import functions as F

from patternly_spark.plans import assert_plan, plan_audit


def test_audit_counts_exchanges_and_joins(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    region = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")

    narrow = docs.select("doc_id", F.length("text").alias("n"))
    a = plan_audit(narrow)
    assert a["exchanges"] == 0 and a["python_evals"] == 0
    assert a["scans"] and "doc_id" in a["scans"][0]["read_schema"]

    joined = nation.join(region, nation.n_regionkey == region.r_regionkey)
    aj = plan_audit(joined)
    assert aj["broadcast_joins"] >= 1 and aj["nested_loop_joins"] == 0

    agg = docs.groupBy("lang").count()
    assert plan_audit(agg)["exchanges"] == 1


def test_audit_sees_pushed_filters(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    filtered = docs.filter(F.col("doc_id") < 10).select("doc_id")
    audit = assert_plan(filtered, max_exchanges=0, no_python=True,
                        require_pushed_filter="doc_id")
    assert "LessThan(doc_id,10)" in audit["scans"][0]["pushed_filters"]


def test_audit_flags_python_and_cartesian(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(5)
    cart = docs.alias("a").crossJoin(docs.alias("b"))
    assert plan_audit(cart)["nested_loop_joins"] >= 1
    with pytest.raises(AssertionError, match="nested-loop"):
        assert_plan(cart)

    from patternly_spark.operators.multimodal import extract_features

    media = spark.createDataFrame(
        [(0, b"xx")], "media_id long, payload binary"
    )
    feats = extract_features(media, dim=4)
    assert plan_audit(feats)["python_evals"] >= 1
    with pytest.raises(AssertionError, match="Python"):
        assert_plan(feats, no_python=True)


def test_assert_plan_on_engine_operators(spark):
    """The documented plan shapes hold through the public operators."""
    from patternly_spark.functions.text import gopher_quality_flags
    from patternly_spark.operators.dedup import exact_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # quality pass: zero shuffle, zero python, filters still pushable
    assert_plan(gopher_quality_flags(docs), max_exchanges=0, no_python=True)
    # exact dedup: exactly one hash-partitioned window shuffle
    assert_plan(exact_dedup(docs), max_exchanges=1, no_python=True)


def test_epoch_mixture_plan_no_data_shuffle(spark):
    """epoch_mixture_sample: the only exchange is the source-sized token
    aggregate; the doc-side path is a broadcast join + explode (no
    data-sized repartition), with everything JVM-side."""
    from patternly_spark.operators.sampling import epoch_mixture_sample

    rows = [(i, f"s{i % 3}", "a b c d") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = epoch_mixture_sample(df, {"s0": 0.6, "s1": 0.4}, 500.0)
    audit = assert_plan(out, no_python=True, require_broadcast_join=True)
    # one exchange pair (partial/final) for the source aggregate only
    assert audit["exchanges"] <= 2, audit


def test_drift_plan_grid_not_data_sized(spark):
    """categorical_drift: shuffles touch only (group, cat) counts; the
    grid join against the category-sized reference is broadcast."""
    from patternly_spark.operators.drift import categorical_drift

    df = spark.createDataFrame(
        [(i % 5, f"c{i % 7}") for i in range(1000)], "g int, cat string"
    )
    # the two BNLJs are the INTENTIONAL bounded crosses (1-row total,
    # |cats|-row reference grid) — assert nothing beyond them and that
    # the grid probe itself broadcasts
    audit = assert_plan(
        categorical_drift(df, "cat", by="g"),
        no_python=True,
        no_nested_loop=False,
        require_broadcast_join=True,
    )
    assert audit["nested_loop_joins"] <= 2, audit
    assert audit["sort_merge_joins"] == 0, audit


def test_count_min_counters_single_shuffle(spark):
    """CMS build: fan-out map + exactly one partial-aggregating shuffle
    onto the fixed grid."""
    from patternly_spark.operators.sketches import count_min_counters

    df = spark.createDataFrame([(f"x{i % 40}",) for i in range(500)], "item string")
    audit = assert_plan(
        count_min_counters(df, "item", depth=4, width=64), no_python=True
    )
    assert audit["exchanges"] == 1, audit


def test_pretraining_build_composition_plan(spark):
    """The q120-style composition (boilerplate -> exact dedup -> gate ->
    shards -> manifest counts) must stay one healthy Catalyst plan: no
    Python boundary, no nested-loop join, hot-vocabulary joined as
    broadcast."""
    from pyspark.sql import functions as F

    from patternly_spark.operators.dedup import boilerplate_removal, exact_dedup
    from patternly_spark.operators.packing import assign_shards
    from patternly_spark.plans import assert_plan

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(12))) for i in range(40)],
        "doc_id long, text string",
    )
    cleaned = boilerplate_removal(docs, block_tokens=3, max_doc_freq=3)
    nonempty = cleaned.filter(F.col("n_kept") > 0).select(
        "doc_id", F.col("text_clean").alias("text")
    )
    dd = exact_dedup(nonempty)
    kept = nonempty.join(dd.filter(~F.col("is_dup")).select("doc_id"), "doc_id")
    gated = kept.filter(F.size(F.split(F.trim(F.col("text")), r"\s+")) >= 8)
    out = assign_shards(gated, n_shards=4).groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    assert_plan(out, no_python=True, no_nested_loop=True, require_broadcast_join=True)


def test_monitoring_family_plan_shapes(spark):
    """Plan guards for the round-6 monitoring/analytics operators:
    trend is ONE aggregation (no join/window); the data card is one
    CUBE aggregation; CDC chunking crosses no Python boundary and
    joins its sparse boundary relation without nested loops."""
    from pyspark.sql import functions as F

    from patternly_spark.operators.drift import linear_trend
    from patternly_spark.operators.packing import content_defined_chunks
    from patternly_spark.operators.rollup import corpus_data_card
    from patternly_spark.plans import assert_plan, plan_audit

    events = spark.createDataFrame(
        [("a", float(i), float(i % 7)) for i in range(64)], "g string, x double, y double"
    )
    trend = linear_trend(events, "x", "y", by="g")
    audit = assert_plan(trend, no_python=True, no_nested_loop=True)
    assert audit["sort_merge_joins"] == 0 and audit["broadcast_joins"] == 0

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i + j) % 11}" for j in range(12)), "en", f"s{i % 3}") for i in range(32)],
        "doc_id long, text string, lang string, source string",
    )
    card = corpus_data_card(docs)
    assert_plan(card, no_python=True, no_nested_loop=True)

    chunks = content_defined_chunks(docs, kgram=3, boundary_mod=4)
    assert_plan(chunks, no_python=True, no_nested_loop=True)


def test_quantized_search_plan_shapes(spark, sf_dir):
    """Compressed-vector searches keep the broadcast-queries x
    corpus-scan shape: zero Python boundaries, the single deliberate
    broadcast cross-score (the corpus side streams; only the tiny query
    set broadcasts — this BNLJ is the intended all-pairs scoring, not a
    missing equi-condition), and at most two exchanges (both windows
    key on query_id, so Catalyst reuses one shuffle)."""
    from pyspark.sql import functions as F

    from patternly_spark.operators.quantized import (
        hamming_rerank_topk,
        int8_topk,
        truncated_topk,
    )
    from patternly_spark.plans import plan_audit

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 5)
    for df in (
        int8_topk(emb, probes, k=5),
        hamming_rerank_topk(emb, probes, k=5, candidates=16),
        truncated_topk(emb, probes, trunc_dim=16, k=5),
    ):
        a = plan_audit(df)
        assert a["python_evals"] == 0, a
        assert a["nested_loop_joins"] == 1, a  # the deliberate broadcast score
        assert a["exchanges"] <= 2, a
        assert a["sort_merge_joins"] == 0, a


def test_lpa_round_plan_is_key_partitioned(spark):
    """One LPA round = neighbor equi-join + (node,label) groupBy +
    per-node argmax window — all keyed shuffles, never a nested loop,
    never a Python boundary."""
    from patternly_spark.operators.graph import label_propagation
    from patternly_spark.plans import plan_audit

    edges = spark.createDataFrame(
        [(i, (i * 7) % 40) for i in range(120)], "src long, dst long"
    )
    out = label_propagation(edges, iterations=1, checkpoint_every=10)
    a = plan_audit(out)
    assert a["python_evals"] == 0, a
    assert a["nested_loop_joins"] == 0, a


def test_round4_allpairs_family_plan_shapes(spark):
    """Plan pins for the exact all-pairs family: everything joins on
    keys (no nested-loop/cartesian on data), Python appears only as the
    Arrow GEMM/cell kernels, and the tfidf join's only cross join is
    the broadcast 1-row corpus count."""
    from patternly_spark.operators.dedup import duplicate_spans, set_similarity_join
    from patternly_spark.operators.similarity_allpairs import (
        cosine_allpairs_join,
        tfidf_cosine_allpairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    ppj = plan_audit(set_similarity_join(docs, threshold=0.5))
    assert ppj["nested_loop_joins"] == 0 and ppj["python_evals"] == 0

    spans = plan_audit(duplicate_spans(docs, ngram=20))
    assert spans["nested_loop_joins"] == 0 and spans["python_evals"] == 0

    cos = plan_audit(cosine_allpairs_join(emb, threshold=0.5))
    assert cos["nested_loop_joins"] == 0
    # cell build + per-cell GEMM verify are the only Python crossings
    assert 1 <= cos["python_evals"] <= 3

    tf = plan_audit(tfidf_cosine_allpairs(docs, threshold=0.9))
    assert tf["python_evals"] == 0
    # the broadcast 1-row count is the ONLY nested-loop member
    assert tf["nested_loop_joins"] <= 1


def test_round4_graph_and_stats_plan_shapes(spark):
    from patternly_spark.operators.behavior import frequent_itemsets
    from patternly_spark.operators.graph import triangle_counts
    from patternly_spark.operators.lm import pmi_cooccurrence
    from patternly_spark.operators.temporal import acf, holt_smoothing

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    edges = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
    )
    tri = plan_audit(triangle_counts(edges))
    assert tri["nested_loop_joins"] == 0 and tri["python_evals"] == 0

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pmi = plan_audit(pmi_cooccurrence(docs, window=3))
    # counts-only total rides a broadcast nested loop (1-row); pair
    # generation itself must stay join-free
    assert pmi["python_evals"] == 0 and pmi["nested_loop_joins"] <= 1

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id",
        "event_id",
        # events.ts is TIMESTAMP_NTZ in the raw parquet; unix_micros
        # needs a TIMESTAMP (the entry point's _t() helper casts too)
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
        "value",
    )
    holt = plan_audit(
        holt_smoothing(ev, "value", by="user_id", order_col=["tus", "event_id"])
    )
    assert holt["nested_loop_joins"] == 0 and holt["python_evals"] == 0

    a = plan_audit(acf(ev, "value", by="user_id", order_col=["tus", "event_id"]))
    assert a["nested_loop_joins"] == 0 and a["python_evals"] == 0
    # one sort feeds all lags: window + final group = bounded exchanges
    assert a["exchanges"] <= 2

    fi = plan_audit(
        frequent_itemsets(
            li.select(
                F.col("l_orderkey").alias("basket_id"),
                F.col("l_partkey").cast("string").alias("item"),
            ),
            size=3,
            min_support=2,
        )
    )
    assert fi["nested_loop_joins"] == 0 and fi["python_evals"] == 0


def test_round5_new_operator_plan_shapes(spark):
    """q191/q192/q193 operators: pure column expressions + equi/broadcast
    joins — no Python crossings, no nested loops anywhere."""
    from patternly_spark.operators.dedup import affix_overlap_join
    from patternly_spark.operators.lm import hash_bucket, hashed_text_classifier
    from patternly_spark.operators.quantized import class_centroid_cosines

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    aff = plan_audit(affix_overlap_join(docs, k=8))
    assert aff["nested_loop_joins"] == 0 and aff["python_evals"] == 0

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ccc = plan_audit(class_centroid_cosines(emb))
    assert ccc["nested_loop_joins"] == 0 and ccc["python_evals"] == 0

    w = spark.createDataFrame([(3, 0.5), (9, -0.5)], "bucket long, weight double")
    cls = plan_audit(hashed_text_classifier(docs, w, n_buckets=64))
    assert cls["nested_loop_joins"] == 0 and cls["python_evals"] == 0
    # the weight head must ride a broadcast join, never a shuffle join
    assert cls["broadcast_joins"] >= 1


def test_round5_late_operator_plan_shapes(spark):
    """Plan guards for the later round-5 operators: SCD2 and
    attribution are single-window plans (no joins at all); novelty and
    the z-test cross no Python boundary and use no nested loops beyond
    PassJoin's one deliberate bounded short-key broadcast cross."""
    from patternly_spark.operators.behavior import touch_attribution
    from patternly_spark.operators.decontam import ngram_novelty
    from patternly_spark.operators.drift import proportion_ztest
    from patternly_spark.operators.retrieval import passjoin_fuzzy_key_join
    from patternly_spark.operators.temporal import scd2_intervals

    ev = spark.createDataFrame(
        [(1, 10, "click"), (1, 20, "purchase")],
        "user_id long, ts_us long, event_type string",
    )
    att = plan_audit(
        touch_attribution(
            ev, touch_types=["click"], conversion_type="purchase", lookback_us=100
        )
    )
    assert att["python_evals"] == 0 and att["nested_loop_joins"] == 0
    assert att["sort_merge_joins"] == 0 and att["broadcast_joins"] == 0

    scd = plan_audit(
        scd2_intervals(ev, key_col="user_id", ts_col="ts_us", attr_cols=["event_type"])
    )
    assert scd["python_evals"] == 0 and scd["nested_loop_joins"] == 0
    assert scd["sort_merge_joins"] == 0 and scd["broadcast_joins"] == 0

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "c d e f g")], "doc_id long, text string"
    )
    nov = plan_audit(ngram_novelty(docs, docs, n=3))
    assert nov["python_evals"] == 0 and nov["nested_loop_joins"] == 0

    zt = plan_audit(
        proportion_ztest(
            ev.select("user_id", F.lit("control").alias("v"), F.lit(True).alias("s")),
            group_cols=["user_id"], variant_col="v", success_col="s",
            control="control", treatment="treatment",
        )
    )
    assert zt["python_evals"] == 0 and zt["nested_loop_joins"] == 0
    assert zt["exchanges"] <= 2

    pj = plan_audit(
        passjoin_fuzzy_key_join(
            docs.select(F.col("text").alias("k")),
            docs.select(F.col("text").alias("k2")),
            left_key="k", right_key="k2", max_dist=3,
        )
    )
    # the ONE nested loop is the bounded short-key broadcast cross
    assert pj["python_evals"] == 0 and pj["nested_loop_joins"] <= 1


def test_round5_stats_and_survival_plan_shapes(spark):
    """Plan pins for the round-5 statistics family: key joins only, no
    Python in the hot path, shuffle counts at the documented shape."""
    from patternly_spark.operators.drift import (
        bh_fdr,
        mutual_information,
        robust_means,
        theil_sen_trend,
    )
    from patternly_spark.operators.model_eval import (
        isotonic_calibration,
        threshold_sweep,
    )
    from patternly_spark.operators.temporal import kaplan_meier, logrank_test

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    subj = docs.select(
        (F.col("doc_id") % 3).cast("int").alias("g"),
        (F.col("n_chars") % 17).alias("dur"),
        (F.col("doc_id") % 2 == 0).alias("ev"),
    )
    km = plan_audit(kaplan_meier(subj, duration_col="dur", event_col="ev",
                                 group_cols=["g"]))
    assert km["python_evals"] == 0 and km["nested_loop_joins"] == 0

    lr = plan_audit(logrank_test(subj, duration_col="dur", event_col="ev",
                                 group_col="g"))
    assert lr["python_evals"] == 0
    # exactly two nested-loop members, both broadcast-tiny by design:
    # the 1-row chi2 crossJoin and the grid.dur >= t theta join against
    # the BROADCAST pooled-event-times relation (grid-sized, never
    # subject-sized — logrank_test's documented shape)
    assert lr["nested_loop_joins"] <= 2

    pts = docs.select(
        (F.col("doc_id") % 2).cast("int").alias("g"),
        (F.col("doc_id") % 29).cast("double").alias("x"),
        F.col("n_chars").cast("double").alias("y"),
    )
    ts = plan_audit(theil_sen_trend(pts, x_col="x", y_col="y", group_cols=["g"]))
    assert ts["python_evals"] == 0 and ts["nested_loop_joins"] == 0

    scored = docs.select(
        (F.col("doc_id") % 2).cast("int").alias("g"),
        ((F.col("doc_id") % 64).cast("double") / 64.0).alias("s"),
        (F.col("doc_id") % 3 == 0).cast("int").alias("l"),
    )
    iso = plan_audit(isotonic_calibration(scored, score_col="s", label_col="l",
                                          group_cols=["g"]))
    assert iso["python_evals"] == 0 and iso["nested_loop_joins"] == 0

    sw = plan_audit(threshold_sweep(scored, score_col="s", label_col="l",
                                    group_cols=["g"]))
    assert sw["python_evals"] == 0 and sw["nested_loop_joins"] == 0

    mi = plan_audit(mutual_information(docs, x_col="lang", y_col="source"))
    assert mi["python_evals"] == 0 and mi["nested_loop_joins"] == 0

    fdr = plan_audit(bh_fdr(docs.select("doc_id",
                                        ((F.col("doc_id") % 97).cast("double")
                                         / 97.0).alias("p")),
                            p_col="p", id_cols=["doc_id"]))
    assert fdr["python_evals"] == 0 and fdr["nested_loop_joins"] == 0

    rm = plan_audit(robust_means(docs.select(
        F.col("lang").alias("g"), F.col("n_chars").alias("c")),
        value_cents_col="c", group_cols=["g"]))
    assert rm["python_evals"] == 0 and rm["nested_loop_joins"] == 0


def test_round5_graph_text_multimodal_plan_shapes(spark):
    """Plan pins for round-5 graph/text/multimodal: wedge joins stay
    key-equi, TextRank's walk is key joins, containment has zero
    Python, the media hashes are the ONLY Python crossings in their
    plans."""
    from patternly_spark.operators.dedup import set_containment_join
    from patternly_spark.operators.graph import (
        adamic_adar_link_prediction,
        degree_assortativity,
    )
    from patternly_spark.operators.lm import textrank_keywords
    from patternly_spark.operators.multimodal import audio_energy_hash, image_dhash

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    edges = docs.select(
        (F.col("doc_id") % 50).alias("src"), (F.col("doc_id") % 37).alias("dst")
    )
    da = plan_audit(degree_assortativity(edges))
    assert da["python_evals"] == 0 and da["nested_loop_joins"] == 0

    aa = plan_audit(adamic_adar_link_prediction(edges))
    assert aa["python_evals"] == 0 and aa["nested_loop_joins"] == 0

    cj = plan_audit(set_containment_join(docs, threshold=0.8))
    assert cj["python_evals"] == 0 and cj["nested_loop_joins"] == 0

    tr = plan_audit(textrank_keywords(docs, top_k=5, iterations=1))
    assert tr["python_evals"] == 0 and tr["nested_loop_joins"] == 0

    media = spark.createDataFrame([(0, b"x")], "media_id long, payload binary")
    dh = plan_audit(image_dhash(media))
    assert dh["python_evals"] == 1  # the Arrow decode kernel, nothing else
    ah = plan_audit(audio_energy_hash(media, frames=4))
    assert ah["python_evals"] == 1


def test_round5_experiments_and_safety_plan_shapes(spark):
    """Plan pins for the experimentation/safety family: PII ops are
    zero-shuffle single scans, the one-pass aggregates have no joins on
    data, SPRT/weighted-median are window+aggregate only."""
    from patternly_spark.operators.drift import (
        balance_check,
        cuped_adjustment,
        sprt_test,
        weighted_median,
    )
    from patternly_spark.operators.model_eval import clustering_agreement
    from patternly_spark.operators.validate import (
        pii_redact,
        pii_scan,
        profile_columns,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scan = plan_audit(pii_scan(docs))
    assert scan["exchanges"] == 0 and scan["python_evals"] == 0
    red = plan_audit(pii_redact(docs))
    assert red["exchanges"] == 0 and red["python_evals"] == 0

    armed = docs.select(
        (F.col("doc_id") % 2).cast("int").alias("arm"),
        F.col("n_chars").alias("y"),
        (F.col("n_chars") + F.col("doc_id") % 7).alias("x"),
    )
    cu = plan_audit(cuped_adjustment(
        armed, metric_cents_col="y", covariate_cents_col="x", arm_col="arm"))
    assert cu["python_evals"] == 0
    # per-arm x 1-row-pooled broadcast is the only nested-loop member
    assert cu["nested_loop_joins"] <= 1

    bc = plan_audit(balance_check(
        armed, arm_col="arm", covariate_cents_cols=["x", "y"]))
    assert bc["python_evals"] == 0

    obs = docs.select(
        (F.col("doc_id") % 3).cast("int").alias("g"),
        F.col("doc_id").alias("ts"),
        (F.col("doc_id") % 4 == 0).cast("int").alias("y"),
    )
    sp = plan_audit(sprt_test(obs, ts_col="ts", outcome_col="y",
                              group_cols=["g"], p0=0.2, p1=0.4))
    assert sp["python_evals"] == 0 and sp["nested_loop_joins"] == 0

    wm = plan_audit(weighted_median(
        docs.select(F.col("lang").alias("g"),
                    F.col("n_chars").alias("v"), F.lit(2).alias("w")),
        value_col="v", weight_col="w", group_cols=["g"],
        check_weights=False))
    assert wm["python_evals"] == 0 and wm["nested_loop_joins"] == 0

    ca = plan_audit(clustering_agreement(docs, label_a="lang", label_b="source"))
    assert ca["python_evals"] == 0
    assert ca["nested_loop_joins"] <= 2  # two broadcast 1-row marginals

    pr = plan_audit(profile_columns(docs, columns=["lang", "source"]))
    assert pr["python_evals"] == 0 and pr["nested_loop_joins"] == 0


def test_kleinberg_plan_one_exchange_per_stage(spark, sf_dir):
    # the DP is one applyInPandas keyed exchange; the interval collapse
    # adds only the per-key window sort — no data-sized extra shuffles,
    # no driver collect
    from patternly_spark.operators.temporal import kleinberg_bursts
    from patternly_spark.plans import plan_audit

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        "event_id",
    )
    out = kleinberg_bursts(ev, key_col="user_id", ts_col="t", id_col="event_id")
    a = plan_audit(out)
    # groupBy-key exchange for the DP + window/groupBy exchanges on the
    # (much smaller) gap-state table; bound the total so a data-sized
    # shuffle creeping in trips this
    assert a["exchanges"] <= 4
    assert a["nested_loop_joins"] == 0
    assert a["python_evals"] == 1  # the DP kernel and nothing else


def test_cox_ph_per_step_plan_grid_sized(spark, sf_dir):
    # the per-Newton-step aggregate: full-scan groupBy onto the distinct
    # time grid, suffix-sum window over the GRID, p+p(p+1)/2-number agg.
    # No python, no nested loops; exchanges bounded (scan->grid agg,
    # grid window single-partition, final agg)
    from patternly_spark.plans import plan_audit

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    base = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("x0"),
        (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts")))
        .cast("double").alias("__t"),
        F.max((F.col("event_type") == "error").cast("int")).alias("__e"),
    )
    w = F.exp(F.lit(0.0) * F.col("x0"))
    grid = base.groupBy("__t").agg(
        F.sum(w).alias("s0"),
        F.sum(F.col("x0") * w).alias("s1_0"),
        F.sum(F.col("x0") * F.col("x0") * w).alias("s2_0_0"),
        F.sum(F.col("x0") * F.col("__e").cast("double")).alias("ex_0"),
        F.sum("__e").cast("double").alias("d"),
    )
    from pyspark.sql import Window

    wspec = Window.orderBy(F.desc("__t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = grid.select(
        "d", "ex_0",
        F.sum("s0").over(wspec).alias("S0"),
        F.sum("s1_0").over(wspec).alias("S1_0"),
    ).filter(F.col("d") > 0)
    final = cum.agg(
        F.sum(F.col("ex_0") - F.col("d") * (F.col("S1_0") / F.col("S0"))).alias("g_0")
    )
    a = plan_audit(final)
    assert a["python_evals"] == 0 and a["nested_loop_joins"] == 0
    assert a["exchanges"] <= 5


def test_round10_stats_plan_shapes(spark):
    """q273-q277: zero Python evals, zero sort-merge joins in the
    stats gates (the only joins are 1-row broadcast verdict crossJoins
    — nested-loop on bounded sides; q277's two rank joins are grid-
    broadcast or AQE-planned hash joins), and exchange counts pinned.
    Only the first groupBy onto the cell / stratum / arm / panel /
    value grid is data-sized."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    bounds = {
        "q273_chi2_independence": 16,
        "q274_bh_qvalues": 6,
        "q275_mantel_haenszel": 4,
        "q276_poisson_rate": 8,
        "q277_spearman": 10,
    }
    from patternly_spark.plans import plan_audit

    for name, max_ex in bounds.items():
        df = e.queries()[name](spark, sf)
        a = plan_audit(df)
        assert a["python_evals"] == 0, name
        assert a["sort_merge_joins"] == 0, name
        assert a["exchanges"] <= max_ex, (name, a["exchanges"])
