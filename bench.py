"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a cheap count() (no driver-side materialization
of result rows); timings are per-query wall clock after a warm-up of the
session + file listing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from patternly_spark.session import get_spark

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q02_top_customers",
    "q03_region_activity",
    "q04_priority_semijoin",
    "q05_customers_without_orders",
    "q06_window_rank",
    "q07_lag_delta",
    "q08_events_tumbling",
    "q09_events_sliding",
    "q10_setops",
    "q11_minmax_by",
    "q12_filter_predicates",
    "q13_distinct_agg",
    "q14_quantize_simple",
    "q15_quantize_complex",
    "q16_alphabet_size",
    "q17_window_chop",
    "q18_token_stats",
    "q19_quality_langid",
    "q20_exact_dedup",
    "q21_minhash_signatures",
    "q22_minhash_buckets",
    "q23_ngram_jaccard",
    "q89_dedup_clusters",
    "q24_cosine_topk",
    "q25_llk_stats_shape",
    "q26_anomaly_flag_shape",
    "q27_winnow_candidates",
    "q28_left_outer_coalesce",
    "q29_sorted_collect",
    "q30_quantize_second",
    "q31_asof_join",
    "q32_sessionize",
    "q33_stratified_sample",
    "q34_decontaminate",
    "q35_pack_sequences",
    "q36_neardup_corpus",
    "q37_curation_pipeline",
    "q38_ngram_census",
    "q39_chunk_documents",
    "q40_range_join",
    "q41_hypertable_rollup",
    "q42_bm25_retrieval",
    "q43_gopher_quality",
    "q44_semantic_dedup",
    "q45_sketch_profile",
    "q46_chunk_ann",
    "q47_collocations",
    "q48_pii_scrub",
    "q49_span_dedup",
    "q50_containment",
    "q51_mixture_weights",
    "q52_domain_cap",
    "q53_intradoc_dedup",
    "q54_lm_perplexity",
    "q55_zorder_values",
    "q56_interval_overlap",
    "q57_pq_topk",
    "q58_top_tokens",
    "q59_shard_assignment",
    "q60_random_projection",
    "q61_winsorize",
    "q62_exactsubstr_spans",
    "q63_gapfill",
    "q64_funnel",
    "q65_cohort_retention",
    "q66_mad_outliers",
    "q67_quality_bins",
    "q68_grouping_sets",
    "q69_edit_distance",
    "q70_histogram",
    "q71_active_users",
    "q73_importance_sample",
    "q74_dsir_weights",
    "q75_merge_upsert",
    "q77_rrf_hybrid",
    "q78_normalize_dedup",
    "q79_sequence_match",
    "q80_snapshot_diff",
    "q81_weighted_sample",
    "q82_chi2_keywords",
    "q83_json_extract",
    "q84_pivot",
    "q85_range_frame",
    "q86_unpivot",
    "q87_percentile_ranks",
    "q88_quantile_normalize",
    "q90_pfsa_llk_scores",
    "q91_anomaly_pipeline",
    "q92_simhash",
    "q93_lsh_candidates",
    "q94_embedding_neardup",
    "q95_multimodal_features",
    "q96_lsh_topk",
    "q97_ivf_topk",
    "q98_cluster_discovery",
    "q99_pfsa_simulation",
    "q100_frequent_items",
    "q101_bpe_encode_pack",
    "q102_repetition_filter",
    "q103_png_roundtrip_features",
    "q104_wav_roundtrip_rms",
    "q105_html_extract",
    "q106_count_min",
    "q107_link_graph",
    "q108_leakage_safe_split",
    "q109_drift_monitor",
    "q110_epoch_mixture",
    "q111_url_canonical_dedup",
    "q112_bloom_decontaminate",
    "q113_curation_v2",
    "q114_ks_drift",
    "q115_boilerplate_removal",
    "q116_minhash_calibration",
    "q117_ann_recall",
    "q118_length_bucket_stats",
    "q119_dataset_fingerprint",
    "q120_pretraining_build",
    "q121_data_card",
    "q122_epoch_shuffle",
    "q123_contamination_report",
    "q124_cdc_chunks",
    "q125_ema",
    "q126_chunk_dedup_report",
    "q127_ema_residual_anomalies",
    "q128_zipf_fit",
    "q129_metric_trend",
    "q130_cusum",
    "q131_discords",
    "q132_seasonal_profile",
    "q133_knn_eval",
    "q134_metric_correlation",
    "q135_int8_ann",
    "q136_hamming_rerank",
    "q137_matryoshka_eval",
    "q138_phrase_search",
    "q139_temperature_mixture",
    "q140_lpa_communities",
    "q141_seasonal_alerts",
    "q142_hybrid_retrieval",
    "q143_dedup_agreement",
    "q144_cross_source_overlap",
    "q145_decayed_engagement",
    "q146_ring_negatives",
    "q147_contrastive_triplets",
    "q148_hll_cardinality",
    "q149_deletion_propagation",
    "q150_pareto_frontier",
    "q151_fuzzy_vocab_match",
    "q152_cohort_retention",
    "q153_robust_seasonal",
    "q154_transition_matrix",
    "q155_rare_transitions",
    "q156_ship_latency_sla",
    "q157_basket_affinity",
    "q158_rfm_segments",
    "q159_spend_gini",
    "q160_cluster_size_distribution",
    "q161_log2_quantile_sketch",
    "q162_allpairs_similarity",
    "q163_novelty_curve",
    "q164_weekly_movers",
    "q165_sorted_neighborhood",
    "q166_blocklist_screen",
    "q167_source_minhash_algebra",
    "q168_burstiness",
    "q169_behavior_entropy",
    "q170_benford_audit",
    "q171_embedding_class_profile",
    "q172_markov_entropy_rate",
    "q173_cosine_allpairs",
    "q174_fuzzy_join_dist2",
    "q175_anomaly_golden_replica",
    "q176_tfidf_cosine_allpairs",
    "q177_copurchase_triangles",
    "q178_duplicate_spans",
    "q179_pmi_collocations",
    "q180_kcore_copurchase",
    "q181_embedding_covariance",
    "q182_golden_records",
    "q183_mutual_knn",
    "q184_frequent_triples",
    "q185_holt_smoothing",
    "q186_autocorrelation",
    "q187_vocab_coverage",
    "q188_crosscorrelation",
    "q189_core_decomposition",
    "q191_affix_stitching",
    "q192_class_centroid_cosines",
    "q193_quality_classifier",
    "q194_data_quality_report",
    "q195_ranking_agreement",
    "q196_scd2_history",
    "q197_fuzzy_join_dist3",
    "q198_ngram_novelty",
    "q199_idf_snapshot_drift",
    "q200_release_gate",
    "q202_personalized_pagerank",
    "q203_touch_attribution",
    "q204_ab_lift_ztest",
    "q205_roc_auc",
    "q206_calibration_bins",
    "q207_readability",
    "q208_bfs_reach",
    "q209_record_linkage",
    "q210_neyman_allocation",
    "q211_jaccard_links",
    "q212_retrieval_eval",
    "q213_kaplan_meier",
    "q214_logrank_cohorts",
    "q215_theil_sen_trend",
    "q216_isotonic_calibration",
    "q217_holt_winters",
    "q218_neighborhood_function",
    "q219_degree_assortativity",
    "q220_adamic_adar",
    "q221_mutual_information",
    "q222_threshold_sweep",
    "q223_containment_join",
    "q224_textrank_keywords",
    "q225_image_dhash",
    "q226_image_neardup",
    "q227_audio_energy_hash",
    "q228_bh_fdr",
    "q229_robust_means",
    "q230_markov_attribution",
    "q231_shapley_attribution",
    "q232_pii_scan",
    "q233_sprt_monitor",
    "q234_pii_redaction",
    "q235_weighted_median",
    "q236_cuped",
    "q237_column_profile",
    "q238_clustering_agreement",
    "q239_balance_check",
    "q240_span_removal",
    "q241_release_gate_v2",
    "q242_group_conformal",
    "q243_conformal_calibration",
    "q244_poisson_bootstrap",
    "q245_bootstrap_ratio",
    "q246_retrieval_metric_ci",
    "q247_bootstrap_lift",
    "q248_quantile_lift",
    "q249_kleinberg_bursts",
    "q250_cox_hazards",
    "q251_diff_in_diff",
    "q252_mann_whitney",
    "q253_fleiss_kappa",
    "q254_logistic_propensity",
    "q255_event_study",
    "q256_jackknife_ratio",
    "q257_james_stein",
    "q258_its_segmented",
    "q259_mmr_rerank",
    "q260_obf_monitor",
    "q261_ipw_ate",
    "q262_delta_ratio",
    "q263_post_stratified",
    "q264_msprt_monitor",
    "q265_ks_test",
    "q266_cluster_lift",
    "q267_srm_check",
    "q268_tost_equivalence",
    "q269_brown_forsythe",
    "q270_power_mde",
    "q271_partition_quality",
    "q272_srm_check_k",
    "q273_chi2_independence",
    "q274_bh_qvalues",
    "q275_mantel_haenszel",
    "q276_poisson_rate",
    "q277_spearman",
]


def _q72_pagerank_2rounds(spark, sf_dir):
    """Time-budgeted variant of q72: the full 8-iteration run is
    job-latency-bound on local[32] (~1 s/round overhead masks the
    data-path signal), so the bench tracks a fixed 2-round run — same
    per-round plan (join + groupBy + dangling-mass broadcast), so
    regressions in the iterative shape still move this number."""
    from pyspark.sql import functions as F

    from patternly_spark.operators.graph import pagerank

    o = entrymod._t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = entrymod._t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + F.lit(10_000_000)).alias("dst"),
        )
        .distinct()
    )
    return pagerank(edges, iterations=2)


def _q76_bpe_2merges(spark, sf_dir):
    """Time-budgeted variant of q76: merge learning is argmax-per-round
    (driver round trip each merge), so the bench tracks 2 rounds; the
    corpus-sized cost — the one vocabulary scan — dominates and is fully
    inside this number."""
    from patternly_spark.operators.tokenizer import bpe_merges_df

    d = entrymod._t(spark, sf_dir, "documents")
    return bpe_merges_df(spark, d, num_merges=2)


def _q190_emergence_budget(spark, sf_dir):
    """Time-budgeted variant of q190: the full golden runs 20 sequential
    fit_stream windows of pure job latency; the bench tracks a 4-window
    two-regime stream — the same chop -> score -> mint -> bootstrap loop
    per window, so regressions in any stage of the streaming-detection
    path still move this number.  sf-independent by design (q190's own
    contract)."""
    import numpy as np

    from patternly_spark.detection import ContinuousStreamingDetection
    from patternly_spark.pfsa.model import PFSA
    from patternly_spark.pfsa.simulate import simulate

    a = PFSA(pitilde=[[0.8, 0.2], [0.3, 0.7]], connx=[[0, 1], [0, 1]])
    c = PFSA(pitilde=[[0.05, 0.95], [0.95, 0.05]], connx=[[0, 1], [0, 1]])
    stream = np.concatenate(
        [
            np.asarray(simulate(a, 500, 1, seed=41)[0]),
            np.asarray(simulate(c, 500, 1, seed=42)[0]),
        ]
    )
    df = spark.createDataFrame(
        [(int(i), int(s)) for i, s in enumerate(stream)],
        "offset long, symbol int",
    )
    det = ContinuousStreamingDetection(
        spark,
        window_size=250,
        window_overlap=0,
        quantize=False,
        anomaly_sensitivity=2,
        eps=0.2,
    )
    det.fit_stream(df)
    rows = [(i, int(t)) for i, t in enumerate(det.pattern_emergence_times)]
    return spark.createDataFrame(rows, "pattern_idx int, emergence_window int")


def _q201_msf_2rounds(spark, sf_dir):
    """Time-budgeted variant of q201: full Boruvka runs O(log n) nested
    CC rounds of driver latency; the bench tracks 2 rounds with
    strict=False (every edge kept is still a true MSF edge — Boruvka
    never retracts).  The per-round plan (label joins, min-by, star CC,
    checkpoint cut) is identical, so iterative-shape regressions land
    here."""
    from pyspark.sql import functions as F

    from patternly_spark.operators.graph import minimum_spanning_forest

    li = entrymod._t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    support = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 2)
        .select(
            "src", "dst", (F.lit(1.0) / F.col("__c").cast("double")).alias("weight")
        )
    )
    return minimum_spanning_forest(support, max_rounds=2, strict=False)


def _q180_kcore_budget(spark, sf_dir):
    """Time-budgeted variant of q180: the full peel runs until no node
    is under k (the sf10 rehearsal measured 187 s, dominated by CASCADE
    LENGTH — the round count grows with graph density, which is a data
    property, not a plan property).  The bench replays exactly 3 peel
    rounds of the operator's per-round plan — degree agg over the edge
    union, under-k anti-joins on both endpoints, localCheckpoint cut —
    so per-round regressions are pinned independently of how many
    rounds the data happens to need."""
    from pyspark.sql import functions as F

    li = entrymod._t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    und = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 2)
        .select("u", "v")
        .localCheckpoint(eager=True)
    )
    for _ in range(3):
        deg = (
            und.select(F.col("u").alias("node"))
            .unionAll(und.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        )
        bad = deg.filter(F.col("degree") < 3).select("node")
        und = (
            und.join(bad.withColumnRenamed("node", "u"), "u", "left_anti")
            .join(bad.withColumnRenamed("node", "v"), "v", "left_anti")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    return (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )


def _q223_containment_zipf(spark, sf_dir):
    """q223 on a REALISTIC corpus: the sf documents table has a 23-word
    toy vocabulary, which defeats prefix pruning (693k candidate pairs
    from 5k docs) and makes q223's pin measure the degenerate case.
    This variant synthesizes the same 5k-doc corpus size with a ZIPFIAN
    vocabulary (log-uniform rank over 50k types ~ Zipf s=1, the
    scripts/gen_scale_data.py construction) plus a planted 3%
    containment rate — the operating regime the operator was designed
    for, where rare shingles make the prefix filter bite.  q223 itself
    stays benched as the stress case."""
    import math

    from pyspark.sql import functions as F

    from patternly_spark.operators.dedup import set_containment_join

    n_docs, vocab, toks = 5000, 50_000, 60

    def _u(*cols):
        return (
            F.pmod(F.xxhash64(*cols), F.lit(1 << 30)).cast("double")
            / F.lit(float(1 << 30))
        )

    def _zipf(*cols):
        return F.least(
            F.lit(vocab),
            F.greatest(
                F.lit(1),
                F.floor(F.exp(_u(*cols) * F.lit(math.log(float(vocab))))).cast("long"),
            ),
        )

    base = spark.range(0, n_docs, 1, 8).withColumn(
        # 3% of docs are PREFIX SLICES of another doc -> true containments
        "base_id",
        F.when(
            _u("id", F.lit(51)) < 0.03, F.pmod(F.xxhash64("id", F.lit(52)), F.lit(n_docs))
        ).otherwise(F.col("id")),
    )
    ntok = F.when(F.col("base_id") != F.col("id"), F.lit(toks // 3)).otherwise(
        F.lit(toks)
    )
    words = F.transform(
        F.sequence(F.lit(1), ntok),
        lambda i: F.concat(F.lit("w"), _zipf(F.col("base_id"), i, F.lit(53)).cast("string")),
    )
    docs = base.select(
        F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text")
    )
    return set_containment_join(docs, threshold=0.6)


# iterative family, benched with a fixed round budget (full-depth runs are
# round-latency-bound locally; see the variant docstrings), plus
# synthetic-corpus realism variants
BENCH_BUDGETED = {
    "q72_pagerank_2rounds": _q72_pagerank_2rounds,
    "q76_bpe_2merges": _q76_bpe_2merges,
    "q190_emergence_budget": _q190_emergence_budget,
    "q201_msf_2rounds": _q201_msf_2rounds,
    "q223_containment_zipf": _q223_containment_zipf,
    "q180_kcore_budget": _q180_kcore_budget,
}

# Per-query repeat counts (default 2).  q223's driver-corpus stress entry
# runs on a deliberately degenerate 23-word shared vocabulary: one fat
# prefix bucket dominates, so a single slow task sets the wall time and
# two rounds of host jitter have produced committed artifacts 1.8x the
# fresh repeat-and-min pin.  min over 4 runs converges to the pin's
# steady state (measured band: 4.1-4.6 s at sf0.1 over 4-run mins vs
# 4.1-7.4 s over 2-run mins).
BENCH_REPEATS = {
    "q223_containment_join": 4,
}



# Minimum pinned-query count before per-run calibration engages: with
# fewer samples the median ratio is dominated by the very queries under
# test (a 2-query run with one regression would "calibrate away" the
# regression).  The real bench has ~266 pinned entries.
MIN_CALIBRATION_N = 8


def run_median_x(timings: dict[str, float], pins: dict[str, float]) -> float:
    """Median of (observed / pin) over every pinned query in the run —
    the run's own weather estimate.  1.0 on a host matching the pin
    conditions; ~1.26 on round 8's contended driver host; 2.0 under a
    uniform 2x slowdown.  With 260+ pinned queries a handful of genuine
    regressions cannot move the median."""
    ratios = sorted(
        t / pins[n] for n, t in timings.items() if n in pins and pins[n] > 0
    )
    if not ratios:
        return 1.0
    mid = len(ratios) // 2
    if len(ratios) % 2:
        return ratios[mid]
    return (ratios[mid - 1] + ratios[mid]) / 2.0


def find_regressions(
    timings: dict[str, float],
    pins: dict[str, float],
    retime=None,
) -> dict[str, dict]:
    """Weather-invariant regression guard, two stages.

    Stage 1 (calibrated threshold): a query is a CANDIDATE when it
    exceeds BOTH 2x and +1.5s over its pin, after scaling the pin by the
    run's own median observed/pin ratio (``run_median_x``) — so a host
    that is uniformly 2x slower flags nothing, while a single genuinely
    slow query still stands out against the run's own weather.  The
    calibration never drops below 1.0 (a fast host must not hide real
    regressions) and only engages with >= MIN_CALIBRATION_N pinned
    queries (see constant).

    Stage 2 (confirmation re-time): a median calibration cannot see a
    TRANSIENT contention window that slows a contiguous handful of
    queries (round 8's driver run flagged 5 false regressions exactly
    this way — all re-timed clean in isolation).  So each candidate is
    re-timed via the ``retime(name) -> seconds`` callback AFTER the main
    loop (outside the window, by construction) and the flag is kept only
    if min(original, retime) still exceeds the calibrated threshold.
    This automates the manual adjudication rounds 7 and 8 both needed.
    ``retime=None`` (unit tests / non-bench callers) skips stage 2."""
    eligible = {n: t for n, t in timings.items() if n in pins and pins[n] > 0}
    med = run_median_x(timings, pins)
    cal = max(1.0, med) if len(eligible) >= MIN_CALIBRATION_N else 1.0

    def _over(t: float, pin: float) -> bool:
        return t > max(2.0 * cal * pin, cal * pin + 1.5)

    candidates = {n: t for n, t in eligible.items() if _over(t, pins[n])}
    out: dict[str, dict] = {}
    for name, t in candidates.items():
        best = t if retime is None else min(t, retime(name))
        if _over(best, pins[name]):
            entry = {
                "sec": round(best, 3),
                "pin": pins[name],
                "x_pin": round(best / pins[name], 2),
                "host_median_x": round(med, 3),
            }
            if retime is not None:
                entry["first_pass_sec"] = round(t, 3)
                # an emitted entry with a retime callback has BY
                # CONSTRUCTION survived the stage-2 confirmation
                entry["retimed"] = True
            out[name] = entry
    return out


def maybe_strict_exit(regressions: dict) -> None:
    """SPARK_GRAFT_BENCH_STRICT=1 fails the run (exit 1) when confirmed
    regressions survive the two-stage guard.  Lives in main()'s tail —
    a previous refactor orphaned it after a ``return`` inside
    compact_line(), where it was dead code (round-8 verdict item 2)."""
    if regressions and os.environ.get("SPARK_GRAFT_BENCH_STRICT") == "1":
        sys.exit(1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("patternly-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM + parquet footers (excluded from per-query timings)
    for t in entrymod.TABLES:
        entrymod._t(spark, sf_dir, t).count()

    queries = dict(entrymod.queries(), **BENCH_BUDGETED)
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES + list(BENCH_BUDGETED):
        # best-of-2: the first run of a query pays one-time costs (Python
        # worker spin-up, broadcast build) that a steady-state deployment
        # amortizes; min over two runs reports the steady-state time.
        # High-variance entries (degenerate-vocab stress corpora whose
        # single fat partition amplifies host scheduling jitter into the
        # 1.5-2x range) get extra repeats so the artifact and the
        # repeat-and-min pins tell one story.
        best = float("inf")
        for _ in range(BENCH_REPEATS.get(name, 2)):
            start = time.perf_counter()
            queries[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 3)
        # NOTE: a per-query gc.collect() was tried here (to let the
        # ContextCleaner free localCheckpoint blocks) and MEASURED
        # counterproductive: it added ~0.3 s to broadcast-heavy entries
        # (q183 0.86 -> 1.15 s in a controlled A/B) without improving
        # the late-bench entries it was meant to help — the one q140
        # spike that motivated it was host weather (5.4-6.6 s in four
        # other same-day runs).

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    # per-query regression guard: compare against the committed pins
    # (bench_pins.json, steady-state numbers at sf0.1) so a slowdown is
    # flagged in the artifact itself instead of needing forensic diffing
    # of BENCH_r{N} files (bounds in find_regressions, sized for the
    # host's observed 20-40% run-to-run variance).  Advisory by default —
    # set SPARK_GRAFT_BENCH_STRICT=1 to fail the run on regressions.
    pins_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_pins.json")
    regressions: dict[str, dict] = {}
    if os.path.exists(pins_path) and str(out["sf"]) == "0.1":
        with open(pins_path) as f:
            pins = json.load(f)["pins"]

        def _retime(name: str) -> float:
            # confirmation pass for stage-1 candidates: fresh best-of-2
            # AFTER the main loop, so a transient contention window that
            # slowed the original measurement has passed by construction.
            # A retime failure must not lose the whole artifact: fall
            # back to +inf (keeps the first-pass flag, never clears it).
            best = float("inf")
            try:
                for _ in range(2):
                    start = time.perf_counter()
                    queries[name](spark, sf_dir).count()
                    best = min(best, time.perf_counter() - start)
            except Exception as exc:  # pragma: no cover - defensive
                print(f"retime({name}) failed: {exc!r}", file=sys.stderr)
            return best

        regressions = find_regressions(timings, pins, retime=_retime)
        out["host_median_x"] = round(run_median_x(timings, pins), 3)
    out["regressions"] = regressions

    # The driver's harness keeps only the LAST 2000 bytes of stdout and
    # tries to parse the final line as JSON — a 257-entry query map
    # (~7 KB) can never survive that window, so every prior round's
    # BENCH_r{N}.json carried "parsed": null.  Emit the full result as a
    # non-final line AND persist it to BENCH_local_full.json (committed
    # per-round as BENCH_local_r{N}.json), then end stdout with a compact
    # line (<1900 bytes): totals, regression verdicts, and a fixed
    # headline subset of per-query timings.  Dropped entries are counted
    # explicitly (queries_elided) — no silent cap.
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_local_full.json"
    )
    with open(full_path, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
    sys.stdout.flush()
    print(compact_line(out))
    sys.stdout.flush()
    maybe_strict_exit(regressions)


#: heavy data-path entries ADDED to the compact headline in r12 (additive
#: only — nothing removed or renamed): the original 46-query headline is
#: dominated by sub-second scheduling-bound entries at sf0.1, so the
#: rounds' data-path wins were invisible in the driver's per-query
#: comparison (r11 verdict item 6).  Appended AFTER the original set so
#: a budget elision can only ever drop these, never an existing entry.
BENCH_HEADLINE_EXTRA = [
    "q102_repetition_filter",
    "q197_fuzzy_join_dist3",
    "q212_retrieval_eval",
    "q46_chunk_ann",
    "q241_release_gate_v2",
    "q140_lpa_communities",
    "q218_neighborhood_function",
    "q189_core_decomposition",
    "q208_bfs_reach",
    "q201_single_linkage_msf",
    "q162_allpairs_similarity",
    "q223_containment_join",
    "q177_copurchase_triangles",
    "q44_semantic_dedup",
]


def compact_line(out: dict, budget: int = 1900) -> str:
    """The final stdout line, guaranteed <= ``budget`` bytes: totals,
    regression verdicts, and a fixed headline subset of per-query
    timings (driver-gate queries first, then the budgeted iterative
    entries, then the r12 heavy data-path additions).  Entries dropped
    to fit are counted in queries_elided — no silent cap."""
    timings = out["queries"]
    headline = {
        n: round(timings[n], 2)
        for n in BENCH_QUERIES[:40] + list(BENCH_BUDGETED) + BENCH_HEADLINE_EXTRA
        if n in timings
    }
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "sf": out["sf"],
        "n_queries": len(timings),
        "full": "BENCH_local_full.json",
        "host_median_x": out.get("host_median_x"),
        "regressions": out.get("regressions", {}),
        "queries": headline,
    }
    line = json.dumps(compact, separators=(",", ":"))
    while len(line) > budget and compact["queries"]:
        compact["queries"].popitem()
        compact["queries_elided"] = len(timings) - len(compact["queries"])
        line = json.dumps(compact, separators=(",", ":"))
    return line


if __name__ == "__main__":
    main()
