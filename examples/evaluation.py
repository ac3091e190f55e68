"""Model/retrieval evaluation + release-safety demo:

    ANN retrieval quality (P/R/NDCG/MRR@k over int8 top-k) ->
    grouped ROC-AUC -> calibration reliability table -> exact isotonic
    recalibration -> threshold sweep with best operating point ->
    PII scan -> redaction -> rescan (the gate provably closes).

Run from anywhere:

    python examples/evaluation.py [sf_dir]

The same compositions are the oracle-checked q205-q206, q212, q216,
q222, q232 and q234 in __spark_entry__.py — every number this prints
replays bit-for-bit in DuckDB.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from pyspark.sql import functions as F

from patternly_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("patternly-evaluation")
    spark.sparkContext.setLogLevel("ERROR")

    from patternly_spark.operators.model_eval import (
        calibration_bins,
        isotonic_calibration,
        ranking_metrics,
        roc_auc,
        threshold_sweep,
    )
    from patternly_spark.operators.quantized import int8_topk
    from patternly_spark.operators.validate import pii_redact, pii_scan

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    # 1) retrieval quality: same-class neighbors count as relevant
    probes = emb.filter(F.col("vec_id") < 50)
    nn = int8_topk(emb, probes, k=10)
    lab = emb.select("vec_id", "label")
    ranked = (
        nn.join(
            F.broadcast(lab.select(F.col("vec_id").alias("query_id"),
                                   F.col("label").alias("lq"))), "query_id")
        .join(
            F.broadcast(lab.select(F.col("vec_id").alias("neighbor_id"),
                                   F.col("label").alias("ln"))), "neighbor_id")
        .withColumn("rel", F.col("lq") == F.col("ln"))
    )
    print("== retrieval metrics (int8 ANN, relevance = same class) ==")
    ranking_metrics(ranked, k_values=(1, 5, 10)).orderBy("k").show()

    # 2) scorer quality: AUC + calibration of a synthetic purchase scorer
    h = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % F.lit(64)
    )
    lbl = F.col("event_type") == "purchase"
    scored = ev.select(
        (F.col("user_id") % 2).cast("int").alias("segment"),
        lbl.cast("int").alias("label"),
        (h.cast("double") / 128.0
         + F.when(lbl, F.lit(0.25)).otherwise(F.lit(0.0))).alias("score"),
    )
    print("== ROC-AUC per segment ==")
    roc_auc(scored, label_col="label", score_col="score",
            group_cols=["segment"]).orderBy("segment").show()
    print("== calibration bins ==")
    calibration_bins(scored, label_col="label", score_col="score", bins=10).orderBy(
        "bin"
    ).show()
    print("== isotonic recalibration map (segment 0) ==")
    isotonic_calibration(
        scored.filter(F.col("segment") == 0), score_col="score",
        label_col="label",
    ).orderBy("score").show(8)
    print("== best operating point per segment ==")
    threshold_sweep(
        scored, score_col="score", label_col="label", group_cols=["segment"]
    ).filter(F.col("is_best")).orderBy("segment").show()

    # 3) release safety: plant PII, scan, redact, rescan
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 5 == 0,
                   F.lit(" leak me at who@example.org or 555-867-5309"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    before = pii_scan(planted).agg(
        F.sum(F.col("has_pii").cast("int")).alias("docs_with_pii")
    ).collect()[0]["docs_with_pii"]
    after = pii_scan(pii_redact(planted)).agg(
        F.sum(F.col("has_pii").cast("int")).alias("docs_with_pii")
    ).collect()[0]["docs_with_pii"]
    print(f"PII docs before redaction: {before}; after: {after}")
    assert after == 0, "redaction gate must close"

    # 4) uncertainty: conformal interval gate + one-pass bootstrap CI
    from patternly_spark.operators.drift import poisson_bootstrap_ci
    from patternly_spark.operators.model_eval import conformal_calibration
    from patternly_spark.operators.sampling import hash_fraction

    evv = ev.filter(F.col("value").isNotNull())
    is_cal = hash_fraction(F.col("event_id")) < F.lit(0.5)
    print("== split-conformal coverage (marginal + per-type Mondrian) ==")
    conformal_calibration(
        evv.filter(is_cal), evv.filter(~is_cal), score_col="value", alphas=(0.1,)
    ).show()
    conformal_calibration(
        evv.filter(is_cal), evv.filter(~is_cal), score_col="value",
        alphas=(0.1,), by="event_type",
    ).orderBy("event_type").show()

    print("== Poisson-bootstrap CI: revenue per view (per-user resampling) ==")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase",
                     (F.col("value").cast("decimal(18,2)") * 100).cast("long"))
              .otherwise(F.lit(0))).cast("long").alias("purchase_cents"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long").alias("views"),
    )
    poisson_bootstrap_ci(
        per_user, "purchase_cents", key_col="user_id",
        denom_cents_col="views", replicates=32,
    ).show()

    print("evaluation demo OK")


if __name__ == "__main__":
    main()
