"""Experimentation-platform demo: the full readout discipline on one
synthetic A/B split of the events table —

    randomization balance check (SMD) -> CUPED variance reduction ->
    two-proportion z-test -> Wald SPRT sequential monitor ->
    Benjamini-Hochberg FDR across many segment-level tests ->
    difference-in-differences -> Mann-Whitney rank readout ->
    Markov + Shapley attribution of the conversion event.

Run from anywhere:

    python examples/experimentation.py [sf_dir]

The same compositions are the oracle-checked q204, q228, q230-q231,
q233, q236, q239, q251 and q252 in __spark_entry__.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from pyspark.sql import functions as F

from patternly_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("patternly-experimentation")
    spark.sparkContext.setLogLevel("ERROR")

    from patternly_spark.operators.behavior import (
        markov_attribution,
        shapley_attribution,
    )
    from patternly_spark.operators.drift import (
        balance_check,
        bh_fdr,
        cuped_adjustment,
        proportion_ztest,
        sprt_test,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    b = ev.agg(F.min("us").alias("mn"), F.max("us").alias("mx")).select(
        F.expr("(mn + mx) div 2").alias("mid")
    )
    per_user = ev.crossJoin(F.broadcast(b)).groupBy("user_id").agg(
        F.sum(F.when(F.col("us") < F.col("mid"), F.col("cents")).otherwise(0))
        .cast("long").alias("pre"),
        F.sum(F.when(F.col("us") >= F.col("mid"), F.col("cents")).otherwise(0))
        .cast("long").alias("post"),
        F.max(
            (F.col("event_type") == "purchase")
            & (F.col("us") >= F.col("mid"))
        ).cast("int").alias("converted"),
    )
    armed = per_user.select(
        "user_id",
        (F.col("user_id") % 2).cast("int").alias("arm"),
        "pre", "post", "converted",
    )

    print("== 1. balance check (gate before reading anything) ==")
    balance_check(armed, arm_col="arm", covariate_cents_cols=["pre"]).show()

    print("== 2. CUPED-adjusted spend readout ==")
    cuped_adjustment(
        armed, metric_cents_col="post", covariate_cents_col="pre",
        arm_col="arm",
    ).orderBy("arm").show()

    print("== 3. conversion z-test ==")
    proportion_ztest(
        armed.select(
            F.lit("all").alias("cohort"),
            F.when(F.col("arm") == 1, "treatment").otherwise("control")
            .alias("variant"),
            F.col("converted").cast("boolean").alias("converted"),
        ),
        group_cols=["cohort"],
        variant_col="variant",
        success_col="converted",
        control="control",
        treatment="treatment",
    ).show()

    print("== 4. SPRT sequential monitor per arm ==")
    sprt_test(
        ev.select(
            (F.col("user_id") % 2).cast("int").alias("arm"),
            F.col("us").alias("ts"),
            (F.col("event_type") == "purchase").cast("int").alias("y"),
        ),
        ts_col="ts", outcome_col="y", group_cols=["arm"],
        p0=0.15, p1=0.25,
    ).orderBy("arm").show()

    print("== 5. BH-FDR over per-segment tests (synthetic p-values) ==")
    tests = ev.select(
        (F.col("user_id") % 20).alias("segment")
    ).distinct().select(
        "segment",
        (
            F.conv(F.substring(F.md5(F.col("segment").cast("string")), 1, 8),
                   16, 10).cast("long") % 1000
        ).cast("double").alias("__h"),
    ).select("segment", ((F.col("__h") + 1) / 1000.0).alias("p"))
    bh = bh_fdr(tests, p_col="p", id_cols=["segment"], fdr_q=0.2)
    bh.filter(F.col("reject")).orderBy("p").show()

    print("== 6. difference-in-differences on per-user spend ==")
    from patternly_spark.operators.drift import diff_in_diff, mann_whitney_u

    # the unit key must be DETERMINISTIC: did_rows is referenced in two
    # union branches, and a nondeterministic id (monotonically_increasing_id)
    # can re-evaluate differently per branch, splitting every unit into
    # pre-only/post-only pseudo-units — user_id is the natural key
    did_rows = armed.select(
        F.col("user_id").alias("unit_row"), "arm", "pre", "post"
    )
    did_in = did_rows.selectExpr(
        "unit_row as unit", "arm", "0 as is_post", "pre as cents"
    ).unionByName(
        did_rows.selectExpr("unit_row as unit", "arm", "1 as is_post", "post as cents")
    )
    diff_in_diff(
        did_in, "cents", unit_col="unit", arm_col="arm", is_post_col="is_post"
    ).show()

    print("== 7. Mann-Whitney U (whale-robust rank readout) ==")
    mann_whitney_u(
        armed.select("arm", F.col("post").alias("cents")), "cents", arm_col="arm"
    ).show()

    print("== 8. conversion attribution: Markov removal vs Shapley ==")
    journeys = ev.select("user_id", F.col("us").alias("ts"), "event_type")
    chans = ["click", "error", "signup", "view"]
    markov_attribution(
        journeys, ts_col="ts", channels=chans, conversion="purchase"
    ).orderBy(F.desc("share")).show()
    shapley_attribution(
        journeys, ts_col="ts", channels=chans, conversion="purchase"
    ).orderBy(F.desc("share")).show()

    print("== 9. jackknife CI on the RATIO metric (cents per event) ==")
    from patternly_spark.operators.drift import (
        jackknife_ratio_ci,
        james_stein_shrinkage,
    )

    jk_in = ev.join(armed.select("user_id", "arm"), "user_id").select(
        "arm", (F.col("user_id") % 16).alias("bucket"), "cents"
    )
    jackknife_ratio_ci(jk_in, "cents", arm_col="arm", bucket_col="bucket").show()

    print("== 10. James-Stein shrinkage of per-segment means ==")
    # small segments' raw means are mostly noise; report the shrunk ones
    js_in = ev.select((F.col("user_id") % 23).alias("segment"), "cents")
    james_stein_shrinkage(js_in, "cents", group_col="segment").orderBy(
        F.desc("shrink_c")
    ).show(5)

    print("== 11. interrupted time series (no-control-arm readout) ==")
    from patternly_spark.operators.temporal import interrupted_time_series

    interrupted_time_series(
        ev.select(F.timestamp_micros(F.col("us")).alias("ts"), "cents"),
        ts_col="ts",
        value_cents_col="cents",
    ).show()

    print("== 12. round-10 gates: chi2 independence, MH stratified 2x2, ==")
    print("==     Poisson rate, k-arm SRM (exact tail), BH q-values     ==")
    from patternly_spark.operators.drift import (
        bh_qvalues,
        chi2_independence,
        mantel_haenszel,
        poisson_rate_test,
        srm_check_k,
    )

    chi2_independence(
        ev.select((F.col("user_id") % 3).alias("cohort"), "event_type"),
        row_col="cohort", col_col="event_type",
    ).show(5)
    mantel_haenszel(
        armed.select(
            (F.col("user_id") % 4).alias("stratum"),
            F.col("arm").alias("t"), F.col("converted").alias("y"),
        ),
        stratum_col="stratum", treat_col="t", outcome_col="y",
    ).show()
    pr_in = ev.join(armed.select("user_id", "arm"), "user_id").groupBy(
        "user_id", "arm"
    ).agg(
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("purchases"),
        F.countDistinct(F.expr("us div 86400000000")).alias("active_days"),
    )
    poisson_rate_test(
        pr_in.withColumn("arm", F.col("arm").cast("string")),
        arm_col="arm", events_col="purchases", exposure_col="active_days",
    ).show()
    srm_check_k(
        armed.select(F.col("arm").cast("string").alias("arm")),
        arm_col="arm", expected={"0": 0.5, "1": 0.5},
    ).show()
    # the smallest q at which each segment-level test survives
    bh_qvalues(tests, p_col="p", id_cols=["segment"], alpha=0.2).show(5)
    print("experimentation demo OK")


if __name__ == "__main__":
    main()
