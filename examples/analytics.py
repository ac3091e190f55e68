"""Behavioral/BI analytics demo over the events + orders tables:

    cohort retention triangle -> RFM segmentation -> event-type
    transition matrix + rare-transition anomaly users -> seasonal
    z-score alerts (mean/std and robust median/MAD) -> per-nation
    spend Gini -> basket affinity -> log2-sketch latency percentiles.

Run from anywhere:

    python examples/analytics.py [sf_dir]

The same compositions are the oracle-checked q141, q152–q159 and q161
in __spark_entry__.py — every number this prints replays bit-for-bit
in DuckDB.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from patternly_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("analytics-demo")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    print("== cohort retention (first-seen week x weeks later) ==")
    e.queries()["q152_cohort_retention"](spark, sf_dir).orderBy(
        "cohort_week", "weeks_later"
    ).show(8)

    print("== RFM segments (top spenders) ==")
    e.queries()["q158_rfm_segments"](spark, sf_dir).orderBy("m_quartile", "o_custkey").show(5)

    print("== event-type transition matrix ==")
    e.queries()["q154_transition_matrix"](spark, sf_dir).orderBy(
        "from_type", "to_type"
    ).show(8)

    print("== users with below-typical transitions ==")
    e.queries()["q155_rare_transitions"](spark, sf_dir).orderBy(
        "rare_frac", ascending=False
    ).show(5)

    print("== seasonal alerts (mean/std) ==")
    e.queries()["q141_seasonal_alerts"](spark, sf_dir).show(5)

    print("== robust seasonal alerts (median/MAD) ==")
    e.queries()["q153_robust_seasonal"](spark, sf_dir).show(5)

    print("== per-nation spend Gini ==")
    e.queries()["q159_spend_gini"](spark, sf_dir).orderBy("gini", ascending=False).show(5)

    print("== basket affinity (lift) ==")
    e.queries()["q157_basket_affinity"](spark, sf_dir).orderBy(
        "lift", ascending=False
    ).show(5)

    print("== log2-sketch value percentiles per event type ==")
    e.queries()["q161_log2_quantile_sketch"](spark, sf_dir).orderBy(
        "event_type", "quantile"
    ).show(15)

    spark.stop()


if __name__ == "__main__":
    main()
