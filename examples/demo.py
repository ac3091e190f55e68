"""End-to-end demo: two-regime stream -> fit -> predict -> save/load ->
continuous discovery.  Run from anywhere:

    python examples/demo.py

Mirrors the reference's example-notebook flow (examples/example0/1 +
streaming example) on synthetic data from known ground-truth machines
(the M2.cfg simulation pattern).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

import numpy as np

from patternly_spark import ContinuousStreamingDetection, StreamingDetection
from patternly_spark.pfsa.model import PFSA
from patternly_spark.pfsa.simulate import simulate
from patternly_spark.session import get_spark


def main() -> None:
    spark = get_spark("patternly-demo")

    # ground-truth machines (examples/M2.cfg shape)
    regime_a = PFSA(pitilde=[[0.9, 0.1], [0.1, 0.9]], connx=[[0, 1], [1, 0]])
    regime_b = PFSA(pitilde=[[0.2, 0.8], [0.8, 0.2]], connx=[[0, 1], [1, 0]])

    seq_a = simulate(regime_a, 6000, 1, seed=7)[0]
    seq_b = simulate(regime_b, 3000, 1, seed=11)[0]

    train = spark.createDataFrame(
        [(i, float(s)) for i, s in enumerate(seq_a)], "offset long, value double"
    )
    both = spark.createDataFrame(
        [(i, float(s)) for i, s in enumerate(list(seq_a) + list(seq_b))],
        "offset long, value double",
    )

    model = StreamingDetection(
        spark, window_size=300, window_overlap=0, n_clusters=1,
        quantize=False, anomaly_sensitivity=3,
    )
    model.fit(train)
    preds = model.predict(both).orderBy("seq_id").collect()
    flags = [r["anomaly"] for r in preds]
    n_a = 6000 // 300
    print(f"regime-A windows flagged: {np.mean(flags[:n_a]):.2f}")
    print(f"regime-B windows flagged: {np.mean(flags[n_a:]):.2f}")

    model.save_model("/tmp/patternly_demo_model")
    reloaded = StreamingDetection.load_model("/tmp/patternly_demo_model", spark)
    assert [r["anomaly"] for r in reloaded.predict(both).orderBy("seq_id").collect()] == flags
    print("save/load round-trip: identical verdicts")

    cont = ContinuousStreamingDetection(
        spark, window_size=300, window_overlap=0, quantize=False, anomaly_sensitivity=3
    )
    cont.fit_stream(both)
    print(f"pattern emergence times (window ids): {cont.pattern_emergence_times}")
    print(f"library size after stream: {len(cont.library)} PFSAs")
    cont.print_PFSAs()


if __name__ == "__main__":
    main()
