"""Round-11 optimization profiler: for each named query, time the
computation against the noop sink (guide §1.4 — no driver-side
materialization, every column computed) and capture
``.explain("formatted")`` to plans/r11/<name>_<tag>.txt.

Usage:
    python scripts/profile_r11.py before q201_msf_2rounds q98_cluster_discovery ...
    python scripts/profile_r11.py after  q201_msf_2rounds

Prints one JSON line: {"tag": ..., "timings": {name: sec}, "cpus": N}.
Timing is best-of-2 (same steady-state policy as bench.py).  The repo
session (session.get_spark) is used so numbers are comparable with
bench.py; SPARK_GRAFT_SF_DIR selects the data (default sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod
import __spark_entry__ as entrymod
from patternly_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("PROFILE_REPEATS", "2"))
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11"
    )
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark("patternly-profile-r11")
    spark.sparkContext.setLogLevel("ERROR")
    for t in entrymod.TABLES:
        entrymod._t(spark, sf_dir, t).count()

    queries = dict(entrymod.queries(), **benchmod.BENCH_BUDGETED)
    timings: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"r11-profile:{name}")
        # capture the formatted plan of the (lazy) result
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        best = float("inf")
        for _ in range(repeats):
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
        print(f"TIMED {name} {timings[name]}", flush=True)

    print(json.dumps({"tag": tag, "timings": timings,
                      "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
                      "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
