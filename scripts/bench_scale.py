"""Scale rehearsal: run the heavy operator families at sf >= 1 and
record wall time + shuffle read/write + spill per query — the empirical
evidence behind SCALING.md's 100 TB design claims (VERDICT r5 item 1:
plan-shape audits can't catch memory cliffs, skew, or driver collects
that are 'bounded by contract' until they aren't).

Metrics come from the Spark UI REST API (per-stage totals diffed around
each query), so the numbers are the engine's own accounting, not
wrappers.

Usage:
    python scripts/gen_scale_data.py 1            # once, ~200 MB
    python scripts/bench_scale.py /root/repo/scale_data/sf1 [out.json]

Writes one JSON object per run (default BENCH_scale.json at repo root):
    {"sf_dir": ..., "queries": {name: {"sec": s, "rows": n,
     "shuffle_read_mb": r, "shuffle_write_mb": w, "spill_disk_mb": d,
     "spill_mem_mb": m, "peak_stage_tasks": t}}, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the whole point of this harness is engine-level shuffle/spill
# accounting, which needs the UI REST API — turn it on before the
# session is built (session.py defaults it OFF)
os.environ.setdefault("SPARK_GRAFT_UI", "1")
# scale rehearsals run sf >= 1 data: the 32-partition session default is
# sized for the sf0.1 driver bench, and at sf30 it hands every BUILD
# stage (e.g. q189's lineitem self-join) 512 MB+ sorts on a 256 MB/slot
# heap — the round-10 repeat protocol measured ~1-in-3 heap OOMs there.
# 128 is the round-8 best-measured sf30 session ("policy ON, session
# 128": q189 127 s / q218 95.7 s, BENCH_scale_sf30_policy.json); the
# per-round partition policy still lowers it for shrunken frontiers.
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "128")

import __spark_entry__ as entrymod
from patternly_spark.session import get_spark

# the heavy families named by the round-5 verdict: dedup chain,
# all-pairs, pretraining build, graph rounds, semantic dedup
SCALE_QUERIES = [
    "q20_exact_dedup",
    "q21_minhash_signatures",
    "q22_minhash_buckets",
    "q36_neardup_corpus",
    "q89_dedup_clusters",
    "q44_semantic_dedup",
    "q162_allpairs_similarity",
    "q173_cosine_allpairs",
    "q176_tfidf_cosine_allpairs",
    "q223_containment_join",
    "q120_pretraining_build",
    "q140_lpa_communities",
    "q180_kcore_copurchase",
    "q189_core_decomposition",
    "q218_neighborhood_function",
    "semantic_dedup_autosized",
]


def _ui(spark):
    return spark.sparkContext.uiWebUrl


def _stage_totals(spark) -> dict:
    """Sum shuffle/spill over all completed stages via the UI REST API.
    With the UI disabled (uiWebUrl None — e.g. SPARK_GRAFT_UI=0 exported
    over the default above) return zeros instead of crashing the run."""
    base = _ui(spark)
    if base is None:
        return {
            "shuffle_read": 0,
            "shuffle_write": 0,
            "spill_disk": 0,
            "spill_mem": 0,
            "max_tasks": 0,
        }
    apps = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    tot = {
        "shuffle_read": 0,
        "shuffle_write": 0,
        "spill_disk": 0,
        "spill_mem": 0,
        "max_tasks": 0,
    }
    for st in stages:
        tot["shuffle_read"] += st.get("shuffleReadBytes", 0)
        tot["shuffle_write"] += st.get("shuffleWriteBytes", 0)
        tot["spill_disk"] += st.get("diskBytesSpilled", 0)
        tot["spill_mem"] += st.get("memoryBytesSpilled", 0)
        tot["max_tasks"] = max(tot["max_tasks"], st.get("numCompleteTasks", 0))
    return tot


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scale_data/sf1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/BENCH_scale.json"
    only = os.environ.get("SCALE_QUERIES")
    names = only.split(",") if only else SCALE_QUERIES

    spark = get_spark("patternly-bench-scale")
    spark.sparkContext.setLogLevel("ERROR")
    for t in entrymod.TABLES:
        entrymod._t(spark, sf_dir, t).count()

    def _semantic_dedup_autosized(spark, sf_dir):
        """q44 pins num_planes=4 so its DuckDB oracle can replay the
        planes as literals; at scale that fixes the cell count while the
        corpus grows, so within-cell pair work grows quadratically.  The
        operator's num_planes=None AUTO-SIZING (cells derived from a
        corpus count targeting target_cell_size) is the documented scale
        path — this is the entry that must stay near-linear in sf."""
        from patternly_spark.operators.dedup import semantic_dedup

        emb = entrymod._t(spark, sf_dir, "embeddings")
        return semantic_dedup(emb, threshold=0.9, num_planes=None, seed=42)

    queries = dict(entrymod.queries())
    queries["semantic_dedup_autosized"] = _semantic_dedup_autosized
    results: dict[str, dict] = {}
    for name in names:
        start = time.perf_counter()
        # everything inside the try: after a JVM-killing failure (e.g.
        # executor OOM) even _stage_totals raises, and one dead query
        # must not lose the already-collected results
        try:
            before = _stage_totals(spark)
            start = time.perf_counter()
            rows = queries[name](spark, sf_dir).count()
            sec = time.perf_counter() - start
            after = _stage_totals(spark)
            mb = 1024.0 * 1024.0
            results[name] = {
                "sec": round(sec, 2),
                "rows": rows,
                "shuffle_read_mb": round((after["shuffle_read"] - before["shuffle_read"]) / mb, 1),
                "shuffle_write_mb": round((after["shuffle_write"] - before["shuffle_write"]) / mb, 1),
                "spill_disk_mb": round((after["spill_disk"] - before["spill_disk"]) / mb, 1),
                "spill_mem_mb": round((after["spill_mem"] - before["spill_mem"]) / mb, 1),
            }
        except Exception as exc:  # record, keep going — failures ARE findings
            results[name] = {
                "sec": round(time.perf_counter() - start, 2),
                "error": f"{type(exc).__name__}: {exc}"[:500],
            }
        print(name, json.dumps(results[name]), flush=True)

    doc = {
        "sf_dir": sf_dir,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "queries": results,
        "total_sec": round(sum(r.get("sec", 0.0) for r in results.values()), 1),
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"metric": "scale_rehearsal_sec", "value": doc["total_sec"],
                      "unit": "sec", "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
