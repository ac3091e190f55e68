"""Streaming scale rehearsal: the heaviest foreachBatch registries over
12 sf1-scale triggers, measuring the one cost class the BATCH rehearsal
(scripts/bench_scale.py) cannot see — snapshot/registry folds re-read
accumulated state every batch, so per-trigger cost must stay flat or
bounded by state size, never superlinear in trigger count.

Registries (the SURVEY ids the round-6 verdict called out):
- ST21 ``streaming_cosine_allpairs``  — registry = every vector seen
- ST24 ``streaming_tfidf_allpairs``   — registry = every posting seen
- ST25 ``streaming_cc_registry``      — registry = node -> label table
- ST13 ``streaming_ingest_shards``    — registry = per-shard manifest

Protocol: each trigger writes ONE new source file, then drains ONE
availableNow restart on the same checkpoint (query start overhead is a
constant per trigger, so it cannot masquerade as growth), recording
wall seconds, input rows, and the state the NEXT batch must read
(latest committed snapshot for snapshot registries, full layout for
append registries).

Output: ONE JSON object to BENCH_stream.json (or argv[2]).

Usage: python scripts/bench_stream_scale.py [sf_dir] [out_path]
       default sf_dir /root/repo/scale_data/sf1
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from patternly_spark.session import get_spark

N_TRIGGERS = 12


def _dir_mb(path: str) -> float:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return round(total / (1024.0 * 1024.0), 2)


def _state_mb(path: str) -> float:
    """Size the NEXT batch must read: latest committed snapshot when the
    path is a versioned-snapshot registry, the whole layout otherwise."""
    if not os.path.exists(path):
        return 0.0
    snaps = sorted(
        (int(n[5:]), n)
        for n in os.listdir(path)
        if n.startswith("snap_") and n[5:].isdigit()
        and os.path.exists(os.path.join(path, n, "_SUCCESS"))
    )
    if snaps:
        return _dir_mb(os.path.join(path, snaps[-1][1]))
    return _dir_mb(path)


def _drain(spark, q) -> None:
    assert q.awaitTermination(1800)
    q.stop()
    while any(x.id == q.id for x in spark.streams.active):
        time.sleep(0.05)


def _run_registry(spark, name, batches_df, schema, launch, state_paths, base):
    """batches_df: (trigger, row...) DataFrame pre-split by __t column."""
    os.makedirs(base, exist_ok=True)
    src = f"{base}/src"
    triggers = []
    for i in range(N_TRIGGERS):
        batches_df.filter(F.col("__t") == i).drop("__t").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        t0 = time.perf_counter()
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        _drain(spark, launch(stream, base))
        sec = time.perf_counter() - t0
        state = {p: _state_mb(f"{base}/{p}") for p in state_paths}
        triggers.append(
            {"batch": i, "sec": round(sec, 2), "state_mb": state}
        )
        print(f"  {name} trigger {i}: {sec:.2f}s state={state}", flush=True)
    return triggers


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scale_data/sf1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/BENCH_stream.json"
    work = "/root/repo/scale_data/_stream_rehearsal"
    if os.path.exists(work):
        shutil.rmtree(work)

    spark = get_spark("patternly-bench-stream")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    only = os.environ.get("STREAM_QUERIES")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "__t", F.pmod(F.col("vec_id"), F.lit(N_TRIGGERS)).cast("int")
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).withColumn("__t", F.pmod(F.col("doc_id"), F.lit(N_TRIGGERS)).cast("int"))
    # edge stream at lineitem-derived volume: co-purchase pairs capped by
    # hash sample to ~600k edges, trigger-sliced by edge hash
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    edges = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .filter(F.pmod(F.xxhash64("src", "dst"), F.lit(4)) == 0)
        .distinct()
        .withColumn(
            "__t", F.pmod(F.xxhash64("src", "dst", F.lit(1)), F.lit(N_TRIGGERS)).cast("int")
        )
        .localCheckpoint(eager=True)
    )

    cases = {}

    def _cosine(stream, base):
        from patternly_spark.streaming.similarity import streaming_cosine_allpairs

        return streaming_cosine_allpairs(
            stream, registry_path=f"{base}/reg", output_path=f"{base}/out",
            checkpoint_path=f"{base}/ckpt", threshold=0.95, trigger_once=True,
        )

    cases["ST21_cosine_allpairs"] = (
        emb, "vec_id long, embedding array<double>", _cosine, ["reg", "out"]
    )

    idf_path = f"{work}/idf"

    def _tfidf(stream, base):
        from patternly_spark.streaming.similarity import streaming_tfidf_allpairs

        return streaming_tfidf_allpairs(
            stream, registry_path=f"{base}/reg", output_path=f"{base}/out",
            checkpoint_path=f"{base}/ckpt", idf_path=idf_path, threshold=0.8,
            trigger_once=True,
        )

    cases["ST24_tfidf_allpairs"] = (
        docs, "doc_id long, text string", _tfidf, ["reg", "out"]
    )

    def _tfidf_bounded(stream, base):
        from patternly_spark.streaming.similarity import streaming_tfidf_allpairs

        return streaming_tfidf_allpairs(
            stream, registry_path=f"{base}/reg", output_path=f"{base}/out",
            checkpoint_path=f"{base}/ckpt", idf_path=idf_path, threshold=0.8,
            trigger_once=True, retention_batches=4, retire_expired=True,
        )

    # ST24b: the retention-horizon sibling — per-trigger cost must stay
    # flat (bounded by the trailing-4-batch posting mass) where ST24's
    # grows linearly with ALL accumulated postings, and expired registry
    # partitions are physically retired so state size plateaus too.
    cases["ST24b_tfidf_bounded"] = (
        docs, "doc_id long, text string", _tfidf_bounded, ["reg", "out"]
    )

    def _cc(stream, base):
        from patternly_spark.streaming.graph import streaming_cc_registry

        return streaming_cc_registry(
            stream, registry_path=f"{base}/reg", checkpoint_path=f"{base}/ckpt",
            trigger_once=True,
        )

    cases["ST25_cc_registry"] = (edges, "src long, dst long", _cc, ["reg"])

    def _shards(stream, base):
        from patternly_spark.streaming.shards import streaming_ingest_shards

        return streaming_ingest_shards(
            stream, f"{base}/shards", checkpoint_path=f"{base}/ckpt",
            n_shards=8, trigger_once=True,
        )

    cases["ST13_ingest_shards"] = (
        docs, "doc_id long, text string", _shards, ["shards/_manifest", "shards"]
    )

    for name, (df, schema, launch, states) in cases.items():
        if only and name not in only.split(","):
            continue
        if name.startswith("ST24") and not os.path.exists(idf_path):
            from patternly_spark.operators.similarity_allpairs import build_idf_snapshot

            build_idf_snapshot(
                spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
            ).write.mode("overwrite").parquet(idf_path)
        print(f"== {name}", flush=True)
        t0 = time.perf_counter()
        try:
            triggers = _run_registry(
                spark, name, df, schema, launch, states, f"{work}/{name}"
            )
            results[name] = {
                "triggers": triggers,
                "total_sec": round(time.perf_counter() - t0, 2),
            }
        except Exception as exc:  # failures ARE findings
            results[name] = {
                "error": f"{type(exc).__name__}: {exc}",
                "total_sec": round(time.perf_counter() - t0, 2),
            }

    payload = {
        "sf_dir": sf_dir,
        "n_triggers": N_TRIGGERS,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({k: v.get("total_sec") for k, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
