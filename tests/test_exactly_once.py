"""Exactly-once semantics of the foreachBatch registries.

foreachBatch is at-least-once: a crash AFTER a batch's writes but
BEFORE the engine records ``commits/<batch_id>`` re-offers the batch on
restart with the same batch_id.  These tests simulate exactly that
failure by deleting the last commit marker from the checkpoint and
restarting the stream — the registry/output must be unchanged (retry
overwrites its own work, never double-folds or double-appends).
"""

import os

import pytest
from pyspark.sql import functions as F

from patternly_spark.streaming.exactly_once import (
    committed_snapshot_ids,
    read_appended,
    read_latest_snapshot,
    read_registry,
    write_batch_partition,
    write_snapshot,
)


# ---------------------------------------------------------------------------
# primitive-level laws
# ---------------------------------------------------------------------------


def test_snapshot_roundtrip_and_before_batch(spark, tmp_path):
    p = str(tmp_path / "state")
    df0 = spark.createDataFrame([(1, 10)], "k long, v long")
    df1 = spark.createDataFrame([(1, 30)], "k long, v long")
    write_snapshot(df0, p, 0)
    write_snapshot(df1, p, 1)
    assert committed_snapshot_ids(spark, p) == [0, 1]
    latest, bid = read_latest_snapshot(spark, p)
    assert bid == 1 and latest.collect()[0]["v"] == 30
    # a retry of batch 1 must see batch 0's state, not its own orphan
    prev, bid = read_latest_snapshot(spark, p, before_batch=1)
    assert bid == 0 and prev.collect()[0]["v"] == 10
    # a retry of batch 0 sees NO state (its own orphan is not history)
    none, bid = read_latest_snapshot(spark, p, before_batch=0)
    assert none is None and bid is None


def test_snapshot_retry_overwrites_own_id(spark, tmp_path):
    p = str(tmp_path / "state")
    write_snapshot(spark.createDataFrame([(1,)], "v long"), p, 0)
    # retry of batch 0 writes different rows: replaces, never duplicates
    write_snapshot(spark.createDataFrame([(2,)], "v long"), p, 0)
    assert committed_snapshot_ids(spark, p) == [0]
    df, _ = read_latest_snapshot(spark, p)
    assert [r["v"] for r in df.collect()] == [2]


def test_snapshot_prune_keeps_newest(spark, tmp_path):
    p = str(tmp_path / "state")
    for i in range(6):
        write_snapshot(spark.createDataFrame([(i,)], "v long"), p, i, keep=3)
    assert committed_snapshot_ids(spark, p) == [3, 4, 5]
    with pytest.raises(ValueError):
        write_snapshot(spark.createDataFrame([(9,)], "v long"), p, 9, keep=1)


def test_snapshot_legacy_flat_fallback(spark, tmp_path):
    # a registry seeded by a plain batch write is readable until the
    # first snapshot lands
    p = str(tmp_path / "state")
    spark.createDataFrame([(7,)], "v long").write.parquet(p)
    df, bid = read_latest_snapshot(spark, p)
    assert bid is None and df.collect()[0]["v"] == 7
    assert read_registry(spark, p).collect()[0]["v"] == 7


def test_seeded_registry_survives_first_batch_retry(spark, tmp_path):
    # externally seeded flat registry + crash between write_snapshot(0)
    # and the checkpoint commit: the RETRY of batch 0 must still fold on
    # top of the seed (its own orphaned snap_0 is not history, the seed
    # next to it is)
    p = str(tmp_path / "state")
    spark.createDataFrame([(7,)], "v long").write.parquet(p)
    write_snapshot(spark.createDataFrame([(8,)], "v long"), p, 0)
    df, bid = read_latest_snapshot(spark, p, before_batch=0)
    assert bid is None and [r["v"] for r in df.collect()] == [7]
    # with no before_batch restriction the orphan IS the latest state
    df2, bid2 = read_latest_snapshot(spark, p)
    assert bid2 == 0 and [r["v"] for r in df2.collect()] == [8]


def test_batch_partition_refuses_mixed_layout(spark, tmp_path):
    # appending _batch_id= partitions beside a legacy flat registry
    # produces a layout partition discovery cannot read — refuse loudly
    p = str(tmp_path / "out")
    spark.createDataFrame([(7,)], "v long").write.parquet(p)
    with pytest.raises(ValueError, match="legacy flat registry"):
        write_batch_partition(spark.createDataFrame([(1,)], "v long"), p, 0)


def test_batch_partition_refuses_sub_scheme_mismatch(spark, tmp_path):
    """ADVICE r9: appending a _day-sub-partitioned batch to a registry
    whose earlier batches were written WITHOUT _day yields a tree
    Spark's partition inference rejects ('conflicting directory
    structures') — refuse at write time, in BOTH directions, instead of
    silently poisoning the registry."""
    p = str(tmp_path / "out")
    write_batch_partition(spark.createDataFrame([(1, 0)], "v long, _day long"), p, 0)
    with pytest.raises(ValueError, match="sub-partitioned by"):
        write_batch_partition(
            spark.createDataFrame([(2, 1)], "v long, _day long"),
            p, 1, sub_partition_cols=("_day",),
        )
    # reverse direction: existing batches HAVE the sub-partition
    p2 = str(tmp_path / "out2")
    write_batch_partition(
        spark.createDataFrame([(1, 0)], "v long, _day long"),
        p2, 0, sub_partition_cols=("_day",),
    )
    with pytest.raises(ValueError, match="sub-partitioned by"):
        write_batch_partition(
            spark.createDataFrame([(2, 1)], "v long, _day long"), p2, 1
        )
    # matching scheme keeps appending fine and the tree stays readable
    write_batch_partition(
        spark.createDataFrame([(2, 1)], "v long, _day long"),
        p2, 1, sub_partition_cols=("_day",),
    )
    assert read_appended(spark, p2).count() == 2


def test_read_appended_surfaces_real_read_errors(spark, tmp_path):
    """ADVICE r9: only genuinely-empty targets map to None; a mixed
    tree that exists but cannot be read RE-RAISES instead of being
    reported as 'no data'."""
    assert read_appended(spark, str(tmp_path / "absent")) is None
    empty = tmp_path / "emptydir"
    empty.mkdir()
    assert read_appended(spark, str(empty)) is None
    # hand-build the poisoned mixed tree the writer now refuses to make
    p = str(tmp_path / "mixed")
    spark.createDataFrame([(1,)], "v long").write.parquet(f"{p}/_batch_id=0")
    spark.createDataFrame([(2,)], "v long").write.parquet(
        f"{p}/_batch_id=1/_day=0"
    )
    with pytest.raises(Exception, match="(?i)conflicting|partition"):
        read_appended(spark, p)


def test_batch_partition_retry_drops_orphan_leaf_partitions(spark, tmp_path):
    """ADVICE r9: with sub_partition_cols, a retry whose replayed batch
    covers FEWER sub-partition values than the failed first attempt
    must not leave the extra leaf dirs behind — the batch's whole tree
    is replaced, exactly what the docstring promises."""
    p = str(tmp_path / "out")
    write_batch_partition(
        spark.createDataFrame([(1, 0), (2, 1), (3, 2)], "v long, _day long"),
        p, 0, sub_partition_cols=("_day",),
    )
    # retry of batch 0 covers only _day in {0} — days 1 and 2 from the
    # first attempt must vanish
    write_batch_partition(
        spark.createDataFrame([(9, 0)], "v long, _day long"),
        p, 0, sub_partition_cols=("_day",),
    )
    got = sorted((r["v"], r["_day"]) for r in read_appended(spark, p).collect())
    assert got == [(9, 0)]


def test_batch_partition_retry_overwrites(spark, tmp_path):
    p = str(tmp_path / "out")
    write_batch_partition(spark.createDataFrame([(1,), (2,)], "v long"), p, 0)
    write_batch_partition(spark.createDataFrame([(3,)], "v long"), p, 1)
    # retry of batch 1 with different rows replaces its partition only
    write_batch_partition(spark.createDataFrame([(4,)], "v long"), p, 1)
    got = sorted(r["v"] for r in read_appended(spark, p).collect())
    assert got == [1, 2, 4]
    # the view a retry of batch 1 folds against excludes batch 1's orphan
    hist = sorted(r["v"] for r in read_appended(spark, p, before_batch=1).collect())
    assert hist == [1, 2]


# ---------------------------------------------------------------------------
# end-to-end crash-replay: delete the last commit marker, restart
# ---------------------------------------------------------------------------


def _delete_last_commit(ckpt: str) -> int:
    commits = sorted(
        int(f) for f in os.listdir(os.path.join(ckpt, "commits")) if f.isdigit()
    )
    last = commits[-1]
    os.remove(os.path.join(ckpt, "commits", str(last)))
    # a real crash writes neither the commit nor its local-FS checksum
    crc = os.path.join(ckpt, "commits", f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    return last


def _drain(spark, q) -> None:
    """Wait for an availableNow query to terminate AND deregister, so a
    restart on the same checkpoint never races the dying run."""
    import time

    assert q.awaitTermination(120)
    q.stop()
    for _ in range(200):
        if all(x.id != q.id for x in spark.streams.active):
            return
        time.sleep(0.05)


def test_ranking_registry_survives_batch_replay(spark, tmp_path):
    """Fold registry: replaying the final batch after a simulated crash
    must not double-fold its integer sums."""
    from patternly_spark.operators.model_eval import ranking_metrics
    from patternly_spark.streaming.evaluation import (
        ranking_registry_metrics,
        streaming_ranking_registry,
    )

    schema = "query_id long, rank int, rel boolean"
    rows = [
        (q, r, (q + r) % 2 == 0) for q in range(6) for r in range(1, 6)
    ]
    df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "src")
    # one file per disjoint query set: a query's ranked list never spans
    # batches (the registry's arrival contract)
    for lo, hi in [(0, 2), (2, 4), (4, 6)]:
        spark.createDataFrame(
            [r for r in rows if lo <= r[0] < hi], schema
        ).coalesce(1).write.mode("append").parquet(src)
    reg = str(tmp_path / "reg")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = streaming_ranking_registry(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            reg,
            checkpoint_path=ckpt,
            k_values=(1, 3),
            trigger_once=True,
        )
        _drain(spark, q)

    run()
    want = [
        tuple(r) for r in ranking_metrics(df, k_values=(1, 3)).orderBy("k").collect()
    ]
    got1 = [
        tuple(r)
        for r in ranking_registry_metrics(spark, reg, k_values=(1, 3))
        .orderBy("k")
        .collect()
    ]
    assert got1 == want

    # simulate crash-after-write-before-commit of the last batch; restart
    replayed = _delete_last_commit(ckpt)
    assert replayed >= 1
    run()
    got2 = [
        tuple(r)
        for r in ranking_registry_metrics(spark, reg, k_values=(1, 3))
        .orderBy("k")
        .collect()
    ]
    assert got2 == want  # no double-fold


def test_ks_drift_output_survives_batch_replay(spark, tmp_path):
    """Append output: replaying the final batch must overwrite its own
    partition, not append a duplicate drift row."""
    from patternly_spark.streaming.drift import streaming_ks_drift

    schema = "x double"
    ref = spark.createDataFrame([(float(i),) for i in range(20)], schema)
    src = str(tmp_path / "src")
    for lo in (0, 7, 13):
        spark.createDataFrame(
            [(float(i),) for i in range(lo, lo + 7)], schema
        ).coalesce(1).write.mode("append").parquet(src)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = streaming_ks_drift(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            ref,
            "x",
            out,
            checkpoint_path=ckpt,
            trigger_once=True,
        )
        _drain(spark, q)

    run()
    first = sorted(
        tuple(r) for r in read_appended(spark, out).collect()
    )
    assert len(first) == 3
    _delete_last_commit(ckpt)
    run()
    second = sorted(
        tuple(r) for r in read_appended(spark, out).collect()
    )
    assert second == first  # the replayed row replaced itself


def test_scd2_registry_survives_batch_replay_and_ties(spark, tmp_path):
    """SCD2 fold: replay of the last batch must not re-version touched
    keys, and a change landing exactly at the open version's valid_from
    resolves deterministically (synthetic open row sorts first)."""
    from patternly_spark.operators.temporal import scd2_intervals
    from patternly_spark.streaming.merge import streaming_scd2_registry

    schema = "key long, ts long, attr string"
    b0 = [(1, 100, "a"), (2, 100, "x")]
    # key 1: change at ts=200; key 2: change EXACTLY at open valid_from
    b1 = [(1, 200, "b"), (2, 100, "y")]
    src = str(tmp_path / "src")
    for b in (b0, b1):
        spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(src)
    reg = str(tmp_path / "reg")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = streaming_scd2_registry(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            reg,
            checkpoint_path=ckpt,
            key_col="key",
            ts_col="ts",
            attr_cols=["attr"],
            trigger_once=True,
        )
        _drain(spark, q)

    run()
    key = lambda r: (r["key"], r["valid_from"], r["valid_to"] is None, r["valid_to"] or 0)
    got1 = sorted(read_registry(spark, reg).collect(), key=key)
    _delete_last_commit(ckpt)
    run()
    got2 = sorted(read_registry(spark, reg).collect(), key=key)
    assert got2 == got1  # replay is byte-identical

    # the same-ts update deterministically supersedes the open version:
    # key 2's CURRENT attrs are the event's, from the same valid_from
    cur = {
        r["key"]: (r["valid_from"], r["attr"])
        for r in read_registry(spark, reg).filter(F.col("is_current")).collect()
    }
    assert cur[2] == (100, "y")
    # key 1 matches the batch operator exactly
    want1 = sorted(
        scd2_intervals(
            spark.createDataFrame(
                [r for r in b0 + b1 if r[0] == 1], schema
            ),
            key_col="key",
            ts_col="ts",
            attr_cols=["attr"],
        ).collect(),
        key=key,
    )
    got_k1 = sorted(
        read_registry(spark, reg).filter(F.col("key") == 1).collect(), key=key
    )
    assert got_k1 == want1


def test_cosine_allpairs_registry_survives_batch_replay(spark, tmp_path):
    """Append-style REGISTRY under replay: the retried batch must (a)
    not see its own orphaned registry rows as history (else it would
    emit batch-vs-self pairs twice through the registry path) and (b)
    overwrite, not duplicate, its own pairs and registry partitions.
    Final state must equal the batch all-pairs operator exactly."""
    from patternly_spark.operators.similarity_allpairs import cosine_allpairs_join
    from patternly_spark.streaming.similarity import streaming_cosine_allpairs

    import random

    rng = random.Random(7)
    rows = []
    for i in range(0, 12, 2):  # six near-dup pairs across batches
        base = [rng.uniform(-1, 1) for _ in range(8)]
        near = [x + rng.uniform(-0.01, 0.01) for x in base]
        rows.append((i, base))
        rows.append((i + 1, near))
    for i in range(12, 30):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(8)]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    src = str(tmp_path / "src")
    for lo, hi in [(0, 10), (10, 20), (20, 30)]:
        spark.createDataFrame(
            [r for r in rows if lo <= r[0] < hi],
            "vec_id long, embedding array<double>",
        ).coalesce(1).write.mode("append").parquet(src)

    reg = str(tmp_path / "registry")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = streaming_cosine_allpairs(
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            registry_path=reg,
            output_path=out,
            checkpoint_path=ckpt,
            threshold=0.95,
            trigger_once=True,
        )
        _drain(spark, q)

    run()
    want = {
        (r.id_a, r.id_b): r.qcosine
        for r in cosine_allpairs_join(vecs, threshold=0.95).collect()
    }
    got1 = {
        (r.id_a, r.id_b): r.qcosine for r in read_appended(spark, out).collect()
    }
    assert got1 == want and want  # non-trivial pair set

    _delete_last_commit(ckpt)
    run()
    got2 = {
        (r.id_a, r.id_b): r.qcosine for r in read_appended(spark, out).collect()
    }
    assert got2 == want  # replay did not duplicate or drop pairs
    # registry holds each vector exactly once
    assert read_appended(spark, reg).select("id").distinct().count() == 30
    assert read_appended(spark, reg).count() == 30
