"""Crash-replay sweep over EVERY foreachBatch registry (SURVEY ST6–ST36).

The exactly-once law, tested uniformly: run batch 0, simulate a crash
between the registry's writes and the engine's checkpoint commit
(delete ``commits/0`` + its ``.crc``), then restart with batch 1
available — the engine replays batch 0 (same batch_id, pinned by the
offsets log) before processing batch 1.  Every state path the registry
maintains must end up IDENTICAL to a clean run that never crashed.

``test_exactly_once.py`` proves the law end-to-end for four registries
with semantic assertions; this module is the breadth sweep — one spec
per registry (input schema, two batches honoring its arrival contract,
a launch wiring, the state paths to compare), one shared protocol.

Registries NOT here, and why:
- ``streaming_funnel`` / ``streaming_gapfill`` — applyInPandasWithState
  transformations (state lives in the engine's checkpoint, replay is
  the engine's own contract), not foreachBatch registries.
- ``streaming_exact_dedup`` / ``streaming_tumbling_counts`` /
  ``streaming_sliding_counts`` / ``streaming_session_counts`` /
  ``streaming_ks_drift`` (covered in test_exactly_once) — watermark/
  dropDuplicates operators or already swept there.
"""

from __future__ import annotations

import datetime as dt
import os
import time
from dataclasses import dataclass, field
from typing import Callable

import pytest
from pyspark.sql import functions as F

from patternly_spark.streaming.exactly_once import read_registry


def _delete_last_commit(ckpt: str) -> int:
    commits = sorted(
        int(f) for f in os.listdir(os.path.join(ckpt, "commits")) if f.isdigit()
    )
    last = commits[-1]
    os.remove(os.path.join(ckpt, "commits", str(last)))
    crc = os.path.join(ckpt, "commits", f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    return last


def _drain(spark, q) -> None:
    assert q.awaitTermination(180)
    q.stop()
    for _ in range(200):
        if all(x.id != q.id for x in spark.streams.active):
            return
        time.sleep(0.05)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


@dataclass
class Case:
    schema: str
    batches: list  # exactly 2 row-lists, honoring the registry's contract
    launch: Callable  # (spark, stream_df, base_dir) -> StreamingQuery
    states: list  # relative state paths to compare
    marks: list = field(default_factory=list)


def _toy_image(seed: int, h: int = 16, w: int = 16):
    import numpy as np

    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    gx = np.linspace(0, 255, w, dtype=np.uint8)
    base[:, :, 0] = gx[None, :]
    return base


def _png_batches():
    import numpy as np  # noqa: F401

    from patternly_spark.pfsa.draw import encode_png

    base = _toy_image(1)
    near = base.copy()
    near[2, 2, 0] ^= 2
    far = _toy_image(9)
    b0 = [(1, bytearray(encode_png(base))), (5, bytearray(encode_png(far)))]
    b1 = [(2, bytearray(encode_png(near))), (9, bytearray(encode_png(_toy_image(4))))]
    return b0, b1


# --- per-registry specs ------------------------------------------------------

def _cases() -> dict[str, Case]:
    vec_a = [float((i * 7) % 11 - 5) for i in range(16)]
    vec_b = [float((i * 5) % 13 - 6) for i in range(16)]
    vec_c = [float((i * 3) % 17 - 8) for i in range(16)]

    doc_rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1, "spark shuffles partition data across executors during wide stages"),
        (2, "the quick brown fox jumps over the lazy cat near the river bank"),
        (3, "catalyst optimizes logical plans before tungsten generates bytecode"),
    ]

    c: dict[str, Case] = {}

    def add(name, schema, b0, b1, launch, states, marks=()):
        c[name] = Case(schema, [b0, b1], launch, states, list(marks))

    # --- dedup family
    from patternly_spark.streaming.dedup import (
        streaming_boilerplate_registry,
        streaming_neardup_dedup,
        streaming_semantic_dedup,
        streaming_set_similarity_join,
    )

    add(
        "neardup_dedup", "doc_id long, text string",
        doc_rows[:2], doc_rows[2:],
        lambda spark, s, d: streaming_neardup_dedup(
            s, registry_path=f"{d}/reg", output_path=f"{d}/out",
            checkpoint_path=f"{d}/ckpt", trigger_once=True,
        ),
        ["reg", "out"],
    )
    add(
        "semantic_dedup", "vec_id long, embedding array<double>",
        [(0, vec_a), (1, vec_b)],
        [(2, [x * 1.1 for x in vec_a]), (3, vec_c)],
        lambda spark, s, d: streaming_semantic_dedup(
            s, registry_path=f"{d}/reg", output_path=f"{d}/out",
            checkpoint_path=f"{d}/ckpt", threshold=0.99, trigger_once=True,
        ),
        ["reg", "out"],
    )
    add(
        "set_similarity_join", "doc_id long, text string",
        doc_rows[:2], doc_rows[2:],
        lambda spark, s, d: streaming_set_similarity_join(
            s, registry_path=f"{d}/reg", output_path=f"{d}/out",
            checkpoint_path=f"{d}/ckpt", threshold=0.5, trigger_once=True,
        ),
        ["reg/sets", "reg/prefix", "out"],  # two sub-registries
    )
    add(
        "boilerplate_registry", "doc_id long, text string",
        [(1, "nav\ncontent one"), (2, "nav\ncontent two")],
        [(3, "nav\ncontent three"), (4, "rare\ncontent four")],
        lambda spark, s, d: streaming_boilerplate_registry(
            s, f"{d}/reg", checkpoint_path=f"{d}/ckpt", trigger_once=True,
        ),
        ["reg"],
    )

    # --- drift family
    from patternly_spark.streaming.drift import (
        streaming_bootstrap_registry,
        streaming_cusum,
        streaming_drift,
        streaming_ema,
        streaming_holt,
        streaming_seasonal_monitor,
        streaming_sprt_registry,
        streaming_survival_registry,
    )

    def _launch_drift(spark, s, d):
        ref = spark.createDataFrame(
            [("a", 80), ("b", 20)], "cat string, ref_cnt long"
        )
        return streaming_drift(
            s, ref, "cat", f"{d}/out", checkpoint_path=f"{d}/ckpt",
            trigger_once=True,
        )

    add(
        "drift_psi", "cat string, v long",
        [("a", 1)] * 8 + [("b", 1)] * 2, [("a", 1)] * 2 + [("b", 1)] * 8,
        _launch_drift, ["out"],
    )
    ts_rows = [("u", 0, 4.0), ("u", 1, 8.0), ("w", 0, 2.0)]
    ts_rows2 = [("u", 2, 0.0), ("w", 1, 6.0), ("x", 0, 1.0)]
    add(
        "ema", "k string, t long, v double", ts_rows, ts_rows2,
        lambda spark, s, d: streaming_ema(
            s, "v", f"{d}/out", by="k", order_col="t",
            checkpoint_path=f"{d}/ckpt", registry_path=f"{d}/reg",
            trigger_once=True,
        ),
        ["out", "reg"],
    )
    add(
        "cusum", "k string, t long, v double",
        [("u", t, 12.0) for t in range(4)], [("u", 4 + t, 12.0) for t in range(4)],
        lambda spark, s, d: streaming_cusum(
            s, "v", f"{d}/out", by="k", order_col="t",
            checkpoint_path=f"{d}/ckpt", registry_path=f"{d}/reg",
            target=10.0, trigger_once=True,
        ),
        ["out", "reg"],
    )
    add(
        "holt", "k string, t long, v double", ts_rows, ts_rows2,
        lambda spark, s, d: streaming_holt(
            s, "v", f"{d}/out", by="k", order_col="t",
            checkpoint_path=f"{d}/ckpt", registry_path=f"{d}/reg",
            trigger_once=True,
        ),
        ["out", "reg"],
    )
    add(
        "seasonal_monitor", "ts timestamp, event_type string, value double",
        [(_ts("2024-03-10 09:30:00"), "load", 100.0),
         (_ts("2024-03-10 12:30:00"), "load", 200.0)],
        [(_ts("2024-03-11 09:30:00"), "load", 101.0),
         (_ts("2024-03-11 13:05:00"), "load", 1.0)],
        lambda spark, s, d: streaming_seasonal_monitor(
            s, f"{d}/reg", checkpoint_path=f"{d}/ckpt", trigger_once=True,
        ),
        ["reg"],
    )
    add(
        "survival_registry", "g string, dur long, event int",
        [("a", 5, 1), ("a", 7, 0), ("b", 3, 1)],
        [("a", 9, 1), ("b", 4, 0), ("b", 6, 1)],
        lambda spark, s, d: streaming_survival_registry(
            s, f"{d}/reg", checkpoint_path=f"{d}/ckpt",
            duration_col="dur", event_col="event", group_cols=["g"],
            trigger_once=True,
        ),
        ["reg"],
    )
    add(
        "sprt_registry", "g string, ts long, y int",
        [("early", i, 1) for i in range(8)],
        [("early", 100 + i, 0) for i in range(4)] + [("fresh", 200 + i, 1) for i in range(6)],
        lambda spark, s, d: streaming_sprt_registry(
            s, f"{d}/reg", checkpoint_path=f"{d}/ckpt", ts_col="ts",
            outcome_col="y", group_cols=["g"], p0=0.2, p1=0.5,
            alpha=0.05, beta=0.05, trigger_once=True,
        ),
        ["reg"],
    )
    from patternly_spark.streaming.drift import (
        streaming_did_registry,
        streaming_jackknife_registry,
        streaming_rank_test_registry,
    )

    add(
        "did_registry", "unit long, arm string, is_post int, cents long",
        [(u, "a" if u % 2 == 0 else "b", 0, 100 + u) for u in range(8)],
        [(u, "a" if u % 2 == 0 else "b", 1, 150 + u) for u in range(8)],
        lambda spark, s, d: streaming_did_registry(
            s, f"{d}/reg", checkpoint_path=f"{d}/ckpt", unit_col="unit",
            arm_col="arm", is_post_col="is_post", value_cents_col="cents",
            trigger_once=True,
        ),
        ["reg"],
    )
    add(
        "rank_test_registry", "id long, arm string, cents long",
        [(i, "a" if i % 2 == 0 else "b", (i * 7) % 20) for i in range(20)],
        [(100 + i, "a" if i % 2 == 0 else "b", (i * 13) % 20) for i in range(20)],
        lambda spark, s, d: streaming_rank_test_registry(
            s, f"{d}/reg", checkpoint_path=f"{d}/ckpt", arm_col="arm",
            value_cents_col="cents", trigger_once=True,
        ),
        ["reg"],
    )
    from patternly_spark.streaming.drift import streaming_contingency_registry

    add(
        "contingency_registry", "seg string, cat string",
        [("s" + str(i % 3), "c" + str(i % 4)) for i in range(24)],
        [("s" + str(i % 2), "c" + str((i * 5) % 4)) for i in range(24)],
        lambda spark, s, d: streaming_contingency_registry(
            s, f"{d}/reg", checkpoint_path=f"{d}/ckpt", row_col="seg",
            col_col="cat", trigger_once=True,
        ),
        ["reg"],
    )
    from patternly_spark.streaming.drift import streaming_rate_registry

    add(
        "rate_registry", "arm string, ev long, exp long",
        [("a" if i % 2 == 0 else "b", i % 5, 3 + i % 7) for i in range(16)],
        [("a" if i % 2 == 0 else "b", (i * 2) % 5, 4 + i % 6) for i in range(16)],
        lambda spark, s, d: streaming_rate_registry(
            s, f"{d}/reg", checkpoint_path=f"{d}/ckpt", arm_col="arm",
            events_col="ev", exposure_col="exp", trigger_once=True,
        ),
        ["reg"],
    )
    add(
        "jackknife_registry", "arm string, bucket long, cents long",
        [("a" if i % 2 == 0 else "b", i % 4, 100 + 7 * i) for i in range(16)],
        [("a" if i % 2 == 0 else "b", i % 4, 90 + 11 * i) for i in range(16)],
        lambda spark, s, d: streaming_jackknife_registry(
            s, f"{d}/reg", checkpoint_path=f"{d}/ckpt", arm_col="arm",
            bucket_col="bucket", value_cents_col="cents", trigger_once=True,
        ),
        ["reg"],
    )
    from patternly_spark.streaming.temporal import (
        streaming_event_log_registry,
        streaming_its_registry,
    )

    add(
        "event_log_registry", "user_id long, ts long, event_id long",
        [(i % 3, 1_000_000 * i, i) for i in range(12)],
        [(i % 3, 1_000_000 * (50 + i), 50 + i) for i in range(12)],
        lambda spark, s, d: streaming_event_log_registry(
            s, f"{d}/reg", checkpoint_path=f"{d}/ckpt", key_col="user_id",
            ts_col="ts", id_col="event_id", trigger_once=True,
        ),
        ["reg"],
    )
    add(
        "its_registry", "ts timestamp, cents long",
        [(_ts("2024-01-01 08:00:00"), 120), (_ts("2024-01-02 09:00:00"), 80),
         (_ts("2024-01-03 10:00:00"), 200)],
        [(_ts("2024-01-01 18:00:00"), 40), (_ts("2024-01-04 11:00:00"), 310),
         (_ts("2024-01-05 12:00:00"), 150)],
        lambda spark, s, d: streaming_its_registry(
            s, f"{d}/reg", checkpoint_path=f"{d}/ckpt", ts_col="ts",
            value_cents_col="cents", trigger_once=True,
        ),
        ["reg"],
    )
    add(
        "bootstrap_registry", "k long, cents long",
        [(i, 100 + i) for i in range(8)], [(100 + i, 50 + i) for i in range(8)],
        lambda spark, s, d: streaming_bootstrap_registry(
            s, f"{d}/reg", checkpoint_path=f"{d}/ckpt",
            value_cents_col="cents", key_col="k", replicates=8,
            trigger_once=True,
        ),
        ["reg"],
    )

    # --- evaluation family
    from patternly_spark.streaming.evaluation import (
        streaming_conformal_monitor,
        streaming_ranking_registry,
    )

    add(
        "ranking_registry", "query_id long, rank int, rel boolean",
        [(q, r, (q + r) % 2 == 0) for q in range(3) for r in range(1, 5)],
        [(q, r, (q + r) % 2 == 0) for q in range(3, 6) for r in range(1, 5)],
        lambda spark, s, d: streaming_ranking_registry(
            s, f"{d}/reg", checkpoint_path=f"{d}/ckpt", k_values=(1, 3),
            trigger_once=True,
        ),
        ["reg"],
    )

    def _launch_conformal(spark, s, d):
        from patternly_spark.operators.model_eval import conformal_calibration

        cal = spark.createDataFrame(
            [("a", float(i)) for i in range(1, 40)]
            + [("b", float(2 * i)) for i in range(1, 40)],
            "g string, s double",
        )
        qhat = conformal_calibration(
            cal, cal, score_col="s", alphas=(0.1,), by="g"
        ).select("g", "alpha", "q_hat")
        return streaming_conformal_monitor(
            s, qhat, f"{d}/reg", checkpoint_path=f"{d}/ckpt",
            score_col="s", by="g", trigger_once=True,
        )

    add(
        "conformal_monitor", "g string, s double",
        [("a", float((i * 13) % 60)) for i in range(20)],
        [("b", float((i * 29) % 90)) for i in range(20)],
        _launch_conformal, ["reg"],
    )

    # --- graph / markov / merge
    from patternly_spark.streaming.graph import streaming_cc_registry
    from patternly_spark.streaming.markov import streaming_transition_registry
    from patternly_spark.streaming.merge import streaming_scd2_registry, streaming_upsert

    add(
        "cc_registry", "src long, dst long",
        [(0, 1), (2, 3), (4, 5)], [(1, 2), (6, 7)],
        lambda spark, s, d: streaming_cc_registry(
            s, registry_path=f"{d}/reg", checkpoint_path=f"{d}/ckpt",
            trigger_once=True,
        ),
        ["reg"],
    )
    add(
        "transition_registry",
        "ts timestamp, user_id long, event_id long, event_type string",
        [(_ts("2024-01-01 10:00:00"), 7, 1, "a"),
         (_ts("2024-01-01 10:01:00"), 7, 2, "b"),
         (_ts("2024-01-01 10:00:30"), 8, 5, "x")],
        [(_ts("2024-01-01 10:02:00"), 7, 3, "c"),
         (_ts("2024-01-01 10:02:30"), 8, 6, "y")],
        lambda spark, s, d: streaming_transition_registry(
            s, f"{d}/reg", checkpoint_path=f"{d}/ckpt", trigger_once=True,
        ),
        ["reg/counts", "reg/state"],
    )
    add(
        "upsert", "k long, v string, version long",
        [(1, "a1", 1), (2, "b1", 1)], [(1, "a2", 2), (3, "c1", 1)],
        lambda spark, s, d: streaming_upsert(
            s, f"{d}/snap", checkpoint_path=f"{d}/ckpt", key_cols="k",
            version_col="version", trigger_once=True,
        ),
        ["snap"],
    )
    add(
        "scd2_registry", "key long, ts long, attr string",
        [(1, 100, "a"), (2, 100, "x")], [(1, 200, "b"), (2, 100, "y")],
        lambda spark, s, d: streaming_scd2_registry(
            s, f"{d}/reg", checkpoint_path=f"{d}/ckpt", key_col="key",
            ts_col="ts", attr_cols=["attr"], trigger_once=True,
        ),
        ["reg"],
    )

    # --- multimodal / shards
    from patternly_spark.streaming.multimodal import streaming_image_dedup_registry
    from patternly_spark.streaming.shards import streaming_ingest_shards

    png0, png1 = _png_batches()
    add(
        "image_dedup_registry", "media_id long, payload binary",
        png0, png1,
        lambda spark, s, d: streaming_image_dedup_registry(
            s, f"{d}/reg", f"{d}/pairs", checkpoint_path=f"{d}/ckpt",
            trigger_once=True,
        ),
        ["reg", "pairs"],
    )
    add(
        "ingest_shards", "doc_id long, text string",
        [(i, f"body {i} alpha") for i in range(6)],
        [(100 + i, f"body {100 + i} beta") for i in range(6)],
        lambda spark, s, d: streaming_ingest_shards(
            s, f"{d}/shards", checkpoint_path=f"{d}/ckpt", n_shards=2,
            trigger_once=True,
        ),
        ["shards/_manifest", "shards"],
    )

    # --- similarity family
    from patternly_spark.streaming.similarity import (
        streaming_cosine_allpairs,
        streaming_covariance_registry,
        streaming_tfidf_allpairs,
    )

    add(
        "cosine_allpairs", "vec_id long, embedding array<double>",
        [(0, vec_a), (1, [x * 1.05 for x in vec_a])],
        [(2, vec_b), (3, [x * 0.95 for x in vec_b])],
        lambda spark, s, d: streaming_cosine_allpairs(
            s, registry_path=f"{d}/reg", output_path=f"{d}/out",
            checkpoint_path=f"{d}/ckpt", threshold=0.95, trigger_once=True,
        ),
        ["reg", "out"],
    )

    def _launch_tfidf(spark, s, d):
        from patternly_spark.operators.similarity_allpairs import build_idf_snapshot

        docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
        idf = f"{d}/idf"
        build_idf_snapshot(docs).write.mode("overwrite").parquet(idf)
        return streaming_tfidf_allpairs(
            s, registry_path=f"{d}/reg", output_path=f"{d}/out",
            checkpoint_path=f"{d}/ckpt", idf_path=idf, threshold=0.6,
            trigger_once=True,
        )

    add(
        "tfidf_allpairs", "doc_id long, text string",
        doc_rows[:2], doc_rows[2:],
        _launch_tfidf, ["reg", "out"],
    )
    add(
        "covariance_registry", "vec_id long, embedding array<double>",
        [(0, vec_a[:4]), (1, vec_b[:4])], [(2, vec_c[:4]), (3, vec_a[:4])],
        lambda spark, s, d: streaming_covariance_registry(
            s, registry_path=f"{d}/reg", checkpoint_path=f"{d}/ckpt",
            trigger_once=True,
        ),
        ["reg"],
    )

    # --- sketches
    from patternly_spark.streaming.sketches import (
        streaming_count_min,
        streaming_frequent_items,
        streaming_hll_registry,
        streaming_log2_histogram,
    )

    add(
        "count_min", "item string",
        [(f"x{i % 5}",) for i in range(20)], [("hot",)] * 6 + [("y",)] * 3,
        lambda spark, s, d: streaming_count_min(
            s, "item", f"{d}/reg", checkpoint_path=f"{d}/ckpt", depth=2,
            width=16, trigger_once=True,
        ),
        ["reg"],
    )
    add(
        "frequent_items", "g string, item string",
        [("g", "hot")] * 12 + [("g", f"t{i}") for i in range(10)],
        [("g", "hot")] * 8 + [("g", "warm")] * 6,
        lambda spark, s, d: streaming_frequent_items(
            s, "g", "item", f"{d}/reg", checkpoint_path=f"{d}/ckpt",
            capacity=8, trigger_once=True,
        ),
        ["reg"],
    )
    add(
        "hll_registry", "item string",
        [(f"u{i}",) for i in range(40)], [(f"u{i}",) for i in range(20, 60)],
        lambda spark, s, d: streaming_hll_registry(
            s, "item", f"{d}/reg", checkpoint_path=f"{d}/ckpt", p=6,
            trigger_once=True,
        ),
        ["reg"],
    )
    add(
        "log2_histogram", "g string, v long",
        [("a", i * 7 % 100) for i in range(20)],
        [("a", i * 13 % 500) for i in range(20)] + [("b", 3)] * 3,
        lambda spark, s, d: streaming_log2_histogram(
            s, "v", f"{d}/reg", checkpoint_path=f"{d}/ckpt", by="g",
            trigger_once=True,
        ),
        ["reg"],
    )

    # --- validate
    from patternly_spark.streaming.validate import streaming_quality_registry

    rules = [
        {"column": "k", "check": "unique"},
        {"column": "name", "check": "complete"},
    ]
    add(
        "quality_registry", "k long, name string",
        [(1, "a"), (2, None)], [(2, "b"), (3, "c")],
        lambda spark, s, d: streaming_quality_registry(
            s, rules, counters_path=f"{d}/counters",
            values_path=f"{d}/values", checkpoint_path=f"{d}/ckpt",
            trigger_once=True,
        ),
        ["counters", "values"],
    )

    return c


CASES = _cases()


def _state_rows(spark, path: str):
    if not os.path.exists(path):
        return None
    return sorted(str(r) for r in read_registry(spark, path).collect())


def _run_arm(spark, case: Case, base: str, crash: bool):
    os.makedirs(base, exist_ok=True)
    src = f"{base}/src"

    def write_batch(i: int):
        spark.createDataFrame(case.batches[i], case.schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def start():
        stream = (
            spark.readStream.schema(case.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        _drain(spark, case.launch(spark, stream, base))

    write_batch(0)
    start()  # batch 0 processed and committed
    if crash:
        assert _delete_last_commit(f"{base}/ckpt") == 0
    write_batch(1)
    start()  # crash arm: replay batch 0 (same id), then batch 1
    return {rel: _state_rows(spark, f"{base}/{rel}") for rel in case.states}


@pytest.mark.parametrize("name", sorted(CASES))
def test_registry_state_identical_after_first_batch_replay(spark, tmp_path, name):
    case = CASES[name]
    crashed = _run_arm(spark, case, str(tmp_path / "crash"), crash=True)
    clean = _run_arm(spark, case, str(tmp_path / "clean"), crash=False)
    for rel in case.states:
        assert crashed[rel] is not None, f"{name}: state {rel} missing"
        assert crashed[rel] == clean[rel], (
            f"{name}: state {rel} diverged after batch-0 crash-replay"
        )
