"""Streaming ordered-funnel tracking — the continuous twin of
``operators/behavior.funnel``.

State per user: the funnel position (stage, matched timestamps) plus a
buffer of not-yet-final events.  Events are only folded into the funnel
once the watermark passes them, IN EVENT-TIME ORDER — so out-of-order
arrival within the watermark cannot corrupt the stage (the batch
operator sorts; this buffers until sorting is safe).  The fold itself
is the SAME advance rule as the batch operator (strictly-after
chaining, optional within-budget restart), so the emitted stages agree
with a batch replay of the closed prefix — asserted in tests.

Emission (append mode): one row per stage ADVANCE — (user,
steps_completed, advanced_at_us, step_ts) — a monotone, append-safe
stream; the latest row per user is their current funnel position.  An
event-time timeout re-invokes quiet users so buffered events fold
without waiting for the user's next event.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_funnel"]

STATE_SCHEMA = T.StructType([T.StructField("blob", T.StringType(), True)])

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("steps_completed", T.IntegerType(), False),
        T.StructField("advanced_at_us", T.LongType(), False),
        T.StructField("step_ts", T.ArrayType(T.LongType()), False),
    ]
)


def _advance(stage, hits, steps, t, tp, within):
    """EXACTLY the batch fold's advance rule (behavior.funnel)."""
    k = len(steps)
    matched = (
        stage < k
        and tp == steps[stage]
        and (stage == 0 or t > hits[-1])
        and (within is None or stage == 0 or t - hits[0] <= within)
    )
    if matched:
        return stage + 1, hits + [t]
    if within is not None and 0 < stage < k and tp == steps[0]:
        return 1, [t]  # budget-blown restart on a step-1 candidate
    return stage, hits


def _process_factory(steps: list[str], within):
    def process(key, pdfs, state: GroupState):
        if state.exists:
            blob = json.loads(state.get[0])
        else:
            blob = {"stage": 0, "hits": [], "buf": []}
        buf = [tuple(e) for e in blob["buf"]]

        for pdf in pdfs:
            if len(pdf):
                buf.extend(
                    (int(t), str(tp)) for t, tp in zip(pdf["ts_us"], pdf["event_type"])
                )

        wm_us = state.getCurrentWatermarkMs() * 1000
        ready = sorted(e for e in buf if e[0] < wm_us)
        buf = [e for e in buf if e[0] >= wm_us]

        out = []
        stage, hits = blob["stage"], blob["hits"]
        for t, tp in ready:
            new_stage, new_hits = _advance(stage, hits, steps, t, tp, within)
            if new_stage != stage:  # advance, or a budget-blown restart
                out.append((str(key[0]), int(new_stage), t, list(new_hits)))
            stage, hits = new_stage, new_hits

        state.update((json.dumps({"stage": stage, "hits": hits, "buf": buf}),))
        if buf:
            next_ms = (min(e[0] for e in buf)) // 1000 + 1
            state.setTimeoutTimestamp(max(next_ms, state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return process


def streaming_funnel(
    stream: DataFrame,
    *,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    watermark: str = "10 seconds",
    within: int | None = None,
) -> DataFrame:
    """(user, event_type, ts timestamp) stream -> stage-advance rows,
    append-mode.  ``within`` in microseconds, as in the batch operator."""
    if not steps:
        raise ValueError("steps must be non-empty")
    prepared = stream.withWatermark(ts_col, watermark).select(
        F.col(user_col).cast("string").alias("user_id"),
        F.col(ts_col),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.col(type_col).alias("event_type"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _process_factory(list(steps), within),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
