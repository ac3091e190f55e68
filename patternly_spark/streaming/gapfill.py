"""Streaming time_bucket_gapfill — the continuous twin of
``operators/rollup.gapfill``.

Semantics: per key, once the event-time watermark passes a bucket's end,
that bucket is FINAL and is emitted exactly once — as a known row (its
aggregate) or, if no event landed in it, as a generated INTERIOR gap row
filled by the chosen method.  Trailing gaps (nothing known after them
yet) are held back and emitted when a later event proves them interior —
the batch operator's [first, last]-known range, arriving incrementally.
Only ``locf`` and ``none`` fills exist here: ``linear`` needs the NEXT
known bucket at emission time, and emit-on-close plus interpolation are
mutually exclusive (run the batch operator over closed history for
linear).

State per key: three scalars + the pending (not-yet-closed) bucket
aggregates — bounded by the watermark horizon, the bound every windowed
streaming aggregate carries.  Closure follows the engine's own
watermark (``GroupState.getCurrentWatermarkMs``); an event-time timeout
re-invokes quiet keys so their last buckets close without waiting for
the key's next event.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["streaming_gapfill"]

STATE_SCHEMA = T.StructType([T.StructField("blob", T.StringType(), True)])

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("window_start", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("val", T.DoubleType(), True),
        T.StructField("val_filled", T.DoubleType(), True),
    ]
)


def _process_factory(width_us: int, agg: str, method: str):
    def process(key, pdfs, state: GroupState):
        if state.exists:
            blob = json.loads(state.get[0])
        else:
            blob = {"next_emit": None, "last_val": None, "pend": {}}
        pend: dict[str, list] = blob["pend"]  # bucket(str) -> [n, val]

        for pdf in pdfs:
            if not len(pdf):
                continue
            for ts_us, v in zip(pdf["ts_us"], pdf["value"]):
                b = str(int(ts_us) - int(ts_us) % width_us)
                cur = pend.get(b)
                if cur is None:
                    # count's val is the running n, not the event's value
                    pend[b] = [1, 1.0 if agg == "count" else float(v)]
                elif agg == "max":
                    cur[0] += 1
                    cur[1] = max(cur[1], float(v))
                elif agg == "min":
                    cur[0] += 1
                    cur[1] = min(cur[1], float(v))
                else:  # count
                    cur[0] += 1
                    cur[1] = float(cur[0])

        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        # a bucket [b, b+W) is final once the watermark reaches b+W
        close_before = wm_us - wm_us % width_us
        out = []
        start = blob["next_emit"]
        if start is None and pend:
            start = min(int(b) for b in pend)
        if start is not None:
            b = start
            while b < close_before:
                rec = pend.pop(str(b), None)
                if rec is not None:
                    blob["last_val"] = rec[1]
                    out.append((str(key[0]), b, int(rec[0]), rec[1], rec[1]))
                elif any(int(x) > b for x in pend):
                    # interior gap: a later known bucket already exists
                    filled = blob["last_val"] if method == "locf" else None
                    out.append((str(key[0]), b, 0, None, filled))
                else:
                    break  # trailing (so far): resume when later events arrive
                b += width_us
            blob["next_emit"] = b
        state.update((json.dumps(blob),))
        if pend:
            # wake this key when its earliest pending bucket can close,
            # even if no further events arrive for it
            next_close_ms = (min(int(x) for x in pend) + width_us) // 1000
            state.setTimeoutTimestamp(max(next_close_ms, wm_ms + 1))
        yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return process


def streaming_gapfill(
    stream: DataFrame,
    *,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    width_secs: int,
    watermark: str = "10 seconds",
    agg: str = "max",
    method: str = "locf",
) -> DataFrame:
    """(key, ts timestamp, value) stream -> finalized gapfilled buckets
    (key, window_start us, n, val, val_filled), append-mode."""
    if agg not in ("max", "min", "count"):
        raise ValueError(f"unsupported agg {agg!r}")
    if method not in ("locf", "none"):
        raise ValueError(f"unsupported streaming fill {method!r} (linear is batch-only)")
    width_us = int(width_secs) * 1_000_000
    prepared = stream.withWatermark(ts_col, watermark).select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _process_factory(width_us, agg, method),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
