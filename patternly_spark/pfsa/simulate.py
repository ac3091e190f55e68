"""Seeded PFSA forward simulation (reference operator X4: zedsuite ``Prun``,
called at ``patternly/detection.py:730``; config shape ``examples/M2.cfg``).

Deterministic given (model, seed): explicit categorical inverse-CDF walk so
the same seed yields identical streams on any platform (FIXTURES.md
determinism requirements).  Two surfaces:

- ``simulate``    : driver-side numpy, returns list of int8 arrays (the
                    bootstrap path for new-PFSA stats needs only ~100 short
                    sequences — driver-side is the right cost model).
- ``simulate_df`` : distributed generation over ``spark.range`` +
                    ``mapInPandas`` for large fixture generation.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from patternly_spark.pfsa.model import PFSA


def _walk(model: PFSA, length: int, rng: np.random.Generator, q0: int | None = None) -> np.ndarray:
    pit_cdf = np.cumsum(model.pitilde, axis=1)
    cnx = model.connx
    if q0 is None:
        # start from the stationary distribution
        q = int(np.searchsorted(np.cumsum(model.stationary()), rng.random(), side="right"))
        q = min(q, model.n_states - 1)
    else:
        q = q0
    u = rng.random(length)
    out = np.empty(length, dtype=np.int8)
    for t in range(length):
        s = int(np.searchsorted(pit_cdf[q], u[t], side="right"))
        s = min(s, model.alphabet_size - 1)
        out[t] = s
        q = int(cnx[q, s])
    return out


def simulate(model: PFSA, data_len: int, num_repeats: int, seed: int = 42) -> list[np.ndarray]:
    """num_repeats sequences of length data_len (Prun signature,
    ``patternly/detection.py:730``)."""
    rng = np.random.default_rng(seed)
    return [_walk(model, data_len, rng) for _ in range(num_repeats)]


def simulate_df(
    spark: SparkSession,
    model: PFSA,
    data_len: int,
    num_repeats: int,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed simulation: (seq_id bigint, symbols array<tinyint>).

    Each task derives its RNG stream from (seed, seq_id), so the output is
    identical regardless of partitioning — safe at any scale.
    """
    payload = model.to_dict()
    schema = T.StructType(
        [
            T.StructField("seq_id", T.LongType(), False),
            T.StructField("symbols", T.ArrayType(T.ByteType()), False),
        ]
    )

    def gen(batches):
        import pandas as pd

        mdl = PFSA.from_dict(payload)
        for pdf in batches:
            rows = []
            for sid in pdf["id"]:
                rng = np.random.default_rng((seed, int(sid)))
                rows.append((int(sid), _walk(mdl, data_len, rng).tolist()))
            yield pd.DataFrame(rows, columns=["seq_id", "symbols"])

    n_part = partitions or max(1, num_repeats // 64)
    return spark.range(num_repeats, numPartitions=n_part).mapInPandas(gen, schema=schema)
