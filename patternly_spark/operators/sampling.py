"""Deterministic hash-based sampling for training-data curation.

``df.sample()`` is seeded per-partition, so its output changes with
partitioning and engine — useless for reproducible corpus curation or for
cross-engine verification.  These samplers hash a stable row key to a
uniform [0,1) fraction (md5 prefix -> u32 / 2^32) instead:

- same rows selected on ANY engine / partitioning / cluster size,
- exactly replicable in SQL (the DuckDB oracle runs the same md5),
- sampling a growing table is stable: previously-kept rows stay kept,
- per-stratum rates (downsample by language/domain/source) are one
  CASE expression, no per-stratum scans.

Pure JVM column expressions — a narrow filter that pushes to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_fraction(key: Column, *, seed: str = "") -> Column:
    """Deterministic uniform [0,1) from the md5 of (seed || key).

    Uses the first 8 hex digits (32 bits) — granularity 2^-32, far below
    any useful sampling rate.  Changing ``seed`` draws an independent
    sample."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(seed), key.cast("string"))), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(2**32))
    )


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate: float,
    *,
    seed: str = "",
) -> DataFrame:
    """Keep each row iff hash_fraction(key) < rate.  Deterministic,
    partitioning-invariant, engine-portable."""
    return df.filter(hash_fraction(F.col(key_col), seed=seed) < F.lit(float(rate)))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 0.0,
    seed: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: row kept iff
    hash_fraction(key) < rates[stratum] (``default_rate`` for strata not
    listed).  The canonical corpus-curation move — e.g. keep 100% of rare
    languages, 10% of English — in one scan + one narrow filter."""
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == F.lit(value), F.lit(float(r))).otherwise(rate)
    return df.filter(hash_fraction(F.col(key_col), seed=seed) < rate)
