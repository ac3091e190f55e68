"""Bucketed-table materialization: pre-shuffle a corpus ONCE, join forever.

Every equi-join/groupBy on a key shuffles its inputs to co-locate equal
keys.  For a corpus that is joined repeatedly on the same key — dedup
verification (candidate pairs x corpus text), incremental ingestion
(today's batch x yesterday's canon), per-document feature lookups — the
100 TB side would re-shuffle on every run.  Bucketing persists the
shuffle: ``bucketBy(n, key)`` writes each partition pre-hashed into
``n`` bucket files, and every later scan reports that hash layout to
Catalyst, so joins/aggregations on the key skip the Exchange entirely.
Only the small (new/probe) side shuffles — into ``n`` buckets to meet
the corpus layout.

This is the Spark-native replacement for the reference's ad-hoc on-disk
library directory (reference keeps PFSA/text artifacts as loose files,
``patternly/detection.py:414-454``): same persistence role, plus the
co-located-join contract.

Bucketed tables live in the session catalog (``saveAsTable``); pass
``path`` to pin the parquet location (external table) so the data
outlives the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    name: str,
    *,
    bucket_by: str,
    n_buckets: int = 64,
    sort_by: str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed parquet table.

    ``bucket_by`` should be the join/aggregation key of the repeated
    workload; ``sort_by`` additionally sorts within buckets (merge joins
    then skip the per-task sort too).  ``n_buckets`` bounds join
    parallelism — size it so one bucket of the LARGEST table fits an
    executor core (e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket of raw
    scan, far less after pruning)."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_by)
    if sort_by is not None:
        w = w.sortBy(sort_by)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Scan a bucketed table.  The bucket layout rides along in the scan's
    output partitioning — joins/groupBys on the bucket key need no
    Exchange (assert with ``df.explain``; pinned in
    tests/test_sources_and_plans.py)."""
    return spark.table(name)
