"""Exactly-once primitives for foreachBatch registries.

``foreachBatch`` is AT-LEAST-ONCE: Structured Streaming commits a
microbatch to the checkpoint (``commits/<batch_id>``) only AFTER the
user function returns.  A crash between the registry writes and that
commit re-offers the batch on restart with the SAME ``batch_id`` — a
registry that read-then-appends would duplicate the batch's rows, and a
read-merge-overwrite fold would double-fold additive sums.  Plain
``mode("overwrite")`` is worse still: static overwrite deletes the
target before writing, so a crash mid-write silently destroys the only
copy of the state.

Two primitives close both gaps, keyed on ``batch_id`` (reference
parity note: the reference engine has no streaming restart story at
all — its pipelines are single-process notebook runs; this module is
the Spark-native contract its semantics need at scale):

1. **Versioned snapshots** — for read-merge-overwrite fold registries.
   Batch *N* reads the latest committed snapshot with id < *N*, folds,
   and writes ``<state>/snap_<N>/`` with overwrite.  A retry of *N*
   re-reads the same predecessor (still on disk — snapshots are never
   overwritten in place) and rewrites ``snap_<N>`` byte-identically:
   no double-fold, no lost state, wherever the first attempt died.
   Older snapshots beyond ``keep`` are pruned only after the new one
   commits.

2. **Per-batch partition appends** — for append-style outputs and
   registries.  Rows land under ``_batch_id=<N>/`` via dynamic
   partition overwrite, so a retry REPLACES its own partition instead
   of appending beside the orphaned first attempt.  Readers inside a
   batch must exclude ``_batch_id >= N`` (a completed-but-uncommitted
   prior attempt of *N* must not be visible as history); partition
   pruning makes the filter free.

Both layouts are plain parquet under any Hadoop-compatible filesystem
(local, HDFS, object stores via their committers) — no lakehouse
dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "committed_snapshot_ids",
    "read_latest_snapshot",
    "write_snapshot",
    "write_batch_partition",
    "read_appended",
    "read_registry",
    "BATCH_COL",
]

SNAP_PREFIX = "snap_"
BATCH_COL = "_batch_id"


def _hadoop(spark: SparkSession, path_str: str):
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path, jvm


def committed_snapshot_ids(spark: SparkSession, state_path: str) -> list[int]:
    """Sorted batch ids of COMMITTED snapshots (``snap_<id>/_SUCCESS``
    present) under ``state_path``."""
    fs, root, jvm = _hadoop(spark, state_path)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(SNAP_PREFIX)):
            continue
        try:
            bid = int(name[len(SNAP_PREFIX):])
        except ValueError:
            continue
        if fs.exists(jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")):
            out.append(bid)
    return sorted(out)


def _legacy_flat_files(spark: SparkSession, path_str: str) -> list[str]:
    """Parquet data files sitting DIRECTLY under ``path_str`` (an
    externally seeded / legacy flat registry) — snapshot dirs and other
    subdirectories excluded."""
    fs, root, _ = _hadoop(spark, path_str)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() or name.startswith(("_", ".")):
            continue
        out.append(f"{path_str}/{name}")
    return sorted(out)


def read_latest_snapshot(
    spark: SparkSession, state_path: str, *, before_batch: int | None = None
) -> tuple[DataFrame | None, int | None]:
    """(df, batch_id) of the newest committed snapshot — restricted to
    ids < ``before_batch`` when given (a batch folding on top of history
    must never see its own earlier attempt).  Falls back to reading bare
    parquet at ``state_path`` itself (an externally seeded / legacy
    registry) when no ELIGIBLE snapshot exists — including on a retry of
    the first batch whose own orphaned snapshot is the only one present:
    an externally seeded flat registry can coexist with that orphan, and
    dropping it there would lose the seed permanently.  Returns
    (None, None) when there is no state at all."""
    all_ids = committed_snapshot_ids(spark, state_path)
    ids = (
        [i for i in all_ids if i < int(before_batch)]
        if before_batch is not None
        else all_ids
    )
    if ids:
        bid = ids[-1]
        return spark.read.parquet(f"{state_path}/{SNAP_PREFIX}{bid}"), bid
    if all_ids:
        # snapshots exist but all are >= before_batch: a RETRY of the
        # first batch.  Its own orphan is not history, but a seeded flat
        # registry next to it IS — read the bare files, not the dirs.
        flat = _legacy_flat_files(spark, state_path)
        if flat:
            return spark.read.parquet(*flat), None
        return None, None
    # No committed snapshot at all.  A crash DURING write_snapshot(0) can
    # leave an UNCOMMITTED snap_0 dir (no _SUCCESS) beside a flat seed;
    # reading the whole directory would fail on the mixed layout and the
    # except would silently drop the seed — so read the bare files first
    # (same rule as the orphan-retry branch above).
    flat = _legacy_flat_files(spark, state_path)
    if flat:
        return spark.read.parquet(*flat), None
    try:
        # partitioned (key=value) seeded registries have no flat files;
        # a plain directory read still covers them
        return spark.read.parquet(state_path), None
    except Exception:
        return None, None


def write_snapshot(
    df: DataFrame, state_path: str, batch_id: int, *, keep: int = 3
) -> None:
    """Write ``state_path/snap_<batch_id>/`` (overwrite — retries of the
    same batch replace their own snapshot), then prune committed
    snapshots beyond the newest ``keep``.  ``keep`` must be >= 2 so a
    retry of the next batch still finds its predecessor."""
    if keep < 2:
        raise ValueError(f"keep must be >= 2 (retry needs the predecessor), got {keep}")
    bid = int(batch_id)
    df.write.mode("overwrite").parquet(f"{state_path}/{SNAP_PREFIX}{bid}")
    spark = df.sparkSession
    ids = committed_snapshot_ids(spark, state_path)
    stale = [i for i in (ids[:-keep] if len(ids) > keep else []) if i != bid]
    if stale:
        fs, _, jvm = _hadoop(spark, state_path)
        for i in stale:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(f"{state_path}/{SNAP_PREFIX}{i}"), True
            )


def _existing_sub_scheme(
    spark: SparkSession, output_path: str, *, exclude_batch: int | None = None
) -> tuple[str, ...] | None:
    """Partition columns nested UNDER the existing ``_batch_id=`` dirs
    (in nesting order), derived by walking the first non-empty batch
    dir's ``name=value`` chain — or None when no prior batch dir holds
    any data (empty dirs are invisible to Spark's file-driven partition
    inference, so they constrain nothing).  ``exclude_batch`` skips the
    writing batch's own orphan (a retry must be judged against the
    OTHER batches' layout, not its own failed attempt)."""
    fs, root, _ = _hadoop(spark, output_path)
    if not fs.exists(root):
        return None
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(f"{BATCH_COL}=")):
            continue
        if exclude_batch is not None:
            try:
                if int(name.split("=", 1)[1]) == int(exclude_batch):
                    continue
            except ValueError:
                pass
        scheme: list[str] = []
        cur = st.getPath()
        has_data = False
        while True:
            kids = list(fs.listStatus(cur))
            sub = None
            for k in kids:
                kname = k.getPath().getName()
                # partition dirs always carry '=' (which also covers
                # engine-internal names like _day=); marker dirs such
                # as _temporary never do
                if k.isDirectory() and "=" in kname:
                    sub = k.getPath()
                    break
                if not k.isDirectory() and not kname.startswith(("_", ".")):
                    has_data = True
            if sub is None:
                break
            scheme.append(sub.getName().split("=", 1)[0])
            cur = sub
        if has_data or scheme:
            return tuple(scheme)
    return None


def write_batch_partition(
    df: DataFrame,
    output_path: str,
    batch_id: int,
    *,
    sub_partition_cols: tuple[str, ...] = (),
) -> None:
    """Idempotent per-batch append: write ``df`` under
    ``output_path/_batch_id=<batch_id>/`` with DYNAMIC partition
    overwrite — only this batch's partition is replaced, earlier
    batches' files are untouched, and a retry overwrites its own orphan
    instead of duplicating it.

    ``sub_partition_cols`` adds registry-specific partition columns
    UNDER the batch dir (e.g. a coarse time bucket so readouts can
    partition-prune by time range — ST37).  BATCH_COL stays first.
    With sub-partitions, dynamic overwrite alone would replace only the
    LEAF partitions present in the retry's data — a retry whose
    replayed batch covers fewer sub-partition values than the failed
    first attempt would leave orphan leaf dirs inside the batch
    partition — so the batch's own existing dir is DELETED first: a
    retry replaces exactly this batch's whole tree (safe because the
    batch is by definition uncommitted until ``foreachBatch`` returns,
    and other batches' dirs are never touched).

    Refuses two mixed layouts Spark's partition discovery cannot read
    back (instead of writing them and poisoning the registry):

    - a target already holding a LEGACY FLAT registry (parquet files
      directly under ``output_path``) — migrate the seed first (read
      it, re-write via ``write_batch_partition`` with a sentinel batch
      id < the stream's first batch);
    - a target whose EXISTING batch dirs carry a different
      sub-partition scheme than this write requests (e.g. earlier
      batches written without ``_day``, new writes with it — partition
      inference rejects the mixed tree as 'conflicting directory
      structures', silently making the whole registry unreadable while
      the writer keeps appending).  Migrate by reading the old batches
      and rewriting them under the new scheme."""
    spark = df.sparkSession
    flat = _legacy_flat_files(spark, output_path)
    if flat:
        raise ValueError(
            f"{output_path} holds a legacy flat registry ({len(flat)} bare "
            f"parquet files); writing {BATCH_COL}= partitions beside them "
            "would produce a mixed layout partition discovery cannot read. "
            "Migrate the flat seed to a partitioned write first."
        )
    existing = _existing_sub_scheme(
        spark, output_path, exclude_batch=int(batch_id)
    )
    if existing is not None and existing != tuple(sub_partition_cols):
        raise ValueError(
            f"{output_path} holds batches sub-partitioned by {existing}, "
            f"but this write requests {tuple(sub_partition_cols)}; the mixed "
            "tree would be unreadable ('conflicting directory structures'). "
            "Migrate the existing batches to the new scheme first."
        )
    if sub_partition_cols:
        fs, _, jvm = _hadoop(spark, output_path)
        own = jvm.org.apache.hadoop.fs.Path(
            f"{output_path}/{BATCH_COL}={int(batch_id)}"
        )
        if fs.exists(own):
            # drop the failed attempt's whole tree so leaf partitions it
            # wrote but this retry does not cover cannot survive as
            # orphans inside the batch partition
            fs.delete(own, True)
    (
        df.withColumn(BATCH_COL, F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BATCH_COL, *sub_partition_cols)
        .parquet(output_path)
    )


def read_appended(
    spark: SparkSession, output_path: str, *, before_batch: int | None = None,
    min_batch: int | None = None,
) -> DataFrame | None:
    """All rows appended via ``write_batch_partition`` (None when the
    path has no data yet).  With ``before_batch``, rows from that batch
    id onward are excluded — the view a RETRY of ``before_batch`` must
    fold against (its own orphaned first attempt is not history).  With
    ``min_batch``, rows from earlier batches are excluded — the
    retention-horizon view a BOUNDED registry probes (ST24b).  Both
    filters are partition predicates: pruned at the file listing, never
    scanned (a legacy flat layout has no batch column, so ``min_batch``
    is ignored there — a flat seed is the horizon's batch 0).

    Only GENUINELY-EMPTY targets map to None (path absent, or present
    with no data files).  A read that fails on data that exists — e.g.
    a mixed-scheme tree ('conflicting directory structures') —
    RE-RAISES: mapping it to None would let callers report 'no data'
    while the registry silently rotted."""
    fs, root, _ = _hadoop(spark, output_path)
    if not fs.exists(root):
        return None
    try:
        df = spark.read.parquet(output_path)
    except Exception as ex:
        # an existing-but-fileless tree (crashed first write) is "no
        # data yet"; anything else is a real, surfaced read failure
        if "UNABLE_TO_INFER_SCHEMA" in str(ex):
            return None
        raise
    if BATCH_COL not in df.columns:
        # legacy flat layout (externally seeded registry)
        return df
    if before_batch is not None:
        df = df.filter(F.col(BATCH_COL) < int(before_batch))
    if min_batch is not None:
        df = df.filter(F.col(BATCH_COL) >= int(min_batch))
    return df.drop(BATCH_COL)


def retire_batch_partitions(
    spark: SparkSession, output_path: str, *, below_batch: int
) -> int:
    """Physically delete ``_batch_id=<i>`` partition dirs with
    ``i < below_batch`` — the storage half of a retention-horizon
    policy (ST24b): partitions older than the horizon are never probed
    again (``read_appended(min_batch=...)`` prunes them at the file
    listing), so deleting them bounds registry STORAGE as well as
    per-trigger compute.  A retry of batch N reads batches
    ``[N - horizon, N)``, all >= ``below_batch`` when called with
    ``below_batch = N - horizon`` — retirement never races a retry.
    Returns the number of partitions deleted.  Refuses a legacy flat
    layout (nothing to retire; the flat seed has no batch ids)."""
    fs, root, jvm = _hadoop(spark, output_path)
    if not fs.exists(root):
        return 0
    gone = 0
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(f"{BATCH_COL}=")):
            continue
        try:
            bid = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if bid < int(below_batch):
            fs.delete(st.getPath(), True)
            gone += 1
    return gone


def read_registry(spark: SparkSession, state_path: str) -> DataFrame:
    """Read a registry regardless of layout: latest committed snapshot,
    per-batch partitions, or legacy flat parquet.  The one reader
    finalize functions and tests should use."""
    ids = committed_snapshot_ids(spark, state_path)
    if ids:
        return spark.read.parquet(f"{state_path}/{SNAP_PREFIX}{ids[-1]}")
    df = spark.read.parquet(state_path)
    if BATCH_COL in df.columns:
        df = df.drop(BATCH_COL)
    return df
