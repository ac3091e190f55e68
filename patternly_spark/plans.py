"""Physical-plan auditing and partition-sizing policy — the "is this
the plan I'd want at 100 TB" check as a first-class utility instead of
ad-hoc string greps.

``plan_audit(df)`` summarizes the executed plan: shuffle count,
join strategies, Python boundaries, codegen spans, and what actually
reached the parquet scans (pushed filters, partition filters, read
schema).  ``assert_plan(df, ...)`` turns the summary into a one-line
guard for tests and pipelines — the repo's plan-shape regression tests
(pushdown, broadcast, zero-shuffle llk, no-BNLJ range join,
single-exchange packing) are all instances of these predicates.

``round_partitions`` + ``tuned_shuffle`` are the engine's
partition-sizing POLICY for round-heavy iterative operators (graph
peels, label propagation, register propagation): the sf30/sf100 scale
rehearsal (SCALING.md) measured that a ~30-round peel pays task-
scheduling overhead per round x per partition, so it wants FEWER,
larger shuffle partitions than a storage-heavy single pass — even at
the cost of graceful disk spill (q189 at sf30: 128 s spilled at 32
partitions vs 202 s spill-free at 128; see BENCH_scale_sf30_p64.json
for the 64-partition knee point).  The policy picks min(session
setting, max(bytes-derived,
cores)) so it only ever LOWERS a too-high session setting toward the
measured knee, never raises it, and is disabled entirely with
SPARK_GRAFT_PARTITION_POLICY=0.
"""

from __future__ import annotations

import math
import os
import re
from contextlib import contextmanager

from pyspark.sql import DataFrame

__all__ = [
    "plan_audit",
    "assert_plan",
    "shuffle_partitions",
    "round_partitions",
    "tuned_shuffle",
    "empty_rows",
    "local_rows",
]


def _plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def plan_audit(df: DataFrame) -> dict:
    """Summarize the physical plan of ``df``.

    Returns a dict with:

    - ``exchanges``: shuffle exchanges (excluding reuse markers) — each
      is a full repartition of its input.
    - ``reused_exchanges``: shuffles Catalyst deduplicated.
    - ``broadcast_joins`` / ``sort_merge_joins`` / ``shuffled_hash_joins``:
      join strategy counts.
    - ``nested_loop_joins``: BroadcastNestedLoopJoin + CartesianProduct —
      almost always a missing equi-condition at scale.
    - ``python_evals``: rows crossing into Python
      (Batch/ArrowEvalPython, MapInPandas, FlatMapGroupsInPandas...).
    - ``codegen_spans``: WholeStageCodegen regions (wider = better).
    - ``scans``: one entry per file scan with ``pushed_filters``,
      ``partition_filters`` and ``read_schema`` as Catalyst printed them.
    - ``aqe``: whether AdaptiveSparkPlan wraps the tree.
    """
    plan = _plan_string(df)
    scans = []
    for m in re.finditer(r"FileScan \w+ [^\n]*", plan):
        line = m.group(0)
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", line)
        part = re.search(r"PartitionFilters: \[([^\]]*)\]", line)
        schema = re.search(r"ReadSchema: ([^,\n]*)", line)
        scans.append(
            {
                "pushed_filters": pushed.group(1) if pushed else "",
                "partition_filters": part.group(1) if part else "",
                "read_schema": schema.group(1) if schema else "",
            }
        )
    return {
        "exchanges": len(re.findall(r"(?<!Reused)Exchange", plan)),
        "reused_exchanges": len(re.findall(r"ReusedExchange", plan)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "shuffled_hash_joins": len(re.findall(r"ShuffledHashJoin", plan)),
        "nested_loop_joins": len(
            re.findall(r"BroadcastNestedLoopJoin|CartesianProduct", plan)
        ),
        "python_evals": len(
            re.findall(
                r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"
                r"|AggregateInPandas|MapInArrow",
                plan,
            )
        ),
        "codegen_spans": len(re.findall(r"\*\(\d+\)|WholeStageCodegen", plan)),
        "scans": scans,
        "aqe": "AdaptiveSparkPlan" in plan,
    }


def assert_plan(
    df: DataFrame,
    *,
    max_exchanges: int | None = None,
    no_python: bool = False,
    no_nested_loop: bool = True,
    require_broadcast_join: bool = False,
    require_pushed_filter: str | None = None,
    require_partition_filter: bool = False,
) -> dict:
    """Assert plan-shape invariants; returns the audit for further
    checks.  Raises AssertionError naming the violated invariant with
    the audit attached — meant for tests AND for guarding production
    pipelines before a 1000-executor submit."""
    audit = plan_audit(df)
    if max_exchanges is not None and audit["exchanges"] > max_exchanges:
        raise AssertionError(
            f"plan has {audit['exchanges']} exchanges > {max_exchanges}: {audit}"
        )
    if no_python and audit["python_evals"]:
        raise AssertionError(f"plan crosses into Python {audit['python_evals']}x: {audit}")
    if no_nested_loop and audit["nested_loop_joins"]:
        raise AssertionError(f"plan contains nested-loop/cartesian joins: {audit}")
    if require_broadcast_join and not audit["broadcast_joins"]:
        raise AssertionError(f"expected a broadcast join: {audit}")
    if require_pushed_filter is not None and not any(
        require_pushed_filter in s["pushed_filters"] for s in audit["scans"]
    ):
        raise AssertionError(
            f"no scan pushed a filter matching {require_pushed_filter!r}: {audit}"
        )
    if require_partition_filter and not any(
        s["partition_filters"] for s in audit["scans"]
    ):
        raise AssertionError(f"no scan carries partition filters: {audit}")
    return audit


# ---------------------------------------------------------------------------
# Partition-sizing policy (round-heavy iterative operators)
# ---------------------------------------------------------------------------

# Target shuffle bytes PER TASK for a round-heavy operator.  Calibrated
# against the sf30/sf100 scale rehearsal (SCALING.md round-7/8 addenda):
# at sf30 the k-core peel was FASTER spilled at 32 partitions (128 s,
# 11.3 GB graceful spill) than spill-free at 128 (202 s) because ~30
# rounds pay scheduling overhead per round x per partition, and the
# avoided spill was cheap sequential disk.  512 MiB/task reproduces the
# measured winner at sf30 while still growing the partition count
# linearly with the data (sf100 -> ~3x more partitions than sf30).
ROUND_TASK_BYTES = 512 * 1024 * 1024


def _parse_mem_bytes(s: str) -> int | None:
    """Spark memory-conf string -> bytes (``8g``/``512m``/``1t``/
    ``4096`` — a bare number follows ``spark.executor.memory``'s MiB
    default unit).  None on anything unparseable."""
    try:
        t = str(s).strip().lower().removesuffix("b")
        mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
        if t and t[-1] in mult:
            return int(float(t[:-1]) * mult[t[-1]])
        return int(float(t) * (1 << 20))
    except (ValueError, TypeError):
        return None


def _heap_task_bytes_cap(spark) -> int:
    """Upper bound on per-task bytes the EXECUTOR HEAP can actually
    sort: half the heap per concurrent task slot, floored at 64 MiB.
    The 512 MiB/task policy target implicitly assumes ~1 GiB+ of heap
    per core (any production executor sizing); a local[32] session on
    an 8g heap has 256 MiB/core, where a 512 MiB task's sort pointer
    arrays alone are ~128 MiB humongous allocations — the round-10
    sf30 repeat protocol caught q189/q218 OOMing ~1 in 3 runs exactly
    there.  Capping task bytes by heap-per-slot makes the policy
    deployment-aware: production sizings keep the measured 512 MiB
    optimum, memory-tight local sessions trade a few more partitions
    for never OOMing.

    WHICH heap depends on the deployment: in ``local[*]`` the driver
    JVM's ``Runtime.maxMemory`` IS the task heap, divided by the local
    core count.  On a real cluster the driver heap says NOTHING about
    executors (an 8g driver in front of 400 executor cores is normal),
    so the cap reads ``spark.executor.memory`` / ``spark.executor.
    cores`` from the conf instead — and when those are absent
    (platform-managed sizing) it declines to cap at all, leaving the
    measured 512 MiB policy target in force."""
    try:
        master = str(spark.conf.get("spark.master", "") or "")
    except Exception:
        master = ""
    if master.startswith("local"):
        try:
            max_mem = int(spark._jvm.java.lang.Runtime.getRuntime().maxMemory())
        except Exception:
            return ROUND_TASK_BYTES
        cores = max(1, spark.sparkContext.defaultParallelism)
        return max(64 * 1024 * 1024, int(max_mem / cores / 2))
    try:
        em = spark.conf.get("spark.executor.memory", None)
        ec = spark.conf.get("spark.executor.cores", None)
    except Exception:
        return ROUND_TASK_BYTES
    mem_bytes = _parse_mem_bytes(em) if em else None
    if not mem_bytes:
        return ROUND_TASK_BYTES
    try:
        cores = max(1, int(ec)) if ec else 1
    except (ValueError, TypeError):
        cores = 1
    return max(64 * 1024 * 1024, int(mem_bytes / cores / 2))


def shuffle_partitions(spark, default: int = 200) -> int:
    """The session's shuffle-partition setting as an int, robust to
    AQE-managed platforms where ``spark.sql.shuffle.partitions`` is the
    literal string ``"auto"`` (int() would raise ValueError there)."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions", str(default)))
    except (ValueError, TypeError):
        return int(default)


def round_partitions(
    spark,
    n_rows: int,
    *,
    row_bytes: int = 48,
    task_bytes: int = ROUND_TASK_BYTES,
) -> int:
    """Shuffle-partition count for a ROUND-HEAVY iterative operator
    whose per-round relation has ``n_rows`` rows (e.g. the canonical
    edge set of a graph peel).

    Policy (VERDICT r7 item 1 — the measured sf30/sf100 asymmetry as
    engine policy instead of prose):

        n = min(session shuffle partitions,
                max(ceil(n_rows * row_bytes / task_bytes), cores))

    - never EXCEEDS the session setting (the user's ceiling stands);
    - never drops below the cluster's core count (parallelism floor),
      unless the session setting itself is lower;
    - grows linearly with the relation so a 100 TB peel still gets
      bytes-proportional partitions from a huge session setting while a
      GB-scale peel on the same session is capped near the core count,
      where ~30 rounds x scheduling overhead would otherwise dominate
      (q189 at sf30: spilled-at-32 beat clean-at-128 by 1.6x).

    Setting ``SPARK_GRAFT_PARTITION_POLICY=0`` disables the policy
    (returns the session setting unchanged) — used by the scale bench
    for controlled partition-count comparisons.
    """
    sess = shuffle_partitions(spark)
    if os.environ.get("SPARK_GRAFT_PARTITION_POLICY", "1") in ("0", "false"):
        return sess
    cores = max(1, spark.sparkContext.defaultParallelism)
    eff_task_bytes = min(int(task_bytes), _heap_task_bytes_cap(spark))
    by_bytes = max(1, math.ceil(int(n_rows) * int(row_bytes) / float(eff_task_bytes)))
    return max(1, min(sess, max(by_bytes, min(cores, sess))))


#: plan-stats sizeInBytes (unsafe-row accounting) -> the policy's
#: row_bytes=48 units, calibrated on the canonical 2-long edge schema
#: (stats report 12 B/row there; the policy's 48 B/row models the JVM
#: shuffle-time footprint).  Only the RATIO matters — the policy is an
#: order-of-magnitude partition sizer, not a byte counter.
_STATS_INFLATION = 4.0


def plan_size_bytes(df) -> int | None:
    """Catalyst's sizeInBytes estimate for ``df``'s optimized plan —
    FREE (no job), and exact-row-accounted on a localCheckpoint-pinned
    relation (the only kind the round policy is asked about).  None
    when the estimate is the unknown sentinel (defaultSizeInBytes ~
    2^63) or non-positive."""
    try:
        sz = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None
    if sz <= 0 or sz >= (1 << 60):
        return None
    return sz


def round_partitions_for(
    spark,
    df,
    *,
    row_bytes: int = 48,
    task_bytes: int = ROUND_TASK_BYTES,
) -> int:
    """``round_partitions`` for a (pinned) relation WITHOUT a count
    job: the size comes from the optimized plan's statistics (free;
    ~15 ms vs ~0.8 s for a count over a pinned 3M-row relation —
    measured, BENCH_policy_ab_sf01.json context), scaled by the
    documented stats->policy calibration.  Falls back to one count job
    only when stats are unavailable.  Under
    SPARK_GRAFT_PARTITION_POLICY=0 returns the session setting without
    touching the relation at all (the eager ``df.count()`` argument
    form paid a job even in policy-off mode — round-8 verdict item 5).

    On a NOT-yet-materialized plan (cached-but-cold, or a lazy view)
    the stats are Catalyst's size propagation rather than exact bytes;
    the result is still clamped to [core floor, session ceiling], so a
    mis-estimate degrades to the pre-policy partition counts — never
    worse than policy-off.  The graph-peel call sites pass pinned or
    warmed relations, where the stats are exact."""
    sess = shuffle_partitions(spark)
    if os.environ.get("SPARK_GRAFT_PARTITION_POLICY", "1") in ("0", "false"):
        return sess
    sz = plan_size_bytes(df)
    if sz is not None:
        cores = max(1, spark.sparkContext.defaultParallelism)
        eff_task_bytes = min(int(task_bytes), _heap_task_bytes_cap(spark))
        by_bytes = max(1, math.ceil(sz * _STATS_INFLATION / float(eff_task_bytes)))
        return max(1, min(sess, max(by_bytes, min(cores, sess))))
    return round_partitions(
        spark, df.count(), row_bytes=row_bytes, task_bytes=task_bytes
    )


def empty_rows(spark, schema) -> DataFrame:
    """A zero-row DataFrame as a plan-visible EMPTY LocalRelation.

    ``spark.createDataFrame([], schema)`` builds a
    defaultParallelism-sliced ExistingRDD: every consumption schedules
    one pickle-RDD task per core, and — worse — Catalyst cannot prove
    the relation empty, so an empty seed registry drags its whole
    union/join subtree through planning and execution on EVERY
    streaming microbatch.  ``.limit(0)`` triggers the optimizer's
    OptimizeLimitZero rewrite to ``LocalRelation <empty>``, which
    PropagateEmptyRelation then folds: unions drop the empty side
    outright and left-joins against it collapse to null projections
    (measured on the probe session: ``union(empty)`` optimizes to the
    bare other side).  Values and schema are exactly those of the
    default path — empty is empty; ``limit(0)`` preserves the schema
    including nullability."""
    return spark.createDataFrame([], schema).limit(0)


def local_rows(spark, rows, schema: str) -> DataFrame:
    """Driver-computed rows as a ONE-partition DataFrame.

    ``spark.createDataFrame(list, schema)`` parallelizes the local list
    over ``defaultParallelism`` slices, so every consumption of an
    8-row driver readout (a Newton-solver result, an agreement matrix,
    a weight table) runs one Python-worker task PER CORE — measured
    0.34 s vs 0.19 s warm per noop save on local[32], and ~1 s/task
    cold while the workers start (r11 q250 profile: a 35 s save stage
    for 8 rows).  A driver-sized relation belongs in one slice at any
    scale: broadcast consumers read it in a single build task and no
    scheduler rounds are spent on empty slices.  Values and schema are
    exactly those of the default path.  Empty input returns the
    plan-visible empty LocalRelation (``empty_rows``) so downstream
    unions/joins can prune it at plan time."""
    if not rows:
        return empty_rows(spark, schema)
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def fanout_respread(
    df: DataFrame,
    fanout: int,
    *,
    task_bytes: int = ROUND_TASK_BYTES,
) -> DataFrame:
    """Compute-aware parallelism floor for a relation about to be
    exploded ``fanout``x and probed through a per-row kernel
    (optimization guide §2.5: AQE coalesces a small post-aggregate
    relation to ~64 MiB partitions by BYTES, but it cannot see that a
    downstream Generate multiplies per-partition work ``fanout``x — a
    tiny distinct-keys relation then runs its whole explode + verify
    pipeline on 1-2 cores).  One round-robin exchange re-spreads the
    relation to the round-partition policy sized at
    ``task_bytes / fanout`` — i.e. the partition count the policy
    would pick for the post-explode bytes — clamped as always to
    [core floor, session ceiling].

    Scale-adaptive, not a local constant: at 100 TB the plan-stats
    size is large, so the policy lands at the session ceiling exactly
    like every other big shuffle; locally it lands at the core floor.
    Values are unaffected (round-robin repartition is deterministic
    under Spark's sort-before-repartition default, and the call sites
    are explode+join+distinct pipelines that are partition-count
    invariant).  ``SPARK_GRAFT_PARTITION_POLICY=0`` disables it (same
    A/B knob as the round policy; the relation passes through
    untouched)."""
    if os.environ.get("SPARK_GRAFT_PARTITION_POLICY", "1") in ("0", "false"):
        return df
    spark = df.sparkSession
    sess = shuffle_partitions(spark)
    cores = max(1, spark.sparkContext.defaultParallelism)
    eff_task_bytes = min(int(task_bytes), _heap_task_bytes_cap(spark))
    sz = plan_size_bytes(df)
    if sz is None:
        n = min(cores, sess)
    else:
        by_bytes = max(
            1, math.ceil(sz * _STATS_INFLATION * max(1, int(fanout)) / float(eff_task_bytes))
        )
        n = max(1, min(sess, max(by_bytes, min(cores, sess))))
    return df.repartition(n)


@contextmanager
def tuned_shuffle(spark, n_partitions: int):
    """Temporarily pin ``spark.sql.shuffle.partitions`` to
    ``n_partitions`` for the queries PLANNED inside the block (each
    round of an iterative operator plans and executes eagerly inside
    its loop, so the loop body is exactly the scope that matters).
    Restores the previous raw value — including the literal ``"auto"``
    on AQE-managed platforms — on exit, even on error.

    Session-global for the duration: a concurrent streaming microbatch
    planned inside the window would also pick up the tuned count.  That
    is benign by construction — every operator in this engine is
    partition-count invariant on VALUES (the driver gate replays all
    oracles on a vanilla 200-partition session) — but keep timing runs
    serial as always.
    """
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, str(int(n_partitions)))
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
