"""Physical-plan auditing — the "is this the plan I'd want at 100 TB"
check as a first-class utility instead of ad-hoc string greps.

``plan_audit(df)`` summarizes the executed plan: shuffle count,
join strategies, Python boundaries, codegen spans, and what actually
reached the parquet scans (pushed filters, partition filters, read
schema).  ``assert_plan(df, ...)`` turns the summary into a one-line
guard for tests and pipelines — the repo's plan-shape regression tests
(pushdown, broadcast, zero-shuffle llk, no-BNLJ range join,
single-exchange packing) are all instances of these predicates.

Everything reads Catalyst's own output; nothing here changes a plan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = ["plan_audit", "assert_plan"]


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
