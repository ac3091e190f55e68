"""Streaming data-quality registry — the streaming twin of
``operators/validate.data_quality_report`` (q194): rule metrics fold
additively across microbatches, so the accumulated registry always
reports exactly what the batch operator would report over the union of
all rows seen.

Two kinds of sufficient statistics, each with the right state bound:
- row-local checks (complete / range / allowed / matches /
  non_negative): (n_rows, n_violations) integers — ADDITIVE, fixed
  one-row-per-rule state forever (the q181/ST22 additive-registry law).
- `unique`: distinctness is NOT additive, so each unique rule keeps a
  (value, cnt) table — the exact-dedup registry precedent (ST6); state
  is bounded by key cardinality (for an identifier column, that is the
  honest minimum any exact duplicate check must pay).  Violations
  derive as sum(cnt) - count(values) (extras beyond one per value).

Law (pinned by test): ``quality_report_from_registry`` after any
prefix of batches == ``data_quality_report`` over the concatenated
rows — value-exact, including `passed` under per-rule thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from patternly_spark.operators.validate import _violation_expr
from patternly_spark.plans import local_rows
from patternly_spark.streaming.exactly_once import (
    read_latest_snapshot,
    read_registry,
    write_snapshot,
)

__all__ = [
    "streaming_quality_registry",
    "quality_report_from_registry",
]


def _batch_counters(batch: DataFrame, rules: list[dict]) -> DataFrame:
    """(rule_idx, n_rows, n_violations) for the row-local rules of one
    batch — one aggregation pass, same construction as the batch
    operator."""
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    locals_ = [(i, r) for i, r in enumerate(rules) if r["check"] != "unique"]
    for i, rule in locals_:
        aggs.append(
            F.coalesce(F.sum(_violation_expr(rule)), F.lit(0))
            .cast("long")
            .alias(f"__v_{i}")
        )
    one = batch.agg(*aggs)
    parts = [
        f"CAST({i} AS INT), CAST(__v_{i} AS BIGINT)" for i, _ in locals_
    ]
    if not parts:
        # only unique rules: still record n_rows under rule_idx -1
        parts = ["CAST(-1 AS INT), CAST(0 AS BIGINT)"]
    return one.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(parts)}, " + ", ".join(parts) + ") AS (rule_idx, n_violations)"
        ),
    ).select("rule_idx", "n_rows", "n_violations")


def streaming_quality_registry(
    stream_df: DataFrame,
    rules: list[dict],
    counters_path: str,
    *,
    checkpoint_path: str,
    values_path: str | None = None,
    trigger_once: bool = False,
):
    """foreachBatch wrapper: fold each microbatch's rule counters into
    the parquet registry at ``counters_path``; `unique` rules
    additionally fold per-value counts into ``values_path`` (required
    iff any rule is `unique`).  localCheckpoint before each overwrite
    (read and write share a path — the covariance-registry precedent);
    microbatches are sequential, so read-merge-overwrite is race-free.

    Read the current report any time with
    ``quality_report_from_registry``.
    """
    unique_rules = [(i, r) for i, r in enumerate(rules) if r["check"] == "unique"]
    if unique_rules and values_path is None:
        raise ValueError("values_path is required when rules include 'unique'")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = _batch_counters(batch_df, rules)
        existing, _ = read_latest_snapshot(spark, counters_path, before_batch=batch_id)
        if existing is not None:
            part = (
                part.unionByName(existing)
                .groupBy("rule_idx")
                .agg(
                    F.sum("n_rows").alias("n_rows"),
                    F.sum("n_violations").alias("n_violations"),
                )
            )
        write_snapshot(part.localCheckpoint(eager=True), counters_path, batch_id)
        if unique_rules:
            vals = None
            for i, rule in unique_rules:
                v = (
                    batch_df.select(
                        F.lit(i).cast("int").alias("rule_idx"),
                        F.col(rule["column"]).cast("string").alias("value"),
                    )
                    .filter(F.col("value").isNotNull())
                    .groupBy("rule_idx", "value")
                    .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
                )
                vals = v if vals is None else vals.unionByName(v)
            existing_v, _ = read_latest_snapshot(
                spark, values_path, before_batch=batch_id
            )
            if existing_v is not None:
                vals = (
                    vals.unionByName(existing_v)
                    .groupBy("rule_idx", "value")
                    .agg(F.sum("cnt").alias("cnt"))
                )
            write_snapshot(vals.localCheckpoint(eager=True), values_path, batch_id)

    writer = stream_df.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def quality_report_from_registry(
    spark,
    rules: list[dict],
    counters_path: str,
    *,
    values_path: str | None = None,
    max_violation_rate: float = 0.0,
) -> DataFrame:
    """Assemble the q194-shaped report (rule_idx, column, check,
    n_rows, n_violations, violation_rate, passed) from the folded
    registries — row-for-row what ``data_quality_report`` returns over
    all rows ever streamed."""
    counters = read_registry(spark, counters_path)
    n_rows_total = counters.select(F.max("n_rows")).first()[0] or 0

    rows = []
    uniq_viol = {}
    if any(r["check"] == "unique" for r in rules):
        if values_path is None:
            raise ValueError("values_path is required when rules include 'unique'")
        vals = read_registry(spark, values_path)
        agg = (
            vals.groupBy("rule_idx")
            .agg(
                (F.sum("cnt") - F.count(F.lit(1))).cast("long").alias("extras")
            )
            .collect()
        )
        uniq_viol = {r["rule_idx"]: r["extras"] for r in agg}
    local_viol = {
        r["rule_idx"]: r["n_violations"]
        for r in counters.collect()
        if r["rule_idx"] >= 0
    }
    for i, rule in enumerate(rules):
        v = (
            uniq_viol.get(i, 0)
            if rule["check"] == "unique"
            else local_viol.get(i, 0)
        )
        rate = (v / n_rows_total) if n_rows_total else 0.0
        thr = float(rule.get("max_violation_rate", max_violation_rate))
        rows.append(
            (i, rule["column"], rule["check"], int(n_rows_total), int(v), rate, rate <= thr)
        )
    # one-slice driver readout (plans.local_rows): this is rebuilt and
    # consumed on EVERY microbatch, so the default defaultParallelism
    # slicing paid one empty Python task per core per batch (r11 q250
    # pathology, guide §5)
    return local_rows(
        spark,
        rows,
        "rule_idx int, column string, check string, n_rows bigint, "
        "n_violations bigint, violation_rate double, passed boolean",
    )
