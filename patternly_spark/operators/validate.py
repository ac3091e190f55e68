"""Data-quality expectations — the Deequ/Great-Expectations-shaped
validation gate a production pipeline runs before (and after) every
build step: declare per-column rules, get back one violations report,
fail the release on any `passed == false` row.

The reference engine has no validation surface (it trusts its CSV
inputs); a 100 TB pipeline cannot — a silently null-filled or
range-corrupted column poisons every downstream statistic.  This is a
first-class extension (builder brief: curation pipeline components).

Scale shape — the entire point of the design: ALL rules evaluate in
ONE aggregation pass over the table (each rule is a conditional-sum
column in a single `agg`; `count_distinct` rides the same pass), so a
20-rule suite costs one scan + one 1-row reduce regardless of table
width or rule count.  The 1-row result unpivots driver-free (`stack`)
into the per-rule report.  Counts are integers (engine-exact); the
only float is the final violation_rate division.

Rule forms (dicts, declarative):
  {"column": c, "check": "complete"}                      null count
  {"column": c, "check": "unique"}                        duplicate rows
  {"column": c, "check": "range", "min": x, "max": y}     out-of-bounds
  {"column": c, "check": "allowed", "values": [...]}      enum violations
  {"column": c, "check": "matches", "pattern": r"..."}    regex misses
  {"column": c, "check": "non_negative"}                  sugar for range

Semantics pinned in the docstrings below; `max_violation_rate`
(default 0.0) sets the pass threshold per rule (overridable per rule
with key "max_violation_rate").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["data_quality_report", "pii_scan", "pii_redact", "profile_columns", "PII_PATTERNS"]


def _violation_expr(rule: dict) -> Column:
    """1 when the row VIOLATES the rule, else 0.  NULL handling is
    per-check: `complete` counts nulls as violations; every other check
    treats null as vacuously passing (compose with a `complete` rule to
    also forbid nulls — the Deequ convention, so one rule means one
    thing)."""
    c = F.col(rule["column"])
    check = rule["check"]
    if check == "complete":
        bad = c.isNull()
    elif check == "range":
        lo, hi = rule.get("min"), rule.get("max")
        conds = []
        if lo is not None:
            conds.append(c < F.lit(lo))
        if hi is not None:
            conds.append(c > F.lit(hi))
        if not conds:
            raise ValueError("range rule needs min and/or max")
        bad = conds[0]
        for extra in conds[1:]:
            bad = bad | extra
        bad = c.isNotNull() & bad
    elif check == "non_negative":
        bad = c.isNotNull() & (c < F.lit(0))
    elif check == "allowed":
        bad = c.isNotNull() & ~c.isin(list(rule["values"]))
    elif check == "matches":
        bad = c.isNotNull() & ~c.rlike(rule["pattern"])
    elif check == "unique":
        # handled via count_distinct in the agg, not per-row
        raise AssertionError("unique is aggregated, not row-wise")
    else:
        raise ValueError(f"unknown check: {check!r}")
    return F.when(bad, F.lit(1)).otherwise(F.lit(0))


def data_quality_report(
    df: DataFrame,
    rules: list[dict],
    *,
    max_violation_rate: float = 0.0,
) -> DataFrame:
    """Evaluate every rule in ONE aggregation pass; one output row per
    rule: (column, check, n_rows, n_violations, violation_rate,
    passed).

    `unique` counts violations as n_nonnull - n_distinct (the number of
    EXTRA rows beyond one per value — 0 iff the column is a key over
    its non-null rows).  An empty table passes every rule (0/0 -> rate
    0.0).  Column names in the output are stable so release gates can
    assert on them; `passed` applies each rule's violation-rate
    threshold (rule key "max_violation_rate", else the call default).
    """
    if not rules:
        raise ValueError("no rules given")
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i, rule in enumerate(rules):
        if rule["check"] == "unique":
            c = F.col(rule["column"])
            aggs.append(
                F.count(c).cast("long").alias(f"__nn_{i}")
            )
            aggs.append(
                F.countDistinct(c).cast("long").alias(f"__nd_{i}")
            )
        else:
            aggs.append(
                # sum over an empty table is NULL, not 0
                F.coalesce(F.sum(_violation_expr(rule)), F.lit(0))
                .cast("long")
                .alias(f"__v_{i}")
            )
    one = df.agg(*aggs)

    # unpivot the 1-row result into per-rule rows with a stack()
    # expression — no driver round trip, no second scan.  The rule
    # index rides along so each row finds its own threshold.
    parts = []
    for i, rule in enumerate(rules):
        col_lit = rule["column"].replace("'", "''")
        check_lit = rule["check"]
        v = f"(__nn_{i} - __nd_{i})" if rule["check"] == "unique" else f"__v_{i}"
        parts.append(
            f"CAST({i} AS INT), '{col_lit}', '{check_lit}', CAST({v} AS BIGINT)"
        )
    stacked = one.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(rules)}, "
            + ", ".join(parts)
            + ") AS (rule_idx, column, check, n_violations)"
        ),
    )

    thresholds = [
        float(r.get("max_violation_rate", max_violation_rate)) for r in rules
    ]
    thr = F.element_at(
        F.array(*[F.lit(t) for t in thresholds]), F.col("rule_idx") + 1
    )
    rate = F.when(
        F.col("n_rows") > 0,
        F.col("n_violations").cast("double") / F.col("n_rows").cast("double"),
    ).otherwise(F.lit(0.0))
    return stacked.select(
        "rule_idx",
        "column",
        "check",
        "n_rows",
        "n_violations",
        rate.alias("violation_rate"),
        (rate <= thr).alias("passed"),
    )


#: conservative PII patterns — shared Java-regex / RE2 subset (no
#: lookarounds), so Spark and the SQL oracle compile them identically
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}
CCN_CANDIDATE = r"\b\d{13,16}\b"


def _luhn_valid(c: Column) -> Column:
    """Luhn checksum over a digit string — pure column arithmetic
    (double every 2nd digit from the RIGHT, subtract 9 above 9, total
    divisible by 10), identical in any engine."""
    L = F.length(c)
    chars = F.split(c, "")

    def term(acc: Column, i: Column) -> Column:
        d = F.element_at(chars, i).cast("int")
        doubled = F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
        return acc + F.when((L - i) % 2 == 1, doubled).otherwise(d)

    total = F.aggregate(F.sequence(F.lit(1), L), F.lit(0), term)
    return total % 10 == 0


def pii_flag(text: Column) -> Column:
    """``has_pii`` as a pure column expression over ``text`` — exactly
    ``pii_scan``'s flag (email|phone|ipv4|ssn|Luhn-valid CCN present).
    Exposed separately so pipeline compositions that only need the flag
    on an already-derived text column (q241's release rescan) can stay
    a projection instead of re-evaluating their upstream subtree for a
    join back on id (r11 optimization: the join form evaluated the
    redact+span machinery twice)."""
    counts = {
        k: F.size(F.regexp_extract_all(text, F.lit(p), 0)).cast("long")
        for k, p in PII_PATTERNS.items()
    }
    cands = F.regexp_extract_all(text, F.lit(CCN_CANDIDATE), 0)
    n_valid = F.size(F.filter(cands, _luhn_valid)).cast("long")
    return (
        (counts["email"] > 0)
        | (counts["phone"] > 0)
        | (counts["ipv4"] > 0)
        | (counts["ssn"] > 0)
        | (n_valid > 0)
    )


def pii_scan(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """PII census per document — the redaction gate every training-data
    release runs before anything ships: counts of emails, dashed US
    phone numbers, IPv4 literals, SSN-shaped ids, and 13-16-digit card
    candidates split into Luhn-VALID (real-card-shaped) vs merely
    card-LIKE — the checksum is what separates an order id from a
    leaked PAN.

    Everything is `regexp_extract_all` + size + a per-candidate integer
    Luhn fold: zero shuffle, one scan, engine-exact (the patterns are
    the Java-regex/RE2 shared subset, and the Luhn fold is integer
    arithmetic — the SQL oracle replays both).

    Scale: embarrassingly parallel column work; masking/redaction
    composes downstream with `regexp_replace` over the same patterns.

    Output: (id, n_email, n_phone, n_ipv4, n_ssn, n_ccn_like,
    n_ccn_valid, has_pii).
    """
    text = F.col(text_col)
    counts = {
        k: F.size(F.regexp_extract_all(text, F.lit(p), 0)).cast("long")
        for k, p in PII_PATTERNS.items()
    }
    cands = F.regexp_extract_all(text, F.lit(CCN_CANDIDATE), 0)
    n_like = F.size(cands).cast("long")
    n_valid = F.size(F.filter(cands, _luhn_valid)).cast("long")
    has = pii_flag(text)
    return df.select(
        F.col(id_col),
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["ipv4"].alias("n_ipv4"),
        counts["ssn"].alias("n_ssn"),
        n_like.alias("n_ccn_like"),
        n_valid.alias("n_ccn_valid"),
        has.alias("has_pii"),
    )


def pii_redact(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Redact the ``pii_scan`` pattern families in place: emails,
    dashed phones, SSN shapes, IPv4 literals and 13-16-digit runs are
    regexp_replaced by typed placeholder tokens ([EMAIL], [PHONE],
    [SSN], [IP], [NUMBER]).  Composition law (tested + oracle-pinned):
    ``pii_scan(pii_redact(df)).has_pii`` is false everywhere — the gate
    provably closes.  Digit runs are redacted wholesale (card-like AND
    order-id-like): a redactor must not leak the Luhn verdict by
    keeping invalid runs.

    Replacement order matters (SSN is a substring shape of phone-like
    text): specific composite shapes go first, bare digit runs last.
    Zero shuffle, one scan, plain regexp_replace — SQL-replayable.

    Output: (id, text) with text redacted.
    """
    text = F.col(text_col)
    out = F.regexp_replace(text, PII_PATTERNS["email"], "[EMAIL]")
    out = F.regexp_replace(out, PII_PATTERNS["phone"], "[PHONE]")
    out = F.regexp_replace(out, PII_PATTERNS["ssn"], "[SSN]")
    out = F.regexp_replace(out, PII_PATTERNS["ipv4"], "[IP]")
    out = F.regexp_replace(out, CCN_CANDIDATE, "[NUMBER]")
    return df.select(F.col(id_col), out.alias(text_col))


def profile_columns(
    df: DataFrame,
    *,
    columns: list[str] | None = None,
    top_k: int = 3,
) -> DataFrame:
    """One-pass column profile — the catalog/data-contract snapshot
    (Deequ-profile shape): per column its null count, exact distinct
    count, min/max (as strings — type-uniform output), and the top-k
    most frequent values with counts under a TOTAL (count desc, value
    asc) order.

    Shape: null/min/max come from ONE aggregation pass over the data;
    distinct + top-k need one (column, value) census per column —
    issued as a single unioned plan over the exploded (col, value)
    relation, so the whole profile is two scans regardless of column
    count.  All outputs are integers/strings: engine-exact by
    construction.

    Output (long format): (column, n_rows, n_nulls, n_distinct,
    min_value, max_value, top_values array<struct<value,cnt>>).
    """
    from functools import reduce

    cols = list(columns or df.columns)
    stacked = reduce(
        lambda a, b: a.unionByName(b),
        [
            df.select(
                F.lit(c).alias("column"),
                F.col(c).cast("string").alias("value"),
            )
            for c in cols
        ],
    )
    census = stacked.groupBy("column", "value").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("column").orderBy(
        F.desc("cnt"), F.asc_nulls_last("value")
    )
    ranked = census.withColumn("__r", F.row_number().over(w))
    top = (
        ranked.filter(F.col("value").isNotNull() & (F.col("__r") <= int(top_k)))
        .groupBy("column")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__r").alias("r"), "value", "cnt"))
            ).alias("__tv")
        )
        .select(
            "column",
            F.transform(
                F.col("__tv"), lambda s: F.struct(s["value"].alias("value"), s["cnt"].alias("cnt"))
            ).alias("top_values"),
        )
    )
    summary = census.groupBy("column").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("n_nulls"),
        F.count(F.when(F.col("value").isNotNull(), F.lit(1)))
        .cast("long")
        .alias("n_distinct"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    return summary.join(top, "column", "left")
