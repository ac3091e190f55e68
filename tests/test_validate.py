"""Data-quality expectations (operators/validate): per-check semantics,
threshold gating, empty-table behavior, one-pass plan shape."""

import pytest
from pyspark.sql import functions as F

from patternly_spark.operators.validate import data_quality_report


@pytest.fixture(scope="module")
def messy(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0, "O"),
            (2, "b", -5.0, "F"),
            (2, None, 200.0, "X"),     # dup key, null name, bad status
            (3, "c", None, "O"),       # null price: vacuous for range
            (4, "d", 999999.0, "P"),
        ],
        "k long, name string, price double, status string",
    )


def test_each_check_counts_violations(spark, messy):
    rules = [
        {"column": "k", "check": "unique"},
        {"column": "name", "check": "complete"},
        {"column": "price", "check": "non_negative"},
        {"column": "price", "check": "range", "min": 0.0, "max": 1000.0},
        {"column": "status", "check": "allowed", "values": ["O", "F", "P"]},
        {"column": "name", "check": "matches", "pattern": "^[a-c]$"},
    ]
    rows = {r.rule_idx: r for r in data_quality_report(messy, rules).collect()}
    assert rows[0].n_violations == 1          # one extra row for key 2
    assert rows[1].n_violations == 1          # one null name
    assert rows[2].n_violations == 1          # -5.0
    # range: -5.0 and 999999.0 violate; NULL price is vacuous
    assert rows[3].n_violations == 2
    assert rows[4].n_violations == 1          # "X"
    # matches: "d" misses ^[a-c]$; null name vacuous
    assert rows[5].n_violations == 1
    for r in rows.values():
        assert r.n_rows == 5
        assert r.violation_rate == r.n_violations / 5
        assert r.passed == (r.n_violations == 0)


def test_thresholds_gate_passed(spark, messy):
    rules = [
        {"column": "status", "check": "allowed", "values": ["O", "F", "P"],
         "max_violation_rate": 0.25},
        {"column": "name", "check": "complete"},
    ]
    rows = {r.rule_idx: r for r in data_quality_report(messy, rules).collect()}
    assert rows[0].passed                      # 1/5 = 0.2 <= 0.25
    assert not rows[1].passed
    # call-level default threshold applies where the rule has none
    rows2 = {
        r.rule_idx: r
        for r in data_quality_report(
            messy, rules, max_violation_rate=0.5
        ).collect()
    }
    assert rows2[1].passed                     # 0.2 <= 0.5


def test_empty_table_passes_everything(spark):
    df = spark.createDataFrame([], "k long, name string")
    rows = data_quality_report(
        df,
        [{"column": "k", "check": "unique"}, {"column": "name", "check": "complete"}],
    ).collect()
    assert all(r.n_rows == 0 and r.n_violations == 0 and r.passed for r in rows)
    assert all(r.violation_rate == 0.0 for r in rows)


def test_single_pass_plan(spark, messy):
    from patternly_spark.plans import plan_audit

    rules = [
        {"column": "k", "check": "unique"},
        {"column": "name", "check": "complete"},
        {"column": "price", "check": "range", "min": 0.0, "max": 100.0},
    ]
    audit = plan_audit(data_quality_report(messy, rules))
    assert audit["python_evals"] == 0 and audit["nested_loop_joins"] == 0
    # one scan feeds everything: no joins, bounded exchange count from
    # the two-stage agg (+ countDistinct expand)
    assert len(audit["scans"]) <= 1
    assert audit["exchanges"] <= 3, audit


def test_rejects_bad_rules(spark, messy):
    with pytest.raises(ValueError, match="no rules"):
        data_quality_report(messy, [])
    with pytest.raises(ValueError, match="unknown check"):
        data_quality_report(messy, [{"column": "k", "check": "wat"}])
    with pytest.raises(ValueError, match="range rule"):
        data_quality_report(messy, [{"column": "k", "check": "range"}])


def test_pii_scan_hand_cases(spark):
    from patternly_spark.operators.validate import pii_scan

    rows = [
        (1, "contact me at jane.doe+x@example.co.uk or 555-867-5309 now"),
        (2, "server 192.168.1.100 handled ssn 123-45-6789 fine"),
        (3, "card 4111111111111111 vs fake 4111111111111112 ok"),
        (4, "nothing sensitive here at all"),
        (5, "order 12345678901234 is not a card"),  # fails Luhn
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert out[2]["n_ipv4"] == 1 and out[2]["n_ssn"] == 1
    # 4111111111111111 passes Luhn; ...112 does not
    assert out[3]["n_ccn_like"] == 2 and out[3]["n_ccn_valid"] == 1
    assert out[4]["has_pii"] is False
    assert all(out[4][c] == 0 for c in
               ("n_email", "n_phone", "n_ipv4", "n_ssn", "n_ccn_like"))
    # a Luhn-valid 14-digit number must be counted; its +1 neighbor not
    base = "9" * 13
    digits = [int(d) for d in base]
    total = 0
    for i, d in enumerate(reversed(digits)):
        dd = d * 2 if i % 2 == 0 else d
        total += dd - 9 if (i % 2 == 0 and dd > 9) else dd
    check = (10 - total % 10) % 10
    valid14 = base + str(check)
    df2 = spark.createDataFrame([(9, f"x {valid14} y")], "doc_id long, text string")
    o2 = pii_scan(df2).collect()[0]
    assert o2["n_ccn_valid"] == 1
    assert out[5]["n_ccn_like"] == 1 and out[5]["n_ccn_valid"] in (0, 1)


def test_pii_redact_closes_the_gate(spark):
    from patternly_spark.operators.validate import pii_redact, pii_scan

    rows = [
        (1, "mail a@b.io call 555-867-5309 ssn 123-45-6789 ip 10.0.0.1"
            " card 4111111111111111 end"),
        (2, "clean text stays exactly as it was"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    red = pii_redact(df)
    got = {r["doc_id"]: r["text"] for r in red.collect()}
    assert "[EMAIL]" in got[1] and "[PHONE]" in got[1]
    assert "[SSN]" in got[1] and "[IP]" in got[1] and "[NUMBER]" in got[1]
    assert got[2] == "clean text stays exactly as it was"
    rescan = pii_scan(red).collect()
    assert all(not r["has_pii"] for r in rescan)
    assert all(r["n_ccn_like"] == 0 for r in rescan)


def test_profile_columns_hand_case(spark):
    from patternly_spark.operators.validate import profile_columns

    rows = [("a", 1), ("a", 2), ("b", None), (None, 2), ("a", 2)]
    df = spark.createDataFrame(rows, "s string, v int")
    out = {r["column"]: r for r in profile_columns(df, top_k=2).collect()}
    s = out["s"]
    assert s["n_rows"] == 5 and s["n_nulls"] == 1 and s["n_distinct"] == 2
    assert s["min_value"] == "a" and s["max_value"] == "b"
    assert [(t["value"], t["cnt"]) for t in s["top_values"]] == [("a", 3), ("b", 1)]
    v = out["v"]
    assert v["n_nulls"] == 1 and v["n_distinct"] == 2
    assert [(t["value"], t["cnt"]) for t in v["top_values"]] == [("2", 3), ("1", 1)]
    # partition invariance
    a = profile_columns(df.coalesce(1)).orderBy("column").collect()
    b = profile_columns(df.repartition(16)).orderBy("column").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
