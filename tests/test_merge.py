"""merge_upsert (CDC latest-wins) semantics."""

import pytest

from patternly_spark.operators.merge import merge_upsert

SCHEMA = "k long, v string, version long"


def test_merge_upsert_updates_win_and_insert(spark):
    target = spark.createDataFrame([(1, "old", 1), (2, "keep", 1)], SCHEMA)
    updates = spark.createDataFrame([(1, "new", 2), (3, "ins", 1)], SCHEMA)
    out = {r["k"]: r for r in merge_upsert(target, updates, key_cols="k", version_col="version").collect()}
    assert out[1]["v"] == "new" and out[2]["v"] == "keep" and out[3]["v"] == "ins"
    assert len(out) == 3


def test_merge_upsert_stale_update_loses(spark):
    target = spark.createDataFrame([(1, "current", 5)], SCHEMA)
    updates = spark.createDataFrame([(1, "late-arriving", 3)], SCHEMA)
    (r,) = merge_upsert(target, updates, key_cols="k", version_col="version").collect()
    assert r["v"] == "current" and r["version"] == 5


def test_merge_upsert_tie_breaks_to_updates(spark):
    target = spark.createDataFrame([(1, "t", 1)], SCHEMA)
    updates = spark.createDataFrame([(1, "u", 1)], SCHEMA)
    (r,) = merge_upsert(target, updates, key_cols="k", version_col="version").collect()
    assert r["v"] == "u"


def test_merge_upsert_no_version_updates_always_win(spark):
    target = spark.createDataFrame([(1, "t", 9)], SCHEMA)
    updates = spark.createDataFrame([(1, "u", 1)], SCHEMA)
    (r,) = merge_upsert(target, updates, key_cols="k").collect()
    assert r["v"] == "u"


def test_merge_upsert_schema_mismatch_raises(spark):
    target = spark.createDataFrame([(1, "t", 1)], SCHEMA)
    updates = spark.createDataFrame([(1, "u")], "k long, v string")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(target, updates, key_cols="k")
