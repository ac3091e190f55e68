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


def test_snapshot_diff_classification(spark):
    from patternly_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 25.0), (4, "now-set", 40.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    out = {r["k"]: r for r in snapshot_diff(old, new, key_cols="k").collect()}
    assert out[1]["status"] == "unchanged" and out[1]["changed_cols"] == []
    assert out[2]["status"] == "changed" and out[2]["changed_cols"] == ["s", "v"]
    assert out[3]["status"] == "removed"
    assert out[4]["status"] == "changed" and out[4]["changed_cols"] == ["s"]  # null -> value
    assert out[5]["status"] == "added" and out[5]["changed_cols"] == []


def test_snapshot_diff_compare_subset(spark):
    from patternly_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, "x", 1.0)], "k long, s string, v double")
    new = spark.createDataFrame([(1, "y", 1.0)], "k long, s string, v double")
    (r,) = snapshot_diff(old, new, key_cols="k", compare_cols=["v"]).collect()
    assert r["status"] == "unchanged"  # s ignored


def test_dataset_fingerprint_invariant_and_sensitive(spark):
    """Equal content multisets fingerprint identically under any
    partitioning/row order; changing one byte in one row moves the
    checksum but not n_rows."""
    from patternly_spark.operators.merge import dataset_fingerprint

    rows = [(i, f"body {i}", "s") for i in range(97)]
    a = spark.createDataFrame(rows, "doc_id long, text string, source string")
    b = spark.createDataFrame(list(reversed(rows)), "doc_id long, text string, source string").repartition(13)

    fa = dataset_fingerprint(a, by="source").collect()[0]
    fb = dataset_fingerprint(b, by="source").collect()[0]
    assert (fa["n_rows"], fa["n_bytes"], fa["checksum"]) == (
        fb["n_rows"], fb["n_bytes"], fb["checksum"]
    )

    mutated = [(i, "body X" if i == 42 else f"body {i}", "s") for i in range(97)]
    fc = dataset_fingerprint(
        spark.createDataFrame(mutated, "doc_id long, text string, source string"),
        by="source",
    ).collect()[0]
    assert fc["n_rows"] == fa["n_rows"]
    assert fc["checksum"] != fa["checksum"]


def test_golden_records_survivorship_rules(spark):
    """Every rule deterministic incl. ties and nulls: longest (tie ->
    smallest value), most_frequent (nulls excluded), latest (ts tie ->
    smallest id), max, singleton passthrough."""
    from patternly_spark.operators.merge import golden_records

    rows = [
        (1, 1, "short", "en", "srcA", 100),
        (2, 1, "the longest text here", "en", "srcB", 300),
        (3, 1, "medium text", "fr", "srcB", 200),
        (4, 2, "solo", "de", "srcC", 50),
        (5, 3, "aaaa", None, "srcX", 10),
        (6, 3, "bbbb", "es", "srcY", 10),
    ]
    df = spark.createDataFrame(
        rows, "id long, cluster long, text string, lang string, source string, ts long"
    )
    out = {
        r.cluster: r.asDict()
        for r in golden_records(
            df,
            cluster_col="cluster",
            id_col="id",
            rules={
                "text": "longest",
                "lang": "most_frequent",
                "source": "latest",
                "ts": "max",
            },
            ts_col="ts",
        ).collect()
    }
    assert out[1] == {
        "cluster": 1, "n_members": 3, "text": "the longest text here",
        "lang": "en", "source": "srcB", "ts": 300,
    }
    assert out[2]["text"] == "solo" and out[2]["n_members"] == 1
    # length tie -> smallest value; lang null excluded; ts tie -> id 5
    assert out[3] == {
        "cluster": 3, "n_members": 2, "text": "aaaa",
        "lang": "es", "source": "srcX", "ts": 10,
    }


def test_golden_records_validations_and_first_rule(spark):
    import pytest as _pytest

    from patternly_spark.operators.merge import golden_records

    df = spark.createDataFrame(
        [(2, 1, "b"), (1, 1, "a")], "id long, cluster long, v string"
    )
    out = golden_records(
        df, cluster_col="cluster", id_col="id", rules={"v": "first"}
    ).collect()
    assert out[0]["v"] == "a"  # smallest id wins
    with _pytest.raises(ValueError):
        golden_records(df, cluster_col="cluster", id_col="id", rules={"v": "latest"})
    with _pytest.raises(ValueError):
        golden_records(df, cluster_col="cluster", id_col="id", rules={"v": "nope"})


def test_fellegi_sunter_score_weights_and_verdict(spark):
    import math

    from patternly_spark.operators.merge import fellegi_sunter_score

    mu = {"a": (0.9, 0.1), "b": (0.8, 0.2)}
    pairs = spark.createDataFrame(
        [
            (1, True, True),    # both agree -> strong match
            (2, False, False),  # both disagree -> strong non-match
            (3, None, True),    # NULL contributes exactly 0
        ],
        "pid long, a boolean, b boolean",
    )
    out = {r["pid"]: r for r in fellegi_sunter_score(
        pairs, comparisons=mu, upper=3.0, lower=0.0
    ).collect()}
    wa_a, wd_a = math.log2(0.9 / 0.1), math.log2((1.0 - 0.9) / (1.0 - 0.1))
    wa_b = math.log2(0.8 / 0.2)
    assert out[1]["score"] == 0.0 + wa_a + wa_b
    assert out[1]["verdict"] == "match"
    assert out[2]["verdict"] == "non_match"
    assert out[3]["w_a"] == 0.0 and out[3]["score"] == 0.0 + 0.0 + wa_b
    # sorted-field chaining is part of the contract (oracle parity);
    # note the disagree weight comes from the 1.0-m chain (1-0.8 is NOT
    # the double 0.2 — the same ulp trap the q209 oracle documents)
    wd_b = math.log2((1.0 - 0.8) / (1.0 - 0.2))
    assert out[2]["score"] == 0.0 + wd_a + wd_b


def test_fellegi_sunter_rejects_bad_params(spark):
    import pytest as _pytest

    from patternly_spark.operators.merge import fellegi_sunter_score

    df = spark.createDataFrame([(1, True)], "pid long, a boolean")
    with _pytest.raises(ValueError):
        fellegi_sunter_score(df, comparisons={})
    with _pytest.raises(ValueError):
        fellegi_sunter_score(df, comparisons={"a": (1.0, 0.1)})
