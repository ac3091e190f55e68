"""Funnel and cohort-retention semantics on constructed event streams."""

import pytest
from pyspark.sql import functions as F

from patternly_spark.operators.behavior import cohort_retention, funnel

SCHEMA = "user_id long, event_type string, ts_us long"


def test_funnel_counts_ordered_steps(spark):
    rows = [
        # user 1 completes view -> click -> purchase in order
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # user 2: click before view — only reaches step 1 (view at 50)
        (2, "click", 40), (2, "view", 50),
        # user 3: no relevant events
        (3, "error", 5),
        # user 4: view then purchase (skips click) — stops at 1
        (4, "view", 10), (4, "purchase", 20),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r["user_id"]: r for r in funnel(df, steps=["view", "click", "purchase"]).collect()}
    assert out[1]["steps_completed"] == 3 and out[1]["step_ts"] == [10, 20, 30]
    assert out[2]["steps_completed"] == 1 and out[2]["step_ts"] == [50]
    assert out[3]["steps_completed"] == 0 and out[3]["step_ts"] == []
    assert out[4]["steps_completed"] == 1


def test_funnel_greedy_takes_earliest(spark):
    rows = [(1, "view", 10), (1, "view", 15), (1, "click", 12)]
    df = spark.createDataFrame(rows, SCHEMA)
    (r,) = funnel(df, steps=["view", "click"]).collect()
    # earliest view (10) chains to click (12); the later view is ignored
    assert r["steps_completed"] == 2 and r["step_ts"] == [10, 12]


def test_funnel_simultaneous_events_do_not_chain(spark):
    df = spark.createDataFrame([(1, "view", 10), (1, "click", 10)], SCHEMA)
    (r,) = funnel(df, steps=["view", "click"]).collect()
    assert r["steps_completed"] == 1


def test_funnel_within_budget_restarts(spark):
    rows = [
        (1, "view", 0), (1, "click", 100),          # blown budget for within=50
        (1, "view", 110), (1, "click", 120),        # fresh attempt succeeds
        (2, "view", 0), (2, "click", 100),          # user 2 never retries
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r["user_id"]: r for r in funnel(df, steps=["view", "click"], within=50).collect()}
    assert out[1]["steps_completed"] == 2 and out[1]["step_ts"] == [110, 120]
    assert out[2]["steps_completed"] == 1  # stuck waiting, budget blown


def test_funnel_single_shuffle_no_join(spark):
    df = spark.createDataFrame([(1, "view", 10)], SCHEMA)
    plan = funnel(df, steps=["view", "click"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


WEEK = 7 * 86_400 * 1_000_000


def test_cohort_retention_offsets(spark):
    rows = [
        (1, "signup", 0), (1, "click", 1 * WEEK + 5), (1, "view", 2 * WEEK + 5),
        (2, "signup", 0), (2, "click", 2),            # active only in week 0
        (3, "signup", 1 * WEEK), (3, "click", 2 * WEEK),
        (4, "click", 3),                              # never signed up: excluded
        (5, "click", 0), (5, "signup", 1 * WEEK),     # pre-signup activity dropped
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }
    # cohort 0 = users 1,2 (both active week 0); user 1 also offsets 1 and 2
    assert out[(0, 0)] == 2 and out[(0, 1)] == 1 and out[(0, 2)] == 1
    # cohort 1 = users 3,5; user 3 active at offset 1 too
    assert out[(1, 0)] == 2 and out[(1, 1)] == 1
    assert (1, 2) not in out and all(k[1] >= 0 for k in out)


def test_sequence_match_pattern_and_order(spark):
    from patternly_spark.operators.behavior import sequence_match

    rows = [  # (user, event_id, type, ts)
        (1, 1, "view", 10), (1, 2, "click", 20), (1, 3, "purchase", 30),
        (2, 4, "view", 10), (2, 5, "error", 20), (2, 6, "purchase", 30),
        (3, 7, "purchase", 10), (3, 8, "view", 20),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, event_type string, ts_us long")
    out = {r["user_id"]: r for r in sequence_match(df, "v[^e]*p").collect()}
    assert out[1]["matched"] and out[1]["events"] == "vcp"
    assert not out[2]["matched"] and out[2]["events"] == "vep"
    assert not out[3]["matched"] and out[3]["events"] == "pv"


def test_sequence_match_tie_breaks_by_event_id(spark):
    from patternly_spark.operators.behavior import sequence_match

    rows = [(1, 2, "b_type", 10), (1, 1, "a_type", 10)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, event_type string, ts_us long")
    (r,) = sequence_match(df, "ab").collect()
    assert r["events"] == "ab" and r["matched"]


def test_frequent_itemsets_match_bruteforce(spark):
    """k=1..3 itemset supports equal the per-basket combinations census;
    duplicate items inside a basket count once; undersized baskets and
    k>3 guard."""
    import collections
    import itertools

    import pytest as _pytest

    from patternly_spark.operators.behavior import frequent_itemsets

    baskets = {1: "abc d", 2: "a b c", 3: "b c d e", 4: "a", 5: "a b c d", 6: "c b a"}
    rows = [(b, it) for b, its in baskets.items() for it in its.split()]
    rows.append((2, "a"))  # duplicate within basket
    df = spark.createDataFrame(rows, "basket_id long, item string")
    for k in [1, 2, 3]:
        got = {
            tuple(r["items"]): r.support
            for r in frequent_itemsets(df, size=k, min_support=1).collect()
        }
        exp = collections.Counter()
        for its in baskets.values():
            for c in itertools.combinations(sorted(set(its.split())), k):
                exp[c] += 1
        assert got == dict(exp), k
    # min_support filters
    sup2 = {
        tuple(r["items"])
        for r in frequent_itemsets(df, size=3, min_support=3).collect()
    }
    assert sup2 == {("a", "b", "c")}
    with _pytest.raises(ValueError):
        frequent_itemsets(df, size=4)
    with _pytest.raises(ValueError):
        frequent_itemsets(df, size=0)


def test_touch_attribution_window_semantics(spark):
    """Lookback window is inclusive on both ends; first/last struct
    tie-breaks; conversions with no touch report NULLs + 0."""
    from patternly_spark.operators.behavior import touch_attribution

    rows = [
        (1, 100, "click"), (1, 200, "view"), (1, 250, "purchase"),
        (1, 900, "purchase"),                    # out of 300-lookback: none
        (2, 50, "view"), (2, 350, "purchase"),   # exactly at lookback edge
        (3, 10, "click"), (3, 10, "view"), (3, 10, "purchase"),  # ties at ts
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_us long, event_type string")
    got = {
        (r.user, r.conv_ts): (
            r.first_touch_ts, r.first_touch_type,
            r.last_touch_ts, r.last_touch_type, r.n_touches,
        )
        for r in touch_attribution(
            df, touch_types=["click", "view"], conversion_type="purchase",
            lookback_us=300,
        ).collect()
    }
    assert got[(1, 250)] == (100, "click", 200, "view", 2)
    assert got[(1, 900)] == (None, None, None, None, 0)
    assert got[(2, 350)] == (50, "view", 50, "view", 1)
    # equal timestamps: min struct takes min type, max struct max type
    assert got[(3, 10)] == (10, "click", 10, "view", 2)


def test_proportion_ztest_matches_closed_form_and_nulls(spark):
    import math

    from patternly_spark.operators.drift import proportion_ztest

    rows = []
    for i in range(40):
        rows.append(("g1", "control", i < 8))      # 8/40
    for i in range(60):
        rows.append(("g1", "treatment", i < 21))   # 21/60
    rows.append(("g2", "control", True))           # missing treatment arm
    rows += [("g3", "control", False), ("g3", "treatment", False)]  # zero var
    df = spark.createDataFrame(rows, "g string, variant string, ok boolean")
    got = {
        r.g: r
        for r in proportion_ztest(
            df, group_cols=["g"], variant_col="variant", success_col="ok",
            control="control", treatment="treatment",
        ).collect()
    }
    p_c, p_t = 8 / 40, 21 / 60
    pool = (8 + 21) / 100
    z = (p_t - p_c) / math.sqrt(pool * (1 - pool) * (1 / 40 + 1 / 60))
    r = got["g1"]
    assert (r.n_control, r.conv_control, r.n_treatment, r.conv_treatment) == (40, 8, 60, 21)
    assert abs(r.z - z) < 1e-12 and abs(r.lift - (p_t - p_c)) < 1e-15
    assert got["g2"].z is None and got["g2"].rate_treatment is None
    assert got["g3"].z is None and got["g3"].lift == 0.0


def test_markov_attribution_hand_chain(spark):
    from patternly_spark.operators.behavior import markov_attribution

    # user 1: A -> B -> conv ; user 2: A -> null ; user 3: B -> conv
    rows = [
        (1, 1, "A"), (1, 2, "B"), (1, 3, "conv"),
        (2, 1, "A"),
        (3, 1, "B"), (3, 2, "conv"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    out = {r["channel"]: r for r in markov_attribution(
        df, channels=["A", "B"], conversion="conv", rounds=6
    ).collect()}
    u = 1 << 30
    # counts: START->A 2, START->B 1, A->B 1, A->NULL 1, B->CONV 2
    # removing B: START->A 2, START->NULL 1, A->NULL 2 -> conv mass 0
    assert out["B"]["conv_removed_units"] == 0
    assert out["B"]["removal_units"] == out["B"]["conv_base_units"]
    # removing A: START->NULL 2, START->B 1, B->CONV 2 -> conv = u/3
    assert out["A"]["conv_removed_units"] == (u // 3)
    # base chain: START splits 2/3 A, 1/3 B; A: 1/2 B, 1/2 NULL; B->CONV
    pA = (u * 2) // 3
    pB = u // 3
    base = pB + ((pA * 1) // 2)  # B mass after round 1 -> all to CONV
    assert out["A"]["conv_base_units"] == base
    # shares sum to 1 and B dominates
    assert abs(out["A"]["share"] + out["B"]["share"] - 1.0) < 1e-12
    assert out["B"]["share"] > out["A"]["share"]


def test_markov_attribution_first_conversion_cut_and_no_conv(spark):
    from patternly_spark.operators.behavior import markov_attribution

    # post-conversion touches must NOT count; a never-converting corpus
    # yields zero conv mass and NULL shares
    rows = [
        (1, 1, "A"), (1, 2, "conv"), (1, 3, "B"), (1, 4, "conv"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    out = {r["channel"]: r for r in markov_attribution(
        df, channels=["A", "B"], conversion="conv"
    ).collect()}
    # B only ever appears after the first conversion -> no effect at all
    assert out["B"]["removal_units"] == 0
    assert out["A"]["conv_base_units"] == 1 << 30  # A -> conv certain
    noconv = spark.createDataFrame(
        [(1, 1, "A"), (2, 1, "B")], "user_id long, ts long, event_type string"
    )
    o2 = markov_attribution(noconv, channels=["A", "B"], conversion="conv").collect()
    assert all(r["conv_base_units"] == 0 and r["share"] is None for r in o2)


def test_shapley_attribution_hand_game_and_efficiency(spark):
    import math

    from patternly_spark.operators.behavior import shapley_attribution

    # u1: {A} -> conv; u2: {A,B} -> conv; u3: {B} no conv; u4: {} -> conv
    rows = [
        (1, 1, "A"), (1, 2, "conv"),
        (2, 1, "A"), (2, 2, "B"), (2, 3, "conv"),
        (3, 1, "B"),
        (4, 1, "conv"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    out = {r["channel"]: r for r in shapley_attribution(
        df, channels=["A", "B"], conversion="conv"
    ).collect()}
    # v({}) = 1 (u4); v({A}) = 2; v({B}) = 1; v({A,B}) = 3
    # phi_A*2! = 0!1!(v(A)-v({})) + 1!0!(v(AB)-v(B)) = 1 + 2 = 3
    # phi_B*2! = (v(B)-v({})) + (v(AB)-v(A)) = 0 + 1 = 1
    assert out["A"]["phi_units"] == 3
    assert out["B"]["phi_units"] == 1
    # efficiency: sum(phi*n!) == (v(C) - v({})) * n!
    assert out["A"]["phi_units"] + out["B"]["phi_units"] == (3 - 1) * math.factorial(2)
    assert out["A"]["share"] == 3 / 4.0 and out["B"]["share"] == 1 / 4.0


def test_shapley_attribution_no_conversions_and_guard(spark):
    import pytest

    from patternly_spark.operators.behavior import shapley_attribution

    df = spark.createDataFrame(
        [(1, 1, "A"), (2, 1, "B")], "user_id long, ts long, event_type string"
    )
    out = shapley_attribution(df, channels=["A", "B"], conversion="conv").collect()
    assert all(r["share"] is None for r in out)
    with pytest.raises(ValueError, match="n <= 12"):
        shapley_attribution(
            df, channels=[f"c{i}" for i in range(13)], conversion="conv"
        )
