"""Behavioral / event-sequence analytics: ordered funnels and cohort
retention.

Both are classic event-table OLAP surfaces (the reference engine's query
set stops at windowing; these are the standard next step for an events
table) expressed as single-shuffle DataFrame plans:

- ``funnel``: per-user ordered step matching.  The per-user event list
  is folded ONCE with ``F.aggregate`` over a sorted struct array — all
  JVM column expressions, one groupBy(user) shuffle, no joins, no UDFs,
  any number of steps.  Greedy earliest matching is exact for
  reachability (a step subsequence exists iff the greedy walk finds
  one); the optional ``within`` budget constrains the span from the
  matched first step and is greedy from the earliest feasible start —
  see the docstring caveat.
- ``cohort_retention``: distinct-user counts per (cohort week, week
  offset) — two small aggregations and one equi-join on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from patternly_spark.plans import local_rows

MICROS_PER_WEEK = 7 * 86_400 * 1_000_000


def funnel(
    df: DataFrame,
    *,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    within: int | None = None,
) -> DataFrame:
    """Ordered funnel: how far along ``steps`` each user progressed.

    An event advances the funnel iff its type matches the next expected
    step AND its timestamp is STRICTLY after the previously matched
    event (simultaneous events cannot chain — keeps the fold identical
    to the chained-min SQL formulation).  With ``within`` set, the whole
    funnel must complete within ``within`` axis units of the matched
    first step; matching restarts greedily at the next step-1 event
    when the budget is blown.

    Output: (user, steps_completed int, step_ts array<long> — the
    matched timestamps, length = steps_completed).

    Plan: groupBy(user) -> array_sort(collect_list(struct(ts, type)))
    -> one F.aggregate fold.  One shuffle; per-user memory is the
    user's event count (the same bound every sessionization carries).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)
    step_arr = F.array(*[F.lit(s) for s in steps])
    evs = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col).alias("t"), F.col(type_col).alias("tp")))
    )

    def advance(acc, e):
        stage = acc["stage"]
        hits = acc["hits"]
        want = F.element_at(step_arr, stage + 1)
        after = F.when(stage == 0, F.lit(True)).otherwise(e["t"] > F.element_at(hits, -1))
        budget = (
            F.lit(True)
            if within is None
            else F.when(stage == 0, F.lit(True)).otherwise(
                e["t"] - F.element_at(hits, 1) <= F.lit(int(within))
            )
        )
        matched = (stage < k) & (e["tp"] == want) & after & budget
        # budget blown on a step-1 candidate: restart the attempt there
        restart = (
            F.lit(False)
            if within is None
            else (stage > 0) & (stage < k) & (e["tp"] == F.lit(steps[0])) & ~matched
        )
        return (
            F.when(
                matched,
                F.struct(
                    (stage + 1).alias("stage"),
                    F.concat(hits, F.array(e["t"])).alias("hits"),
                ),
            )
            .when(restart, F.struct(F.lit(1).alias("stage"), F.array(e["t"]).alias("hits")))
            .otherwise(acc)
        )

    init = F.struct(
        F.lit(0).alias("stage"), F.array().cast("array<long>").alias("hits")
    )
    state = F.aggregate(evs, init, advance)
    return (
        df.groupBy(user_col)
        .agg(state.alias("__s"))
        .select(
            user_col,
            F.col("__s.stage").alias("steps_completed"),
            F.col("__s.hits").alias("step_ts"),
        )
    )


def cohort_retention(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    cohort_event: str = "signup",
    week_micros: int = MICROS_PER_WEEK,
) -> DataFrame:
    """Weekly cohort retention: users bucketed by the week of their first
    ``cohort_event``, counted distinct in every later activity week.

    Output: (cohort_week long — epoch-week index, week_offset long >= 0,
    n_users long).  Users without a cohort event are excluded; activity
    before the cohort event is excluded (negative offsets dropped).

    Plan: one groupBy(user) for cohorts, one distinct over (user, week)
    for activity — both partial-aggregating — then an equi-join on
    user_id (broadcast when the user dimension is small) and a final
    small groupBy.
    """
    wk = F.lit(int(week_micros))
    week = (F.col(ts_col) - F.pmod(F.col(ts_col), wk)) / wk
    cohorts = (
        df.filter(F.col(type_col) == cohort_event)
        .groupBy(user_col)
        .agg(F.min(week.cast("long")).alias("cohort_week"))
    )
    activity = df.select(F.col(user_col), week.cast("long").alias("week")).distinct()
    return (
        activity.join(cohorts, user_col)
        .filter(F.col("week") >= F.col("cohort_week"))
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count_distinct(user_col).cast("long").alias("n_users"))
    )


def sequence_match(
    df: DataFrame,
    pattern: str,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    alphabet: dict[str, str] | None = None,
) -> DataFrame:
    """ClickHouse-style ``sequenceMatch``: does each user's event-type
    stream, in time order, match a regex ``pattern``?

    Event types map to single characters (``alphabet``: type -> char;
    default = first letter) and the per-user ordered concatenation is
    matched with the regex — so any ordered pattern expressible as a
    regex over the event alphabet works ("signup then eventually
    purchase with no error between": ``s[^e]*p``).  Keep patterns to
    portable constructs (literals, classes, ``.*``, anchors): Java
    regex and RE2 agree on those.

    Output: (user, events string, matched boolean).  One groupBy(user)
    shuffle; the (ts, id) sort key makes simultaneous events
    deterministic.  Per-user string length = event count — the
    sessionize/funnel state bound.
    """
    if alphabet is None:
        mapped = F.substring(F.col(type_col), 1, 1)
    else:
        mapped = None
        for k, v in alphabet.items():
            c = F.when(F.col(type_col) == k, F.lit(v))
            mapped = c if mapped is None else mapped.when(F.col(type_col) == k, F.lit(v))
        mapped = mapped.otherwise(F.lit("?"))
    evs = F.array_sort(
        F.collect_list(
            F.struct(F.col(ts_col).alias("t"), F.col(id_col).alias("i"), mapped.alias("c"))
        )
    )
    s = F.array_join(F.transform(evs, lambda e: e["c"]), "")
    return (
        df.groupBy(user_col)
        .agg(s.alias("events"))
        .withColumn("matched", F.col("events").rlike(pattern))
    )


def frequent_itemsets(
    baskets: DataFrame,
    *,
    basket_col: str = "basket_id",
    item_col: str = "item",
    size: int = 3,
    min_support: int = 2,
    max_basket: int | None = None,
) -> DataFrame:
    """Exact frequent k-itemsets by per-basket combination expansion —
    the market-basket generalization beyond pair affinity: every
    distinct ``size``-subset of a basket's items is emitted once per
    basket and censused corpus-wide.

    Scale shape: fan-out per basket is C(|basket|, size) — retail-style
    baskets (tens of items) expand to hundreds of rows, not millions,
    and the expansion is a per-row array expression (sorted distinct
    items -> index combinations via nested transforms, no UDF, no
    self-join).  The census is one map-side-combined groupBy on the
    itemset key.  For pathological baskets cap with ``max_basket`` —
    baskets above it are dropped (counted in no itemset), the same
    documented degrade as LSH's bucket cap.  The classic two-phase SON
    refinement (prune by frequent (k-1)-subsets) matters when k is
    large; at k<=3 the direct census is the cheaper plan.

    Output: (items array<string> sorted ascending, support) with
    support >= min_support.
    """
    k = int(size)
    if k < 1:
        raise ValueError(f"size must be >= 1, got {k}")
    per_basket = (
        baskets.select(F.col(basket_col).alias("b"), F.col(item_col).alias("it"))
        .groupBy("b")
        .agg(F.array_sort(F.collect_set("it")).alias("items"))
        .filter(F.size("items") >= k)
    )
    if max_basket is not None:
        per_basket = per_basket.filter(F.size("items") <= int(max_basket))
    if k == 1:
        combos = F.transform(F.col("items"), lambda x: F.array(x))
    elif k == 2:
        combos = F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.size("items") - 1),
                lambda i: F.transform(
                    F.slice(F.col("items"), i + 1, F.size("items")),
                    lambda y: F.array(F.element_at("items", i.cast("int")), y),
                ),
            )
        )
    elif k == 3:
        combos = F.flatten(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.size("items") - 2),
                    lambda i: F.transform(
                        F.sequence(i + 1, F.size("items") - 1),
                        lambda j: F.transform(
                            F.slice(F.col("items"), j + 1, F.size("items")),
                            lambda z: F.array(
                                F.element_at("items", i.cast("int")),
                                F.element_at("items", j.cast("int")),
                                z,
                            ),
                        ),
                    ),
                )
            )
        )
    else:
        raise ValueError("size > 3 not supported (SON refinement needed)")
    return (
        per_basket.select(F.explode(combos).alias("items"))
        .groupBy("items")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= int(min_support))
    )


def touch_attribution(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
    touch_types: list[str],
    conversion_type: str,
    lookback_us: int,
) -> DataFrame:
    """First/last-touch attribution — the product-analytics join behind
    every "which campaign gets credit" table: for each CONVERSION
    event, the earliest and latest TOUCH event within the preceding
    ``lookback_us`` microseconds (inclusive window ending at the
    conversion), plus the touch count.

    ONE per-user window with a RANGE frame does everything: ordered by
    the numeric timestamp, ``RANGE lookback PRECEDING .. CURRENT ROW``
    aggregates min(struct)/max(struct)/count over touch rows only —
    no self-join, no per-conversion probe, exactly replayable in SQL
    (range frames over integers are engine-portable; struct min/max
    give total (ts, type) tie-breaks).  Cost: one key-window shuffle;
    per-task memory is the frame's row span, bounded by per-user event
    rate x lookback — the same bound any sessionization pays.

    Conversions with no touch in window report NULL touch columns and
    n_touches 0 (unattributed — the row a marketing report must not
    silently drop).

    Output: (user, conv_ts, first_touch_ts, first_touch_type,
    last_touch_ts, last_touch_type, n_touches) — one row per
    conversion event.
    """
    from pyspark.sql import Window

    is_touch = F.col(type_col).isin(list(touch_types))
    touch_struct = F.when(
        is_touch, F.struct(F.col(ts_col).alias("t"), F.col(type_col).alias("y"))
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc())
        .rangeBetween(-int(lookback_us), Window.currentRow)
    )
    enriched = events.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("conv_ts"),
        F.col(type_col).alias("__ty"),
        F.min(touch_struct).over(w).alias("__first"),
        F.max(touch_struct).over(w).alias("__last"),
        F.sum(F.when(is_touch, 1).otherwise(0)).over(w).cast("long").alias(
            "n_touches"
        ),
    )
    return enriched.filter(F.col("__ty") == conversion_type).select(
        "user",
        "conv_ts",
        F.col("__first.t").alias("first_touch_ts"),
        F.col("__first.y").alias("first_touch_type"),
        F.col("__last.t").alias("last_touch_ts"),
        F.col("__last.y").alias("last_touch_type"),
        "n_touches",
    )


START_STATE = "__START__"
CONV_STATE = "__CONV__"
NULL_STATE = "__NULL__"


def _absorb_walk(
    counts: dict[tuple[str, str], int], units: int, rounds: int
) -> int:
    """Fixed-round integer absorption walk from START; returns the mass
    (in units) absorbed at CONV.  p[j] += (p[i] * c_ij) div tot_i —
    integral div, the personalized-PageRank convention, so any engine
    replays it bit-for-bit.  Floor leak < |edges| units/round,
    documented not hidden."""
    totals: dict[str, int] = {}
    for (i, _j), c in counts.items():
        totals[i] = totals.get(i, 0) + c
    p = {START_STATE: int(units)}
    for _ in range(int(rounds)):
        nxt: dict[str, int] = {}
        for s, m in p.items():
            if s in (CONV_STATE, NULL_STATE):
                nxt[s] = nxt.get(s, 0) + m
        for (i, j), c in sorted(counts.items()):
            m = p.get(i)
            if m and i not in (CONV_STATE, NULL_STATE):
                nxt[j] = nxt.get(j, 0) + (m * c) // totals[i]
        p = {k: v for k, v in nxt.items() if v > 0}
    return p.get(CONV_STATE, 0)


def markov_attribution(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    channels: list[str],
    conversion: str,
    rounds: int = 4,
    units: int = 1 << 30,
) -> DataFrame:
    """Markov removal-effect attribution (Anderl et al. 2016) — the
    data-driven upgrade over q203's first/last-touch heuristics: model
    each user's pre-conversion journey as a Markov chain over channels,
    and credit channel X by how much the conversion probability DROPS
    when X is removed (edges into X redirect to the NULL absorber):

        removal(X) = P_conv(full chain) - P_conv(chain without X)
        share(X)   = removal(X) / sum over channels of removal

    Spark does the event-scale work — per-user journeys cut at the
    FIRST conversion, one sort window, transition COUNTS via lead —
    and the chain itself (<= |channels|+3 states) is solved at the
    driver, the covariance-eigh altitude: a fixed-round INTEGER
    absorption walk (integral div, the q202 convention) that any
    engine replays exactly; the SQL oracle re-runs the identical walk
    with unrolled rounds.

    Output: one row per channel — (channel, conv_base_units,
    conv_removed_units, removal_units, share) under integer units;
    share is NULL when no channel has positive removal.
    """
    from pyspark.sql import Window

    chs = list(channels)
    u = int(units)
    ev = events.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__ts"),
        F.col(type_col).alias("__y"),
    ).filter(F.col("__y").isin(chs + [conversion]))
    w = Window.partitionBy("__u").orderBy("__ts", "__y")
    prior_conv = F.sum(
        F.when(F.col("__y") == conversion, 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, -1))
    kept = ev.withColumn("__prior", F.coalesce(prior_conv, F.lit(0))).filter(
        F.col("__prior") == 0
    )
    w2 = Window.partitionBy("__u").orderBy("__ts", "__y")
    kept = kept.withColumn("__r", F.row_number().over(w2)).withColumn(
        "__nxt", F.lead("__y").over(w2)
    )
    state = F.when(F.col("__y") == conversion, F.lit(CONV_STATE)).otherwise(
        F.col("__y")
    )
    nxt_state = F.when(F.col("__nxt").isNull(), F.lit(NULL_STATE)).otherwise(
        F.when(F.col("__nxt") == conversion, F.lit(CONV_STATE)).otherwise(
            F.col("__nxt")
        )
    )
    start_edges = kept.filter(F.col("__r") == 1).select(
        F.lit(START_STATE).alias("src"), state.alias("dst")
    )
    step_edges = kept.filter(
        (F.col("__y") != conversion)
    ).select(state.alias("src"), nxt_state.alias("dst"))
    edges = start_edges.unionByName(step_edges)
    counts_rows = (
        edges.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ).collect()
    counts = {(r["src"], r["dst"]): int(r["c"]) for r in counts_rows}

    base = _absorb_walk(counts, u, rounds)
    out = []
    for x in chs:
        removed: dict[tuple[str, str], int] = {}
        for (i, j), c in counts.items():
            if i == x:
                continue
            jj = NULL_STATE if j == x else j
            removed[(i, jj)] = removed.get((i, jj), 0) + c
        conv_x = _absorb_walk(removed, u, rounds)
        out.append((x, base, conv_x, base - conv_x))
    total_removal = sum(max(r[3], 0) for r in out)
    spark = events.sparkSession
    res = local_rows(
        spark,
        out,
        "channel string, conv_base_units long, conv_removed_units long,"
        " removal_units long",
    )
    share = F.when(
        F.lit(total_removal) > 0,
        F.greatest(F.col("removal_units"), F.lit(0)).cast("double")
        / F.lit(float(total_removal)),
    )
    return res.select(
        "channel",
        "conv_base_units",
        "conv_removed_units",
        "removal_units",
        share.alias("share"),
    )


def shapley_attribution(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    channels: list[str],
    conversion: str,
) -> DataFrame:
    """EXACT Shapley-value attribution over touch SETS — the
    cooperative-game companion to ``markov_attribution``'s chain model
    (Dalessandro et al.; the model behind "data-driven attribution" in
    ad platforms).  Coalition value v(S) = number of conversions among
    users whose pre-conversion touch set is CONTAINED in S; channel
    credit is the Shapley value

        phi_x = sum over S subseteq C\\{x} of
                |S|!(n-1-|S|)!/n! * (v(S+{x}) - v(S)).

    Exactness: multiply through by n! — every weight |S|!(n-1-|S|)! is
    an INTEGER, v() is an integer count, so phi*n! is exact integer
    arithmetic; the efficiency axiom sum(phi) = v(C) - v({}) holds
    EXACTLY in those units (tested).  The subset lattice is 2^n — this
    is deliberately for marketing-sized channel sets (n <= 12 raises),
    not features.

    Shape: Spark reduces the event stream to (touch-set, conversions)
    counts — one sort window + one groupBy, at most 2^n distinct sets —
    and the lattice walk runs at the driver (covariance-eigh altitude);
    the SQL oracle replays the identical integer lattice.

    Output: (channel, phi_units long — phi * n! * 1, share double);
    share NULL when no conversions.
    """
    import math

    from pyspark.sql import Window

    chs = sorted(channels)
    n = len(chs)
    if n > 12:
        raise ValueError("shapley_attribution: 2^n lattice; n <= 12 channels")
    ev = events.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__ts"),
        F.col(type_col).alias("__y"),
    ).filter(F.col("__y").isin(chs + [conversion]))
    w = Window.partitionBy("__u").orderBy("__ts", "__y")
    prior_conv = F.sum(
        F.when(F.col("__y") == conversion, 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, -1))
    kept = ev.withColumn("__prior", F.coalesce(prior_conv, F.lit(0))).filter(
        F.col("__prior") == 0
    )
    per_user = kept.groupBy("__u").agg(
        F.array_sort(
            F.array_distinct(
                F.collect_list(F.when(F.col("__y") != conversion, F.col("__y")))
            )
        ).alias("__set"),
        F.max((F.col("__y") == conversion).cast("int")).alias("__conv"),
    )
    set_counts = per_user.groupBy("__set").agg(
        F.sum("__conv").cast("long").alias("n_conv"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
    )
    rows = set_counts.collect()
    conv_by_set = {tuple(r["__set"]): int(r["n_conv"]) for r in rows}

    def v(coalition: frozenset) -> int:
        return sum(
            c for s, c in conv_by_set.items() if coalition.issuperset(s)
        )

    fact = [math.factorial(k) for k in range(n + 1)]
    out = []
    full = frozenset(chs)
    for x in chs:
        others = [c for c in chs if c != x]
        phi = 0
        for mask in range(1 << len(others)):
            s = frozenset(o for i, o in enumerate(others) if mask >> i & 1)
            wgt = fact[len(s)] * fact[n - 1 - len(s)]
            phi += wgt * (v(s | {x}) - v(s))
        out.append((x, phi))
    total = v(full) - v(frozenset())
    spark = events.sparkSession
    res = local_rows(spark, out, "channel string, phi_units long")
    share = F.when(
        F.lit(total) > 0,
        F.col("phi_units").cast("double")
        / F.lit(float(total * fact[n])),
    )
    return res.select("channel", "phi_units", share.alias("share"))
