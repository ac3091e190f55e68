"""Sketch-based data profiling: cardinalities and quantiles per group.

The 100 TB shape is the ``exact=False`` default: HyperLogLog++
(``approx_count_distinct``) and the GK-style quantile summary
(``approx_percentile``) are MERGEABLE, bounded-memory sketches — every
partition builds a kilobyte-scale summary and a single shuffle merges
them, regardless of group or corpus size.  Exact mode
(``count_distinct`` + interpolated ``percentile``) materializes whole
groups in an aggregation buffer — use it for small data or
oracle-parity checks only (same trade the complex quantizer documents
in ``functions/quantize.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: pinned accuracy for approx_percentile (1/accuracy relative rank error)
APPROX_QUANTILE_ACCURACY = 10_000
#: pinned relative standard deviation for approx_count_distinct
APPROX_DISTINCT_RSD = 0.02


def sketch_profile(
    df: DataFrame,
    *,
    by: str | list[str] | None = None,
    distinct_cols: list[str] | None = None,
    quantile_cols: list[str] | None = None,
    quantile_probs: list[float] = (0.5, 0.9, 0.99),
    exact: bool = False,
) -> DataFrame:
    """Per-group profile: row count, distinct count of each
    ``distinct_cols`` entry (``nd_<col>``), and the requested quantiles
    of each ``quantile_cols`` entry (``q<prob>_<col>``, prob in %).

    One aggregation pass — all sketches merge in the same shuffle.
    """
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    distinct_cols = list(distinct_cols or [])
    quantile_cols = list(quantile_cols or [])
    probs = list(quantile_probs)
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in distinct_cols:
        agg = (
            F.count_distinct(F.col(c))
            if exact
            else F.approx_count_distinct(c, APPROX_DISTINCT_RSD)
        )
        aggs.append(agg.cast("long").alias(f"nd_{c}"))
    arr = ", ".join(repr(float(p)) for p in probs)
    for c in quantile_cols:
        fn = "percentile" if exact else "approx_percentile"
        acc = "" if exact else f", {APPROX_QUANTILE_ACCURACY}"
        q = F.expr(f"{fn}({c}, array({arr}){acc})")
        for i, p in enumerate(probs):
            label = f"q{int(round(p * 100)):02d}_{c}"
            aggs.append(F.element_at(q, i + 1).cast("double").alias(label))
    grouped = df.groupBy(*keys) if keys else df.groupBy()
    return grouped.agg(*aggs)


def top_items_per_group(
    df: DataFrame,
    group_col: str,
    item_col: str,
    *,
    k: int = 10,
) -> DataFrame:
    """Exact per-group top-k items by count: (group, item, cnt, rank).

    Two map-side-combinable aggregations collapse the data before
    anything wide happens; the rank window then runs over distinct
    (group, item) rows only.  Ties break on item value (deterministic).
    This is the exact baseline ``frequent_items`` approximates.
    """
    from pyspark.sql import Window

    counts = df.groupBy(group_col, item_col).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(group_col).orderBy(F.desc("cnt"), F.asc(item_col))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group_col, item_col, "cnt", F.col("rank").cast("long").alias("rank"))
    )


def mg_summaries(
    df: DataFrame,
    group_col: str,
    item_col: str,
    *,
    capacity: int = 64,
) -> DataFrame:
    """Raw per-partition Misra-Gries summaries: (group, item, w, dec)
    with each partition's decrement total attached to ONE of its rows
    per group.  This is the MERGEABLE form — summaries of two data sets
    concatenate and re-merge (``mg_merge``) into a valid summary of the
    union, which is what the streaming registry persists."""
    import pandas as pd

    out_schema = f"{group_col} string, {item_col} string, w long, dec long"

    def mg_partition(batches):
        # per-group counters + per-group decrement total for this partition.
        # Each Arrow batch is first collapsed to (group, item) weights by a
        # vectorized value-count, so the Python loop runs over DISTINCT
        # pairs per batch, not rows.  Weighted-MG insertion: every
        # decrement unit removes >= capacity+1 units of total weight, so
        # the classic (true - lo) <= decrements bound survives weighting.
        counters: dict[str, dict[str, int]] = {}
        decs: dict[str, int] = {}

        def add(c: dict, g: str, it: str, w: int) -> None:
            if it in c:
                c[it] += w
                return
            while w > 0 and len(c) >= capacity:
                delta = min(min(c.values()), w)
                decs[g] = decs.get(g, 0) + delta
                for key in list(c):
                    c[key] -= delta
                    if c[key] == 0:
                        del c[key]
                w -= delta
            if w > 0:
                c[it] = w

        for pdf in batches:
            weights = (
                pdf.assign(
                    __g=pdf[group_col].astype(str), __i=pdf[item_col].astype(str)
                )
                .groupby(["__g", "__i"], sort=False)
                .size()
            )
            for (g, it), w in weights.items():
                add(counters.setdefault(g, {}), g, it, int(w))
        rows = []
        for g, c in counters.items():
            d = decs.get(g, 0)
            first = True
            for it, w in c.items():
                # attach the partition's decrement total to one row per
                # group (not every row) so the merge can sum it exactly
                rows.append((g, it, w, d if first else 0))
                first = False
            if not c and d:
                rows.append((g, "", 0, d))
        yield pd.DataFrame(rows, columns=[group_col, item_col, "w", "dec"])

    return df.select(
        F.col(group_col).cast("string"), F.col(item_col).cast("string")
    ).mapInPandas(mg_partition, schema=out_schema)


def mg_merge(
    summaries: DataFrame,
    group_col: str,
    item_col: str,
    *,
    capacity: int | None = None,
) -> DataFrame:
    """Merge MG summary rows (any union of ``mg_summaries`` outputs and
    previously merged summaries) back into summary form: weights sum per
    (group, item), decrements sum per group onto one surviving row.

    With ``capacity`` set the merged summary is PRUNED back to at most
    ``capacity`` items per group (the Agarwal et al. mergeable-summary
    step): every weight drops by the (capacity+1)-largest weight, items
    at or below it vanish, and the subtracted amount joins the decrement
    total — so a registry folded over any number of batches stays
    O(capacity) per group while the lo <= true <= hi contract holds.
    """
    from pyspark.sql import Window

    merged = summaries.groupBy(group_col, item_col).agg(
        F.sum("w").alias("w"), F.sum("dec").alias("__dec_here")
    )
    decs = merged.groupBy(group_col).agg(F.sum("__dec_here").alias("__dec"))
    m = merged.drop("__dec_here").filter(F.col("w") > 0)
    if capacity is not None:
        win = Window.partitionBy(group_col).orderBy(
            F.col("w").desc(), F.col(item_col).asc()
        )
        ranked = m.withColumn("__rn", F.row_number().over(win))
        kth = ranked.filter(F.col("__rn") == capacity + 1).select(
            group_col, F.col("w").alias("__kth")
        )
        m = (
            ranked.join(kth, group_col, "left")
            .withColumn("__kth", F.coalesce("__kth", F.lit(0)))
            .withColumn("w", F.col("w") - F.col("__kth"))
            .filter(F.col("w") > 0)
        )
        decs = (
            decs.join(kth, group_col, "left")
            .select(
                group_col,
                (F.col("__dec") + F.coalesce("__kth", F.lit(0))).alias("__dec"),
            )
        )
        m = m.drop("__rn", "__kth")
    first = Window.partitionBy(group_col).orderBy(
        F.col("w").desc(), F.col(item_col).asc()
    )
    return (
        m.withColumn("__r1", F.row_number().over(first))
        .join(decs, group_col, "left")
        .select(
            group_col,
            item_col,
            "w",
            F.when(F.col("__r1") == 1, F.coalesce("__dec", F.lit(0)))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("dec"),
        )
    )


def mg_finalize(summaries: DataFrame, group_col: str, item_col: str) -> DataFrame:
    """Summary rows -> the query surface: (group, item, count_lo,
    count_hi) with count_lo <= true count <= count_hi."""
    merged = summaries.groupBy(group_col, item_col).agg(
        F.sum("w").alias("count_lo"), F.sum("dec").alias("__dec_here")
    )
    group_err = merged.groupBy(group_col).agg(F.sum("__dec_here").alias("__err"))
    return (
        merged.filter(F.col("count_lo") > 0)
        .join(group_err, group_col)
        .select(
            group_col,
            item_col,
            "count_lo",
            (F.col("count_lo") + F.col("__err")).alias("count_hi"),
        )
    )


def frequent_items(
    df: DataFrame,
    group_col: str,
    item_col: str,
    *,
    capacity: int = 64,
) -> DataFrame:
    """Misra-Gries heavy hitters per group — the bounded-memory scale
    path when the item domain is too large to count exactly (URLs,
    n-grams, user ids at 100 TB).

    Shape: every partition builds an MG summary of at most ``capacity``
    counters per group (``mg_summaries``: mapInPandas, Arrow-batched,
    O(capacity) memory regardless of partition size), then ONE
    aggregation merges summaries and accumulates each partition's
    decrement bound (``mg_finalize``).  Output per (group, item):
    ``count_lo`` (sum of retained counters — never above the true
    count) and ``count_hi`` (count_lo + summed decrements — never below
    it).  Guarantee: every item with true count >
    total_rows(group)/capacity survives; the exact top-k
    (``top_items_per_group``) is a subset of these survivors whenever k
    <= capacity and counts are separated by the error bound (pinned in
    tests/test_sketches.py).  For incremental use persist the summary
    form and fold with ``mg_merge`` (streaming/sketches).
    """
    return mg_finalize(
        mg_summaries(df, group_col, item_col, capacity=capacity), group_col, item_col
    )


def _cms_cell(item: "F.Column", j: int, width: int, seed: str) -> "F.Column":
    """Deterministic CMS cell for hash row ``j``: md5-prefix u32 of
    "<seed><j>:<item>" mod width — the same arithmetic DuckDB replays as
    ``('0x' || substr(md5(...), 1, 8))::BIGINT % width``, so estimates
    are bit-equal across engines."""
    h = F.md5(F.concat(F.lit(f"{seed}{j}:"), item.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(int(width))).alias(
        "cell"
    )


def count_min_counters(
    df: DataFrame,
    item_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
    seed: str = "",
) -> DataFrame:
    """Count-Min sketch counter table: (j, cell, cnt) with exactly
    ``depth * width`` possible rows regardless of corpus size.

    The 100 TB shape: each row fans out to ``depth`` (j, cell) pairs in
    a pure map (one small int + one long per pair), then ONE
    partial-aggregating shuffle collapses everything to the fixed-size
    counter grid — the reduce side never sees more than depth*width
    groups.  Counters are MERGEABLE by construction: sketches of two
    corpora (or two microbatches) add cell-wise, which is just a union +
    the same groupBy.  Unlike Misra-Gries (``frequent_items``) the
    sketch answers point queries for ANY item after the fact, with a
    one-sided guarantee: estimate >= true count always, and
    estimate <= true + 2N/width with probability 1 - 2^-depth
    (Cormode & Muthukrishnan 2005).
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("j"),
                _cms_cell(F.col(item_col), j, width, seed).alias("cell"),
            )
            for j in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("jc"))
        .select(F.col("jc.j").alias("j"), F.col("jc.cell").alias("cell"))
        .groupBy("j", "cell")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def count_min_lookup(
    counters: DataFrame,
    items: DataFrame,
    item_col: str,
    *,
    depth: int = 4,
    width: int = 1024,
    seed: str = "",
) -> DataFrame:
    """Point-query a CMS counter table: (item, cms_est) with
    cms_est = min over the ``depth`` hash rows (a never-touched cell
    counts as 0, so unseen items estimate 0 absent collisions).

    ``depth`` and ``width`` (and ``seed``) must match the build call.
    The counter table is at most depth*width rows — it is BROADCAST to
    the probe side, so lookup is a narrow map over ``items`` with no
    shuffle on the (usually much larger) probe relation.
    """
    probes = items.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("j"),
                        _cms_cell(F.col(item_col), j, width, seed).alias("cell"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("jc"),
    ).select(item_col, F.col("jc.j").alias("j"), F.col("jc.cell").alias("cell"))
    return (
        probes.join(F.broadcast(counters), ["j", "cell"], "left")
        .select(item_col, F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
        .groupBy(item_col)
        .agg(F.min("cnt").cast("long").alias("cms_est"))
    )


def histogram(
    df: DataFrame,
    value_col: str,
    *,
    by: str | list[str] | None = None,
    bins: int = 20,
) -> DataFrame:
    """Exact equi-width histogram per group: one tiny (lo, hi) extent
    aggregation broadcast back, then a pure-map bucket assignment and a
    partial-aggregating count shuffle on (keys, bucket).

    Bucket i covers [lo + i*w, lo + (i+1)*w) with w = (hi-lo)/bins; the
    top edge folds into the last bucket.  The assignment is plain
    double arithmetic (sub/div/floor — each correctly rounded, so the
    same boundaries in any engine); a degenerate group (hi == lo) lands
    everything in bucket 0.

    Output: (keys..., bucket int, lo, hi, n long).
    """
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    g = df.groupBy(*keys) if keys else df.groupBy()
    ext = g.agg(F.min(value_col).alias("lo"), F.max(value_col).alias("hi"))
    j = df.join(F.broadcast(ext), keys) if keys else df.crossJoin(F.broadcast(ext))
    nb = F.lit(int(bins))
    w = (F.col("hi") - F.col("lo")) / nb.cast("double")
    raw = F.floor((F.col(value_col) - F.col("lo")) / w).cast("int")
    bucket = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(raw, nb - 1)
    )
    return (
        j.select(*keys, bucket.alias("bucket"), "lo", "hi")
        .groupBy(*keys, "bucket", "lo", "hi")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


# ---------------------------------------------------------------------------
# explicit-register HyperLogLog (mergeable, engine-replayable)
# ---------------------------------------------------------------------------

#: rho cap: terms 2^-rho with rho<=40 summed over 2^p registers stay
#: within 53 mantissa bits, so the power sum is EXACT in a double
#: regardless of fold order (the property the SQL oracle relies on)
HLL_RHO_CAP = 40


def hll_registers(
    df: DataFrame,
    item_col: str,
    *,
    p: int = 12,
    seed: str = "",
    by: str | None = None,
) -> DataFrame:
    """Explicit HyperLogLog registers: (reg, rho) with reg = first
    ``p`` bits of md5(item) and rho = leading-zero count of the next
    48 bits + 1 (capped at HLL_RHO_CAP), max-aggregated per register.

    Unlike ``approx_count_distinct`` (whose sketch lives inside an
    opaque JVM buffer), explicit registers are a RELATION: they merge
    across batches/engines with a plain ``groupBy(reg).max(rho)``,
    persist as parquet, and replay in SQL — which is what makes the
    streaming registry and the cross-engine oracle possible.

    The leading-zero count is pure string/CASE arithmetic on the md5
    hex (no log2/libm anywhere), so every engine computes the identical
    register table.  Plan: one narrow map + one (by, reg) groupBy with
    map-side partial max — the shuffle carries at most 2^p rows per
    group, independent of input size.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4,16], got {p}")
    item = F.col(item_col)
    h = F.md5(F.concat(F.lit(seed), item.cast("string")))
    reg = F.shiftright(
        F.conv(F.substring(h, 1, 4), 16, 10).cast("int"), 16 - p
    ).alias("reg")
    tail = F.substring(h, 5, 12)  # 48 bits
    stripped = F.regexp_replace(tail, "^0+", "")
    nz_nibbles = F.lit(12) - F.length(stripped)
    first = F.substring(stripped, 1, 1)
    # leading zero BITS inside the first non-zero nibble
    in_nibble = (
        F.when(first.isin("8", "9", "a", "b", "c", "d", "e", "f"), F.lit(0))
        .when(first.isin("4", "5", "6", "7"), F.lit(1))
        .when(first.isin("2", "3"), F.lit(2))
        .when(first == "1", F.lit(3))
        .otherwise(F.lit(0))  # stripped == '' (all 48 bits zero)
    )
    lz = F.when(F.length(stripped) == 0, F.lit(48)).otherwise(
        nz_nibbles * 4 + in_nibble
    )
    rho = F.least(lz + 1, F.lit(HLL_RHO_CAP)).cast("int")
    return (
        df.select(*([F.col(by)] if by else []), reg, rho.alias("__rho"))
        .groupBy(*([by] if by else []), "reg")
        .agg(F.max("__rho").alias("rho"))
    )


def hll_merge(registers: DataFrame, *others: DataFrame, by: str | None = None) -> DataFrame:
    """Merge register tables (the HLL union): groupBy(reg).max(rho).
    Associative and commutative — the streaming registry folds with
    exactly this."""
    all_regs = registers
    for o in others:
        all_regs = all_regs.unionByName(o)
    keys = ([by] if by else []) + ["reg"]
    return all_regs.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, *, p: int = 12, by: str | None = None) -> DataFrame:
    """Cardinality estimate from a register table: the Flajolet et al.
    raw estimator alpha_m * m^2 / sum(2^-rho) with linear counting for
    the small range (est <= 2.5m and empty registers exist).

    Exact cross-engine: 2^-rho terms are dyadic (computed by LONG
    bitshift, no pow), their sum fits 53 mantissa bits (see
    HLL_RHO_CAP) so it is fold-order-free; the linear-counting ln is
    floor-quantized to 2^-20 (the repo's standard cross-engine ln
    treatment).  Output: (m, used_registers, zeros, raw_estimate,
    estimate)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    term = F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), rho)").cast("double")
    keys = [by] if by else []
    agg = registers.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("used_registers"),
        F.sum(term).alias("__ps"),
    )
    zeros = (F.lit(m) - F.col("used_registers")).cast("long")
    denom = zeros.cast("double") + F.col("__ps")
    raw = F.lit(float(alpha) * m * m) / denom
    # floor-quantized ln(m/zeros): identical double in, identical out
    lin = F.lit(float(m)) * (
        F.floor(F.log(F.lit(float(m)) / zeros.cast("double")) * F.lit(1048576.0))
        / F.lit(1048576.0)
    )
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), lin).otherwise(raw)
    return agg.select(
        *keys,
        F.lit(m).cast("long").alias("m"),
        "used_registers",
        zeros.alias("zeros"),
        raw.alias("raw_estimate"),
        est.alias("estimate"),
    )


# ---------------------------------------------------------------------------
# log2 histogram sketch (mergeable quantiles, engine-replayable)
# ---------------------------------------------------------------------------


def _bitlen(col) -> "F.Column":
    """Bit length of a non-negative LONG as an exact integer: the
    length of its binary-string rendering (0 -> bin '0' -> length 1,
    by convention bucket 0 with value 0).  No log2/libm — the SQL
    oracle replays it as a generated comparison chain."""
    return F.when(col <= 0, F.lit(0)).otherwise(F.length(F.bin(col))).cast("int")


def log2_histogram(
    df: DataFrame,
    value_col: str,
    *,
    by: str | None = None,
) -> DataFrame:
    """Mergeable quantile sketch over non-negative integer values:
    counts per power-of-two bucket (bucket b holds values in
    [2^(b-1), 2^b), bucket 0 holds zeros) — the HdrHistogram idea with
    base-2 resolution.  At most 64 rows per group EVER, additive merge
    (plain groupBy-sum), parquet-persistable, and every count is an
    integer so the sketch replays in SQL bit-for-bit.

    Quantile estimates from power-of-two buckets carry a worst-case
    2x relative error — the honest trade for O(64) state; callers
    needing tighter error scale the values before sketching (e.g.
    cents vs dollars buys 100x finer buckets at the same state).
    """
    v = F.col(value_col).cast("long")
    keys = [by] if by else []
    return (
        df.select(*keys, _bitlen(v).alias("bucket"))
        .groupBy(*keys, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def log2_histogram_merge(a: DataFrame, *others: DataFrame, by: str | None = None) -> DataFrame:
    """Union + groupBy-sum: the additive merge that makes the sketch a
    registry (streaming fold == batch sketch of all history)."""
    out = a
    for o in others:
        out = out.unionByName(o)
    keys = ([by] if by else []) + ["bucket"]
    return out.groupBy(*keys).agg(F.sum("cnt").cast("long").alias("cnt"))


def log2_quantile(
    hist: DataFrame,
    q: float,
    *,
    by: str | None = None,
) -> DataFrame:
    """Quantile estimate from a log2 histogram: the first bucket whose
    cumulative count reaches ceil(q*n); the estimate is the bucket's
    geometric midpoint 1.5*2^(b-2)... represented exactly as
    3*2^(b-3): computed with LONG shifts for b>=3, small-literal CASE
    below (no pow).  Output: (keys..., n, q_bucket, q_estimate) with
    q_estimate inside a factor 2 of the true quantile by construction.
    """
    keys = [by] if by else []
    from pyspark.sql import Window

    w = (Window.partitionBy(*keys) if keys else Window.partitionBy()).orderBy("bucket")
    cum = hist.withColumn("__cum", F.sum("cnt").over(w)).withColumn(
        "__n", F.sum("cnt").over((Window.partitionBy(*keys) if keys else Window.partitionBy()))
    )
    target = F.ceil(F.lit(float(q)) * F.col("__n").cast("double")).cast("long")
    hit = cum.filter(F.col("__cum") >= target)
    wr = (Window.partitionBy(*keys) if keys else Window.partitionBy()).orderBy("bucket")
    first = hit.withColumn("__r", F.row_number().over(wr)).filter(F.col("__r") == 1)
    b = F.col("bucket")
    mid = (
        F.when(b <= 0, F.lit(0.0))
        .when(b == 1, F.lit(1.0))
        .otherwise(F.expr("CAST(shiftleft(CAST(3 AS BIGINT), bucket - 2) AS DOUBLE)"))
    )
    return first.select(
        *keys,
        F.col("__n").alias("n"),
        b.alias("q_bucket"),
        mid.alias("q_estimate"),
    )
