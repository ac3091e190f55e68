"""Deterministic hash-based sampling for training-data curation.

``df.sample()`` is seeded per-partition, so its output changes with
partitioning and engine — useless for reproducible corpus curation or for
cross-engine verification.  These samplers hash a stable row key to a
uniform [0,1) fraction (md5 prefix -> u32 / 2^32) instead:

- same rows selected on ANY engine / partitioning / cluster size,
- exactly replicable in SQL (the DuckDB oracle runs the same md5),
- sampling a growing table is stable: previously-kept rows stay kept,
- per-stratum rates (downsample by language/domain/source) are one
  CASE expression, no per-stratum scans.

Pure JVM column expressions — a narrow filter that pushes to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_fraction(key: Column, *, seed: str = "") -> Column:
    """Deterministic uniform [0,1) from the md5 of (seed || key).

    Uses the first 8 hex digits (32 bits) — granularity 2^-32, far below
    any useful sampling rate.  Changing ``seed`` draws an independent
    sample."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(seed), key.cast("string"))), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(2**32))
    )


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate: float,
    *,
    seed: str = "",
) -> DataFrame:
    """Keep each row iff hash_fraction(key) < rate.  Deterministic,
    partitioning-invariant, engine-portable."""
    return df.filter(hash_fraction(F.col(key_col), seed=seed) < F.lit(float(rate)))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 0.0,
    seed: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: row kept iff
    hash_fraction(key) < rates[stratum] (``default_rate`` for strata not
    listed).  The canonical corpus-curation move — e.g. keep 100% of rare
    languages, 10% of English — in one scan + one narrow filter."""
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == F.lit(value), F.lit(float(r))).otherwise(rate)
    return df.filter(hash_fraction(F.col(key_col), seed=seed) < rate)


def per_key_cap(
    df: DataFrame,
    key_col: str,
    cap: int,
    *,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Deterministic per-key document cap (RefinedWeb-style per-domain
    limit): within each key, rank rows by (hash_fraction(id), id) and
    keep the first ``cap``.  The hash ranking makes the kept set a
    uniform, reproducible, partitioning-invariant sample of each key —
    append-only corpora keep previously-kept rows kept as long as their
    rank holds.

    Output: df + ``key_rank`` (1-based) + ``kept``.

    Scale note: ranking is a window over ``key_col`` — a pathologically
    hot key materializes in one task (windows are not AQE-splittable).
    For the keep-decision alone at extreme skew, prefer a two-pass
    threshold: count per key, then keep hash_fraction < cap/count
    (approximate cap, no window); this operator keeps the exact-rank
    form because per-domain caps are small and domain cardinality high.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        hash_fraction(F.col(id_col), seed=seed).asc(), F.col(id_col).asc()
    )
    return df.withColumn("key_rank", F.row_number().over(w).cast("long")).withColumn(
        "kept", F.col("key_rank") <= F.lit(int(cap))
    )


def epoch_shuffle(
    docs: DataFrame,
    *,
    n_epochs: int = 1,
    n_shards: int = 16,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Reproducible per-epoch training order WITHOUT a global sort:
    for each epoch, every document gets a fresh pseudo-random 60-bit
    key (md5 of seed:epoch:id), the key's low bits pick a shard, and
    rank-within-shard gives the read position — so each worker streams
    its shard sequentially while the corpus-wide order is a fresh
    deterministic permutation every epoch (same seed => same order on
    any cluster, any partitioning: the reproducibility a training run
    needs to resume mid-epoch).

    Output: (id, epoch, shard, pos) with pos 0-based within (epoch,
    shard).

    Scale shape: the epoch fan-out is a row-local explode; shard
    assignment is arithmetic on the key; the only ordering work is a
    rank window PER (epoch, shard) — 1/(E*S) of the corpus per task,
    never a global sort.  md5-derived, so an external SQL engine
    replays the full permutation bit-for-bit."""
    from pyspark.sql import Window

    if n_epochs < 1 or n_shards < 1:
        raise ValueError("n_epochs and n_shards must be >= 1")
    epochs = docs.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(int(n_epochs) - 1))).alias("epoch"),
    )
    key = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.lit(seed), F.col("epoch").cast("string"),
                    F.col(id_col).cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    keyed = epochs.select(
        id_col, "epoch", key.alias("__k"),
        (key % F.lit(int(n_shards))).cast("int").alias("shard"),
    )
    w = Window.partitionBy("epoch", "shard").orderBy(F.col("__k").asc(), F.col(id_col).asc())
    return keyed.select(
        id_col,
        "epoch",
        "shard",
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
    )


def mixture_weights(
    docs: DataFrame,
    targets: dict[str, float],
    *,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source downsampling rates that realize a target token mixture
    (the DoReMi / Pile-style domain-reweighting preprocessing step).

    Given target shares over sources, find the LARGEST corpus achievable
    by pure downsampling (no source may be upsampled):

        achievable_total = min over targeted s of  n_tokens_s / share_s
        rate_s           = share_s * achievable_total / n_tokens_s

    so the binding source keeps rate 1.0 and every other targeted source
    is downsampled to hit its share exactly; untargeted sources get rate
    0.  Feed the rates to ``stratified_hash_sample`` for the actual
    deterministic row selection.

    Output per source: (source, n_docs, n_tokens, actual_share,
    target_share, sampling_rate, expected_tokens).

    Plan: one map-side-combined groupBy on source (the only big-data
    pass); the mixture arithmetic runs over the k-row aggregate via a
    partition-less window — k = number of sources, trivially tiny.  All
    arithmetic is single IEEE ops on exact integer counts, so an external
    SQL oracle hash-matches it bit-for-bit.
    """
    from pyspark.sql import Window

    total = float(sum(targets.values()))
    share = F.lit(None).cast("double")
    for value, s in sorted(targets.items()):
        share = F.when(F.col(source_col) == F.lit(value), F.lit(s / total)).otherwise(share)

    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    agg = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(toks).alias("n_tokens"),
    )
    w = Window.partitionBy()
    nt = F.col("n_tokens").cast("double")
    achievable = F.min(
        F.when(F.col("target_share").isNotNull(), nt / F.col("target_share"))
    ).over(w)
    return (
        agg.withColumn("target_share", share)
        .withColumn("actual_share", nt / F.sum("n_tokens").over(w).cast("double"))
        .withColumn(
            "sampling_rate",
            F.coalesce(F.col("target_share") * achievable / nt, F.lit(0.0)),
        )
        .withColumn(
            "expected_tokens",
            F.coalesce((F.col("target_share") * achievable), F.lit(0.0)),
        )
        .select(
            source_col,
            "n_docs",
            "n_tokens",
            "actual_share",
            F.coalesce("target_share", F.lit(0.0)).alias("target_share"),
            "sampling_rate",
            "expected_tokens",
        )
    )


def quality_bins(
    df: DataFrame,
    score_col: str,
    *,
    n_bins: int = 10,
    by: str | list[str] | None = None,
    id_col: str = "doc_id",
    out_col: str = "bin",
) -> DataFrame:
    """Curriculum binning: rank-exact ``ntile`` buckets of ``score_col``
    (bin 1 = lowest scores), deterministic via an (score, id) total
    order.  Rank-based, so no floating-point comparability concerns —
    the bin boundaries are positions, not values.

    At scale prefer per-group binning (``by``): a global ntile is a
    single total order (range-partitioned sort — workable but a full
    sort); per-group ntile windows sort only within partitions.
    Appends ``out_col``; all input columns pass through.
    """
    from pyspark.sql import Window

    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    w = (Window.partitionBy(*keys) if keys else Window.partitionBy()).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    return df.withColumn(out_col, F.ntile(int(n_bins)).over(w))


def importance_sample(
    df: DataFrame,
    prob_col: Column | str,
    *,
    key_col: str = "doc_id",
    seed: str = "",
    keep_col: str | None = None,
) -> DataFrame:
    """Per-row Bernoulli keep with row-specific probability — the
    deterministic resampling half of importance-weighted data selection
    (DSIR-style: feed a normalized weight in as ``prob_col``).

    Keep iff hash_fraction(key) < clamp(prob, 0, 1): deterministic,
    partitioning-invariant, engine-portable (same md5 coin as
    ``hash_sample``), and independent draws per ``seed``.  With
    ``keep_col`` set, appends the boolean instead of filtering (the
    audit/debug shape); default filters.  Pure map either way — zero
    shuffle at any corpus size.
    """
    p = F.col(prob_col) if isinstance(prob_col, str) else prob_col
    clamped = F.least(F.greatest(p.cast("double"), F.lit(0.0)), F.lit(1.0))
    keep = hash_fraction(F.col(key_col), seed=seed) < clamped
    if keep_col is not None:
        return df.withColumn(keep_col, keep)
    return df.filter(keep)


def weighted_sample(
    df: DataFrame,
    weight_col: Column | str,
    k: int,
    *,
    key_col: str = "doc_id",
    by: str | list[str] | None = None,
    seed: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): rank every row by ln(u)/w with u = the md5 uniform
    of its key and keep the top k — inclusion probability proportional
    to weight, no replacement, one pass, no sequential reservoir.

    Engine-portable determinism: ln(u) is floor-quantized to 2^-20 (the
    dyadic-exact trick), the /w division is a single correctly-rounded
    IEEE op, and the (key, id) sort breaks ties — so the SAME k rows
    come back from any engine or partitioning.  Non-positive weights
    are excluded (zero weight = never sampled).

    With ``by``, samples k per group (window rank); globally it is a
    top-k sort — both rank-based, no full materialization of the sort.
    """
    from pyspark.sql import Window

    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # nudge u off zero (a 2^-32 event that WILL happen at corpus scale:
    # ln(0) is -inf/null depending on engine); the +2^-33 is exact and
    # identical cross-engine
    u = hash_fraction(F.col(key_col), seed=seed) + F.lit(2.0 ** -33)
    # u in (0,1]: ln(u) <= 0; larger key = better.  floor-quantize the
    # ln so both engines agree bit-for-bit, then one exact division.
    scale = float(1 << 20)
    lnu_q = F.floor(F.log(u) * F.lit(scale)) / F.lit(scale)
    rank_key = lnu_q / w.cast("double")
    filtered = df.filter(w.cast("double") > 0).withColumn("__es_key", rank_key)
    keys = [] if by is None else ([by] if isinstance(by, str) else list(by))
    win = (Window.partitionBy(*keys) if keys else Window.partitionBy()).orderBy(
        F.col("__es_key").desc(), F.col(key_col).asc()
    )
    return (
        filtered.withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= int(k))
        .drop("__es_key", "__rn")
    )


def assign_split(
    df: DataFrame,
    key_col: str | Column,
    *,
    splits: list[tuple[str, float]] = (("train", 0.8), ("val", 0.1), ("test", 0.1)),
    seed: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: the md5 fraction of
    ``key_col`` is bucketed by cumulative split boundaries, in order.

    The same guarantees as every hash sampler here: stable under
    repartitioning, engine-portable (the boundary floats are plain
    float sums — replay the same accumulation when writing the SQL
    twin), and ADDITIVE — re-running on a grown corpus never moves a
    previously assigned row.  Fractions should sum to 1; the last split
    absorbs any rounding remainder (it is the CASE else-branch)."""
    u = hash_fraction(F.col(key_col) if isinstance(key_col, str) else key_col, seed=seed)
    names = [n for n, _ in splits]
    bounds: list[float] = []
    acc = 0.0
    for _, frac in splits[:-1]:
        acc = acc + float(frac)
        bounds.append(acc)
    expr = F.lit(names[-1])
    for name, b in reversed(list(zip(names[:-1], bounds))):
        expr = F.when(u < F.lit(b), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def leakage_safe_split(
    docs: DataFrame,
    dup_pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    splits: list[tuple[str, float]] = (("train", 0.8), ("val", 0.1), ("test", 0.1)),
    seed: str = "",
) -> DataFrame:
    """Train/val/test split that can NEVER leak a near-duplicate across
    the boundary: duplicate pairs are collapsed to clusters (distributed
    connected components, O(log n) rounds), the split coin is tossed on
    the CLUSTER id, and every member inherits its cluster's split.

    This is the assignment a 100 TB pretraining pipeline must make —
    splitting on doc_id contaminates eval whenever near-duplicates of a
    held-out doc land in train (the same failure decontamination guards
    against for EXTERNAL benchmarks, here applied to the corpus's own
    splits).  Output: (id_col, cluster_id, split) — a total map over
    ``docs``; singletons are their own cluster.  One CC pass + one
    md5-CASE map; no extra shuffle beyond the CC itself.
    """
    from patternly_spark.operators.graph import dedup_clusters

    clusters = dedup_clusters(dup_pairs, docs=docs, a_col=a_col, b_col=b_col, id_col=id_col)
    return assign_split(clusters, "cluster_id", splits=splits, seed=seed).select(
        id_col, "cluster_id", "split"
    )


def epoch_mixture_sample(
    docs: DataFrame,
    targets: dict[str, float],
    token_budget: float,
    *,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Materialize a target token mixture AT a fixed total budget,
    upsampling by whole epochs where a source is too small — the step
    after ``mixture_weights`` when the budget is non-negotiable (the
    LLaMA/DoReMi recipe: rare domains repeat for multiple epochs, big
    domains are subsampled, and every domain lands on budget*share
    tokens in expectation).

    Per source: rate_s = share_s * budget / n_tokens_s (MAY exceed 1).
    Per doc: copies = floor(rate_s) + 1{u < frac(rate_s)} with u the
    md5 fraction of (seed, doc id) — so expected copies = rate_s
    exactly, selection is deterministic/engine-portable, and a doc is
    never fractionally present.  Output: one row per (doc, epoch),
    epoch in 1..copies, with n_copies riding along.

    Plan: one map-side-combined groupBy(source) for token totals
    (source-sized result, broadcast back), then a pure map: coin +
    sequence-explode.  No data-sized shuffle at all — the explode is
    the upsampling itself.  Untargeted sources rate 0 (dropped).
    """
    total = float(sum(targets.values()))
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    per_src = docs.groupBy(source_col).agg(F.sum(toks).alias("__n_tokens"))
    share = F.lit(None).cast("double")
    for value, s in sorted(targets.items()):
        share = F.when(F.col(source_col) == F.lit(value), F.lit(float(s) / total)).otherwise(share)
    rates = per_src.select(
        source_col,
        F.coalesce(
            share * F.lit(float(token_budget)) / F.col("__n_tokens").cast("double"),
            F.lit(0.0),
        ).alias("__rate"),
    )
    u = hash_fraction(F.col(id_col), seed=seed)
    base = F.floor("__rate").cast("long")
    coin = (u < (F.col("__rate") - F.floor("__rate"))).cast("long")
    out = (
        docs.join(F.broadcast(rates), source_col)
        .withColumn("n_copies", base + coin)
        .filter(F.col("n_copies") >= 1)
        .withColumn("epoch", F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies"))))
        .drop("__rate")
    )
    return out


def temperature_mixture(
    docs: DataFrame,
    *,
    tau: float = 0.5,
    source_col: str = "source",
    text_col: str = "text",
    quant_bits: int = 20,
) -> DataFrame:
    """Temperature-smoothed source mixture (the XLM/mT5 multilingual
    sampling rule): target share of source s is ``n_tokens_s^tau``
    normalized over sources — tau=1 keeps the natural mixture, tau->0
    approaches uniform, 0<tau<1 up-weights small sources without
    explicit per-source targets.  The rates realize the LARGEST corpus
    achievable by pure downsampling (binding source keeps rate 1.0),
    exactly like ``mixture_weights``.

    Output per source: (source, n_docs, n_tokens, raw_share,
    temp_share, sampling_rate, expected_tokens).

    Cross-engine exactness: ``n_tokens^tau`` is quantized to dyadic
    rationals (``floor(x * 2^quant_bits)`` as BIGINT) before the
    normalizing sum, so the sum is integer-exact regardless of fold
    order and every downstream value is a single IEEE op on identical
    operands.  For tau=0.5 the power is computed with ``sqrt`` (an
    IEEE-exact operation on every engine); other tau values go through
    ``pow``, which may differ in the last ulp across libm builds — the
    quantization absorbs that only below the 2^-quant_bits grain.

    Plan shape: one map-side-combined groupBy on source; the mixture
    arithmetic runs on the k-row aggregate (k = #sources) via
    partition-less windows — trivially tiny at any corpus scale.
    """
    from pyspark.sql import Window

    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    agg = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(toks).alias("n_tokens"),
    )
    nt = F.col("n_tokens").cast("double")
    powed = F.sqrt(nt) if tau == 0.5 else F.pow(nt, F.lit(float(tau)))
    scale = float(1 << quant_bits)
    q = F.floor(powed * F.lit(scale)).cast("long")
    w = Window.partitionBy()
    temp_share = q.cast("double") / F.sum(q).over(w).cast("double")
    out = (
        agg.withColumn("raw_share", nt / F.sum("n_tokens").over(w).cast("double"))
        .withColumn("temp_share", temp_share)
        .withColumn("__ach", F.min(nt / F.col("temp_share")).over(w))
    )
    return out.select(
        source_col,
        "n_docs",
        "n_tokens",
        "raw_share",
        "temp_share",
        (F.col("temp_share") * F.col("__ach") / nt).alias("sampling_rate"),
        (F.col("temp_share") * F.col("__ach")).alias("expected_tokens"),
    )


def ring_negatives(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    k: int = 3,
    n_buckets: int = 16,
    seed: str = "",
) -> DataFrame:
    """Deterministic uniform negative sampling for contrastive training:
    every anchor's negatives are the next ``k`` rows on its bucket's
    md5 hash ring (with wraparound).  Hash order is pseudorandom with
    respect to content, so ring successors are as-good-as-random
    negatives — but unlike ``rand()`` the assignment is a pure function
    of the id set + seed: identical on any engine/partitioning, stable
    across re-runs, and SQL-replayable for verification.

    Output: (id, slot 1..k, neg_id), one row per anchor x slot.
    Buckets smaller than k+1 yield fewer (deduplicated, never-self)
    negatives for their members.

    Scale shape: one row_number window PER BUCKET (keyed shuffle, no
    global sort — buckets bound the sort extent) + one equi-join on
    (bucket, position).  ``n_buckets`` trades window extent against
    within-bucket mixing; at corpus scale use e.g. 2^12 buckets so each
    ring sorts millions, not the corpus.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    bucket = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(int(n_buckets))
    )
    ring = df.select(
        F.col(id_col).alias("id"), h.alias("__h"), bucket.alias("__b")
    )
    w = Window.partitionBy("__b").orderBy("__h", "id")
    pos = ring.withColumn("__r", F.row_number().over(w))
    sizes = pos.groupBy("__b").agg(F.max("__r").alias("__size"))
    anchors = pos.join(F.broadcast(sizes), "__b")
    slots = F.explode(F.sequence(F.lit(1), F.lit(int(k)))).alias("slot")
    probes = anchors.select("__b", "id", "__r", "__size", slots).withColumn(
        "__target", ((F.col("__r") - 1 + F.col("slot")) % F.col("__size")) + 1
    )
    negs = pos.select("__b", F.col("__r").alias("__target"), F.col("id").alias("neg_id"))
    return (
        probes.join(negs, ["__b", "__target"])
        .filter(F.col("neg_id") != F.col("id"))
        .select(F.col("id").alias(id_col), F.col("slot").cast("int").alias("slot"), "neg_id")
    )


def neyman_allocation(
    df: DataFrame,
    *,
    stratum_cols: list[str],
    value_col: str,
    total_n: int,
    cents_scale: int = 100,
    units: int = 1 << 20,
) -> DataFrame:
    """Neyman-optimal stratified-sample allocation: stratum h of size
    N_h with value standard deviation s_h receives

        n_h = total_n * (N_h * s_h) / sum_k(N_k * s_k)

    — the allocation minimizing the variance of the stratified mean at a
    fixed budget (Neyman 1934; the survey-sampling classic, and the
    right way to size per-source eval draws when sources differ wildly
    in spread).

    Engine-exact by the repo's dyadic-units convention: values are
    floor-quantized to integer "cents" (``cents_scale``), per-stratum
    (N, sum, sum-of-squares) stay in BIGINT, the sample variance
    N*ss - s^2 over N*(N-1) is one division + one sqrt, and the weight
    N_h*s_h is floor-quantized to ``units`` (2^20) BEFORE the cross-
    stratum sum — integer addition is associative, so the denominator
    (and hence every share) is identical under any partitioning or
    engine.  Strata with N_h < 2 carry zero weight (variance undefined).

    BIGINT headroom: |cents| <= C means ss <= rows * C^2 — at 100 TB
    move ``cents_scale`` down (coarser cents) or lift the sums to
    DECIMAL(38,0); the quantized-weight algebra is unchanged.

    One groupBy over the strata + a 1-row denominator broadcast back.
    Output: (stratum_cols..., n_rows, sd, weight_units, share, alloc_n).
    Compose with :func:`stratified_hash_sample` using rates
    alloc_n / n_rows to actually draw the sample deterministically.
    """
    v = F.floor(F.col(value_col).cast("double") * F.lit(float(cents_scale))).cast(
        "long"
    )
    agg = df.groupBy(*stratum_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(v).alias("__s1"),
        F.sum(v * v).alias("__s2"),
    )
    var = F.when(
        F.col("n_rows") >= 2,
        (
            F.col("n_rows") * F.col("__s2") - F.col("__s1") * F.col("__s1")
        ).cast("double")
        / (F.col("n_rows") * (F.col("n_rows") - 1)).cast("double"),
    ).otherwise(F.lit(0.0))
    stats = agg.withColumn(
        "sd", F.sqrt(var) / F.lit(float(cents_scale))
    ).withColumn(
        "weight_units",
        F.floor(F.col("n_rows").cast("double") * F.col("sd") * F.lit(float(units))).cast(
            "long"
        ),
    )
    denom = stats.agg(F.sum("weight_units").alias("__denom"))
    share = F.when(
        F.col("__denom") > 0,
        F.col("weight_units").cast("double") / F.col("__denom").cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        stats.crossJoin(F.broadcast(denom))
        .withColumn("share", share)
        .withColumn("alloc_n", F.lit(float(int(total_n))) * F.col("share"))
        .select(*stratum_cols, "n_rows", "sd", "weight_units", "share", "alloc_n")
    )
