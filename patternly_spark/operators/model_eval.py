"""Model-evaluation statistics over scored corpora: ROC-AUC and
calibration (reliability) tables, per group.

The question a quality-classifier-driven curation pipeline (the q193
hashed linear classifier, a fastText-style filter, a reward model) asks
before its scores gate 100 TB of data: "does the score actually rank
good above bad (AUC), and does score 0.8 actually mean ~80% (calibration)?"
The reference engine has no supervised-evaluation surface; this is
first-class extension surface (builder brief: quality scoring).

Cross-engine determinism: AUC is the Mann-Whitney rank statistic kept in
INTEGER arithmetic until a single final division — doubled average ranks
(2*cum_before + n + 1) make tie handling exact without ever forming a
fractional rank, so the statistic is identical under any partitioning or
engine.  Calibration bins assume dyadic-rational scores (k/2^b grids, the
repo's convention for synthesized scores); then per-bin double sums are
exact in any order and every output is integers + one fixed IEEE chain.

Scale shape: AUC is one (group, score) count shuffle (the grid is
|distinct scores| rows, not data-sized) + one group-partitioned window
over that grid + one group aggregate.  Calibration is a single groupBy.
No UDFs, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from patternly_spark.plans import local_rows

__all__ = ["roc_auc", "calibration_bins", "ranking_metrics", "fleiss_kappa", "logistic_regression"]


def roc_auc(
    df: DataFrame,
    *,
    label_col: str,
    score_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact ROC-AUC per group via the Mann-Whitney U statistic with
    midrank tie correction:

        AUC = (R_pos - P(P+1)/2) / (P * N)

    where R_pos is the sum of average ranks of the positives (ranks over
    the score ascending, ties sharing their midrank), P/N the positive/
    negative counts.  This equals the probability a random positive
    outranks a random negative, counting ties as 1/2 — the trapezoidal
    area under the ROC curve.

    Exactness: ranks are never materialized per row.  Scores collapse to
    a (group, score) -> (n, pos) grid; a cumulative-count window gives
    each score's midrank DOUBLED as the integer 2*cum_before + n + 1, so

        2*R_pos = sum(pos * (2*cum_before + n + 1))

    stays in BIGINT and AUC = (2*R_pos - P*(P+1)) / (2*P*N) is one final
    division — bit-identical across engines and partitionings.  Groups
    with no positives or no negatives report NULL (AUC undefined).

    Output: (group_cols..., n_pos, n_neg, auc).

    Scale: the shuffle key is (group, score) — cardinality bounded by
    the score grid, not the corpus; the window partitions by group over
    that collapsed grid.  For continuous float scores at 100 TB,
    pre-quantize the score (the calibration-bin grid works) to bound the
    grid; the midrank algebra is then exact on the quantized statistic.
    """
    gcols = list(group_cols or [])
    lbl = F.col(label_col).cast("int")
    grid = df.groupBy(*gcols, F.col(score_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(lbl).cast("long").alias("__p"),
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in gcols])
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = grid.withColumn("__cum", F.sum("__n").over(w) - F.col("__n"))
    # doubled midrank of every row at this score: 2*cum_before + n + 1
    dbl_rank = F.lit(2) * F.col("__cum") + F.col("__n") + F.lit(1)
    agg = ranked.groupBy(*gcols).agg(
        F.sum("__p").cast("long").alias("n_pos"),
        (F.sum("__n") - F.sum("__p")).cast("long").alias("n_neg"),
        F.sum(F.col("__p") * dbl_rank).cast("long").alias("__r2"),
    )
    p, n = F.col("n_pos"), F.col("n_neg")
    auc = F.when(
        (p > 0) & (n > 0),
        (F.col("__r2") - p * (p + F.lit(1))).cast("double")
        / (F.lit(2) * p * n).cast("double"),
    )
    return agg.select(*gcols, "n_pos", "n_neg", auc.alias("auc"))


def calibration_bins(
    df: DataFrame,
    *,
    label_col: str,
    score_col: str,
    bins: int = 10,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Reliability table: scores in [0, 1] bucketed into ``bins``
    equal-width bins (right-closed top bin), per bin the count, mean
    predicted score, empirical positive rate, the calibration gap
    (mean_score - frac_pos), and the bin's Brier contribution
    sum((score - label)^2) / n_total over the WHOLE group — so summing
    ``brier_term`` across a group's bins yields the group's Brier score.

    Exactness contract: with dyadic-rational scores (any k/2^b grid —
    the repo's synthesized-score convention, and what a quantized model
    head emits) the per-bin sums of scores and squared errors are exact
    doubles in any accumulation order; every other column is integer
    counts + one division.  With arbitrary float scores the sums are
    conventionally rounded like any floating aggregate.

    One groupBy over (group, bin): a single data shuffle whose key space
    is |groups| * bins.  Empty bins are absent (no grid completion —
    join against a spine if a dense reliability curve is needed).
    """
    gcols = list(group_cols or [])
    s = F.col(score_col).cast("double")
    lbl = F.col(label_col).cast("int")
    b = F.least(F.floor(s * F.lit(int(bins))).cast("int"), F.lit(int(bins) - 1))
    binned = df.select(
        *gcols,
        b.alias("bin"),
        s.alias("__s"),
        lbl.alias("__l"),
        (s - lbl.cast("double")) .alias("__e"),
    )
    wtot = Window.partitionBy(*[F.col(c) for c in gcols]) if gcols else Window.partitionBy()
    agg = binned.groupBy(*gcols, "bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__s").alias("__ss"),
        F.sum("__l").cast("long").alias("n_pos"),
        F.sum(F.col("__e") * F.col("__e")).alias("__se"),
    )
    total = agg.withColumn("__ntot", F.sum("n").over(wtot))
    mean_score = F.col("__ss") / F.col("n").cast("double")
    frac_pos = F.col("n_pos").cast("double") / F.col("n").cast("double")
    return total.select(
        *gcols,
        "bin",
        "n",
        "n_pos",
        mean_score.alias("mean_score"),
        frac_pos.alias("frac_pos"),
        (mean_score - frac_pos).alias("gap"),
        (F.col("__se") / F.col("__ntot").cast("double")).alias("brier_term"),
    )


def _ranking_sums(
    ranked: DataFrame,
    *,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    k_values: tuple[int, ...] = (1, 5, 10),
    units: int = 1 << 20,
) -> DataFrame:
    """The additive half of ``ranking_metrics``: ONE row of INTEGER
    corpus sums (n_queries + per-k p_num/r_u/n_u/m_u in 2^-20 units).
    Integer sums are associative and commutative, so sums over disjoint
    query batches FOLD by column-wise addition — what the streaming
    registry persists (``streaming/evaluation.py``)."""
    import math
    from functools import reduce

    ks = sorted(set(int(k) for k in k_values))
    kmax = ks[-1]
    u = int(units)
    disc = [math.floor((1.0 / math.log2(r + 1.0)) * u) for r in range(1, kmax + 1)]
    idcg_prefix = [0]
    for d in disc:
        idcg_prefix.append(idcg_prefix[-1] + d)

    rank = F.col(rank_col).cast("int")
    rel = F.col(rel_col)
    disc_arr = F.array(*[F.lit(d) for d in disc])
    aggs = [
        F.sum(rel.cast("int")).cast("long").alias("rel_total"),
        F.min(F.when(rel, rank)).alias("first_rel"),
    ]
    for k in ks:
        aggs.append(
            F.sum(F.when(rel & (rank <= k), 1).otherwise(0))
            .cast("long")
            .alias(f"rel_at_{k}")
        )
        aggs.append(
            F.sum(
                F.when(rel & (rank <= k), F.element_at(disc_arr, rank)).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias(f"dcg_u_{k}")
        )
    per_q = (
        ranked.groupBy(query_col).agg(*aggs).filter(F.col("rel_total") > 0)
    )

    idcg_arr = F.array(*[F.lit(v) for v in idcg_prefix])
    fu = F.lit(float(u))
    col_aggs = [F.count(F.lit(1)).cast("long").alias("n_queries")]
    for k in ks:
        m = F.least(F.col("rel_total"), F.lit(k))
        idcg_u = F.element_at(idcg_arr, (m + F.lit(1)).cast("int"))
        ndcg_q = F.floor(
            F.col(f"dcg_u_{k}").cast("double") / idcg_u.cast("double") * fu
        ).cast("long")
        recall_q = F.floor(
            F.col(f"rel_at_{k}").cast("double")
            / F.col("rel_total").cast("double")
            * fu
        ).cast("long")
        mrr_q = (
            F.when(
                F.col("first_rel") <= k,
                F.floor(
                    F.lit(1.0) / F.col("first_rel").cast("double") * fu
                ).cast("long"),
            )
            .otherwise(F.lit(0).cast("long"))
        )
        col_aggs += [
            F.sum(F.col(f"rel_at_{k}")).cast("long").alias(f"p_num_{k}"),
            F.sum(recall_q).cast("long").alias(f"r_u_{k}"),
            F.sum(ndcg_q).cast("long").alias(f"n_u_{k}"),
            F.sum(mrr_q).cast("long").alias(f"m_u_{k}"),
        ]
    return per_q.agg(*col_aggs)


def _sums_to_metrics(
    tot: DataFrame,
    *,
    k_values: tuple[int, ...] = (1, 5, 10),
    units: int = 1 << 20,
) -> DataFrame:
    """Finalize a ``_ranking_sums`` row (possibly column-wise-added
    across batches) into the per-k metric table: integer sums + one
    division per metric — engine-exact."""
    from functools import reduce

    ks = sorted(set(int(k) for k in k_values))
    fu = F.lit(float(units))

    outs = []
    for k in ks:
        nq = F.col("n_queries").cast("double")
        outs.append(
            tot.select(
                F.lit(k).alias("k"),
                F.col("n_queries"),
                (
                    F.col(f"p_num_{k}").cast("double") / (F.lit(float(k)) * nq)
                ).alias("mean_precision"),
                (F.col(f"r_u_{k}").cast("double") / (fu * nq)).alias(
                    "mean_recall"
                ),
                (F.col(f"n_u_{k}").cast("double") / (fu * nq)).alias(
                    "mean_ndcg"
                ),
                (F.col(f"m_u_{k}").cast("double") / (fu * nq)).alias(
                    "mean_mrr"
                ),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


def ranking_metrics(
    ranked: DataFrame,
    *,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    k_values: tuple[int, ...] = (1, 5, 10),
    units: int = 1 << 20,
) -> DataFrame:
    """Retrieval-evaluation summary over a ranked candidate table
    (query, rank 1..n, boolean relevance): per cutoff k the corpus-mean
    precision@k, recall@k, NDCG@k (binary gains, ideal ordering of the
    LIST's relevance — document-level judgments outside the list are
    unknown by construction), and MRR@k (1/rank of the first relevant
    hit at or above k, else 0).  Metrics average over queries with at
    least one relevant item in the list (the standard convention —
    a query with no relevant candidates defines none of these).

    Engine-exactness: the NDCG discount 1/log2(r+1) is NOT computed in
    any engine — it is a Python-precomputed table floor-quantized to
    ``units`` (2^-20) INTEGER weights, so per-query DCG is an integer
    sum (order-free) and ideal DCG is an integer prefix lookup; every
    per-query ratio (recall, ndcg, 1/first_rel) is one exact division
    floor-quantized back to integer units before the cross-query sum.
    Corpus means are integer sums + one final division — identical
    under any partitioning or engine.  Mean precision@k needs no
    quantization at all: sum(rel_at_k) / (k * n_queries).

    Shape: one groupBy over queries, one 1-row aggregate
    (localCheckpoint-ed — it feeds one output row per k), k tiny
    selects unioned.  The ranked input is typically ANN output
    (``int8_topk``/``ivf_topk``): |queries| * k rows, never
    corpus-sized.

    Output: (k, n_queries, mean_precision, mean_recall, mean_ndcg,
    mean_mrr).
    """
    tot = _ranking_sums(
        ranked,
        query_col=query_col,
        rank_col=rank_col,
        rel_col=rel_col,
        k_values=k_values,
        units=units,
    ).localCheckpoint(eager=True)
    return _sums_to_metrics(tot, k_values=k_values, units=units)


def isotonic_calibration(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
    max_grid: int = 512,
) -> DataFrame:
    """EXACT isotonic regression of label on score per group — the
    monotone calibration map (Zadrozny-Elkan): the non-decreasing step
    function minimizing squared error, i.e. what sklearn's
    IsotonicRegression/PAVA produces, here via the equivalent minimax
    characterization

        fit(i) = max over j <= i of ( min over k >= i of mean(y[j..k]) )

    evaluated RELATIONALLY on the distinct-score grid: every candidate
    block mean is (integer label sum) / (integer count) — ONE exact
    division — and min/max are order-free, so the whole fit is
    engine-exact with no quantization at all (no PAVA loop to replay:
    the oracle is three plain joins).

    Scale shape: one (group, score) shuffle builds the grid (m = 
    distinct scores per group, NOT data-sized); the minimax is a
    grid×grid block relation (m² rows) theta-joined to grid indices —
    O(m³) grouped work per group, all JVM-side.  That is the deliberate
    trade for exactness + SQL-replayability; ``max_grid`` raises beyond
    m=512 (137M grouped rows/group) — quantize scores to a coarser grid
    first (calibration pipelines bin scores anyway; the q206 dyadic
    convention).

    Output: (group_cols..., score, n, positives, fit) — fit is the
    calibrated probability at each observed score, non-decreasing in
    score within each group.
    """
    gcols = list(group_cols or [])
    grid = df.groupBy(
        *gcols, F.col(score_col).cast("double").alias("score")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(label_col).cast("long")).cast("long").alias("positives"),
    )
    wc = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    wide = grid.withColumn("__m", F.count(F.lit(1)).over(wc))
    over = wide.filter(F.col("__m") > int(max_grid)).limit(1).collect()
    if over:
        raise ValueError(
            f"isotonic_calibration: a group has {over[0]['__m']} distinct "
            f"scores > max_grid={max_grid}; bin scores to a coarser grid first"
        )
    w = (
        Window.partitionBy(*gcols).orderBy("score")
        if gcols
        else Window.orderBy("score")
    )
    ws = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    idx = grid.select(
        *gcols,
        "score",
        "n",
        "positives",
        F.row_number().over(w).alias("i"),
        F.sum("positives").over(ws).alias("cy"),
        F.sum("n").over(ws).alias("cn"),
    )
    a = idx.select(
        *[F.col(g).alias(f"__ga_{g}") for g in gcols],
        F.col("i").alias("j"),
        (F.col("cy") - F.col("positives")).alias("cy0"),
        (F.col("cn") - F.col("n")).alias("cn0"),
    )
    b = idx.select(
        *[F.col(g).alias(f"__gb_{g}") for g in gcols],
        F.col("i").alias("k"),
        F.col("cy").alias("cy1"),
        F.col("cn").alias("cn1"),
    )
    cond = F.col("j") <= F.col("k")
    for g in gcols:
        cond = cond & (F.col(f"__ga_{g}") == F.col(f"__gb_{g}"))
    blocks = a.join(b, cond).select(
        *[F.col(f"__ga_{g}").alias(g) for g in gcols],
        "j",
        "k",
        (
            (F.col("cy1") - F.col("cy0")).cast("double")
            / (F.col("cn1") - F.col("cn0")).cast("double")
        ).alias("__mean"),
    )
    pts = idx.select(*[F.col(g).alias(f"__gi_{g}") for g in gcols], F.col("i"))
    jcond = (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i"))
    for g in gcols:
        jcond = jcond & (F.col(g) == F.col(f"__gi_{g}"))
    inner = (
        blocks.join(pts, jcond)
        .groupBy(*gcols, "i", "j")
        .agg(F.min("__mean").alias("__lo"))
        .groupBy(*gcols, "i")
        .agg(F.max("__lo").alias("fit"))
    )
    return idx.join(inner, [*gcols, "i"]).select(
        *gcols, "score", "n", "positives", "fit"
    )


def threshold_sweep(
    df: DataFrame,
    *,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact precision/recall/F1 at EVERY decision threshold per group —
    the operating-point table behind "where do I set the quality-filter
    cutoff?".  Thresholds are the distinct observed scores (predict
    positive when score >= t), so the table is complete: every
    achievable confusion matrix appears exactly once.

    Exactness: one (group, score) count shuffle builds the grid; TP/FP
    at each threshold are ONE descending cumulative window over it
    (integer sums); P/R/F1 are integer-ratio single divisions.
    F1 = 2*TP / (2*TP + FP + FN) — computed in that integer form, no
    intermediate P*R rounding.  ``is_best`` marks the row maximizing
    (f1, then lower threshold) under a total ordering, so it is
    deterministic on any engine.

    Scale: grid-sized after the first shuffle (distinct scores per
    group, not rows); a continuous score at 100 TB should be quantized
    to a fixed grid first (the q206 convention) or the table itself
    becomes data-sized.

    Output: (group_cols..., threshold, tp, fp, fn, tn, precision,
    recall, f1, is_best).
    """
    gcols = list(group_cols or [])
    grid = df.groupBy(
        *gcols, F.col(score_col).cast("double").alias("threshold")
    ).agg(
        F.sum(F.col(label_col).cast("long")).cast("long").alias("__p"),
        F.sum(F.lit(1) - F.col(label_col).cast("long")).cast("long").alias("__n"),
    )
    wdesc = (
        Window.partitionBy(*gcols)
        .orderBy(F.desc("threshold"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    cum = grid.select(
        *gcols,
        "threshold",
        F.sum("__p").over(wdesc).alias("tp"),
        F.sum("__n").over(wdesc).alias("fp"),
        F.sum("__p").over(wtot).alias("__ptot"),
        F.sum("__n").over(wtot).alias("__ntot"),
    )
    fn = F.col("__ptot") - F.col("tp")
    tn = F.col("__ntot") - F.col("fp")
    prec = F.when(
        (F.col("tp") + F.col("fp")) > 0,
        F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double"),
    )
    rec = F.when(
        F.col("__ptot") > 0,
        F.col("tp").cast("double") / F.col("__ptot").cast("double"),
    )
    f1 = F.when(
        (F.lit(2) * F.col("tp") + F.col("fp") + fn) > 0,
        (F.lit(2) * F.col("tp")).cast("double")
        / (F.lit(2) * F.col("tp") + F.col("fp") + fn).cast("double"),
    )
    out = cum.select(
        *gcols,
        "threshold",
        "tp",
        "fp",
        fn.alias("fn"),
        tn.alias("tn"),
        prec.alias("precision"),
        rec.alias("recall"),
        f1.alias("f1"),
    )
    wbest = Window.partitionBy(*gcols).orderBy(
        F.desc_nulls_last("f1"), F.asc("threshold")
    ) if gcols else Window.orderBy(F.desc_nulls_last("f1"), F.asc("threshold"))
    return out.withColumn(
        "is_best", F.row_number().over(wbest) == F.lit(1)
    )


def clustering_agreement(
    df: DataFrame,
    *,
    label_a: str,
    label_b: str,
) -> DataFrame:
    """Pair-counting agreement between two clusterings of the same rows
    — the metric that grades a dedup/clustering run against truth
    (treat ``label_a`` as truth, ``label_b`` as prediction): Rand
    index, Adjusted Rand (Hubert-Arabie), and pairwise
    precision/recall/F1 over "same-cluster" pairs.

    Everything reduces to the contingency table: same_both =
    sum C(n_ij,2), same_a/same_b from the marginals, total = C(n,2) —
    INTEGER pair counts from ONE (a,b) groupBy, then a fixed chain of
    single divisions (ARI's expected-index product is computed in
    doubles BEFORE multiplying — the integer product would overflow
    long near n ~ 2 million rows; documented, not hidden).

    Output: 1 row — (n, same_both, same_a, same_b, total_pairs,
    rand_index, ari, pair_precision, pair_recall, pair_f1); ARI NULL
    when the denominator is 0 (both clusterings trivial).
    """
    cells = df.groupBy(
        F.col(label_a).alias("__a"), F.col(label_b).alias("__b")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))

    def c2(col: F.Column) -> F.Column:
        return (col * (col - 1) / 2).cast("long")

    per_a = cells.groupBy("__a").agg(F.sum("c").cast("long").alias("ca"))
    per_b = cells.groupBy("__b").agg(F.sum("c").cast("long").alias("cb"))
    agg = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(c2(F.col("c"))).cast("long").alias("same_both"),
    ).crossJoin(
        F.broadcast(per_a.agg(F.sum(c2(F.col("ca"))).cast("long").alias("same_a")))
    ).crossJoin(
        F.broadcast(per_b.agg(F.sum(c2(F.col("cb"))).cast("long").alias("same_b")))
    )
    total = c2(F.col("n"))
    tp = F.col("same_both").cast("double")
    sa = F.col("same_a").cast("double")
    sb = F.col("same_b").cast("double")
    tot = total.cast("double")
    expected = sa * sb / tot
    denom = (sa + sb) / F.lit(2.0) - expected
    rand = (
        tp + (tot - sa - sb + tp)
    ) / tot
    prec = F.when(F.col("same_b") > 0, tp / sb)
    rec = F.when(F.col("same_a") > 0, tp / sa)
    f1 = F.when(
        (F.col("same_a") + F.col("same_b")) > 0,
        F.lit(2.0) * tp / (sa + sb),
    )
    return agg.select(
        "n",
        "same_both",
        "same_a",
        "same_b",
        total.alias("total_pairs"),
        rand.alias("rand_index"),
        F.when(denom != 0, (tp - expected) / denom).alias("ari"),
        prec.alias("pair_precision"),
        rec.alias("pair_recall"),
        f1.alias("pair_f1"),
    )


def conformal_calibration(
    cal: DataFrame,
    test: DataFrame,
    *,
    score_col: str,
    alphas: tuple[float, ...] = (0.1,),
    by: str | None = None,
) -> DataFrame:
    """Split-conformal calibration (Vovk; Lei et al.) — the
    distribution-free prediction-interval machinery every deployed model
    gate should carry: given CALIBRATION nonconformity scores, the
    conformal quantile

        q_hat = the ceil((n+1)(1-alpha))-th smallest calibration score

    guarantees P(test score <= q_hat) >= 1-alpha for exchangeable data —
    no model or distribution assumptions.  This evaluates the guarantee
    empirically too: the fraction of TEST scores <= q_hat.

    Exactness: q_hat is a pure order statistic (one sort of the
    calibration scores, rank k picked per alpha), coverage is an integer
    count over test divided once — plain SQL replays every value.  When
    k > n (tiny calibration set / small alpha) the guarantee is vacuous:
    q_hat is NULL and coverage reports 1.0 (everything is covered by the
    infinite interval), the standard convention.

    With ``by`` set this is MONDRIAN (group-conditional) conformal: the
    quantile is computed PER GROUP, giving per-group coverage — the
    deployed pattern when error rates must hold per class/segment, not
    just marginally (a marginal q_hat can over-cover easy groups and
    under-cover hard ones).

    Shape: ONE window sort of the calibration relation (per group when
    ``by`` is set; ranks reused by every alpha), one aggregate per side,
    an equi-join (broadcast-sized grid) against test.  Nothing
    driver-sized.

    Output: ([by,] alpha, n_cal, k, q_hat, n_test, n_covered, coverage).
    """
    if not alphas:
        raise ValueError("alphas must be non-empty")
    gcols = [by] if by else []
    s = F.col(score_col).cast("double")
    w = Window.partitionBy(*gcols).orderBy(F.col("__s").asc()) if gcols else Window.orderBy(F.col("__s").asc())
    ranked = (
        cal.select(*gcols, s.alias("__s"))
        .withColumn("__r", F.row_number().over(w))
        .localCheckpoint(eager=True)
    )
    n_cal = ranked.groupBy(*gcols).agg(F.max("__r").cast("long").alias("n_cal"))
    spark = cal.sparkSession
    alpha_grid = local_rows(spark, [(float(a),) for a in alphas], "alpha double")
    grid = n_cal.crossJoin(F.broadcast(alpha_grid))
    k = F.ceil(
        (F.col("n_cal") + F.lit(1)).cast("double") * (F.lit(1.0) - F.col("alpha"))
    ).cast("long")
    grid = grid.withColumn("k", k)
    qhat = grid.join(
        ranked.select(*gcols, F.col("__r").alias("k"), F.col("__s").alias("q_hat")),
        gcols + ["k"],
        "left",  # k > n_cal -> NULL q_hat (vacuous guarantee)
    )
    tside = test.select(*gcols, s.alias("__t"))
    joined = (
        tside.join(F.broadcast(qhat), gcols) if gcols
        else tside.crossJoin(F.broadcast(qhat))
    )
    tstats = joined.groupBy(*gcols, "alpha", "n_cal", "k", "q_hat").agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(
            F.when(F.col("q_hat").isNull() | (F.col("__t") <= F.col("q_hat")), 1)
            .otherwise(0)
        ).cast("long").alias("n_covered"),
    )
    return tstats.select(
        *gcols,
        "alpha",
        "n_cal",
        "k",
        "q_hat",
        "n_test",
        "n_covered",
        (F.col("n_covered").cast("double") / F.col("n_test").cast("double")).alias(
            "coverage"
        ),
    )


def ranking_metric_ci(
    ranked: DataFrame,
    *,
    metric: str = "ndcg",
    k: int = 10,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    replicates: int = 64,
    ci: float = 0.95,
    units: int = 1 << 20,
    seed: str = "",
) -> DataFrame:
    """Bootstrap confidence interval for a corpus-mean ranking metric —
    the error bars q212's point estimates should never ship without:
    the independence unit of a retrieval evaluation is the QUERY, so
    each query draws Poisson(1) replicate weights (``drift.
    poisson1_weight`` — md5 coin vs integer CDF cutoffs, engine-exact)
    and every replicate's metric is the weighted mean of the SAME
    per-query integer units ``ranking_metrics`` sums (floor-quantized
    2^-20 NDCG/recall/MRR ratios; raw relevant-count for precision).

    Exactness: replicate metric = sum(w*u)/sum(w)/scale — two integer
    sums and one double division chain, rank-selected into the exact
    interval; plain SQL replays every number (q246).

    Output: one row — (metric, k, n_queries, value, lo, hi, replicates).
    """
    import math

    from patternly_spark.operators.drift import poisson1_weight

    if metric not in ("ndcg", "precision", "recall", "mrr"):
        raise ValueError(f"metric must be ndcg/precision/recall/mrr, got {metric}")
    B = int(replicates)
    if B < 4:
        raise ValueError(f"replicates must be >= 4, got {B}")
    kk = int(k)
    u = int(units)
    disc = [math.floor((1.0 / math.log2(r + 1.0)) * u) for r in range(1, kk + 1)]
    idcg_prefix = [0]
    for d in disc:
        idcg_prefix.append(idcg_prefix[-1] + d)
    lo_rank = max(1, math.ceil(B * (1.0 - float(ci)) / 2.0))
    hi_rank = min(B, math.ceil(B * (1.0 + float(ci)) / 2.0))

    rank = F.col(rank_col).cast("int")
    rel = F.col(rel_col)
    disc_arr = F.array(*[F.lit(d) for d in disc])
    per_q = (
        ranked.groupBy(query_col)
        .agg(
            F.sum(rel.cast("int")).cast("long").alias("rel_total"),
            F.min(F.when(rel, rank)).alias("first_rel"),
            F.sum(F.when(rel & (rank <= kk), 1).otherwise(0))
            .cast("long")
            .alias("rel_at_k"),
            F.sum(
                F.when(rel & (rank <= kk), F.element_at(disc_arr, rank)).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("dcg_u"),
        )
        .filter(F.col("rel_total") > 0)
    )
    fu = F.lit(float(u))
    idcg_arr = F.array(*[F.lit(v) for v in idcg_prefix])
    m = F.least(F.col("rel_total"), F.lit(kk))
    idcg_u = F.element_at(idcg_arr, (m + F.lit(1)).cast("int"))
    if metric == "ndcg":
        uq = F.floor(F.col("dcg_u").cast("double") / idcg_u.cast("double") * fu).cast("long")
        scale = float(u)
    elif metric == "recall":
        uq = F.floor(
            F.col("rel_at_k").cast("double") / F.col("rel_total").cast("double") * fu
        ).cast("long")
        scale = float(u)
    elif metric == "mrr":
        uq = (
            F.when(
                F.col("first_rel") <= kk,
                F.floor(F.lit(1.0) / F.col("first_rel").cast("double") * fu).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        )
        scale = float(u)
    else:  # precision
        uq = F.col("rel_at_k")
        scale = float(kk)
    pq = per_q.select(F.col(query_col).alias("__q"), uq.alias("__u")).localCheckpoint(
        eager=True
    )
    rows = pq.select(
        "__q", "__u", F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("__b")
    )
    per = (
        rows.withColumn("__w", poisson1_weight(F.col("__q"), F.col("__b"), seed=seed))
        .groupBy("__b")
        .agg(
            F.sum(F.col("__w") * F.col("__u")).cast("long").alias("__sw"),
            F.sum("__w").cast("long").alias("__nw"),
        )
        .withColumn(
            "__m",
            F.when(
                F.col("__nw") > 0,
                F.col("__sw").cast("double")
                / F.col("__nw").cast("double")
                / F.lit(scale),
            ),
        )
    )
    ranked_b = per.withColumn(
        "__r", F.row_number().over(Window.orderBy(F.col("__m").asc_nulls_last()))
    )
    bounds = ranked_b.agg(
        F.max(F.when(F.col("__r") == lo_rank, F.col("__m"))).alias("lo"),
        F.max(F.when(F.col("__r") == hi_rank, F.col("__m"))).alias("hi"),
    )
    base = pq.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        (
            F.sum("__u").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(scale)
        ).alias("value"),
    )
    return base.crossJoin(F.broadcast(bounds)).select(
        F.lit(metric).alias("metric"),
        F.lit(kk).alias("k"),
        "n_queries",
        "value",
        "lo",
        "hi",
        F.lit(B).alias("replicates"),
    )


def fleiss_kappa(
    ratings: DataFrame,
    *,
    item_col: str,
    category_col: str,
    by: str | None = None,
) -> DataFrame:
    """Fleiss' kappa — chance-corrected inter-rater agreement over a
    labeling corpus (one row per rating): the gate a label-driven
    curation pipeline runs BEFORE training on human/model labels, where
    raw percent-agreement flatters any skewed category mix.

        P_i   = (sum_j n_ij^2 - n) / (n * (n - 1))   per item
        P_bar = mean_i P_i
        P_e   = sum_j p_j^2,  p_j = category share over all ratings
        kappa = (P_bar - P_e) / (1 - P_e)

    Classic Fleiss (1971) requires a CONSTANT rater count n per item —
    validated here (one count-distinct aggregate), raising otherwise,
    because silently mixing panel sizes changes the statistic's meaning.

    Exactness: with constant n every term is a ratio of INTEGER sums —
    P_bar = (sum_ij n_ij^2 - N*n) / (N*n*(n-1)) and
    P_e = (sum_j n_j^2) / (N*n)^2 — so the whole statistic is decimal
    integer aggregates (order-free) + a fixed IEEE chain; never a mean
    of per-item doubles (summation order would differ across engines).
    Shape: one (item, category) count shuffle, integer roll-ups, scalar
    arithmetic; nothing data-sized leaves the executors.

    Output: ([by,] n_items, n_raters, p_bar, p_e, kappa).
    """
    gcols = [by] if by else []
    counts = ratings.groupBy(
        *gcols, F.col(item_col).alias("__i"), F.col(category_col).alias("__cat")
    ).agg(F.count(F.lit(1)).cast("long").alias("__nij"))
    per_item = counts.groupBy(*gcols, "__i").agg(
        F.sum("__nij").cast("long").alias("__n"),
        F.sum(
            F.col("__nij").cast("decimal(19,0)") * F.col("__nij").cast("decimal(19,0)")
        ).cast("decimal(38,0)").alias("__sq"),
    )
    # constant-panel validation (per group)
    bad = per_item.groupBy(*gcols).agg(
        F.countDistinct("__n").alias("__k"), F.min("__n").alias("__nmin")
    ).filter((F.col("__k") > 1) | (F.col("__nmin") < 2)).limit(1).collect()
    if bad:
        raise ValueError(
            "fleiss_kappa requires a constant rater count >= 2 per item "
            "(classic Fleiss 1971); normalize the panel upstream"
        )
    items = per_item.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.max("__n").cast("long").alias("n_raters"),
        F.sum("__sq").cast("decimal(38,0)").alias("__S"),
    )
    cats = counts.groupBy(*gcols, "__cat").agg(
        F.sum("__nij").cast("long").alias("__nj")
    )
    csq = cats.groupBy(*gcols).agg(
        F.sum(
            F.col("__nj").cast("decimal(19,0)") * F.col("__nj").cast("decimal(19,0)")
        ).cast("decimal(38,0)").alias("__C")
    )
    j = items.join(csq, gcols) if gcols else items.crossJoin(csq)
    total = (F.col("n_items") * F.col("n_raters")).cast("double")
    p_bar = (
        F.col("__S").cast("double")
        - (F.col("n_items") * F.col("n_raters")).cast("double")
    ) / (
        (F.col("n_items") * F.col("n_raters")).cast("double")
        * (F.col("n_raters") - F.lit(1)).cast("double")
    )
    p_e = F.col("__C").cast("double") / (total * total)
    j = j.select(
        *gcols,
        "n_items",
        "n_raters",
        p_bar.alias("p_bar"),
        p_e.alias("p_e"),
    )
    # p_e == 1 means ONE category ever appeared: kappa is 0/0 —
    # undefined, reported NULL (chance agreement is total; the
    # statistic carries no information)
    return j.select(
        *gcols,
        "n_items",
        "n_raters",
        "p_bar",
        "p_e",
        F.when(
            F.col("p_e") < 1.0,
            (F.col("p_bar") - F.col("p_e")) / (F.lit(1.0) - F.col("p_e")),
        ).alias("kappa"),
    )


def logistic_regression(
    df: DataFrame,
    *,
    label_col: str,
    feature_cols: list[str],
    iters: int = 6,
    max_iters: int = 24,
    tol: float = 1e-5,
    ridge: float = 0.0,
) -> DataFrame:
    """Logistic regression by adaptive-budget Newton-Raphson — the
    propensity / uplift / quality-classifier workhorse the
    experimentation and curation families compose with (propensity
    scores for observational readouts, calibrated gating scores for
    corpus filters).  Intercept included automatically.

    Distributed shape (the cox_ph pattern): each Newton step needs only
    the p(p+3)/2 sufficient sums  grad = X'(y - mu)  and
    H = X' diag(mu(1-mu)) X  with mu = sigmoid(X beta) — ONE full-scan
    aggregate per step, a (p+1)x(p+1) driver solve, no sort, no
    data-sized state.  Budget: ``iters`` steps ALWAYS run from
    beta = 0 (quadratic convergence; 6 reaches ~1e-8 relative movement
    on well-conditioned inputs, keeping default runs bit-identical to
    the fixed-budget era); if the last step still moved more than
    ``tol`` relative, the solver CONTINUES — the round-8 telemetry now
    drives behavior instead of just blame — up to ``max_iters`` total
    scans (the documented cap; quasi-separable fits that needed ~10
    steps converge, genuinely divergent ones stop at the cap with
    ``converged=false``).  A continuation step that goes numerically
    bad (singular Hessian, non-finite step — the perfectly-separable
    endgame) stops cleanly at the last good iterate rather than
    raising.  Perfectly separable data diverges in ANY unpenalized
    logistic fit — pass ``ridge`` > 0 there.

    Not SQL-oracle-checkable (sigmoid is libm-dependent across
    engines), so rows-only at the driver gate; correctness is pinned by
    a from-scratch numpy IRLS reference at rel 1e-8
    (tests/test_survival_cox.py::test_logistic_matches_numpy_reference).

    Output: one row per term — (feature, beta, se, z), feature
    '__intercept' first, plus convergence telemetry repeated on every
    row: ``rel_step`` (last Newton step's max |Δbeta| / max |beta|),
    ``grad_norm`` (max |gradient| entering that step), ``converged``
    (rel_step < ``tol``).  ``converged=false`` now means the CAP did
    not suffice (separable / genuinely ill-posed), not merely that the
    default budget was small.
    """
    import numpy as np

    p = len(feature_cols)
    if p == 0:
        raise ValueError("need at least one feature")
    if p > 16:
        raise ValueError("driver-side Newton solve capped at 16 features")
    if int(iters) < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if int(max_iters) < int(iters):
        raise ValueError(
            f"max_iters ({max_iters}) must be >= iters ({iters})"
        )
    if not float(tol) > 0.0:
        raise ValueError(f"tol must be > 0, got {tol}")
    y = F.col(label_col).cast("double")
    base = df.select(
        y.alias("__y"),
        *[
            F.col(feature_cols[j]).cast("double").alias(f"__x{j}")
            for j in range(p)
        ],
    ).localCheckpoint(eager=True)
    names = ["__intercept"] + list(feature_cols)
    k = p + 1

    beta = np.zeros(k)
    hinv = np.eye(k)
    for it in range(1, int(max_iters) + 1):
        lp = F.lit(float(beta[0]))
        for j in range(p):
            lp = lp + F.lit(float(beta[j + 1])) * F.col(f"__x{j}")
        mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-lp))
        w = mu * (F.lit(1.0) - mu)
        xs = [F.lit(1.0)] + [F.col(f"__x{j}") for j in range(p)]
        aggs = []
        for a in range(k):
            aggs.append(F.sum(xs[a] * (F.col("__y") - mu)).alias(f"g_{a}"))
            for b in range(a, k):
                aggs.append(F.sum(xs[a] * xs[b] * w).alias(f"h_{a}_{b}"))
        row = base.agg(*aggs).collect()[0]
        g = np.array([row[f"g_{a}"] for a in range(k)])
        H = np.zeros((k, k))
        for a in range(k):
            for b in range(a, k):
                H[a, b] = H[b, a] = row[f"h_{a}_{b}"]
        H += float(ridge) * np.eye(k)
        if it > int(iters):
            # adaptive continuation: a numerically bad step (singular
            # Hessian / non-finite — the separable endgame) ends the
            # continuation at the last GOOD iterate instead of raising
            try:
                hinv_new = np.linalg.inv(H)
                step = hinv_new @ g
            except np.linalg.LinAlgError:
                break
            if not np.all(np.isfinite(step)):
                break
            hinv = hinv_new
        else:
            hinv = np.linalg.inv(H)
            step = hinv @ g
        beta = beta + step
        # telemetry of the LAST step taken — free (no extra scan)
        grad_norm = float(np.max(np.abs(g)))
        rel_step = float(
            np.max(np.abs(step)) / max(float(np.max(np.abs(beta))), 1e-12)
        )
        if it >= int(iters) and rel_step < float(tol):
            break

    converged = rel_step < float(tol)
    out = [
        (
            names[a],
            float(beta[a]),
            float(np.sqrt(hinv[a, a])),
            float(beta[a] / np.sqrt(hinv[a, a])),
            rel_step,
            grad_norm,
            converged,
        )
        for a in range(k)
    ]
    return local_rows(
        df.sparkSession,
        out,
        "feature string, beta double, se double, z double, "
        "rel_step double, grad_norm double, converged boolean",
    )


def ipw_ate(
    df: DataFrame,
    *,
    treat_col: str,
    outcome_cents_col: str,
    feature_cols: list[str],
    iters: int = 6,
    max_iters: int = 24,
    tol: float = 1e-5,
    ridge: float = 0.0,
    clip: tuple[float, float] = (0.01, 0.99),
) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect (Hajek
    estimator) — the observational-readout closer of the causal stack:
    fit the propensity e(x) = P(T=1|x) with the engine's budgeted-
    Newton logistic regression (q254), clip to ``clip`` for positivity,
    and report the stabilized-weight difference of weighted outcome
    means,

        ATE = sum(y*T/e)/sum(T/e) - sum(y*(1-T)/(1-e))/sum((1-T)/(1-e))

    (the Hajek / self-normalized form — invariant to weight scaling, so
    stabilization constants cancel; reported weights diagnostics expose
    positivity problems the estimate alone hides).

    Distributed shape: the logistic fit is ``iters``..``max_iters``
    single-scan sufficient-statistic aggregates (the q254 adaptive
    kernel — extra scans only while the fit still moves); scoring + the
    weighted means are ONE more full scan of pure column expressions.
    The only driver-side values are the (p+1) betas (bounded by the
    q254 contract, p <= 16).

    Not SQL-oracle-checkable (sigmoid is libm-dependent across
    engines), so rows-only at the driver gate; correctness is pinned by
    a from-scratch numpy reference at rel 1e-8
    (tests/test_round8_ops.py::test_ipw_ate_matches_numpy_reference).

    Output: ONE row — (n_treated, n_control, ate_cents,
    mean_treated_w, mean_control_w, min_e, max_e, ess_treated,
    ess_control, propensity_rel_step, propensity_converged); ess_* are
    Kish effective sample sizes (sum(w)^2 / sum(w^2)) — the positivity
    health metric; propensity_* surface the logistic fit's convergence
    telemetry so an under-converged propensity model (silently wrong
    weights) is visible in the readout itself.
    """
    lo, hi = float(clip[0]), float(clip[1])
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError(f"clip must satisfy 0 <= lo < hi <= 1, got {clip}")
    fit_rows = logistic_regression(
        df,
        label_col=treat_col,
        feature_cols=feature_cols,
        iters=iters,
        max_iters=max_iters,
        tol=tol,
        ridge=ridge,
    ).collect()
    betas = {r["feature"]: r["beta"] for r in fit_rows}
    prop_rel_step = float(fit_rows[0]["rel_step"])
    prop_converged = bool(fit_rows[0]["converged"])
    lp = F.lit(float(betas["__intercept"]))
    for c in feature_cols:
        lp = lp + F.lit(float(betas[c])) * F.col(c).cast("double")
    e_raw = F.lit(1.0) / (F.lit(1.0) + F.exp(-lp))
    e = F.least(F.greatest(e_raw, F.lit(lo)), F.lit(hi))
    t = F.col(treat_col).cast("double")
    y = F.col(outcome_cents_col).cast("long").cast("double")
    w_t = t / e
    w_c = (F.lit(1.0) - t) / (F.lit(1.0) - e)
    agg = df.agg(
        F.sum(t).cast("long").alias("n_treated"),
        F.sum(F.lit(1.0) - t).cast("long").alias("n_control"),
        F.sum(w_t * y).alias("swy_t"),
        F.sum(w_t).alias("sw_t"),
        F.sum(w_t * w_t).alias("sww_t"),
        F.sum(w_c * y).alias("swy_c"),
        F.sum(w_c).alias("sw_c"),
        F.sum(w_c * w_c).alias("sww_c"),
        F.min(e).alias("min_e"),
        F.max(e).alias("max_e"),
    )
    mean_t = F.col("swy_t") / F.col("sw_t")
    mean_c = F.col("swy_c") / F.col("sw_c")
    return agg.select(
        "n_treated",
        "n_control",
        (mean_t - mean_c).alias("ate_cents"),
        mean_t.alias("mean_treated_w"),
        mean_c.alias("mean_control_w"),
        "min_e",
        "max_e",
        (F.col("sw_t") * F.col("sw_t") / F.col("sww_t")).alias("ess_treated"),
        (F.col("sw_c") * F.col("sw_c") / F.col("sww_c")).alias("ess_control"),
        F.lit(prop_rel_step).alias("propensity_rel_step"),
        F.lit(prop_converged).alias("propensity_converged"),
    )
