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

__all__ = ["roc_auc", "calibration_bins"]


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
