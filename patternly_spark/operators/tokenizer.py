"""BPE tokenizer-vocabulary induction (Sennrich et al. 2016) — learning
the merge table itself, distributed.

The scale observation that makes BPE Spark-friendly: after ONE corpus
scan collapses the text to a (word, count) vocabulary table, every merge
iteration runs on that table — vocabulary-sized (10^5-10^6 rows for any
corpus, regardless of corpus bytes), not corpus-sized.  So 100 TB of
text costs one distributed word count; the K merge rounds then iterate
over megabytes.

Each round:
  1. weighted adjacent-pair counts over the symbol arrays (explode +
     map-side-combined sum — one small shuffle),
  2. argmax pair with a total-order tie-break (count desc, then lexical)
     — a 1-row driver scalar, the only per-round action,
  3. apply the merge to every word's symbol array with a pure array
     fold (greedy left-to-right, the classic semantics).

Iterative and argmax-driven, so no SQL oracle (rows-only query q76);
semantics are pinned against a plain-Python reference BPE in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from patternly_spark.plans import local_rows

__all__ = ["bpe_merges", "bpe_merges_df", "bpe_encode", "word_vocabulary"]

END_OF_WORD = "</w>"


def word_vocabulary(
    docs: DataFrame, *, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """(word, count) over whitespace-split text — the one corpus-sized
    pass.  The end-of-word marker is appended as a distinct final symbol
    (standard BPE: word-boundary information survives merging)."""
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit(""))
    words = docs.select(F.explode(toks).alias("word")).groupBy("word").agg(
        F.count(F.lit(1)).alias("count")
    )
    if min_count > 1:
        words = words.filter(F.col("count") >= int(min_count))
    return words


def _initial_symbols() -> F.Column:
    """word -> [c1, c2, ..., cn, </w>]"""
    chars = F.split(F.col("word"), "")
    return F.concat(
        F.filter(chars, lambda c: c != F.lit("")), F.array(F.lit(END_OF_WORD))
    )


def _merge_expr(left: str, right: str):
    """Greedy left-to-right merge of (left, right) in a symbol array via
    one fold: append x unless the running tail is `left` and x is
    `right`, in which case replace the tail with the joined token."""
    joined = left + right

    def step(acc, x):
        can = (F.size(acc) > 0) & (F.element_at(acc, -1) == F.lit(left)) & (
            x == F.lit(right)
        )
        return F.when(
            can,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(joined))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        F.col("symbols"), F.array().cast("array<string>"), step
    )


def bpe_merges(
    docs: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 20,
    min_count: int = 1,
    checkpoint_every: int = 5,
) -> list[tuple[str, str, int]]:
    """Learn the top-``num_merges`` BPE merges.  Returns the ordered
    merge table [(left, right, pair_count), ...] — rank i is the i-th
    merge learned.  Ties break (count desc, left asc, right asc) so the
    table is deterministic for any partitioning.
    """
    vocab = word_vocabulary(docs, text_col=text_col, min_count=min_count)
    words = vocab.select("count", _initial_symbols().alias("symbols"))
    words = words.localCheckpoint(eager=True)

    merges: list[tuple[str, str, int]] = []
    for it in range(int(num_merges)):
        pairs = words.select(
            "count",
            F.explode(
                F.when(
                    F.size("symbols") >= 2,
                    F.zip_with(
                        F.slice("symbols", 1, F.size("symbols") - 1),
                        F.slice("symbols", 2, F.size("symbols") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    ),
                ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p")
            .agg(F.sum("count").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p.l").asc(), F.col("p.r").asc())
            .first()
        )
        if best is None:
            break
        left, right, n = best["p"]["l"], best["p"]["r"], int(best["n"])
        merges.append((left, right, n))
        words = words.select("count", _merge_expr(left, right).alias("symbols"))
        if (it + 1) % int(checkpoint_every) == 0:
            words = words.localCheckpoint(eager=True)
    return merges


def bpe_merges_df(
    spark,
    docs: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 20,
    min_count: int = 1,
) -> DataFrame:
    """DataFrame form of the merge table: (rank int, left, right,
    pair_count long) — the queries() surface."""
    merges = bpe_merges(
        docs, text_col=text_col, num_merges=num_merges, min_count=min_count
    )
    return local_rows(
        spark,
        [(i, l, r, n) for i, (l, r, n) in enumerate(merges)],
        "rank int, left string, right string, pair_count long",
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize text with a learned BPE merge table (the apply half of
    ``bpe_merges``).

    The scale trick mirrors training: the merge cascade runs over the
    batch's DISTINCT words (vocabulary-sized), and the tokenization
    broadcast-joins back onto the corpus by word — so the K chained
    array folds execute |vocab| times, not |corpus tokens| times.
    Output: input columns + ``out_col`` (array<string> of subword
    units, end-of-word markers attached).
    """
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit(""))
    with_words = docs.select(F.col(id_col), toks.alias("__words"))
    vocab = with_words.select(F.explode("__words").alias("word")).distinct()
    symbols = _initial_symbols()
    enc = vocab.select("word", symbols.alias("symbols"))
    for m in merges:
        left, right = m[0], m[1]
        enc = enc.select("word", _merge_expr(left, right).alias("symbols"))
    enc = enc.withColumnRenamed("symbols", "__enc")
    exploded = with_words.select(
        F.col(id_col), F.posexplode("__words").alias("__pos", "word")
    )
    joined = exploded.join(F.broadcast(enc), "word")
    return (
        joined.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__pos"), F.col("__enc")))
                    ),
                    lambda s: s["__enc"],
                )
            ).alias(out_col)
        )
    )


def vocab_coverage(
    docs: DataFrame,
    vocab: DataFrame,
    *,
    by: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_col: str = "token",
) -> DataFrame:
    """Per-group vocabulary coverage / OOV report — the acceptance gate
    before committing a tokenizer vocabulary to a corpus: for every
    ``by`` group, total token occurrences, how many fall outside
    ``vocab``, the OOV rate, and how many DISTINCT out-of-vocabulary
    types drive it (a high rate from few types means the vocab is
    missing systematic content, not noise).

    Scale shape: the vocabulary is broadcast (vocab-sized by
    definition); the corpus side is one explode + broadcast left join +
    one grouped aggregation — no corpus-sized shuffle beyond the
    per-group rollup.

    Output: (by, n_tokens, n_oov, oov_rate, n_oov_types).
    """
    toks = docs.select(
        F.col(by),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("__t"),
    ).filter(F.col("__t") != "")
    vv = vocab.select(F.col(vocab_col).alias("__t")).distinct().withColumn(
        "__in", F.lit(1)
    )
    joined = toks.join(F.broadcast(vv), "__t", "left")
    return (
        joined.groupBy(by)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.count_distinct(
                F.when(F.col("__in").isNull(), F.col("__t"))
            ).cast("long").alias("n_oov_types"),
        )
        .select(
            by,
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens").cast("double")).alias(
                "oov_rate"
            ),
            "n_oov_types",
        )
    )
