"""Benchmark decontamination for training corpora.

A training corpus must not contain the eval set it will be judged
against.  The standard defense is n-gram collision decontamination
(GPT-3 appendix C / PaLM style): a corpus document is contaminated when
a large enough fraction of its n-gram shingles also occur in any
benchmark document.

Scale shape, for a 100 TB corpus vs an MB-scale benchmark:

- the benchmark side collapses to its distinct-shingle set — tiny by
  definition (eval suites are megabytes) — and is BROADCAST, so the
  corpus is never shuffled to meet it;
- corpus shingles explode and probe the broadcast set with a LEFT join
  (a map-side hash lookup, no exchange);
- the per-document roll-up is a single ``groupBy(doc_id)`` whose
  map-side partial aggregation collapses each document's exploded
  shingles back to ONE row before the exchange (all of a row's shingles
  live in its own partition), so the only shuffle carries ~1 row per
  document — three scalars, not shingle arrays.

Everything is built-in expressions; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from patternly_spark.functions.text import with_shingles


def benchmark_shingle_set(
    benchmark: DataFrame, *, text_col: str = "text", shingle_size: int = 3
) -> DataFrame:
    """Distinct n-gram shingles of the benchmark corpus: one ``sh``
    string column.  This is the (small) broadcast side of
    ``decontaminate``."""
    # explode_outer, not explode: InferFiltersFromGenerate would inline a
    # size(__sh)>0 predicate that re-runs the whole shingle pipeline per
    # row (the trap measured 7-30x in minhash_signatures); shingle arrays
    # are never empty (with_shingles emits [""] for empty text).
    return (
        with_shingles(benchmark, text_col, shingle_size, out_col="__sh")
        .select(F.explode_outer("__sh").alias("sh"))
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Flag corpus documents whose shingle overlap with the benchmark
    reaches ``threshold``.

    Returns one row per corpus document:
    (id_col, n_shingles int, n_hits bigint, contamination double,
    contaminated boolean).  Shingles are DISTINCT per document (set
    semantics), so ``contamination`` is the fraction of the document's
    distinct n-grams that appear anywhere in the benchmark.

    Mirrors the reference pipeline's corpus-hygiene role; no direct
    reference counterpart (the reference predates decontamination
    practice) — semantics follow the published n-gram collision recipe.
    """
    bench = benchmark_shingle_set(
        benchmark, text_col=text_col, shingle_size=shingle_size
    ).withColumn("__hit", F.lit(1))
    exploded = (
        with_shingles(corpus, text_col, shingle_size, out_col="__sh")
        .select(id_col, F.explode_outer("__sh").alias("sh"))
    )
    per_doc = (
        exploded.join(F.broadcast(bench), "sh", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_shingles"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("n_hits"),
        )
    )
    contamination = F.col("n_hits").cast("double") / F.col("n_shingles").cast("double")
    return per_doc.select(
        id_col,
        "n_shingles",
        "n_hits",
        contamination.alias("contamination"),
        (contamination >= F.lit(float(threshold))).alias("contaminated"),
    )


def benchmark_bloom_bits(
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    shingle_size: int = 3,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
    seed: str = "",
) -> DataFrame:
    """The SET bit positions of an m-bit Bloom filter over the
    benchmark's distinct shingles: one ``bit`` long column, at most
    ``num_bits`` rows (and at most shingles * num_hashes).

    Position i of shingle s is the md5-prefix u32 of "<seed><i>:<s>"
    mod num_bits — deterministic and SQL-replayable, the same hash
    family as the Count-Min grid.  This is the broadcast side of
    ``bloom_decontaminate``: positions are 8-byte longs regardless of
    shingle length, so a reference set too big to broadcast as strings
    (cross-suite contamination lists, a whole held-out corpus) still
    fits — the classic bits-per-element trade, made engine-portable."""
    sh = benchmark_shingle_set(
        benchmark, text_col=text_col, shingle_size=shingle_size
    )
    pos = F.array(
        *[
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"{seed}{i}:"), F.col("sh"))), 1, 8),
                    16,
                    10,
                ).cast("long")
                % F.lit(int(num_bits))
            )
            for i in range(num_hashes)
        ]
    )
    return sh.select(F.explode(pos).alias("bit")).distinct()


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 3,
    threshold: float = 0.5,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
    seed: str = "",
) -> DataFrame:
    """``decontaminate`` with the benchmark side compressed to a Bloom
    filter — the scale path when the distinct-shingle set itself is too
    big to broadcast.

    A corpus shingle counts as a hit when ALL ``num_hashes`` of its bit
    positions are set: one-sided error, so ``contamination`` is an
    UPPER bound on the true overlap and ``contaminated`` can only
    over-flag (the conservative direction for corpus hygiene; size
    ``num_bits`` for the false-positive rate you can afford:
    fpr ~ (set_bits/num_bits)^num_hashes).

    Plan shape: the probe is ``num_hashes`` consecutive BROADCAST hash
    joins on a long key (no exchange on the corpus side), then the same
    one-row-per-document rollup as ``decontaminate``.  Same output
    schema as ``decontaminate``.
    """
    bits = benchmark_bloom_bits(
        benchmark,
        text_col=text_col,
        shingle_size=shingle_size,
        num_bits=num_bits,
        num_hashes=num_hashes,
        seed=seed,
    )
    exploded = (
        with_shingles(corpus, text_col, shingle_size, out_col="__sh")
        .select(id_col, F.explode_outer("__sh").alias("sh"))
    )
    probed = exploded
    hit = F.lit(True)
    for i in range(num_hashes):
        p = (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{seed}{i}:"), F.col("sh"))), 1, 8),
                16,
                10,
            ).cast("long")
            % F.lit(int(num_bits))
        )
        b = bits.select(F.col("bit").alias(f"__p{i}"), F.lit(1).alias(f"__h{i}"))
        probed = probed.withColumn(f"__p{i}", p).join(
            F.broadcast(b), f"__p{i}", "left"
        )
        hit = hit & F.col(f"__h{i}").isNotNull()
    per_doc = probed.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_shingles"),
        F.sum(hit.cast("long")).cast("long").alias("n_hits"),
    )
    contamination = F.col("n_hits").cast("double") / F.col("n_shingles").cast("double")
    return per_doc.select(
        id_col,
        "n_shingles",
        "n_hits",
        contamination.alias("contamination"),
        (contamination >= F.lit(float(threshold))).alias("contaminated"),
    )


def cross_source_overlap(
    docs: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
    shingle_size: int = 8,
) -> DataFrame:
    """Between-source duplication audit: for every pair of sources, how
    much verbatim content (distinct n-gram shingles) do they share?
    This is the crawl-provenance question a corpus mixer asks before
    summing per-source token budgets — two dumps of the same sites add
    redundancy, not data.

    Output per (source_a < source_b) with any overlap: (source_a,
    source_b, n_a, n_b, shared, containment) where containment =
    shared / min(n_a, n_b) — 1.0 means the smaller source's content is
    entirely inside the larger's.

    Scale shape: corpus collapses to DISTINCT (source, gram-hash) rows
    first (one explode + one distinct shuffle — gram-set-sized, and the
    16-byte md5 replaces the gram text on the wire); the pair join is
    keyed on the hash, so a gram shared by k sources costs k(k-1)/2
    pair rows — bounded by the SOURCE count squared, not the corpus.
    Counts are integers, containment one double division: engine-exact.
    """
    sh = with_shingles(
        docs.select(source_col, text_col), text_col, shingle_size, out_col="__sh"
    )
    grams = (
        sh.select(F.col(source_col).alias("src"), F.explode_outer("__sh").alias("g"))
        .select("src", F.md5("g").alias("h"))
        .distinct()
    )
    counts = grams.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("n"))
    pairs = (
        grams.select(F.col("src").alias("source_a"), "h")
        .join(grams.select(F.col("src").alias("source_b"), "h"), "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    return (
        pairs.join(
            counts.select(F.col("src").alias("source_a"), F.col("n").alias("n_a")),
            "source_a",
        )
        .join(
            counts.select(F.col("src").alias("source_b"), F.col("n").alias("n_b")),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "shared",
            (
                F.col("shared").cast("double")
                / F.least("n_a", "n_b").cast("double")
            ).alias("containment"),
        )
    )


def ngram_novelty(
    docs: DataFrame,
    reference: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_text_col: str | None = None,
) -> DataFrame:
    """Per-document n-gram novelty against a reference corpus — the
    memorization-risk / generation-quality metric: novelty = fraction
    of the document's DISTINCT n-gram types absent from the reference
    (Lee et al. 2107.06499 measure memorized continuations this way;
    an eval-deck gate flags candidate documents whose novelty is LOW —
    they restate the reference — and a generation audit flags outputs
    whose novelty is low against the training corpus).

    One gram explode per side (per-row slices, no UDF), distinct per
    doc on the probe side and globally on the reference side, ONE
    left join keyed on the gram, one per-doc agg.  The reference gram
    relation is vocabulary-scale and keyed — a shuffle join, NOT a
    broadcast (a 100 TB reference's gram set fits no executor); at
    that scale join on xxhash64(gram) (the duplicate_spans trade) and
    bucket the reference by it.

    Docs with fewer than ``n`` tokens have no grams and report
    n_grams=0, novelty 1.0 (nothing restated — vacuously novel).

    Output: (id, n_grams, n_novel, novelty).
    """
    nn = int(n)
    if nn < 1:
        raise ValueError(f"n must be >= 1, got {nn}")

    def grams_of(df: DataFrame, idc, textc):
        toks = df.select(
            *( [F.col(idc).alias("id")] if idc else [] ),
            F.filter(
                F.split(F.trim(F.col(textc)), r"\s+"), lambda x: x != ""
            ).alias("__t"),
        )
        g = F.when(
            F.size("__t") >= nn,
            F.transform(
                F.sequence(F.lit(1), F.size("__t") - nn + 1),
                lambda i: F.array_join(F.slice("__t", i, nn), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return toks.select(
            *( ["id"] if idc else [] ), F.explode(g).alias("gram")
        )

    doc_grams = grams_of(docs, id_col, text_col).distinct()
    ref_grams = (
        grams_of(reference, None, ref_text_col or text_col)
        .select("gram")
        .distinct()
    )
    per_gram = doc_grams.join(
        ref_grams.withColumn("__hit", F.lit(1)), "gram", "left"
    )
    counts = per_gram.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_novel"),
    )
    # docs too short for any gram never reach the join: restore them
    all_ids = docs.select(F.col(id_col).alias("id")).distinct()
    return (
        all_ids.join(counts, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("n_novel"), F.lit(0)).alias("n_novel"),
            F.when(
                F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
                F.col("n_novel").cast("double") / F.col("n_grams").cast("double"),
            )
            .otherwise(F.lit(1.0))
            .alias("novelty"),
        )
    )
