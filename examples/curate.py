"""End-to-end training-data curation demo over the documents table:

    html extraction -> unicode-folded normalization -> quality gate
    (Gopher rules + repetition filters) -> exact dedup -> near-dup
    clusters -> benchmark decontamination -> deterministic
    down-sampling -> sequence packing

Run from anywhere:

    python examples/curate.py [sf_dir]

Every stage is a declarative operator from patternly_spark.operators —
the whole pipeline is one Catalyst plan per output, no driver-side
loops.  The same composition (minus the near-dup report) is the
oracle-checked q37_curation_pipeline in __spark_entry__.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from pyspark.sql import functions as F

from patternly_spark.functions.text import (
    gopher_repetition_flags,
    html_to_text,
    langid,
    normalize_text,
    quality_score,
    token_count,
)
from patternly_spark.operators import (
    decontaminate,
    exact_dedup,
    hash_sample,
    neardup_dedup_corpus,
    pack_sequences,
)
from patternly_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("patternly-curate")
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = raw.count()

    # 0. extraction + canonicalization: strip any markup, fold unicode
    # compat chars (curly quotes, ligatures, fullwidth) so downstream
    # dedup keys collide properly — zero-shuffle column expressions.
    # CACHE the boundary: the repetition metrics reference the text
    # column dozens of times, and without a materialization boundary
    # Catalyst re-inlines the whole 20-regex extraction chain into every
    # reference (plan-compilation blowup, the CollapseProject trap
    # documented on shingles_from_tokens).
    docs = raw.select(
        "doc_id",
        normalize_text(html_to_text("text"), strip_punct=False).alias("text"),
    ).cache()

    # 1. quality gate: Gopher-style rules + repetition filters + score
    rep = gopher_repetition_flags(docs).select("doc_id", "keep_repetition")
    quality = (
        docs.join(rep, "doc_id")
        .filter(
            (token_count("text") >= 8)
            & (quality_score("text") >= 0.5)
            & F.col("keep_repetition")
        )
        .drop("keep_repetition")
        .withColumn("lang_guess", langid("text"))
    )
    n1 = quality.count()

    # 2. exact dedup: keep one canonical per normalized content hash
    kept = quality.join(
        exact_dedup(quality).filter(~F.col("is_dup")).select("doc_id"), "doc_id"
    )
    n2 = kept.count()

    # 3. near-dup report: MinHash -> LSH -> Jaccard -> clusters
    clusters = neardup_dedup_corpus(kept, jaccard_threshold=0.7)
    n_groups = clusters.filter(~F.col("is_canonical")).count()

    # 4. decontamination against a held-out "benchmark" slice
    bench = raw.filter(F.col("doc_id") % 41 == 0)
    flags = decontaminate(kept, bench, threshold=0.5)
    clean = kept.join(
        flags.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
    )
    n3 = clean.count()

    # 5. deterministic 80% sample (stable under re-runs and growth)
    sampled = hash_sample(clean, "doc_id", 0.8, seed="curate-demo")
    n4 = sampled.count()

    # 6. pack survivors into 512-token training blocks
    packed = pack_sequences(sampled, budget=512, n_shards=16)
    n_blocks = packed.select("bin_id").distinct().count()

    print(f"documents          : {n0}")
    print(f"after quality gate : {n1}")
    print(f"after exact dedup  : {n2}  (near-dup members flagged: {n_groups})")
    print(f"after decontam     : {n3}")
    print(f"after 80% sample   : {n4}")
    print(f"packed into blocks : {n_blocks}")
    packed.orderBy("doc_id").show(5)


if __name__ == "__main__":
    main()
