"""Search-stack demo over the documents + embeddings tables:

    positional index (persisted, term-hash-partitioned, pruned reads)
    -> exact phrase search -> tri-signal hybrid retrieval (phrase +
    dense cosine + quality prior, RRF-fused) -> compressed-vector
    search ladder (exact / int8 / Hamming-rerank / matryoshka) with
    recall evaluation -> dedup-method agreement matrix.

Run from anywhere:

    python examples/retrieval.py [sf_dir]

Every stage is a declarative operator from patternly_spark.operators;
the same compositions are the oracle-checked q135–q138 and q142–q143
in __spark_entry__.py.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from pyspark.sql import Window
from pyspark.sql import functions as F

from patternly_spark.functions.text import normalize_text, quality_score
from patternly_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    pair_set_agreement,
)
from patternly_spark.operators.quantized import (
    hamming_rerank_topk,
    int8_topk,
    matryoshka_recall,
)
from patternly_spark.operators.retrieval import (
    phrase_search,
    positional_index,
    read_positional_index,
    rrf_fuse,
    save_positional_index,
)
from patternly_spark.operators.similarity import cosine_topk, topk_recall
from patternly_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("retrieval-demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1. positional index: build once, persist partitioned by term hash,
    #    read back pruned to the query's terms (PartitionFilters)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "pos_index")
        save_positional_index(positional_index(docs), path, n_term_buckets=64)
        idx = read_positional_index(
            spark, path, terms=["big", "data"], n_term_buckets=64
        )
        hits = phrase_search(docs, "big data", index=idx)
        print(f"phrase 'big data': {hits.count()} matching docs")
        hits.orderBy(F.desc("n_matches"), "doc_id").show(5)

        # 2. hybrid retrieval: phrase + dense + quality, RRF-fused
        ph = (
            phrase_search(docs, "big data", index=idx)
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.orderBy(F.desc("n_matches"), F.asc("doc_id"))
                ),
            )
            .filter(F.col("rank") <= 20)
        )
        vec = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=20).select(
            F.col("neighbor_id").alias("doc_id"), "rank"
        )
        qual = (
            docs.select("doc_id", quality_score("text").alias("q"))
            .withColumn(
                "rank", F.row_number().over(Window.orderBy(F.desc("q"), F.asc("doc_id")))
            )
            .filter(F.col("rank") <= 20)
        )
        fused = rrf_fuse([ph, vec, qual], k=60.0)
        print("hybrid top-5 (phrase + dense + quality, RRF):")
        fused.orderBy("fused_rank").show(5)

    # 3. compressed-vector ladder with recall evaluation
    probes = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, probes, k=10)
    for name, approx in [
        ("int8", int8_topk(emb, probes, k=10)),
        ("hamming+rerank", hamming_rerank_topk(emb, probes, k=10, candidates=40)),
    ]:
        rec = topk_recall(exact, approx).agg(
            (F.sum("n_common") / F.sum("n_exact")).alias("recall")
        )
        print(f"{name} recall@10 vs exact: {rec.collect()[0]['recall']:.3f}")
    print("matryoshka truncation recall@10:")
    matryoshka_recall(emb, probes, dims=[8, 16, 32, 64], k=10).orderBy(
        "trunc_dim"
    ).show()

    # 3b. MMR diversification: plain top-k hands the context window
    # near-duplicates of the best hit; MMR spends each slot on NEW
    # information (integer scores -> deterministic selection, q259)
    from patternly_spark.operators.similarity import mmr_rerank

    print("MMR-diversified top-4 (lambda=0.7) for the first 3 probe vectors:")
    mmr_rerank(emb, emb.filter(F.col("vec_id") < 3), k=4, pool=10).orderBy(
        "query_id", "rank"
    ).show()

    # 4. which dedup method to trust on THIS corpus?
    nd = docs.select("doc_id", normalize_text("text").alias("text"))
    ex = exact_dedup(nd).select("doc_id", "content_hash")
    exact_pairs = (
        ex.select(F.col("doc_id").alias("doc_a"), "content_hash")
        .join(ex.select(F.col("doc_id").alias("doc_b"), "content_hash"), "content_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    cand = lsh_candidate_pairs(
        minhash_signatures(docs, shingle_size=3, num_hashes=8), num_hashes=8, bands=4
    ).select("doc_a", "doc_b")
    verified = (
        ngram_jaccard_pairs(docs, cand, n=3)
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b")
    )
    print("dedup-method agreement:")
    pair_set_agreement(
        {"exact_norm": exact_pairs, "lsh_cand": cand, "lsh_verified": verified}
    ).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
