"""End-to-end entity-resolution / exact-similarity demo:

    repeated-substring span scan  ->  exact set-similarity join (PPJoin)
    ->  connected components       ->  golden-record survivorship merge
    plus the dense-vector side: exact cosine all-pairs  ->  mutual k-NN
    ->  distributed covariance + whitening.

Run from anywhere:

    python examples/entity_resolution.py [sf_dir]

Every stage is exact (no LSH recall loss): the all-pairs joins carry
brute-force-verified completeness guarantees, so the cluster map and
the merged golden records are a pure function of the corpus.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from pyspark.sql import functions as F

from patternly_spark.operators import (
    cosine_allpairs_join,
    dedup_clusters,
    embedding_covariance,
    golden_records,
    mutual_knn,
    set_similarity_join,
    whitening_matrix,
)
from patternly_spark.operators.dedup import duplicate_spans
from patternly_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("patternly-er-demo")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1. where is content literally repeated? (ExactSubstr spans)
    spans = duplicate_spans(docs, ngram=20)
    print(f"duplicated spans: {spans.count()} "
          f"(docs touched: {spans.select('doc_id').distinct().count()})")

    # 2. exact near-duplicate pairs above Jaccard 0.5 (complete, not LSH)
    pairs = set_similarity_join(docs, threshold=0.5)
    n_pairs = pairs.count()
    print(f"exact near-dup pairs @0.5: {n_pairs}")

    # 3. pairs -> clusters -> one golden record per cluster
    clusters = dedup_clusters(pairs, docs)  # total map incl. singletons
    labeled = docs.join(
        clusters.select("doc_id", F.col("cluster_id").alias("component")), "doc_id"
    )
    golden = golden_records(
        labeled,
        cluster_col="component",
        id_col="doc_id",
        rules={"text": "longest", "lang": "most_frequent",
               "source": "min", "n_chars": "max"},
    )
    merged = golden.filter(F.col("n_members") > 1)
    print(f"golden records: {golden.count()} "
          f"({merged.count()} merged from multi-doc clusters)")

    # 4. dense-vector side: exact cosine pairs + mutual-kNN graph
    vec_pairs = cosine_allpairs_join(emb, threshold=0.45)
    print(f"exact cosine pairs @0.45: {vec_pairs.count()}")
    mk = mutual_knn(emb, k=5)
    print(f"mutual 5-NN edges: {mk.count()}")

    # 5. representation statistics: covariance + whitening condition
    cov = embedding_covariance(emb)
    W, vals = whitening_matrix(cov)
    print(f"covariance cells: {cov.count()}; "
          f"eigenvalue range [{vals.min():.4f}, {vals.max():.4f}]")

    spark.stop()


if __name__ == "__main__":
    main()
