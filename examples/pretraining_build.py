"""End-to-end pretraining dataset BUILD + SHIP demo:

    boilerplate removal -> exact dedup -> quality gate -> leakage-safe
    split -> token-balanced training shards on disk with a fingerprint
    manifest -> integrity verify -> epoch-reproducible read order

Run from anywhere:

    python examples/pretraining_build.py [sf_dir] [out_dir]

This is the "ship it" half of the story (examples/curate.py is the
"clean it" half): the output is what a trainer consumes — parquet
shards balanced by token count, a manifest that proves later the files
are what the pipeline wrote, and a deterministic per-epoch read order
that reproduces on any cluster.  The same stages are oracle-checked as
q115/q120/q108/q122 in __spark_entry__.py.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

from pyspark.sql import functions as F

from patternly_spark.operators.dedup import boilerplate_removal, exact_dedup
from patternly_spark.operators.sampling import epoch_shuffle, leakage_safe_split
from patternly_spark.session import get_spark
from patternly_spark.sources.shards import read_shard, verify_shards, write_training_shards

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="shards_")

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
print(f"corpus: {docs.count()} docs from {sf_dir}")

# 1. corpus-frequency boilerplate removal (ccnet-style): spans seen in
#    more than 3 documents drop from ALL documents
cleaned = boilerplate_removal(docs, block_tokens=3, max_doc_freq=3)
body = cleaned.filter(F.col("n_kept") > 0).select(
    "doc_id", F.col("text_clean").alias("text")
)

# 2. normalized exact dedup, keep canonicals only
dd = exact_dedup(body)
kept = body.join(dd.filter(~F.col("is_dup")).select("doc_id"), "doc_id")

# 3. quality gate: at least 8 tokens survive
tok_len = F.size(F.split(F.trim(F.col("text")), r"\s+"))
gated = kept.filter(tok_len >= 8)
print(f"after boilerplate+dedup+gate: {gated.count()} docs")

# 4. leakage-safe split: near-dup pairs (adjacent-id unigram Jaccard
#    >= 0.8) may never straddle train/val/test
sets = gated.select("doc_id", F.array_distinct(F.split("text", " ")).alias("toks"))
a = sets.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
b = sets.select((F.col("doc_id") - 1).alias("doc_a"), F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
jac = F.size(F.array_intersect("ta", "tb")).cast("double") / F.size(F.array_union("ta", "tb"))
pairs = a.join(b, "doc_a").filter(jac >= 0.8).select("doc_a", "doc_b")
split = leakage_safe_split(gated, pairs)
train = gated.join(split.filter(F.col("split") == "train").select("doc_id"), "doc_id")
print("split sizes:", {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()})

# 5. ship: token-balanced shards + fingerprint manifest
manifest = write_training_shards(train, out_dir, n_shards=4)
print("shard manifest:")
for r in manifest.orderBy("shard").collect():
    print(f"  shard {r['shard']}: {r['n_rows']} docs, {r['weight_tokens']} tokens, checksum {r['checksum'][:12]}...")

# 6. integrity handshake before training
ver = verify_shards(spark, out_dir)
assert all(r["ok"] for r in ver.collect()), "shard verification failed"
print("verify_shards: all shards OK")

# 7. reproducible epoch order (no global sort): what each worker reads
order = epoch_shuffle(train.select("doc_id"), n_epochs=2, n_shards=4)
head = order.filter((F.col("epoch") == 1) & (F.col("shard") == 0)).orderBy("pos").limit(3)
print("epoch 1 / shard 0 reads first:", [r["doc_id"] for r in head.collect()])

one = read_shard(spark, out_dir, 0)
print(f"read_shard(0): {one.count()} docs (partition-pruned scan)")
print(f"done; shards at {out_dir}")
