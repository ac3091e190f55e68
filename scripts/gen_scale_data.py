"""Generate driver-schema-compatible synthetic tables at larger scale
factors for the scale rehearsal (SCALING.md addendum / BENCH_scale.json).

Schemas and value domains mirror /root/testdata/sf0.1 exactly (verified
against its parquet footers); row counts scale linearly with sf where
sf1 = 10x the driver's sf0.1.  Two deliberate upgrades over the driver
corpus, both aimed at making the rehearsal representative:

- documents carry a ZIPFIAN vocabulary (log-uniform rank over 50k
  types ~ Zipf s=1) instead of the driver's 23-word toy vocabulary —
  prefix filters (q162/q176/q223) see realistic selectivity — plus a
  planted 3% near-duplicate rate so dedup does real work;
- embeddings have 10 planted label clusters (centroid + noise) so
  IVF/LSH candidate generation sees real structure.

Everything is generated DISTRIBUTED (spark.range + column expressions,
xxhash64-derived randomness keyed on the row id) — no driver-side data,
deterministic at any partitioning.

Usage: python scripts/gen_scale_data.py <sf> [outdir]
       (default outdir /root/repo/scale_data/sf<sf>)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from patternly_spark.session import get_spark

# sf1 row counts = 10x the driver's sf0.1
BASE = {
    "region": 5,
    "nation": 25,
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "lineitem": 6_000_000,
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "F", "P"]
RETURNFLAGS = ["R", "A", "N"]
LINESTATUSES = ["O", "F"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "de", "fr", "es", "zh"]
BRANDS = [f"Brand#{i}{j}" for i in range(1, 6) for j in range(1, 6)]
TYPES = [
    f"{a} {b} {c}"
    for a in ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
    for b in ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
    for c in ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
]

VOCAB_SIZE = 50_000
DOC_TOKENS = 60       # ~ driver's ~50-token documents
NEARDUP_FRAC = 0.03   # planted near-duplicate rate
N_LABELS = 10
EMB_DIM = 64


def _u(*cols):
    """Deterministic uniform in [0, 1) from xxhash64 of the columns."""
    return (F.pmod(F.xxhash64(*cols), F.lit(1 << 30)).cast("double")
            / F.lit(float(1 << 30)))


def _pick(options: list[str], *cols):
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(F.xxhash64(*cols), F.lit(len(options))) + 1).cast("int"))


def _zipf_rank(*cols):
    """Log-uniform rank in [1, VOCAB_SIZE] — P(r) ~ 1/r (Zipf s=1)."""
    import math

    return F.least(
        F.lit(VOCAB_SIZE),
        F.greatest(
            F.lit(1),
            F.floor(F.exp(_u(*cols) * F.lit(math.log(float(VOCAB_SIZE))))).cast("long"),
        ),
    )


def main() -> None:
    sf = float(sys.argv[1])
    outdir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/root/repo/scale_data/sf{sys.argv[1]}"
    )
    spark = get_spark("gen-scale-data")
    spark.sparkContext.setLogLevel("ERROR")

    def n(t):
        if t in ("region", "nation"):
            return BASE[t]
        return max(1, int(BASE[t] * sf))

    def rng(t, parts=None):
        cnt = n(t)
        p = parts or max(4, min(64, cnt // 100_000 + 1))
        return spark.range(0, cnt, 1, p)

    # --- dims ---
    spark.createDataFrame(
        [(i, r) for i, r in enumerate(REGIONS)], "r_regionkey int, r_name string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{outdir}/region.parquet")
    spark.createDataFrame(
        [(i, nm, i % 5) for i, nm in enumerate(NATIONS)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{outdir}/nation.parquet")

    rng("customer").select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.lpad(F.col("id").cast("string"), 9, "0")).alias("c_name"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(25)).cast("int").alias("c_nationkey"),
        (F.round(_u("id", F.lit(2)) * 11000.0 - 1000.0, 2)).alias("c_acctbal"),
        _pick(SEGMENTS, "id", F.lit(3)).alias("c_mktsegment"),
    ).write.mode("overwrite").parquet(f"{outdir}/customer.parquet")

    rng("supplier").select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.lpad(F.col("id").cast("string"), 9, "0")).alias("s_name"),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(25)).cast("int").alias("s_nationkey"),
        (F.round(_u("id", F.lit(5)) * 11000.0 - 1000.0, 2)).alias("s_acctbal"),
    ).write.mode("overwrite").parquet(f"{outdir}/supplier.parquet")

    rng("part").select(
        F.col("id").alias("p_partkey"),
        F.concat(F.lit("part "), F.col("id").cast("string")).alias("p_name"),
        _pick(BRANDS, "id", F.lit(6)).alias("p_brand"),
        _pick(TYPES, "id", F.lit(7)).alias("p_type"),
        (F.pmod(F.xxhash64("id", F.lit(8)), F.lit(50)) + 1).cast("int").alias("p_size"),
        (F.round(F.lit(900.0) + _u("id", F.lit(9)) * 1200.0, 2)).alias("p_retailprice"),
    ).write.mode("overwrite").parquet(f"{outdir}/part.parquet")

    n_cust = n("customer")
    # orders over 1995-01-01 .. 2001-08-01 (the driver's span)
    span_days = 2404
    rng("orders").select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.xxhash64("id", F.lit(10)), F.lit(n_cust)).alias("o_custkey"),
        _pick(STATUSES, "id", F.lit(11)).alias("o_orderstatus"),
        (F.round(F.lit(1000.0) + _u("id", F.lit(12)) * 450000.0, 2)).alias("o_totalprice"),
        (
            F.to_timestamp(F.lit("1995-01-01"))
            + F.make_interval(days=F.pmod(F.xxhash64("id", F.lit(13)), F.lit(span_days)).cast("int"))
        ).alias("o_orderdate"),
        _pick(PRIORITIES, "id", F.lit(14)).alias("o_orderpriority"),
    ).write.mode("overwrite").parquet(f"{outdir}/orders.parquet")

    n_ord, n_part, n_supp = n("orders"), n("part"), n("supplier")
    rng("lineitem").select(
        F.pmod(F.xxhash64("id", F.lit(15)), F.lit(n_ord)).alias("l_orderkey"),
        F.pmod(F.xxhash64("id", F.lit(16)), F.lit(n_part)).alias("l_partkey"),
        F.pmod(F.xxhash64("id", F.lit(17)), F.lit(n_supp)).alias("l_suppkey"),
        (F.pmod(F.xxhash64("id", F.lit(18)), F.lit(7)) + 1).cast("int").alias("l_linenumber"),
        (F.pmod(F.xxhash64("id", F.lit(19)), F.lit(50)) + 1).cast("double").alias("l_quantity"),
        (F.round(F.lit(900.0) + _u("id", F.lit(20)) * 104000.0, 2)).alias("l_extendedprice"),
        (F.pmod(F.xxhash64("id", F.lit(21)), F.lit(11)).cast("double") / 100.0).alias("l_discount"),
        (F.pmod(F.xxhash64("id", F.lit(22)), F.lit(9)).cast("double") / 100.0).alias("l_tax"),
        _pick(RETURNFLAGS, "id", F.lit(23)).alias("l_returnflag"),
        _pick(LINESTATUSES, "id", F.lit(24)).alias("l_linestatus"),
        (
            F.to_timestamp(F.lit("1995-01-01"))
            + F.make_interval(days=F.pmod(F.xxhash64("id", F.lit(25)), F.lit(span_days + 120)).cast("int"))
        ).alias("l_shipdate"),
    ).write.mode("overwrite").parquet(f"{outdir}/lineitem.parquet")

    n_users = max(1000, n("events") // 20)
    rng("events").select(
        F.col("id").alias("event_id"),
        (
            F.to_timestamp(F.lit("2024-01-01"))
            + F.make_interval(secs=F.pmod(F.xxhash64("id", F.lit(26)), F.lit(30 * 86400)).cast("double"))
        ).alias("ts"),
        F.pmod(F.xxhash64("id", F.lit(27)), F.lit(n_users)).alias("user_id"),
        # skewed mix: view-heavy like real clickstreams
        F.element_at(
            F.array(*[F.lit(t) for t in
                      ["view", "view", "view", "view", "click", "click",
                       "purchase", "signup", "error"]]),
            (F.pmod(F.xxhash64("id", F.lit(28)), F.lit(9)) + 1).cast("int"),
        ).alias("event_type"),
        F.round(_u("id", F.lit(29)) * 100.0, 2).alias("value"),
        F.concat(F.lit('{"k": '), F.pmod(F.xxhash64("id", F.lit(30)), F.lit(100)).cast("string"), F.lit("}")).alias("props"),
    ).write.mode("overwrite").parquet(f"{outdir}/events.parquet")

    # --- documents: Zipfian vocabulary + planted near-duplicates ---
    n_docs = n("documents")
    base_docs = rng("documents").withColumn(
        # near-dups: ~NEARDUP_FRAC of docs re-generate another doc's text
        # with a tiny token edit (same seed base id)
        "base_id",
        F.when(
            _u("id", F.lit(31)) < F.lit(NEARDUP_FRAC),
            F.pmod(F.xxhash64("id", F.lit(32)), F.lit(n_docs)),
        ).otherwise(F.col("id")),
    )
    tokens = F.transform(
        F.sequence(F.lit(1), F.lit(DOC_TOKENS)),
        lambda i: F.concat(F.lit("w"), _zipf_rank(F.col("base_id"), i, F.lit(33)).cast("string")),
    )
    # the edit that makes a near-dup NEAR: token 7 replaced from the
    # doc's own id stream (no-op for originals, 1-token diff for dups)
    tokens_edited = F.transform(
        tokens,
        lambda t, i: F.when(
            (i == 6) & (F.col("base_id") != F.col("id")),
            F.concat(F.lit("w"), _zipf_rank(F.col("id"), F.lit(999), F.lit(34)).cast("string")),
        ).otherwise(t),
    )
    docs = base_docs.select(
        F.col("id").alias("doc_id"),
        F.array_join(tokens_edited, " ").alias("text"),
        _pick(LANGS, "id", F.lit(35)).alias("lang"),
        F.concat(F.lit("src"), F.pmod(F.xxhash64("id", F.lit(36)), F.lit(20)).cast("string")).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))
    docs.write.mode("overwrite").parquet(f"{outdir}/documents.parquet")

    # --- embeddings: driver-matched iid noise (per-dim ~ U(-0.22, 0.22),
    # std 0.127 — the driver's measured per-dim std is 0.125 and labels
    # carry no cosine signal) + a planted 3% near-duplicate rate
    # (base vector + 2% perturbation, cosine ~0.999) so dedup/ANN see
    # the real operating regime: a thin true-positive set over a
    # near-orthogonal bulk.
    n_emb = n("embeddings")
    emb = rng("embeddings").withColumn(
        "label", F.pmod(F.xxhash64("id", F.lit(37)), F.lit(N_LABELS)).cast("int")
    ).withColumn(
        "base_id",
        F.when(
            _u("id", F.lit(40)) < F.lit(NEARDUP_FRAC),
            F.pmod(F.xxhash64("id", F.lit(41)), F.lit(n_emb)),
        ).otherwise(F.col("id")),
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(EMB_DIM - 1)),
        lambda i: (
            (_u(F.col("base_id"), i, F.lit(38)) * 0.44 - 0.22)
            + (_u(F.col("id"), i, F.lit(39)) * 0.01 - 0.005)
        ).cast("float"),
    )
    emb.select(
        F.col("id").alias("vec_id"),
        vec.alias("embedding"),
        "label",
    ).write.mode("overwrite").parquet(f"{outdir}/embeddings.parquet")

    for t in BASE:
        c = spark.read.parquet(f"{outdir}/{t}.parquet").count()
        print(f"{t}: {c}")
    print(f"written to {outdir}")


if __name__ == "__main__":
    main()
