"""Training-data curation operators: benchmark decontamination and
sequence packing.  Semantics pinned on synthetic corpora (hand-computed
expectations); plan shape pinned so the 100 TB design can't regress.
The DuckDB hash parity for both lives in test_oracle_parity (q34/q35)."""

import pytest
from pyspark.sql import functions as F

from patternly_spark.operators.decontam import benchmark_shingle_set, decontaminate
from patternly_spark.operators.packing import chunk_documents, pack_sequences


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def corpora(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # verbatim benchmark copy: every trigram collides
            (0, "alpha beta gamma delta epsilon"),
            # shares exactly one trigram ("alpha beta gamma") of its three
            (1, "alpha beta gamma zeta eta"),
            # disjoint vocabulary: zero collisions
            (2, "one two three four five"),
            # shorter than a trigram: single whole-text shingle, no hit
            (3, "alpha beta"),
        ],
        "doc_id long, text string",
    )
    return corpus, bench


def test_decontaminate_fractions(spark, corpora):
    corpus, bench = corpora
    out = {
        r["doc_id"]: r
        for r in decontaminate(corpus, bench, threshold=0.5).collect()
    }
    assert len(out) == 4  # every corpus doc appears, hits or not
    assert out[0]["n_shingles"] == 3 and out[0]["contamination"] == 1.0
    assert out[0]["contaminated"] is True
    assert out[1]["n_hits"] == 1 and out[1]["contamination"] == pytest.approx(1 / 3)
    assert out[1]["contaminated"] is False
    assert out[2]["n_hits"] == 0 and out[2]["contaminated"] is False
    # sub-trigram doc: one whole-text shingle, not in the benchmark set
    assert out[3]["n_shingles"] == 1 and out[3]["n_hits"] == 0


def test_decontaminate_threshold_boundary(spark, corpora):
    corpus, bench = corpora
    out = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(corpus, bench, threshold=1 / 3).collect()
    }
    assert out[1] is True  # >= is inclusive at the threshold


def test_benchmark_shingle_set_is_distinct(spark):
    bench = spark.createDataFrame(
        [(0, "a b c a b c a b c"), (1, "a b c d")], "doc_id long, text string"
    )
    got = sorted(r["sh"] for r in benchmark_shingle_set(bench).collect())
    assert got == ["a b c", "b c a", "b c d", "c a b"]


def test_decontaminate_plan_broadcasts_benchmark(spark, corpora):
    corpus, bench = corpora
    plan = _plan(decontaminate(corpus, bench))
    # benchmark probe is a broadcast hash join — the corpus side never
    # shuffles to meet the benchmark
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # exactly one exchange pair: the per-doc rollup (plus the broadcast
    # side's own tiny distinct) — the exploded corpus is partially
    # aggregated map-side before it
    assert "partial_count" in plan or "HashAggregate" in plan
    # Catalyst-trap guards (same pair as minhash): the corpus tokenizer
    # runs exactly twice in the whole plan — once for the corpus scan,
    # once for the (small) benchmark side — and explode_outer keeps
    # InferFiltersFromGenerate from re-inlining the shingle pipeline
    # into a size() predicate (was 11x at sf0.1)
    assert plan.count("split(") == 2, f"tokenizer re-inlined:\n{plan[:2000]}"


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def test_pack_sequences_block_arithmetic(spark):
    # single shard, budget 10, token counts 4/4/4: the third doc starts at
    # offset 8 and straddles into block 1
    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "e f g h"), (2, "i j k l")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in pack_sequences(docs, budget=10, n_shards=1).collect()
    }
    assert [rows[i]["bin_id"] for i in range(3)] == [0, 0, 0]
    assert [rows[i]["offset_in_bin"] for i in range(3)] == [0, 4, 8]
    assert [rows[i]["n_bins_spanned"] for i in range(3)] == [1, 1, 2]


def test_pack_sequences_shard_isolation_and_conservation(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (1 + i % 7))) for i in range(200)],
        "doc_id long, text string",
    )
    out = pack_sequences(docs, budget=16, n_shards=4)
    rows = out.collect()
    assert len(rows) == 200
    # shard = doc_id % 4; bin ids from different shards never collide
    assert all(r["bin_id"] % 4 == r["shard"] == r["doc_id"] % 4 for r in rows)
    # within a shard, offsets restart exactly at block boundaries:
    # replaying the shard in doc order reproduces offset/bin/span
    by_shard: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        start = 0
        for r in rs:
            assert r["bin_id"] == (start // 16) * 4 + shard
            assert r["offset_in_bin"] == start % 16
            end = start + max(r["n_tokens"] - 1, 0)
            assert r["n_bins_spanned"] == end // 16 - start // 16 + 1
            start += r["n_tokens"]


def test_pack_sequences_precomputed_counts_and_validation(spark):
    docs = spark.createDataFrame(
        [(0, "ignored", 5), (1, "ignored", 7)],
        "doc_id long, text string, n_tok int",
    )
    rows = {
        r["doc_id"]: r
        for r in pack_sequences(
            docs, n_tokens=F.col("n_tok"), budget=8, n_shards=1
        ).collect()
    }
    assert rows[0]["n_tokens"] == 5 and rows[1]["offset_in_bin"] == 5
    assert rows[1]["n_bins_spanned"] == 2  # 5..11 straddles block 0->1
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(docs, budget=0)
    with pytest.raises(ValueError, match="n_shards"):
        pack_sequences(docs, n_shards=-1)


def test_pack_sequences_plan_has_single_shard_exchange(spark):
    docs = spark.createDataFrame(
        [(i, "w x y z") for i in range(50)], "doc_id long, text string"
    )
    plan = _plan(pack_sequences(docs, budget=8, n_shards=4))
    # one hash exchange on the shard key feeds the per-shard window —
    # no global single-partition sort
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(shard" in plan
    assert "SinglePartition" not in plan


# ---------------------------------------------------------------------------
# document chunking
# ---------------------------------------------------------------------------

def test_chunk_documents_overlap_and_coverage(spark):
    docs = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(10))),  # 10 toks, 3 chunks
         (1, "a b"),                                  # shorter than a chunk
         (2, " ".join(f"x{i}" for i in range(4)))],  # exactly one chunk
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap=1)
    rows = sorted(
        ((r["doc_id"], r["chunk_id"], r["n_chunk_tokens"], r["chunk_text"])
         for r in out.collect())
    )
    assert rows == [
        (0, 0, 4, "w0 w1 w2 w3"),
        (0, 1, 4, "w3 w4 w5 w6"),   # stride 3: one-token overlap
        (0, 2, 4, "w6 w7 w8 w9"),
        (1, 0, 2, "a b"),           # short doc -> single partial chunk
        (2, 0, 4, "x0 x1 x2 x3"),   # exact fit -> no redundant tail chunk
    ]
    # every token of doc 0 appears in some chunk (coverage)
    covered = set()
    for _, _, _, text in rows[:3]:
        covered.update(text.split())
    assert covered == {f"w{i}" for i in range(10)}
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_chunk_documents_plan_stays_narrow(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(chunk_documents(docs))
    assert "Exchange" not in plan       # chunks stay in the doc's partition
    assert plan.count("split(") == 1    # tokenizer staged once


def test_decontaminate_empty_benchmark(spark, corpora):
    corpus, _ = corpora
    empty_bench = spark.createDataFrame([], "doc_id long, text string")
    out = decontaminate(corpus, empty_bench).collect()
    assert len(out) == 4
    assert all(r["n_hits"] == 0 and r["contaminated"] is False for r in out)


def test_pack_sequences_more_shards_than_docs(spark):
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "c d e")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in pack_sequences(docs, budget=8, n_shards=64).collect()}
    assert len(rows) == 2
    # each doc alone in its shard: offset 0, bin encodes the shard
    assert all(r["offset_in_bin"] == 0 and r["bin_id"] == r["shard"] for r in rows.values())


def test_length_bucket_stats_arithmetic_and_waste_reduction(spark):
    """Per-batch padding = bn * max(len) - sum(len); bucketing by length
    must not increase total padded tokens vs one global bucket (equal
    batch size, same rank order)."""
    from patternly_spark.operators.packing import length_bucket_stats

    # 8 short docs (1 token) + 8 long docs (5 tokens)
    rows = [(i, "w") for i in range(8)] + [
        (100 + i, "a b c d e") for i in range(8)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    two = length_bucket_stats(docs, n_buckets=2, batch_size=8).collect()
    by_bucket = {r["bucket"]: r for r in two}
    # bucket 1 = the 8 shorts (max 1, real 8, padded 8); bucket 2 = longs
    assert by_bucket[1]["real_tokens"] == 8 and by_bucket[1]["padded_tokens"] == 8
    assert by_bucket[1]["waste_frac"] == 0.0
    assert by_bucket[2]["real_tokens"] == 40 and by_bucket[2]["padded_tokens"] == 40

    one = length_bucket_stats(docs, n_buckets=1, batch_size=8).collect()
    padded_one = sum(r["padded_tokens"] for r in one)
    padded_two = sum(r["padded_tokens"] for r in two)
    # ascending-length order keeps batches homogeneous even unbucketed
    # here, so equality is allowed — bucketing must never be worse
    assert padded_two <= padded_one
    assert sum(r["n_docs"] for r in two) == 16


def test_cdc_chunks_cover_and_realign_after_edit(spark):
    """Content-defined chunking laws: spans tile each doc exactly
    (half-open, contiguous, start 0, end n); empty docs emit no chunks;
    sub-k-gram docs emit one whole-doc chunk; and — the CDC point — a
    prefix insertion preserves the chunk CONTENT after the first
    post-edit boundary, where fixed-size chunking would shift every
    chunk."""
    from patternly_spark.operators.packing import content_defined_chunks

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu "
        "nu xi omicron pi rho sigma tau upsilon"
    )
    docs = spark.createDataFrame(
        [(1, base), (2, "INSERTED PREFIX " + base), (3, ""), (4, "tiny doc")],
        "doc_id long, text string",
    )
    out = content_defined_chunks(docs, kgram=3, boundary_mod=4).toPandas()

    for _, g in out.groupby("doc_id"):
        g = g.sort_values("chunk_idx")
        assert g.iloc[0]["start_tok"] == 0
        assert (g["end_tok"].shift(1)[1:] == g["start_tok"][1:]).all()
        assert (g["n_tokens"] == g["end_tok"] - g["start_tok"]).all()
    assert 3 not in set(out.doc_id)
    assert len(out[out.doc_id == 4]) == 1 and out[out.doc_id == 4].iloc[0]["chunk_text"] == "tiny doc"

    c1 = set(out[out.doc_id == 1].chunk_text)
    c2 = set(out[out.doc_id == 2].chunk_text)
    assert len(c1 & c2) >= len(c1) - 2  # only chunks touching the edit change
