"""BPE merge induction vs a plain-Python reference implementation."""

import collections

from patternly_spark.operators.tokenizer import END_OF_WORD, bpe_merges, word_vocabulary


def _ref_bpe(texts, num_merges):
    """Sennrich-style reference: word counts, then greedy pair merges
    with (count desc, left asc, right asc) tie-break."""
    vocab = collections.Counter()
    for t in texts:
        for w in t.split():
            vocab[w] += 1
    words = {w: list(w) + [END_OF_WORD] for w in vocab}
    merges = []
    for _ in range(num_merges):
        pair_counts = collections.Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += vocab[w]
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), n = best
        merges.append((l, r, n))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def test_bpe_matches_reference(spark):
    texts = [
        "low low low low low",
        "lower lower newest newest newest newest newest newest",
        "widest widest widest",
    ]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = bpe_merges(docs, num_merges=8)
    want = _ref_bpe(texts, 8)
    assert got == want


def test_bpe_overlapping_run_merges_left_to_right(spark):
    # "aaaa": merge (a,a) counts 3 overlapping pairs but must apply greedily
    docs = spark.createDataFrame([(0, "aaaa aaaa")], "doc_id long, text string")
    got = bpe_merges(docs, num_merges=2)
    want = _ref_bpe(["aaaa aaaa"], 2)
    assert got == want


def test_word_vocabulary_counts(spark):
    docs = spark.createDataFrame([(0, "x y x"), (1, "x  z")], "doc_id long, text string")
    v = {r["word"]: r["count"] for r in word_vocabulary(docs).collect()}
    assert v == {"x": 3, "y": 1, "z": 1}


def test_bpe_encode_matches_reference_apply(spark):
    texts = ["low lower lowest", "new newer newest newest"]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    merges = bpe_merges(docs, num_merges=6)

    # reference apply: same greedy left-to-right merge cascade per word
    def apply_ref(word):
        syms = list(word) + [END_OF_WORD]
        for l, r, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    from patternly_spark.operators.tokenizer import bpe_encode

    got = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(docs, merges).collect()}
    for i, t in enumerate(texts):
        want = [s for w in t.split() for s in apply_ref(w)]
        assert got[i] == want, (i, got[i], want)


def test_vocab_coverage_counts(spark):
    from patternly_spark.operators.tokenizer import vocab_coverage

    docs = spark.createDataFrame(
        [
            (1, "a b c x", "s1"),
            (2, "a a y z", "s1"),
            (3, "b b b", "s2"),
            (4, "", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    vocab = spark.createDataFrame([("a",), ("b",), ("c",)], "token string")
    res = {r.source: r for r in vocab_coverage(docs, vocab).collect()}
    # s1: 8 tokens, oov = {x, y, z} -> 3 occurrences, 3 types
    assert (res["s1"].n_tokens, res["s1"].n_oov, res["s1"].n_oov_types) == (8, 3, 3)
    assert res["s1"].oov_rate == 3.0 / 8.0
    # s2: 3 tokens, all in vocab; empty doc contributes nothing
    assert (res["s2"].n_tokens, res["s2"].n_oov, res["s2"].n_oov_types) == (3, 0, 0)
    assert res["s2"].oov_rate == 0.0
