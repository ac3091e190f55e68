"""Randomized Python-reference parity for the round-4 operators whose
semantics have the most room to drift: each test builds one random
(seeded) dataset, computes the expected result with a plain-Python
reference implementation, and demands exact agreement from the Spark
operator in a single job."""

import hashlib
import math

import numpy as np


def _md5_fraction(key: int) -> float:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) / 2**32


def test_exact_substring_spans_matches_reference(spark):
    from patternly_spark.operators.dedup import exact_substring_spans

    rng = np.random.default_rng(7)
    L = 5
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(30):
        toks = list(rng.choice(vocab, size=int(rng.integers(3, 40))))
        docs.append(toks)
    # plant repeats: doc 30/31 copy runs from docs 0/1
    docs.append(docs[0][:12] + ["x1", "x2"] + docs[1][:8])
    docs.append(["y0"] + docs[0][:9])

    # reference: duplicated-L-window keep-first coverage -> merged spans
    first = {}
    occurrences = []
    for d, toks in enumerate(docs):
        for p in range(len(toks) - L + 1):
            g = "\x1f".join(toks[p : p + L])
            occurrences.append((d, p, g))
            if g not in first:
                first[g] = (d, p)
    counts = {}
    for _, _, g in occurrences:
        counts[g] = counts.get(g, 0) + 1
    covered = {}
    for d, p, g in occurrences:
        if counts[g] > 1 and first[g] != (d, p):
            covered.setdefault(d, set()).update(range(p, p + L))
    want = set()
    for d, pos in covered.items():
        # duplicated WINDOW starts, merged by overlap (the operator merges
        # window intervals, not bare position sets)
        starts = sorted(
            p for (dd, p, g) in occurrences
            if dd == d and counts[g] > 1 and first[g] != (dd, p)
        )
        cur_s, cur_e = starts[0], starts[0] + L
        for p in starts[1:]:
            if p > cur_e:
                want.add((d, cur_s, cur_e))
                cur_s, cur_e = p, p + L
            else:
                cur_e = max(cur_e, p + L)
        want.add((d, cur_s, cur_e))

    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in exact_substring_spans(df, min_tokens=L).collect()
    }
    assert got == want


def test_gapfill_linear_matches_reference(spark):
    from patternly_spark.operators.rollup import gapfill

    rng = np.random.default_rng(11)
    W = 7
    rows = []
    for g in ("a", "b"):
        ts = sorted(rng.choice(np.arange(0, 400), size=25, replace=False))
        for t in ts:
            rows.append((g, int(t), float(rng.normal())))
    df = spark.createDataFrame(rows, "k string, t long, v double")

    # reference
    want = {}
    for g in ("a", "b"):
        pts = [(t, v) for (k, t, v) in rows if k == g]
        buckets = {}
        for t, v in pts:
            b = t - t % W
            n, mx = buckets.get(b, (0, -math.inf))
            buckets[b] = (n + 1, max(mx, v))
        bs = sorted(buckets)
        for i, b in enumerate(bs):
            want[(g, b)] = (buckets[b][0], buckets[b][1], buckets[b][1])
            if i + 1 < len(bs):
                nb = bs[i + 1]
                for gap in range(b + W, nb, W):
                    frac = (gap - b) / (nb - b)
                    filled = buckets[b][1] + (buckets[nb][1] - buckets[b][1]) * frac
                    want[(g, gap)] = (0, None, filled)

    got = {
        (r["k"], r["window_start"]): (r["n"], r["val"], r["val_filled"])
        for r in gapfill(df, axis="t", value="v", width=W, by="k", agg="max", method="linear").collect()
    }
    assert set(got) == set(want)
    for key in want:
        wn, wv, wf = want[key]
        gn, gv, gf = got[key]
        assert (gn, gv) == (wn, wv), key
        assert (gf == wf) or (abs(gf - wf) < 1e-12), key


def test_weighted_sample_matches_reference_exactly(spark):
    from patternly_spark.operators.sampling import weighted_sample

    rng = np.random.default_rng(13)
    rows = [(i, float(rng.integers(1, 100))) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double")

    def es_key(doc_id, w):
        u = _md5_fraction(doc_id) + 2.0**-33
        lnu_q = math.floor(math.log(u) * (1 << 20)) / (1 << 20)
        return lnu_q / w

    ranked = sorted(rows, key=lambda r: (-es_key(*r), r[0]))
    want = {r[0] for r in ranked[:40]}
    got = {r["doc_id"] for r in weighted_sample(df, "w", 40, key_col="doc_id").collect()}
    assert got == want
