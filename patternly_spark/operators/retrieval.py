"""Lexical retrieval over a document corpus: TF-IDF / BM25.

Scale shape (the Lucene-style inverted index, relationalized):

- corpus statistics (N, avg doc length, per-term document frequency)
  are ONE aggregate over the corpus — and for a repeatedly-queried
  corpus they are a tiny table you compute once and reuse
  (``corpus_stats``), exactly like an index's term dictionary.
- scoring a query is then a single narrow projection over the corpus:
  per-document term frequencies are array expressions (JVM-side,
  whole-stage codegen, zero shuffle), the per-term IDF weights are
  driver-side scalars folded into the plan as literals (a query has a
  handful of terms).  Only the final top-k (if requested) aggregates.

No explode, no per-term shuffle: a 100 TB corpus is scored in one
filter+project pass.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _toks(text_col: str):
    return F.split(F.trim(F.col(text_col)), r"\s+")


def _tf(text_col: str, term: str):
    return F.size(F.filter(_toks(text_col), lambda t: t == F.lit(term)))


def corpus_stats(docs: DataFrame, terms: list[str], *, text_col: str = "text") -> dict:
    """One aggregate pass: corpus size, total token count, and each
    term's document frequency.  Returns plain Python scalars (the "term
    dictionary" for these terms)."""
    row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(_toks(text_col))).alias("total_dl"),
        *[
            F.sum((_tf(text_col, t) > 0).cast("long")).alias(f"df_{i}")
            for i, t in enumerate(terms)
        ],
    ).collect()[0]
    return {
        "n": int(row["n"]),
        "total_dl": int(row["total_dl"]),
        "df": {t: int(row[f"df_{i}"]) for i, t in enumerate(terms)},
    }


def _quantize_idf(x: float, bits: int | None) -> float:
    """floor(x * 2^bits) / 2^bits: multiplying/dividing by a power of two
    is EXACT in binary floating point, so two engines whose ``ln`` differs
    in the last ulp (measured: DuckDB vs CPython libm on ~3% of inputs)
    still agree after quantization — the knob that makes log-based scores
    reproducible across engines."""
    if bits is None:
        return x
    scale = float(1 << bits)
    return math.floor(x * scale) / scale


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    stats: dict | None = None,
    idf_quantize_bits: int | None = None,
) -> DataFrame:
    """BM25 score of every document matching >=1 query term.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5))   (Lucene's non-negative form)
    tf-part = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    IDFs are computed on the driver from integer stats, so the
    distributed pass is pure +,*,/ over doubles — deterministic and
    engine-portable.  Pass a precomputed ``stats`` (from
    ``corpus_stats``) to skip the statistics scan;
    ``idf_quantize_bits`` makes the idf cross-engine exact (see
    ``_quantize_idf``).
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    st = stats or corpus_stats(docs, terms, text_col=text_col)
    n, avgdl = st["n"], st["total_dl"] / st["n"]
    idf = {
        t: _quantize_idf(
            math.log(1.0 + (n - st["df"][t] + 0.5) / (st["df"][t] + 0.5)),
            idf_quantize_bits,
        )
        for t in terms
    }

    dl = F.size(_toks(text_col)).cast("double")
    parts = []
    for t in terms:
        tf = _tf(text_col, t).cast("double")
        parts.append(
            F.lit(idf[t]) * (tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl)))
        )
    score = parts[0]
    for p in parts[1:]:
        score = score + p
    any_hit = None
    for t in terms:
        hit = _tf(text_col, t) > 0
        any_hit = hit if any_hit is None else (any_hit | hit)
    return docs.filter(any_hit).select(F.col(id_col), score.alias("bm25"))


def bm25_retrieve(
    docs: DataFrame,
    terms: list[str],
    *,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    stats: dict | None = None,
) -> DataFrame:
    """Top-k BM25 retrieval (score desc, id asc tie-break)."""
    scored = bm25_scores(
        docs, terms, text_col=text_col, id_col=id_col, k1=k1, b=b, stats=stats
    )
    w = Window.orderBy(F.desc("bm25"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "bm25", F.col("rank").cast("long").alias("rank"))
    )


def tfidf_scores(
    docs: DataFrame,
    terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    stats: dict | None = None,
    idf_quantize_bits: int | None = None,
) -> DataFrame:
    """Classic TF-IDF (ltc-ish, unnormalized): sum over query terms of
    tf * ln(N/df).  Same one-pass scale shape as ``bm25_scores``."""
    if not terms:
        raise ValueError("terms must be non-empty")
    st = stats or corpus_stats(docs, terms, text_col=text_col)
    idf = {
        t: _quantize_idf(math.log(st["n"] / st["df"][t]), idf_quantize_bits)
        if st["df"][t]
        else 0.0
        for t in terms
    }
    score = None
    any_hit = None
    for t in terms:
        tf = _tf(text_col, t).cast("double")
        p = tf * F.lit(idf[t])
        score = p if score is None else (score + p)
        hit = _tf(text_col, t) > 0
        any_hit = hit if any_hit is None else (any_hit | hit)
    return docs.filter(any_hit).select(F.col(id_col), score.alias("tfidf"))


def collocations(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Bigram collocation mining: every adjacent token pair with its
    count, the marginal token counts, and the association ``lift``
    P(ab) / (P(a)·P(b)) — pointwise mutual information on the exp scale
    (pmi = ln(lift); keeping the ratio makes the result pure integer
    counts + IEEE division, exactly reproducible in an external SQL
    engine — no ``ln`` cross-engine hazard).

    Scale shape: bigram emission is a narrow per-row explode; the big
    shuffle is one map-side-combined groupBy on the bigram; marginals
    attach via two equi-joins on the token key (vocabulary-sized — a
    keyed shuffle, NOT a broadcast, since a 100 TB corpus's vocabulary
    need not fit on one executor).  Corpus totals are two scalar
    aggregates folded in as literals.
    """
    c = F.col(text_col)
    toks = F.split(F.trim(c), r"\s+")
    t = docs.select(toks.alias("__toks"))
    n = F.size(F.col("__toks"))
    pair_idx = F.sequence(F.lit(0), n - 2)
    pairs = t.filter(n >= 2).select(
        F.explode(
            F.transform(
                pair_idx,
                lambda i: F.struct(
                    F.element_at(F.col("__toks"), (i + 1).cast("int")).alias("a"),
                    F.element_at(F.col("__toks"), (i + 2).cast("int")).alias("b"),
                ),
            )
        ).alias("p")
    ).select("p.a", "p.b")
    nab = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    uni = (
        t.select(F.explode(F.col("__toks")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n_tokens = uni.agg(F.sum("c")).collect()[0][0]
    n_bigrams = nab.agg(F.sum("n_ab")).collect()[0][0]
    na = uni.select(F.col("w").alias("a"), F.col("c").alias("n_a"))
    nb = uni.select(F.col("w").alias("b"), F.col("c").alias("n_b"))
    lift = (
        F.col("n_ab").cast("double") / F.lit(float(n_bigrams))
    ) / (
        (F.col("n_a").cast("double") / F.lit(float(n_tokens)))
        * (F.col("n_b").cast("double") / F.lit(float(n_tokens)))
    )
    return (
        nab.filter(F.col("n_ab") >= min_count)
        .join(na, "a")
        .join(nb, "b")
        .select("a", "b", "n_ab", "n_a", "n_b", lift.alias("lift"))
    )


def pmi(lift_col) -> "F.Column":
    """ln of the lift ratio — classic PMI, for API consumers who want
    the log scale (cross-engine last-ulp caveat applies to ln)."""
    c = F.col(lift_col) if isinstance(lift_col, str) else lift_col
    return F.log(c)


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: float = 60.0,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — the standard hybrid
    of lexical + vector retrieval: score(d) = sum over lists of
    1 / (k + rank_i(d)), refusing to compare raw scores across signal
    types (ranks are the only cross-list comparable).

    Output: (id, rrf_score, fused_rank).  A doc absent from a list
    contributes 0; a doc repeated within one list counts its best rank.

    Exactness: each list's contribution lands in its OWN aggregate
    column and the final sum is a fixed left-to-right expression — no
    order-dependent FP aggregation, so an external SQL replica hash-
    matches.  Inputs are top-k lists (tiny); the fused-rank window is a
    single total order over at most sum(k_i) rows.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    from pyspark.sql import Window

    tagged = None
    for i, r in enumerate(rankings):
        t = r.select(
            F.col(id_col), F.lit(i).alias("__list"), F.col(rank_col).alias("__rank")
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    contribs = [
        F.coalesce(
            F.max(
                F.when(
                    F.col("__list") == i,
                    F.lit(1.0) / (F.lit(float(k)) + F.col("__rank").cast("double")),
                )
            ),
            F.lit(0.0),
        ).alias(f"__c{i}")
        for i in range(len(rankings))
    ]
    g = tagged.groupBy(id_col).agg(*contribs)
    score = F.col("__c0")
    for i in range(1, len(rankings)):
        score = score + F.col(f"__c{i}")
    scored = g.select(F.col(id_col), score.alias("rrf_score"))
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return scored.withColumn("fused_rank", F.row_number().over(w).cast("int"))


def chi2_keywords(
    docs: DataFrame,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 5,
    min_df: int = 2,
) -> DataFrame:
    """Group-characteristic terms by chi-squared association — "which
    tokens distinguish THIS source from the rest of the corpus" (the
    domain-profiling view a mixture-weighting pass reads before deciding
    rates).

    Per (group, token) 2x2 document-incidence table (a = docs in group
    with token, b = group docs without, c = other docs with, d = other
    docs without): chi2 = n*(ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d)), rank
    top_k per group (chi2 desc, token asc) among tokens that are
    over-represented (a*(c+d) > c*(a+b)) and pass ``min_df``.

    All counts are integers; the statistic is a fixed shape of correctly-
    rounded double ops, so an external SQL replica is bit-exact.  Plan:
    doc-distinct token explode -> one (group, token) count shuffle, a
    broadcast-sized token-marginal join, and a per-group rank window.
    """
    toks = F.array_distinct(
        F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit(""))
    )
    incidence = docs.select(
        F.col(group_col).alias("grp"), F.explode(toks).alias("token")
    )
    gt = incidence.groupBy("grp", "token").agg(F.count(F.lit(1)).alias("a"))
    tok_df = gt.groupBy("token").agg(F.sum("a").alias("df_all"))
    grp_n = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_grp")
    )
    n_total = docs.count()

    j = (
        gt.join(F.broadcast(grp_n), "grp")
        .join(tok_df, "token")
        .filter(F.col("df_all") >= int(min_df))
    )
    a = F.col("a").cast("double")
    b = (F.col("n_grp") - F.col("a")).cast("double")
    c = (F.col("df_all") - F.col("a")).cast("double")
    d = (F.lit(n_total) - F.col("n_grp") - F.col("df_all") + F.col("a")).cast("double")
    num = (a * d - b * c)
    chi2 = (F.lit(float(n_total)) * num * num) / (
        (a + b) * (c + d) * (a + c) * (b + d)
    )
    over = a * (c + d) > c * (a + b)  # over-represented in the group
    scored = j.filter(over).select(
        F.col("grp").alias(group_col), "token", chi2.alias("chi2")
    )
    from pyspark.sql import Window

    win = Window.partitionBy(group_col).orderBy(
        F.col("chi2").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("int"))
        .filter(F.col("rank") <= int(top_k))
    )


# ---------------------------------------------------------------------------
# positional index / phrase search
# ---------------------------------------------------------------------------


def positional_index(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positional inverted index as a relation: one row per token
    occurrence, (term, doc_id, pos) with 0-based positions.

    This is the materialization a phrase/proximity query engine keys
    on.  At 100 TB: one explode pass (row count = corpus token count);
    persisted bucketed-by-term it serves every subsequent phrase query
    with a pruned scan of just the query's terms — the relational twin
    of a Lucene positions file."""
    t = F.split(F.trim(F.col(text_col)), r"\s+")
    return docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(t).alias("pos", "term")
    ).select("term", "doc_id", "pos")


def phrase_search(
    docs: DataFrame,
    phrase: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    index: DataFrame | None = None,
) -> DataFrame:
    """Exact phrase match via positional-index self-alignment: the
    classic adjacency join — postings of term i shifted by -i all meet
    at the phrase's start position.

    Output: (doc_id, n_matches, first_pos), matching docs only.

    Scale shape: each join input is the index FILTERED to one query
    term (a pushed-down pruned scan when the index is bucketed/
    partitioned by term), and every join is an equi-join on
    (doc_id, start) — co-partitioned after the first shuffle, so the
    m-term phrase costs m pruned scans + (m-1) co-located joins over
    postings-sized (not corpus-sized) relations.  No regex scan of the
    full text column.  AQE reorders/broadcasts when one term is rare.
    Overlapping matches count individually (standard positional
    semantics)."""
    terms = phrase.split()
    if not terms:
        raise ValueError("empty phrase")
    idx = index if index is not None else positional_index(docs, id_col=id_col, text_col=text_col)
    base = None
    for i, w in enumerate(terms):
        p = idx.filter(F.col("term") == w).select(
            "doc_id", (F.col("pos") - F.lit(i)).alias("start")
        )
        base = p if base is None else base.join(p, ["doc_id", "start"])
    return (
        base.filter(F.col("start") >= 0)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matches"),
            F.min("start").cast("long").alias("first_pos"),
        )
    )


def save_positional_index(
    index: DataFrame,
    path: str,
    *,
    n_term_buckets: int = 256,
) -> None:
    """Persist a positional index partitioned by a term-hash bucket so
    later phrase queries scan only their terms' buckets.

    Partitioning by raw term would create one directory per vocabulary
    word (millions at corpus scale — a filesystem DoS); a fixed-width
    hash bucket keeps the directory count constant while still letting
    Catalyst prune: ``read_positional_index(..., terms=...)`` filters on
    the same ``pmod(xxhash64(term), n)`` expression, which lands in the
    scan's PartitionFilters (asserted in tests) — a phrase query reads
    m buckets out of ``n_term_buckets``, not the corpus."""
    (
        index.withColumn(
            "term_bucket", F.pmod(F.xxhash64("term"), F.lit(int(n_term_buckets)))
        )
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(path)
    )


def read_positional_index(
    spark,
    path: str,
    *,
    terms: list[str] | None = None,
    n_term_buckets: int = 256,
) -> DataFrame:
    """Read a persisted positional index, pruned to ``terms`` when
    given: the term-bucket predicate prunes partitions (directory
    skip), the term predicate prunes row groups (parquet min/max).
    The result feeds ``phrase_search(..., index=...)`` unchanged."""
    df = spark.read.parquet(path)
    if terms:
        # bucket predicate as an OR of foldable equalities: ConstantFolding
        # collapses pmod(xxhash64(lit)) to a literal, so the disjunction
        # prunes partitions (PartitionFilters), while the term IN list
        # prunes row groups within the surviving buckets
        bucket_pred = None
        for t in terms:
            eq = F.col("term_bucket") == F.pmod(
                F.xxhash64(F.lit(t)), F.lit(int(n_term_buckets))
            )
            bucket_pred = eq if bucket_pred is None else (bucket_pred | eq)
        df = df.filter(bucket_pred & F.col("term").isin(list(terms)))
    return df.select("term", "doc_id", "pos")


def deletion_variants(
    col: "Column | str", *, max_len: int = 64, depth: int = 1
) -> "F.Column":
    """The SymSpell deletion neighborhood of a string: the string itself
    plus every variant obtained by deleting up to ``depth`` characters
    (distinct).  Keys longer than ``max_len`` contribute only themselves
    (bounding the fan-out; such keys are better handled by a coarser
    blocking key).

    Fan-out: depth 1 is len+1 variants per key; depth 2 is
    1 + len + len*(len-1)/2 (~len^2/2 — e.g. ~2.1k variants for a
    64-char key), the documented cost of the distance-2 guarantee.
    The whole neighborhood is built by JVM-side higher-order functions
    over one row — no shuffle, no Python."""
    if depth not in (1, 2):
        raise ValueError(f"depth must be 1 or 2, got {depth}")
    c = F.col(col) if isinstance(col, str) else col
    ln = F.least(F.length(c), F.lit(int(max_len)))
    dels = F.transform(
        F.sequence(F.lit(1), ln),
        lambda i: F.concat(
            F.substring(c, 1, (i - 1).cast("int")),
            F.substr(c, (i + 1).cast("int")),
        ),
    )
    out = F.concat(F.array(c), dels)
    if depth == 2:
        # delete positions i < j = i+1+k: keep [1, i-1], (i, j), [j+1, end];
        # guarded because sequence(a, b) DESCENDS when a > b — strings
        # shorter than 2 chars have no 2-deletion variants
        dels2 = F.flatten(
            F.transform(
                F.sequence(F.lit(1), ln - 1),
                lambda i: F.transform(
                    F.sequence(F.lit(0), ln - i - 1),
                    lambda k: F.concat(
                        F.substring(c, 1, (i - 1).cast("int")),
                        F.substring(c, (i + 1).cast("int"), k.cast("int")),
                        F.substr(c, (i + k + 2).cast("int")),
                    ),
                ),
            )
        )
        out = F.concat(
            out,
            F.when(ln >= 2, dels2).otherwise(F.array().cast("array<string>")),
        )
    return F.array_distinct(out)


def fuzzy_key_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    max_dist: int = 1,
) -> DataFrame:
    """Edit-distance-bounded equi-join via SymSpell deletion blocking:
    two keys within Levenshtein distance 1 ALWAYS share a member of
    each other's deletion neighborhood, so exploding both sides on
    their variants turns the fuzzy join into a plain hash join on the
    variant string, followed by an exact ``levenshtein`` verify — no
    cartesian product, no per-pair scan of either side.

    Output: distinct (left_key, right_key, dist) with dist <= max_dist.
    The deletion blocking is COMPLETE for max_dist <= 2 (the SymSpell
    guarantee: any <=d-op edit script between two keys leaves a common
    member in both depth-d deletion neighborhoods); for max_dist >= 3
    the call routes to ``passjoin_fuzzy_key_join`` (segment-pigeonhole
    blocking, complete for any radius) — one entry point, the right
    plan per radius.

    Scale shape: fan-out is len+1 variants per key at distance 1 and
    ~len^2/2 at distance 2 (both bounded by ``deletion_variants``'s
    max_len); the join is keyed on the variant so it shuffles
    variant-sized relations once, and the verify runs only on blocked
    candidates."""
    if int(max_dist) > 2:
        return passjoin_fuzzy_key_join(
            left, right, left_key=left_key, right_key=right_key,
            max_dist=int(max_dist),
        )
    depth = max(1, min(int(max_dist), 2))
    lv = left.select(F.col(left_key).alias("__lk")).distinct().select(
        "__lk", F.explode(deletion_variants("__lk", depth=depth)).alias("__v")
    )
    rv = right.select(F.col(right_key).alias("__rk")).distinct().select(
        "__rk", F.explode(deletion_variants("__rk", depth=depth)).alias("__v")
    )
    cand = lv.join(rv, "__v").select("__lk", "__rk").distinct()
    dist = F.levenshtein(F.col("__lk"), F.col("__rk"))
    out_right = right_key if right_key != left_key else f"{right_key}_right"
    return (
        cand.withColumn("dist", dist)
        .filter(F.col("dist") <= int(max_dist))
        .select(
            F.col("__lk").alias(left_key),
            F.col("__rk").alias(out_right),
            F.col("dist").cast("int").alias("dist"),
        )
    )


def update_positional_index(
    spark,
    path: str,
    changed_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_term_buckets: int = 256,
) -> None:
    """Upsert changed/new documents into a persisted positional index:
    existing postings of the changed ids are dropped (anti-join) and
    the re-tokenized postings appended — the maintenance path that
    keeps a standing index consistent with a mutating corpus without
    rebuilding it.

    A changed document's terms hash across MANY buckets, so per-bucket
    dynamic overwrite would touch most of the layout anyway; the
    honest implementation rewrites the index with the merged relation
    (localCheckpoint-pinned before overwriting the files it was read
    from — the streaming-upsert retry hazard).  At 100 TB scale,
    partition the index additionally by ingest epoch and rewrite only
    the affected epochs; the anti-join shape is unchanged."""
    new_idx = positional_index(changed_docs, id_col=id_col, text_col=text_col)
    try:
        existing = read_positional_index(spark, path, n_term_buckets=n_term_buckets)
        ids = changed_docs.select(F.col(id_col).alias("doc_id")).distinct()
        kept = existing.join(F.broadcast(ids), "doc_id", "left_anti")
        merged = kept.unionByName(new_idx)
    except Exception:
        merged = new_idx
    merged = merged.localCheckpoint(eager=True)
    save_positional_index(merged, path, n_term_buckets=n_term_buckets)


def rbo_overlap(
    run_a: DataFrame,
    run_b: DataFrame,
    *,
    k: int,
    p: float = 0.9,
    query_col: str = "query_id",
    item_col: str = "item_id",
    rank_col: str = "rank",
    quantize_bits: int = 20,
) -> DataFrame:
    """Rank-biased overlap (Webber et al., TOIS 2010) between two
    rankings, truncated at depth ``k`` — THE ranking-agreement metric
    for top-weighted lists: RBO@k = (1-p) * sum_{d=1..k} p^(d-1) *
    |A_d ∩ B_d| / d, where A_d/B_d are the depth-d prefixes.  The
    standard use here: quantify how much an ANN/compressed ranking
    (ivf_topk, int8_topk, truncated_topk) agrees with the exact one,
    weighting rank-1 disagreements hardest — recall@k (q117) treats
    all k positions equally and misses exactly that.

    Distributed closed form: an item matched in both runs at ranks
    (ra, rb) enters every prefix overlap from depth m = max(ra, rb)
    onward, so its total contribution is W(m) = sum_{d=m..k}
    (1-p) p^(d-1) / d — a k-entry weight table computed ONCE
    driver-side, floor-quantized to 2^-``quantize_bits`` (the repo's
    dyadic convention: per-query sums are integer-exact in any fold
    order, and an external SQL engine replays the same integer
    literals).  One equi-join on (query, item) + one groupBy; queries
    with zero overlap report rbo 0.0.

    Output: (query_col, n_common, rbo) — rbo in [0, 1], quantized;
    n_common = |A_k ∩ B_k|.
    """
    import math

    kk = int(k)
    pp = float(p)
    if not (0.0 < pp < 1.0):
        raise ValueError(f"p must be in (0, 1), got {pp}")
    if kk < 1:
        raise ValueError(f"k must be >= 1, got {kk}")
    scale = float(2 ** int(quantize_bits))
    # W(m) = sum_{d=m..k} (1-p) p^(d-1) / d, quantized to integers
    wq = []
    for m in range(1, kk + 1):
        w = sum((1.0 - pp) * pp ** (d - 1) / d for d in range(m, kk + 1))
        wq.append(int(math.floor(w * scale)))

    a = run_a.select(
        F.col(query_col).alias("q"),
        F.col(item_col).alias("it"),
        F.col(rank_col).cast("int").alias("ra"),
    ).filter(F.col("ra") <= kk)
    b = run_b.select(
        F.col(query_col).alias("q"),
        F.col(item_col).alias("it"),
        F.col(rank_col).cast("int").alias("rb"),
    ).filter(F.col("rb") <= kk)
    matches = a.join(b, ["q", "it"]).select(
        "q",
        F.element_at(
            F.array(*[F.lit(w) for w in wq]),
            F.greatest("ra", "rb"),
        ).alias("wq"),
    )
    per_q = matches.groupBy("q").agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.sum("wq").cast("long").alias("__s"),
    )
    all_q = run_a.select(F.col(query_col).alias("q")).unionByName(
        run_b.select(F.col(query_col).alias("q"))
    ).distinct()
    return (
        all_q.join(per_q, "q", "left")
        .select(
            F.col("q").alias(query_col),
            F.coalesce(F.col("n_common"), F.lit(0)).alias("n_common"),
            (
                F.coalesce(F.col("__s"), F.lit(0)).cast("double") / F.lit(scale)
            ).alias("rbo"),
        )
    )


def _passjoin_probe_variants(c: "Column", tau: int) -> "F.Column":
    """All (seg_idx, substring, partner_len) probes a LEFT key must emit
    to meet every possible partner under the PassJoin scheme: for each
    admissible partner length Lp (|len-Lp| <= tau, Lp >= tau+1 so every
    partner segment is non-empty), for each of the tau+1 segments of a
    length-Lp string, every substring of the left key with that
    segment's length starting within +-tau of the segment's position.
    Fan-out is bounded: (2tau+1) lengths x (tau+1) segments x
    <=(2tau+1) positions — ~200 probes at tau=3, all built by JVM
    higher-order functions on one row."""
    n = tau + 1
    L = F.length(c)

    def seg_geom(lp, i):
        k = F.floor(lp / F.lit(n)).cast("int")
        rem = (lp % F.lit(n)).cast("int")
        start = (i * k + F.greatest(F.lit(0), i - (F.lit(n) - rem))).cast("int")
        slen = (k + F.when(i >= F.lit(n) - rem, F.lit(1)).otherwise(F.lit(0))).cast(
            "int"
        )
        return start, slen

    def probes_for(lp):
        def per_seg(i):
            start, slen = seg_geom(lp, i)
            pmin = F.greatest(F.lit(0), start - F.lit(tau))
            pmax = F.least(L - slen, start + F.lit(tau))
            return F.when(
                (pmax >= pmin) & (slen > 0),
                F.transform(
                    F.sequence(pmin, pmax),
                    lambda p: F.struct(
                        i.cast("int").alias("si"),
                        F.substring(c, (p + 1).cast("int"), slen).alias("seg"),
                        lp.cast("int").alias("lr"),
                    ),
                ),
            ).otherwise(
                F.array().cast("array<struct<si:int,seg:string,lr:int>>")
            )

        return F.flatten(
            F.transform(F.sequence(F.lit(0), F.lit(tau)), per_seg)
        )

    lo = F.greatest(L - F.lit(tau), F.lit(n))
    hi = L + F.lit(tau)
    return F.when(
        hi >= lo,
        F.flatten(F.transform(F.sequence(lo, hi), probes_for)),
    ).otherwise(F.array().cast("array<struct<si:int,seg:string,lr:int>>"))


def _passjoin_segment_variants(c: "Column", tau: int) -> "F.Column":
    """The tau+1 (seg_idx, segment, own_len) blocks of a RIGHT key under
    the even PassJoin partition (first segments floor-length, last ones
    +1).  Only valid for len >= tau+1 (caller routes shorter keys to
    the short-key path)."""
    n = tau + 1
    L = F.length(c)
    k = F.floor(L / F.lit(n)).cast("int")
    rem = (L % F.lit(n)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.lit(tau)),
        lambda i: F.struct(
            i.cast("int").alias("si"),
            F.substring(
                c,
                (i * k + F.greatest(F.lit(0), i - (F.lit(n) - rem)) + 1).cast("int"),
                (k + F.when(i >= F.lit(n) - rem, F.lit(1)).otherwise(F.lit(0))).cast(
                    "int"
                ),
            ).alias("seg"),
            L.cast("int").alias("lr"),
        ),
    )


def passjoin_fuzzy_key_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    max_dist: int,
) -> DataFrame:
    """Exact edit-distance join for ANY radius via PassJoin segment
    blocking (Li, Deng, Wang & Feng, "PASS-JOIN: a partition-based
    method for similarity joins", VLDB 2011): partition each right key
    into ``max_dist``+1 even segments — tau edits cannot touch all
    tau+1 segments (pigeonhole), so an ed<=tau partner contains at
    least one segment EXACTLY, at a position within +-tau of its home
    and at a length within +-tau — an equi-join on
    (segment_index, segment, right_len), then an exact ``levenshtein``
    verify.  This removes the SymSpell depth<=2 ceiling: deletion
    neighborhoods grow ~len^tau while PassJoin probes grow only
    (2tau+1)^2(tau+1).

    Right keys shorter than tau+1 characters have empty segments and
    route through a separate bounded block (they can only pair with
    left keys of length <= 2*tau — both classes are tiny for real key
    joins; degenerate corpora of all-short keys degrade to the
    cross-verify this block is, which is also the information floor).

    Output: distinct (left_key, right_key, dist), dist <= max_dist.
    """
    tau = int(max_dist)
    if tau < 1:
        raise ValueError(f"max_dist must be >= 1, got {tau}")

    lkeys = left.select(F.col(left_key).alias("__lk")).distinct()
    rkeys = right.select(F.col(right_key).alias("__rk")).distinct()

    # The probe explode multiplies per-row work ~(2tau+1)^2(tau+1)x and
    # the levenshtein verify pipelines in the same stage; AQE coalesces
    # the tiny distinct by BYTES and would run all of it on 1-2 cores
    # (guide §2.5) — re-spread compute-aware before the Generate.
    from patternly_spark.plans import fanout_respread

    probe_fanout = (2 * tau + 1) * (2 * tau + 1) * (tau + 1)
    lspread = fanout_respread(lkeys, probe_fanout)

    r_long = rkeys.filter(F.length("__rk") >= tau + 1)
    probes = lspread.select(
        "__lk", F.explode(_passjoin_probe_variants(F.col("__lk"), tau)).alias("__p")
    ).select("__lk", "__p.si", "__p.seg", "__p.lr")
    blocks = r_long.select(
        "__rk",
        F.explode(_passjoin_segment_variants(F.col("__rk"), tau)).alias("__b"),
    ).select("__rk", "__b.si", "__b.seg", "__b.lr")
    # Build side pinned to the segment blocks (tau+1 variants/key vs
    # ~(2tau+1)^2(tau+1) probe variants): left alone, AQE sees two
    # small exchanges and may broadcast the FATTER probe side, which
    # re-serializes the explode+verify pipeline onto the blocks side's
    # 1-2 AQE-coalesced partitions — exactly what the respread above
    # exists to prevent (guide §3.1: pick the build side deliberately).
    cand_long = probes.join(
        F.broadcast(blocks), ["si", "seg", "lr"]
    ).select("__lk", "__rk")

    r_short = rkeys.filter(F.length("__rk") <= tau)
    l_short = lkeys.filter(F.length("__lk") <= 2 * tau)
    cand_short = l_short.crossJoin(F.broadcast(r_short))

    cand = cand_long.unionByName(cand_short).distinct()
    dist = F.levenshtein(F.col("__lk"), F.col("__rk"))
    out_right = right_key if right_key != left_key else f"{right_key}_right"
    return (
        cand.withColumn("dist", dist)
        .filter(F.col("dist") <= tau)
        .select(
            F.col("__lk").alias(left_key),
            F.col("__rk").alias(out_right),
            F.col("dist").cast("int").alias("dist"),
        )
    )
