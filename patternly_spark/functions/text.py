"""Text analytics for large-scale training-data pipelines.

All functions are pure Spark column expressions (JVM-side, whole-stage
codegen, no Python in the hot path) so they survive a 100 TB scan: a
document row is processed entirely within its partition — no shuffle.

Functions: token counting, quality scoring, language-ID heuristic,
document fingerprinting, shingling (the substrate for MinHash dedup).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# small function-word marker sets for the language-ID heuristic
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (split on runs of whitespace)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(text: Column | str) -> Column:
    """Number of whitespace-separated tokens.  Expressed with length
    arithmetic so it is engine-portable bit-for-bit (SQL oracle uses the
    identical formula)."""
    c = F.col(text) if isinstance(text, str) else text
    return (F.length(c) - F.length(F.replace(c, F.lit(" "), F.lit(""))) + 1).cast("int")


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_ish_token_count(text: Column | str, pattern: str = BPE_ISH_PATTERN) -> Column:
    """BPE-flavored token count: letter runs, single digits, and single
    punctuation marks each count as one token (the GPT-2 pre-tokenizer
    shape, minus lookaheads so the pattern runs identically on Java
    regex and RE2 — an external SQL oracle reproduces it exactly)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0))).cast("int")


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def type_token_ratio(text: Column | str) -> Column:
    """Lexical diversity: distinct tokens / tokens (quality signal)."""
    return distinct_token_count(text).cast("double") / token_count(text).cast("double")


def stopword_count(text: Column | str, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or _LANG_MARKERS["en"]
    toks = tokens(text)
    arr = F.array(*[F.lit(w) for w in sw])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def quality_score(text: Column | str) -> Column:
    """Composite quality heuristic in [0, ~1]: mean token length band +
    lexical diversity + stopword presence.  Deterministic, portable."""
    c = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(c).cast("double")
    mean_len = F.length(c).cast("double") / n_tok
    len_ok = F.when((mean_len >= 3.0) & (mean_len <= 12.0), F.lit(0.4)).otherwise(F.lit(0.0))
    diversity = F.least(type_token_ratio(c), F.lit(1.0)) * 0.3
    has_sw = F.when(stopword_count(c) > 0, F.lit(0.3)).otherwise(F.lit(0.0))
    return len_ok + diversity + has_sw


def langid(text: Column | str) -> Column:
    """Marker-token language-ID heuristic: the language whose function
    words occur most often; 'und' (undetermined) when no marker hits.
    Ties break by language code order (deterministic)."""
    toks = tokens(text)
    scores = []
    for lang in sorted(_LANG_MARKERS):
        arr = F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # max by (hits, reversed-lang) so higher hits win; equal hits -> first code
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column | str, n_chars: int = 16) -> Column:
    """Content fingerprint: md5 of the whitespace-normalized document,
    truncated.  Engine-portable (md5 hex is identical everywhere); the
    normalization makes it robust to spacing variants."""
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.concat_ws(" ", F.split(F.lower(F.trim(c)), r"\s+"))
    return F.substring(F.md5(normalized), 1, n_chars)


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """n-token shingles (distinct) from an already-materialized token
    array column.  ``toks`` MUST be a bound column (not the raw
    ``tokens(text)`` expression): it is referenced n+2 times here, which
    keeps CollapseProject from re-inlining the split into every
    element_at — inlined, the tokenizer re-runs per shingle element
    (measured 7x slower at sf0.1).  Use ``with_shingles`` for the
    correctly-staged DataFrame form."""
    if n == 1:
        return F.array_distinct(toks)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(sh)).otherwise(F.array(F.concat_ws(" ", toks)))


def with_shingles(df, text_col: str, n: int = 3, out_col: str = "shingles"):
    """df + (out_col array<string>): tokens materialized as a real column
    first so the tokenizer runs exactly once per row."""
    return (
        df.withColumn("__toks", tokens(text_col))
        .withColumn(out_col, shingles_from_tokens(F.col("__toks"), n))
        .drop("__toks")
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """n-token shingles as an array<string> (distinct).  Pure array
    expressions: transform over an index sequence — no explode, no
    shuffle.  NOTE: inline form; in a projection pipeline prefer
    ``with_shingles`` (tokenizer evaluated once, see
    shingles_from_tokens)."""
    return shingles_from_tokens(tokens(text), n)


def winnow_fingerprints(
    text: Column | str,
    *,
    kgram: int = 5,
    window: int = 4,
) -> Column:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    hash every k-gram of tokens, then keep the minimum hash of each
    sliding window of ``window`` consecutive k-gram hashes.  Robust to
    local edits: two documents sharing a long-enough run of tokens share
    a fingerprint.

    Output: sorted distinct array<bigint>.

    Implementation is an Arrow-batched pandas UDF, NOT a column-expression
    pipeline: a higher-order-function lambda re-evaluates its non-lambda
    subexpressions per array element (CollapseProject re-inlines aliases
    referenced once), so the expression form of "min over each sliding
    window of the k-gram hash array" degenerates to O(n_grams^2) md5
    evaluations per document (~75 s at sf0.01 vs ~1 s for the UDF).  The
    UDF is still a narrow map — zero shuffle at any corpus scale — and
    reproduces the portable md5-word hash bit-for-bit (the DuckDB oracle
    _winnow_candidates_oracle hash-matches it); candidate pairs then come
    from one explode + equi-join on the fingerprint key.
    """
    import hashlib
    import re

    import numpy as np
    from numpy.lib.stride_tricks import sliding_window_view
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.LongType()))
    def _winnow(texts: pd.Series) -> pd.Series:
        out = []
        for s in texts:
            # .strip(' ') / re.split(r'\s+') mirror Spark trim()/split()
            # exactly, including leading-empty-token behavior
            toks = re.split(r"\s+", (s or "").strip(" "))
            if len(toks) >= kgram:
                grams = [" ".join(toks[i : i + kgram]) for i in range(len(toks) - kgram + 1)]
            else:
                grams = [" ".join(toks)]
            h = np.fromiter(
                (int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16) for g in grams),
                dtype=np.int64,
                count=len(grams),
            )
            if len(h) >= window:
                mins = sliding_window_view(h, window).min(axis=1)
            else:
                mins = h.min(keepdims=True)
            out.append(np.unique(mins).tolist())
        return pd.Series(out)

    c = F.col(text) if isinstance(text, str) else text
    return _winnow(c)


def fingerprint_candidate_pairs(
    docs,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    kgram: int = 5,
    window: int = 4,
):
    """Near-dup candidates: documents sharing >= 1 winnowing fingerprint,
    with the share count.  explode -> one shuffle into per-fingerprint id
    sets -> pair emission (collect-then-emit: evaluates the fingerprint
    UDF once, where a self-join would run it twice; shuffle bounded by
    total fingerprint count, never N^2)."""
    from patternly_spark.operators.dedup import _pairs_in_buckets

    fp = docs.select(
        F.col(id_col),
        F.explode_outer(winnow_fingerprints(text_col, kgram=kgram, window=window)).alias("fp"),
    )
    return (
        _pairs_in_buckets(fp, ["fp"], id_col)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fingerprints"))
    )


def containment_pairs(
    docs,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    kgram: int = 5,
    window: int = 4,
    min_containment: float = 0.0,
):
    """Near-containment detection (is document A substantially contained
    in document B?) via winnowing-fingerprint overlap: for every pair
    sharing >= 1 fingerprint, containment(A in B) = |FP(A) cap FP(B)| /
    |FP(A)| (Broder 1997's containment coefficient on the winnowed
    sketch).  Catches quote-inclusion / boilerplate-wrapping cases that
    symmetric Jaccard under-scores.

    Output: (doc_a, doc_b, shared_fingerprints, n_fp_a, n_fp_b,
    containment_a_in_b, containment_b_in_a), doc_a < doc_b, filtered to
    max(containments) >= min_containment.

    Plan: the winnow UDF runs ONCE — the per-doc fingerprint count rides
    through the bucket pairing inside the id struct (ids are unique, so
    struct ordering == id ordering), avoiding a second corpus scan +
    count join.  One shuffle into fingerprint buckets, one pair groupBy.
    """
    from patternly_spark.operators.dedup import _pairs_in_buckets

    sel = docs.select(
        F.col(id_col),
        winnow_fingerprints(text_col, kgram=kgram, window=window).alias("fps"),
    )
    fp = sel.select(
        F.struct(F.col(id_col).alias("id"), F.size("fps").alias("n")).alias("idn"),
        F.explode("fps").alias("fp"),
    )
    shared = F.col("shared_fingerprints").cast("double")
    out = (
        _pairs_in_buckets(fp, ["fp"], "idn")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fingerprints"))
        .select(
            F.col("doc_a.id").alias("doc_a"),
            F.col("doc_b.id").alias("doc_b"),
            "shared_fingerprints",
            F.col("doc_a.n").cast("long").alias("n_fp_a"),
            F.col("doc_b.n").cast("long").alias("n_fp_b"),
            (shared / F.col("doc_a.n")).alias("containment_a_in_b"),
            (shared / F.col("doc_b.n")).alias("containment_b_in_a"),
        )
    )
    if min_containment > 0.0:
        out = out.filter(
            F.greatest("containment_a_in_b", "containment_b_in_a") >= min_containment
        )
    return out


def shingle_hash(shingle: Column) -> Column:
    """Portable 32-bit hash of a shingle: first 8 hex chars of md5 as an
    integer.  Matches DuckDB's ('0x' || substr(md5(s),1,8))::BIGINT."""
    return F.conv(F.substring(F.md5(shingle), 1, 8), 16, 10).cast("long")


def repeated_ngram_fraction(toks: Column, n: int = 3) -> Column:
    """Gopher-style repetition signal: the fraction of n-gram occurrences
    that are repeats, 1 - distinct/total (0.0 for docs shorter than n
    tokens).  High values flag boilerplate/spam for quality filtering.

    ``toks`` must be a bound token-array column (same CollapseProject
    caution as ``shingles_from_tokens``)."""
    if n == 1:
        sh = toks
    else:
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
        sh = F.transform(
            idx,
            lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]),
        )
        sh = F.when(F.size(toks) >= n, sh).otherwise(F.array())
    total = F.size(sh)
    distinct = F.size(F.array_distinct(sh))
    return F.when(
        total > 0, (total - distinct).cast("double") / total.cast("double")
    ).otherwise(F.lit(0.0))


# ---------------------------------------------------------------------------
# rule-based quality suites (Gopher / C4 heuristics, public rule sets)
# ---------------------------------------------------------------------------

# the high-frequency English function words Gopher's "stop word" rule keys
# on (Rae et al. 2021, appendix A1.1)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    df,
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    stopwords: list[str] | None = None,
):
    """Gopher-style document-quality rule suite (Rae et al. 2021 §A1.1),
    one boolean column per rule plus the conjunction ``keep``.

    Pure per-row JVM column expressions — a 100 TB quality pass is a
    single scan+project, no shuffle, filters pushable past it.  Every
    ratio is an integer-exact count divided as double, so an external
    SQL oracle reproduces each flag bit-for-bit.
    """
    c = F.col(text_col)
    toks = tokens(c)
    n_words = F.size(toks)
    sum_word_len = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    mean_word_len = sum_word_len.cast("double") / n_words.cast("double")

    hash_chars = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    ellipsis_runs = (F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))) / 3
    symbol_ratio = (hash_chars + ellipsis_runs).cast("double") / n_words.cast("double")

    lines = F.split(c, "\n")
    n_lines = F.size(lines)
    bullet_lines = F.size(
        F.filter(lines, lambda l: l.startswith("-") | l.startswith("*") | l.startswith("•"))
    )
    ellipsis_lines = F.size(F.filter(lines, lambda l: l.endswith("...") | l.endswith("…")))
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))

    sw = stopwords or GOPHER_STOPWORDS
    sw_hits = F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in sw])))

    rules = {
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_mean_word_len": (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len),
        "ok_symbol_ratio": symbol_ratio <= max_symbol_word_ratio,
        "ok_bullet_lines": bullet_lines.cast("double") / n_lines.cast("double")
        <= max_bullet_line_frac,
        "ok_ellipsis_lines": ellipsis_lines.cast("double") / n_lines.cast("double")
        <= max_ellipsis_line_frac,
        "ok_alpha_words": alpha_words.cast("double") / n_words.cast("double")
        >= min_alpha_word_frac,
        "ok_stopwords": sw_hits >= min_stopword_hits,
    }
    out = df
    for name, col in rules.items():
        out = out.withColumn(name, col)
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else (keep & F.col(name))
    return out.withColumn("keep", keep)


def html_to_text(text: Column | str) -> Column:
    """HTML -> visible text: drop script/style blocks, strip tags,
    decode the common entities, collapse whitespace — the extraction
    step in front of every web-crawl curation pipeline.

    Engine-portable by construction: only RE2-compatible regexes (no
    backreferences — script and style get separate patterns; inline
    (?is) flags; non-greedy block bodies), so an external SQL engine
    replays the extraction bit-for-bit (q105).  Entity decode order
    matters: ``&amp;`` is decoded LAST so ``&amp;lt;`` yields the
    literal text ``&lt;`` (double-decode would corrupt it).  Pure
    column expressions, zero shuffle.  This is tag stripping, not
    readability scoring — boilerplate removal composes downstream
    (``gopher_repetition_flags`` catches template repetition)."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def _word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams (WITH repeats — repetition metrics need
    multiplicity, unlike ``shingles_from_tokens``); empty array for docs
    shorter than n tokens."""
    if n == 1:
        return toks
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def _top_run_chars(sorted_arr: Column) -> Column:
    """chars covered by the MODAL element of a SORTED array (max
    run-length x that element's length; count ties keep the
    lexicographically smallest element — strict-greater update over the
    sorted order).  One linear fold, no map state."""
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best_run"),
        F.lit(0).alias("best_chars"),
    )
    def step(st, x):
        run = F.when(x == st["prev"], st["run"] + 1).otherwise(F.lit(1))
        better = run > st["best_run"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(st["best_run"]).alias("best_run"),
            F.when(better, run * F.length(x)).otherwise(st["best_chars"]).alias("best_chars"),
        )
    return F.aggregate(sorted_arr, init, step, lambda st: st["best_chars"])


def _dup_run_chars(sorted_arr: Column) -> Column:
    """chars covered by ALL occurrences of elements appearing more than
    once in a SORTED array (count x length summed per duplicated
    element): one linear fold — on the 2nd occurrence both the 1st and
    2nd contribute, each later occurrence adds itself."""
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(1).alias("run"),
        F.lit(0).alias("acc"),
    )
    def step(st, x):
        cont = x == st["prev"]
        run = F.when(cont, st["run"] + 1).otherwise(F.lit(1))
        add = F.when(
            cont,
            F.when(st["run"] == 1, F.length(x) * 2).otherwise(F.length(x)),
        ).otherwise(F.lit(0))
        return F.struct(x.alias("prev"), run.alias("run"), (st["acc"] + add).alias("acc"))
    return F.aggregate(sorted_arr, init, step, lambda st: st["acc"])


def gopher_repetition_flags(
    df,
    text_col: str = "text",
    *,
    max_dup_line_frac: float = 0.30,
    max_dup_para_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_dup_para_char_frac: float = 0.20,
    max_top_ngram_char_frac: dict[int, float] | None = None,
    max_dup_ngram_char_frac: dict[int, float] | None = None,
):
    """Gopher repetition-removal suite (Rae et al. 2021 §A1.1 Table A2):
    the boilerplate/spam filters ``gopher_quality_flags`` doesn't cover.

    Per document:
    - ``dup_line_frac`` / ``dup_para_frac``: fraction of non-empty lines
      (paragraphs = blank-line-separated blocks) that are repeats of an
      earlier one, (total - distinct) / total.
    - ``dup_line_char_frac`` / ``dup_para_char_frac``: fraction of text
      characters inside duplicated lines/paragraphs (count x length per
      duplicated element / total text length).
    - ``top_{n}gram_char_frac`` (default n = 2, 3, 4): characters covered
      by all occurrences of the single most frequent word n-gram /
      total text length.
    - ``dup_{n}gram_char_frac`` (default n = 5..10): characters covered
      by all occurrences of every word n-gram appearing more than once /
      total text length.  Occurrence char masses are summed (overlapping
      occurrences counted per occurrence) — the standard published
      approximation; gram length counts the single joining spaces.
    Plus one ``ok_*`` boolean per metric at the Table A2 thresholds and
    the conjunction ``keep_repetition``.

    Scale shape: every metric is a per-row array fold over sorted
    line/gram arrays — pure JVM expressions, ZERO shuffle at any corpus
    size, pushed-filter-compatible.  Per-row cost is O(tokens log tokens)
    per n (the array_sort); chop pathological documents upstream
    (``chunk_documents``) as with every per-row text pass.
    """
    top_ns = max_top_ngram_char_frac or {2: 0.20, 3: 0.18, 4: 0.16}
    dup_ns = max_dup_ngram_char_frac or {
        5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10
    }
    # bind the text column once: the 13 metrics reference it dozens of
    # times, and a caller passing a deep derived expression (e.g.
    # html_to_text -> normalize_text) must not have that chain re-analyzed
    # per reference (the shingles_from_tokens staging rule)
    df = df.withColumn("__rep_text", F.col(text_col))
    c = F.col("__rep_text")
    total_chars = F.length(c).cast("double")

    def frac(num):
        # capped at 1.0: overlapping gram occurrences are summed (the
        # published approximation), which can overshoot the text length
        return F.when(
            total_chars > 0,
            F.least(num.cast("double") / total_chars, F.lit(1.0)),
        ).otherwise(F.lit(0.0))

    out = df.withColumn("__toks", tokens(c))
    metrics: dict[str, Column] = {}
    for unit, splitter in (("line", "\n"), ("para", "\n\n+")):
        arr = F.array_sort(
            F.filter(F.split(c, splitter), lambda x: F.trim(x) != F.lit(""))
        )
        total = F.size(arr)
        distinct = F.size(F.array_distinct(arr))
        metrics[f"dup_{unit}_frac"] = F.when(
            total > 0, (total - distinct).cast("double") / total.cast("double")
        ).otherwise(F.lit(0.0))
        metrics[f"dup_{unit}_char_frac"] = frac(_dup_run_chars(arr))
    for n in sorted(top_ns):
        metrics[f"top_{n}gram_char_frac"] = frac(
            _top_run_chars(F.array_sort(_word_ngrams(F.col("__toks"), n)))
        )
    for n in sorted(dup_ns):
        metrics[f"dup_{n}gram_char_frac"] = frac(
            _dup_run_chars(F.array_sort(_word_ngrams(F.col("__toks"), n)))
        )

    for name, col in metrics.items():
        out = out.withColumn(name, col)
    thresholds = {
        "dup_line_frac": max_dup_line_frac,
        "dup_para_frac": max_dup_para_frac,
        "dup_line_char_frac": max_dup_line_char_frac,
        "dup_para_char_frac": max_dup_para_char_frac,
        **{f"top_{n}gram_char_frac": v for n, v in top_ns.items()},
        **{f"dup_{n}gram_char_frac": v for n, v in dup_ns.items()},
    }
    keep = None
    for name, thr in thresholds.items():
        flag = F.col(name) <= F.lit(float(thr))
        out = out.withColumn(f"ok_{name}", flag)
        keep = flag if keep is None else (keep & flag)
    return out.withColumn("keep_repetition", keep).drop("__toks", "__rep_text")


def c4_clean_lines(
    df,
    text_col: str = "text",
    *,
    min_words_per_line: int = 5,
    out_col: str = "clean_text",
):
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep only
    lines that end in terminal punctuation AND have at least
    ``min_words_per_line`` words; drop the whole document if it mentions
    "lorem ipsum" or contains a curly brace (code).  Adds ``out_col``
    (kept lines re-joined, NULL for dropped docs) and ``n_kept_lines``.

    Same zero-shuffle scan shape as ``gopher_quality_flags``."""
    c = F.col(text_col)
    lines = F.split(c, "\n")
    line_words = lambda l: F.size(F.split(F.trim(l), r"\s+"))  # noqa: E731
    kept = F.filter(
        lines,
        lambda l: (
            (l.endswith(".") | l.endswith("!") | l.endswith("?") | l.endswith('"'))
            & (line_words(l) >= min_words_per_line)
        ),
    )
    doc_ok = (~F.lower(c).contains("lorem ipsum")) & (~c.contains("{"))
    return df.withColumn(
        "n_kept_lines", F.when(doc_ok, F.size(kept)).otherwise(F.lit(0)).cast("int")
    ).withColumn(
        out_col,
        F.when(doc_ok & (F.size(kept) > 0), F.array_join(kept, "\n")).otherwise(F.lit(None)),
    )


def extract_links(text: Column | str) -> Column:
    """Every ``<a ... href="...">`` target in document order — the link
    harvest that turns a web crawl into a host graph (outlink counts,
    PageRank seeds, spam-hub detection) before any heavy parse.

    One RE2-compatible pattern (no alternation/backreference, greedy
    ``[^>]*`` only), so DuckDB's ``regexp_extract_all`` replays it
    bit-for-bit (q107).  Pure column expression, zero shuffle; compose
    with ``extract_domain`` for the host and ``html_to_text`` for the
    body."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(r'<a [^>]*href="([^"]*)"'), 1)


#: tracking params stripped by canonical_url, one alternation-free
#: regex pass each (branch-choice discipline differs between Java regex
#: and RE2, so no alternation — same rule as PII_PATTERNS)
TRACKING_PARAM_PATTERNS: tuple[str, ...] = (
    r"utm_[A-Za-z0-9_]*=[^&#]*",
    r"gclid=[^&#]*",
    r"fbclid=[^&#]*",
)


def canonical_url(url: Column | str) -> Column:
    """Crawl-dedup URL canonicalization: lowercase scheme+authority,
    drop default ports (http:80 / https:443), strip the fragment and
    the tracking params (``TRACKING_PARAM_PATTERNS``), collapse the
    separator debris that stripping leaves, and drop a bare trailing
    "/" path.  Strings without a ``scheme://`` prefix pass through
    trimmed — canonicalization must never invent structure.

    The same URL shared via email (``?utm_source=...``), ads
    (``gclid``), and socials (``fbclid``, ``#fragment``) collapses to
    ONE key — without this, URL-level dedup at crawl scale keeps every
    tracking variant as a distinct page.  Every pass is an
    alternation-free regex or CASE on extracted parts, so a SQL engine
    replays it byte-for-byte (q111).  Pure column expressions, zero
    shuffle."""
    c = F.trim(F.col(url) if isinstance(url, str) else url)
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.lower(F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    rest = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)", 1)
    auth = F.when(scheme == "http", F.regexp_replace(auth, r":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(auth, r":443$", "")).otherwise(auth)
    )
    rest = F.regexp_replace(rest, r"#.*", "")
    for pat in TRACKING_PARAM_PATTERNS:
        rest = F.regexp_replace(rest, pat, "")
    # stripping leaves "?&x", "&&", trailing "?"/"&": collapse in order
    rest = F.regexp_replace(rest, r"&&*", "&")
    rest = F.regexp_replace(rest, r"\?&", "?")
    rest = F.regexp_replace(rest, r"[?&]*$", "")
    rest = F.when(rest == "/", F.lit("")).otherwise(rest)
    return F.when(scheme == "", c).otherwise(F.concat(scheme, F.lit("://"), auth, rest))


def extract_domain(url: Column | str) -> Column:
    """Registrable host from a URL: the authority part after the scheme,
    up to the first '/' or space; empty string when no scheme matches.
    Pattern is alternation-free so Java regex and RE2 agree."""
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(c, r"https?://([^/ ]+)", 1)


# PII patterns chosen to behave identically under Java regex (Spark,
# leftmost-first backtracking) and RE2 (DuckDB, leftmost-longest): greedy
# quantifiers and optionals only — no alternation whose branch choice
# could differ between the two matching disciplines.  Conservative by
# design; precision over recall (a scrub pass at 100 TB should not
# mangle non-PII text).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\+\d{1,2}[ -]?\(?\d{3}\)?[ -]?\d{3}[ -]?\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_count(text: Column | str, kind: str) -> Column:
    """Number of non-overlapping matches of one PII pattern.  JVM
    regexp_count — zero shuffle, stays inside whole-stage codegen."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(PII_PATTERNS[kind])).cast("long")


def pii_scrub(text: Column | str, kinds: list[str] | None = None) -> Column:
    """Redact PII in-place: each match replaced by a typed token
    ("[EMAIL]", "[SSN]", ...).  Patterns apply in PII_PATTERNS order
    (email before ipv4, so a dotted hostname inside an address is
    consumed by the email rule first).  Pure sequential regexp_replace —
    one JVM scan, no Python, no shuffle."""
    c = F.col(text) if isinstance(text, str) else text
    for kind in kinds or list(PII_PATTERNS):
        c = F.regexp_replace(c, F.lit(PII_PATTERNS[kind]), F.lit(f"[{kind.upper()}]"))
    return c


def with_pii_scrubbed(df, text_col: str = "text", *, out_col: str = "scrubbed_text"):
    """df + per-kind match counts (``n_email`` ...) + ``out_col`` with
    every match replaced by its typed token.  A single zero-shuffle
    projection; the redaction and the counts share one pass over the
    column at the parquet-scan stage."""
    out = df
    for kind in PII_PATTERNS:
        out = out.withColumn(f"n_{kind}", pii_count(F.col(text_col), kind))
    return out.withColumn(out_col, pii_scrub(F.col(text_col)))


# --- Unicode compat folding (no ICU) -------------------------------------
# The NFKC-compat Latin/punctuation plane that actually breaks dedup keys,
# as a 1:1 translate table + a short 1:N replace chain.  Built from the
# published NFKC decompositions (fullwidth forms, compat spaces,
# ligatures, ellipsis) plus the quote/dash canonicalizations dedup wants
# beyond NFKC (curly quotes -> ASCII; NFKC leaves those untouched).
# Parity with Python's unicodedata.normalize("NFKC") on the NFKC-claimed
# subset is pinned in tests/test_text_functions.py.
_FOLD_QUOTES_1 = "\u2018\u2019\u201a\u201b\u2032\u2035"  # curly/low-9/prime singles -> '
_FOLD_QUOTES_2 = "\u201c\u201d\u201e\u201f\u2033\u2036"  # doubles -> "
_FOLD_DASHES = "\u2010\u2011\u2012\u2013\u2014\u2015\u2212"  # hyphens/dashes/minus -> -
# NBSP, en/em/figure/thin/hair spaces, narrow NBSP, math space, ideographic
_FOLD_SPACES = "\u00a0" + "".join(chr(0x2000 + i) for i in range(11)) + "\u202f\u205f\u3000"
_FOLD_FULLWIDTH_SRC = "".join(chr(0xFF01 + i) for i in range(94))  # -> ASCII !..~
_FOLD_FULLWIDTH_DST = "".join(chr(0x21 + i) for i in range(94))
_FOLD_DELETE = "\u200b\u200c\u200d\ufeff"  # zero-width: removed
FOLD_1TO1_SRC = (
    _FOLD_QUOTES_1 + _FOLD_QUOTES_2 + _FOLD_DASHES + _FOLD_SPACES
    + _FOLD_FULLWIDTH_SRC + _FOLD_DELETE
)
FOLD_1TO1_DST = (
    "'" * len(_FOLD_QUOTES_1) + '"' * len(_FOLD_QUOTES_2)
    + "-" * len(_FOLD_DASHES) + " " * len(_FOLD_SPACES)
    + _FOLD_FULLWIDTH_DST  # _FOLD_DELETE has no image: translate deletes
)
FOLD_MULTI: list[tuple[str, str]] = [
    ("\ufb00", "ff"), ("\ufb01", "fi"), ("\ufb02", "fl"),
    ("\ufb03", "ffi"), ("\ufb04", "ffl"), ("\ufb05", "st"), ("\ufb06", "st"),
    ("\u2026", "..."),
]

def unicode_compat_fold(text: Column | str) -> Column:
    """Fold NFKC-compat Latin/punctuation to ASCII without ICU: fullwidth
    forms, compat spaces, ligatures, ellipsis (true NFKC mappings), plus
    curly quotes/dashes -> ASCII (the dedup-key canonicalization NFKC
    itself doesn't do).  One ``translate`` + a short ``replace`` chain —
    pure column expressions, zero shuffle.  Full NFC composition of
    combining marks still needs ICU and stays a decoder responsibility.
    """
    c = F.col(text) if isinstance(text, str) else text
    c = F.translate(c, FOLD_1TO1_SRC, FOLD_1TO1_DST)
    for src, dst in FOLD_MULTI:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return c


def normalize_text(
    text: Column | str,
    *,
    lowercase: bool = True,
    strip_punct: bool = True,
    collapse_ws: bool = True,
    compat_fold: bool = True,
) -> Column:
    """Canonical text normalization ahead of hashing/dedup — the step
    that makes "Hello,  World!" and "hello world" collide in
    ``exact_dedup``/MinHash instead of surviving as distinct strings.

    Engine-portable pieces only (Java regex and RE2 agree on these
    character classes): Unicode compat folding (see
    ``unicode_compat_fold`` — fullwidth/ligature/space/quote/dash to
    ASCII, so "ﬁle" and "ＦＩＬＥ" collide with "file"), lowercase,
    strip everything outside [a-z0-9\\s] (after lowercasing), collapse
    whitespace runs to single spaces, trim.  Full NFC/NFKC of combining
    marks needs ICU — at scale run that in the ingest decoder, not the
    engine.  Pure column expressions, zero shuffle.
    """
    c = F.col(text) if isinstance(text, str) else text
    if compat_fold:
        c = unicode_compat_fold(c)
    if lowercase:
        c = F.lower(c)
    if strip_punct:
        c = F.regexp_replace(c, r"[^a-z0-9\s]", "")
    if collapse_ws:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def compression_ratio(text: Column | str, *, level: int = 6) -> Column:
    """zlib compressed-size / raw-size of the utf-8 text — the quality
    signal Gopher/ccnet-class pipelines use to catch machine-generated
    and template text: highly repetitive documents compress far below
    natural prose (ratio << ~0.4), while high-entropy noise stays near
    1.0.  Empty text maps to 1.0 (nothing to judge).

    Arrow-batched pandas UDF by necessity (zlib is not a Catalyst
    expression) — but a narrow map: zero shuffle at any corpus scale,
    same cost class as the winnowing UDF.  DEFLATE output is fully
    determined by (input, level, zlib version), so the score is
    reproducible across a cluster running one runtime image; treat
    cross-version comparisons as approximate (this is a heuristic
    signal, not a checksum — for checksums use
    ``operators/merge.dataset_fingerprint``)."""
    import zlib

    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.DoubleType())
    def _ratio(texts: pd.Series) -> pd.Series:
        out = []
        for s in texts:
            b = (s or "").encode("utf-8")
            if not b:
                out.append(1.0)
                continue
            out.append(len(zlib.compress(b, level)) / len(b))
        return pd.Series(out, dtype="float64")

    c = F.col(text) if isinstance(text, str) else text
    return _ratio(c)


def readability_counts(text: Column | str) -> Column:
    """Struct (n_words, n_sentences, n_syllables) via the three sentinel
    regexp collapses on ``lower(text)`` — each feature run is replaced by
    the single char 'A' (which cannot occur in lowered text) and counted
    with length arithmetic, so the identical formula replays in any RE2/
    Java-regex engine bit-for-bit:

    - words      = runs of non-whitespace ``[^\\s]+``
    - sentences  = runs of terminators ``[.!?]+``, clamped to >= 1 when
      the text has words (an unpunctuated document is one sentence)
    - syllables  = runs of vowels ``[aeiouy]+`` (the standard
      vowel-group heuristic; no silent-e subtraction — documented, and
      consistent between engines by construction)

    Pure map, zero shuffle.
    """
    c = F.col(text) if isinstance(text, str) else text
    lo = F.lower(c)

    def _runs(pat: str) -> Column:
        r = F.regexp_replace(lo, pat, "A")
        return (F.length(r) - F.length(F.replace(r, F.lit("A"), F.lit("")))).cast("int")

    n_words = _runs(r"[^\s]+")
    n_sent_raw = _runs(r"[.!?]+")
    n_sent = F.when(n_words > 0, F.greatest(n_sent_raw, F.lit(1))).otherwise(F.lit(0))
    return F.struct(
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        _runs(r"[aeiouy]+").alias("n_syllables"),
    )


def with_readability(df, text_col: str = "text"):
    """Flesch reading-ease and Flesch-Kincaid grade per document — the
    classic curation signal for prose complexity (a pretraining mix
    typically wants a band, not a tail, of reading ease):

        flesch   = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)
        fk_grade = 0.39*(words/sentences) + 11.8*(syllables/words) - 15.59

    Counts from :func:`readability_counts`; texts with zero words report
    NULL scores.  Integer counts + a fixed chain of IEEE double ops with
    literal constants — engine-exact (the SQL oracle spells the same
    constants via ``%.17e`` to dodge the DECIMAL-literal trap).  Zero
    shuffle: a 100 TB corpus scores in one scan.
    """
    out = df.withColumn("__rc", readability_counts(text_col))
    w = F.col("__rc.n_words").cast("double")
    s = F.col("__rc.n_sentences").cast("double")
    y = F.col("__rc.n_syllables").cast("double")
    wps = w / s
    spw = y / w
    has = F.col("__rc.n_words") > 0
    return (
        out.withColumn("n_words", F.col("__rc.n_words"))
        .withColumn("n_sentences", F.col("__rc.n_sentences"))
        .withColumn("n_syllables", F.col("__rc.n_syllables"))
        .withColumn(
            "flesch",
            F.when(
                has,
                F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw,
            ),
        )
        .withColumn(
            "fk_grade",
            F.when(
                has,
                F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59),
            ),
        )
        .drop("__rc")
    )
