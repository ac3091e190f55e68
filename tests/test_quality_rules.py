"""Gopher rule-suite and C4 line-cleaning semantics on crafted docs."""

import pytest
from pyspark.sql import functions as F

from patternly_spark.functions.text import c4_clean_lines, gopher_quality_flags

GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs off with "
    "great speed because that is what foxes have always done in stories "
    "told over many generations of people who have time to tell them "
    "again and again until everyone knows them well enough to repeat them"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, GOOD),                                        # passes all rules
        (1, "too short to keep"),                         # word count
        (2, " ".join(["a"] * 60)),                        # mean word len < 3
        (3, GOOD + " " + "#" * 40),                       # symbol ratio
        (4, "\n".join(["- item one here"] * 10)),         # bullet lines
        (5, "\n".join([GOOD, "to be continued...", "more coming...", "end..."])),  # ellipsis
        (6, GOOD.replace("fox", "12345")),                # still alpha-heavy: keeps
        (7, " ".join(["123 456 789"] * 30)),              # alpha-word frac = 0
        (8, " ".join(["zig zag zip"] * 30)),              # no stopwords
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_rules_fire_individually(spark, docs):
    out = {r["doc_id"]: r.asDict() for r in gopher_quality_flags(docs).collect()}
    assert out[0]["keep"] is True
    assert out[1]["ok_word_count"] is False
    assert out[2]["ok_mean_word_len"] is False
    assert out[3]["ok_symbol_ratio"] is False
    assert out[4]["ok_bullet_lines"] is False
    assert out[5]["ok_ellipsis_lines"] is False
    assert out[7]["ok_alpha_words"] is False
    assert out[8]["ok_stopwords"] is False
    # each failing doc is dropped
    for d in (1, 2, 3, 4, 5, 7, 8):
        assert out[d]["keep"] is False, d


def test_gopher_custom_thresholds(spark, docs):
    loose = gopher_quality_flags(docs, min_words=2, min_stopword_hits=0,
                                 min_mean_word_len=0.0, min_alpha_word_frac=0.0)
    kept = {r["doc_id"] for r in loose.filter("keep").collect()}
    assert 1 in kept and 2 in kept and 7 in kept


def test_gopher_plan_is_zero_shuffle(spark, docs):
    out = gopher_quality_flags(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_c4_clean_lines(spark):
    rows = [
        (0, "This is a proper sentence with enough words.\nshort.\nno terminal punct here at all\nAnother good long sentence ends right here!"),
        (1, "contains lorem ipsum so the whole doc dies. with many words here."),
        (2, "code { return 1; } with many words in this line."),
        (3, "no punctuation anywhere in this doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in c4_clean_lines(df).collect()}
    assert out[0]["n_kept_lines"] == 2
    assert out[0]["clean_text"] == (
        "This is a proper sentence with enough words.\n"
        "Another good long sentence ends right here!"
    )
    assert out[1]["n_kept_lines"] == 0 and out[1]["clean_text"] is None
    assert out[2]["n_kept_lines"] == 0 and out[2]["clean_text"] is None
    assert out[3]["n_kept_lines"] == 0 and out[3]["clean_text"] is None


def test_pii_scrub_and_counts(spark):
    """PII pass: typed redaction tokens, per-kind counts, email-before-ip
    precedence (a dotted mailbox host is consumed by the email rule)."""
    from patternly_spark.functions.text import with_pii_scrubbed

    docs = spark.createDataFrame(
        [
            (1, "mail a@b.io and c.d@e-f.org now"),
            (2, "ssn 123-45-6789 phone +1 555 123 4567"),
            (3, "host 192.168.0.1 and 10.0.0.7 up"),
            (4, "clean text only"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in with_pii_scrubbed(docs).collect()}
    assert out[1]["n_email"] == 2
    assert out[1]["scrubbed_text"] == "mail [EMAIL] and [EMAIL] now"
    assert out[2]["n_ssn"] == 1 and out[2]["n_phone"] == 1
    assert out[2]["scrubbed_text"] == "ssn [SSN] phone [PHONE]"
    assert out[3]["n_ipv4"] == 2
    assert out[3]["scrubbed_text"] == "host [IPV4] and [IPV4] up"
    assert out[4]["scrubbed_text"] == "clean text only"
    assert all(out[4][f"n_{k}"] == 0 for k in ("email", "ssn", "phone", "ipv4"))


def test_gopher_repetition_metrics(spark):
    """Hand-computed repetition metrics on crafted docs (Table A2
    semantics: dup fractions over non-empty lines/paragraphs, char
    coverage of modal and duplicated word n-grams)."""
    from patternly_spark.functions.text import gopher_repetition_flags

    rows = [
        # 3 lines, one duplicated pair: dup_line_frac = 1/3,
        # dup_line_char_frac = 2*5/17; top-2gram "a b" (count 2, ties
        # to smallest) -> 6/17; 5-grams all distinct -> 0
        (0, "a b c\na b c\nx y z"),
        # clean doc: everything 0 except top-2gram coverage
        (1, "the quick brown fox jumps over the lazy dog"),
        # mega-repetitive: "spam ham " x 40 -> dup 5-gram coverage ~ 1
        (2, ("spam ham " * 40).strip()),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in gopher_repetition_flags(df).collect()}

    d0 = out[0]
    assert abs(d0["dup_line_frac"] - 1 / 3) < 1e-12
    assert abs(d0["dup_line_char_frac"] - 10 / 17) < 1e-12
    assert abs(d0["top_2gram_char_frac"] - 6 / 17) < 1e-12
    assert d0["dup_5gram_char_frac"] == 0.0
    assert d0["keep_repetition"] is False  # line-char 0.59 > 0.20

    d1 = out[1]
    assert d1["dup_line_frac"] == 0.0 and d1["dup_para_frac"] == 0.0
    assert d1["dup_5gram_char_frac"] == 0.0
    # all 2-grams count 1 -> tie resolves to sort-first "brown fox"
    # (9 chars) over the 43-char text
    assert abs(d1["top_2gram_char_frac"] - 9 / 43) < 1e-12
    # 0.209 > 0.20 threshold: short docs trip top-2gram coverage by
    # construction (Gopher applies these to long documents)
    assert d1["ok_dup_line_frac"] is True and d1["ok_dup_5gram_char_frac"] is True

    d2 = out[2]
    assert d2["dup_5gram_char_frac"] == 1.0  # overlap sum capped at 1.0
    assert d2["top_2gram_char_frac"] > 0.4
    assert d2["keep_repetition"] is False

    d3 = out[3]
    assert all(
        d3[k] == 0.0
        for k in d3
        if k.endswith("_frac") and not k.startswith("ok_")
    )
    assert d3["keep_repetition"] is True


def test_gopher_repetition_zero_shuffle(spark):
    from patternly_spark.functions.text import gopher_repetition_flags

    df = spark.createDataFrame([(0, "a b\na b")], "doc_id long, text string")
    plan = gopher_repetition_flags(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_normalize_text_canonicalizes(spark):
    from pyspark.sql import functions as F
    from patternly_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [(0, "  Hello,   WORLD!! "), (1, "hello world"), (2, "a-b c_d")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n"] for r in df.select("doc_id", normalize_text("text").alias("n")).collect()}
    assert out[0] == "hello world" == out[1]
    assert out[2] == "ab cd"  # hyphen and underscore both stripped


def test_unicode_compat_fold_matches_nfkc(spark):
    """The NFKC-claimed subset of the fold (fullwidth forms, compat
    spaces, ligatures, ellipsis) must agree with Python's
    unicodedata.normalize('NFKC'); quotes/dashes/zero-width are the
    documented beyond-NFKC dedup canonicalizations."""
    import unicodedata

    from pyspark.sql import functions as F

    from patternly_spark.functions.text import (
        FOLD_MULTI,
        unicode_compat_fold,
    )

    nfkc_chars = (
        [chr(0xFF01 + i) for i in range(94)]                 # fullwidth
        + ["\u00a0"] + [chr(0x2000 + i) for i in range(11)]  # compat spaces
        + ["\u202f", "\u205f", "\u3000"]
        + [src for src, _ in FOLD_MULTI]                     # ligatures, ellipsis
    )
    rows = [(i, f"x{c}y") for i, c in enumerate(nfkc_chars)]
    df = spark.createDataFrame(rows, "i long, text string")
    got = {
        r["i"]: r["f"]
        for r in df.select("i", unicode_compat_fold("text").alias("f")).collect()
    }
    for i, c in enumerate(nfkc_chars):
        want = unicodedata.normalize("NFKC", f"x{c}y")
        assert got[i] == want, f"U+{ord(c):04X}: {got[i]!r} != NFKC {want!r}"

    # beyond-NFKC canonicalizations: quotes/dashes -> ASCII, zero-width dropped
    extra = spark.createDataFrame(
        [(0, "\u201chi\u201d \u2018there\u2019 \u2014 a\u200bb")],
        "i long, text string",
    )
    folded = extra.select(unicode_compat_fold("text").alias("f")).first()["f"]
    assert folded == '"hi" \'there\' - ab'


def test_compat_fold_cross_engine(spark):
    """The q78 oracle's DuckDB fold expression must agree with Spark's
    unicode_compat_fold on text that actually CONTAINS fold characters
    (the sf test tables are pure ASCII, so the driver gate never
    exercises the fold — this pins the cross-engine contract)."""
    import duckdb

    from __spark_entry__ import _compat_fold_sql
    from patternly_spark.functions.text import unicode_compat_fold

    rows = [
        (0, "plain ascii stays put"),
        (1, "curly ‘quotes’ and “doubles”"),
        (2, "dash – and — and minus −"),
        (3, "nbsp\u00a0and thin\u2009space and ideo\u3000space"),
        (4, "fullｗｉｄｔｈ ＡＢＣ 123"),
        (5, "ligature ﬁle and oﬀ and ﬃx"),
        (6, "zero\u200bwidth\u200cgone\ufeff"),
        (7, "ellipsis…done"),
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    got_spark = {
        r["i"]: r["f"]
        for r in df.select("i", unicode_compat_fold("text").alias("f")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got_duck = dict(
        con.execute(f"SELECT i, {_compat_fold_sql('text')} FROM t").fetchall()
    )
    assert got_spark == got_duck


def test_normalize_text_folds_dedup_keys(spark):
    """Formatting variants that NFKC-or-quote folding should collapse
    onto the same dedup key."""
    from patternly_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [
            (0, "the file is here"),
            (1, "The \ufb01le is here"),        # fi ligature
            (2, "the \uff26\uff29\uff2c\uff25 is here"),  # fullwidth FILE
            (3, "the\u00a0file is here"),       # NBSP (was deleted pre-fold)
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", normalize_text("text").alias("n")).collect()
    }
    assert out[0] == out[1] == out[2] == out[3] == "the file is here"


def test_html_to_text(spark):
    """Tag stripping, block removal, entity decode order, whitespace
    collapse on handcrafted hostile HTML."""
    from patternly_spark.functions.text import html_to_text

    rows = [
        (0, "<p>Hello <b>world</b></p>"),
        (1, "<script>var s = '<p>fake</p>';</script>real"),
        (2, "<style>.x { color: red }</style>styled"),
        (3, "A &amp; B &lt;tag&gt; &quot;q&quot; &#39;a&#39;&nbsp;end"),
        # &amp;lt; must decode to the literal text "&lt;", not "<"
        (4, "literal &amp;lt; stays"),
        (5, "<!-- comment <p>gone</p> -->kept"),
        (6, "multi\n\n  space   <br>  here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["t"] for r in df.select("doc_id", html_to_text("text").alias("t")).collect()}
    assert out[0] == "Hello world"
    assert out[1] == "real"
    assert out[2] == "styled"
    assert out[3] == 'A & B <tag> "q" \'a\' end'
    assert out[4] == "literal &lt; stays"
    assert out[5] == "kept"
    assert out[6] == "multi space here"


def test_extract_links(spark):
    from patternly_spark.functions.text import extract_domain, extract_links

    html = (
        '<html><body><a href="https://a.example/x">one</a>'
        '<p>no link &amp; <a class="c" rel="nofollow" href="https://b.example/y?z=1">two</a></p>'
        "<a name='no-href'>anchor</a>"
        '<a href="/relative/path">rel</a></body></html>'
    )
    df = spark.createDataFrame([(html,), ("plain text, no anchors",)], "text string")
    out = df.select(extract_links("text").alias("links")).collect()
    # document order, attribute-tolerant, relative links included verbatim
    assert out[0]["links"] == [
        "https://a.example/x",
        "https://b.example/y?z=1",
        "/relative/path",
    ]
    assert out[1]["links"] == []
    # composing with extract_domain: absolute links reduce to hosts,
    # relative links to '' (no scheme)
    hosts = df.select(
        F.transform(extract_links("text"), lambda x: extract_domain(x)).alias("h")
    ).collect()
    assert hosts[0]["h"] == ["a.example", "b.example", ""]


def test_extract_links_cross_engine(spark):
    import duckdb

    from patternly_spark.functions.text import extract_links

    rows = [
        ('<a href="https://x.example/1">x</a> <a data-k="v" href="https://y.example/2">y</a>',),
        ('nested "quotes" and <a href="">empty</a>',),
        ("no anchors at all",),
    ]
    df = spark.createDataFrame(rows, "text string")
    got = [r["links"] for r in df.select(extract_links("text").alias("links")).collect()]
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT regexp_extract_all(?, '<a [^>]*href=\"([^\"]*)\"', 1)", [t]
        ).fetchone()[0]
        for (t,) in rows
    ]
    assert got == want


def test_canonical_url(spark):
    from patternly_spark.functions.text import canonical_url

    cases = [
        # tracking variants of one page collapse to one key
        ("HTTPS://WWW.Example.COM:443/Path/One?utm_source=mail&id=3&utm_medium=x#frag",
         "https://www.example.com/Path/One?id=3"),
        ("https://www.example.com/Path/One?id=3&gclid=abc123",
         "https://www.example.com/Path/One?id=3"),
        ("https://www.example.com/Path/One?id=3",
         "https://www.example.com/Path/One?id=3"),
        # default ports only for the matching scheme
        ("http://a.example:80/x", "http://a.example/x"),
        ("http://a.example:443/x", "http://a.example:443/x"),
        # bare trailing slash drops; deeper paths keep theirs
        ("https://a.example/", "https://a.example"),
        ("https://a.example/sub/", "https://a.example/sub/"),
        # only-tracking query vanishes entirely
        ("https://a.example/p?utm_campaign=x", "https://a.example/p"),
        ("https://a.example/p?fbclid=9&utm_a=1", "https://a.example/p"),
        # path case preserved; no scheme -> pass through trimmed
        ("  not a url  ", "not a url"),
        ("ftp://Mixed.Case/KeepPath", "ftp://mixed.case/KeepPath"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["c"] for r in df.select(canonical_url("url").alias("c")).collect()]
    assert got == [w for _, w in cases]


def test_canonical_url_cross_engine(spark):
    import duckdb

    from patternly_spark.functions.text import TRACKING_PARAM_PATTERNS, canonical_url

    urls = [
        "HTTPS://A.Example:443/P?utm_source=1&x=2&gclid=3#f",
        "http://b.example:80/?utm_a=",
        "https://c.example/p?a=1&fbclid=2&b=3",
        "plain text",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r["c"] for r in df.select(canonical_url("url").alias("c")).collect()]

    con = duckdb.connect()
    expr = "trim(url)"
    scheme = f"lower(regexp_extract({expr}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    auth0 = f"lower(regexp_extract({expr}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))"
    auth = (f"CASE WHEN {scheme} = 'http' THEN regexp_replace({auth0}, ':80$', '', 'g') "
            f"WHEN {scheme} = 'https' THEN regexp_replace({auth0}, ':443$', '', 'g') "
            f"ELSE {auth0} END")
    rest = f"regexp_extract({expr}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)', 1)"
    rest = f"regexp_replace({rest}, '#.*', '', 'g')"
    for pat in TRACKING_PARAM_PATTERNS:
        rest = f"regexp_replace({rest}, '{pat}', '', 'g')"
    rest = f"regexp_replace({rest}, '&&*', '&', 'g')"
    rest = f"regexp_replace({rest}, '\\?&', '?', 'g')"
    rest = f"regexp_replace({rest}, '[?&]*$', '', 'g')"
    rest = f"CASE WHEN {rest} = '/' THEN '' ELSE {rest} END"
    sql = f"SELECT CASE WHEN {scheme} = '' THEN {expr} ELSE {scheme} || '://' || {auth} || {rest} END AS c FROM u"
    con.register("u", __import__("pandas").DataFrame({"url": urls}))
    want = [r[0] for r in con.execute(sql).fetchall()]
    assert got == want


def test_compression_ratio_orders_repetitive_below_prose(spark):
    """The zlib signal: template/repetitive text compresses far below
    natural prose; empty text scores the neutral 1.0; values replicate
    plain-Python zlib at the same level."""
    import zlib

    from pyspark.sql import functions as F

    from patternly_spark.functions.text import compression_ratio

    rep = "click here to subscribe " * 40
    prose = (
        "He folded the map along its worn creases, tracing the river "
        "until it vanished into the blank margin where the survey ended."
    )
    df = spark.createDataFrame(
        [(1, rep), (2, prose), (3, "")], "id long, text string"
    )
    got = {
        r["id"]: r["ratio"]
        for r in df.select("id", compression_ratio("text").alias("ratio")).collect()
    }
    assert got[1] < 0.2 < got[2]
    assert got[3] == 1.0
    for i, s in ((1, rep), (2, prose)):
        want = len(zlib.compress(s.encode(), 6)) / len(s.encode())
        assert got[i] == want
