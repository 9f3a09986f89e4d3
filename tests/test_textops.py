"""URL canonicalization + PII redaction — JVM-side Column ops
(functions/textops.py), the web-corpus key-prep and scrub passes."""

from __future__ import annotations

from pyspark.sql import functions as F

from embulk_spark.functions.textops import (
    canonical_url,
    pii_counts,
    redact_pii,
    url_domain,
    url_host,
)


def _one(spark, url):
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(
        canonical_url(F.col("u")).alias("c"),
        url_host(F.col("u")).alias("h"),
        url_domain(F.col("u")).alias("d"),
    ).first()


def test_canonical_url_matrix(spark):
    cases = {
        # scheme+host lowercase, path case preserved
        "HTTPS://WWW.Example.ORG/Path/X": (
            "https://www.example.org/Path/X", "www.example.org", "example.org"),
        # default ports stripped (scheme-matched only)
        "https://a.example.org:443/p": (
            "https://a.example.org/p", "a.example.org", "example.org"),
        "http://a.example.org:80/p": (
            "http://a.example.org/p", "a.example.org", "example.org"),
        # :443 under http is NOT default — kept
        "http://a.example.org:443/p": (
            "http://a.example.org:443/p", "a.example.org", "example.org"),
        "https://a.example.org:8080/p": (
            "https://a.example.org:8080/p", "a.example.org", "example.org"),
        # fragment stripped; bare trailing slash removed
        "https://a.example.org/p#frag": (
            "https://a.example.org/p", "a.example.org", "example.org"),
        "https://a.example.org/": (
            "https://a.example.org", "a.example.org", "example.org"),
        # a real path keeps its trailing slash? no: only bare '/' is removed
        "https://a.example.org/p/": (
            "https://a.example.org/p/", "a.example.org", "example.org"),
    }
    for url, (c, h, d) in cases.items():
        got = _one(spark, url)
        assert (got["c"], got["h"], got["d"]) == (c, h, d), url


def test_pii_redaction(spark):
    text = (
        "write to Bob.Smith+x@corp.example.com or call +1 (555) 123-4567; "
        "server at 192.168.0.1 answered"
    )
    df = spark.createDataFrame([(text,)], "t string")
    row = df.select(
        redact_pii(F.col("t")).alias("r"), *pii_counts(F.col("t"))
    ).first()
    assert "<EMAIL>" in row["r"] and "@" not in row["r"]
    assert "<PHONE>" in row["r"] and "123-4567" not in row["r"]
    assert "<IPV4>" in row["r"] and "192.168" not in row["r"]
    assert (row["n_email"], row["n_phone"], row["n_ipv4"]) == (1, 1, 1)


def test_pii_no_false_positives(spark):
    text = "version 1.2 of chapter 3.4.5 sold 1,234 units in 2024"
    df = spark.createDataFrame([(text,)], "t string")
    row = df.select(redact_pii(F.col("t")).alias("r"), *pii_counts(F.col("t"))).first()
    assert row["r"] == text
    assert (row["n_email"], row["n_phone"], row["n_ipv4"]) == (0, 0, 0)


def _rep(spark, text):
    from embulk_spark.functions.textops import repetition_report

    df = spark.createDataFrame([(text,)], "t string")
    return repetition_report(df, "t").first()


def test_repetition_duplicate_lines(spark):
    # 4 non-empty lines, 2 distinct -> dup fraction 0.5
    row = _rep(spark, "spam\nspam\n\nham\nham\n")
    assert row["dup_line_frac"] == 0.5
    assert row["bullet_ellipsis_line_frac"] == 0.0


def test_repetition_top_ngram(spark):
    # words: [buy, now, buy, now, buy] -> 2-grams: "buy now" x2,
    # "now buy" x2 -> top fraction 2/4; 3-grams: "buy now buy" x2,
    # "now buy now" x1 -> 2/3
    row = _rep(spark, "Buy now buy NOW buy")
    assert row["top2gram_frac"] == 0.5
    assert row["top3gram_frac"] == round(2 / 3, 6)


def test_repetition_short_doc_guards(spark):
    # one word: no 2-grams / 3-grams, single line, no division blow-ups
    row = _rep(spark, "hello")
    assert row["dup_line_frac"] == 0.0
    assert row["top2gram_frac"] == 0.0
    assert row["top3gram_frac"] == 0.0


def test_repetition_bullet_lines(spark):
    row = _rep(spark, "- item one\n* item two\nprose here\nto be continued...")
    assert row["bullet_ellipsis_line_frac"] == 0.75


def test_corpus_mixture_stats(spark):
    from embulk_spark.functions.textops import corpus_mixture_stats

    rows = [
        ("cc", "en", "the cat sat"),
        ("cc", "en", "the cat sat"),      # exact dup (same fingerprint)
        ("cc", "en", "The  cat   SAT"),   # ws/case-normalized dup too
        ("cc", "de", "der hund"),
        ("wiki", "en", "one two three four"),
    ]
    df = spark.createDataFrame(rows, "source string, lang string, text string")
    got = {
        (r["source"], r["lang"]): r
        for r in corpus_mixture_stats(df, "text", ["source", "lang"]).collect()
    }
    cc_en = got[("cc", "en")]
    assert cc_en["n_docs"] == 3 and cc_en["total_tokens"] == 9
    assert cc_en["dup_rate"] == round(2 / 3, 6)  # 3 docs, 1 distinct fp
    assert got[("cc", "de")]["dup_rate"] == 0.0
    assert got[("wiki", "en")]["total_tokens"] == 4


def test_bpe_token_count_edges(spark):
    """GPT-2-style pre-tokenizer (lookahead-free subset): contractions
    split off, space folds into the following token, digit/punct runs are
    their own tokens, empty string is 0 tokens (vs whitespace count's 1)."""
    from embulk_spark.functions.textops import bpe_token_count, token_count

    cases = [
        ("Hello, world's 42 tests", 6),  # Hello | , | world | 's | 42 | tests
        ("", 0),
        ("   ", 0),
        ("don't", 2),                    # don | 't
        ("a  b", 2),
        ("3.14", 3),                     # 3 | . | 14
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "text string")
    got = [
        r["n"]
        for r in df.select(bpe_token_count(F.col("text")).alias("n")).collect()
    ]
    assert got == [c for _, c in cases], got
    # empty-string contrast with whitespace count (documented split-token 1)
    ws = (
        df.filter(F.col("text") == "")
        .select(token_count(F.col("text")).alias("n"))
        .collect()[0]["n"]
    )
    assert ws == 1


def test_boilerplate_lines_counts_once_per_doc(spark):
    from embulk_spark.functions.textops import boilerplate_lines

    docs = spark.createDataFrame(
        [
            (1, "unique body one\n(c) footer\n(c) footer"),  # dup inside ONE doc
            (2, "unique body two\n(c) footer"),
            (3, "unique body three\n(c) footer\n  \nnav | bar"),
            (4, "unique body four\nnav | bar"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["line"]: r["n_docs"]
        for r in boilerplate_lines(docs, "text", min_docs=2).collect()
    }
    # in-doc repetition must not inflate the count; blanks ignored
    assert got == {"(c) footer": 3, "nav | bar": 2}


def test_strip_boilerplate_is_jvm_narrow_map(spark):
    from embulk_spark.functions.textops import strip_boilerplate

    docs = spark.createDataFrame(
        [(1, "keep me\n(c) footer\nkeep too"), (2, "(c) footer")],
        "doc_id long, text string",
    )
    out = strip_boilerplate(docs, ["(c) footer"], "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Exchange" not in plan
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    assert rows[1] == "keep me\nkeep too" and rows[2] == ""


def test_strip_boilerplate_preserves_separator(spark):
    from embulk_spark.functions.textops import strip_boilerplate

    docs = spark.createDataFrame(
        [(1, "keep A\r\n(c) footer\r\nkeep B")], "doc_id long, text string"
    )
    out = strip_boilerplate(docs, ["(c) footer"], "text", line_sep="\r\n")
    assert out.collect()[0]["text"] == "keep A\r\nkeep B"


# ---------------------------------------------------------------------------
# unicode text normalization
# ---------------------------------------------------------------------------

NASTY_TEXTS = [
    "plain ascii stays put",
    "nb\u00a0sp and em-space\u2003plus\u3000ideographic",
    "\u201cquoted\u201d \u2018single\u2019 \u201elow\u201f \u00abguillemets\u00bb",
    "en\u2013dash em\u2014dash minus\u2212sign \u2026done",
    "zero\u200bwidth\u200cjoin\u200d\u2060ers\ufeff",
    "ctrl\u0000chars\u0001here\u000bvt\u000cff\u009c",
    "CRLF\r\nline\rand  runs   of    spaces",
    "  leading and trailing  \n\n\n\nmany blanks\t\ttabs  ",
    "",
    None,
]


def test_normalize_text_expected_outputs(spark):
    from embulk_spark.functions.textops import normalize_text

    rows = [(i, t) for i, t in enumerate(NASTY_TEXTS)]
    df = spark.createDataFrame(rows, "i long, text string")
    got = {
        r.i: r.n
        for r in df.select(
            "i", normalize_text(F.col("text")).alias("n")
        ).collect()
    }
    assert got[0] == "plain ascii stays put"
    assert got[1] == "nb sp and em-space plus ideographic"
    assert got[2] == "\"quoted\" 'single' \"low\" \"guillemets\""
    assert got[3] == "en-dash em-dash minus-sign ...done"
    assert got[4] == "zerowidthjoiners"
    assert got[5] == "ctrlcharsherevtff"
    assert got[6] == "CRLF\nline\nand runs of spaces"
    assert got[7] == "leading and trailing\n\nmany blanks tabs"
    assert got[8] == ""
    assert got[9] is None


def test_normalize_text_duckdb_parity(spark):
    """Cross-engine pin on unicode-rich input: the DuckDB chain generated
    from the same constants must agree byte-for-byte (the sf tables are
    mostly ASCII, so the driver oracle alone under-exercises the folds)."""
    import duckdb
    import pandas as pd

    from __spark_entry__ import _normalize_sql_expr
    from embulk_spark.functions.textops import normalize_text

    rows = [(i, t) for i, t in enumerate(NASTY_TEXTS)]
    df = spark.createDataFrame(rows, "i long, text string")
    got_spark = {
        r.i: r.n
        for r in df.select(
            "i", normalize_text(F.col("text")).alias("n")
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["i", "text"]))
    got_duck = {
        i: n
        for i, n in con.execute(
            f"SELECT i, {_normalize_sql_expr('text')} AS n FROM t"
        ).fetchall()
    }
    assert got_spark == got_duck


def test_normalize_text_plan_is_jvm_only(spark):
    from embulk_spark.functions.textops import normalize_text

    df = spark.createDataFrame([(1, "x")], "i long, text string")
    out = df.select(normalize_text(F.col("text")).alias("n"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Exchange" not in plan


def test_vocab_topk_tiebreak_and_min_count(spark):
    from embulk_spark.functions.textops import vocab_topk

    df = spark.createDataFrame(
        [(1, "b a a c C b"), (2, "a z")], "i long, text string"
    )
    top = vocab_topk(df, "text", k=3).collect()
    assert [(r.token, r.n_occurrences) for r in top] == [
        ("a", 3), ("b", 2), ("c", 2)  # lowercased; c ties b, token breaks
    ]
    rare = vocab_topk(df, "text", k=10, min_count=2).collect()
    assert {r.token for r in rare} == {"a", "b", "c"}


# ---------------------------------------------------------------------------
# property tests (hypothesis): idempotence / reconstruction invariants.
# Spark round-trips are slow, so few, dense examples (same discipline as
# test_cdc_properties.py).
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_nasty_char = st.sampled_from(
    list("ab c\u00a0\u2003\u2018\u201c\u2013\u2026\u200b\u0001\r\n\t")
)
_nasty_text = st.text(alphabet=_nasty_char, min_size=0, max_size=40)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_nasty_text, min_size=1, max_size=8))
def test_normalize_text_idempotent(spark, texts):
    from embulk_spark.functions.textops import normalize_text

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    once = df.select("i", normalize_text(F.col("text")).alias("n"))
    twice = once.select("i", normalize_text(F.col("n")).alias("n"))
    assert {r.i: r.n for r in once.collect()} == {
        r.i: r.n for r in twice.collect()
    }


# ---------------------------------------------------------------------------
# C4-style page cleanup
# ---------------------------------------------------------------------------

def test_c4_line_rules(spark):
    from embulk_spark.functions.textops import c4_report

    text = "\n".join([
        "This is a perfectly fine sentence with enough words.",   # kept
        "Too short.",                                              # <5 words
        "No terminal punctuation here at all",                     # no punct
        "Enable javascript to view this page properly.",           # phrase
        "Please read our privacy policy before continuing today.", # phrase
        "Another good long sentence should also survive here!",    # kept
        "   ",                                                     # blank
    ])
    df = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    r = c4_report(df, "text", "doc_id").collect()[0]
    assert r["n_kept_lines"] == 2
    assert "javascript" not in r["clean_text"]
    assert r["n_sentences"] == 2
    assert not r["page_flagged"]
    # 2 sentences < default 3 → dropped
    assert not r["c4_keep"]


def test_c4_page_flags(spark):
    from embulk_spark.functions.textops import c4_report

    good = " ".join(
        f"Sentence number {i} has plenty of words in it." for i in range(4)
    )
    rows = [
        (1, good),
        (2, good + " Lorem Ipsum dolor sit amet."),
        (3, good + "\nvar x = { a: 1 };"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r["doc_id"]: r for r in c4_report(df, "text", "doc_id").collect()}
    assert got[1]["c4_keep"]
    assert got[2]["page_flagged"] and not got[2]["c4_keep"]
    assert got[3]["page_flagged"] and not got[3]["c4_keep"]


def test_gopher_rules(spark):
    from embulk_spark.functions.textops import gopher_report

    good = (
        "The quick brown fox jumps over the lazy dog and runs off "
        "to be with that other fox which seems to have fun with it."
    )
    rows = [
        (1, good),
        (2, "tiny doc"),                                   # word count floor
        (3, " ".join(["supercalifragilistic"] * 30)),      # mean len > 10, no stops
        (4, good + " ##### " * 20),                        # hash symbol ratio
        (5, "\n".join(["- bullet line"] * 10) + "\n" + good),  # all-bullet lines
        (6, " ".join(["12345"] * 30)),                     # no alpha words
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: r
        for r in gopher_report(df, "text", "doc_id", min_words=10).collect()
    }
    assert got[1]["gopher_keep"]
    assert not got[2]["ok_word_count"] and not got[2]["gopher_keep"]
    assert not got[3]["ok_mean_word_len"] and not got[3]["ok_stop_words"]
    assert not got[4]["ok_symbol_ratio"]
    assert not got[5]["ok_line_shape"]
    assert not got[6]["ok_alpha_words"]
    assert got[1]["stop_hits"] >= 2 and got[1]["alpha_word_frac"] >= 0.8


def test_script_detection(spark):
    from embulk_spark.functions.textops import script_report

    rows = [
        (1, "The quick brown fox."),
        (2, "Привет мир как дела"),
        (3, "你好世界这是中文"),
        (4, "مرحبا بالعالم"),
        (5, "Hello мир"),          # latin wins the tie-ish mix (5 vs 3)
        (6, "1234 ... !!"),        # no letters at all
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r.doc_id: (r.script, r.script_purity) for r in
           script_report(df, "text", "doc_id").collect()}
    assert got[1][0] == "latin" and got[1][1] == 1.0
    assert got[2][0] == "cyrillic"
    assert got[3][0] == "cjk"
    assert got[4][0] == "arabic"
    assert got[5][0] == "latin" and 0 < got[5][1] < 1
    assert got[6] == ("unknown", 0.0)


def test_pipeline_c4_and_gopher_filters(spark):
    from embulk_spark.pipeline import apply_filter

    good_line = "The sentence is long enough to survive all of the line rules."
    good = "\n".join([good_line] * 5)
    rows = [
        (1, good),
        (2, "short\njunk\nlines"),               # c4: no line survives
        (3, good + "\nvar x = { a: 1 };"),       # c4 page flag
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = apply_filter(df, {"type": "c4"})
    got = {r.doc_id: r.text for r in out.collect()}
    assert set(got) == {1}
    assert got[1] == good  # kept lines rejoined, unchanged here
    assert out.columns == ["doc_id", "text"]  # features dropped

    g = apply_filter(df, {"type": "gopher", "min_words": 10})
    # doc 1: 45 words of plain prose passes; 2 and 3 fail word count or
    # symbol rules ('{' is not a gopher rule — doc3 fails stop-word? no —
    # it passes words; check it stays)
    kept = {r.doc_id for r in g.collect()}
    assert 1 in kept and 2 not in kept
    assert g.columns == ["doc_id", "text"]
