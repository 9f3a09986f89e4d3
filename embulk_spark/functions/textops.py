"""Text analysis for web-scale training-data pipelines — token counting,
quality scoring, language-ID, document fingerprinting.

All hot-path functions are pure JVM-side Column expressions (whole-stage
codegen; no Python). These extend the reference's text handling
(LineDecoder charset/newline handling,
/root/reference/embulk-core/src/main/java/org/embulk/spi/util/LineDecoder.java:24-50)
into the analysis layer a 100 TB corpus pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def token_count(text: Column) -> Column:
    """Whitespace token count (empty string counts 1 split-token — matches
    both engines' split semantics; callers can gate on length)."""
    return F.size(F.split(F.trim(text), r"\s+"))


#: GPT-2-style pre-tokenizer regex, restricted to the lookahead-free subset
#: so the SAME pattern runs under Java regex (Spark, JVM-side) and RE2
#: (DuckDB oracle): contractions, space-prefixed letter runs, digit runs,
#: and punctuation runs. Whitespace-only runs are simply not counted
#: (GPT-2 proper folds trailing spaces into tokens via ``(?!\S)``
#: lookahead, which RE2 cannot express).
BPE_SPLIT_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: matches of the GPT-2 pre-tokenizer pattern
    (BPE merges only ever split WITHIN a pre-token, so this lower-bounds
    and tracks real BPE token counts). Pure JVM regex — whole-stage
    codegen, no Python."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_SPLIT_RE), F.lit(0)))


def alpha_len(text: Column) -> Column:
    """Count of ascii-alpha characters after lowering."""
    return F.length(F.regexp_replace(F.lower(text), "[^a-z]", ""))


def punct_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"[^.!?,;:]", ""))


def word_hits(text_lower: Column, word: str) -> Column:
    """Occurrences of a word (word-boundary regex)."""
    return F.size(F.regexp_extract_all(text_lower, F.lit(rf"\b{word}\b"), 0))


#: Small per-language marker-word profiles for the SQL-expressible lang-ID.
SQL_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "ist"),
    "fr": ("le", "la", "et"),
}


def lang_scores(text: Column) -> dict[str, Column]:
    low = F.lower(text)
    return {
        lang: sum(word_hits(low, w) for w in words)
        for lang, words in SQL_LANG_MARKERS.items()
    }


def lang_id_sql(text: Column) -> Column:
    """Deterministic marker-word language-ID as a pure Column expression:
    highest hit-count wins, fixed order (en, de, fr) breaks ties, zero hits
    → 'unknown'. (The richer pandas-UDF variant lives in extract.py.)"""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    out = F.lit("unknown")
    for lang in reversed(list(SQL_LANG_MARKERS)):
        out = F.when(
            (scores[lang] > 0) & (scores[lang] == best), F.lit(lang)
        ).otherwise(out)
    return out


#: Unicode-block ranges for script detection (multilingual complement to
#: the latin marker-word lang-ID — a CJK/Cyrillic/Arabic page scores 0 on
#: every latin profile; its SCRIPT is still decidable from raw chars).
SCRIPT_RANGES: dict[str, str] = {
    "latin": r"A-Za-zÀ-ɏ",
    "cyrillic": r"Ѐ-ӿ",
    "greek": r"Ͱ-Ͽ",
    "arabic": r"؀-ۿ",
    "hebrew": r"֐-׿",
    "devanagari": r"ऀ-ॿ",
    "cjk": r"一-鿿぀-ヿ가-힯",
}


def script_counts(text: Column) -> dict[str, Column]:
    """Per-script letter counts as pure JVM regexp_count Columns."""
    return {
        name: F.regexp_count(text, F.lit(f"[{rng}]"))
        for name, rng in SCRIPT_RANGES.items()
    }


def script_id(text: Column) -> Column:
    """Dominant Unicode script: highest letter count wins, declaration
    order breaks ties, zero letters → 'unknown'. Codegen'd Columns —
    at 100 TB this is part of the scan stage, no shuffle."""
    counts = script_counts(text)
    best = F.greatest(*counts.values())
    out = F.lit("unknown")
    for name in reversed(list(SCRIPT_RANGES)):
        out = F.when((counts[name] > 0) & (counts[name] == best), F.lit(name)).otherwise(out)
    return out


def script_report(df: DataFrame, text_col: str, *keep_cols: str) -> DataFrame:
    """Per-document script profile: per-script counts, dominant script,
    and the dominant-script letter fraction (a purity signal — mixed-
    script pages are a spam/boilerplate marker in web corpora)."""
    text = F.col(text_col)
    counts = script_counts(text)
    total = sum(counts.values())
    return df.select(
        *keep_cols,
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        script_id(text).alias("script"),
        F.round(
            F.greatest(*counts.values()) / F.greatest(total, F.lit(1)), 6
        ).alias("script_purity"),
    )


def quality_features(text: Column) -> list[Column]:
    """Quality-scoring feature columns: char/token lengths, mean token
    length, punctuation & alpha ratios, stopword ratio (en markers)."""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    low = F.lower(text)
    stop_hits = sum(word_hits(low, w) for w in SQL_LANG_MARKERS["en"])
    return [
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        F.round(n_chars / n_tokens, 4).alias("mean_token_len"),
        F.round(punct_count(text) / n_chars, 6).alias("punct_ratio"),
        F.round(alpha_len(text) / n_chars, 6).alias("alpha_ratio"),
        F.round(stop_hits / n_tokens, 6).alias("stopword_ratio"),
    ]


# ---------------------------------------------------------------------------
# C4-style page cleanup (Raffel et al. 2020 §2.2 heuristics, re-expressed
# as pure JVM Columns — per-row array HOFs, no Python, no shuffle)
# ---------------------------------------------------------------------------

#: a kept line must end in terminal punctuation (incl. closing quotes)
C4_TERMINAL_RE = '[.!?"”]$'
#: line-level drop phrases (lowercase substring match)
C4_LINE_DROP_PHRASES = (
    "javascript", "terms of use", "privacy policy", "cookie policy",
    "uses cookies",
)
#: page-level drop markers
C4_PAGE_DROP_PHRASES = ("lorem ipsum", "{")


def c4_kept_lines(text: Column, min_words: int = 5) -> Column:
    """The lines of ``text`` that survive C4's line rules: non-empty after
    trim, terminal punctuation, ≥ ``min_words`` whitespace words, and no
    boilerplate phrase. Array column; order preserved."""
    from functools import reduce
    from operator import or_

    def keep(l: Column) -> Column:
        words = F.filter(F.split(l, r"\s+"), lambda w: w != F.lit(""))
        low = F.lower(l)
        no_phrase = ~reduce(or_, (low.contains(p) for p in C4_LINE_DROP_PHRASES))
        return (
            (l != F.lit(""))
            & l.rlike(C4_TERMINAL_RE)
            & (F.size(words) >= min_words)
            & no_phrase
        )

    return F.filter(_nonempty_lines(text), keep)


def c4_cols(
    text: Column, min_words: int = 5, min_sentences: int = 3
) -> list[Column]:
    """C4 cleanup as feature columns: the cleaned page (kept lines
    re-joined), kept-line and sentence counts, page-level flags, and the
    final keep verdict (enough sentences, no lorem-ipsum, no code brace).
    Everything is engine-parity SQL arithmetic for the oracle."""
    kept = c4_kept_lines(text, min_words)
    clean = F.array_join(kept, "\n")
    # sentence count over the CLEANED text: terminal-mark splits
    n_sentences = F.size(F.split(clean, "[.!?]")) - 1
    from functools import reduce
    from operator import or_

    low = F.lower(text)
    page_flagged = reduce(or_, (low.contains(p) for p in C4_PAGE_DROP_PHRASES))
    return [
        clean.alias("clean_text"),
        F.size(kept).alias("n_kept_lines"),
        n_sentences.alias("n_sentences"),
        page_flagged.alias("page_flagged"),
        (
            (n_sentences >= min_sentences) & ~page_flagged
        ).alias("c4_keep"),
    ]


def c4_report(df: DataFrame, text_col: str, *keep_cols: str) -> DataFrame:
    """Per-document C4 cleanup report (the `queries()` surface): keep
    columns + the c4_cols features. Narrow per-row map — at 100 TB this
    runs inside the scan stage with zero shuffles."""
    return df.select(*keep_cols, *c4_cols(F.col(text_col)))


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, "Scaling Language Models",
# Appendix A "Quality filtering" — the published MassiveWeb thresholds),
# re-expressed as pure JVM Columns. Every rule is SQL arithmetic, so the
# whole report is DuckDB-oracle-checkable.
# ---------------------------------------------------------------------------

#: a document must contain at least MIN_STOP_HITS of these words
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_cols(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> list[Column]:
    """Gopher quality features + per-rule flags + the keep verdict:

    - word count in [50, 100k]; mean word length in [3, 10] chars
    - symbol-to-word ratio ≤ 0.1 for ``#`` and ``...`` each
    - ≤90% of lines start with a bullet; ≤30% end with an ellipsis
    - ≥80% of words contain at least one alphabetic character
    - ≥2 hits of the 8-stop-word set (any multiplicity counts once
      per word occurrence; the paper requires two "of" the set — we
      count distinct members present, the common reading)
    """
    words = _nonempty_words(text)
    n_words = F.size(words)
    mean_wl = F.round(
        F.aggregate(words, F.lit(0).cast("long"), lambda a, w: a + F.length(w))
        / F.greatest(n_words, F.lit(1)),
        6,
    )
    n_hash = F.size(F.split(text, "#", -1)) - 1
    n_ellipsis = F.size(F.split(text, r"\.\.\.", -1)) - 1
    lines = _nonempty_lines(text)
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = F.round(
        F.size(F.filter(lines, lambda l: l.rlike(r"^[-*•]"))) / n_lines, 6
    )
    ellipsis_frac = F.round(
        F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.$"))) / n_lines, 6
    )
    alpha_frac = F.round(
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
        / F.greatest(n_words, F.lit(1)),
        6,
    )
    # _nonempty_words already lowercases
    stop_hits = sum(
        F.when(F.array_contains(words, w), 1).otherwise(0)
        for w in GOPHER_STOP_WORDS
    )
    sym_ok = (
        (F.round(n_hash / F.greatest(n_words, F.lit(1)), 6) <= max_symbol_word_ratio)
        & (
            F.round(n_ellipsis / F.greatest(n_words, F.lit(1)), 6)
            <= max_symbol_word_ratio
        )
    )
    rule_words = (n_words >= min_words) & (n_words <= max_words)
    rule_wl = (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    rule_lines = (bullet_frac <= max_bullet_line_frac) & (
        ellipsis_frac <= max_ellipsis_line_frac
    )
    rule_alpha = alpha_frac >= min_alpha_word_frac
    rule_stop = stop_hits >= min_stop_hits
    return [
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        bullet_frac.alias("bullet_line_frac"),
        ellipsis_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
        rule_words.alias("ok_word_count"),
        rule_wl.alias("ok_mean_word_len"),
        sym_ok.alias("ok_symbol_ratio"),
        rule_lines.alias("ok_line_shape"),
        rule_alpha.alias("ok_alpha_words"),
        rule_stop.alias("ok_stop_words"),
        (
            rule_words & rule_wl & sym_ok & rule_lines & rule_alpha & rule_stop
        ).alias("gopher_keep"),
    ]


def gopher_report(df: DataFrame, text_col: str, *keep_cols: str, **thresholds):
    """Per-document Gopher quality report (the `queries()` surface).
    Narrow per-row map over array HOFs — zero shuffles, runs inside the
    scan stage at any scale."""
    return df.select(*keep_cols, *gopher_cols(F.col(text_col), **thresholds))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    Stable across engines (md5 of utf-8 bytes)."""
    return F.md5(F.regexp_replace(F.lower(text), r"\s+", " "))


def vocab_topk(df, text_col: str, k: int = 1000, *, min_count: int = 1):
    """Corpus vocabulary induction: the ``k`` most frequent lowercased
    whitespace tokens with counts — the seed statistic for tokenizer
    training and OOV audits.

    Scale shape: the canonical distributed wordcount — explode is a
    narrow map, the count is ONE hash agg with map-side partial combine
    (frequent tokens collapse in the combiner, so the shuffle carries at
    most |vocab| rows per map partition, not |tokens|), and the global
    top-k is TakeOrderedAndProject (per-partition heaps), never a full
    sort. Ties break on the token for a deterministic boundary."""
    toks = F.explode(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"),
            lambda w: w != F.lit(""),
        )
    )
    out = (
        df.select(toks.alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    if min_count > 1:
        out = out.filter(F.col("n_occurrences") >= min_count)
    return out.orderBy(F.desc("n_occurrences"), "token").limit(k)


# ---------------------------------------------------------------------------
# Unicode text normalization — the pre-hash cleanup every web pipeline
# runs before dedup/fingerprinting (CCNet/Gopher fold unicode punctuation
# and whitespace first so cosmetic variants hash identically). A fixed
# regexp_replace chain, identical under Java regex (Spark JVM codegen)
# and RE2 (DuckDB oracle) — literal unicode chars in character classes,
# no lookaround, no \p classes. Full NFKC (ligatures, accents) needs ICU
# and is deliberately out: the folds below are the ones that change
# dedup behavior on web text.
# ---------------------------------------------------------------------------

#: zero-width chars + BOM: deleted outright
_ZERO_WIDTH = "[\u200b\u200c\u200d\u2060\ufeff]"
#: C0 (minus \t \n \r) + DEL + C1: deleted (mojibake / transfer noise)
_CONTROL = "[\u0000-\u0008\u000b\u000c\u000e-\u001f\u007f-\u009f]"
#: unicode spaces (NBSP, en/em/thin/ideographic\u2026) + tab: fold to ' '
_UNI_SPACE = "[\t\u00a0\u1680\u2000-\u200a\u202f\u205f\u3000]"
_SINGLE_QUOTES = "[\u2018\u2019\u201a\u201b\u2032]"
_DOUBLE_QUOTES = "[\u201c\u201d\u201e\u201f\u00ab\u00bb\u2033]"
_DASHES = "[\u2010\u2011\u2012\u2013\u2014\u2015\u2212]"


def normalize_text(text: Column) -> Column:
    """Fold unicode cosmetics to canonical ASCII forms and tidy
    whitespace. Order matters and is pinned by the oracle: zero-width
    strip → CRLF/CR → LF → control strip → space fold → quote/dash/
    ellipsis fold → space-run collapse → spaces around newlines → ≥3
    blank lines to one → trim."""
    c = F.regexp_replace(text, _ZERO_WIDTH, "")
    c = F.regexp_replace(c, "\r\n", "\n")
    c = F.regexp_replace(c, "\r", "\n")
    c = F.regexp_replace(c, _CONTROL, "")
    c = F.regexp_replace(c, _UNI_SPACE, " ")
    c = F.regexp_replace(c, _SINGLE_QUOTES, "'")
    c = F.regexp_replace(c, _DOUBLE_QUOTES, '"')
    c = F.regexp_replace(c, _DASHES, "-")
    c = F.regexp_replace(c, "…", "...")
    c = F.regexp_replace(c, " {2,}", " ")
    c = F.regexp_replace(c, " *\n *", "\n")
    c = F.regexp_replace(c, "\n{3,}", "\n\n")
    return F.regexp_replace(c, r"^\s+|\s+$", "")


# ---------------------------------------------------------------------------
# URL canonicalization — the dedup key-prep step of every web corpus
# pipeline (crawl frontiers and CC index dedup key on canonical url)
# ---------------------------------------------------------------------------

def canonical_url(url: Column) -> Column:
    """Canonical form for url-keyed dedup: lowercase scheme+host, default
    ports and fragments stripped, trailing slash on a bare path removed.
    Pure Column regexes (whole-stage codegen)."""
    u = F.trim(url)
    # split once: scheme://host[:port]/rest — lower only scheme+host
    head = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1))
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    head = F.regexp_replace(head, r"^(https://[^/:]*):443$", "$1")
    head = F.regexp_replace(head, r"^(http://[^/:]*):80$", "$1")
    out = F.concat(head, F.regexp_replace(rest, r"#.*$", ""))
    return F.regexp_replace(out, r"^([a-z][a-z0-9+.-]*://[^/?#]+)/$", "$1")


def url_host(url: Column) -> Column:
    """Registered host of a url (lowercased, port stripped)."""
    return F.lower(
        F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)", 1)
    )


def url_domain(url: Column) -> Column:
    """Last-two-label domain (example.org from a.b.example.org) — the
    hot-host skew/grouping key. Public-suffix nuance intentionally out of
    scope (no list dependency); two labels is the convention CC stats use."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


# ---------------------------------------------------------------------------
# HTML link extraction — the edge source for the link graph (PageRank
# prior, operators/graph.py) and crawl-frontier/outlink analytics
# ---------------------------------------------------------------------------

#: double-quoted href attribute values, in document order. Deliberately
#: quote-strict (the synthetic corpus and WARC fixtures emit canonical
#: quoting); oracle parity: DuckDB regexp_extract_all with group 1.
HREF_RE = r'href\s*=\s*"([^"]*)"'


def extract_links(html: Column) -> Column:
    """All href targets of an html string, document order, unresolved
    (relative links verbatim — resolution is a caller decision). ONE
    JVM regexp pass, codegen-friendly, no UDF."""
    return F.regexp_extract_all(html, F.lit(HREF_RE), 1)


def link_edges(df: DataFrame, url_col: str, html_col: str) -> DataFrame:
    """(src_host, dst_host) distinct host-level edges from absolute
    http(s) outlinks — the PageRank input. Self-loops dropped (a host
    linking itself adds no centrality signal and bloats hot hosts).

    Scale shape: explode(extract_links) is a narrow 1→k flat map; the
    only shuffle is the final distinct on the (already tiny) host-pair
    key — at web scale that agg is the edge-dedup every link-graph
    build pays exactly once."""
    links = df.select(
        url_host(F.col(url_col)).alias("src_host"),
        F.explode(extract_links(F.col(html_col))).alias("dst"),
    ).filter(F.col("dst").rlike(r"^https?://"))
    return (
        links.select("src_host", url_host(F.col("dst")).alias("dst_host"))
        .filter(F.col("src_host") != F.col("dst_host"))
        .distinct()
    )


#: <a href="...">text</a> pairs. Group 1 = target, group 2 = the visible
#: anchor text (tag-free runs only — nested markup inside an anchor is a
#: caller concern; the synthetic/WARC fixtures emit flat anchors). Same
#: pattern compiles under Java regex and RE2, so the DuckDB oracle zips
#: the two group extractions positionally exactly like the engine does.
ANCHOR_RE = r'<a\s[^>]*?href\s*=\s*"([^"]*)"[^>]*>([^<]*)</a>'


def extract_anchors(html: Column) -> Column:
    """``array<struct<href,anchor>>`` of a page's anchors, document order.
    Two JVM regexp passes over the same pattern (one per capture group)
    zipped positionally — identical match order, so the zip is exact.
    Still zero Python: regexp_extract_all + zip_with are codegen'd."""
    hrefs = F.regexp_extract_all(html, F.lit(ANCHOR_RE), 1)
    texts = F.regexp_extract_all(html, F.lit(ANCHOR_RE), 2)
    return F.zip_with(
        hrefs, texts,
        lambda h, t: F.struct(h.alias("href"), t.alias("anchor")),
    )


def anchor_edges(df: DataFrame, url_col: str, html_col: str) -> DataFrame:
    """(src_host, dst_host, anchor) rows for absolute http(s) outlinks —
    inbound anchor text is the classic off-page relevance/title signal a
    web-corpus pipeline aggregates per target (anchor-text indexing à la
    early web search; used for document titles and query-likelihood
    features in training corpora). Anchors are trimmed; empty anchors
    (image links) are dropped. Self-host loops dropped like link_edges.

    Scale shape: narrow 1→k flat map, NO shuffle here — aggregation
    choice (count per anchor, top-k) belongs to the caller so the
    exploded edges never materialize wider than one pipeline stage."""
    pairs = df.select(
        url_host(F.col(url_col)).alias("src_host"),
        F.explode(extract_anchors(F.col(html_col))).alias("a"),
    ).filter(F.col("a.href").rlike(r"^https?://"))
    return (
        pairs.select(
            "src_host",
            url_host(F.col("a.href")).alias("dst_host"),
            F.trim(F.col("a.anchor")).alias("anchor"),
        )
        .filter((F.col("src_host") != F.col("dst_host")) & (F.col("anchor") != ""))
    )


def top_anchors(edges: DataFrame, k: int = 3) -> DataFrame:
    """Top-k inbound anchor texts per dst_host by distinct linking host
    count (counting distinct hosts, not raw links, is the spam-resistant
    convention — one hot page repeating an anchor 10^6 times still votes
    once). Deterministic tie-break on the anchor string.

    Scale shape: ONE exchange on (dst_host, anchor) for the distinct +
    count (partial agg combines map-side), then the rank window runs over
    already-aggregated per-host anchor counts — cardinality ≤ distinct
    anchors, never raw edges."""
    counts = (
        edges.select("dst_host", "anchor", "src_host")
        .distinct()
        .groupBy("dst_host", "anchor")
        .agg(F.count(F.lit(1)).alias("n_hosts"))
    )
    w = Window.partitionBy("dst_host").orderBy(
        F.col("n_hosts").desc(), F.col("anchor").asc()
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


# ---------------------------------------------------------------------------
# PII redaction — training-data scrubbing (emails, phone numbers, ipv4)
# ---------------------------------------------------------------------------

#: redaction patterns: (tag, regex). Conservative, precision-leaning —
#: a corpus scrubber prefers missing an odd format to mangling prose.
PII_PATTERNS: list[tuple[str, str]] = [
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("PHONE", r"\+?\d{1,3}[-. (]{1,2}\d{3}[-. )]{1,2}\d{3}[-. ]?\d{4}"),
    ("IPV4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
]


def redact_pii(text: Column) -> Column:
    """Replace each PII match with ``<TAG>`` — chained JVM
    regexp_replace, no Python in the path."""
    out = text
    for tag, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"<{tag}>")
    return out


def pii_counts(text: Column) -> list[Column]:
    """Per-kind match counts (audit metrics for the scrub pass)."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(pat), 0)).alias(
            f"n_{tag.lower()}"
        )
        for tag, pat in PII_PATTERNS
    ]


# ---------------------------------------------------------------------------
# Repetition filters — the Gopher-style quality heuristics (Rae et al. 2021,
# "Scaling Language Models", Table A1) every public web-corpus pipeline
# applies: documents dominated by repeated lines / n-grams / list bullets
# are boilerplate, not prose. All pure Column expressions (whole-stage
# codegen; per-row array HOFs, no shuffle, no Python).
# ---------------------------------------------------------------------------

def _nonempty_lines(text: Column) -> Column:
    return F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )


def _nonempty_words(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != F.lit(""))


def _word_ngrams(words: Column, n: int) -> Column:
    """Word n-grams as space-joined strings; empty array for short docs
    (guarded: ``sequence`` would count DOWN for a negative span)."""
    idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + k) for k in range(n)]
        ),
    )
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def _max_multiplicity(arr: Column) -> Column:
    """Occurrences of the most frequent element: longest run in the sorted
    array, folded in one ``aggregate`` pass — the per-row "mode count"
    Spark lacks as a builtin. O(k log k) per row, no explode/shuffle."""
    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )
    return F.aggregate(F.array_sort(arr), zero, step, lambda acc: acc["best"])


def _repetition_feature_cols(
    lines: Column, grams_by_n: dict[int, Column]
) -> list[Column]:
    """The four repetition metrics from pre-split line/n-gram arrays."""
    n_lines = F.size(lines)
    feats = [
        F.when(
            n_lines > 0,
            F.round((n_lines - F.size(F.array_distinct(lines))) / n_lines, 6),
        ).otherwise(F.lit(0.0)).alias("dup_line_frac")
    ]
    for n, grams in grams_by_n.items():
        n_grams = F.size(grams)
        feats.append(
            F.when(
                n_grams > 0,
                F.round(_max_multiplicity(grams) / n_grams, 6),
            ).otherwise(F.lit(0.0)).alias(f"top{n}gram_frac")
        )
    bullety = F.filter(
        lines,
        lambda l: l.startswith("-") | l.startswith("*") | l.startswith("•")
        | l.endswith("..."),
    )
    feats.append(
        F.when(n_lines > 0, F.round(F.size(bullety) / n_lines, 6))
        .otherwise(F.lit(0.0)).alias("bullet_ellipsis_line_frac")
    )
    return feats


def repetition_report(df, text_col: str, *keep_cols: str):
    """Gopher-style repetition metrics per document:

    - ``dup_line_frac`` — fraction of non-empty lines that are repeats of
      an earlier line (1 - distinct/total);
    - ``top2gram_frac`` / ``top3gram_frac`` — fraction of all word
      2-/3-grams taken by the single most frequent one;
    - ``bullet_ellipsis_line_frac`` — fraction of lines that look like
      list bullets (-, *, •) or end in an ellipsis.

    Typical cut-offs (Gopher Table A1): dup_line_frac > 0.30,
    top2gram_frac > 0.20, bullet lines > 0.90 → drop the document.

    Two-step projection ON PURPOSE: the line/word arrays are split once
    per row and every feature reads the materialized arrays. Spark HOF
    lambdas are interpreted with no common-subexpression elimination, and
    Catalyst's CollapseProject declines to inline a non-trivial alias
    referenced more than once — so this shape is what keeps the text from
    being re-split ~10× per row on the 100 TB path."""
    t = F.col(text_col)
    split = df.select(
        *keep_cols,
        _nonempty_lines(t).alias("_lines"),
        _nonempty_words(t).alias("_words"),
    )
    base = split.select(
        *keep_cols,
        "_lines",
        _word_ngrams(F.col("_words"), 2).alias("_g2"),
        _word_ngrams(F.col("_words"), 3).alias("_g3"),
    )
    return base.select(
        *keep_cols,
        *_repetition_feature_cols(
            F.col("_lines"), {2: F.col("_g2"), 3: F.col("_g3")}
        ),
    )


# ---------------------------------------------------------------------------
# Corpus mixture report — per-(source, lang) composition stats used to set
# training-mixture weights and spot low-quality slices. A single hash
# aggregation with map-side partial combine: at 100 TB the group count is
# tiny (sources × langs), so the shuffle is negligible.
# ---------------------------------------------------------------------------

def corpus_mixture_stats(df, text_col: str, group_cols: list[str]):
    """Per-group doc/token/char counts plus the exact-duplicate rate
    (1 - distinct fingerprints / docs) inside each group."""
    t = F.col(text_col)
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(t)).alias("total_tokens"),
        F.round(F.avg(F.length(t)), 4).alias("mean_chars"),
        F.round(
            (F.count(F.lit(1)) - F.countDistinct(fingerprint(t)))
            / F.count(F.lit(1)),
            6,
        ).alias("dup_rate"),
    )


def boilerplate_lines(
    df, text_col: str, min_docs: int = 2, line_sep: str = "\n"
):
    """Cross-document duplicated-line report (exact substring-level dedup,
    the boilerplate-detection pass of a web-corpus pipeline): lines that
    appear in ≥ ``min_docs`` distinct documents, with their document
    counts. Counted once per document (``array_distinct`` before the
    explode), blank lines ignored.

    Scale shape: explode → one hash agg keyed by line with map-side
    partial combine — one shuffle whose volume is the distinct
    (line, map-partition) pairs, and boilerplate by definition collapses
    hard in the combiner. No Python anywhere."""
    lines = (
        df.select(
            F.explode(
                F.array_distinct(F.split(F.col(text_col), line_sep))
            ).alias("line")
        )
        .filter(F.trim(F.col("line")) != "")
    )
    return (
        lines.groupBy("line")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate(
    df, lines: list[str], text_col: str, line_sep: str = "\n"
):
    """Remove known boilerplate lines from every document — a narrow
    JVM-side map (split → HOF filter against a literal array → re-join),
    no shuffle, no Python. ``lines`` is driver-held (the top-K report
    from :func:`boilerplate_lines`); keep K bounded (≲10⁴ — the filter is
    O(K) per line). For unbounded boilerplate sets, broadcast-anti-join
    the exploded form instead. ``line_sep`` is a LITERAL separator (it is
    both the split point and the re-join string — regex-escaped for the
    split, so a CRLF corpus keeps its CRLFs)."""
    import re as _re

    lit = F.array(*[F.lit(l) for l in lines])
    arr = F.split(F.col(text_col), _re.escape(line_sep))
    kept = F.filter(arr, lambda l: ~F.array_contains(lit, l))
    return df.withColumn(text_col, F.array_join(kept, line_sep))


# ---------------------------------------------------------------------------
# HTML main-content text extraction — the html→text step every web-text
# corpus runs between the crawl and every downstream filter (CCNet,
# Gopher, RefinedWeb all start from an extracted-text column; reference
# analogue: the parser stage of the plugin chain, SURVEY §2.1 — raw
# bytes in, typed text out). A fixed regexp_replace chain: every
# pattern compiles identically under Java regex (Spark codegen) and
# RE2 (DuckDB oracle) — (?is) flags and lazy quantifiers only, NO
# backreferences and NO lookaround, so the per-tag block patterns are
# spelled out instead of using a \1 backref.
# ---------------------------------------------------------------------------

#: non-content blocks whose INNER TEXT must not leak into the corpus.
#: one lazy-dotall pattern per tag (RE2 has no backreferences).
HTML_DROP_BLOCK_TAGS = ("script", "style", "noscript", "template", "title")
#: html comments (conditional-comment junk included)
_HTML_COMMENT = r"(?s)<!--.*?-->"
#: <title>…</title> — group 1 is the title text
HTML_TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"
#: block-level tags that imply a line break in the rendered text
_HTML_BLOCK_TAG = (
    r"(?i)</?(?:p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|td|th|table|"
    r"section|article|header|footer|nav|blockquote|pre|hr|form)\b[^>]*>"
)
#: any remaining tag (inline spans, a, b, i, img, …) — deleted outright
_HTML_ANY_TAG = r"<[^>]+>"
#: adjacent block boundaries (</h1><p>, </li><li>, …) each emitted a
#: newline — fold every whitespace run containing ≥2 newlines to ONE
#: break (one rendered line per block, the extractor convention)
_HTML_NL_RUN = r"\n\s*\n"
#: entity folds, applied AFTER tag stripping (so &lt;p&gt; in prose can
#: never resurrect as a tag mid-chain). &amp; is folded LAST — the
#: standard single-pass decode order; double-encoded &amp;amp; becomes
#: &amp; (one level per pass, the conservative corpus convention).
HTML_ENTITY_FOLDS: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),
]


def _strip_html(html: Column) -> Column:
    """Comments → drop-blocks → block tags to \\n → all tags out →
    entity folds. Order is pinned by the oracle."""
    c = F.regexp_replace(html, _HTML_COMMENT, "")
    for tag in HTML_DROP_BLOCK_TAGS:
        c = F.regexp_replace(
            c, rf"(?is)<{tag}\b[^>]*>.*?</{tag}>", ""
        )
    c = F.regexp_replace(c, _HTML_BLOCK_TAG, "\n")
    c = F.regexp_replace(c, _HTML_ANY_TAG, "")
    c = F.regexp_replace(c, _HTML_NL_RUN, "\n")
    for ent, rep in HTML_ENTITY_FOLDS:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return c


def html_title(html: Column) -> Column:
    """Trimmed <title> text ('' when absent) — one JVM regexp_extract."""
    return F.trim(F.regexp_extract(html, HTML_TITLE_RE, 1))


def extract_page_text(df: DataFrame, html_col: str) -> DataFrame:
    """html → (title, text, text_ratio, n_words) columns appended.

    The JVM-side structural sibling of ``functions/extract.py``'s
    byte-level pandas-UDF extractor (which owns the CDC replay hot path
    where input is raw utf-8 payload BYTES): use THIS one when the html
    is already a string column and downstream wants block structure
    (line breaks), the <title>, and the text/html ratio — zero Python.

    ``text`` is the rendered main text: drop-blocks/tags stripped with
    block-tag line breaks, entities folded, then the SAME whitespace
    tidy ``normalize_text`` pins (the two share oracle constants).
    ``text_ratio`` = extracted chars / html chars (rounded 1e-6) — the
    classic boilerplate-heaviness signal pipelines threshold on.

    Scale shape: one narrow JVM projection per row — NO shuffle, no
    UDF, whole-stage-codegen throughout; at 100 TB this runs at scan
    speed and column-prunes to the html column alone."""
    h = F.col(html_col)
    text = normalize_text(_strip_html(h))
    return (
        df.withColumn("title", html_title(h))
        .withColumn("text", text)
        .withColumn(
            "text_ratio",
            F.round(F.length("text") / F.greatest(F.length(h), F.lit(1)), 6),
        )
        .withColumn("n_words", token_count(F.col("text")))
    )
