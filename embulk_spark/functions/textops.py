"""Text analysis for web-scale training-data pipelines — token counting,
quality scoring, language-ID, document fingerprinting.

All hot-path functions are pure JVM-side Column expressions (whole-stage
codegen; no Python). These extend the reference's text handling
(LineDecoder charset/newline handling,
/root/reference/embulk-core/src/main/java/org/embulk/spi/util/LineDecoder.java:24-50)
into the analysis layer a 100 TB corpus pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def token_count(text: Column) -> Column:
    """Whitespace token count (empty string counts 1 split-token — matches
    both engines' split semantics; callers can gate on length)."""
    return F.size(F.split(F.trim(text), r"\s+"))


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


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    Stable across engines (md5 of utf-8 bytes)."""
    return F.md5(F.regexp_replace(F.lower(text), r"\s+", " "))


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
