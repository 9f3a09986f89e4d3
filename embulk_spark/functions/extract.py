"""HTML→text extraction and language tagging — the engine's "parser/filter"
chain, as vectorized pandas/Arrow UDFs.

This replaces Embulk's ParserPlugin/FilterPlugin Java chain (reference
embulk-core/src/main/java/org/embulk/spi/FileInputRunner.java:106-145,
spi/util/FiltersInternal.java:41-88) with Arrow-batched pandas UDFs: one
Python invocation per Arrow batch, zero per-row Python at the Spark
boundary (north-rule requirement).

Byte-identity contract: ``extract_text_oracle`` is the PINNED reference
extractor — a pure function of the input bytes with no locale/env/time
dependence. The distributed path (``extract_text_udf``) maps the exact same
compiled-regex pipeline over each Arrow batch, so engine output is
byte-identical to the oracle by construction; tests additionally pin golden
md5 digests so any change to the shared pipeline is caught.

Malformed-byte policy mirrors the reference's LineDecoder: decode UTF-8
with REPLACE on malformed input
(embulk-core/src/main/java/org/embulk/spi/util/LineDecoder.java:43-46).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Fixed entity table (deterministic subset; order matters: longest first so
# '&amp;lt;' style double-escapes resolve the same way every time).
_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),  # must be last
]

_RE_SCRIPT = re.compile(r"(?is)<script\b.*?</script\s*>")
_RE_STYLE = re.compile(r"(?is)<style\b.*?</style\s*>")
_RE_COMMENT = re.compile(r"(?s)<!--.*?-->")
_RE_TAG = re.compile(r"(?s)<[^>]*>")
_RE_WS = re.compile(r"\s+")


def extract_text_from_str(html: str) -> str:
    """Pure deterministic text extraction from decoded HTML."""
    s = _RE_COMMENT.sub(" ", html)
    s = _RE_SCRIPT.sub(" ", s)
    s = _RE_STYLE.sub(" ", s)
    s = _RE_TAG.sub(" ", s)
    for ent, rep in _ENTITIES:
        s = s.replace(ent, rep)
    # whitespace collapse: " ".join(s.split()) is byte-identical to
    # _RE_WS.sub(" ", s).strip() (verified over all 0x110000 codepoints)
    # and ~3.5x faster — this line is >half the extractor's CPU.
    return " ".join(s.split())


def extract_text_oracle(html: bytes | None) -> str | None:
    """THE pinned oracle: bytes → extracted text (scalar form)."""
    if html is None:
        return None
    return extract_text_from_str(html.decode("utf-8", errors="replace"))


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) form of the oracle."""
    return html.map(extract_text_oracle)


def extract_text(html_col: Column) -> Column:
    """Column-level entry: html binary → text string."""
    return extract_text_udf(html_col)


# ---------------------------------------------------------------------------
# Language tagging — deterministic stopword-profile heuristic.
# ---------------------------------------------------------------------------

#: Tiny per-language stopword profiles. Deterministic and closed-world:
#: scores are exact integer counts, ties broken by fixed language order.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "this"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "für", "auf"),
    "fr": ("le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"),
    "ja": ("の", "に", "は", "を", "た", "が", "で", "て", "と", "です"),
}
_LANG_ORDER = ("en", "de", "fr", "ja")

#: hoisted frozensets — membership tests in the hot pandas-UDF loop must not
#: rebuild a set per word (O(words×profile) garbage per row otherwise)
_LANG_SETS: dict[str, frozenset] = {
    lang: frozenset(prof) for lang, prof in LANG_PROFILES.items()
}

_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def lang_of_text(text: str | None) -> str | None:
    """Scalar language-ID: stopword hit-count per profile, max wins,
    no hits → 'unknown'. Pure function of the text."""
    if text is None:
        return None
    low = text.lower()
    words = _WORD_RE.findall(low)
    wordset = set(words)
    best_lang, best_score = "unknown", 0
    for lang in _LANG_ORDER:
        prof = _LANG_SETS[lang]
        if lang == "ja":
            score = sum(low.count(tok) for tok in LANG_PROFILES[lang])
        else:
            score = sum(1 for w in words if w in prof) if wordset & prof else 0
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


@F.pandas_udf(T.StringType())
def lang_id_udf(text: pd.Series) -> pd.Series:
    return text.map(lang_of_text)


def lang_id(text_col: Column) -> Column:
    return lang_id_udf(text_col)
