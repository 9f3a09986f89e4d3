"""RSS 2.0 / Atom feed parser — the web-crawl discovery input.

Crawlers tail feeds to find new/updated pages before re-crawling them;
a CDC ingest pipeline treats a feed poll exactly like a change-stream
tail (new entry ⇒ upsert candidate keyed by link). The reference
ecosystem covers this input with HTTP/feed input plugins on the same
flat-record contract as embulk-parser-xml (reference
spi/ParserPlugin.java:16-36); this re-expresses it on the
:mod:`.xml` machinery — no XML library, no Python in the data path.

Both dialects normalize to ONE record shape::

    (kind, guid, title, link, pub_ts)

- RSS item:   <guid>, <title>, <link>text</link>, <pubDate> RFC-822
- Atom entry: <id>,   <title>, <link href="…"/>,  <updated> ISO-8601

Kind is sniffed per document (``<feed`` ⇒ atom, else rss). Timestamps
parse in the session zone (the engine pins UTC, session.py:54); both
formats carry second precision. Missing fields → null, entities
unescape with the shared :func:`.xml.xml_unescape`.

Scale shape: one ``regexp_extract_all`` + ``explode`` per document
(1→k same-stage generator), then per-field ``regexp_extract`` — all
whole-stage codegen; a directory of feed polls parallelizes per file
like every FileInput."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .xml import xml_unescape

_RSS_ITEM = r"(?s)<item(\s[^>]*)?>(.*?)</item>"
_ATOM_ENTRY = r"(?s)<entry(\s[^>]*)?>(.*?)</entry>"


def _child(row: Column, tag: str) -> Column:
    hit = F.regexp_extract_all(
        row, F.lit(rf"(?s)<{tag}(?:\s[^>]*)?>(.*?)</{tag}>"), F.lit(1)
    )
    return xml_unescape(F.try_element_at(hit, F.lit(1)))


def _attr(row: Column, tag: str, attr: str) -> Column:
    hit = F.regexp_extract_all(
        row, F.lit(rf'(?s)<{tag}[^>]*\s{attr}="([^"]*)"'), F.lit(1)
    )
    return xml_unescape(F.try_element_at(hit, F.lit(1)))


def parse_feed_column(df: DataFrame, col: Column) -> DataFrame:
    """Explode every feed document in string Column ``col`` into
    normalized entry records (kind, guid, title, link, pub_ts)."""
    kind = F.when(col.contains("<feed"), F.lit("atom")).otherwise(
        F.lit("rss")
    )
    src = df.select(kind.alias("kind"), col.alias("_doc"))

    rss_rows = (
        src.filter(F.col("kind") == "rss")
        .select(
            "kind",
            F.explode(
                F.regexp_extract_all(
                    F.col("_doc"), F.lit(_RSS_ITEM), F.lit(0)
                )
            ).alias("_row"),
        )
    )
    r = F.col("_row")
    rss = rss_rows.select(
        "kind",
        _child(r, "guid").alias("guid"),
        _child(r, "title").alias("title"),
        _child(r, "link").alias("link"),
        F.to_timestamp(
            # strip the day-of-week prefix (Spark's post-3.0 parser
            # refuses E-patterns on parse) and the trailing zone word;
            # the engine session is UTC
            F.regexp_replace(
                F.regexp_replace(
                    _child(r, "pubDate"), F.lit(r"^[A-Za-z]{3},\s*"), F.lit("")
                ),
                F.lit(r"\s+(GMT|UT|Z|\+0000)$"),
                F.lit(""),
            ),
            "dd MMM yyyy HH:mm:ss",
        ).alias("pub_ts"),
    )

    atom_rows = (
        src.filter(F.col("kind") == "atom")
        .select(
            "kind",
            F.explode(
                F.regexp_extract_all(
                    F.col("_doc"), F.lit(_ATOM_ENTRY), F.lit(0)
                )
            ).alias("_row"),
        )
    )
    atom = atom_rows.select(
        "kind",
        _child(r, "id").alias("guid"),
        _child(r, "title").alias("title"),
        F.coalesce(_attr(r, "link", "href"), _child(r, "link")).alias(
            "link"
        ),
        F.to_timestamp(
            _child(r, "updated"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ).alias("pub_ts"),
    )
    return rss.unionByName(atom)


def feed_refresh_candidates(
    entries: DataFrame,
    published: DataFrame,
    *,
    link_col: str = "link",
    ts_col: str = "pub_ts",
    url_col: str = "url",
    published_ts_col: str = "warc_ts",
) -> DataFrame:
    """Close the discovery loop: feed entries assert "page at ``link``
    changed at ``pub_ts``" but carry no content — the CDC-correct
    reading is a FETCH CANDIDATE, not an upsert. Join the freshest
    per-link feed claim against the lake's published (url, warc_ts)
    and emit what the crawler must fetch:

    - ``new``:   the lake has never seen the url;
    - ``stale``: the feed claims a change newer than the stored
      version.

    Links the lake already holds at feed freshness (or newer) emit
    nothing — a feed poll over an up-to-date lake is free. One
    map-side-combinable max per link, then one equi-join on the url
    key; output feeds ``operators/frontier.py`` / ``recrawl.py``."""
    latest = (
        entries.filter(
            F.col(link_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .groupBy(F.col(link_col).alias("url"))
        .agg(F.max(ts_col).alias("feed_ts"))
    )
    pub = published.select(
        F.col(url_col).alias("_purl"),
        F.col(published_ts_col).alias("_pts"),
    )
    status = (
        F.when(F.col("_pts").isNull(), F.lit("new"))
        .when(F.col("feed_ts") > F.col("_pts"), F.lit("stale"))
    )
    return (
        latest.join(pub, latest["url"] == pub["_purl"], "left")
        .select("url", "feed_ts", status.alias("status"))
        .filter(F.col("status").isNotNull())
    )
