"""Sitemap parsing and crawl-frontier scheduling — the discovery half
of the crawl-politeness surface (operators/robots.py is the permission
half). A pipeline refreshing a web corpus turns per-host sitemap.xml
bodies into a URL frontier, gates it through robots rules, and
schedules fetches so each host sees at most one request per
crawl-delay window.

The reference has no crawl surface; its closest shape is the guess →
parse → filter input chain (reference
embulk-core/src/main/java/org/embulk/spi/FileInputRunner.java:106-145),
which this mirrors as parse_sitemaps → robots gate → schedule.

Scale shape: sitemap bodies are O(hosts) rows but the parsed frontier
is O(urls). Parsing is a narrow 1→k explode of pure JVM regexps (no
XML library, no Python — the element subset below is the whole
sitemaps.org schema for <urlset>). Scheduling shuffles twice: once to
collapse duplicate <loc> entries (hash agg, map-side combine) and once
for the per-host politeness window — per-host sequencing is inherent
to politeness (the output IS a per-host queue), and host cardinality
dwarfs core counts at crawl scale, so the window parallelizes on
hosts; a pathological single-host frontier is capped by max urls/host,
not corpus size. Robots rules ride the broadcast inside robots_match —
the frontier never shuffles on host for the permission check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from embulk_spark.operators.robots import robots_match

#: sitemaps.org <urlset> element subset; (?s) lazy bodies, RE2-parity
#: (no backreferences/lookaround) so the DuckDB oracle runs the SAME
#: patterns.
SITEMAP_URL_BLOCK_RE = r"(?s)<url>(.*?)</url>"
SITEMAP_LOC_RE = r"(?s)<loc>\s*(.*?)\s*</loc>"
SITEMAP_LASTMOD_RE = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"
SITEMAP_PRIORITY_RE = r"(?s)<priority>\s*(.*?)\s*</priority>"
#: sitemaps.org default priority when the element is absent
SITEMAP_DEFAULT_PRIORITY = 0.5
#: <sitemapindex> child entries (sitemap-of-sitemaps)
SITEMAP_INDEX_BLOCK_RE = r"(?s)<sitemap>(.*?)</sitemap>"


def parse_sitemaps(
    sitemaps: DataFrame,
    host_col: str = "host",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """(host, loc, lastmod, priority) entries from raw sitemap.xml
    bodies: one regexp_extract_all → explode per <url> block, then one
    regexp_extract per element. Entries without <loc> are dropped
    (spec-invalid); missing <lastmod> → NULL date, missing/unparseable
    <priority> → the 0.5 spec default. W3C datetimes are accepted to
    day precision (date prefix); try-cast semantics match both
    engines."""
    entry = F.col("entry")
    lastmod = F.regexp_extract(entry, SITEMAP_LASTMOD_RE, 1)
    prio = F.regexp_extract(entry, SITEMAP_PRIORITY_RE, 1)
    return (
        sitemaps.select(
            F.col(host_col).alias("host"),
            F.explode(
                F.regexp_extract_all(
                    F.col(xml_col), F.lit(SITEMAP_URL_BLOCK_RE), F.lit(1)
                )
            ).alias("entry"),
        )
        .select(
            "host",
            F.regexp_extract(entry, SITEMAP_LOC_RE, 1).alias("loc"),
            F.substring(lastmod, 1, 10).try_cast("date").alias("lastmod"),
            F.coalesce(
                prio.try_cast("double"),
                F.lit(SITEMAP_DEFAULT_PRIORITY),
            ).alias("priority"),
        )
        .filter(F.col("loc") != "")
    )


def parse_sitemap_index(
    sitemaps: DataFrame,
    host_col: str = "host",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """(host, child_loc, lastmod) from ``<sitemapindex>`` bodies — the
    sitemap-of-sitemaps discovery step. A fetch loop alternates this
    with :func:`parse_sitemaps` until no child sitemaps remain: index
    bodies yield child urls to fetch, ``<urlset>`` bodies yield page
    entries. A body holding no ``<sitemap>`` blocks simply yields zero
    rows here (and vice versa for ``<url>`` blocks in parse_sitemaps),
    so both can run over a mixed batch without classification. Same
    pure-JVM 1→k regexp explode; up to one level of nesting per call
    matches the spec (an index MUST NOT list other index files)."""
    entry = F.col("entry")
    lastmod = F.regexp_extract(entry, SITEMAP_LASTMOD_RE, 1)
    return (
        sitemaps.select(
            F.col(host_col).alias("host"),
            F.explode(
                F.regexp_extract_all(
                    F.col(xml_col), F.lit(SITEMAP_INDEX_BLOCK_RE), F.lit(1)
                )
            ).alias("entry"),
        )
        .select(
            "host",
            F.regexp_extract(entry, SITEMAP_LOC_RE, 1).alias("child_loc"),
            F.substring(lastmod, 1, 10).try_cast("date").alias("lastmod"),
        )
        .filter(F.col("child_loc") != "")
    )


def schedule_frontier(
    entries: DataFrame,
    rules: DataFrame | None = None,
    agent: str = "*",
    delay_sec: float = 1.0,
) -> DataFrame:
    """Politeness-scheduled fetch queue from parsed sitemap entries:
    per host, urls are ordered by (priority DESC, lastmod DESC NULLS
    LAST, loc) and assigned consecutive slots; ``fetch_at_sec`` =
    slot × delay_sec is the earliest offset (seconds from the host's
    crawl start) honoring one-request-per-delay politeness. Duplicate
    <loc> entries (cross-sitemap repeats) collapse first with
    max(priority)/max(lastmod) — a deterministic hash agg, not a
    dropDuplicates race. When ``rules`` (a parse_robots frame) is
    given, disallowed urls are dropped before slots are assigned so a
    blocked url never holds a politeness window open."""
    e = entries.groupBy("host", "loc").agg(
        F.max("priority").alias("priority"),
        F.max("lastmod").alias("lastmod"),
    )
    if rules is not None:
        perm = robots_match(
            e.select(F.col("loc").alias("url")), rules, agent=agent
        ).filter(F.col("allowed"))
        e = e.join(perm.select(F.col("url").alias("loc")), "loc")
    w = Window.partitionBy("host").orderBy(
        F.desc("priority"), F.desc_nulls_last("lastmod"), F.asc("loc")
    )
    slot = F.row_number().over(w) - F.lit(1)
    return e.select(
        "host",
        "loc",
        "priority",
        "lastmod",
        slot.alias("slot"),
        F.round(slot * F.lit(float(delay_sec)), 3).alias("fetch_at_sec"),
    )


def frontier_oracle_sql(
    sitemaps_sql: str,
    robots_sql: str | None = None,
    agent: str = "*",
    delay_sec: float = 1.0,
) -> str:
    """DuckDB mirror of parse_sitemaps → schedule_frontier over inline
    relations: ``sitemaps_sql`` yields (host, sitemap_xml),
    ``robots_sql`` (optional) yields (host, robots_txt) and routes
    through the robots_oracle_sql permission gate exactly as
    schedule_frontier does. ``lastmod`` is rendered as VARCHAR (cast it
    on the Spark side too) so both engines' date cells compare as
    text."""
    from embulk_spark.operators.robots import robots_oracle_sql

    gate_cte = ""
    gate_join = ""
    if robots_sql is not None:
        perm = robots_oracle_sql(
            "SELECT loc AS url FROM _sm_dedup", robots_sql, agent=agent
        )
        gate_cte = f""",
_sm_perm AS (
  SELECT url FROM ({perm}) WHERE allowed
)"""
        gate_join = "JOIN _sm_perm p ON d.loc = p.url"
    return f"""
WITH _sm_parsed AS (
{sitemap_parse_oracle_sql(sitemaps_sql)}
),
_sm_dedup AS (
  SELECT host, loc, max(priority) AS priority, max(lastmod) AS lastmod
  FROM _sm_parsed GROUP BY host, loc
){gate_cte}
SELECT host, loc, priority, CAST(lastmod AS VARCHAR) AS lastmod, slot,
       round(slot * {float(delay_sec)!r}, 3) AS fetch_at_sec
FROM (
  SELECT d.host, d.loc, d.priority, d.lastmod,
         row_number() OVER (
           PARTITION BY d.host
           ORDER BY d.priority DESC, d.lastmod DESC NULLS LAST,
                    d.loc ASC) - 1 AS slot
  FROM _sm_dedup d {gate_join}
)
"""


def sitemap_parse_oracle_sql(sitemaps_sql: str) -> str:
    """DuckDB mirror of parse_sitemaps over an inline relation yielding
    (host, sitemap_xml) — generated from the SAME pattern constants."""
    return f"""
  SELECT host,
         regexp_extract(entry, '{SITEMAP_LOC_RE}', 1) AS loc,
         TRY_CAST(substr(regexp_extract(entry, '{SITEMAP_LASTMOD_RE}', 1),
                         1, 10) AS DATE) AS lastmod,
         coalesce(
           TRY_CAST(regexp_extract(entry, '{SITEMAP_PRIORITY_RE}', 1)
                    AS DOUBLE),
           {SITEMAP_DEFAULT_PRIORITY}) AS priority
  FROM (
    SELECT host,
           unnest(regexp_extract_all(sitemap_xml,
                  '{SITEMAP_URL_BLOCK_RE}', 1)) AS entry
    FROM ({sitemaps_sql})
  )
  WHERE regexp_extract(entry, '{SITEMAP_LOC_RE}', 1) <> ''
"""
