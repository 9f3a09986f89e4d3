"""Sitemap parsing + crawl-frontier scheduling (operators/frontier.py):
element extraction edges, cross-sitemap dedup, politeness slotting, the
robots permission gate, and DuckDB-oracle parity on a literal fixture."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from embulk_spark.operators.frontier import (
    frontier_oracle_sql,
    parse_sitemap_index,
    parse_sitemaps,
    schedule_frontier,
)
from embulk_spark.operators.robots import parse_robots

SITEMAPS = {
    # two entries; first omits <priority> (spec default 0.5), second has
    # whitespace/newlines inside <loc> (trimmed by the \s* in the
    # pattern) and a sub-day W3C datetime (accepted to day precision)
    "a.com": (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>https://a.com/one</loc>"
        "<lastmod>2026-03-04</lastmod></url>"
        "<url><loc>\n  https://a.com/two </loc>"
        "<lastmod>2026-01-02T03:04:05Z</lastmod>"
        "<priority>0.9</priority></url>"
        "</urlset>"
    ),
    # spec-invalid entry without <loc> (dropped), junk priority (falls
    # back to 0.5), no lastmod anywhere
    "b.com": (
        "<urlset><url><lastmod>2026-05-06</lastmod></url>"
        "<url><loc>https://b.com/x</loc><priority>high</priority></url>"
        "</urlset>"
    ),
    # duplicate loc vs a.com's /one with a later lastmod and an explicit
    # priority — dedup must keep max of each independently
    "a2.com": (
        "<urlset><url><loc>https://a.com/one</loc>"
        "<lastmod>2026-07-08</lastmod><priority>0.2</priority></url>"
        "</urlset>"
    ),
}


def _sitemaps_df(spark, rows=None):
    rows = rows if rows is not None else list(SITEMAPS.items())
    return spark.createDataFrame(rows, "host string, sitemap_xml string")


def test_parse_elements_and_defaults(spark):
    rows = parse_sitemaps(_sitemaps_df(spark)).collect()
    # 5 <url> blocks total, the loc-less one dropped
    assert len(rows) == 4
    got = {(r.host, r.loc, str(r.lastmod), r.priority) for r in rows}
    assert got == {
        ("a.com", "https://a.com/one", "2026-03-04", 0.5),
        ("a.com", "https://a.com/two", "2026-01-02", 0.9),
        ("b.com", "https://b.com/x", "None", 0.5),
        ("a2.com", "https://a.com/one", "2026-07-08", 0.2),
    }


def test_schedule_dedup_and_slots(spark):
    # collapse the a.com/a2.com duplicate by loc REGARDLESS of which
    # sitemap host it came from: feed entries keyed by url host
    entries = parse_sitemaps(_sitemaps_df(spark)).withColumn(
        "host", F.regexp_extract("loc", r"://([^/]+)", 1)
    )
    out = {
        r.loc: r
        for r in schedule_frontier(entries, delay_sec=2.0).collect()
    }
    one = out["https://a.com/one"]
    # max(priority)=0.5 (default beats 0.2), max(lastmod)=2026-07-08
    assert (one.priority, str(one.lastmod)) == (0.5, "2026-07-08")
    # a.com queue: /two (prio 0.9) slot 0, /one slot 1 → 2 s offset
    assert out["https://a.com/two"].slot == 0
    assert (one.slot, one.fetch_at_sec) == (1, 2.0)
    assert out["https://b.com/x"].fetch_at_sec == 0.0


def test_robots_gate_before_slotting(spark):
    sitemap = (
        "<urlset>"
        "<url><loc>https://a.com/private/x</loc>"
        "<priority>0.9</priority></url>"
        "<url><loc>https://a.com/ok</loc></url>"
        "<url><loc>https://a.com/zz</loc></url>"
        "</urlset>"
    )
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private\n")],
        "host string, robots_txt string",
    )
    entries = parse_sitemaps(_sitemaps_df(spark, [("a.com", sitemap)]))
    out = {
        r.loc: r.slot
        for r in schedule_frontier(entries, parse_robots(robots)).collect()
    }
    # the disallowed high-priority url is gone and did NOT hold slot 0
    assert out == {"https://a.com/ok": 0, "https://a.com/zz": 1}


def test_sitemap_index_discovery(spark):
    index = (
        '<?xml version="1.0"?><sitemapindex>'
        "<sitemap><loc>https://a.com/sm1.xml</loc>"
        "<lastmod>2026-02-03</lastmod></sitemap>"
        "<sitemap><loc> https://a.com/sm2.xml\n</loc></sitemap>"
        "<sitemap><lastmod>2026-01-01</lastmod></sitemap>"
        "</sitemapindex>"
    )
    # mixed batch: one index body, one urlset body — each parser sees
    # only its own block kind, no classification step needed
    mixed = _sitemaps_df(
        spark, [("a.com", index), ("b.com", SITEMAPS["b.com"])]
    )
    kids = {
        (r.host, r.child_loc, str(r.lastmod))
        for r in parse_sitemap_index(mixed).collect()
    }
    assert kids == {
        ("a.com", "https://a.com/sm1.xml", "2026-02-03"),
        ("a.com", "https://a.com/sm2.xml", "None"),
    }
    pages = {r.loc for r in parse_sitemaps(mixed).collect()}
    assert pages == {"https://b.com/x"}


def test_oracle_parity_literal(spark):
    robots_rows = [("a.com", "User-agent: *\nDisallow: /private\n")]
    sm = _sitemaps_df(spark)
    got = (
        schedule_frontier(
            parse_sitemaps(sm),
            parse_robots(
                spark.createDataFrame(
                    robots_rows, "host string, robots_txt string"
                )
            ),
            delay_sec=1.5,
        )
        .withColumn("lastmod", F.col("lastmod").cast("string"))
        .toPandas()
    )
    vals = ", ".join(
        "('{}', '{}')".format(h, x.replace("'", "''"))
        for h, x in SITEMAPS.items()
    )
    sm_sql = f"SELECT * FROM (VALUES {vals}) AS t(host, sitemap_xml)"
    rb_sql = (
        "SELECT 'a.com' AS host, 'User-agent: *' || chr(10) || "
        "'Disallow: /private' || chr(10) AS robots_txt"
    )
    want = duckdb.sql(
        frontier_oracle_sql(sm_sql, rb_sql, delay_sec=1.5)
    ).df()
    key = lambda df: sorted(
        tuple(str(v) for v in row)
        for row in df[sorted(df.columns)].itertuples(index=False)
    )
    assert sorted(got.columns) == sorted(want.columns)
    assert key(got) == key(want)
