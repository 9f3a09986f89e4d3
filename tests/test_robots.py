"""robots.txt parsing + URL permission matching (operators/robots.py):
RFC 9309 group semantics, longest-prefix/allow-on-tie resolution,
specific-agent shadowing, defaults, and DuckDB-oracle parity."""

from __future__ import annotations

import duckdb
import pandas as pd

from embulk_spark.operators.robots import (
    parse_robots,
    robots_match,
    robots_oracle_sql,
)

ROBOTS = {
    # comments, a two-agent header, an empty Disallow (dropped), and a
    # second group restarting after rules
    "a.com": (
        "# be nice\n"
        "User-agent: *\n"
        "Disallow: /private\n"
        "Allow: /private/ok\n"
        "Disallow:\n"
        "User-agent: GoodBot\n"
        "User-agent: OtherBot\n"
        "Disallow: /tmp\n"
        "Allow: /tmp/keep\n"
    ),
    # star-only host
    "b.com": "User-agent: *\nDisallow: /x\n",
    # CRLF + mixed-case directives
    "c.com": "USER-AGENT: goodbot\r\nDISALLOW: /y\r\n",
}


def _robots_df(spark):
    return spark.createDataFrame(
        [(h, t) for h, t in ROBOTS.items()], "host string, robots_txt string"
    )


def _match(spark, urls, agent):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = robots_match(df, parse_robots(_robots_df(spark)), agent=agent)
    return {r.url: (r.allowed, r.matched_path) for r in out.collect()}


def test_parse_groups_and_edges(spark):
    rules = {
        (r.host, r.agent, r.path, r.allow)
        for r in parse_robots(_robots_df(spark)).collect()
    }
    assert rules == {
        ("a.com", "*", "/private", False),
        ("a.com", "*", "/private/ok", True),
        ("a.com", "goodbot", "/tmp", False),
        ("a.com", "goodbot", "/tmp/keep", True),
        ("a.com", "otherbot", "/tmp", False),
        ("a.com", "otherbot", "/tmp/keep", True),
        ("b.com", "*", "/x", False),
        ("c.com", "goodbot", "/y", False),
    }


def test_match_resolution(spark):
    got = _match(
        spark,
        [
            "https://a.com/tmp/file",      # specific group: disallow /tmp
            "https://a.com/tmp/keep/f",    # longest match: allow /tmp/keep
            "https://a.com/private/x",     # star SHADOWED by specific → allow
            "https://a.com/other",         # no rule → default allow
            "https://b.com/x/1",           # star applies (no specific)
            "https://b.com",               # empty path treated as "/"
            "https://C.com/y/z",           # host compare case-insensitive
            "https://nowhere.com/q",       # no robots.txt → allow
        ],
        "GoodBot",
    )
    assert got["https://a.com/tmp/file"] == (False, "/tmp")
    assert got["https://a.com/tmp/keep/f"] == (True, "/tmp/keep")
    assert got["https://a.com/private/x"] == (True, None)
    assert got["https://a.com/other"] == (True, None)
    assert got["https://b.com/x/1"] == (False, "/x")
    assert got["https://b.com"] == (True, None)
    assert got["https://C.com/y/z"] == (False, "/y")
    assert got["https://nowhere.com/q"] == (True, None)


def test_star_agent_ignores_specific_groups(spark):
    got = _match(
        spark,
        ["https://a.com/private/x", "https://a.com/private/okay"],
        "*",
    )
    assert got["https://a.com/private/x"] == (False, "/private")
    # allow wins by length over the shorter disallow
    assert got["https://a.com/private/okay"] == (True, "/private/ok")


def test_spark_matches_duckdb_oracle(spark):
    urls = [
        "https://a.com/tmp/file", "https://a.com/tmp/keep/f",
        "https://a.com/private/x", "https://a.com/private/okay",
        "https://a.com/other", "https://b.com/x/1", "https://b.com",
        "https://c.com/y", "https://nowhere.com/q",
    ]
    udf_ = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        (r.url, r.allowed, r.matched_path)
        for r in robots_match(
            udf_, parse_robots(_robots_df(spark)), agent="GoodBot"
        ).collect()
    }
    con = duckdb.connect()
    con.register("urls_t", pd.DataFrame({"url": urls}))
    con.register(
        "robots_t",
        pd.DataFrame(
            {"host": list(ROBOTS), "robots_txt": list(ROBOTS.values())}
        ),
    )
    want = set(
        con.execute(
            robots_oracle_sql(
                "SELECT url FROM urls_t",
                "SELECT host, robots_txt FROM robots_t",
                agent="goodbot",
            )
        ).fetchall()
    )
    assert got == want
