"""HTML link extraction and the host-level link graph feeding PageRank."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from embulk_spark.functions.textops import (
    anchor_edges,
    extract_anchors,
    extract_links,
    link_edges,
    top_anchors,
)
from embulk_spark.operators.graph import pagerank


def _pages(spark):
    rows = [
        Row(
            url="http://a.com/x",
            html='<p>hi</p><a href="http://b.com/1">b</a>'
                 '<a href = "https://c.com:8080/2#f">c</a>'
                 '<a href="/rel">rel</a><a href="ftp://d.com/f">d</a>'
                 '<a href="http://a.com/self">self</a>',
        ),
        Row(url="http://b.com/y", html='<a href="http://a.com/z">a</a>'
                                       '<a href="http://a.com/z2">a again</a>'),
        Row(url="http://c.com/z", html="<p>no links</p>"),
        Row(url="http://e.com/w", html=None),
    ]
    return spark.createDataFrame(rows)


def test_extract_links_order_and_values(spark):
    got = (
        _pages(spark)
        .filter(F.col("url") == "http://a.com/x")
        .select(extract_links(F.col("html")).alias("links"))
        .collect()[0]
        .links
    )
    # document order, unresolved, quote-delimited only
    assert got == [
        "http://b.com/1",
        "https://c.com:8080/2#f",
        "/rel",
        "ftp://d.com/f",
        "http://a.com/self",
    ]


def test_link_edges_hosts_filters_and_dedup(spark):
    edges = {
        (r.src_host, r.dst_host) for r in link_edges(_pages(spark), "url", "html").collect()
    }
    # relative/ftp dropped, self-loop dropped, port stripped by url_host,
    # duplicate a->... edges deduped; the None-html row contributes nothing
    assert edges == {("a.com", "b.com"), ("a.com", "c.com"), ("b.com", "a.com")}


def test_pagerank_over_extracted_edges(spark):
    # end-to-end: html -> edges -> centrality; probability mass sums to 1
    edges = link_edges(_pages(spark), "url", "html").select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    ranks = pagerank(edges, iters=3, damping=0.85)
    rows = {r.node: r.rank for r in ranks.collect()}
    assert set(rows) == {"a.com", "b.com", "c.com"}
    assert abs(sum(rows.values()) - 1.0) < 1e-9
    # a.com has in-links from b.com and is the only 2-out-degree node's target
    assert rows["a.com"] == max(rows.values())


def _anchor_pages(spark):
    rows = [
        Row(
            url="http://s1.com/x",
            html='<a href="http://t.com/a">Best Page</a>'
                 '<a class="z" href="https://t.com/b"> Best Page </a>'
                 '<a href="http://t.com/c">other</a>'
                 '<a href="http://img.com/i"></a>'
                 '<a href="/rel">rel</a>'
                 '<a href="http://s1.com/self">self</a>',
        ),
        # s2 repeats "Best Page" twice → still ONE host vote (distinct)
        Row(url="http://s2.com/y", html='<a href="http://t.com/d">Best Page</a>'
                                        '<a href="http://t.com/e">Best Page</a>'
                                        '<a href="http://t.com/f">zzz</a>'),
        Row(url="http://s3.com/z", html='<a href="http://t.com/g">other</a>'),
    ]
    return spark.createDataFrame(rows)


def test_extract_anchors_pairs_in_order(spark):
    got = (
        _anchor_pages(spark)
        .filter(F.col("url") == "http://s1.com/x")
        .select(extract_anchors(F.col("html")).alias("a"))
        .collect()[0]
        .a
    )
    assert [(p.href, p.anchor) for p in got] == [
        ("http://t.com/a", "Best Page"),
        ("https://t.com/b", " Best Page "),
        ("http://t.com/c", "other"),
        ("http://img.com/i", ""),
        ("/rel", "rel"),
        ("http://s1.com/self", "self"),
    ]


def test_anchor_edges_filters(spark):
    edges = {
        (r.src_host, r.dst_host, r.anchor)
        for r in anchor_edges(_anchor_pages(spark), "url", "html").collect()
    }
    # empty anchors, relative links, self-loops dropped; anchors trimmed
    assert edges == {
        ("s1.com", "t.com", "Best Page"),
        ("s1.com", "t.com", "other"),
        ("s2.com", "t.com", "Best Page"),
        ("s2.com", "t.com", "zzz"),
        ("s3.com", "t.com", "other"),
    }


def test_top_anchors_distinct_host_vote_and_tiebreak(spark):
    top = top_anchors(anchor_edges(_anchor_pages(spark), "url", "html"), k=2)
    rows = [(r.anchor, r.n_hosts, r.rnk) for r in top.orderBy("rnk").collect()]
    # Best Page: 2 hosts (s2's repeat counts once); other: 2 hosts (s1, s3);
    # the 2-2 tie breaks lexicographically ("Best Page" < "other"), zzz (1
    # host) falls outside k=2
    assert rows == [("Best Page", 2, 1), ("other", 2, 2)]
