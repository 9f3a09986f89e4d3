"""The full crawl-maintenance loop, end to end: sitemap → robots-gated
politeness frontier → (deterministic fake) fetch → snapshot-diff CDC
into the lake → change feed → recrawl scheduling. Two crawl cycles; the
lake must converge to each cycle's reality, the second cycle's epoch
must be O(actual changes), and the recrawl queue must rank the churning
url above the static one.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from embulk_spark.operators.frontier import parse_sitemaps, schedule_frontier
from embulk_spark.operators.recrawl import recrawl_schedule
from embulk_spark.operators.robots import parse_robots
from embulk_spark.streaming.lake import ParquetLakeTable

T1 = dt.datetime(2024, 3, 1, 0, 0, 0)
T2 = dt.datetime(2024, 3, 2, 0, 0, 0)

SITEMAP_C1 = """<?xml version="1.0"?><urlset>
<url><loc>http://a.example/page1</loc><priority>0.9</priority></url>
<url><loc>http://a.example/page2</loc><priority>0.5</priority></url>
<url><loc>http://a.example/private/x</loc><priority>1.0</priority></url>
<url><loc>http://b.example/only1</loc></url>
<url><loc>http://b.example/gone-next-cycle</loc></url>
</urlset>"""

# cycle 2: page2 vanished from a.example, a new page3 appeared, and
# b.example's gone-next-cycle is gone
SITEMAP_C2 = """<?xml version="1.0"?><urlset>
<url><loc>http://a.example/page1</loc><priority>0.9</priority></url>
<url><loc>http://a.example/page3</loc><priority>0.4</priority></url>
<url><loc>http://a.example/private/x</loc><priority>1.0</priority></url>
<url><loc>http://b.example/only1</loc></url>
</urlset>"""

ROBOTS = """User-agent: *
Disallow: /private/
"""


def _frontier(spark, xml_by_host):
    sitemaps = spark.createDataFrame(
        list(xml_by_host.items()), "host string, sitemap_xml string"
    )
    rules = parse_robots(
        spark.createDataFrame(
            [("a.example", ROBOTS), ("b.example", ROBOTS)],
            "host string, robots_txt string",
        )
    )
    return schedule_frontier(parse_sitemaps(sitemaps), rules, delay_sec=2.0)


def _fetch(frontier, crawl_ts, content_version):
    """Deterministic fake fetcher: content is a pure function of
    (url, version); page1 churns every cycle, everything else is
    version-stable."""
    ver = F.when(
        F.col("loc") == "http://a.example/page1", F.lit(content_version)
    ).otherwise(F.lit(0))
    return frontier.select(
        F.col("loc").alias("url"),
        (F.lit(crawl_ts) + F.make_interval(secs=F.col("fetch_at_sec"))).alias(
            "warc_ts"
        ),
        F.encode(
            F.concat(F.lit("<p>"), F.col("loc"), F.lit(" v"),
                     ver.cast("string"), F.lit("</p>")),
            "utf-8",
        ).alias("html"),
        F.lit("en").alias("lang"),
    )


def test_two_cycle_crawl_loop(spark, tmp_path):
    lake = ParquetLakeTable(spark, str(tmp_path / "lake"), n_buckets=4,
                            compact_min_deltas=10_000)

    # ---- cycle 1 ----
    f1 = _frontier(spark, {"a.example": SITEMAP_C1, "b.example": SITEMAP_C1})
    locs1 = {r["loc"] for r in f1.collect()}
    # robots gate: the disallowed path never enters the frontier
    assert "http://a.example/private/x" not in locs1
    assert "http://a.example/page1" in locs1
    # politeness: per host, consecutive 2 s slots
    slots = {
        (r["host"], r["slot"]): r["fetch_at_sec"] for r in f1.collect()
    }
    for (host, slot), at in slots.items():
        assert at == slot * 2.0
    m1 = lake.apply_snapshot(
        _fetch(f1, T1, 1), epoch_id=0, extract=True, assume_unique=True,
        delete_ts=str(T1),
    )
    assert m1["keys_in_batch"] == len(locs1)  # first crawl: all new

    # ---- cycle 2 ----
    f2 = _frontier(spark, {"a.example": SITEMAP_C2, "b.example": SITEMAP_C2})
    locs2 = {r["loc"] for r in f2.collect()}
    m2 = lake.apply_snapshot(
        _fetch(f2, T2, 2), epoch_id=1, extract=True, assume_unique=True,
        delete_ts=str(T2),
    )
    # O(actual changes): page1 changed, page3 new, 2 urls vanished;
    # every re-crawled-but-identical page emitted NOTHING
    changed = {"http://a.example/page1", "http://a.example/page3"}
    vanished = locs1 - locs2
    assert m2["keys_in_batch"] == len(changed) + len(vanished)
    assert m2["delete_keys"] == len(vanished) == 2

    pub = {r["url"]: r for r in lake.published().collect()}
    assert set(pub) == locs2
    assert pub["http://a.example/page1"]["text"].endswith("v2")
    assert pub["http://b.example/only1"]["text"].endswith("v0")
    # the unchanged page kept its cycle-1 version — no churn
    assert pub["http://b.example/only1"]["warc_ts"] < T2

    # ---- recrawl scheduling off the table's own change feed ----
    # per-epoch feed reads: changes_between serves NET winners per
    # (since, until] EPOCH range, so one read per cycle keeps the full
    # change log
    feed = lake.changes_between(-1, 0).unionByName(
        lake.changes_between(0, 1)
    )
    sched = {
        r["url"]: r
        for r in recrawl_schedule(
            feed.filter(~F.col("is_deleted")), ts_col="warc_ts",
            min_interval_sec=3600,
        ).collect()
    }
    # the churning url has 2 observed changes -> a ~1-day interval;
    # the static url has 1 -> clamped to max (it looks stable)
    assert sched["http://a.example/page1"]["n_changes"] == 2
    assert sched["http://b.example/only1"]["n_changes"] == 1
    assert (
        sched["http://a.example/page1"]["interval_sec"]
        < sched["http://b.example/only1"]["interval_sec"]
    )
    # overdue is relative to each url's own cadence: page1 was JUST
    # re-fetched (fraction of its 1-day interval elapsed ~0), while
    # only1 hasn't been seen since cycle 1 against its long clamp —
    # so the stable-but-stale page ranks as the more due of the two
    assert (
        sched["http://b.example/only1"]["overdue_ratio"]
        > sched["http://a.example/page1"]["overdue_ratio"]
    )
    # and the churning url's next fetch lands one interval after its
    # last observed change
    p1 = sched["http://a.example/page1"]
    assert (
        p1["next_fetch_at"] - p1["last_change"]
    ).total_seconds() == p1["interval_sec"]
