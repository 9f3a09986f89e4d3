"""Point lookups (bucket-pruned) and predicate deletes (tombstone
commits): correctness, idempotence, WAP staging, scan pruning, and the
compaction url-sort that makes lookups row-group-prunable."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from embulk_spark.streaming.lake import ParquetLakeTable

COLS = "seq long, op string, url string, warc_ts timestamp, html binary, lang string"


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (seq, op, url, dt.datetime(2024, 1, 1, 0, 0, seq % 60), html, lang)
            for (seq, op, url, html, lang) in rows
        ],
        COLS,
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=8)
    rows = [(i, "I", f"https://h{i % 5}.test/p{i}", f"<doc {i}>".encode(), "en")
            for i in range(40)]
    t.merge_epoch(_events(spark, rows), 0, extract=False)
    return t


def test_lookup_urls_returns_live_rows_and_prunes(table, spark):
    got = table.lookup_urls(["https://h1.test/p1", "https://h2.test/p7", "nope"])
    rows = {r.url: bytes(r.html) for r in got.collect()}
    assert rows == {"https://h1.test/p1": b"<doc 1>",
                    "https://h2.test/p7": b"<doc 7>"}
    assert "is_deleted" not in got.columns and "bkt" not in got.columns
    # single-string form and empty form
    assert table.lookup_urls("https://h0.test/p0").count() == 1
    assert table.lookup_urls([]).count() == 0
    # pruning evidence: the IN filter reaches the scan as a pushed filter
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan and "In(url" in plan


def test_lookup_after_compaction_sorted_rowgroups(table, spark):
    import pyarrow.parquet as pq
    import os

    table.compact()
    got = {r.url for r in table.lookup_urls(["https://h3.test/p3"]).collect()}
    assert got == {"https://h3.test/p3"}
    # compacted files are url-sorted (row-group min/max become selective)
    snap = table.current_snapshot()
    some = next(iter(snap["base"].values()))["files"][0]
    urls = pq.read_table(os.path.join(table.path, some), columns=["url"])[
        "url"
    ].to_pylist()
    assert urls == sorted(urls)


def test_delete_where_tombstones_and_idempotence(table, spark):
    m = table.delete_where(F.col("url").startswith("https://h1."), 1)
    assert m["delete_keys"] == 8 and m["delete_where"]
    pub = {r.url for r in table.published().collect()}
    assert len(pub) == 32 and not any(u.startswith("https://h1.") for u in pub)
    # deleted urls vanish from lookups too
    assert table.lookup_urls(["https://h1.test/p1"]).count() == 0
    # duplicate delivery of the delete epoch no-ops
    assert table.delete_where(F.col("url").startswith("https://h1."), 1)[
        "skipped_duplicate_epoch"
    ]
    # delete-stays-deleted until a NEWER change: an older-ts re-insert loses
    table.merge_epoch(
        _events(spark, [(1, "I", "https://h1.test/p1", b"<old>", "en")]), 2,
        extract=False,
    )
    assert table.lookup_urls(["https://h1.test/p1"]).count() == 0
    # a strictly newer change resurrects (delete is a point-in-time event)
    ev = spark.createDataFrame(
        [(1000, "I", "https://h1.test/p1", dt.datetime(2025, 1, 1), b"<new>", "en")],
        COLS,
    )
    table.merge_epoch(ev, 3, extract=False)
    assert table.lookup_urls(["https://h1.test/p1"]).count() == 1


def test_delete_where_sql_string_and_wap_stage(table, spark):
    m = table.delete_where("lang = 'en' AND url LIKE '%p39'", 1, stage=True)
    assert m["stages"][-1] == "STAGED"
    # invisible until published
    assert table.lookup_urls(["https://h4.test/p39"]).count() == 1
    table.publish_staged(1)
    assert table.lookup_urls(["https://h4.test/p39"]).count() == 0
    assert table.published().count() == 39


def test_delete_where_bucket_restriction(table, spark):
    from embulk_spark.operators.merge import bucket_of

    url = "https://h2.test/p12"
    b = table.spark.createDataFrame([(url,)], "url string").select(
        bucket_of(F.col("url"), table.n_buckets).alias("b")
    ).collect()[0]["b"]
    m = table.delete_where(F.col("url") == url, 1, buckets=[int(b)])
    assert m["delete_keys"] == 1
    assert table.lookup_urls([url]).count() == 0
    assert table.published().count() == 39
