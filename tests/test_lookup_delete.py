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


def test_update_where_rewrites_live_rows(table, spark):
    """Predicate UPDATE: matching rows get the set_exprs applied as a
    newer full-image U event; untouched columns carry through; the
    commit is idempotent and O(change-set)."""
    m = table.update_where(
        F.col("url").startswith("https://h1."), {"lang": "'de'"}, 1
    )
    assert m["update_where"] and m["update_set"] == ["lang"]
    pub = {r.url: (r.lang, bytes(r.html)) for r in table.published().collect()}
    assert len(pub) == 40
    for url, (lang, html) in pub.items():
        assert lang == ("de" if url.startswith("https://h1.") else "en")
        assert html.startswith(b"<doc ")  # html untouched
    # duplicate delivery skips
    assert table.update_where(
        F.col("url").startswith("https://h1."), {"lang": "'xx'"}, 1
    ).get("skipped_duplicate_epoch")
    # a later real change outranks the synthetic update
    ev = _events(spark, [(50, "U", "https://h1.test/p1", b"<doc new>", "fr")])
    table.merge_epoch(ev, 2, extract=False)
    got = {r.url: r.lang for r in table.published().collect()}
    assert got["https://h1.test/p1"] == "fr"


def test_update_where_key_columns_rejected(table):
    with pytest.raises(ValueError, match="cannot set"):
        table.update_where("true", {"url": "'x'"}, 9)


def test_update_where_html_triggers_reextract(spark, tmp_path):
    t = ParquetLakeTable(spark, str(tmp_path / "t2"), n_buckets=4)
    rows = [(i, "I", f"https://e.test/p{i}", f"<p>old {i}</p>".encode(), "en")
            for i in range(6)]
    t.merge_epoch(_events(spark, rows), 0)  # extract=True: text computed
    old_text = {r.url: r.text for r in t.published().collect()}
    assert all("old" in v for v in old_text.values())
    t.update_where(
        "url = 'https://e.test/p3'",
        {"html": "cast('<p>new body</p>' as binary)"},
        1,
    )
    got = {r.url: (bytes(r.html), r.text) for r in t.published().collect()}
    assert got["https://e.test/p3"][0] == b"<p>new body</p>"
    assert "new body" in got["https://e.test/p3"][1]  # text re-extracted
    for url, (h, txt) in got.items():
        if url != "https://e.test/p3":
            assert txt == old_text[url]


def test_cli_update_and_delete(table, capsys):
    import json

    from embulk_spark import cli

    rc = cli.main([
        "update", table.path, "url like 'https://h2.%'",
        "--set", json.dumps({"lang": "'fr'"}), "--epoch", "7",
        "--master", "local[4]",
    ])
    assert rc == 0
    rc = cli.main([
        "delete", table.path, "url like 'https://h3.%'",
        "--epoch", "8", "--master", "local[4]",
    ])
    assert rc == 0
    langs = {r.url: r.lang for r in table.published().collect()}
    assert all(not u.startswith("https://h3.") for u in langs)
    assert {v for u, v in langs.items() if u.startswith("https://h2.")} == {"fr"}
