"""WARC source (sources/warc.py): round-trip synth→parse parity, gzip
multi-member handling, malformed-record resync, HTTP envelope split,
and the binaryFile one-task-per-file read path."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from embulk_spark.sources.warc import (
    parse_warc_blobs,
    parse_warc_bytes,
    read_warc_files,
    warc_record_col,
    warcinfo_col,
)

N = 40


@pytest.fixture(scope="module")
def pages(spark):
    return spark.range(N).select(
        F.concat(F.lit("https://ex.org/p"), F.col("id")).alias("url"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("id").cast("double"))).alias("ts"),
        F.concat(F.lit("<html><body>doc "), F.col("id"),
                 F.lit(" é</body></html>")).alias("html"),
        (F.col("id") % 4).alias("grp"),
    )


@pytest.fixture(scope="module")
def blobs(spark, pages):
    # one warcinfo leader + the group's responses, concatenated per blob
    recs = pages.select(
        "grp", "url", warc_record_col(F.col("url"), F.col("ts"), F.col("html")).alias("rec")
    )
    return recs.groupBy("grp").agg(
        F.concat(
            warcinfo_col(F.concat(F.lit("synth-"), F.col("grp"))),
            F.concat_ws("", F.array_sort(F.collect_list(F.struct("url", "rec")))
                        .getField("rec")),
        ).cast("binary").alias("content")
    )


def test_roundtrip_parity(spark, pages, blobs):
    got = (
        parse_warc_blobs(blobs)
        .filter(F.col("warc_type") == "response")
        .select("url", "warc_ts", "http_status", "content_type",
                F.col("payload").cast("string").alias("html"))
    )
    want = pages.select("url", F.col("ts").alias("warc_ts"), "html")
    g = {r["url"]: r for r in got.collect()}
    w = {r["url"]: r for r in want.collect()}
    assert set(g) == set(w) and len(g) == N
    for u, r in g.items():
        assert r["http_status"] == 200
        assert r["content_type"] == "text/html; charset=utf-8"
        assert r["html"] == w[u]["html"]          # byte-identical body
        assert r["warc_ts"] == w[u]["warc_ts"]


def test_warcinfo_records_are_labeled_not_dropped(spark, blobs):
    types = dict(
        parse_warc_blobs(blobs).groupBy("warc_type").count().collect()
    )
    assert types == {"warcinfo": 4, "response": N}


def test_gzip_and_file_read_path(spark, pages, tmp_path):
    rows = pages.select(
        warc_record_col(F.col("url"), F.col("ts"), F.col("html")).alias("rec")
    ).collect()
    raw = "".join(r["rec"] for r in rows).encode("utf-8")
    (tmp_path / "a.warc").write_bytes(raw)
    # per-record gzip members, the Common-Crawl layout
    members = b"".join(
        gzip.compress(r["rec"].encode("utf-8")) for r in rows[:10]
    )
    (tmp_path / "b.warc.gz").write_bytes(members)

    out = read_warc_files(spark, str(tmp_path))
    per_file = {r["path"].rsplit("/", 1)[-1]: r["n"] for r in
                out.groupBy("path").agg(F.count("*").alias("n")).collect()}
    assert per_file == {"a.warc": N, "b.warc.gz": 10}
    assert out.filter(F.col("http_status") != 200).count() == 0


def test_malformed_record_resync():
    good = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://x/1\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 4\r\n\r\nBODY\r\n\r\n"
    )
    junk = b"not a warc record at all\r\n"
    no_len = b"WARC/1.0\r\nWARC-Type: metadata\r\n\r\n"
    recs = list(parse_warc_bytes(junk + good + no_len + good))
    assert [r["url"] for r in recs if r["warc_type"] == "response"] == [
        "https://x/1", "https://x/1"
    ]
    assert all(r["payload"] == b"BODY" for r in recs if r["warc_type"] == "response")


def test_payload_containing_warc_magic_is_not_split():
    body = b"inner\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nstill the same body"
    rec = (
        b"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Target-URI: https://x/r\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Type: text/plain\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body + b"\r\n\r\n"
    )
    recs = list(parse_warc_bytes(rec * 2))
    assert len(recs) == 2 and all(r["payload"] == body for r in recs)


def _raw_rec(wtype, url, ts, body=b"", extra=""):
    head = (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts}\r\nWARC-Record-ID: <urn:x:{wtype}:{url}>\r\n"
        f"{extra}Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


def _http(status, html):
    head = (f"HTTP/1.1 {status} X\r\nContent-Type: text/html\r\n\r\n").encode()
    return head, head + html


def test_warc_change_events_semantics(spark, tmp_path):
    """Crawl archive → CDC: 2xx responses upsert, revisits emit NOTHING
    (content unchanged by definition), errors/metadata drop; replay into
    the lake keeps the earlier capture for the revisited url."""
    from embulk_spark.sources.warc import warc_change_events
    from embulk_spark.streaming.lake import ParquetLakeTable

    _, ok = _http(200, b"<p>fresh</p>")
    _, err = _http(404, b"<p>gone</p>")
    blob = b"".join([
        _raw_rec("response", "https://ex.org/a", "2024-01-01T00:00:00Z", ok,
                 "Content-Type: application/http; msgtype=response\r\n"),
        _raw_rec("response", "https://ex.org/404", "2024-01-01T00:00:01Z",
                 err, "Content-Type: application/http; msgtype=response\r\n"),
        _raw_rec("revisit", "https://ex.org/a", "2024-01-02T00:00:00Z", b"",
                 "WARC-Profile: http://netpreserve.org/warc/1.0/revisit/"
                 "identical-payload-digest\r\n"),
        _raw_rec("metadata", "https://ex.org/a", "2024-01-02T00:00:00Z",
                 b"via: sitemap"),
    ])
    records = parse_warc_blobs(
        spark.createDataFrame([(bytearray(blob),)], "content binary")
    )
    ev = warc_change_events(records)
    rows = ev.collect()
    assert len(rows) == 1 and rows[0]["url"] == "https://ex.org/a"
    assert bytes(rows[0]["html"]) == b"<p>fresh</p>"

    table = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=2,
                             compact_min_deltas=10_000)
    table.merge_epoch(ev, 0)
    pub = table.published().collect()
    assert len(pub) == 1 and pub[0]["text"] == "fresh"
    # the revisit did NOT bump the retained version
    assert pub[0]["warc_ts"].day == 1
