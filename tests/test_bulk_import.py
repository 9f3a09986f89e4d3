"""bulk_import: initial bulk load straight into the bucketed base (Hudi
bootstrap / Iceberg add_files; the reference's one-shot bulk-load run,
EmbulkRunner.java:239-276). One distributed write, no delta/compaction
debt; idempotent by epoch; later change events outrank the imported
baseline via the normal (warc_ts, seq) order.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from embulk_spark.functions.extract import extract_text_oracle
from embulk_spark.streaming.lake import ParquetLakeTable

TS = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(h):
    return TS + dt.timedelta(hours=h)


def _src(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, seq long, html binary, "
              "text string, lang string, op string",
    )


HTML_A = b"<html><body><p>Hello &amp; goodbye</p></body></html>"


def _rows():
    return [
        # duplicate url: the (warc_ts, seq)-latest must win
        ("http://a", _ts(0), 0, HTML_A, None, "en", "I"),
        ("http://a", _ts(2), 0, b"<p>newer a</p>", None, "en", "U"),
        # text provided by the source is kept verbatim (no re-extraction)
        ("http://b", _ts(1), 0, b"<p>ignored</p>", "provided text", "fr", "I"),
        # a changelog dump's tombstone imports as a tombstone
        ("http://c", _ts(1), 0, None, None, None, "D"),
        # null url rows are dropped
        (None, _ts(1), 0, None, None, None, "I"),
    ]


def test_import_dedups_extracts_and_keeps_tombstones(spark, tmp_table_dir):
    table = ParquetLakeTable(spark, tmp_table_dir, n_buckets=4)
    out = table.bulk_import(_src(spark, _rows()), epoch_id=0)
    assert out["import"] and out["rows_imported"] == 3
    pub = {r["url"]: r for r in table.published().collect()}
    assert set(pub) == {"http://a", "http://b"}  # tombstone hidden
    assert pub["http://a"]["text"] == extract_text_oracle(b"<p>newer a</p>")
    assert pub["http://b"]["text"] == "provided text"
    raw = {r["url"]: r for r in table.read().collect()}
    assert raw["http://c"]["is_deleted"] is True
    # the base landed directly: no deltas, no compaction debt
    snap = table.current_snapshot()
    assert snap["deltas"] == [] and snap["base_rows"] == 3


def test_import_is_idempotent_and_requires_empty_table(spark, tmp_table_dir):
    table = ParquetLakeTable(spark, tmp_table_dir, n_buckets=2)
    table.bulk_import(_src(spark, _rows()), epoch_id=7)
    again = table.bulk_import(_src(spark, _rows()), epoch_id=7)
    assert again["skipped_duplicate_epoch"]
    with pytest.raises(ValueError, match="empty table"):
        table.bulk_import(_src(spark, _rows()), epoch_id=8)
    assert 7 in table.committed_epochs()


def test_later_events_outrank_imported_baseline(spark, tmp_table_dir):
    table = ParquetLakeTable(spark, tmp_table_dir, n_buckets=2)
    table.bulk_import(_src(spark, _rows()), epoch_id=0)
    ev = spark.createDataFrame(
        [
            # same warc_ts as the imported winner, seq 1 > imported 0
            (1, "U", "http://a", _ts(2), b"<p>event wins</p>", "en"),
            # older than the imported winner: must lose
            (2, "U", "http://b", _ts(0), b"<p>stale</p>", "fr"),
            # resurrect the imported tombstone
            (3, "U", "http://c", _ts(9), b"<p>back</p>", "en"),
        ],
        "seq long, op string, url string, warc_ts timestamp, html binary, "
        "lang string",
    )
    table.merge_epoch(ev, epoch_id=1)
    pub = {r["url"]: r for r in table.published().collect()}
    assert pub["http://a"]["text"] == extract_text_oracle(b"<p>event wins</p>")
    assert pub["http://b"]["text"] == "provided text"
    assert pub["http://c"]["text"] == extract_text_oracle(b"<p>back</p>")


def test_import_from_parquet_path_with_target_file_size(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    n = 400
    df = spark.range(n).select(
        F.concat(F.lit("http://u"), F.col("id")).alias("url"),
        (F.lit(TS) + F.make_interval(secs=F.col("id"))).alias("warc_ts"),
        F.encode(F.concat(F.lit("<p>doc "), F.col("id"), F.lit("</p>")),
                 "utf-8").alias("html"),
        F.lit("en").alias("lang"),
    )
    df.write.parquet(src_dir)
    table = ParquetLakeTable(
        spark, str(tmp_path / "t"), n_buckets=4,
        target_file_bytes=1 << 30,  # huge target → 1 file per bucket
    )
    out = table.bulk_import(src_dir, epoch_id=0)
    assert out["rows_imported"] == n
    snap = table.current_snapshot()
    for e in snap["base"].values():
        assert len(e["files"]) == 1
    assert table.published().count() == n
    got = table.published().filter(F.col("url") == "http://u7").collect()
    assert got[0]["text"] == "doc 7"


def test_url_hll_seeded_by_import(spark, tmp_path):
    table = ParquetLakeTable(
        spark, str(tmp_path / "t"), n_buckets=2, url_hll=True
    )
    df = spark.range(500).select(
        F.concat(F.lit("http://u"), F.col("id")).alias("url"),
        F.lit(TS).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
    )
    table.bulk_import(df, epoch_id=0, extract=False)
    est = table.url_cardinality()
    assert est is not None and 350 <= est <= 650


def test_snapshot_handoff_equals_continuous_replay(spark, tmp_path):
    """The Debezium bootstrap contract: a consistent snapshot taken at
    stream order S imported as the base, then the tail replayed — with
    OVERLAP (some events ≤ S redelivered) — must equal a continuous
    replay of the whole stream. The imported baseline carries the
    snapshot rows' true (warc_ts, seq), so overlapping redelivery loses
    by order instead of regressing state."""
    from embulk_spark.operators.merge import dedup_latest
    from embulk_spark.sources.events import change_stream
    from embulk_spark.streaming.replay import replay_batches

    events = change_stream(spark, 1500, 200, 3, num_partitions=4).cache()
    data = events.filter("op <> 'S'")
    # handoff point: everything in epoch 0 is inside the snapshot
    S = data.filter("epoch = 0").agg(F.max("seq")).collect()[0][0]

    # consistent snapshot at S: winner per url over events with seq <= S
    snap_rows = dedup_latest(
        data.filter(F.col("seq") <= S)
        .select("url", "warc_ts", "seq", "op", "html", "lang")
    ).select(
        "url", "warc_ts", "seq", "html",
        F.lit(None).cast("string").alias("text"),
        "lang", "op",
    )
    boot = ParquetLakeTable(spark, str(tmp_path / "boot"), n_buckets=4,
                            compact_min_deltas=10_000)
    boot.bulk_import(snap_rows, epoch_id=0)
    # tail from S — with deliberate overlap back into the snapshot range
    overlap_lo = int(S * 0.8)
    tail = events.filter(
        (F.col("seq") > overlap_lo) | (F.col("op") == "S")
    ).withColumn("epoch", F.greatest(F.col("epoch"), F.lit(1)))
    replay_batches(boot, tail)

    control = ParquetLakeTable(spark, str(tmp_path / "cont"), n_buckets=4,
                               compact_min_deltas=10_000)
    replay_batches(control, events)

    got = sorted(
        (r["url"], r["seq"], r["text"])
        for r in boot.published().select("url", "seq", "text").collect()
    )
    want = sorted(
        (r["url"], r["seq"], r["text"])
        for r in control.published().select("url", "seq", "text").collect()
    )
    assert got == want and len(got) > 0
