"""Watermarked stream-stream enrichment join (streaming/joins.py):
the streaming result must equal the batch join under the SAME condition
(shared join_condition), survive a checkpoint restart without
re-emitting, and hold only watermark-bounded state.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from embulk_spark.sources.events import change_stream
from embulk_spark.streaming.joins import (
    enrich_changes,
    stream_enrich_changes,
)

TS = dt.datetime(2024, 1, 1)


def _fetch_log(spark, events):
    """Deterministic fetch records derived from the change stream: one
    fetch 10 minutes before each 3rd event, status from the seq hash."""
    return (
        events.filter(F.col("seq") % 3 == 0)
        .select(
            "url",
            (F.col("warc_ts") - F.expr("INTERVAL 10 MINUTES")).alias(
                "fetch_ts"
            ),
            (F.pmod(F.xxhash64("seq"), F.lit(2)) * 200 + 200)
            .cast("int")
            .alias("status"),
            (F.pmod(F.xxhash64("seq", F.lit(1)), F.lit(1000)))
            .cast("double")
            .alias("latency_ms"),
        )
    )


def _key(r):
    return (r["url"], r["seq"], r["f_fetch_ts"], r["f_status"])


def test_stream_join_matches_batch_and_resumes(spark, tmp_path):
    events = change_stream(spark, 1500, 120, 2, num_partitions=2,
                           with_html=False).cache()
    fetches = _fetch_log(spark, events).cache()
    src, fsrc = str(tmp_path / "ev"), str(tmp_path / "fetch")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    events.coalesce(1).write.parquet(src)
    fetches.coalesce(1).write.parquet(fsrc)

    stream_enrich_changes(spark, src, fsrc, ckpt, out, within="1 hour")
    got = spark.read.parquet(out)
    want = enrich_changes(events, fetches, within="1 hour")
    assert want.count() > 100  # the window actually matches things
    assert sorted(map(_key, got.collect())) == sorted(
        map(_key, want.collect())
    )

    # restart with NOTHING new: the checkpoint must not re-emit
    stream_enrich_changes(spark, src, fsrc, ckpt, out, within="1 hour")
    assert spark.read.parquet(out).count() == want.count()

    # append new data on both sides; resume emits exactly the new matches
    ev2 = events.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 90 DAYS")
    ).withColumn("seq", F.col("seq") + 1_000_000).cache()
    f2 = _fetch_log(spark, ev2).cache()
    ev2.coalesce(1).write.mode("append").parquet(src)
    f2.coalesce(1).write.mode("append").parquet(fsrc)
    stream_enrich_changes(spark, src, fsrc, ckpt, out, within="1 hour")
    want2 = enrich_changes(ev2, f2, within="1 hour")
    assert spark.read.parquet(out).count() == want.count() + want2.count()


def test_window_is_one_sided(spark, tmp_path):
    """A fetch AFTER the change must not match (the window ends at
    warc_ts); one 10-min-before fetch matches within 1 hour but not
    within 5 minutes."""
    spark_df = spark.createDataFrame(
        [(1, 0, "U", "u://a", TS + dt.timedelta(hours=1), None, None, None)],
        "seq long, epoch long, op string, url string, warc_ts timestamp, "
        "html binary, lang string, schema_change string",
    )
    fetch = spark.createDataFrame(
        [
            ("u://a", TS + dt.timedelta(minutes=50), 200, 5.0),   # before
            ("u://a", TS + dt.timedelta(minutes=70), 200, 5.0),   # after
        ],
        "url string, fetch_ts timestamp, status int, latency_ms double",
    )
    got = enrich_changes(spark_df, fetch, within="1 hour").collect()
    assert len(got) == 1
    assert got[0]["f_fetch_ts"] == TS + dt.timedelta(minutes=50)
    assert enrich_changes(spark_df, fetch, within="5 minutes").count() == 0


def test_left_outer_keeps_unmatched_changes(spark, tmp_path):
    events = change_stream(spark, 400, 60, 1, num_partitions=2,
                           with_html=False).cache()
    fetches = _fetch_log(spark, events)
    got = enrich_changes(events, fetches, within="1 hour",
                         join_type="left_outer")
    assert got.count() >= events.count()  # every change survives
    assert got.filter(F.col("f_fetch_ts").isNull()).count() > 0


def test_stream_rejects_unsupported_join_type(spark, tmp_path):
    with pytest.raises(ValueError, match="inner or left_outer"):
        stream_enrich_changes(
            spark, str(tmp_path / "a"), str(tmp_path / "b"),
            str(tmp_path / "c"), str(tmp_path / "d"), join_type="full_outer",
        )
