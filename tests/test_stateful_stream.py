"""Custom stateful streaming operator (applyInPandasWithState): the
per-url winner change-log must reconstruct exactly the batch dedup's
final state, survive a checkpoint restart, and keep its state small
(no payload columns)."""

from __future__ import annotations

from pyspark.sql import functions as F

from embulk_spark.operators.merge import dedup_latest
from embulk_spark.sources.events import change_stream
from embulk_spark.streaming.state import latest_state, track_url_state


def _batch_truth(events):
    latest = dedup_latest(events.filter("op <> 'S'").select(
        "url", "warc_ts", "seq", "op"))
    return {
        (r["url"], r["seq"], r["op"] == "D")
        for r in latest.collect()
    }


def test_stateful_tracker_matches_batch_dedup(spark, tmp_path):
    events = change_stream(spark, 2000, 250, 4, num_partitions=4).cache()
    src = str(tmp_path / "src")
    out = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    # first two epochs, then a simulated restart with the rest appended
    events.filter("epoch < 2").coalesce(1).write.mode("append").parquet(src)
    track_url_state(spark, src, ckpt, out)
    events.filter("epoch >= 2").coalesce(1).write.mode("append").parquet(src)
    track_url_state(spark, src, ckpt, out)  # resumes from checkpoint

    got = {
        (r["url"], r["seq"], r["is_deleted"])
        for r in latest_state(spark, out).collect()
    }
    assert got == _batch_truth(events)


def test_changelog_emits_only_changes(spark, tmp_path):
    events = change_stream(spark, 800, 100, 2, num_partitions=2).cache()
    src = str(tmp_path / "src")
    out = str(tmp_path / "log")
    events.coalesce(1).write.mode("append").parquet(src)
    track_url_state(spark, str(src), str(tmp_path / "c"), out)
    log = spark.read.parquet(out)
    # per url: at most one row per micro-batch, first row flagged first_seen
    firsts = log.filter("first_seen").groupBy("url").count()
    assert firsts.filter(F.col("count") > 1).count() == 0
    # a redelivery of the same files via a FRESH checkpoint only re-emits
    # rows consistent with the same final state (idempotent downstream)
    track_url_state(spark, str(src), str(tmp_path / "c2"), out)
    got = {
        (r["url"], r["seq"], r["is_deleted"])
        for r in latest_state(spark, out).collect()
    }
    assert got == _batch_truth(events)
