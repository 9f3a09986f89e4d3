"""Lake-to-lake replication (streaming/replicate.py + apply_changes):
a downstream replica maintained from the source's change feed at
O(change-set) cost — state-identical including byte-identical text,
crash-safe at every step boundary.

Reference analogue: per-destination bulk re-runs
(exec/BulkLoader.java:318-370) replaced by tailing the table's own feed.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from embulk_spark.sources.events import change_stream
from embulk_spark.streaming.lake import ParquetLakeTable
from embulk_spark.streaming.replay import apply_epoch
from embulk_spark.streaming.replicate import replicate_step


def _state(table):
    return {
        (r.url, r.seq, r.text)
        for r in table.published().select("url", "seq", "text").collect()
    }


def test_replica_tracks_source_per_epoch(spark, tmp_path):
    events = change_stream(spark, 4000, 500, 5, num_partitions=4).cache()
    src = ParquetLakeTable(spark, str(tmp_path / "src"), n_buckets=4,
                           compact_min_deltas=10_000)
    # different bucket count on purpose: apply_changes re-buckets
    rep = ParquetLakeTable(spark, str(tmp_path / "rep"), n_buckets=2,
                           compact_min_deltas=10_000)
    feed = str(tmp_path / "feed")
    for e in range(5):
        apply_epoch(src, events.filter(F.col("epoch") == e), e)
        out = replicate_step(src, rep, feed)
        assert out["applied_epochs"] == [e]
        assert _state(rep) == _state(src)  # text rides byte-identical
    # idle step is a no-op
    out = replicate_step(src, rep, feed)
    assert out["applied_epochs"] == [] and out["polled"]["noop"]


def test_crash_between_poll_and_apply_self_heals(spark, tmp_path):
    events = change_stream(spark, 3000, 400, 3, num_partitions=4).cache()
    src = ParquetLakeTable(spark, str(tmp_path / "src"), n_buckets=4,
                           compact_min_deltas=10_000)
    rep = ParquetLakeTable(spark, str(tmp_path / "rep"), n_buckets=4,
                           compact_min_deltas=10_000)
    feed = str(tmp_path / "feed")
    apply_epoch(src, events.filter(F.col("epoch") == 0), 0)
    # crash window: the poll lands the range and advances the cursor,
    # then the process dies BEFORE the replica applies it
    src.consume_changes(feed)
    assert rep.committed_epochs() == set()
    # more source progress before the retry
    apply_epoch(src, events.filter(F.col("epoch") == 1), 1)
    out = replicate_step(src, rep, feed)
    # the stale range AND the new one both apply, in order
    assert out["applied_epochs"] == [0, 1]
    assert _state(rep) == _state(src)
    # duplicate delivery of an applied range skips
    r = rep.apply_changes(
        spark.read.parquet(os.path.join(feed, sorted(
            d for d in os.listdir(feed) if d.startswith("range_"))[0])), 0,
    )
    assert r["skipped_duplicate_epoch"]


def test_lagging_replica_survives_source_auto_compaction(spark, tmp_path):
    """The replica lags 4 epochs while hot-mode auto-maintenance folds
    the source's deltas. feed_retain_epochs is sized to the worst
    consumer lag (the operational contract): the newest 4 epochs stay
    individually feed-servable while epochs the replica already consumed
    are free to fold, and the sync stays exact."""
    events = change_stream(spark, 6000, 700, 8, num_partitions=4).cache()
    src = ParquetLakeTable(spark, str(tmp_path / "src"), n_buckets=4,
                           compact_min_deltas=2, compact_mode="hot",
                           feed_retain_epochs=4)
    rep = ParquetLakeTable(spark, str(tmp_path / "rep"), n_buckets=4,
                           compact_min_deltas=10_000)
    feed = str(tmp_path / "feed")
    for e in range(4):
        apply_epoch(src, events.filter(F.col("epoch") == e), e)
    replicate_step(src, rep, feed)  # replica catches up to epoch 3
    for e in range(4, 8):  # maintenance fires while the replica lags
        apply_epoch(src, events.filter(F.col("epoch") == e), e)
    assert any(
        (src.snapshot_at(int(f[1:9])).get("metrics") or {}).get("partial")
        for f in src._snapshot_files()
    ), "auto maintenance never ran"
    out = replicate_step(src, rep, feed)
    assert out["applied_epochs"] == [7]
    assert _state(rep) == _state(src)


def test_prune_drops_applied_ranges(spark, tmp_path):
    events = change_stream(spark, 2000, 300, 3, num_partitions=4).cache()
    src = ParquetLakeTable(spark, str(tmp_path / "src"), n_buckets=4,
                           compact_min_deltas=10_000)
    rep = ParquetLakeTable(spark, str(tmp_path / "rep"), n_buckets=4,
                           compact_min_deltas=10_000)
    feed = str(tmp_path / "feed")
    for e in range(3):
        apply_epoch(src, events.filter(F.col("epoch") == e), e)
        replicate_step(src, rep, feed, prune=True)
    ranges = [d for d in os.listdir(feed) if d.startswith("range_")]
    # only the newest range (== the cursor) survives pruning
    assert len(ranges) == 1 and ranges[0].endswith("_2")
    assert _state(rep) == _state(src)
    # pruning never breaks the next sync
    apply_epoch(src, change_stream(spark, 500, 80, 1, num_partitions=4)
                .withColumn("seq", F.col("seq") + 90_000), 3)
    out = replicate_step(src, rep, feed, prune=True)
    assert out["applied_epochs"] == [3]
    assert _state(rep) == _state(src)


def test_evolve_propagates_added_columns(spark, tmp_path):
    """Additive schema evolution rides the feed: the source adds a
    column, later events carry it, and evolve=True turns the new feed
    column into a replica add_column DDL — values land per url."""
    events = change_stream(spark, 1500, 200, 2, num_partitions=4).cache()
    src = ParquetLakeTable(spark, str(tmp_path / "src"), n_buckets=4,
                           compact_min_deltas=10_000)
    rep = ParquetLakeTable(spark, str(tmp_path / "rep"), n_buckets=4,
                           compact_min_deltas=10_000)
    feed = str(tmp_path / "feed")
    apply_epoch(src, events.filter(F.col("epoch") == 0), 0)
    replicate_step(src, rep, feed)
    assert "score" not in rep.published().columns

    src.add_column("score", "bigint")
    e1 = events.filter(F.col("epoch") == 1).withColumn(
        "score", F.col("seq") % 7
    )
    apply_epoch(src, e1, 1)
    out = replicate_step(src, rep, feed, evolve=True)
    assert out["applied_epochs"] == [1]
    assert "score" in rep.published().columns
    want = {
        (r.url, r.score)
        for r in src.published().select("url", "score").collect()
    }
    got = {
        (r.url, r.score)
        for r in rep.published().select("url", "score").collect()
    }
    assert got == want
    # without evolve the extra column is (documented) dropped, not an error
    e2 = change_stream(spark, 400, 60, 1, num_partitions=4).withColumn(
        "seq", F.col("seq") + 80_000
    ).withColumn("score", F.lit(1))
    apply_epoch(src, e2, 2)
    rep2 = ParquetLakeTable(spark, str(tmp_path / "rep2"), n_buckets=4,
                            compact_min_deltas=10_000)
    replicate_step(src, rep2, str(tmp_path / "feed2"))
    assert "score" not in rep2.published().columns


def test_cli_replicate(spark, tmp_path, capsys):
    import json

    from embulk_spark import cli

    events = change_stream(spark, 1500, 250, 2, num_partitions=4)
    src_path = str(tmp_path / "src")
    src = ParquetLakeTable(spark, src_path, n_buckets=4,
                           compact_min_deltas=10_000)
    for e in range(2):
        apply_epoch(src, events.filter(F.col("epoch") == e), e)
    rc = cli.main([
        "replicate", src_path, str(tmp_path / "rep"), str(tmp_path / "feed"),
        "--buckets", "2",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["applied_epochs"] == [1]
    rep = ParquetLakeTable(spark, str(tmp_path / "rep"), n_buckets=2)
    assert _state(rep) == _state(src)
