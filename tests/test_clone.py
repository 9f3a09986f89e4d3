"""clone_to: zero-copy shallow clone (Delta SHALLOW CLONE / Iceberg
snapshot-ref table) via hard links — independent writes both ways,
duplicate-delivery protection carries over, and the clone survives the
source's compaction + cleanup_orphans because the links pin the inodes.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from embulk_spark.sources.events import change_stream
from embulk_spark.streaming.lake import ParquetLakeTable


def _events(spark):
    return change_stream(spark, 1200, 150, 3, num_partitions=4)


def _apply(table, events, epoch):
    table.merge_epoch(
        events.filter(F.col("epoch") == epoch).drop("epoch"), epoch,
        extract=False,
    )


def _state(table, *, version=None):
    rows = table.published(version=version).collect()
    return sorted((r["url"], r["seq"], r["warc_ts"]) for r in rows)


def test_clone_matches_and_diverges_independently(spark, tmp_path):
    ev = _events(spark)
    src = ParquetLakeTable(spark, str(tmp_path / "src"), n_buckets=4,
                           compact_min_deltas=10_000)
    _apply(src, ev, 0)
    _apply(src, ev, 1)
    out = src.clone_to(str(tmp_path / "dev"))
    assert out["files_copied"] == 0 and out["files_linked"] > 0
    dev = ParquetLakeTable(spark, str(tmp_path / "dev"))
    assert dev.n_buckets == 4
    assert _state(dev) == _state(src)

    # duplicate-delivery protection carries over to the clone
    skip = dev.merge_epoch(
        ev.filter(F.col("epoch") == 0).drop("epoch"), 0, extract=False
    )
    assert skip["skipped_duplicate_epoch"]

    # epoch 2 lands on the CLONE only; the source is untouched
    before_src = _state(src)
    _apply(dev, ev, 2)
    assert _state(src) == before_src
    assert _state(dev) != before_src

    # and a source-side delete doesn't reach the clone
    after_dev = _state(dev)
    src.delete_where("url IS NOT NULL", epoch_id=99)
    assert _state(dev) == after_dev


def test_clone_survives_source_compaction_and_gc(spark, tmp_path):
    ev = _events(spark)
    src = ParquetLakeTable(spark, str(tmp_path / "src"), n_buckets=2,
                           compact_min_deltas=10_000)
    _apply(src, ev, 0)
    _apply(src, ev, 1)
    src.clone_to(str(tmp_path / "dev"))
    dev = ParquetLakeTable(spark, str(tmp_path / "dev"))
    expect = _state(dev)
    # source rewrites its base and collects every pre-compaction file;
    # the hard links keep the clone's inodes alive
    src.compact()
    src.expire_snapshots(keep_last=1)
    src.cleanup_orphans(grace_seconds=0.0)
    assert _state(dev) == expect
    assert _state(src) == expect  # compaction is state-preserving


def test_clone_time_travel_version(spark, tmp_path):
    ev = _events(spark)
    src = ParquetLakeTable(spark, str(tmp_path / "src"), n_buckets=2,
                           compact_min_deltas=10_000)
    _apply(src, ev, 0)
    v_after_e0 = src.current_snapshot()["version"]
    _apply(src, ev, 1)
    src.clone_to(str(tmp_path / "old"), version=v_after_e0)
    old = ParquetLakeTable(spark, str(tmp_path / "old"))
    assert _state(old) == _state(src, version=v_after_e0)
    assert old.committed_epochs() == {0}


def test_clone_refuses_bad_destinations(spark, tmp_path):
    ev = _events(spark)
    src = ParquetLakeTable(spark, str(tmp_path / "src"), n_buckets=2,
                           compact_min_deltas=10_000)
    _apply(src, ev, 0)
    with pytest.raises(ValueError, match="itself"):
        src.clone_to(str(tmp_path / "src"))
    src.clone_to(str(tmp_path / "dev"))
    with pytest.raises(ValueError, match="already a table"):
        src.clone_to(str(tmp_path / "dev"))


def test_clone_links_stats_manifests(spark, tmp_path):
    ev = _events(spark)
    src = ParquetLakeTable(
        spark, str(tmp_path / "src"), n_buckets=2,
        compact_min_deltas=10_000, stats_columns=("warc_ts", "lang"),
    )
    _apply(src, ev, 0)
    src.clone_to(str(tmp_path / "dev"))
    dev = ParquetLakeTable(spark, str(tmp_path / "dev"))
    snap = dev.current_snapshot()
    refs = [d["stats_ref"] for d in snap["deltas"] if d.get("stats_ref")]
    assert refs
    for r in refs:
        assert os.path.exists(os.path.join(str(tmp_path / "dev"), r))
    # stats-driven scan planning works on the clone
    assert dev.scan_where([("lang", "=", "en")]).count() == \
        dev.published().filter(F.col("lang") == "en").count()
