"""target_file_bytes: bytes-proportional compaction output sizing
(Delta OPTIMIZE's target file size). A huge target folds to ~1 file per
bucket (small-file coalescing); a tiny target splits the same data into
many more files; both layouts read back identically.
"""

from __future__ import annotations

from embulk_spark.sources.events import change_stream
from embulk_spark.streaming.lake import ParquetLakeTable
from embulk_spark.streaming.replay import replay_batches


def _base_files(table):
    snap = table.current_snapshot()
    return [f for e in snap["base"].values() for f in e["files"]]


def _build(spark, path, target):
    table = ParquetLakeTable(
        spark, path, n_buckets=4, compact_min_deltas=10_000,
        target_file_bytes=target,
    )
    events = change_stream(spark, 3000, 400, 2, num_partitions=4)
    replay_batches(table, events, pipeline_depth=1)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        table.compact()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return table


def test_huge_target_coalesces_to_one_file_per_bucket(spark, tmp_path):
    table = _build(spark, str(tmp_path / "t"), 1 << 30)
    snap = table.current_snapshot()
    assert snap["deltas"] == []
    for e in snap["base"].values():
        assert len(e["files"]) == 1
    assert table.published().count() > 0


def test_tiny_target_splits_and_reads_identically(spark, tmp_path):
    big = _build(spark, str(tmp_path / "big"), 1 << 30)
    small = _build(spark, str(tmp_path / "small"), 4 * 1024)
    assert len(_base_files(small)) > len(_base_files(big))
    key = lambda r: (r["url"], r["seq"])
    assert sorted(map(key, small.published().collect())) == sorted(
        map(key, big.published().collect())
    )


def test_none_target_keeps_legacy_partitioning(spark, tmp_path):
    # no target: output partitioning follows shuffle.partitions (legacy)
    table = ParquetLakeTable(
        spark, str(tmp_path / "t"), n_buckets=2, compact_min_deltas=10_000,
    )
    events = change_stream(spark, 600, 80, 1, num_partitions=4)
    replay_batches(table, events, pipeline_depth=1)
    table.compact()
    assert table.published().count() > 0
