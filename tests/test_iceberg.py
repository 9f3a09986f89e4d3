"""Iceberg backend: interface parity always; end-to-end only when the
Iceberg Spark runtime jars are present (not shipped in this container —
the parquet backend in lake.py carries the CI correctness load with the
identical protocol)."""

from __future__ import annotations

import pytest

from embulk_spark.streaming import iceberg as ice
from embulk_spark.streaming.lake import ParquetLakeTable


def test_interface_parity():
    """IcebergLakeTable exposes the same sink surface as ParquetLakeTable
    so callers (replay, stream_events, cli) can swap backends."""
    for name in (
        "merge_epoch", "committed_epochs", "published",
        "add_column", "rename_column", "widen_column", "compact",
    ):
        assert hasattr(ice.IcebergLakeTable, name), name
        assert hasattr(ParquetLakeTable, name), name


def test_unavailable_raises_clear_error(spark):
    if ice.iceberg_available(spark):
        pytest.skip("iceberg runtime present; covered by e2e test below")
    with pytest.raises(RuntimeError, match="ParquetLakeTable"):
        ice.IcebergLakeTable(spark, "lake.db.t")


def test_iceberg_end_to_end(spark, tmp_path):
    if not ice.iceberg_available(spark):
        pytest.skip("iceberg spark runtime jars not on classpath")
    from embulk_spark.sources.events import change_stream
    from embulk_spark.streaming.replay import replay_batches

    t = ice.IcebergLakeTable(spark, "lake.db.pages", n_buckets=4)
    events = change_stream(spark, 500, 80, 2, num_partitions=4)
    out = replay_batches(t, events, pipeline_depth=1)
    assert len(out) == 2
    dup = t.merge_epoch(events.filter("epoch = 0"), 0)
    assert dup.get("skipped_duplicate_epoch")
    assert t.published().count() > 0


def test_iceberg_quarantine_end_to_end(spark, tmp_path):
    if not ice.iceberg_available(spark):
        pytest.skip("iceberg spark runtime jars not on classpath")
    from pyspark.sql import functions as F

    from embulk_spark.sources.events import change_stream
    from embulk_spark.streaming.replay import quarantine_df, replay_batches

    t = ice.IcebergLakeTable(spark, "lake.db.pages_q", n_buckets=4)
    events = change_stream(spark, 300, 50, 2, num_partitions=4)
    # poison a deterministic subset
    events = events.withColumn(
        "url", F.when(F.col("seq") % 11 == 0, F.lit(None)).otherwise(F.col("url"))
    )
    rules = [{"column": "url", "check": "not_null"}]
    out = replay_batches(t, events, pipeline_depth=1, quarantine_rules=rules)
    n_bad = sum(m.get("quarantined_rows", 0) for m in out)
    assert n_bad == events.filter("url IS NULL AND op <> 'S'").count()
    q = quarantine_df(t)
    assert q is not None and q.count() == n_bad
    # duplicate delivery neither re-merges nor re-quarantines
    again = replay_batches(t, events, pipeline_depth=1, quarantine_rules=rules)
    assert again == []
    assert quarantine_df(t).count() == n_bad
