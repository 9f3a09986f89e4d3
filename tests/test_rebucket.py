"""Partition evolution: manifest-resident bucket count + online rebucket.

The layout contract: the SNAPSHOT says how urls hash to buckets; handles
adopt it (a second handle opened with a different ctor default must not
mis-prune lookups), rewrites change it atomically, and every commit that
carries old-layout data into a new layout is rejected."""

from __future__ import annotations

from pyspark.sql import functions as F

from embulk_spark.sources.events import change_stream
from embulk_spark.streaming.lake import ParquetLakeTable
from embulk_spark.streaming.replay import apply_epoch, replay_batches


def _table(spark, path, n_epochs=3, nb=4):
    events = change_stream(spark, 900, 120, n_epochs, num_partitions=4)
    table = ParquetLakeTable(spark, path, n_buckets=nb)
    replay_batches(table, events, pipeline_depth=1)
    return table, events


def _state(table):
    return {
        (r.url, r.seq)
        for r in table.published().select("url", "seq").collect()
    }


def test_rebucket_preserves_state_and_prunes_lookups(spark, tmp_path):
    table, _ = _table(spark, str(tmp_path / "t"), nb=4)
    before = _state(table)
    some_urls = sorted(u for (u, _) in before)[:5]
    want_rows = {
        r.url: r.seq for r in table.lookup_urls(some_urls).collect()
    }

    out = table.rebucket(16)
    snap = table.current_snapshot()
    assert out["n_buckets"] == 16 and snap["n_buckets"] == 16
    assert snap["deltas"] == []  # deltas folded into the new base
    assert set(snap["base"]).issubset({str(i) for i in range(16)})
    assert _state(table) == before
    got = {r.url: r.seq for r in table.lookup_urls(some_urls).collect()}
    assert got == want_rows

    # noop when already at the target
    assert table.rebucket(16)["noop"] is True


def test_second_handle_adopts_manifest_layout(spark, tmp_path):
    table, events = _table(spark, str(tmp_path / "t"), nb=4)
    table.rebucket(8)
    # ctor default disagrees with the manifest → manifest wins
    h2 = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    assert h2.n_buckets == 8
    assert _state(h2) == _state(table)
    # h2 writes a delta under the MANIFEST layout; lookups stay exact
    e_next = events.filter(F.col("epoch") == 0).withColumn(
        "seq", F.col("seq") + 10_000_000
    )
    apply_epoch(h2, e_next, 99)
    url = h2.published().select("url").first().url
    assert table.lookup_urls(url).count() == 1


def test_time_travel_reads_pre_rebucket_layout(spark, tmp_path):
    table, _ = _table(spark, str(tmp_path / "t"), nb=4)
    before = _state(table)
    v = table.current_snapshot()["version"]
    table.rebucket(16)
    old = table.read(version=v).filter(~F.col("is_deleted"))
    assert {(r.url, r.seq) for r in old.select("url", "seq").collect()} == before


def test_rebucket_refuses_staged_epochs(spark, tmp_path):
    import pytest

    table, events = _table(spark, str(tmp_path / "t"), n_epochs=2, nb=4)
    e = events.filter(F.col("epoch") == 0).withColumn(
        "seq", F.col("seq") + 10_000_000
    )
    table.merge_epoch(e, 51, stage=True)
    with pytest.raises(ValueError, match="staged"):
        table.rebucket(16)
    table.abort_staged(51)
    assert table.rebucket(16)["n_buckets"] == 16


def test_stale_stage_rejected_after_rebucket(spark, tmp_path):
    import pytest

    table, events = _table(spark, str(tmp_path / "t"), n_epochs=2, nb=4)
    e = events.filter(F.col("epoch") == 1).withColumn(
        "seq", F.col("seq") + 10_000_000
    )
    table.merge_epoch(e, 60, stage=True)
    # simulate an operator forcing the rewrite past the staged-epoch guard
    # (e.g. a second process that never saw the stage): publish must still
    # reject the old-layout change-set
    staged = table.staged_epochs()
    assert staged == {60}
    import os

    man_path = table._staged_path(60)
    man = table._load_staged(60)
    os.remove(man_path)
    table.rebucket(16)
    import json

    with open(man_path, "w") as f:
        json.dump(man, f)
    with pytest.raises(ValueError, match="rebucketed"):
        table.publish_staged(60)


def test_delta_commit_conflicts_with_concurrent_rebucket(spark, tmp_path):
    """The pipelined-replay race: an epoch hashed under nb=4 must not
    set-merge onto a snapshot a concurrent rebucket moved to nb=16."""
    import pytest

    from embulk_spark.streaming.lake import CommitConflict

    table, events = _table(spark, str(tmp_path / "t"), n_epochs=2, nb=4)
    snap = table.current_snapshot()
    fake_delta = {"files": [], "schema_v": snap["schema_v"], "rows": 0}
    table.rebucket(16)
    with pytest.raises(CommitConflict, match="bucket layout changed"):
        table._commit(
            snap, 77, metrics={}, lineage=[],
            new_delta=fake_delta, expect_nb=4,
        )


def test_rebucket_conflicts_with_concurrent_epoch(spark, tmp_path):
    """A delta committed between capture and the rebucket commit aborts
    the rewrite (it would otherwise vanish or stay mis-bucketed)."""
    import pytest

    from embulk_spark.streaming.lake import CommitConflict

    table, events = _table(spark, str(tmp_path / "t"), n_epochs=2, nb=4)
    snap = table.current_snapshot()
    # concurrent epoch lands after the rebucket captured `snap`
    e = events.filter(F.col("epoch") == 0).withColumn(
        "seq", F.col("seq") + 10_000_000
    )
    apply_epoch(table, e, 70)
    merged = table.read(version=snap["version"])
    new_base, total = table._write_bucketed_base(merged, snap, 4, "rebucket")
    with pytest.raises(CommitConflict, match="deltas changed"):
        table._commit(
            snap, None, metrics={}, lineage=[],
            new_base=new_base, new_base_rows=total,
            folded_deltas=snap["deltas"],
            expect_base_of=snap, expect_deltas_of=snap, n_buckets=4,
        )
    # the public API retries from the fresh snapshot and succeeds
    out = table.rebucket(16)
    assert out["n_buckets"] == 16
    assert 70 in table.committed_epochs()


def test_files_metadata_table(spark, tmp_path):
    table, _ = _table(spark, str(tmp_path / "t"), nb=4)
    fl = table.files()
    assert fl and all(f["kind"] in ("base", "delta") for f in fl)
    deltas = [f for f in fl if f["kind"] == "delta"]
    assert deltas  # pre-compaction: epochs live as deltas
    assert all(f["bytes"] and f["bytes"] > 0 for f in fl)
    table.rebucket(8)
    fl2 = table.files()
    assert all(f["kind"] == "base" for f in fl2)  # deltas folded
    assert {f["bucket"] for f in fl2}.issubset(set(range(8)))
    # time travel: the pre-rebucket snapshot still lists the old files
    old = table.files(version=table.current_snapshot()["version"] - 1)
    assert {f["path"] for f in old} == {f["path"] for f in fl}
