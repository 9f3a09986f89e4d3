"""Branch refs + fast-forward publish (Iceberg branch semantics): an
independent snapshot namespace over the shared data dir — the multi-epoch
generalization of WAP. Reference analogue: resumable transactions staged
apart from the committed output (exec/BulkLoader.java:584-659)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from embulk_spark.sources.events import change_stream
from embulk_spark.streaming.lake import CommitConflict, ParquetLakeTable
from embulk_spark.streaming.replay import apply_epoch, replay_batches


def _table(spark, path, n_epochs=2):
    events = change_stream(spark, 600, 100, n_epochs, num_partitions=4)
    table = ParquetLakeTable(
        spark, path, n_buckets=4, compact_min_deltas=10_000
    )
    replay_batches(table, events, pipeline_depth=1)
    return table, events


def _backfill(spark, n_epochs=3):
    return change_stream(spark, 500, 80, n_epochs, num_partitions=4) \
        .withColumn("seq", F.col("seq") + 50_000)


def test_branch_isolation_and_fast_forward(spark, tmp_path):
    table, _ = _table(spark, str(tmp_path / "t"))
    main_before = {(r.url, r.seq) for r in table.published().collect()}

    table.create_branch("backfill")
    br = table.branch("backfill")
    bf = _backfill(spark)
    for e in range(3):
        apply_epoch(br, bf.filter(F.col("epoch") == e), 100 + e)

    # invisible to main until fast-forward
    assert {(r.url, r.seq) for r in table.published().collect()} == main_before
    assert table.branches()["backfill"]["head_version"] > \
        table.branches()["backfill"]["fork_version"]
    want = {(r.url, r.seq) for r in br.published().collect()}
    assert want != main_before

    out = table.fast_forward("backfill")
    assert out["epochs_adopted"] == [100, 101, 102]
    assert {(r.url, r.seq) for r in table.published().collect()} == want
    # adopted epochs are idempotent on main now (dup delivery skips)
    rep = apply_epoch(table, bf.filter(F.col("epoch") == 0), 100)
    assert rep.get("skipped_duplicate_epoch")


def test_fast_forward_carries_empty_epoch_markers(spark, tmp_path):
    """Regression: empty-batch markers live in snapshot metrics, which
    fast_forward replaces — the publish snapshot must carry the adopted
    empty epochs, or main's change feed counts them as compacted away
    and raises for a fully-servable range."""
    table, _ = _table(spark, str(tmp_path / "t"))
    table.create_branch("bf")
    br = table.branch("bf")
    bf = _backfill(spark, 2)
    apply_epoch(br, bf.filter(F.col("epoch") == 0), 100)
    apply_epoch(br, bf.filter(F.lit(False)), 101)  # empty batch
    apply_epoch(br, bf.filter(F.col("epoch") == 1), 102)

    out = table.fast_forward("bf")
    assert out["epochs_adopted"] == [100, 101, 102]
    assert 101 in table._empty_epochs()
    # the feed over the adopted range serves — epoch 101 contributes no
    # rows but must not read as "compacted into the base"
    feed = table.changes_between(100, 102)
    assert feed.count() > 0


def test_fast_forward_requires_ancestor(spark, tmp_path):
    table, _ = _table(spark, str(tmp_path / "t"))
    table.create_branch("audit")
    br = table.branch("audit")
    bf = _backfill(spark, 1)
    apply_epoch(br, bf, 50)
    # main advances past the fork point → FF must refuse
    apply_epoch(table, _backfill(spark, 1).withColumn(
        "seq", F.col("seq") + 1_000_000), 60)
    with pytest.raises(CommitConflict, match="advanced past the fork"):
        table.fast_forward("audit")
    # the branch itself is still intact and readable
    assert br.published().count() > 0


def test_fast_forward_noop_and_unknown(spark, tmp_path):
    table, _ = _table(spark, str(tmp_path / "t"))
    table.create_branch("idle")
    assert table.fast_forward("idle")["noop"]
    with pytest.raises(ValueError, match="unknown branch"):
        table.fast_forward("nope")
    with pytest.raises(ValueError, match="does not exist"):
        ParquetLakeTable(spark, str(tmp_path / "t"), ref="nope")
    with pytest.raises(ValueError, match="invalid branch name"):
        table.create_branch("main")


def test_branch_files_survive_gc_until_dropped(spark, tmp_path):
    table, _ = _table(spark, str(tmp_path / "t"))
    table.create_branch("wip")
    br = table.branch("wip")
    apply_epoch(br, _backfill(spark, 1), 70)
    br_rows = br.published().count()

    # branch-only delta files are referenced by the branch ref, not main
    out = table.cleanup_orphans(grace_seconds=0.0)
    assert out["orphans_removed"] == 0
    assert br.published().count() == br_rows

    # branch-EXCLUSIVE files: the epoch-70 delta, not the fork-shared ones
    main_refs = {
        f for d in table.current_snapshot()["deltas"] for f in d["files"]
    } | {
        f for e in table.current_snapshot()["base"].values()
        for f in e["files"]
    }
    snap = br.current_snapshot()
    br_files = [
        os.path.join(str(tmp_path / "t"), f)
        for d in snap["deltas"] for f in d["files"] if f not in main_refs
    ]
    assert br_files  # the branch did write its own delta
    table.drop_branch("wip")
    out = table.cleanup_orphans(grace_seconds=0.0)
    assert out["orphans_removed"] >= 1
    assert not any(os.path.exists(p) for p in br_files)
    # main untouched
    assert table.published().count() > 0


def test_branch_compaction_and_wap_are_branch_scoped(spark, tmp_path):
    table, _ = _table(spark, str(tmp_path / "t"))
    table.create_branch("heavy")
    br = table.branch("heavy")
    bf = _backfill(spark, 2)
    for e in range(2):
        apply_epoch(br, bf.filter(F.col("epoch") == e), 200 + e)
    want = {(r.url, r.seq) for r in br.published().collect()}
    br.compact(buckets=[0, 1])  # partial compaction on the branch
    assert {(r.url, r.seq) for r in br.published().collect()} == want
    # a staged epoch on the branch is invisible to main's staged set
    m = br.merge_epoch(
        bf.filter(F.col("epoch") == 0)
        .withColumn("seq", F.col("seq") + 9_000_000)
        .filter(F.col("op") != "S"),
        250, stage=True,
    )
    assert 250 in br.staged_epochs() and 250 not in table.staged_epochs()
    br.abort_staged(250)


def test_cli_branch_workflow(spark, tmp_path, capsys):
    import json

    from embulk_spark import cli

    path = str(tmp_path / "t")
    table, _ = _table(spark, path)
    ev_dir = str(tmp_path / "bf")
    # epoch ids beyond main's: the fork inherits main's committed set, so
    # a replay of epochs 0/1 on the branch would dup-skip (by design)
    _backfill(spark, 2).withColumn("epoch", F.col("epoch") + 100) \
        .write.partitionBy("epoch").parquet(ev_dir)

    assert cli.main(["branch", path, "staging"]) == 0
    assert cli.main(["replay", ev_dir, path, "--ref", "staging",
                     "--buckets", "4"]) == 0
    assert cli.main(["branch", path, "--list"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    listed = json.loads(lines[-1])
    assert listed["staging"]["head_version"] > listed["staging"]["fork_version"]

    assert cli.main(["fast-forward", path, "staging"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["epochs_adopted"] == [100, 101]
    br = table.branch("staging")
    assert {(r.url, r.seq) for r in table.published().collect()} == {
        (r.url, r.seq) for r in br.published().collect()
    }


def test_create_branch_crash_safe_and_redeliverable(spark, tmp_path):
    """Seed-first write order: a crash between the seed snapshot and
    BRANCH.json leaves an INVISIBLE torn dir that a redelivery
    completes; if_not_exists makes redelivery of a completed create a
    skip (CREATE BRANCH IF NOT EXISTS)."""
    import datetime
    import os

    from embulk_spark.streaming.lake import ParquetLakeTable

    t = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    rows = [(1, "U", "a", datetime.datetime(2026, 7, 1), b"<html>x</html>",
             "en")]
    ev = spark.createDataFrame(
        rows, "seq long, op string, url string, warc_ts timestamp, "
              "html binary, lang string")
    t.merge_epoch(ev, 1)

    # simulate the crash window: seed written, BRANCH.json not
    snap = t.current_snapshot()
    bdir = os.path.join(t.path, "branches", "audit")
    os.makedirs(os.path.join(bdir, "snapshots"))
    import json as _json

    with open(os.path.join(bdir, "snapshots",
                           f"v{snap['version']:08d}.json"), "w") as f:
        _json.dump(snap, f)
    assert "audit" not in t.branches()  # torn dir is invisible

    # redelivery completes the create despite the leftover seed
    r = t.create_branch("audit", if_not_exists=True)
    assert r["branch"] == "audit" and "audit" in t.branches()
    # redelivery of the COMPLETED create skips
    r2 = t.create_branch("audit", if_not_exists=True)
    assert r2["skipped_existing"]
    # and without the flag, a duplicate create raises a clear error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="already exists"):
        t.create_branch("audit")


def test_fast_forward_redelivery_skips(spark, tmp_path):
    """A fast_forward that committed but crashed before returning must
    SKIP on redelivery (the adoption record is in the ref's history),
    while a genuinely-advanced main still conflicts."""
    import datetime

    import pytest as _pytest

    from embulk_spark.streaming.lake import CommitConflict, ParquetLakeTable

    def ev(e, url):
        rows = [(e * 10, "U", url, datetime.datetime(2026, 7, e, 9, 0),
                 f"<html>{url} v{e}</html>".encode(), "en")]
        return spark.createDataFrame(
            rows, "seq long, op string, url string, warc_ts timestamp, "
                  "html binary, lang string")

    t = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    t.merge_epoch(ev(1, "a"), 1)
    t.create_branch("audit")
    t.branch("audit").merge_epoch(ev(2, "b"), 2)
    r1 = t.fast_forward("audit")
    assert r1.get("epochs_adopted") == [2]
    # redelivery (crash after commit, before return): skip, not conflict
    r2 = t.fast_forward("audit")
    assert r2["skipped_duplicate"] and r2["version"] == r1["version"]
    # redelivery still skips after main advances further
    t.merge_epoch(ev(3, "c"), 3)
    r3 = t.fast_forward("audit")
    assert r3["skipped_duplicate"]
    # but NEW branch work after main advanced is a real conflict
    t.branch("audit").merge_epoch(ev(4, "d"), 4)
    with _pytest.raises(CommitConflict):
        t.fast_forward("audit")


def test_create_branch_redelivery_drops_stale_seed(spark, tmp_path):
    """Regression (r3 ADVICE #4): a crash between the seed-snapshot
    write and BRANCH.json, followed by a retry that forks at a LOWER
    at_version, used to leave the first attempt's higher-version seed in
    snapshots/ — branches()/fast_forward take the max-version file as
    the branch head, which then silently includes data past the
    requested fork point."""
    import json

    table, _ = _table(spark, str(tmp_path / "t"))  # several commits
    head = table.current_snapshot()["version"]
    assert head >= 2
    lower = head - 1

    # simulate the crashed first attempt: seed of the CURRENT head
    # written, BRANCH.json never committed
    bdir = os.path.join(table._branches_dir(), "audit")
    sdir = os.path.join(bdir, "snapshots")
    os.makedirs(sdir)
    with open(os.path.join(sdir, f"v{head:08d}.json"), "w") as f:
        json.dump(table.current_snapshot(), f)

    # redelivery picks an explicit lower fork point
    out = table.create_branch("audit", at_version=lower)
    assert out["fork_version"] == lower
    info = table.branches()["audit"]
    assert info["fork_version"] == lower
    assert info["head_version"] == lower  # stale head-seed removed
    # the branch handle serves the fork state, not the stale head
    br = table.branch("audit")
    want = {(r.url, r.seq)
            for r in table.published(version=lower).collect()}
    assert {(r.url, r.seq) for r in br.published().collect()} == want
