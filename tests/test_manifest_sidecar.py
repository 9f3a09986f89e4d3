"""Stats manifest sidecars: per-file stats/blooms live in immutable
uuid-named JSONs under ``manifests/``; snapshots carry only the
reference (``stats_ref``).

This is Iceberg's manifest-file layer: without it every snapshot inlines
every pending file's stats (a key bloom is KiBs of base64), so commit
metadata IO grows O(pending files) — quadratic over an uncompacted run.
With refs, a commit writes O(its own new files) manifest bytes plus a
small snapshot. Reference analogue: the resume-state file records task
reports, not task data (exec/BulkLoader.java:584-659).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_spark.sources.events import change_stream
from embulk_spark.streaming.lake import ParquetLakeTable
from embulk_spark.streaming.replay import apply_epoch, replay_batches


def _table(spark, path, **kw):
    kw.setdefault("n_buckets", 4)
    kw.setdefault("compact_min_deltas", 10_000)
    kw.setdefault("stats_columns", ("lang",))
    return ParquetLakeTable(spark, path, key_bloom=True, **kw)


def _snap_bytes(table):
    fn = sorted(os.listdir(table._snap_dir))[-1]
    p = os.path.join(table._snap_dir, fn)
    with open(p) as f:
        return os.path.getsize(p), f.read()


def _manifest_files(table):
    d = os.path.join(table.path, "manifests")
    return sorted(os.listdir(d)) if os.path.isdir(d) else []


# ------------------------------------------------------------- snapshot size


def test_snapshot_stays_small_stats_live_in_sidecars(spark, tmp_path):
    table = _table(spark, str(tmp_path / "t"))
    events = change_stream(spark, 1200, 150, 4, num_partitions=4)
    replay_batches(table, events, pipeline_depth=1)
    size, raw = _snap_bytes(table)
    snap = json.loads(raw)
    # no inline stats anywhere; every stats-bearing group holds a ref
    assert '"kb"' not in raw and '"cols"' not in raw
    for g in snap["deltas"]:
        assert "stats" not in g and g["stats_ref"].startswith("manifests/")
    assert _manifest_files(table)
    # the refs resolve and still drive pruning end-to-end
    plan = table.scan_plan([("url", "=", "u://definitely-absent")])
    assert plan["delta_files_read"] == 0 and plan["base_files_read"] == 0


def test_commit_metadata_growth_excludes_stats_payload(spark, tmp_path):
    """Snapshot-file growth per epoch must not include the stats/bloom
    payload — that payload lands in the sidecars."""
    table = _table(spark, str(tmp_path / "t"))
    events = change_stream(spark, 2000, 250, 5, num_partitions=4)
    replay_batches(table, events, pipeline_depth=1)
    sizes = sorted(
        os.path.getsize(os.path.join(table._snap_dir, fn))
        for fn in os.listdir(table._snap_dir)
    )
    manifest_bytes = sum(
        os.path.getsize(os.path.join(table.path, "manifests", fn))
        for fn in _manifest_files(table)
    )
    per_epoch_growth = (sizes[-1] - sizes[0]) / max(1, len(sizes) - 1)
    # a group entry + metrics is well under 2 KiB; the stats payload
    # (several KiB of bloom b64 per epoch) is visible in the sidecars
    assert per_epoch_growth < 2048
    assert manifest_bytes > per_epoch_growth * (len(sizes) - 1)


# ------------------------------------------------------------ compat/degrade


def test_group_stats_inline_backcompat_and_degrade(spark, tmp_path):
    table = _table(spark, str(tmp_path / "t"))
    inline = {"f.parquet": {"rows": 1, "bkt": [0, 0], "cols": {}}}
    assert table.group_stats({"stats": inline}) == inline
    assert table.group_stats({"files": []}) is None
    assert table.group_stats(None) is None
    # dangling ref (manifest lost) degrades to "no stats", not an error
    assert table.group_stats({"stats_ref": "manifests/m-gone.json"}) is None


def test_dangling_ref_scan_is_full_and_correct(spark, tmp_path):
    table = _table(spark, str(tmp_path / "t"))
    events = change_stream(spark, 600, 80, 2, num_partitions=4)
    replay_batches(table, events, pipeline_depth=1)
    expect = {(r.url, r.seq) for r in table.published().collect()}
    for fn in _manifest_files(table):
        os.remove(os.path.join(table.path, "manifests", fn))
    fresh = _table(spark, str(tmp_path / "t"))  # cold cache
    plan = fresh.scan_plan([("lang", "=", "de")])
    assert plan["files_skipped"] == 0  # nothing pruned without stats
    got = {(r.url, r.seq) for r in fresh.published().collect()}
    assert got == expect


# ----------------------------------------------------------------------- GC


def test_cleanup_gc_unreferenced_manifests_keeps_referenced(spark, tmp_path):
    table = _table(spark, str(tmp_path / "t"))
    events = change_stream(spark, 900, 120, 3, num_partitions=4)
    replay_batches(table, events, pipeline_depth=1)
    table.compact()
    table.expire_snapshots(keep_last=1)
    out = table.cleanup_orphans(grace_seconds=0.0)
    # pre-compaction delta manifests are now unreferenced debris
    assert out["manifests_removed"] > 0
    snap = table.current_snapshot()
    live_refs = {
        e["stats_ref"]
        for e in list(snap["base"].values()) + snap["deltas"]
        if e.get("stats_ref")
    }
    on_disk = {f"manifests/{fn}" for fn in _manifest_files(table)}
    assert live_refs <= on_disk
    # and the survivors still serve pruning
    u = table.published().select("url").orderBy("url").first()["url"]
    assert table.scan_plan([("url", "=", u)])["files_skipped"] > 0


def test_grace_window_protects_fresh_manifests(spark, tmp_path):
    table = _table(spark, str(tmp_path / "t"))
    events = change_stream(spark, 400, 60, 2, num_partitions=4)
    replay_batches(table, events, pipeline_depth=1)
    table.compact()
    table.expire_snapshots(keep_last=1)
    out = table.cleanup_orphans(grace_seconds=3600.0)
    assert out["manifests_removed"] == 0  # everything is younger than grace


def test_abort_staged_removes_its_manifest(spark, tmp_path):
    table = _table(spark, str(tmp_path / "t"))

    def _ev(seq, url):
        return {
            "seq": seq, "epoch": 0, "op": "I", "url": url,
            "warc_ts": datetime(2024, 1, 1, tzinfo=timezone.utc),
            "html": b"<p>x</p>", "lang": "en", "schema_change": None,
        }

    schema = T.StructType.fromDDL(
        "seq LONG, epoch LONG, op STRING, url STRING, warc_ts TIMESTAMP, "
        "html BINARY, lang STRING, schema_change STRING"
    )
    df = spark.createDataFrame([_ev(1, "u://a"), _ev(2, "u://b")], schema)
    table.merge_epoch(df, 0, stage=True)
    staged_refs = [
        json.load(open(os.path.join(table._staged_dir, fn)))["delta"]
        .get("stats_ref")
        for fn in os.listdir(table._staged_dir)
    ]
    assert staged_refs and all(r for r in staged_refs)
    # staged manifests are pinned against GC while the stage lives
    table.cleanup_orphans(grace_seconds=0.0)
    assert all(
        os.path.exists(os.path.join(table.path, r)) for r in staged_refs
    )
    table.abort_staged(0)
    assert all(
        not os.path.exists(os.path.join(table.path, r)) for r in staged_refs
    )


# -------------------------------------------------------- pipeline parity


def test_replay_with_sidecars_matches_oracle_shapes(spark, tmp_path):
    """End-to-end: sidecar-backed stats change nothing about results —
    replay + lookup equivalence against the unpruned read."""
    table = _table(spark, str(tmp_path / "t"))
    events = change_stream(spark, 800, 100, 4, num_partitions=4)
    replay_batches(table, events, pipeline_depth=2)
    pub = table.published()
    keys = [r.url for r in pub.select("url").orderBy("url").limit(4).collect()]
    got = {(r.url, r.seq) for r in table.lookup_urls(keys).collect()}
    want = {
        (r.url, r.seq)
        for r in pub.filter(F.col("url").isin(keys)).collect()
    }
    assert got == want


def test_residual_group_sidecar_after_partial_compact(spark, tmp_path):
    table = _table(spark, str(tmp_path / "t"))
    events = change_stream(spark, 900, 120, 3, num_partitions=4)
    replay_batches(table, events, pipeline_depth=1)
    table.compact(buckets=[0])
    snap = table.current_snapshot()
    resid = [d for d in snap["deltas"] if d.get("epoch_id") is None]
    assert resid and resid[0].get("stats_ref")
    st = table.group_stats(resid[0])
    assert set(st) == set(resid[0]["files"])
    for b, e in snap["base"].items():
        if int(b) == 0:
            assert e.get("stats_ref")
            assert set(table.group_stats(e)) == set(e["files"])

    # apply one more epoch over the partially compacted table: lookup
    # still exact through the mixed base/residual/fresh-delta layout
    extra = change_stream(spark, 150, 120, 1, num_partitions=2).withColumn(
        "seq", F.col("seq") + 90_000
    )
    apply_epoch(table, extra, 3)
    pub = table.published()
    u = pub.select("url").orderBy("url").first()["url"]
    got = {(r.url, r.seq) for r in table.lookup_urls(u).collect()}
    assert got == {
        (r.url, r.seq) for r in pub.filter(F.col("url") == u).collect()
    }
