"""Manifest-resident url-cardinality HLL: lockstep with epoch commits —
incremental == batch registers through resume, duplicate delivery,
compaction, and rollback+replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from embulk_spark.operators.sketch import estimate_from_registers, hll_sketch
from embulk_spark.sources.events import change_stream
from embulk_spark.streaming.lake import ParquetLakeTable
from embulk_spark.streaming.replay import replay_batches


def _batch_regs(events):
    urls = events.filter(F.col("op") != "S").select("url")
    return {
        str(r["bucket"]): int(r["rho"]) for r in hll_sketch(urls, "url", []).collect()
    }


def test_lake_hll_incremental_equals_batch(spark, tmp_path):
    ev = change_stream(spark, 900, 140, 3, with_html=False)
    path = str(tmp_path / "t")
    t = ParquetLakeTable(spark, path, n_buckets=4, url_hll=True)
    replay_batches(t, ev, max_epochs=2)
    # crash-sim: fresh handle resumes the remaining epoch
    t2 = ParquetLakeTable(spark, path, n_buckets=4, url_hll=True)
    replay_batches(t2, ev)
    snap = t2.current_snapshot()
    # every url that entered any committed delta is in the sketch; the
    # batch sketch over all raw events must match register-for-register
    # (dedup keeps one winner per url per epoch, but HLL over a subset
    # containing every distinct url equals HLL over the multiset)
    assert snap["url_hll"] == _batch_regs(ev)
    est = t2.url_cardinality()
    assert est == estimate_from_registers(snap["url_hll"])
    n_urls = ev.select("url").distinct().count()
    assert abs(est - n_urls) / n_urls < 0.25  # p=8 raw error band

    # duplicate delivery: re-applying epoch 0 is a no-op for the sketch
    from embulk_spark.streaming.replay import apply_epoch

    before = t2.current_snapshot()["url_hll"]
    m = apply_epoch(t2, ev.filter(F.col("epoch") == 0), 0)
    assert m.get("skipped_duplicate_epoch")
    assert t2.current_snapshot()["url_hll"] == before

    # compaction folds deltas but never the sketch
    t2.compact()
    assert t2.current_snapshot()["url_hll"] == before


def test_lake_hll_rollback_then_replay_remerges(spark, tmp_path):
    ev = change_stream(spark, 600, 90, 3, with_html=False)
    path = str(tmp_path / "t")
    t = ParquetLakeTable(spark, path, n_buckets=4, url_hll=True)
    replay_batches(t, ev)
    full = t.current_snapshot()["url_hll"]
    # find the snapshot version right after epoch 0 committed
    v = next(
        int(fn[1:9])
        for fn in t._snapshot_files()
        if t.snapshot_at(int(fn[1:9]))["metrics"].get("epoch_id") == 0
        and "rows_written" in t.snapshot_at(int(fn[1:9]))["metrics"]
    )
    t.rollback_to(v)
    assert t.current_snapshot()["url_hll"] == t.snapshot_at(v)["url_hll"]
    # replay re-applies the undone epochs through the idempotent path
    replay_batches(t, ev)
    assert t.current_snapshot()["url_hll"] == full


def test_lake_hll_off_by_default(spark, tmp_path):
    ev = change_stream(spark, 200, 40, 1, with_html=False)
    t = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    replay_batches(t, ev)
    assert t.current_snapshot()["url_hll"] == {}
    assert t.url_cardinality() is None


def test_metrics_and_lineage_history(spark, tmp_path):
    ev = change_stream(spark, 300, 50, 2, with_html=False)
    t = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4, url_hll=True)
    replay_batches(t, ev)
    hist = t.metrics_history()
    # version order, one entry per snapshot incl. the bootstrap
    assert [m["snapshot_version"] for m in hist] == sorted(
        m["snapshot_version"] for m in hist
    )
    commits = [m for m in hist if "rows_in" in m]
    assert {m["epoch_id"] for m in commits} == {0, 1}
    assert all("distinct_urls_est" in m for m in commits)
    lin = t.lineage_history()
    assert sum(r["events"] for r in lin) == ev.count()
    assert {r["epoch_id"] for r in lin} == {0, 1}
