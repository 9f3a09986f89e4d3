"""Write-audit-publish (WAP) staged epoch commits: invisibility until
publish, audit gates, atomic publish, abort, idempotence under duplicate
delivery and crash-shaped retries, and orphan-cleanup safety."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from embulk_spark.streaming.lake import ParquetLakeTable

COLS = "seq long, op string, url string, warc_ts timestamp, html binary, lang string"


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (seq, op, url, dt.datetime(2024, 1, 1, 0, 0, seq % 60), html, lang)
            for (seq, op, url, html, lang) in rows
        ],
        COLS,
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    t.merge_epoch(
        _events(spark, [(1, "I", "u1", b"<a>", "en"), (2, "I", "u2", b"<b>", "de")]),
        0,
        extract=False,
    )
    return t


def test_stage_is_invisible_until_publish(table, spark):
    m = table.merge_epoch(
        _events(spark, [(10, "U", "u1", b"<new>", "en"), (11, "I", "u3", b"<c>", "fr")]),
        1,
        extract=False,
        stage=True,
    )
    assert m["stages"][-1] == "STAGED" and m["staged"]
    # invisible: published state and committed epochs unchanged
    assert table.committed_epochs() == {0}
    assert table.staged_epochs() == {1}
    pub = {r.url: bytes(r.html) for r in table.published().collect()}
    assert pub == {"u1": b"<a>", "u2": b"<b>"}
    # staged_read previews the future state without committing anything
    fut = {r.url: bytes(r.html) for r in table.staged_read(1).collect()}
    assert fut == {"u1": b"<new>", "u2": b"<b>", "u3": b"<c>"}

    out = table.publish_staged(1)
    assert out["published_from_stage"]
    assert table.committed_epochs() == {0, 1}
    assert table.staged_epochs() == set()
    pub2 = {r.url: bytes(r.html) for r in table.published().collect()}
    assert pub2 == fut


def test_audit_gate_blocks_and_abort_discards(table, spark):
    table.merge_epoch(
        _events(spark, [(20, "I", "u9", None, "xx")]), 1, extract=False, stage=True
    )
    rules = [{"check": "not_null", "column": "html"}]
    rep = {r.rule: r.violations for r in table.audit_staged(1, rules).collect()}
    assert rep["html:not_null"] == 1
    with pytest.raises(ValueError, match="failed audit"):
        table.publish_staged(1, audit_rules=rules)
    # gate leaves the stage intact — abort is an explicit decision
    assert table.staged_epochs() == {1}
    man = table._load_staged(1)
    files = [os.path.join(table.path, f) for f in man["delta"]["files"]]
    assert all(os.path.exists(f) for f in files)
    out = table.abort_staged(1)
    assert out["aborted"] and out["files_removed"] == len(files)
    assert table.staged_epochs() == set()
    assert not any(os.path.exists(f) for f in files)
    assert table.committed_epochs() == {0}
    # abort is idempotent
    assert table.abort_staged(1)["already_gone"]


def test_passing_audit_publishes(table, spark):
    table.merge_epoch(
        _events(spark, [(30, "U", "u2", b"<b2>", "de")]), 1, extract=False, stage=True
    )
    out = table.publish_staged(
        1, audit_rules=[{"check": "not_null", "column": "html"}]
    )
    assert out["epoch_id"] == 1
    assert {r.url: bytes(r.html) for r in table.published().collect()}["u2"] == b"<b2>"


def test_duplicate_stage_and_publish_idempotence(table, spark):
    ev = _events(spark, [(40, "I", "u4", b"<d>", "en")])
    table.merge_epoch(ev, 1, extract=False, stage=True)
    # duplicate delivery of a staged epoch skips (no second job needed)
    assert table.merge_epoch(ev, 1, extract=False, stage=True)[
        "skipped_duplicate_stage"
    ]
    table.publish_staged(1)
    # retry after publish (crash-shaped: manifest already gone) skips
    assert table.publish_staged(1)["skipped_duplicate_epoch"]
    # staging an already-committed epoch skips before any work
    assert table.merge_epoch(ev, 1, extract=False, stage=True)[
        "skipped_duplicate_epoch"
    ]
    # crash between _commit and manifest removal: resurrect the manifest
    table._write_staged(
        1, metrics={"epoch_id": 1}, lineage=[], delta_group=None,
        hll_regs=None, stages=["RUN_BEGIN"],
    )
    assert table.publish_staged(1)["skipped_duplicate_epoch"]
    assert table.staged_epochs() == set()


def test_cleanup_keeps_staged_files(table, spark):
    table.merge_epoch(
        _events(spark, [(50, "I", "u5", b"<e>", "en")]), 1, extract=False, stage=True
    )
    man = table._load_staged(1)
    files = [os.path.join(table.path, f) for f in man["delta"]["files"]]
    rep = table.cleanup_orphans(grace_seconds=0.0)
    assert rep["orphans_removed"] == 0
    assert all(os.path.exists(f) for f in files)
    # and the stage still publishes cleanly afterwards
    table.publish_staged(1)
    assert "u5" in {r.url for r in table.published().collect()}


def test_empty_batch_stage_publish(table, spark):
    table.merge_epoch(
        _events(spark, []).limit(0), 1, extract=False, stage=True
    )
    assert table.staged_epochs() == {1}
    table.publish_staged(1)
    assert 1 in table.committed_epochs()
    assert {r.url for r in table.published().collect()} == {"u1", "u2"}


def test_replay_with_wap_gate(spark, tmp_path):
    """replay_batches(wap_rules=...): clean epochs stage+publish
    transparently; a poisoned epoch halts the replay with its stage
    intact and NOTHING visible; after abort the replay resumes past it
    only when the data is fixed (here: re-run without the poison)."""
    from embulk_spark.streaming.replay import replay_batches

    rows = [
        # epoch 0: clean
        (1, "I", "u1", b"<a>", "en", 0),
        (2, "I", "u2", b"<b>", "de", 0),
        # epoch 1: one NULL html (poison)
        (10, "U", "u1", b"<a2>", "en", 1),
        (11, "I", "u3", None, "fr", 1),
        # epoch 2: clean
        (20, "U", "u2", b"<b2>", "de", 2),
    ]
    ev = spark.createDataFrame(
        [
            (seq, op, url, dt.datetime(2024, 1, 1, 0, 0, seq % 60), html, lang, ep)
            for (seq, op, url, html, lang, ep) in rows
        ],
        COLS + ", epoch int",
    )
    t = ParquetLakeTable(spark, str(tmp_path / "w"), n_buckets=4)
    rules = [{"check": "not_null", "column": "html"}]
    with pytest.raises(ValueError, match="failed audit"):
        replay_batches(t, ev, wap_rules=rules, pipeline_depth=1)
    # epoch 0 published, epoch 1 held at the gate, epoch 2 never ran
    assert t.committed_epochs() == {0}
    assert t.staged_epochs() == {1}
    assert {r.url for r in t.published().collect()} == {"u1", "u2"}

    # operator decision: drop the poison and resume — the staged epoch is
    # aborted, the fixed stream replays to completion, exactly-once holds
    t.abort_staged(1)
    fixed = ev.filter(F.col("seq") != 11)
    out = replay_batches(t, fixed, wap_rules=rules, pipeline_depth=1)
    assert t.committed_epochs() == {0, 1, 2}
    assert t.staged_epochs() == set()
    pub = {r.url: bytes(r.html) for r in t.published().collect()}
    assert pub == {"u1": b"<a2>", "u2": b"<b2>"}
    assert all(m.get("published_from_stage") for m in out)
