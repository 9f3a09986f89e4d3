"""Catalog-level multi-table transactions (streaming/catalog.py):
atomic cross-table visibility via one pointer flip, crash recovery
roll-forward, abort, concurrent-transaction rebase, and retention
leases protecting pinned snapshots from snapshot expiry."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from embulk_spark.streaming.catalog import LakeCatalog

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
def cat(spark, tmp_path):
    c = LakeCatalog(spark, str(tmp_path / "cat"))
    c.create_table("pages", n_buckets=4)
    c.create_table("audit", n_buckets=2)
    return c


def _urls(df):
    return {r.url for r in df.select("url").collect()}


def test_txn_is_atomic_across_tables(cat, spark):
    txn = cat.transaction()
    txn.merge_epoch(
        "pages",
        _events(spark, [(1, "I", "u1", b"<a>", "en"), (2, "I", "u2", b"<b>", "de")]),
        1, extract=False,
    )
    # staged work is invisible through the catalog AND the tables
    assert _urls(cat.read("pages")) == set()
    assert cat.table("pages").committed_epochs() == set()

    txn.merge_epoch(
        "audit", _events(spark, [(5, "I", "a1", b"<x>", "en")]), 1,
        extract=False,
    )
    v0 = cat.catalog_version()
    out = txn.commit()
    assert out["catalog_version"] == v0 + 1 and txn.committed
    assert _urls(cat.read("pages")) == {"u1", "u2"}
    assert _urls(cat.read("audit")) == {"a1"}
    # intent cleaned up
    assert cat.pending_transactions() == []


def test_partial_publish_keeps_catalog_consistent_and_recovers(cat, spark):
    txn = cat.transaction()
    txn.merge_epoch(
        "pages", _events(spark, [(1, "I", "u1", b"<a>", "en")]), 1,
        extract=False,
    )
    txn.merge_epoch(
        "audit", _events(spark, [(5, "I", "a1", b"<x>", "en")]), 1,
        extract=False,
    )
    # crash mid-commit: first table (sorted order: audit) published, then
    # the driver dies before pages publishes and before the flip
    cat.table("audit").publish_staged(1)
    snap = cat.snapshot()
    # the audit TABLE head moved, but the catalog view still pins the
    # pre-transaction version of BOTH tables — no torn read
    assert cat.table("audit").committed_epochs() == {1}
    assert _urls(snap.read("audit")) == set()
    assert _urls(snap.read("pages")) == set()

    done = cat.recover()
    assert len(done) == 1 and done[0]["completed"]
    assert _urls(cat.read("pages")) == {"u1"}
    assert _urls(cat.read("audit")) == {"a1"}
    assert cat.pending_transactions() == []
    # recovery is idempotent
    assert cat.recover() == []


def test_abort_discards_and_never_flips(cat, spark):
    txn = cat.transaction()
    txn.merge_epoch(
        "pages", _events(spark, [(1, "I", "u1", b"<a>", "en")]), 1,
        extract=False,
    )
    v = cat.catalog_version()
    txn.abort()
    assert cat.catalog_version() == v
    assert cat.table("pages").staged_epochs() == set()
    assert cat.pending_transactions() == []


def test_recover_abort_only_before_any_publish(cat, spark):
    txn = cat.transaction()
    txn.merge_epoch(
        "pages", _events(spark, [(1, "I", "u1", b"<a>", "en")]), 1,
        extract=False,
    )
    txn.merge_epoch(
        "audit", _events(spark, [(5, "I", "a1", b"<x>", "en")]), 1,
        extract=False,
    )
    # nothing published yet → abort honored
    out = cat.recover(abort=True)
    assert out == [{"txn": txn.txn_id, "aborted": True}]
    assert cat.table("pages").staged_epochs() == set()

    txn2 = cat.transaction()
    txn2.merge_epoch(
        "pages", _events(spark, [(2, "I", "u2", b"<b>", "de")]), 2,
        extract=False,
    )
    txn2.merge_epoch(
        "audit", _events(spark, [(6, "I", "a2", b"<y>", "de")]), 2,
        extract=False,
    )
    cat.table("pages").publish_staged(2)  # crash mid-commit
    # one epoch committed → abort must roll FORWARD instead
    out = cat.recover(abort=True)
    assert out[0]["completed"]
    assert _urls(cat.read("audit")) == {"a2"}


def test_audit_gate_blocks_whole_txn_before_any_publish(cat, spark):
    txn = cat.transaction()
    txn.merge_epoch(
        "pages", _events(spark, [(1, "I", "u1", b"<a>", "en")]), 1,
        extract=False,
    )
    txn.merge_epoch(
        "audit", _events(spark, [(5, "I", "a1", None, "xx")]), 1,
        extract=False,
    )
    with pytest.raises(ValueError, match="failed audit"):
        txn.commit(audit_rules={
            "audit": [{"check": "not_null", "column": "html"}],
        })
    # all-or-nothing: NEITHER table published, both stages intact
    assert cat.table("pages").committed_epochs() == set()
    assert cat.table("audit").committed_epochs() == set()
    assert cat.table("pages").staged_epochs() == {1}
    txn.abort()


def test_concurrent_txns_rebase_disjoint_pins(cat, spark):
    t1 = cat.transaction()
    t2 = cat.transaction()
    t1.merge_epoch(
        "pages", _events(spark, [(1, "I", "u1", b"<a>", "en")]), 1,
        extract=False,
    )
    t2.merge_epoch(
        "audit", _events(spark, [(5, "I", "a1", b"<x>", "en")]), 1,
        extract=False,
    )
    t2.commit()
    t1.commit()  # rebases over t2's flip
    assert _urls(cat.read("pages")) == {"u1"}
    assert _urls(cat.read("audit")) == {"a1"}


def test_delete_where_in_txn(cat, spark):
    txn0 = cat.transaction()
    txn0.merge_epoch(
        "pages",
        _events(spark, [(1, "I", "u1", b"<a>", "en"), (2, "I", "u2", b"<b>", "de")]),
        1, extract=False,
    )
    txn0.commit()
    txn = cat.transaction()
    txn.delete_where("pages", F.col("lang") == "de", 2)
    assert _urls(cat.read("pages")) == {"u1", "u2"}  # staged: invisible
    txn.commit()
    assert _urls(cat.read("pages")) == {"u1"}


def test_retention_lease_pins_catalog_versions(cat, spark):
    txn = cat.transaction()
    txn.merge_epoch(
        "pages", _events(spark, [(1, "I", "u1", b"<a>", "en")]), 1,
        extract=False,
    )
    txn.commit()
    pinned = cat.snapshot()
    # the table races ahead and expires aggressively
    pages = cat.table("pages")
    for e in range(2, 7):
        pages.merge_epoch(
            _events(spark, [(e * 10, "U", "u1", f"<v{e}>".encode(), "en")]),
            e, extract=False,
        )
    pages.expire_snapshots(keep_last=1)
    # the catalog's pinned version survives (tag lease) and still reads
    assert {
        (r.url, bytes(r.html)) for r in pinned.read("pages").collect()
    } == {("u1", b"<a>")}
    # expire() drops old catalog versions' leases; the head stays pinned
    out = cat.expire(keep_last=1)
    assert out["dropped_versions"]
    head_tag = f"catalog-v{cat.catalog_version()}"
    assert head_tag in pages.tags()


def test_one_epoch_per_table_per_txn(cat, spark):
    txn = cat.transaction()
    txn.merge_epoch(
        "pages", _events(spark, [(1, "I", "u1", b"<a>", "en")]), 1,
        extract=False,
    )
    with pytest.raises(ValueError, match="already stages"):
        txn.merge_epoch(
            "pages", _events(spark, [(2, "I", "u2", b"<b>", "de")]), 2,
            extract=False,
        )
    txn.abort()


def test_cli_catalog_surface(spark, tmp_path, capsys):
    import json

    from embulk_spark import cli

    path = str(tmp_path / "cat")
    assert cli.main(["catalog", path, "--create-table", "pages",
                     "--buckets", "4"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["tables"] == {"pages": 0} and out["pending_txns"] == []

    # stage a txn, crash (no commit), recover --abort via the CLI
    c = LakeCatalog(spark, path)
    txn = c.transaction()
    txn.merge_epoch(
        "pages", _events(spark, [(1, "I", "u1", b"<a>", "en")]), 1,
        extract=False,
    )
    assert cli.main(["catalog", path]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["pending_txns"] == [txn.txn_id]
    assert cli.main(["catalog", path, "--recover", "--abort"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["recovered"] == [{"txn": txn.txn_id, "aborted": True}]
    assert out["pending_txns"] == []


def test_unknown_table_and_duplicate_create(cat):
    with pytest.raises(KeyError, match="unknown table"):
        cat.table("nope")
    with pytest.raises(ValueError, match="already exists"):
        cat.create_table("pages")
