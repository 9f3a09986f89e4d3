"""Incremental content-addressed chunk store (operators/chunkstore.py):
incremental == batch, idempotent epoch commits, resume."""

from __future__ import annotations

import random

from embulk_spark.operators.chunkstore import ChunkStore
from embulk_spark.operators.cdchunk import chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _mk_corpus(n=30, seed=21):
    rng = random.Random(seed)
    shared = "".join(rng.choice("abcdefgh ") for _ in range(1500))
    rows = []
    for i in range(n):
        own = "".join(rng.choice("ijklmnop ") for _ in range(300))
        rows.append((i, shared + own if i % 3 else own))
    return rows


def test_incremental_equals_batch(spark, tmp_path):
    rows = _mk_corpus()
    store = ChunkStore(spark, str(tmp_path / "cs"))
    for e in range(4):
        store.ingest_epoch(
            _docs(spark, [r for r in rows if r[0] % 4 == e]), e
        )
    stored = {r.chunk_md5 for r in store.chunks().collect()}
    batch = {
        r.chunk_md5
        for r in chunk_documents(_docs(spark, rows)).collect()
    }
    assert stored == batch
    # hashes are unique across the whole store (novel-only commits)
    assert store.chunks().count() == len(stored)


def test_epoch_metrics_account_for_sharing(spark, tmp_path):
    rows = _mk_corpus()
    store = ChunkStore(spark, str(tmp_path / "cs"))
    m0 = store.ingest_epoch(
        _docs(spark, [r for r in rows if r[0] % 4 == 0]), 0
    )
    m1 = store.ingest_epoch(
        _docs(spark, [r for r in rows if r[0] % 4 == 1]), 1
    )
    assert m0["chunks_seen"] == m0["new_chunks"] + m0["dup_chunks"]
    assert m1["chunks_seen"] == m1["new_chunks"] + m1["dup_chunks"]
    # the shared prefix was stored in epoch 0 → epoch 1 dedups heavily
    assert m1["dup_chunks"] > 0
    assert m1["new_chunks"] < m1["chunks_seen"]


def test_duplicate_delivery_skipped(spark, tmp_path):
    rows = _mk_corpus(12)
    store = ChunkStore(spark, str(tmp_path / "cs"))
    m = store.ingest_epoch(_docs(spark, rows), 0)
    assert not m["skipped_duplicate_epoch"]
    n_before = store.chunks().count()
    m2 = store.ingest_epoch(_docs(spark, rows), 0)
    assert m2["skipped_duplicate_epoch"]
    assert {k: m2[k] for k in ("chunks_seen", "new_chunks")} == {
        k: m[k] for k in ("chunks_seen", "new_chunks")
    }
    assert store.chunks().count() == n_before


def test_resume_from_fresh_handle(spark, tmp_path):
    rows = _mk_corpus()
    p = str(tmp_path / "cs")
    s1 = ChunkStore(spark, p)
    s1.ingest_epoch(_docs(spark, [r for r in rows if r[0] % 2 == 0]), 0)
    # crash: new handle over the same path resumes where it left off
    s2 = ChunkStore(spark, p)
    assert s2.committed_epochs() == {0}
    s2.ingest_epoch(_docs(spark, [r for r in rows if r[0] % 2 == 1]), 1)
    stored = {r.chunk_md5 for r in s2.chunks().collect()}
    batch = {
        r.chunk_md5
        for r in chunk_documents(_docs(spark, rows)).collect()
    }
    assert stored == batch


def test_as_of_epoch_read(spark, tmp_path):
    rows = _mk_corpus()
    store = ChunkStore(spark, str(tmp_path / "cs"))
    for e in range(3):
        store.ingest_epoch(
            _docs(spark, [r for r in rows if r[0] % 3 == e]), e
        )
    e0 = store.chunks(as_of_epoch=0)
    assert set(r.epoch for r in e0.collect()) == {0}
    assert e0.count() < store.chunks().count()
