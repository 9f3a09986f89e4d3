"""Incremental content-addressed chunk store for the CDC flow.

Batch chunk dedup (operators/cdchunk.py) re-chunks the whole corpus per
run; a change stream re-crawling 10^10 pages must not. This maintains a
persistent content-addressed store alongside the lake table: each epoch
chunks ONLY its changed documents (O(Δ) hashing), anti-joins the chunk
hashes against the as-of-epoch store, and commits just the NEW chunks
as an epoch-named delta — the transfer/storage-savings model of an
rsync/restic-style chunk store, with the lake's epoch-commit semantics
(duplicate delivery skipped, atomic rename commit, resume = replay the
missing epochs). Reference analogue: per-task commit lattice in
exec/BulkLoader.java:512-582 — the same at-least-once → exactly-once
promotion, applied to content-addressed storage.

Invariant (pinned by tests and the driver oracle): after ingesting any
epoch partitioning of a corpus in order, the stored chunk-hash set ==
the batch chunking's distinct hash set, and per-epoch ``new_chunks``
counts partition it by first-seen epoch — incremental == batch.

A content-addressed store only grows (chunks are shared across
documents, so document updates never delete); space reclamation needs
refcounts from the document→chunk manifests and is a compaction-time
GC, deliberately out of scope here (the lake's purge path owns
compliance deletes of the *documents*).

Scale shape per epoch: chunking is the narrow codegen projection from
cdchunk; the novelty test is ONE left-anti equi-join of the Δ-sized
hash set against the store scan (hash-partitioned both sides, AQE
broadcastable when Δ is small); metrics are partial-combine aggs.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cdchunk import chunk_documents


class ChunkStore:
    """Persistent (chunk_md5, chunk_len, epoch) store with epoch-commit
    semantics; ``epoch`` is the chunk's first-seen epoch."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        window: int = 16,
        divisor: int = 64,
        salt: str = "cdcc:",
    ):
        self.spark = spark
        self.path = path
        self.window, self.divisor, self.salt = window, divisor, salt
        self._deltas = os.path.join(path, "deltas")
        os.makedirs(self._deltas, exist_ok=True)

    def committed_epochs(self) -> set[int]:
        return {
            int(d.split("=", 1)[1])
            for d in os.listdir(self._deltas)
            if d.startswith("epoch=")
        }

    def _epoch_dirs(self, *, before: int | None = None) -> list[str]:
        out = []
        for e in sorted(self.committed_epochs()):
            if before is not None and e >= before:
                continue
            out.append(os.path.join(self._deltas, f"epoch={e}"))
        return out

    def chunks(self, *, as_of_epoch: int | None = None) -> DataFrame:
        """Stored (chunk_md5, chunk_len, epoch); hashes are unique by
        construction (an epoch commits only store-novel hashes)."""
        before = None if as_of_epoch is None else as_of_epoch + 1
        dirs = self._epoch_dirs(before=before)
        if not dirs:
            return self.spark.createDataFrame(
                [], "chunk_md5 string, chunk_len int, epoch int"
            )
        return self.spark.read.parquet(*dirs)

    def ingest_epoch(
        self,
        docs: DataFrame,
        epoch: int,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> dict:
        """Chunk the epoch's changed documents, store the hashes the
        store has never seen, return the epoch's dedup metrics:
        ``chunks_seen`` (occurrences in Δ), ``new_chunks`` /
        ``new_chars`` (stored), ``dup_chunks`` (occurrences answered by
        existing content — the transfer saving). Duplicate delivery of
        a committed epoch returns its recorded metrics unchanged."""
        final = os.path.join(self._deltas, f"epoch={epoch}")
        mpath = os.path.join(final, "_metrics.json")
        if epoch in self.committed_epochs():
            with open(mpath) as f:
                return {**json.load(f), "skipped_duplicate_epoch": True}
        occ = chunk_documents(
            docs,
            id_col=id_col,
            text_col=text_col,
            window=self.window,
            divisor=self.divisor,
            salt=self.salt,
        ).select("chunk_md5", F.length("chunk").alias("chunk_len"))
        occ = occ.localCheckpoint(eager=True)  # chunk Δ once, use thrice
        seen = occ.count()
        distinct = occ.groupBy("chunk_md5").agg(
            F.max("chunk_len").alias("chunk_len")
        )
        novel = distinct.join(
            self.chunks(as_of_epoch=epoch - 1).select("chunk_md5"),
            "chunk_md5",
            "left_anti",
        ).select(
            "chunk_md5", "chunk_len", F.lit(epoch).cast("int").alias("epoch")
        )
        # pin the novel set once: the write and the metrics agg must see
        # the SAME rows (and a scratch re-read would race the rename)
        novel = novel.localCheckpoint(eager=True)
        scratch = os.path.join(
            self.path, f"_tmp_epoch_{epoch}_{uuid.uuid4().hex}"
        )
        novel.write.mode("overwrite").parquet(scratch)
        row = novel.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("chunk_len"), F.lit(0)).alias("chars"),
        ).collect()[0]
        metrics = {
            "epoch": epoch,
            "chunks_seen": int(seen),
            "new_chunks": int(row["n"]),
            "new_chars": int(row["chars"]),
            "dup_chunks": int(seen) - int(row["n"]),
        }
        with open(os.path.join(scratch, "_metrics.json"), "w") as f:
            json.dump(metrics, f)
        try:
            os.rename(scratch, final)  # atomic commit: dir exists = committed
        except OSError:
            shutil.rmtree(scratch, ignore_errors=True)
            if not os.path.isdir(final):
                raise
            with open(mpath) as f:  # lost a benign concurrent commit
                return {**json.load(f), "skipped_duplicate_epoch": True}
        return {**metrics, "skipped_duplicate_epoch": False}

    def commit_empty_epoch(self, epoch: int) -> dict:
        """Record an epoch that carried no change events, keeping
        ``committed_epochs`` a contiguous replay cursor (the lockstep
        protocol shared with SignatureIndex/BloomIndex/TermIndex)."""
        empty = self.spark.createDataFrame([], "doc_id string, text string")
        return self.ingest_epoch(empty, epoch)

    def update_from_lake_epoch(
        self, table, epoch: int, *, delta_dir: str | None = None
    ) -> dict:
        """Protocol alias — replay_batches syncs every side index
        through this name (streaming/replay.py::_sync_signature_index)."""
        return self.ingest_from_lake_epoch(table, epoch, delta_dir=delta_dir)

    def ingest_from_lake_epoch(
        self, table, epoch: int, *, delta_dir: str | None = None
    ) -> dict:
        """Ingest a committed lake epoch's delta files — the same O(Δ)
        column-pruned re-read contract as SignatureIndex/TermIndex
        (incremental.py:216): live rows chunk, tombstones are ignored
        (a content-addressed store keeps chunks other documents may
        share; document deletion is the lake's concern, byte
        reclamation is refcount-GC's). On resume (store behind the
        table after a crash between the two commits) files recover
        from the snapshot's delta groups until compaction folds the
        epoch — attach the store from the first epoch and resume
        promptly, or rebuild with a batch pass."""
        if epoch in self.committed_epochs():
            mpath = os.path.join(
                self._deltas, f"epoch={epoch}", "_metrics.json"
            )
            with open(mpath) as f:
                return {**json.load(f), "skipped_duplicate_epoch": True}
        if delta_dir is not None:
            paths = [os.path.join(table.path, delta_dir)]
        else:
            snap = table.current_snapshot()
            files = [
                f
                for g in snap["deltas"]
                if g.get("epoch_id") == epoch
                for f in g["files"]
            ]
            if not files:
                return self.commit_empty_epoch(epoch)
            paths = [os.path.join(table.path, f) for f in files]
        df = table.spark.read.parquet(*paths)
        live = df.filter(~F.col("is_deleted")).select(
            F.col("url").alias("doc_id"), "text"
        )
        return self.ingest_epoch(live, epoch, id_col="doc_id")
