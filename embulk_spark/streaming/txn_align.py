"""Source-transaction boundary alignment for WAL tails.

A logical-decoding stream frames every source transaction as
``B … row events … C`` (wal2json v2 with ``include-transaction``; the
xid ties them together). The file tail can cut MID-transaction — the
writer flushed rows but not yet the commit marker — and a micro-batch
that applies those rows publishes a table state the source database
never had (half of a multi-row transaction). Per-key latest-wins would
converge later, but epoch commits are the engine's visibility points:
each one should be a prefix of COMMITTED source transactions.

``TxnAligner`` makes that hold with carried state, not buffering inside
Spark: per micro-batch it splits events into *ready* (xid has a commit
marker, or no xid at all — ``include-xids`` off means the producer
already emits only whole transactions per line batch) and *deferred*
(open transactions), persists the deferred set, and folds it back into
the next batch. The deferred set is bounded by the source's open
transactions at the tail — normally zero or one in-flight txn, never
O(stream).

Exactly-once under retries: the deferred snapshot for batch N commits
by create-exclusive manifest (``pending-v{N}.json``), the same
optimistic primitive as the lake; a re-delivered batch N re-reads the
pre-N snapshot (``max v < N``), recomputes the identical ready set, and
its manifest write skips. Assumes the binlog directory is append-ordered
(a commit marker never precedes its rows), which the file source's
arrival order preserves.

Reference analogue: none — Embulk has no streaming transactions; this
is the north rule's exactly-once surface extended to SOURCE atomicity.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lake import _atomic_create_json

_MANIFEST_RE = re.compile(r"pending-v(\d+)\.json$")


class TxnAligner:
    """Carries open-transaction events across micro-batches.

    ``state_dir`` must pair 1:1 with the stream's checkpoint dir (batch
    ids key the state); events need a nullable ``txn_xid`` column.
    """

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    # -- state -------------------------------------------------------------
    def _versions(self) -> list[int]:
        out = []
        for fn in os.listdir(self.dir):
            m = _MANIFEST_RE.match(fn)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _pending_before(self, batch_id: int) -> DataFrame | None:
        prior = [v for v in self._versions() if v < batch_id]
        if not prior:
            return None
        with open(os.path.join(self.dir, f"pending-v{prior[-1]}.json")) as f:
            man = json.load(f)
        if man["rows"] == 0:
            return None
        return self.spark.read.parquet(man["path"])

    def open_txns(self) -> list[int]:
        """xids still awaiting their commit marker (monitoring surface)."""
        vs = self._versions()
        if not vs:
            return []
        with open(os.path.join(self.dir, f"pending-v{vs[-1]}.json")) as f:
            return json.load(f)["open_txns"]

    # -- the per-batch split ----------------------------------------------
    def align(
        self, events: DataFrame, committed_xids: DataFrame, batch_id: int
    ) -> DataFrame:
        """Split ``events`` (+ carried pending) on commit markers; persist
        the still-open remainder for the next batch; return the ready
        frame (``txn_xid`` still attached — caller drops it)."""
        batch_id = int(batch_id)
        pend = self._pending_before(batch_id)
        allev = events if pend is None else pend.unionByName(events)
        xids = sorted(
            int(r[0]) for r in committed_xids.collect() if r[0] is not None
        )
        ready_cond = F.col("txn_xid").isNull()
        if xids:
            ready_cond = ready_cond | F.col("txn_xid").isin(xids)
        allev = allev.persist()
        try:
            ready = allev.filter(ready_cond)
            deferred = allev.filter(~ready_cond)
            out = os.path.join(self.dir, f"pending-{batch_id}")
            deferred.write.mode("overwrite").parquet(out)
            saved = self.spark.read.parquet(out)
            n = saved.count()
            open_txns = sorted(
                int(r[0]) for r in saved.select("txn_xid").distinct().collect()
            )
            try:
                _atomic_create_json(
                    os.path.join(self.dir, f"pending-v{batch_id}.json"),
                    {"batch_id": batch_id, "path": out, "rows": n,
                     "open_txns": open_txns},
                )
            except FileExistsError:
                pass  # re-delivered batch: identical state already recorded
            # ready is consumed by the caller's apply AFTER unpersist —
            # lineage stays valid (pending parquet + batch source), the
            # cache only saved the double pass during the deferred write
            return ready
        finally:
            allev.unpersist()

    def cleanup(self, keep_last: int = 2) -> list[int]:
        """Drop superseded pending generations (the stream needs only the
        latest; one spare covers an in-flight retry)."""
        import shutil

        vs = self._versions()
        drop = vs[:-keep_last] if keep_last else vs
        for v in drop:
            shutil.rmtree(os.path.join(self.dir, f"pending-{v}"), True)
            os.remove(os.path.join(self.dir, f"pending-v{v}.json"))
        return drop
