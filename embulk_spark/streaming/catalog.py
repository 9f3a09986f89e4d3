"""Multi-table catalog with atomic cross-table transactions.

The reference scopes a transaction to exactly ONE input→output pipeline
run (exec/BulkLoader.java:584-659 — resume/commit state is per-config),
so loads into several destinations can only be eventually consistent. A
CDC platform routinely commits the SAME upstream epoch into several
tables (the main lake, a quarantine table, per-tenant splits, a compact
serving copy) and downstream readers need a view where those tables
agree on the epoch boundary. This module is the Nessie / Iceberg-REST
catalog shape re-expressed over ``ParquetLakeTable``'s own primitives:

- the catalog is a directory of create-exclusive version files
  (``catalog/v{N}.json``) mapping table name → (path, pinned snapshot
  version) — the same optimistic-concurrency publish as a table's own
  snapshots, one level up;
- a transaction stages each table's epoch through the WAP path
  (``merge_epoch(stage=True)``: the heavy job runs, invisible), then
  ``commit()`` audits every stage, publishes each one (idempotent), and
  flips the catalog pointer ONCE — the flip is the only visibility
  event, so catalog readers never observe a half-published transaction;
- each catalog version tags its pinned snapshots (``catalog-v{N}``), a
  retention lease: ``expire_snapshots`` cannot retire a version the
  catalog still serves; ``expire()`` drops superseded catalog versions
  and their leases together.

Crash lattice (every step idempotent; recovery = ``recover()``):

- crash before any publish: stages are invisible; recovery rolls the
  intent forward (or ``abort=True`` discards it);
- crash mid-publish: some table HEADS moved, but the catalog pointer
  still pins the pre-transaction versions — catalog readers stay
  consistent; re-running completes the remaining publishes
  (``publish_staged`` skips already-committed epochs) and then flips;
- crash after the flip, before intent cleanup: recovery re-publishes
  (all skip), re-flips (pins are monotone max — a same-or-newer pin is
  harmless), removes the intent;
- two concurrent transactions: the flip is create-exclusive on
  ``v{N+1}``; the loser rebases — re-reads the head, keeps the winner's
  pins for disjoint tables, max-merges pins for shared ones. Two
  transactions on the SAME table already serialize at that table's own
  commit protocol.

``abort`` is only honored while NO epoch of the transaction has been
published; once any table committed, recovery rolls FORWARD (published
epochs are real commits — forward completion is the only way to keep
the cross-table invariant).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lake import ParquetLakeTable, _atomic_create_json


class CatalogSnapshot:
    """A frozen, cross-table-consistent view: every table read through
    it time-travels to the version one catalog flip pinned together."""

    def __init__(self, catalog: "LakeCatalog", head: dict) -> None:
        self._cat = catalog
        self.version = int(head["version"])
        self.pins = {
            n: int(e["version"]) for n, e in head["tables"].items()
        }

    def read(self, name: str) -> DataFrame:
        """Published rows of ``name`` at its pinned version (tombstones
        filtered) — the consistent-read path."""
        if name not in self.pins:
            raise KeyError(
                f"table {name!r} not in catalog v{self.version} "
                f"(have {sorted(self.pins)})"
            )
        return (
            self._cat.table(name)
            .read(version=self.pins[name])
            .filter(~F.col("is_deleted"))
            .drop("is_deleted", "bkt")
        )


class LakeCatalog:
    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path.rstrip("/")
        self._cat_dir = os.path.join(self.path, "catalog")
        self._txn_dir = os.path.join(self.path, "txns")
        os.makedirs(self._cat_dir, exist_ok=True)
        os.makedirs(self._txn_dir, exist_ok=True)
        os.makedirs(os.path.join(self.path, "tables"), exist_ok=True)
        if self.head() is None:
            try:
                _atomic_create_json(
                    self._vpath(0),
                    {"version": 0, "tables": {}, "ts": time.time()},
                )
            except FileExistsError:
                pass  # another process initialized concurrently

    # ------------------------------------------------------------------
    # pointer
    # ------------------------------------------------------------------

    def _vpath(self, v: int) -> str:
        return os.path.join(self._cat_dir, f"v{v:08d}.json")

    def _versions(self) -> list[int]:
        return sorted(
            int(fn[1:-5])
            for fn in os.listdir(self._cat_dir)
            if fn.startswith("v") and fn.endswith(".json")
        )

    def head(self) -> dict | None:
        vs = self._versions()
        if not vs:
            return None
        with open(self._vpath(vs[-1])) as f:
            return json.load(f)

    def catalog_version(self) -> int:
        return int(self.head()["version"])

    def snapshot(self) -> CatalogSnapshot:
        return CatalogSnapshot(self, self.head())

    def read(self, name: str) -> DataFrame:
        """Published rows at the current catalog's pin. For reads that
        must agree ACROSS tables, hold one ``snapshot()`` and read every
        table through it."""
        return self.snapshot().read(name)

    # ------------------------------------------------------------------
    # tables
    # ------------------------------------------------------------------

    def create_table(self, name: str, **lake_kwargs) -> ParquetLakeTable:
        """Create and register a table (one catalog flip pinning its
        empty snapshot). Layout/schema kwargs go to ``ParquetLakeTable``;
        they are manifest-resident after creation, so reopening via
        ``table(name)`` adopts them."""
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"invalid table name {name!r}")
        if name in self.head()["tables"]:
            raise ValueError(f"table {name!r} already exists")
        rel = os.path.join("tables", name)
        t = ParquetLakeTable(
            self.spark, os.path.join(self.path, rel), **lake_kwargs
        )
        self._flip({name: {
            "path": rel, "version": int(t.current_snapshot()["version"]),
        }})
        return t

    def table(self, name: str) -> ParquetLakeTable:
        """A HEAD handle (for mutations and maintenance). Catalog pins
        only govern ``read``/``snapshot``; the table itself stays an
        ordinary lake table."""
        e = self.head()["tables"].get(name)
        if e is None:
            raise KeyError(
                f"unknown table {name!r} (have "
                f"{sorted(self.head()['tables'])})"
            )
        return ParquetLakeTable(self.spark, os.path.join(self.path, e["path"]))

    # ------------------------------------------------------------------
    # commit machinery
    # ------------------------------------------------------------------

    def _flip(self, pin_updates: dict[str, dict]) -> dict:
        """Catalog pointer flip with rebase. ``pin_updates``: table →
        {"version": v[, "path": rel]} (path required only for new
        tables). Create-exclusive on ``v{N+1}``; a loser re-reads the
        head and retries. Pins are MONOTONE (max-merged), so a rebase or
        a recovery re-flip can never move a reader backwards."""
        while True:
            head = self.head()
            tables = {n: dict(e) for n, e in head["tables"].items()}
            for n, e in pin_updates.items():
                cur = tables.get(n)
                if cur is None:
                    if "path" not in e:
                        raise KeyError(f"table {n!r} is not registered")
                    tables[n] = dict(e)
                else:
                    cur["version"] = max(
                        int(cur["version"]), int(e["version"])
                    )
            new = {
                "version": int(head["version"]) + 1,
                "tables": tables,
                "ts": time.time(),
            }
            try:
                _atomic_create_json(self._vpath(new["version"]), new)
            except FileExistsError:
                continue  # lost the race — rebase on the new head
            self._lease_tags(new)
            return new

    def _lease_tags(self, cat: dict) -> None:
        """Tag every pinned snapshot ``catalog-v{M}`` — a retention
        lease (tags survive ``expire_snapshots``), dropped by
        ``expire()`` when the catalog version itself retires. Tag names
        are unique per flip, so only a recovery re-run ever collides —
        idempotent by skip."""
        for n, e in cat["tables"].items():
            t = self.table(n)
            try:
                t.tag(f"catalog-v{cat['version']}", version=int(e["version"]))
            except FileExistsError:
                pass

    def transaction(self) -> "CatalogTransaction":
        return CatalogTransaction(self)

    def pending_transactions(self) -> list[dict]:
        out = []
        for fn in sorted(os.listdir(self._txn_dir)):
            if fn.startswith("txn_") and fn.endswith(".json"):
                with open(os.path.join(self._txn_dir, fn)) as f:
                    out.append(json.load(f))
        return out

    def recover(self, *, abort: bool = False) -> list[dict]:
        """Finish transactions whose driver crashed between staging and
        intent cleanup. Default rolls FORWARD (publish the remaining
        stages, flip, clean up). ``abort=True`` discards a transaction —
        but only while none of its epochs has been published; once any
        table committed, it rolls forward regardless (see module
        docstring). Call from the maintenance path, not concurrently
        with a live driver mid-commit."""
        out = []
        for intent in self.pending_transactions():
            path = os.path.join(self._txn_dir, f"txn_{intent['txn']}.json")
            epochs = {n: int(e) for n, e in intent["epochs"].items()}
            published = {
                n for n, e in epochs.items()
                if e in self.table(n).committed_epochs()
            }
            if abort and not published:
                for n, e in epochs.items():
                    self.table(n).abort_staged(e)
                os.remove(path)
                out.append({"txn": intent["txn"], "aborted": True})
                continue
            pins = {}
            for n, e in sorted(epochs.items()):
                t = self.table(n)
                t.publish_staged(e)
                pins[n] = {"version": int(t.current_snapshot()["version"])}
            cat = self._flip(pins)
            os.remove(path)
            out.append({
                "txn": intent["txn"], "completed": True,
                "catalog_version": cat["version"],
            })
        return out

    def expire(self, keep_last: int = 3) -> dict:
        """Retire catalog versions older than the newest ``keep_last``:
        drop their retention-lease tags, then the version files. After
        this, each table's own ``expire_snapshots``/``cleanup_orphans``
        can reclaim the unpinned snapshots."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        drop = self._versions()[:-keep_last]
        for v in drop:
            with open(self._vpath(v)) as f:
                cat = json.load(f)
            for n in cat["tables"]:
                if n in self.head()["tables"]:
                    self.table(n).drop_tag(f"catalog-v{v}")
            os.remove(self._vpath(v))
        return {"dropped_versions": drop}


class CatalogTransaction:
    """Stage epochs into several tables, then commit them as ONE catalog
    flip. One epoch per table per transaction (an epoch IS the table's
    commit unit); different tables may use different epoch ids."""

    def __init__(self, catalog: LakeCatalog) -> None:
        self._cat = catalog
        self.txn_id = uuid.uuid4().hex[:12]
        self._intent = os.path.join(
            catalog._txn_dir, f"txn_{self.txn_id}.json"
        )
        self._epochs: dict[str, int] = {}
        self._tables: dict[str, ParquetLakeTable] = {}
        self.committed = False

    def _table(self, name: str) -> ParquetLakeTable:
        if name not in self._tables:
            self._tables[name] = self._cat.table(name)
        return self._tables[name]

    def _record(self, name: str, epoch_id: int) -> None:
        if self._epochs.get(name, int(epoch_id)) != int(epoch_id):
            raise ValueError(
                f"transaction already stages epoch {self._epochs[name]} "
                f"for {name!r}"
            )
        self._epochs[name] = int(epoch_id)
        # the intent records only ALREADY-STAGED work (written after the
        # stage lands), so recovery never publishes a phantom epoch; a
        # crash between stage and intent leaves an orphan stage for the
        # table's own stage-aware cleanup
        tmp = f"{self._intent}.tmp{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"txn": self.txn_id, "epochs": self._epochs}, f)
        os.rename(tmp, self._intent)

    def merge_epoch(
        self, name: str, events: DataFrame, epoch_id: int, **kwargs
    ) -> dict:
        """Stage one table's epoch (the heavy job runs now, invisibly)."""
        out = self._table(name).merge_epoch(
            events, epoch_id, stage=True, **kwargs
        )
        self._record(name, epoch_id)
        return out

    def delete_where(
        self, name: str, condition, epoch_id: int, **kwargs
    ) -> dict:
        out = self._table(name).delete_where(
            condition, epoch_id, stage=True, **kwargs
        )
        self._record(name, epoch_id)
        return out

    def commit(
        self, audit_rules: dict[str, list[dict]] | None = None
    ) -> dict:
        """Audit ALL stages first (all-or-nothing: one failing table
        blocks the whole transaction with every stage intact), then
        publish each (idempotent — a crashed retry re-enters here), then
        flip the catalog pointer once."""
        if not self._epochs:
            raise ValueError("empty transaction")
        bad = {}
        for name, rules in (audit_rules or {}).items():
            rep = self._table(name).audit_staged(self._epochs[name], rules)
            v = {
                r["rule"]: r["violations"]
                for r in rep.collect() if r["violations"]
            }
            if v:
                bad[name] = v
        if bad:
            raise ValueError(f"transaction failed audit: {bad}")
        pins = {}
        for name, epoch in sorted(self._epochs.items()):
            t = self._table(name)
            t.publish_staged(epoch)
            pins[name] = {"version": int(t.current_snapshot()["version"])}
        cat = self._cat._flip(pins)
        if os.path.exists(self._intent):
            os.remove(self._intent)
        self.committed = True
        return {
            "txn": self.txn_id,
            "catalog_version": cat["version"],
            "pins": {n: e["version"] for n, e in pins.items()},
        }

    def abort(self) -> dict:
        """Discard every stage; the catalog pointer never moved."""
        for name, epoch in self._epochs.items():
            self._table(name).abort_staged(epoch)
        if os.path.exists(self._intent):
            os.remove(self._intent)
        return {"txn": self.txn_id, "aborted": sorted(self._epochs)}
