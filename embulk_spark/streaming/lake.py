"""Snapshot-versioned lakehouse table with idempotent epoch commits —
the exactly-once CDC sink, **merge-on-read** edition.

Design (each point with its reference citation):

- **Atomic all-or-nothing commit per micro-batch**: data files land under a
  new version directory first; the commit is one atomic rename of the
  snapshot manifest. A crash before the rename leaves the previous snapshot
  visible (orphan files, no state change) — Embulk's commit gate: a run
  fails unless all tasks committed (exec/BulkLoader.java:541-548,692-700).
- **Idempotent epoch commits**: every snapshot records the set of committed
  epoch ids; re-delivering a committed epoch is a no-op — "output tasks may
  be committed … as long as output plugin is atomic and idempotent"
  (exec/BulkLoader.java:154-159) and the resume contract that re-runs only
  tasks without committed reports (exec/BulkLoader.java:584-690).
- **Merge-on-read, not copy-on-write**: an epoch writes ONLY its deduped
  change-set as a *delta* file group — no target read, no join, no table
  rewrite. IO per micro-batch is O(change-set); a copy-on-write MERGE would
  be O(touched table), which at the 10^10-event design point means every
  batch rewrites terabytes. Reads reconstruct current state as
  ``latest (warc_ts, seq) per url over base ∪ deltas`` — a hash agg with
  map-side partial combine, the same skew-proof shape as the in-batch dedup
  (see operators/merge.py). This is the Hudi/Iceberg MOR pattern expressed
  in plain DataFrame ops.
- **Compaction** folds deltas into the hash-bucketed base when they pile up
  (ratio/areas below). Base files are bucketed by ``xxhash64(url) % n``, so
  a compaction — and any key-targeted read — prunes to the touched buckets.
  Deltas are range-clustered by bucket, so parquet row-group min/max stats
  prune them too. Tombstones (deletes) survive compaction — a late older
  update must stay dead — but can be expired past a watermark
  (``tombstone_retention_ts``) once late data is impossible.
- **Schema evolution** (add / rename / widen): schema versions live in the
  manifest; files are never rewritten for a schema change — reads normalize
  each file group from its write-time schema to the current one (rename map
  + null-fill + cast), widening per the reference's guess lattice
  (embulk-ruby/lib/embulk/guess/schema_guess.rb:112-128), mirroring
  Embulk's between-runs re-guess + ConfigDiff merge
  (exec/GuessExecutor.java:142-195).
- **Lineage & metrics per commit**: per-bucket key/event/delete counts are
  aggregated from the just-written delta files with a column-pruned scan
  (bkt/_n_events/is_deleted only — a few bytes per row); file/byte counts
  come from parquet footers. Embulk's TaskReport analogue
  (exec/BulkLoader.java:121-152).

When Iceberg jars are on the classpath the same protocol maps onto Iceberg
snapshots (epoch id in the snapshot summary); see ``iceberg.py``. This
parquet backend is the default where the jars are absent and is what the
test suite runs against.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import threading
import time
import uuid
from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.extract import extract_text
from ..operators.merge import (
    TARGET_COLUMNS,
    bucket_of,
    changes_to_target_rows,
    dedup_latest,
)

TARGET_DDL = (
    "url STRING, warc_ts TIMESTAMP, seq BIGINT, html BINARY, "
    "text STRING, lang STRING, is_deleted BOOLEAN"
)

#: type-widening lattice (schema_guess.rb:112-128): pairs that merge to a
#: wider type; anything else widens to string.
WIDEN_LATTICE = {
    ("long", "double"): "double",
    ("double", "long"): "double",
    ("boolean", "long"): "long",
    ("long", "boolean"): "long",
    ("timestamp", "long"): "long",
    ("long", "timestamp"): "long",
}


class CommitConflict(Exception):
    """Raised when a guarded commit (compaction / schema DDL / rebucket)
    finds that the snapshot state it derived its output from changed under
    it. Delta commits set-merge and rebase freely; only commits that
    WHOLESALE-REPLACE a snapshot section (base, schema_v, n_buckets) must
    recompute from the new snapshot instead of clobbering a concurrent
    writer's work (e.g. two processes compacting: the loser's stale base
    would drop the winner's folded delta rows). The one delta-commit case:
    a delta hashed under a bucket layout that a concurrent rebucket
    replaced conflicts too — its bkt values belong to the old layout."""


def _atomic_create_json(path: str, payload: dict) -> None:
    """Create-exclusive commit: fails with FileExistsError if ``path``
    already exists (os.link never overwrites), unlike rename. This is the
    cross-process half of optimistic concurrency — a second writer that
    raced to the same snapshot version loses and must rebase."""
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)
    finally:
        os.unlink(tmp)


def recover_dir_swap(d: str) -> None:
    """Heal a crashed :func:`rewrite_dir_excluding` swap on ``d``.

    The swap is write-aside(``.purge<hex>``) → rename ``d`` aside
    (``.old<hex>``) → rename the purge copy in → rmtree old. Crash
    windows and their repair:

    - between the two renames (``d`` missing, filtered copy complete
      because it was fully written before the first rename): roll
      FORWARD — rename the ``.purge`` copy to ``d``;
    - ``d`` missing with only an ``.old`` sibling (filtered copy lost):
      roll BACK — rename ``.old`` to ``d``;
    - ``d`` present: any ``.old``/``.purge`` siblings are garbage from a
      completed or aborted swap (incl. a partial write-aside) — remove.

    Idempotent and safe to call any time; callers that enumerate a
    parent directory (quarantine / side-index epoch dirs) must also skip
    the sibling names so a leftover is never read as live data."""
    parent, name = os.path.split(os.path.normpath(d))
    try:
        sibs = os.listdir(parent or ".")
    except FileNotFoundError:
        return
    olds = [s for s in sibs if s.startswith(name + ".old")]
    purges = [s for s in sibs if s.startswith(name + ".purge")]
    if not os.path.isdir(d):
        if purges:
            purges.sort(
                key=lambda s: os.path.getmtime(os.path.join(parent, s))
            )
            os.rename(os.path.join(parent, purges.pop()), d)
        elif olds:
            olds.sort(key=lambda s: os.path.getmtime(os.path.join(parent, s)))
            os.rename(os.path.join(parent, olds.pop()), d)
    for s in olds + purges:
        shutil.rmtree(os.path.join(parent, s), ignore_errors=True)


def is_swap_leftover(name: str) -> bool:
    """True for ``<d>.old<hex>`` / ``<d>.purge<hex>`` sibling names a
    crashed swap may leave next to a live dir."""
    return bool(re.search(r"\.(old|purge)[0-9a-f]{8}$", name))


def swap_leftover_base(name: str) -> str:
    """Base dir name a ``.old<hex>``/``.purge<hex>`` leftover belongs to."""
    return re.sub(r"\.(old|purge)[0-9a-f]{8}$", "", name)


def heal_swap_leftovers(parent: str) -> None:
    """Heal every crashed :func:`rewrite_dir_excluding` swap under
    ``parent`` BEFORE enumerating it. Callers that merely skip leftover
    names while iterating never reach the crash state where the base dir
    itself is missing (crash between rename-aside and rename-in): the
    base name is absent from the listing, so per-name
    ``recover_dir_swap`` calls keyed on listed names never fire and the
    kept rows stay invisible. Deriving the base path from each leftover
    name and healing it first makes those states reachable."""
    try:
        names = os.listdir(parent)
    except FileNotFoundError:
        return
    for base in sorted(
        {swap_leftover_base(n) for n in names if is_swap_leftover(n)}
    ):
        recover_dir_swap(os.path.join(parent, base))


def rewrite_dir_excluding(spark, d: str, col: str, keys: list) -> None:
    """Rewrite a parquet directory in place WITHOUT the rows whose
    ``col`` is in ``keys`` (write-aside → rename-old-aside → rename-in →
    rmtree). NULL ``col`` rows are KEPT — three-valued ``~isin`` would
    silently delete them. Shared by the purge cascades (quarantine dirs
    here, side-index epoch dirs in operators/incremental.py). Heals any
    leftover from a previously crashed swap first."""
    recover_dir_swap(d)
    df = spark.read.parquet(d)
    kept = df.filter(
        F.col(col).isNull() | ~F.col(col).isin(list(keys))
    )
    tmp = f"{d}.purge{uuid.uuid4().hex[:8]}"
    kept.write.parquet(tmp)
    old = f"{d}.old{uuid.uuid4().hex[:8]}"
    os.rename(d, old)
    os.rename(tmp, d)
    shutil.rmtree(old, ignore_errors=True)


class ParquetLakeTable:
    """Merge-on-read snapshot table over local/posix parquet.

    ``compact_min_deltas`` / ``compact_ratio``: a commit triggers compaction
    when at least ``compact_min_deltas`` delta groups exist AND their total
    rows exceed ``compact_ratio ×`` base rows — amortized O(log) rewrites of
    any row, like LSM leveling."""

    #: Physical-behavior properties persisted in the manifest (Iceberg
    #: TBLPROPERTIES): recorded at table creation, adopted by handles
    #: that don't explicitly override, updated via :meth:`set_properties`.
    #: Without persistence a second handle opened with bare defaults
    #: silently changes the table's physical story (un-clustered folds,
    #: stats-less writes) — the same foot-gun n_buckets already guards.
    PROPERTY_DEFAULTS: dict = {
        "compact_min_deltas": 8,
        "compact_ratio": 1.0,
        "compact_mode": "full",
        "url_hll": False,
        "feed_retain_epochs": None,
        "stats_columns": (),
        "sort_columns": (),
        "cluster_mode": "range",
        "key_bloom": False,
        "target_file_bytes": None,
    }

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        n_buckets: int = 16,
        schema_ddl: str = TARGET_DDL,
        compact_min_deltas: int | None = None,
        compact_ratio: float | None = None,
        compact_mode: str | None = None,
        url_hll: bool | None = None,
        ref: str = "main",
        feed_retain_epochs: int | None = None,
        stats_columns: tuple[str, ...] | list[str] | None = None,
        sort_columns: tuple[str, ...] | list[str] | None = None,
        cluster_mode: str | None = None,
        key_bloom: bool | None = None,
        target_file_bytes: int | None = None,
    ) -> None:
        # property resolution happens after the snapshot is known (args
        # override; table-recorded properties fill; defaults last) — the
        # explicit args are kept aside until then
        prop_args = {
            "compact_min_deltas": compact_min_deltas,
            "compact_ratio": compact_ratio,
            "compact_mode": compact_mode,
            "url_hll": url_hll,
            "feed_retain_epochs": feed_retain_epochs,
            "stats_columns": stats_columns,
            "sort_columns": sort_columns,
            "cluster_mode": cluster_mode,
            "key_bloom": key_bloom,
            "target_file_bytes": target_file_bytes,
        }
        if ref != "main" and (not ref or "/" in ref or ref.startswith(".")):
            raise ValueError(f"invalid branch name {ref!r}")
        self.spark = spark
        self.path = path.rstrip("/")
        self.n_buckets = n_buckets
        #: cache of loaded stats manifests (group_stats) — safe because a
        #: manifest file is immutable once written (uuid-named,
        #: create-exclusive): a ref never changes meaning.
        self._manifest_cache: dict[str, dict] = {}
        #: which ref this handle commits to. "main" is the table itself;
        #: any other name is a BRANCH (Iceberg branch refs): an
        #: independent snapshot+staged namespace under branches/<name>/
        #: sharing the table's data directory — commits, compaction, WAP,
        #: replay all work unchanged on a branch handle, invisible to
        #: main's readers until fast_forward() publishes the head.
        self.ref = ref
        ref_root = (
            self.path if ref == "main"
            else os.path.join(self.path, "branches", ref)
        )
        self._snap_dir = os.path.join(ref_root, "snapshots")
        self._data_dir = os.path.join(self.path, "data")
        # write-audit-publish: staged (invisible) epoch manifests live here
        self._staged_dir = os.path.join(ref_root, "staged")
        # serializes snapshot commits for concurrent (pipelined) epochs in
        # this process; cross-process safety comes from the atomic rename
        # (optimistic concurrency, like Iceberg's commit retry)
        self._commit_lock = threading.Lock()
        # at most one compaction at a time; contenders skip, not queue
        self._compact_lock = threading.Lock()
        os.makedirs(self._snap_dir, exist_ok=True)
        os.makedirs(self._data_dir, exist_ok=True)
        os.makedirs(self._staged_dir, exist_ok=True)
        if ref != "main" and self.current_snapshot() is None:
            raise ValueError(
                f"branch {ref!r} does not exist — create it from a main "
                f"handle with create_branch({ref!r}) first"
            )
        if self.current_snapshot() is None:
            snap = {
                "version": 0,
                "epoch_id": None,
                "committed_epochs": [],
                "schema_v": 0,
                "schemas": {"0": schema_ddl},
                "renames": [],
                "drops": [],
                "n_buckets": n_buckets,
                "base": {},
                "base_rows": 0,
                "deltas": [],
                "metrics": {},
                "lineage": [],
                "committed_at": time.time(),
                # TBLPROPERTIES: physical-behavior knobs recorded at
                # creation so every later default-open behaves the same
                "properties": self._jsonable_props({
                    k: (prop_args[k] if prop_args[k] is not None else d)
                    for k, d in self.PROPERTY_DEFAULTS.items()
                }),
            }
            try:
                _atomic_create_json(self._snap_path(0), snap)
            except FileExistsError:
                pass  # another process bootstrapped the table first
        # the manifest is authoritative for the physical layout: the ctor
        # arg only seeds table CREATION. A second handle opened with a
        # different n_buckets default must not mis-prune lookups or write
        # mis-bucketed deltas — it adopts the table's recorded value
        # (every data-placement op re-reads it from its captured snapshot,
        # so even a concurrent rebucket can't skew this handle).
        cur = self.current_snapshot()
        self.n_buckets = self._nb(cur)
        # properties: explicit ctor args override (handle-local, like a
        # session conf); the table's recorded properties fill the rest;
        # pre-properties tables fall back to the legacy defaults. Commit
        # durable changes with set_properties().
        stored = cur.get("properties") or {}
        self._apply_properties({
            k: (
                prop_args[k]
                if prop_args[k] is not None
                else stored.get(k, d)
            )
            for k, d in self.PROPERTY_DEFAULTS.items()
        })
        if self.cluster_mode == "zorder" and len(self.sort_columns) >= 2:
            # fail FAST on an unquantizable zorder layout: without this,
            # a bad sort column only surfaces when auto-maintenance first
            # folds — hours into ingest — and every later compaction
            # repeats the failure. Validates against the live snapshot
            # schema (covers evolved columns); columns added later
            # re-validate in add_column.
            from .zorder import validate_zorder_columns

            validate_zorder_columns(self.schema(), self.sort_columns)

    # ------------------------------------------------------------------
    # table properties (Iceberg TBLPROPERTIES)
    # ------------------------------------------------------------------

    @staticmethod
    def _jsonable_props(props: dict) -> dict:
        return {
            k: (list(v) if isinstance(v, tuple) else v)
            for k, v in props.items()
        }

    def _apply_properties(self, props: dict) -> None:
        """Validate and bind the resolved property set to this handle.

        The knobs (all recorded in the snapshot's ``properties``):
        ``url_hll`` — cumulative distinct-url HLL per commit (one extra
        O(change-set) url-only scan); ``stats_columns`` — per-file
        min/max/null manifest stats driving scan_where data skipping;
        ``sort_columns`` + ``cluster_mode`` ('range' lexicographic |
        'zorder' Morton) — compaction write clustering; ``key_bloom`` —
        per-file merge-key blooms for driver-side point-lookup pruning;
        ``target_file_bytes`` — bytes-proportional fold output sizing;
        ``compact_min_deltas``/``compact_ratio``/``compact_mode``
        ('full' | 'hot') — auto-maintenance triggers;
        ``feed_retain_epochs`` — newest epochs auto-folds must keep
        feed-servable (None = compact_min_deltas; 0 disables)."""
        if props["cluster_mode"] not in ("range", "zorder"):
            raise ValueError(
                "cluster_mode must be 'range' or 'zorder', got "
                f"{props['cluster_mode']!r}"
            )
        if props["compact_mode"] not in ("full", "hot"):
            raise ValueError(
                f"compact_mode must be 'full' or 'hot', got "
                f"{props['compact_mode']!r}"
            )
        fre = props["feed_retain_epochs"]
        if fre is not None and int(fre) < 0:
            raise ValueError("feed_retain_epochs must be >= 0")
        self.url_hll = bool(props["url_hll"])
        self.compact_min_deltas = int(props["compact_min_deltas"])
        self.compact_ratio = float(props["compact_ratio"])
        self.compact_mode = props["compact_mode"]
        self.stats_columns = tuple(props["stats_columns"])
        self.sort_columns = tuple(props["sort_columns"])
        self.cluster_mode = props["cluster_mode"]
        self.target_file_bytes = (
            None if props["target_file_bytes"] is None
            else int(props["target_file_bytes"])
        )
        self.key_bloom = bool(props["key_bloom"])
        self._feed_retain_epochs = None if fre is None else int(fre)

    def properties(self) -> dict:
        """The table's recorded properties (current snapshot; legacy
        defaults fill keys predating the properties manifest)."""
        stored = (self.current_snapshot() or {}).get("properties") or {}
        out = {}
        for k, d in self.PROPERTY_DEFAULTS.items():
            v = stored.get(k, d)
            out[k] = tuple(v) if isinstance(d, tuple) else v
        return out

    def set_properties(self, **props) -> dict:
        """Durably change table properties (ALTER TABLE SET
        TBLPROPERTIES): one metadata-only snapshot commit; handles opened
        with defaults afterwards adopt the new values (THIS handle adopts
        immediately). Unknown keys are rejected. Rebases like any commit
        — concurrent epochs keep their deltas; concurrent set_properties
        last-writer-wins per key."""
        unknown = set(props) - set(self.PROPERTY_DEFAULTS)
        if unknown:
            raise ValueError(f"unknown table properties: {sorted(unknown)}")
        merged = dict(self.properties(), **props)
        self._apply_properties(dict(merged))  # validates + binds locally
        if self.cluster_mode == "zorder" and len(self.sort_columns) >= 2:
            from .zorder import validate_zorder_columns

            validate_zorder_columns(self.schema(), self.sort_columns)
        snap = self.current_snapshot()
        out = self._commit(
            snap, None,
            metrics={"op": "set_properties",
                     "changed": sorted(props)},
            lineage=[],
            properties=self._jsonable_props(merged),
        )
        return out

    # ------------------------------------------------------------------
    # snapshot bookkeeping
    # ------------------------------------------------------------------

    def _nb(self, snap: dict) -> int:
        """The snapshot's bucket count (manifest-authoritative; pre-
        evolution manifests fall back to the handle's creation value)."""
        return int(snap.get("n_buckets", self.n_buckets))

    def _snap_path(self, version: int) -> str:
        return os.path.join(self._snap_dir, f"v{version:08d}.json")

    def current_snapshot(self) -> dict | None:
        snaps = self._snapshot_files()
        if not snaps:
            return None
        with open(os.path.join(self._snap_dir, snaps[-1])) as f:
            return json.load(f)

    def _snapshot_files(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self._snap_dir)
            if f.startswith("v") and f.endswith(".json")
        )

    def snapshot_at(self, version: int) -> dict:
        """Load a specific snapshot version (time travel)."""
        with open(self._snap_path(version)) as f:
            return json.load(f)

    def committed_epochs(self) -> set[int]:
        snap = self.current_snapshot()
        return set(snap["committed_epochs"]) if snap else set()

    def metrics_history(self) -> list[dict]:
        """Every retained snapshot's commit metrics in version order —
        the monitoring feed (rows/dedup/watermark-lag per commit,
        compactions, schema changes, rollbacks). Manifest-only: no data
        files touched. Feed it to ``spark.createDataFrame`` for the
        rollup queries (metrics_rollup shape) or ship it to a metrics
        sink."""
        out = []
        for fn in self._snapshot_files():
            snap = self.snapshot_at(int(fn[1:9]))
            m = dict(snap.get("metrics") or {})
            m["snapshot_version"] = snap["version"]
            out.append(m)
        return out

    def lineage_history(self) -> list[dict]:
        """Per-bucket lineage records of every retained commit (the
        TaskReport analogue, reference exec/BulkLoader.java:121-152),
        flattened with their snapshot version and epoch."""
        out = []
        for fn in self._snapshot_files():
            snap = self.snapshot_at(int(fn[1:9]))
            for rec in snap.get("lineage") or []:
                out.append(dict(rec, snapshot_version=snap["version"],
                                epoch_id=snap.get("epoch_id")))
        return out

    def files(self, *, version: int | None = None) -> list[dict]:
        """Per-file metadata of a snapshot (Iceberg's ``files`` metadata
        table): path, kind (base/delta), bucket, write-time schema_v,
        rows, bytes. Manifest + footer-free where possible — rows come
        from the manifest for base groups and delta groups; bytes from
        the filesystem. Drives ops tooling (small-file reports, skew
        inspection) without touching data contents."""
        snap = (
            self.snapshot_at(version) if version is not None
            else self.current_snapshot()
        )
        out = []
        for b, e in sorted(snap["base"].items(), key=lambda kv: int(kv[0])):
            st = self.group_stats(e) or {}
            for rel in e["files"]:
                fp = os.path.join(self.path, rel)
                out.append({
                    "path": rel, "kind": "base", "bucket": int(b),
                    "schema_v": int(e["schema_v"]),
                    "rows": None if len(e["files"]) > 1 else e.get("rows"),
                    "bytes": os.path.getsize(fp) if os.path.exists(fp) else None,
                    "stats": st.get(rel),
                })
        for d in snap["deltas"]:
            st = self.group_stats(d) or {}
            for rel in d["files"]:
                fp = os.path.join(self.path, rel)
                out.append({
                    "path": rel, "kind": "delta", "bucket": None,
                    "schema_v": int(d["schema_v"]),
                    "rows": None if len(d["files"]) > 1 else d.get("rows"),
                    "bytes": os.path.getsize(fp) if os.path.exists(fp) else None,
                    "stats": st.get(rel),
                })
        return out

    def url_cardinality(self, *, version: int | None = None) -> int | None:
        """Estimated distinct urls EVER ingested (deletes included) as of
        a snapshot, from the manifest-resident HLL — no data files
        touched. None until a ``url_hll=True`` handle has committed."""
        from ..operators.sketch import estimate_from_registers

        snap = (
            self.snapshot_at(version) if version is not None
            else self.current_snapshot()
        )
        regs = snap.get("url_hll") or {}
        return estimate_from_registers(regs) if regs else None

    def schema(self, snap: dict | None = None) -> T.StructType:
        snap = snap or self.current_snapshot()
        return T.StructType.fromDDL(snap["schemas"][str(snap["schema_v"])])

    # ------------------------------------------------------------------
    # read path
    # ------------------------------------------------------------------

    def _normalize(
        self, df: DataFrame, from_schema_v: int, snap: dict, cur: T.StructType
    ) -> DataFrame:
        """Write-time schema → current schema: renames AND drops after the
        file's version (applied interleaved in schema_v order — a rename
        into a previously-dropped name must not expose the dropped data),
        then null-fill + cast (the widen lattice guarantees casts are
        lossless). Drops give Iceberg's no-resurrection semantics without
        field ids: a column dropped at v and re-added later reads NULL
        from pre-drop files — their physical values stay hidden."""
        changes = sorted(
            [dict(r, _op="rename") for r in snap["renames"]]
            + [dict(d, _op="drop") for d in snap.get("drops", [])],
            key=lambda c: c["schema_v"],
        )
        for c in changes:
            if c["schema_v"] <= from_schema_v:
                continue
            if c["_op"] == "rename" and c["from"] in df.columns:
                df = df.withColumnRenamed(c["from"], c["to"])
            elif c["_op"] == "drop" and c["name"] in df.columns:
                df = df.drop(c["name"])
        cols = []
        for field in cur.fields:
            if field.name in df.columns:
                cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
            else:
                cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        return df.select(*cols, F.col("bkt"))

    def _empty(self, cur: T.StructType) -> DataFrame:
        return self.spark.createDataFrame(
            [], T.StructType(cur.fields).add("bkt", T.IntegerType())
        )

    def _read_file_groups(
        self, snap: dict, groups: list[tuple[int, list[str]]]
    ) -> DataFrame | None:
        """Read (schema_v, files) groups, each normalized to the current
        schema. File paths are manifest-relative. Extra physical columns in
        a file (deltas carry ``_n_events``) are simply not selected."""
        cur = self.schema(snap)
        by_v: dict[int, list[str]] = {}
        for schema_v, files in groups:
            if files:
                by_v.setdefault(schema_v, []).extend(files)
        parts: list[DataFrame] = []
        for schema_v, files in sorted(by_v.items()):
            ddl = snap["schemas"][str(schema_v)]
            file_schema = T.StructType.fromDDL(ddl).add("bkt", T.IntegerType())
            df = self.spark.read.schema(file_schema).parquet(
                *[os.path.join(self.path, p) for p in files]
            )
            parts.append(self._normalize(df, schema_v, snap, cur))
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _base_df(self, snap: dict, buckets: list[int] | None) -> DataFrame | None:
        want = set(buckets) if buckets is not None else None
        groups = [
            (int(e["schema_v"]), e["files"])
            for b, e in snap["base"].items()
            if want is None or int(b) in want
        ]
        return self._read_file_groups(snap, groups)

    def _delta_df(self, snap: dict, buckets: list[int] | None) -> DataFrame | None:
        groups = [(int(d["schema_v"]), d["files"]) for d in snap["deltas"]]
        df = self._read_file_groups(snap, groups)
        if df is not None and buckets is not None:
            # deltas are range-clustered by bkt → row-group stats prune this
            df = df.filter(F.col("bkt").isin([int(b) for b in buckets]))
        return df

    def read(
        self,
        buckets: list[int] | None = None,
        *,
        version: int | None = None,
        project: dict[str, Column] | None = None,
        keys: DataFrame | None = None,
    ) -> DataFrame:
        """Merged state including tombstones; ``buckets`` prunes;
        ``version`` time-travels to an older snapshot (files are
        immutable, so any un-expired snapshot reconstructs exactly).
        MOR reconstruction: latest (warc_ts, seq) per url over base∪deltas —
        a partial-combine agg, never a window sort (see operators/merge.py).

        ``project``: {name: Column} computed on the RAW rows BEFORE the
        dedup; the result then carries only url, the order columns,
        is_deleted, and the projected names. This is the derived-value
        fast path (e.g. snapshot_diff's content digest): the agg buffers
        hold the few projected bytes instead of full html/text payloads,
        and untouched payload columns prune out of the scan entirely —
        at 10^10 rows the difference between hashing a table and
        re-materializing one.

        ``keys``: a one-column ``url`` frame; rows restrict to those
        urls via a left-semi join applied to the RAW rows BEFORE the
        dedup (sound: the per-url winner among a url's own rows is the
        winner, period). This is the incremental-fold fast path
        (aggview): the max_by aggregation then runs over the keys' own
        version chains instead of the whole bucket slice, and Spark's
        runtime bloom-filter join injection can skip parquet row groups
        on the scan side — O(Δ-rows aggregated), not O(slice)."""
        snap = (
            self.snapshot_at(version) if version is not None
            else self.current_snapshot()
        )
        cur = self.schema(snap)
        base = self._base_df(snap, buckets)
        delta = self._delta_df(snap, buckets)
        if keys is not None:
            kdf = keys.select("url").distinct()
            if base is not None:
                base = base.join(kdf, "url", "left_semi")
            if delta is not None:
                delta = delta.join(kdf, "url", "left_semi")
        if project is not None:
            keep = [F.col("url"), F.col("warc_ts"), F.col("seq"),
                    F.col("is_deleted")]
            exprs = [e.alias(n) for n, e in project.items()]

            def _slim(df: DataFrame) -> DataFrame:
                return df.select(*keep, *exprs)

            base = _slim(base) if base is not None else None
            delta = _slim(delta) if delta is not None else None
            if base is None and delta is None:
                return _slim(self._empty(cur))
        if base is None and delta is None:
            return self._empty(cur)
        if delta is None:
            return base  # base is already one row per url
        both = delta if base is None else base.unionByName(delta)
        return dedup_latest(both)

    def published(self, *, version: int | None = None) -> DataFrame:
        """Final user-facing state (tombstones filtered); ``version``
        time-travels — the ONE definition of the published view, shared
        by read_tag/read_as_of/CLI so the tombstone/bkt convention can
        never diverge between them."""
        return (
            self.read(version=version)
            .filter(~F.col("is_deleted"))
            .drop("is_deleted", "bkt")
        )

    # ------------------------------------------------------------------
    # stats-pruned scans (streaming/filestats.py — Iceberg scan planning)
    # ------------------------------------------------------------------

    def _write_time_name(
        self, snap: dict, logical: str, schema_v: int
    ) -> str | None:
        """The column name that held ``logical``'s data in files written
        at ``schema_v`` — the inverse of _normalize's forward rename/drop
        chain. None ⇒ the column didn't exist then (or was dropped on the
        way): those files read NULL for it."""
        changes = sorted(
            [dict(r, _op="rename") for r in snap["renames"]]
            + [dict(d, _op="drop") for d in snap.get("drops", [])],
            key=lambda c: c["schema_v"],
        )
        phys = T.StructType.fromDDL(snap["schemas"][str(schema_v)]).fieldNames()
        for p in phys:
            name: str | None = p
            for c in changes:
                if c["schema_v"] <= schema_v:
                    continue
                if c["_op"] == "rename" and c["from"] == name:
                    name = c["to"]
                elif c["_op"] == "drop" and c["name"] == name:
                    name = None
                    break
            if name == logical:
                return p
        return None

    def _resolved_filters(
        self, snap: dict, filters: list[tuple], schema_v: int
    ) -> list[tuple]:
        """Predicates rewritten to a file group's write-time column names
        and the encoded comparison domain (filestats.encode_value)."""
        from .filestats import encode_value

        cur = {f.name: f.dataType for f in self.schema(snap).fields}
        out = []
        for col, op, val in filters:
            if col not in cur:
                raise ValueError(f"unknown column {col!r} in scan filter")
            out.append((
                self._write_time_name(snap, col, schema_v),
                op,
                encode_value(cur[col], val),
            ))
        return out

    def _buckets_of_keys(self, keys, nb: int) -> set[int]:
        """Hash buckets of a key list — one driver-local job over the
        keys (Spark's xxhash64, never re-implemented host-side: no
        drift)."""
        kdf = self.spark.createDataFrame([(u,) for u in keys], "url string")
        return {
            r["b"]
            for r in kdf.select(
                bucket_of(F.col("url"), nb).alias("b")
            ).distinct().collect()
        }

    def _key_keep_fn(self, snap: dict, keys: set | None):
        """Strong merge-key file-keep rule as a reusable predicate
        ``(stats_entry, schema_v) -> bool``: can this file hold ANY
        version of any probe key? A bloom negative OR a url-min/max miss
        (per key) is definitive even in dirty buckets and among deltas —
        every version of a key lives only in files containing it. No
        signal degrades to keep. ``keys=None`` keeps everything."""
        from .filestats import bloom_maybe_contains, could_match, encode_value

        wt_cache: dict[int, str | None] = {}

        def skeep(st_entry: dict | None, schema_v: int) -> bool:
            if keys is None:
                return True
            if schema_v not in wt_cache:
                wt_cache[schema_v] = self._write_time_name(
                    snap, "url", schema_v
                )
            wt = wt_cache[schema_v]
            kb = (st_entry or {}).get("kb")
            for u in keys:
                if kb is not None and not bloom_maybe_contains(kb, u):
                    continue
                if (
                    st_entry is not None
                    and wt is not None
                    and not could_match(
                        st_entry, [(wt, "=", encode_value(T.StringType(), u))]
                    )
                ):
                    continue
                return True
            return False

        return skeep

    def scan_plan(
        self, filters: list[tuple], *, version: int | None = None
    ) -> dict:
        """Plan a predicate scan from manifest stats alone (no data IO).

        ``filters``: conjunctive ``(column, op, value)`` triples, op in
        =/</<=/>/>= (plus ``in`` on the merge key ``url``), evaluated
        against the MERGED latest state. Sound pruning under MOR (see
        streaming/filestats.py):

        * skip a bucket iff NO file covering it could match;
        * in kept buckets WITHOUT pending delta coverage ("clean"),
          additionally skip non-matching base files (the base holds one
          row per key, so no other version hides there);
        * delta files are never stat-pruned — any one covering a kept
          bucket may supersede a matching row — they only vote on kept
          buckets.

        EXCEPT for equality on the merge key itself: ``("url","=",v)`` /
        ``("url","in",[...])`` prune per-FILE everywhere, deltas and
        dirty buckets included — every version of a key lives only in
        files containing that key, so a file whose bloom says "absent"
        (or whose url min/max excludes every probe key) cannot hold ANY
        version of it. Buckets additionally restrict to the keys' hash
        buckets.

        Files without stats degrade to "could match" + "covers all
        buckets". Returns the group list scan_where reads plus skip
        accounting."""
        from .filestats import could_match, file_bucket_cover

        snap = (
            self.snapshot_at(version) if version is not None
            else self.current_snapshot()
        )
        nb = self._nb(snap)
        # conjunction of url-equality filters → one effective key set
        keys: set | None = None
        attr: list[tuple] = []
        for f in filters:
            col, op, val = f
            if col == "url" and op in ("=", "in"):
                s = {val} if op == "=" else set(val)
                keys = s if keys is None else keys & s
            else:
                attr.append(f)
        rf_cache: dict[int, list[tuple]] = {}

        def rf(schema_v: int) -> list[tuple]:
            if schema_v not in rf_cache:
                rf_cache[schema_v] = self._resolved_filters(
                    snap, attr, schema_v
                )
            return rf_cache[schema_v]

        skeep = self._key_keep_fn(snap, keys)
        kept: set[int] = set()
        dirty: set[int] = set()  # buckets with any delta coverage
        delta_cover: list[tuple[dict, str, int, int]] = []
        for d in snap["deltas"]:
            st = self.group_stats(d) or {}
            for f in d["files"]:
                lo, hi = file_bucket_cover(st.get(f), nb)
                dirty.update(range(lo, hi + 1))
                delta_cover.append((d, f, lo, hi))
                if could_match(st.get(f), rf(int(d["schema_v"]))):
                    kept.update(range(lo, hi + 1))
        base_match: dict[str, list[str]] = {}
        for b, entry in snap["base"].items():
            st = self.group_stats(entry) or {}
            hits = [
                f for f in entry["files"]
                if could_match(st.get(f), rf(int(entry["schema_v"])))
            ]
            base_match[b] = hits
            if hits:
                kept.add(int(b))
        if keys is not None:
            kept &= self._buckets_of_keys(keys, nb) if keys else set()

        groups: list[tuple[int, list[str]]] = []
        base_read = 0
        base_total = sum(len(e["files"]) for e in snap["base"].values())
        for b, entry in snap["base"].items():
            if int(b) not in kept:
                continue
            st = self.group_stats(entry) or {}
            sv = int(entry["schema_v"])
            files = (
                entry["files"] if int(b) in dirty  # dirty: every version
                else base_match[b]                  # clean: file-granular
            )
            files = [f for f in files if skeep(st.get(f), sv)]
            if files:
                groups.append((sv, files))
                base_read += len(files)
        delta_read = 0
        by_group: dict[int, list[str]] = {}
        for d, f, lo, hi in delta_cover:
            if any(b in kept for b in range(lo, hi + 1)) and skeep(
                (self.group_stats(d) or {}).get(f), int(d["schema_v"])
            ):
                by_group.setdefault(id(d), []).append(f)
        for d in snap["deltas"]:
            files = by_group.get(id(d), [])
            if files:
                groups.append((int(d["schema_v"]), files))
                delta_read += len(files)
        return {
            "filters": [list(f) for f in filters],
            "probe_keys": sorted(keys) if keys is not None else None,
            "version": snap["version"],
            "n_buckets": nb,
            "buckets_kept": sorted(kept),
            "buckets_clean": sorted(set(range(nb)) - dirty),
            "base_files_total": base_total,
            "base_files_read": base_read,
            "delta_files_total": len(delta_cover),
            "delta_files_read": delta_read,
            "files_skipped": (base_total - base_read)
            + (len(delta_cover) - delta_read),
            "groups": groups,
        }

    def _pred_column(self, filters: list[tuple], cur: T.StructType):
        ops = {
            "=": lambda c, v: c == v, "<": lambda c, v: c < v,
            "<=": lambda c, v: c <= v, ">": lambda c, v: c > v,
            ">=": lambda c, v: c >= v,
        }
        types = {f.name: f.dataType for f in cur.fields}
        cond = F.lit(True)
        for col, op, val in filters:
            if op == "in":
                cond = cond & F.col(col).isin(list(val))
                continue
            lit = F.lit(val)
            if isinstance(val, str) and isinstance(
                types[col], (T.TimestampType, T.DateType)
            ):
                lit = lit.cast(types[col])
            cond = cond & ops[op](F.col(col), lit)
        return cond

    def scan_where(
        self,
        filters: list[tuple],
        *,
        version: int | None = None,
        published: bool = True,
    ) -> DataFrame:
        """Predicate read over the merged latest state that touches ONLY
        the files scan_plan kept — semantically identical to
        ``published().filter(pred)`` (or ``read().filter(pred)`` with
        ``published=False``), physically O(matching buckets + their
        files). The predicate ALSO runs post-merge, so stats only ever
        skip IO, never decide rows."""
        snap = (
            self.snapshot_at(version) if version is not None
            else self.current_snapshot()
        )
        cur = self.schema(snap)
        plan = self.scan_plan(filters, version=version)
        df = self._read_file_groups(snap, plan["groups"])
        if df is None:
            out = self._empty(cur)
        else:
            kept = plan["buckets_kept"]
            if len(kept) < plan["n_buckets"]:
                # rows a wide delta file carries for pruned buckets can't
                # match — drop them before the merge shuffle
                df = df.filter(F.col("bkt").isin(kept))
            out = dedup_latest(df)
        out = out.filter(self._pred_column(filters, cur))
        if published:
            out = out.filter(~F.col("is_deleted")).drop("is_deleted", "bkt")
        return out

    def changes_between(
        self, since_epoch: int, until_epoch: int | None = None
    ) -> DataFrame:
        """Incremental change-feed read (the lake as a CDC *source* for
        downstream consumers — Iceberg's incremental scan re-expressed):
        one net row per url touched in epochs (since_epoch, until_epoch],
        the (warc_ts, seq)-winner within that range, deletes included as
        ``is_deleted`` tombstone rows. A consumer applying consecutive
        ranges in order reconstructs the table exactly (same MOR
        resolution as ``read``).

        Cost is O(change-set): only the range's delta files are scanned —
        never the base — so a downstream consumer of a 100 TB table pays
        for its lag, not the table. Raises when part of the range has been
        folded into the base by compaction (the consumer's cursor is too
        old → full refresh), mirroring Iceberg's incremental read failing
        over expired snapshots."""
        snap = self.current_snapshot()

        def in_range(e: int) -> bool:
            return e > since_epoch and (until_epoch is None or e <= until_epoch)

        wanted = {e for e in snap["committed_epochs"] if in_range(int(e))}
        # residual groups (partial compaction) carry epoch_id None: their
        # rows left the feed's serving range when their epochs were folded
        groups = [
            (int(d["schema_v"]), d["files"])
            for d in snap["deltas"]
            if d.get("epoch_id") is not None and in_range(int(d["epoch_id"]))
        ]
        available = {
            int(d["epoch_id"]) for d in snap["deltas"]
            if d.get("epoch_id") is not None and in_range(int(d["epoch_id"]))
        }
        # a residual group (epoch_id None) records which epochs it folded;
        # when the fold touched NO base bucket (pure binpack —
        # feed_complete) the residual holds the folded epochs' ENTIRE
        # per-url net change-set, so it serves the feed exactly when its
        # whole folded set lies inside the requested range (a lagging
        # cursor older than the fold). A residual from a hot fold is
        # NOT servable — its hot-bucket winners went into the base — and
        # partial range coverage would re-deliver consumed epochs'
        # winners; both cases fall through to cursor-too-old below.
        for d in snap["deltas"]:
            if d.get("epoch_id") is not None or not d.get("feed_complete"):
                continue
            fe = {int(e) for e in d.get("folded_epochs", ())}
            if fe and all(in_range(e) for e in fe):
                groups.append((int(d["schema_v"]), d["files"]))
                available |= fe
        # empty-batch epochs commit no delta group; they are committed but
        # contribute no rows and must not count as "compacted away"
        folded = wanted - available - self._empty_epochs()
        if folded:
            raise ValueError(
                f"epochs {sorted(folded)} were compacted into the base — "
                "incremental cursor too old; do a full refresh (read()) "
                "and restart the feed from the current epoch"
            )
        df = self._read_file_groups(snap, groups)
        if df is None:
            return self._empty(self.schema(snap))
        return dedup_latest(df)

    def consume_changes(self, out_dir: str) -> dict:
        """Exactly-once incremental feed CONSUMER step: read the net
        changes between this consumer's cursor and the table head, land
        them as one parquet range directory under ``out_dir``, and
        advance the cursor — crash-safe at every boundary. Each call
        drains whatever committed since the last call (poll it from cron
        or a driver loop: the CDC-out daemon).

        Protocol: the range content is deterministic (same MOR resolution
        as any read), the range dir is named by its epoch bounds, and the
        cursor file updates by atomic rename AFTER the range lands — a
        crash between the two re-computes the identical range, sees the
        directory already present, and just advances the cursor. A cursor
        older than the compaction horizon raises (changes_between's
        contract): remove ``out_dir`` and restart from a full read."""
        os.makedirs(out_dir, exist_ok=True)
        cur_path = os.path.join(out_dir, "_cursor.json")
        since = -1
        if os.path.exists(cur_path):
            with open(cur_path) as f:
                since = int(json.load(f)["since_epoch"])
        # a crash between the range rename and the cursor advance leaves a
        # landed range for this cursor; ADOPT it (advance the cursor to
        # its recorded upper bound) instead of computing a fresh,
        # OVERLAPPING range to a newer head — exactly-once means epochs
        # 5-9 must not ship twice just because epoch 10 committed before
        # the retry
        stale = sorted(
            (d for d in os.listdir(out_dir)
             if d.startswith(f"range_{since}_")),
            key=lambda d: int(d.rsplit("_", 1)[1]),  # NUMERIC: 12 > 9
        )
        if stale:
            target = os.path.join(out_dir, stale[-1])
            head = int(stale[-1].rsplit("_", 1)[1])
            # racing consumers can land several ranges from this cursor
            # with different heads; the widest supersedes the others
            # (same lower bound → strict subsets) — drop them so no
            # downstream ever sees overlapping ranges
            for d in stale[:-1]:
                shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)
        else:
            head = max(
                (int(e) for e in self.committed_epochs()), default=None
            )
            if head is None or head <= since:
                return {"since_epoch": since, "rows": 0, "noop": True}
            target = os.path.join(out_dir, f"range_{since}_{head}")
            feed = self.changes_between(since, head)
            scratch = os.path.join(out_dir, f"_tmp_{uuid.uuid4().hex}")
            feed.write.mode("overwrite").parquet(scratch)
            try:
                os.rename(scratch, target)
            except OSError:
                # a concurrent consumer landed this range first
                shutil.rmtree(scratch, ignore_errors=True)
                if not os.path.isdir(target):
                    raise
        rows = self.spark.read.parquet(target).count()
        tmp = cur_path + f".tmp{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"since_epoch": head}, f)
        os.rename(tmp, cur_path)
        return {"since_epoch": since, "until_epoch": head,
                "rows": rows, "out": target}

    def apply_changes(
        self, changes: DataFrame, epoch_id: int, *, evolve: bool = False
    ) -> dict:
        """Apply a change-feed range (the output of ``changes_between`` /
        ``consume_changes``: net winner rows per url, tombstones included,
        text already extracted) as ONE idempotent epoch commit — no
        re-deduplication, no re-extraction, no per-event processing. This
        is the replica half of lake-to-lake replication
        (``streaming/replicate.py``): a downstream mirror pays
        O(change-set) write cost per sync, never O(table) and never the
        upstream's extraction CPU.

        Rows are normalized to THIS table's current schema (columns the
        replica doesn't declare are dropped, missing declared columns
        null) and re-bucketed under its layout — source and replica may
        use different bucket counts. Duplicate delivery skips on
        ``epoch_id`` exactly like ``merge_epoch``; MOR winner resolution
        makes a re-applied range a semantic no-op either way.

        ``evolve=True`` propagates ADDITIVE schema evolution: a feed
        column the replica doesn't declare triggers ``add_column`` (same
        name and type) before the apply — the Debezium/Fivetran-style
        default for downstream mirrors. Renames and drops are DDL
        decisions, not inferable from a column list — apply the same
        ``rename_column``/``drop_column`` to the replica.
        """
        snap = self.current_snapshot()
        if epoch_id in set(snap["committed_epochs"]):
            return {"epoch_id": epoch_id, "skipped_duplicate_epoch": True}
        if evolve:
            declared = set(self.schema(snap).fieldNames())
            for f in changes.schema.fields:
                if f.name not in declared and f.name != "bkt":
                    self.add_column(f.name, f.dataType.simpleString())
            snap = self.current_snapshot()  # re-capture past the DDLs
        cur = self.schema(snap)
        nb = self._nb(snap)
        have = set(changes.columns)
        rows = changes.select(
            *[
                (F.col(f.name).cast(f.dataType) if f.name in have
                 else F.lit(None).cast(f.dataType)).alias(f.name)
                for f in cur.fields
            ]
        ).withColumn("bkt", bucket_of(F.col("url"), nb))

        rel_dir = f"data/e{epoch_id:08d}_{uuid.uuid4().hex[:8]}"
        out_dir = os.path.join(self.path, rel_dir)
        from pyspark.sql import Observation

        obs = Observation(f"replica_epoch_{epoch_id}")
        rows.observe(
            obs,
            F.count(F.lit(1)).alias("keys"),
            F.sum(F.col("is_deleted").cast("long")).alias("deletes"),
            F.max("warc_ts").alias("max_ts"),
        ).write.mode("overwrite").parquet(out_dir)
        stats = obs.get
        files, rows_written, nbytes = self._list_files(rel_dir)
        if rows_written == 0:
            return self._commit(
                snap, epoch_id,
                metrics={"epoch_id": epoch_id, "replicated": True,
                         "rows_in": 0, "empty_batch": True},
                lineage=[],
            )
        metrics = {
            "epoch_id": epoch_id,
            "replicated": True,
            "keys_in_batch": int(stats["keys"]),
            "delete_keys": int(stats["deletes"] or 0),
            "rows_written": rows_written,
            "delta_files": len(files),
            "delta_bytes": nbytes,
            "max_warc_ts": str(stats["max_ts"]),
            "delta_dir": rel_dir,
        }
        delta_group = {
            "files": files,
            "schema_v": snap["schema_v"],
            "rows": rows_written,
            "epoch_id": epoch_id,
        }
        self._attach_stats(delta_group, self._maybe_stats(files))
        out = self._commit(
            snap, epoch_id, metrics=metrics, lineage=[],
            new_delta=delta_group, expect_nb=nb,
        )
        self.maybe_compact()
        return out

    def _empty_epochs(self) -> set[int]:
        """Epochs committed with empty batches (no delta group ever
        existed) — recorded in each snapshot's commit metrics."""
        out: set[int] = set()
        for fn in self._snapshot_files():
            try:
                m = self.snapshot_at(int(fn[1:9])).get("metrics") or {}
            except (OSError, ValueError, KeyError):
                continue
            if m.get("empty_batch") and m.get("epoch_id") is not None:
                out.add(int(m["epoch_id"]))
            # fast_forward carries adopted empty epochs as a list (the
            # branch's per-epoch snapshots are not in this ref's dir)
            out |= {int(e) for e in m.get("empty_epochs", ())}
        # a rollback can un-commit an epoch whose original (historical)
        # commit was empty — history says "was empty once", the CURRENT
        # snapshot says whether it counts
        return out & self.committed_epochs()

    # ------------------------------------------------------------------
    # MERGE commit (merge-on-read: append the deduped change-set)
    # ------------------------------------------------------------------

    def merge_epoch(
        self,
        batch_events: DataFrame,
        epoch_id: int,
        *,
        extract: bool = True,
        stage: bool = False,
    ) -> dict:
        """Apply one micro-batch of change events as an idempotent, atomic
        commit; returns the commit metrics.

        ``batch_events`` columns: seq, op, url, warc_ts, html, lang
        (epoch/schema_change optional and ignored here).

        ONE heavy job per epoch: dedup (hash agg) → HTML→text extraction
        (Arrow-batched pandas UDF) → range-clustered delta write. Metrics
        then come from a column-pruned scan of the files just written plus
        their footers — never a second pass over html/text bytes.

        ``stage=True`` is write-audit-publish (Iceberg's WAP workflow):
        the heavy job runs and the delta files land, but instead of a
        snapshot commit a create-exclusive *staged manifest* is written —
        invisible to every reader until :meth:`publish_staged` promotes it
        (or :meth:`abort_staged` discards it). Audit the candidate with
        :meth:`audit_staged` / :meth:`staged_read` in between. Staging is
        covered by the same idempotence: a duplicate delivery of a staged
        or committed epoch skips.
        """
        # TransactionStage analogue (reference exec/TransactionStage.java,
        # consulted by BulkLoader's resume to know how far a transaction
        # got): each epoch progresses RUN_BEGIN → JOB_DONE (the one heavy
        # Spark job) → FILES_LISTED → COMMITTED / SKIPPED. The stage trace
        # plus per-phase wall seconds land in the commit metrics — our
        # resume unit is the whole epoch, so the trace is observability
        # and post-mortem truth, not a mid-epoch restart point.
        stages: list[str] = ["RUN_BEGIN"]
        t0 = time.perf_counter()
        phase: dict[str, float] = {}

        snap = self.current_snapshot()
        if epoch_id in set(snap["committed_epochs"]):
            return {"epoch_id": epoch_id, "skipped_duplicate_epoch": True,
                    "stages": stages + ["SKIPPED"]}
        if stage and os.path.exists(self._staged_path(epoch_id)):
            return {"epoch_id": epoch_id, "skipped_duplicate_stage": True,
                    "stages": stages + ["SKIPPED"]}

        cur = self.schema(snap)
        nb = self._nb(snap)

        # core event columns plus any payload column the evolved target
        # schema declares (schema-evolution adds flow through the merge).
        # A batch column may arrive under a PRE-rename name (producers keep
        # emitting the original name after a rename DDL) — resolve each
        # candidate through the rename/drop chain before the declared-name
        # check, else a renamed added column's payload would be silently
        # dropped (or a DROPPED column's stale payload would leak into a
        # reused name).
        ev_cols = ["seq", "op", "url", "warc_ts", "html", "lang"]
        declared = {f.name for f in cur.fields}
        resolve = self._wire_resolver(snap)

        extra_cols = [
            c for c in batch_events.columns
            if c not in ev_cols + ["epoch", "schema_change"]
            and resolve(c) in declared
        ]
        batch = batch_events.select(*ev_cols, *extra_cols)

        # piggyback per-key event counts on the dedup shuffle (no 2nd pass)
        latest = dedup_latest(batch, extra_aggs={"_n_events": F.count(F.lit(1))})
        if extract:
            latest = latest.withColumn(
                "text",
                F.when(F.col("op") == "D", F.lit(None).cast("string")).otherwise(
                    extract_text(F.col("html"))
                ),
            )
        elif "text" in latest.columns:
            # extract=False with pre-extracted text in the batch (an
            # upstream parser already did the html→text work, e.g. the
            # pipeline's lake sink): keep it — deletes still null out
            latest = latest.withColumn(
                "text",
                F.when(
                    F.col("op") == "D", F.lit(None).cast("string")
                ).otherwise(F.col("text")),
            )
        else:
            latest = latest.withColumn("text", F.lit(None).cast("string"))
        changes = changes_to_target_rows(latest, carry=["_n_events"])
        # incoming events use original column names; map each through the
        # rename/drop chain so evolved batches land under the current
        # names and payloads for dropped columns are discarded — even when
        # a later rename reuses the dropped name (the renamed column owns
        # it; the wire column predates the drop)
        structural = {"url", "warc_ts", "seq", "is_deleted", "_n_events"}
        mapping = {
            c: resolve(c) for c in changes.columns if c not in structural
        }
        # drops first (a rename may legitimately reuse a dropped name),
        # then renames; a rename whose target is still occupied loses to
        # the identity column already carrying that name
        for c, target in mapping.items():
            if target is None:
                changes = changes.drop(c)
        for c, target in mapping.items():
            if target is not None and target != c:
                if target in changes.columns:
                    changes = changes.drop(c)
                else:
                    changes = changes.withColumnRenamed(c, target)
        # normalize to the (possibly evolved) current schema
        for field in cur.fields:
            if field.name not in changes.columns:
                changes = changes.withColumn(
                    field.name, F.lit(None).cast(field.dataType)
                )
        changes = changes.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in cur.fields],
            F.col("_n_events"),
        ).withColumn("bkt", bucket_of(F.col("url"), nb))

        # dir name is version-independent so pipelined epochs never collide
        rel_dir = f"data/e{epoch_id:08d}_{uuid.uuid4().hex[:8]}"
        out_dir = os.path.join(self.path, rel_dir)
        # Write the dedup shuffle's output directly: AQE coalesces the agg's
        # post-shuffle partitions to sized files — no second shuffle, no
        # range-sampling pass (repartitionByRange would re-run extraction to
        # sample boundaries). Delta files are therefore url-hash-clustered,
        # not bucket-clustered; that's fine because in MOR nothing on the
        # hot path reads deltas by bucket (compaction and published() scan
        # them all).
        # lineage/metrics piggyback on the write itself via Observation:
        # 3 tiny conditional aggs per bucket + a global max, evaluated
        # inside the write job — per-epoch cost is ONE Spark job, not two
        # (reference TaskReport analogue, exec/BulkLoader.java:121-152).
        from pyspark.sql import Observation

        obs = Observation(f"epoch_{epoch_id}")
        # lineage granularity: exact per-bucket up to 16 buckets, else 16
        # contiguous bucket groups — keeps the observe expression count
        # (3×groups+1) inside whole-stage codegen and off the per-epoch
        # planning critical path (measured ~0.5 s/epoch at 97 exprs)
        n_groups = min(nb, 16)
        per_group = -(-nb // n_groups)  # ceil
        g = (F.col("bkt") / per_group).cast("int")
        obs_aggs = [F.max("warc_ts").alias("max_ts")]
        for i in range(n_groups):
            hit = g == i
            obs_aggs += [
                F.sum(F.when(hit, F.col("_n_events"))).alias(f"ev_{i}"),
                F.count(F.when(hit, F.lit(1))).alias(f"keys_{i}"),
                F.sum(F.when(hit & F.col("is_deleted"), F.lit(1))).alias(f"del_{i}"),
            ]
        changes.observe(obs, *obs_aggs).write.mode("overwrite").parquet(out_dir)
        stats = obs.get
        stages.append("JOB_DONE")
        phase["job"] = round(time.perf_counter() - t0, 3)

        files, rows_written, nbytes = self._list_files(rel_dir)
        stages.append("FILES_LISTED")
        phase["list_files"] = round(time.perf_counter() - t0 - phase["job"], 3)
        if rows_written == 0:
            if stage:
                return self._write_staged(
                    epoch_id,
                    metrics={"epoch_id": epoch_id, "rows_in": 0,
                             "empty_batch": True, "phase_seconds": phase},
                    lineage=[], delta_group=None, hll_regs=None, stages=stages,
                    n_buckets=nb,
                )
            return self._commit(
                snap, epoch_id,
                metrics={"epoch_id": epoch_id, "rows_in": 0, "empty_batch": True,
                         "stages": stages + ["COMMITTED"], "phase_seconds": phase},
                lineage=[],
            )

        lineage = [
            {"bucket": i * per_group,
             "buckets": f"{i * per_group}-{min((i + 1) * per_group, nb) - 1}",
             "rows": stats[f"keys_{i}"],
             "events": stats[f"ev_{i}"] or 0, "deletes": stats[f"del_{i}"] or 0}
            for i in range(n_groups)
            if stats[f"keys_{i}"]
        ]
        rows_in = sum(r["events"] for r in lineage)
        keys_in_batch = sum(r["rows"] for r in lineage)
        metrics = {
            "epoch_id": epoch_id,
            "rows_in": rows_in,
            "keys_in_batch": keys_in_batch,
            "dedup_count": rows_in - keys_in_batch,
            "delete_keys": sum(r["deletes"] for r in lineage),
            "rows_written": rows_written,
            "delta_files": len(files),
            "delta_bytes": nbytes,
            "buckets_touched": len(lineage),
            "max_warc_ts": str(stats["max_ts"]),
            # ingest watermark lag: commit wall-time minus newest event ts
            # (north-rule metric; negative-clamped for synthetic streams
            # whose event times are in the future of wall time). max_ts is a
            # naive datetime in the session tz (pinned UTC) — attach UTC
            # before .timestamp(), which would otherwise assume host-local.
            "watermark_lag_sec": (
                max(
                    0.0,
                    round(
                        time.time()
                        - stats["max_ts"].replace(tzinfo=timezone.utc).timestamp(),
                        3,
                    ),
                )
                if stats["max_ts"] is not None else None
            ),
        }
        metrics["stages"] = stages + ["COMMITTED"]
        metrics["delta_dir"] = rel_dir
        phase["metrics"] = round(
            time.perf_counter() - t0 - phase["job"] - phase["list_files"], 3
        )
        metrics["phase_seconds"] = phase
        delta_group = {
            "files": files,
            "schema_v": snap["schema_v"],
            "rows": rows_written,
            "epoch_id": epoch_id,
        }
        fstats = self._maybe_stats(files)
        if fstats:
            self._attach_stats(delta_group, fstats)
            phase["stats"] = round(
                time.perf_counter() - t0 - sum(phase.values()), 3
            )
        hll_regs = None
        if self.url_hll:
            # O(change-set) column-pruned re-read of the delta just
            # written (url only — a few bytes/row); ≤ 256 rows collect
            from ..operators.sketch import hll_sketch

            urls = self.spark.read.parquet(
                *[os.path.join(self.path, f) for f in files]
            ).select("url")
            hll_regs = {
                str(r["bucket"]): int(r["rho"])
                for r in hll_sketch(urls, "url", []).collect()
            }
        if stage:
            metrics["stages"] = stages  # _write_staged appends STAGED
            return self._write_staged(
                epoch_id, metrics=metrics, lineage=lineage,
                delta_group=delta_group, hll_regs=hll_regs, stages=stages,
                n_buckets=nb,
            )
        out = self._commit(
            snap, epoch_id, metrics=metrics, lineage=lineage,
            new_delta=delta_group, hll_regs=hll_regs, expect_nb=nb,
        )
        self.maybe_compact()
        return out

    # ------------------------------------------------------------------
    # point lookups & predicate deletes
    # ------------------------------------------------------------------

    def lookup_urls(self, urls: list[str] | str) -> DataFrame:
        """Point lookup: current live rows for the given url(s), reading
        ONLY their hash buckets (1/n_buckets of the base) — and, with
        ``key_bloom``, only the files whose manifest bloom (or url
        min/max) may contain a probe key: under a pile of pending deltas
        the lookup opens O(key's version count) files instead of every
        delta covering the bucket (scan_plan's merge-key strong rule).
        Bucket math runs as one driver-local Spark job over the key list
        (xxhash64 — never re-implemented host-side, no drift), pinned to
        the captured snapshot version so a concurrent rebucket commit
        cannot make the pruning set and the file layout disagree."""
        snap = self.current_snapshot()
        keys = [urls] if isinstance(urls, str) else list(urls)
        if not keys:
            return self._empty(self.schema(snap))
        return self.scan_where(
            [("url", "in", keys)], version=snap["version"]
        )

    def scan_semi(
        self,
        probe: DataFrame,
        probe_col: str = "url",
        *,
        max_probe_keys: int = 10_000,
        filters: list[tuple] | tuple = (),
        published: bool = True,
    ) -> DataFrame:
        """Dynamic file pruning for a join: the table rows whose merge
        key appears in ``probe`` (a left-semi join), planned like
        Delta/Spark's DFP but DRIVER-side. One small job collects the
        distinct probe keys; when they fit ``max_probe_keys`` the read
        becomes a key-equality scan that opens only bloom/bucket-hit
        files (scan_plan's merge-key strong rule) — the probe side
        decides the file set before any table IO. Past the cap the read
        degrades to the ordinary full merge + semi join (AQE picks
        broadcast vs shuffle), which is the right plan once the probe is
        a large fraction of the key space anyway. ``filters`` are extra
        conjunctive attribute predicates, pushed through scan_where on
        the pruned path."""
        ks = [
            r[0]
            for r in probe.select(probe_col).where(
                F.col(probe_col).isNotNull()
            ).distinct().limit(max_probe_keys + 1).collect()
        ]
        if len(ks) <= max_probe_keys:
            return self.scan_where(
                [("url", "in", ks), *filters], published=published
            )
        df = self.published() if published else self.read()
        if filters:
            df = df.filter(self._pred_column(list(filters), self.schema()))
        # no distinct on the probe: a semi join ignores duplicate matches,
        # and pre-deduping a huge probe would be a second full shuffle
        return df.join(
            probe.select(F.col(probe_col).alias("url")),
            "url",
            "left_semi",
        )

    def key_history(
        self, urls: list[str] | str, *, version: int | None = None
    ) -> DataFrame:
        """All RETAINED versions of the given key(s) with provenance — the
        CDC "log of a key" (Debezium's per-key topic replay / Iceberg's
        changelog scan, narrowed to a point query). One row per physical
        version: each pending delta epoch contributes its per-epoch winner
        (``epoch`` = that epoch id); the compacted base and partial-
        compaction residuals contribute the folded state (``epoch`` NULL —
        compaction collapses folded epochs into one version, exactly like
        snapshot expiry bounds Iceberg's changelog). Tombstones appear as
        ``is_deleted`` rows.

        Cost: the merge-key strong rule (bloom / url-range per file, hash
        bucket for the base) means O(files actually containing the key),
        not O(pending delta files) — the same pruning as lookup_urls, but
        WITHOUT the MOR collapse, so every retained version survives."""
        snap = (
            self.snapshot_at(version) if version is not None
            else self.current_snapshot()
        )
        cur = self.schema(snap)
        keys = [urls] if isinstance(urls, str) else list(urls)
        empty = self._empty(cur).withColumn(
            "epoch", F.lit(None).cast("long")
        ).drop("bkt")
        if not keys:
            return empty
        skeep = self._key_keep_fn(snap, set(keys))
        kbkts = self._buckets_of_keys(keys, self._nb(snap))
        parts: list[DataFrame] = []
        base_groups = []
        for b, e in snap["base"].items():
            if int(b) not in kbkts:
                continue
            st = self.group_stats(e) or {}
            sv = int(e["schema_v"])
            files = [f for f in e["files"] if skeep(st.get(f), sv)]
            if files:
                base_groups.append((sv, files))
        base = self._read_file_groups(snap, base_groups)
        if base is not None:
            parts.append(base.withColumn("epoch", F.lit(None).cast("long")))
        for d in snap["deltas"]:
            st = self.group_stats(d) or {}
            sv = int(d["schema_v"])
            files = [f for f in d["files"] if skeep(st.get(f), sv)]
            if not files:
                continue
            df = self._read_file_groups(snap, [(sv, files)])
            ep = d.get("epoch_id")
            parts.append(df.withColumn(
                "epoch",
                F.lit(None if ep is None else int(ep)).cast("long"),
            ))
        if not parts:
            return empty
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.filter(F.col("url").isin(keys)).drop("bkt")

    def delete_where(
        self, condition, epoch_id: int, *, stage: bool = False,
        buckets: list[int] | None = None,
    ) -> dict:
        """Predicate DELETE as a first-class CDC commit (GDPR/right-to-be-
        forgotten over the lake): matching live rows become tombstone
        change events ((warc_ts, seq+1) — outranks the current winner,
        stays outranked by any later real change) routed through the SAME
        idempotent ``merge_epoch`` path, so deletes are epoch-keyed,
        resumable, duplicate-delivery-safe, WAP-stageable
        (``stage=True``), and O(change-set) on disk (no base rewrite —
        the physical purge happens at the next compaction, whose
        ``tombstone_retention_ts`` retires the markers).

        ``condition``: a Column or SQL string over the target schema.
        ``buckets``: optional scan restriction when the caller knows the
        predicate's key locality (e.g. from lookup_urls' bucket math)."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        victims = (
            self.read(buckets=buckets)
            .filter(~F.col("is_deleted"))
            .filter(cond)
        )
        ev = victims.select(
            (F.col("seq") + 1).alias("seq"),
            F.lit("D").alias("op"),
            "url",
            "warc_ts",
            F.lit(None).cast("binary").alias("html"),
            "lang",
        )
        out = self.merge_epoch(ev, epoch_id, extract=False, stage=stage)
        out["delete_where"] = str(condition)
        return out

    def update_where(
        self, condition, set_exprs: dict, epoch_id: int, *,
        stage: bool = False, buckets: list[int] | None = None,
        extract: bool | None = None,
    ) -> dict:
        """Predicate UPDATE as a first-class CDC commit (backfills,
        re-tagging, compliance rewrites over the lake): matching live
        rows become full-image U events at (warc_ts, seq+1) — outranking
        the current winner, outranked by any later real change — routed
        through the SAME idempotent ``merge_epoch`` path: epoch-keyed,
        resumable, duplicate-delivery-safe, WAP-stageable, O(change-set)
        on disk (merge-on-read; no base rewrite).

        ``set_exprs``: column → SQL string or Column over the matched
        row. Keys/order columns (url, warc_ts, seq) are immutable — an
        identity rewrite would corrupt newer-wins resolution; change of
        identity is a delete+insert. ``extract`` defaults to True iff
        ``html`` is rewritten (text recomputes through the normal
        extraction path); untouched html carries its stored text through
        at zero extraction cost."""
        bad = {"url", "warc_ts", "seq", "is_deleted"} & set(set_exprs)
        if bad:
            raise ValueError(f"update_where cannot set {sorted(bad)}")
        if extract is None:
            extract = "html" in set_exprs
        cond = F.expr(condition) if isinstance(condition, str) else condition
        victims = (
            self.read(buckets=buckets)
            .filter(~F.col("is_deleted"))
            .filter(cond)
        )
        sets = {
            k: (F.expr(v) if isinstance(v, str) else v)
            for k, v in set_exprs.items()
        }
        skip = {"url", "warc_ts", "seq", "is_deleted", "op"}
        if extract:
            skip = skip | {"text"}  # recomputed from the (new) html
        payload = [
            (sets.get(c, F.col(c))).alias(c)
            for c in victims.columns
            if c not in skip
        ]
        ev = victims.select(
            (F.col("seq") + 1).alias("seq"),
            F.lit("U").alias("op"),
            "url",
            "warc_ts",
            *payload,
        )
        out = self.merge_epoch(ev, epoch_id, extract=extract, stage=stage)
        out["update_where"] = str(condition)
        out["update_set"] = sorted(set_exprs)
        return out

    def purge_txns(self) -> set[str]:
        """Transaction ids of completed purges (redelivery guard)."""
        d = os.path.join(self.path, "purge_txns")
        if not os.path.isdir(d):
            return set()
        return {
            n[:-5] for n in os.listdir(d) if n.endswith(".json")
        }

    def purge_keys(
        self,
        urls: list[str] | str,
        *,
        expire_history: bool = True,
        drop_tags: bool = False,
        purge_quarantine: bool = True,
        txn_id: str | None = None,
    ) -> dict:
        """PHYSICAL right-to-be-forgotten: remove every stored version of
        the given keys from disk — not just their visibility.

        ``delete_where`` is the logical half (O(change-set) tombstones;
        bytes stay until compaction). Compliance needs the bytes gone:

        1. the keys' hash buckets fold via a PARTIAL compaction with the
           keys dropped — every delta group folds (so no delta file
           retains a version), cold base buckets carry by reference:
           O(victim buckets + all deltas), never O(table);
        2. history that could still serve the keys expires
           (``expire_snapshots(keep_last=1)``) and the orphaned files
           delete immediately (no grace: the point IS the bytes);
        3. quarantine dead-letter dirs rewrite in place (a rejected
           event is still the person's data);
        4. the epoch change feed folds away (``changes_between`` cursors
           over pre-purge epochs invalidate — a feed that could replay
           the purged rows would defeat the purge).

        Refuses when tags pin pre-purge snapshots (they would keep
        serving the keys) unless ``drop_tags``; refuses when branches
        exist (their refs pin files independently — purge each branch,
        or fold it first). Iceberg analogue: DELETE + expire_snapshots +
        rewrite_data_files + remove_orphan_files as ONE compliance verb.

        ``txn_id``: redelivery guard for at-least-once admin pipelines
        (the same contract as epoch ids on ``merge_epoch``). A purge is
        NOT an epoch — blindly re-running a COMPLETED purge after later
        commits would erase data written since (a new request, not a
        redelivery). With a txn_id the completion is recorded
        (create-exclusive sidecar, written only after the purge fully
        finished) and a redelivery skips; a crash mid-purge leaves the
        txn unrecorded, so the redelivery correctly re-runs the
        incomplete purge."""
        keys = sorted({urls} if isinstance(urls, str) else set(urls))
        if not keys:
            raise ValueError("purge_keys needs at least one key")
        if txn_id is not None and txn_id in self.purge_txns():
            return {"skipped_duplicate_txn": True, "txn_id": txn_id}
        bd = self._branches_dir()
        branches = sorted(os.listdir(bd)) if os.path.isdir(bd) else []
        if branches:
            raise ValueError(
                f"branches {branches} pin their own snapshots; purge or "
                "remove them first (a purge that leaves a branch serving "
                "the keys is not a purge)"
            )
        tags = self.tags()
        if tags and not drop_tags:
            raise ValueError(
                f"tags {sorted(tags)} pin pre-purge snapshots; pass "
                "drop_tags=True to release them"
            )
        staged = self.staged_epochs()
        if staged:
            # a staged WAP change-set may carry the keys' rows: its files
            # are orphan-protected and a later publish would resurrect
            # the purged data — the purge must not report success over it
            raise ValueError(
                f"staged epochs {sorted(staged)} exist; publish or abort "
                "them first (a staged change-set could re-publish the "
                "purged keys)"
            )
        # victim buckets derive INSIDE the compaction from its own
        # captured snapshot (compact → _compact_once with buckets=None +
        # drop_keys), so a concurrent rebucket retries with the fresh
        # layout instead of leaving un-rewritten buckets
        rep = self.compact(drop_keys=keys)
        # tags drop only after the rewrite succeeded: a failed purge must
        # not destroy retention leases as a side effect
        for t in sorted(tags):
            self.drop_tag(t)
        out = {
            "purged_keys": len(keys),
            "buckets_rewritten": rep.get("buckets_folded"),
            "compaction": rep,
            "tags_dropped": sorted(tags),
        }
        if purge_quarantine:
            qroot = os.path.join(self.path, "quarantine")
            rewritten = []
            if os.path.isdir(qroot):
                # heal missing-base-dir crash states first: a leftover
                # whose base dir is gone would otherwise be skipped by
                # name and never rolled forward/back
                heal_swap_leftovers(qroot)
                for ep in sorted(os.listdir(qroot)):
                    if is_swap_leftover(ep):
                        continue  # garbage next to a live dir: ignored
                    d = os.path.join(qroot, ep)
                    recover_dir_swap(d)
                    if not os.path.isdir(d):
                        continue
                    q = self.spark.read.parquet(d)
                    if "url" not in q.columns:
                        continue
                    if q.filter(F.col("url").isin(keys)).limit(1).count():
                        rewrite_dir_excluding(self.spark, d, "url", keys)
                        rewritten.append(ep)
            out["quarantine_rewritten"] = rewritten
        if expire_history:
            out["expired"] = self.expire_snapshots(keep_last=1)
            out["orphans"] = self.cleanup_orphans(grace_seconds=0.0)
        if txn_id is not None:
            d = os.path.join(self.path, "purge_txns")
            os.makedirs(d, exist_ok=True)
            _atomic_create_json(
                os.path.join(d, f"{txn_id}.json"),
                {"keys": len(keys), "completed": True},
            )
            out["txn_id"] = txn_id
        return out

    def apply_snapshot(
        self,
        snapshot: DataFrame,
        epoch_id: int,
        *,
        compare: tuple[str, ...] = ("html",),
        missing_as_delete: bool = True,
        delete_ts: str | None = None,
        extract: bool = True,
        stage: bool = False,
        assume_unique: bool = False,
    ) -> dict:
        """Ingest a periodic FULL dump by diffing it against the live
        state (operators/merge.py::snapshot_diff — Debezium/DMS
        full-load-then-diff when the source has no binlog): unchanged
        urls emit nothing, changed/new urls become update events, urls
        missing from the dump become deletes at ``delete_ts``, and the
        change-set rides the normal idempotent ``merge_epoch`` path
        (epoch-keyed, resumable, WAP-stageable). Cost: one url equi-join
        where the table side ships only 64-bit digests, then
        O(change-set) — a mostly-unchanged re-crawl is nearly free."""
        from ..operators.merge import snapshot_diff

        # digest computed per RAW row BELOW the MOR dedup (read(project=)):
        # the table contributes 12-byte agg buffers and a (url, digest)
        # join side; its html/text bytes are hashed at the scan and never
        # shuffled or buffered
        cur = (
            self.read(
                project={
                    "_digest": F.xxhash64(*[F.col(c) for c in compare])
                }
            )
            .filter(~F.col("is_deleted"))
            .select("url", "_digest")
        )
        events = snapshot_diff(
            cur, snapshot, compare=compare, current_digest_col="_digest",
            missing_as_delete=missing_as_delete, delete_ts=delete_ts,
            assume_unique=assume_unique,
        )
        for name, dtype in (("html", "binary"), ("lang", "string")):
            if name not in events.columns:
                events = events.withColumn(name, F.lit(None).cast(dtype))
        out = self.merge_epoch(events, epoch_id, extract=extract, stage=stage)
        out["snapshot_diff"] = True
        return out

    # ------------------------------------------------------------------
    # write-audit-publish (WAP): staged epochs — Iceberg's audit-branch
    # workflow on the snapshot manifest (stage → audit → publish/abort)
    # ------------------------------------------------------------------

    def _staged_path(self, epoch_id: int) -> str:
        return os.path.join(self._staged_dir, f"e{epoch_id:08d}.json")

    def staged_epochs(self) -> set[int]:
        """Epochs staged but not yet published (nor aborted)."""
        try:
            fns = os.listdir(self._staged_dir)
        except FileNotFoundError:
            return set()
        return {
            int(f[1:9]) for f in fns
            if f.startswith("e") and f.endswith(".json")
        }

    def _load_staged(self, epoch_id: int) -> dict:
        p = self._staged_path(epoch_id)
        if not os.path.exists(p):
            raise FileNotFoundError(f"epoch {epoch_id} is not staged")
        with open(p) as f:
            return json.load(f)

    def _write_staged(
        self, epoch_id: int, *, metrics: dict, lineage: list,
        delta_group: dict | None, hll_regs: dict | None, stages: list[str],
        n_buckets: int | None = None,
    ) -> dict:
        metrics = dict(metrics, staged=True, staged_at=time.time())
        metrics["stages"] = stages + ["STAGED"]
        manifest = {
            "epoch_id": epoch_id,
            "delta": delta_group,
            "metrics": metrics,
            "lineage": lineage,
            "hll_regs": hll_regs,
            # layout the change-set was hashed under: publish re-checks it
            # so a rebucket between stage and publish can't slip a
            # mis-bucketed delta into the new layout
            "n_buckets": (
                n_buckets if n_buckets is not None else self.n_buckets
            ),
        }
        try:
            _atomic_create_json(self._staged_path(epoch_id), manifest)
        except FileExistsError:
            # lost a stage race: the winner's files are equivalent (same
            # deterministic dedup result); ours become cleanup orphans
            return {"epoch_id": epoch_id, "skipped_duplicate_stage": True,
                    "stages": stages + ["SKIPPED"]}
        return metrics

    def staged_changes(self, epoch_id: int) -> DataFrame:
        """The staged epoch's deduped change-set (tombstones included) —
        the WRITE under audit."""
        man = self._load_staged(epoch_id)
        snap = self.current_snapshot()
        if man["delta"] is None:
            return self._empty(self.schema(snap))
        df = self._read_file_groups(
            snap, [(int(man["delta"]["schema_v"]), man["delta"]["files"])]
        )
        return df if df is not None else self._empty(self.schema(snap))

    def staged_read(self, epoch_id: int) -> DataFrame:
        """Table state AS IF the staged epoch were published (current
        read() ∪ staged changes, same MOR resolution) — audit the future,
        pay only O(base + staged): readers of the real table see nothing."""
        staged = self.staged_changes(epoch_id)
        return dedup_latest(self.read().unionByName(staged))

    def audit_staged(self, epoch_id: int, rules: list[dict]) -> DataFrame:
        """Violation report (operators/validate.py) over the staged
        epoch's change-set — the A of WAP. One aggregate pass over O(Δ)."""
        from ..operators.validate import violation_report

        return violation_report(self.staged_changes(epoch_id), rules)

    def publish_staged(
        self, epoch_id: int, *, audit_rules: list[dict] | None = None
    ) -> dict:
        """Promote a staged epoch to a committed snapshot — the atomic P
        of WAP; no data moves, only the manifest. Idempotent: publishing
        an already-committed epoch removes the leftover staged manifest
        and skips (crash between commit and manifest removal self-heals).
        ``audit_rules``: convenience gate — violations raise and leave the
        stage intact (abort stays an explicit decision)."""
        try:
            man = self._load_staged(epoch_id)
        except FileNotFoundError:
            if epoch_id in self.committed_epochs():
                return {"epoch_id": epoch_id, "skipped_duplicate_epoch": True}
            raise
        if audit_rules:
            bad = {
                r["rule"]: r["violations"]
                for r in self.audit_staged(epoch_id, audit_rules).collect()
                if r["violations"]
            }
            if bad:
                raise ValueError(
                    f"staged epoch {epoch_id} failed audit: {bad}"
                )
        snap = self.current_snapshot()
        if epoch_id in set(snap["committed_epochs"]):
            os.remove(self._staged_path(epoch_id))
            return {"epoch_id": epoch_id, "skipped_duplicate_epoch": True}
        man_nb = man.get("n_buckets")
        if man_nb is not None and man_nb != self._nb(snap):
            raise ValueError(
                f"staged epoch {epoch_id} was hashed under {man_nb} buckets "
                f"but the table was rebucketed to {self._nb(snap)}; abort "
                f"the stage and re-run the epoch"
            )
        metrics = dict(man["metrics"])
        metrics["stages"] = list(metrics.get("stages") or []) + ["COMMITTED"]
        metrics["published_from_stage"] = True
        out = self._commit(
            snap, epoch_id, metrics=metrics, lineage=man["lineage"],
            new_delta=man["delta"], hll_regs=man["hll_regs"],
            expect_nb=man_nb,
        )
        os.remove(self._staged_path(epoch_id))
        self.maybe_compact()
        return out

    def abort_staged(self, epoch_id: int) -> dict:
        """Discard a staged epoch: manifest first (the authoritative
        record), then its data files. Idempotent."""
        try:
            man = self._load_staged(epoch_id)
        except FileNotFoundError:
            return {"epoch_id": epoch_id, "already_gone": True}
        os.remove(self._staged_path(epoch_id))
        removed = 0
        if man["delta"]:
            sref = man["delta"].get("stats_ref")
            if sref and os.path.exists(os.path.join(self.path, sref)):
                os.remove(os.path.join(self.path, sref))
            for rel in man["delta"]["files"]:
                fp = os.path.join(self.path, rel)
                if os.path.exists(fp):
                    os.remove(fp)
                    removed += 1
            d = os.path.dirname(os.path.join(self.path, man["delta"]["files"][0]))
            if os.path.isdir(d) and not os.listdir(d):
                os.rmdir(d)
        return {"epoch_id": epoch_id, "aborted": True, "files_removed": removed}

    def _list_files(self, rel_dir: str) -> tuple[list[str], int, int]:
        import pyarrow.parquet as pq

        full = os.path.join(self.path, rel_dir)
        files, rows, nbytes = [], 0, 0
        for root, _dirs, fns in os.walk(full):
            for fn in sorted(fns):
                if fn.endswith(".parquet"):
                    fp = os.path.join(root, fn)
                    files.append(os.path.relpath(fp, self.path))
                    rows += pq.ParquetFile(fp).metadata.num_rows
                    nbytes += os.path.getsize(fp)
        return files, rows, nbytes

    def _maybe_stats(
        self, rel_files: list[str], file_schema: T.StructType | None = None
    ) -> dict | None:
        """Per-file stats for files just written, when the handle opted
        in — one column-pruned scan (streaming/filestats.py), plus one
        key-column scan for the per-file url blooms under ``key_bloom``
        (stored as ``"kb"`` inside each file's stats entry)."""
        if not (self.stats_columns or self.key_bloom) or not rel_files:
            return None
        from .filestats import collect_file_blooms, collect_file_stats

        out = collect_file_stats(
            self.spark, self.path, rel_files,
            list(self.stats_columns), file_schema,
        )
        if self.key_bloom and out:
            blooms = collect_file_blooms(
                self.spark, self.path, list(out), "url",
                {f: e["rows"] for f, e in out.items()}, file_schema,
            )
            for f, kb in blooms.items():
                out[f]["kb"] = kb
        return out

    # ------------------------------------------------------------------
    # stats manifest sidecars (Iceberg's manifest-file layer): per-file
    # stats/blooms live in immutable uuid-named JSONs under manifests/;
    # snapshots carry only the reference. Without this every snapshot
    # would inline every pending file's stats (a bloom is ~11 KiB b64),
    # making commit metadata IO O(pending files) — quadratic over an
    # uncompacted run. With refs, a commit writes O(its own new files)
    # manifest bytes plus a small snapshot, and rebase carries refs as
    # opaque strings.
    # ------------------------------------------------------------------

    def _write_manifest(self, stats: dict) -> str:
        rel = f"manifests/m-{uuid.uuid4().hex}.json"
        os.makedirs(os.path.join(self.path, "manifests"), exist_ok=True)
        _atomic_create_json(os.path.join(self.path, rel), stats)
        return rel

    def group_stats(self, group: dict | None) -> dict | None:
        """Per-file stats of a base/delta group — inline (legacy
        snapshots) or loaded from the group's ``stats_ref`` sidecar and
        cached (manifests are immutable). Missing/unreadable sidecar
        degrades to None = "no stats", which every planner treats as
        "could match": pruning is lost, correctness isn't."""
        if group is None:
            return None
        ref = group.get("stats_ref")
        if ref is None:
            return group.get("stats")
        st = self._manifest_cache.get(ref)
        if st is None:
            try:
                with open(os.path.join(self.path, ref)) as f:
                    st = json.load(f)
            except (FileNotFoundError, json.JSONDecodeError):
                return None
            self._manifest_cache[ref] = st
        return st

    def _attach_stats(self, group: dict, fstats: dict | None) -> None:
        """Record a freshly computed stats dict on a group via sidecar."""
        if fstats:
            group["stats_ref"] = self._write_manifest(fstats)

    def _commit(
        self,
        snap: dict,
        epoch_id: int | None,
        *,
        metrics: dict,
        lineage: list,
        new_delta: dict | None = None,
        new_base: dict | None = None,
        new_base_rows: int | None = None,
        folded_deltas: list | None = None,
        schema_v: int | None = None,
        schemas: dict | None = None,
        renames: list | None = None,
        drops: list | None = None,
        expect_base_of: dict | None = None,
        expect_schema_v_of: dict | None = None,
        expect_deltas_of: dict | None = None,
        expect_nb: int | None = None,
        n_buckets: int | None = None,
        hll_regs: dict | None = None,
        properties: dict | None = None,
    ) -> dict:
        """Publish a new snapshot. REBASES on the current snapshot under the
        commit lock (not the one the caller captured), so pipelined epochs
        whose heavy jobs overlapped commit their deltas without losing each
        other — optimistic concurrency as in Iceberg's commit protocol; the
        MOR resolution by (warc_ts, seq) makes the final state independent
        of commit interleaving. ``folded_deltas``: delta groups a compaction
        folded into the new base — only THOSE are dropped; deltas committed
        concurrently survive.

        ``expect_base_of`` / ``expect_schema_v_of``: the snapshot the caller
        derived its replacement ``base`` / ``schema_v`` from. If the current
        snapshot's corresponding section no longer matches, raise
        CommitConflict — the caller must recompute (sections that are
        wholesale-replaced cannot be rebased like the set-merged ones)."""
        with self._commit_lock:
            while True:
                cur = self.current_snapshot()
                if (
                    expect_base_of is not None
                    and cur["base"] != expect_base_of["base"]
                ):
                    raise CommitConflict(
                        "base changed since capture (concurrent compaction)"
                    )
                if (
                    expect_schema_v_of is not None
                    and cur["schema_v"] != expect_schema_v_of["schema_v"]
                ):
                    raise CommitConflict(
                        "schema_v changed since capture (concurrent DDL)"
                    )
                if (
                    expect_deltas_of is not None
                    and cur["deltas"] != expect_deltas_of["deltas"]
                ):
                    raise CommitConflict(
                        "deltas changed since capture (concurrent epoch "
                        "commit) — a rebucket cannot rebase old-layout "
                        "deltas; recompute from the new snapshot"
                    )
                if expect_nb is not None and self._nb(cur) != expect_nb:
                    # a delta hashed under the old layout must NOT
                    # set-merge onto a rebucketed snapshot — its bkt
                    # values would mis-prune every bucketed read
                    raise CommitConflict(
                        f"bucket layout changed since capture (rebucketed "
                        f"{expect_nb} → {self._nb(cur)}); re-run the epoch "
                        f"to re-hash its change-set"
                    )
                new_version = cur["version"] + 1
                committed_at = time.time()
                out_metrics = dict(metrics, committed_at=committed_at)
                epochs = set(cur["committed_epochs"])
                if epoch_id is not None:
                    epochs.add(epoch_id)
                deltas = cur["deltas"]
                if folded_deltas is not None:
                    folded_keys = {d["files"][0] for d in folded_deltas if d["files"]}
                    deltas = [
                        d for d in deltas
                        if not d["files"] or d["files"][0] not in folded_keys
                    ]
                if new_delta:
                    deltas = deltas + [new_delta]
                # cumulative url sketch: max-merge is commutative and
                # idempotent, so it rebases exactly like the epoch set
                url_hll = cur.get("url_hll") or {}
                if hll_regs:
                    from ..operators.sketch import merge_register_dicts

                    url_hll = merge_register_dicts(url_hll, hll_regs)
                if url_hll:
                    from ..operators.sketch import estimate_from_registers

                    out_metrics["distinct_urls_est"] = estimate_from_registers(
                        url_hll
                    )
                new_snap = {
                    "version": new_version,
                    "epoch_id": epoch_id,
                    "committed_epochs": sorted(epochs),
                    "schema_v": schema_v if schema_v is not None else cur["schema_v"],
                    "schemas": schemas or cur["schemas"],
                    "renames": renames if renames is not None else cur["renames"],
                    "drops": drops if drops is not None else cur.get("drops", []),
                    "n_buckets": (
                        n_buckets if n_buckets is not None else self._nb(cur)
                    ),
                    "base": new_base if new_base is not None else cur["base"],
                    "base_rows": (
                        new_base_rows if new_base_rows is not None
                        else cur["base_rows"]
                    ),
                    "deltas": deltas,
                    "url_hll": url_hll,
                    "metrics": out_metrics,
                    "lineage": lineage,
                    "committed_at": committed_at,
                    # TBLPROPERTIES ride every commit; only
                    # set_properties replaces them
                    "properties": (
                        properties if properties is not None
                        else cur.get("properties") or {}
                    ),
                }
                try:
                    # create-exclusive: a concurrent writer (another
                    # process/handle) that took this version first wins;
                    # we re-read and rebase — full optimistic concurrency
                    _atomic_create_json(self._snap_path(new_version), new_snap)
                    return out_metrics
                except FileExistsError:
                    continue

    # ------------------------------------------------------------------
    # compaction: fold deltas into the hash-bucketed base
    # ------------------------------------------------------------------

    def maybe_compact(self) -> dict | None:
        snap = self.current_snapshot()
        delta_rows = sum(d["rows"] for d in snap["deltas"])
        if len(snap["deltas"]) < self.compact_min_deltas:
            return None
        if self.compact_mode == "hot":
            # per-bucket trigger lives inside compact_hot; the min_deltas
            # gate above bounds how often the O(Δ) selection scan runs.
            # The newest feed_retain_epochs epochs are exempt from any
            # fold so the incremental feed keeps serving them per-epoch.
            if not self._compact_lock.acquire(blocking=False):
                return None
            try:
                retain = self._feed_retain_set(snap)
                out = self.compact_hot(retain_epochs=retain)
                if out is None:
                    foldable_rows = sum(
                        d["rows"] for d in snap["deltas"]
                        if d.get("epoch_id") is None
                        or int(d["epoch_id"]) not in retain
                    )
                    if foldable_rows > 0:
                        # no bucket justifies a base fold — binpack the
                        # aged-out delta groups into one deduped residual
                        # so the manifest and small-file count stay
                        # bounded (base untouched)
                        out = self.compact(buckets=[], retain_epochs=retain)
                return out
            finally:
                self._compact_lock.release()
        if delta_rows < self.compact_ratio * max(1, snap["base_rows"]):
            return None
        if not self._compact_lock.acquire(blocking=False):
            return None  # a pipelined sibling is already compacting
        try:
            retain = self._feed_retain_set(snap)
            if retain:
                # full-mode auto fold = an all-bucket partial fold that
                # carries the newest epochs' groups untouched, so the
                # incremental feed keeps serving them per-epoch (same
                # base-rewrite cost; only aged-out groups fold)
                return self.compact(
                    buckets=list(range(self._nb(snap))),
                    retain_epochs=retain,
                )
            return self.compact()
        finally:
            self._compact_lock.release()

    @property
    def feed_retain_epochs(self) -> int:
        """Defaults to the CURRENT compact_min_deltas (tracked live, so
        tuning the trigger post-construction keeps the feed horizon in
        sync) unless set explicitly at construction."""
        return (
            self.compact_min_deltas if self._feed_retain_epochs is None
            else self._feed_retain_epochs
        )

    def _feed_retain_set(self, snap: dict) -> set[int]:
        """Committed epochs young enough that auto-compaction must keep
        their delta groups individually servable by the incremental feed
        (the newest ``feed_retain_epochs`` of the epoch sequence)."""
        if self.feed_retain_epochs <= 0:
            return set()
        eps = sorted(int(e) for e in snap["committed_epochs"])
        return set(eps[-self.feed_retain_epochs:])

    def compact(
        self,
        tombstone_retention_ts: str | None = None,
        *,
        buckets: list[int] | None = None,
        retain_epochs: set[int] | None = None,
        drop_keys: list[str] | None = None,
    ) -> dict:
        """Merge base∪deltas into a fresh bucketed base (one row per url).
        ``tombstone_retention_ts``: drop tombstones older than this
        watermark — safe once events that late can no longer arrive.
        Retries from a fresh snapshot if a concurrent compaction (another
        process) replaced the base while this one ran.

        ``buckets``: PARTIAL compaction — fold the deltas into only these
        buckets' base slices (Iceberg's `rewrite_data_files ... WHERE` /
        binpack-with-filter). Delta rows outside the set are rewritten as
        one per-url-deduped *residual* delta group instead of touching
        their base buckets, so the rewrite costs O(selected base slice +
        all deltas) — never O(table). At 100 TB with a hot-domain change
        stream this is the only affordable shape: the cold 99% of the base
        is carried forward by reference (same files, byte-identical).
        Residual groups carry ``epoch_id: None`` plus the folded epoch
        set; changes_between serves a range from the residual when the
        range fully covers that set, and raises "cursor too old"
        otherwise. ``retain_epochs``: delta groups of these epochs are
        carried forward untouched (never folded) — auto maintenance
        passes the newest ``feed_retain_epochs`` epochs here so pollers
        keep exact per-epoch feed service."""
        while True:
            try:
                return self._compact_once(
                    tombstone_retention_ts, buckets,
                    retain_epochs=retain_epochs, drop_keys=drop_keys,
                )
            except CommitConflict:
                continue

    def compact_hot(
        self,
        *,
        ratio: float | None = None,
        max_buckets: int | None = None,
        tombstone_retention_ts: str | None = None,
        retain_epochs: set[int] | None = None,
    ) -> dict | None:
        """Partial-compact the buckets where deltas concentrate: fold
        bucket ``b`` when its pending delta rows ≥ ``ratio`` × its base
        rows (the global ``compact_ratio`` trigger applied per bucket —
        rewrite amplification bounded to 1/ratio per delta row folded).
        ``max_buckets`` caps the fold to the hottest ones by delta volume.
        Returns None when no deltas exist or no bucket qualifies.

        Per-bucket delta volume comes from ONE O(Δ) column-pruned scan of
        the delta files (bkt only); the base is never read for selection.
        On a skewed change stream (the north rule's hot-domain case) this
        keeps compaction cost proportional to the hot set: the zipf head's
        buckets fold every few epochs while the cold tail's base files are
        never rewritten."""
        r = self.compact_ratio if ratio is None else ratio
        base_retain = set(retain_epochs or ())
        while True:
            snap = self.current_snapshot()
            # re-anchor retention to THIS capture: an epoch committed by a
            # pipelined sibling between the caller's snapshot and this
            # retry is inside the current newest-N window and must not be
            # folded out of the feed (only when retention was asked for —
            # an empty set means an explicit fold-everything call)
            retain = base_retain | (
                self._feed_retain_set(snap) if base_retain else set()
            )
            fold_groups = [
                d for d in snap["deltas"]
                if d.get("epoch_id") is None
                or int(d["epoch_id"]) not in retain
            ]
            if not fold_groups:
                return None
            # selection counts only what a fold could actually absorb —
            # retained (feed-servable) epochs' rows don't make a bucket hot
            delta = self._read_file_groups(
                snap,
                [(int(d["schema_v"]), d["files"]) for d in fold_groups],
            )
            if delta is None:
                return None
            cnt = {
                int(row["bkt"]): int(row["n"])
                for row in delta.groupBy("bkt").agg(
                    F.count(F.lit(1)).alias("n")
                ).collect()
            }
            base_rows = {
                int(b): int(e.get("rows") or 0)
                for b, e in snap["base"].items()
            }
            hot = [
                b for b, n in cnt.items()
                if n >= r * max(1, base_rows.get(b, 0))
            ]
            if not hot:
                return None
            hot.sort(key=lambda b: cnt[b], reverse=True)
            if max_buckets is not None:
                hot = hot[:max_buckets]
            try:
                return self._compact_once(
                    tombstone_retention_ts, sorted(hot), from_snap=snap,
                    retain_epochs=retain,
                )
            except CommitConflict:
                continue  # concurrent base change: re-select and retry

    def _approx_input_bytes(
        self, snap: dict, buckets: list[int] | None = None
    ) -> int:
        """Manifest-derived on-disk bytes a fold will rewrite: the base
        entries (optionally only ``buckets``) plus every pending delta
        group (deltas aren't bucket-splittable in the manifest; they're
        small relative to the base by the time a fold triggers). Drives
        target_file_bytes output sizing — an estimate, not accounting."""
        want = None if buckets is None else {int(b) for b in buckets}
        base = [
            e
            for b, e in snap.get("base", {}).items()
            if want is None or int(b) in want
        ]
        return self._entry_bytes(base) + self._entry_bytes(
            snap.get("deltas", [])
        )

    def _write_bucketed_base(
        self, merged: DataFrame, snap: dict, nb: int, prefix: str,
        approx_bytes: int | None = None,
    ) -> tuple[dict, int]:
        """One distributed job writing ``merged`` as a fresh bucketed base
        (bkt column already assigned under ``nb``); returns the manifest
        base map + total rows. Shared by compaction and rebucket.

        Salted repartition: one task per (bucket, salt) instead of one per
        bucket, so the rewrite saturates the cluster even when nb < cores
        and a bucket never becomes a straggler task (the reference's
        scatter fan-out generalized,
        exec/LocalExecutorPlugin.java:58-70,444-454). Url-sort within each
        task: every written file's parquet row-groups then hold disjoint
        url ranges, so a point lookup (lookup_urls) touches ONE row-group
        per file via min/max stats instead of scanning the bucket — free
        here (the shuffle already paid), O(bucket/row-groups) at read
        time."""
        rel_dir = f"data/{prefix}_{uuid.uuid4().hex[:8]}"
        out_dir = os.path.join(self.path, rel_dir)
        from ..operators.merge import salted_repartition

        if self.target_file_bytes and approx_bytes is not None:
            # bytes-proportional output: ~1 file per write partition, so
            # n_parts ≈ files ≈ input_bytes / target (≥1 per bucket)
            import math

            n_parts = max(
                nb, math.ceil(approx_bytes / self.target_file_bytes)
            )
        else:
            n_parts = max(
                nb,
                int(self.spark.conf.get("spark.sql.shuffle.partitions", "32")),
            )
        sort_cols = [c for c in self.sort_columns if c in merged.columns]
        if sort_cols and self.cluster_mode == "zorder" and len(sort_cols) >= 2:
            # Morton clustering (streaming/zorder.py): files become
            # hyper-rectangles in sort-column space so manifest stats
            # prune on ANY of the columns. One extra quantile pass over
            # the merge (like the range branch's sampling pass, also
            # maintenance-only); the write is still ONE range shuffle.
            from .zorder import quantile_edges, with_z_column

            edges = quantile_edges(merged, sort_cols)
            salted = with_z_column(
                merged.withColumn("bucket", F.col("bkt")), sort_cols, edges
            )
            salted = salted.repartitionByRange(n_parts, "bucket", "_z")
            salted = salted.sortWithinPartitions("bucket", "_z", "url").drop(
                "_z"
            )
        elif sort_cols:
            # Iceberg write sort-order: range-partition on (bucket,
            # *sort_columns) so a bucket's files hold DISJOINT sort-key
            # ranges — per-file manifest stats then skip whole files for
            # predicates on those columns (scan_where). The range
            # sampling pass re-runs the upstream merge once; acceptable
            # inside maintenance, which is why the hot epoch path never
            # takes this branch. Skew safety comes from the range
            # partitioner itself (a hot (bucket, key) spreads across
            # consecutive partitions).
            salted = merged.withColumn(
                "bucket", F.col("bkt")
            ).repartitionByRange(n_parts, "bucket", *sort_cols)
            salted = salted.sortWithinPartitions("bucket", *sort_cols, "url")
        else:
            spread = max(1, n_parts // nb)
            salted = salted_repartition(
                merged.withColumn("bucket", F.col("bkt")), n_parts,
                key="bucket", spread=spread,
            )
            salted = salted.sortWithinPartitions("bucket", "url")
        salted.write.partitionBy("bucket").mode("overwrite").parquet(out_dir)
        new_base: dict[str, dict] = {}
        total_rows = 0
        import pyarrow.parquet as pq

        for entry in sorted(os.listdir(out_dir)):
            if not entry.startswith("bucket="):
                continue
            b = int(entry.split("=")[1])
            bdir = os.path.join(out_dir, entry)
            files, rows = [], 0
            for fn in sorted(os.listdir(bdir)):
                if fn.endswith(".parquet"):
                    fp = os.path.join(bdir, fn)
                    files.append(os.path.relpath(fp, self.path))
                    rows += pq.ParquetFile(fp).metadata.num_rows
            new_base[str(b)] = {
                "files": files, "schema_v": snap["schema_v"], "rows": rows,
            }
            total_rows += rows
        all_files = [f for e in new_base.values() for f in e["files"]]
        fstats = self._maybe_stats(all_files)
        if fstats:
            for e in new_base.values():
                self._attach_stats(
                    e, {f: fstats[f] for f in e["files"] if f in fstats}
                )
        return new_base, total_rows

    def _entry_bytes(self, entries) -> int:
        """Total on-disk bytes of base-map entries' files (compaction IO
        accounting: what the fold actually rewrote)."""
        total = 0
        for e in entries:
            for f in e["files"]:
                fp = os.path.join(self.path, f)
                if os.path.exists(fp):
                    total += os.path.getsize(fp)
        return total

    def _compact_once(
        self,
        tombstone_retention_ts: str | None = None,
        buckets: list[int] | None = None,
        *,
        from_snap: dict | None = None,
        retain_epochs: set[int] | None = None,
        drop_keys: list[str] | None = None,
    ) -> dict:
        snap = from_snap or self.current_snapshot()
        if drop_keys and buckets is None:
            # purge path: the victim buckets MUST derive from the same
            # snapshot this fold captures — a stale caller-computed set
            # under a concurrent rebucket would leave un-rewritten
            # buckets (and an unfiltered residual) holding the keys
            buckets = sorted(
                self._buckets_of_keys(list(drop_keys), self._nb(snap))
            )
        if buckets is None and retain_epochs:
            # a retained "full" fold = all-bucket partial fold (the full
            # path by definition folds every group; silently ignoring the
            # retain set would drop the retained epochs from the feed)
            buckets = list(range(self._nb(snap)))
        if buckets is not None:
            return self._compact_partial(
                snap, tombstone_retention_ts, buckets,
                retain_epochs=retain_epochs, drop_keys=drop_keys,
            )
        t0 = time.perf_counter()
        # read exactly the captured version: a delta committed between the
        # two reads must NOT be folded (it stays in the delta list)
        merged = self.read(version=snap["version"])
        if drop_keys:
            # physical purge path (purge_keys): the fold writes a base
            # with every version of these keys gone
            merged = merged.filter(~F.col("url").isin(list(drop_keys)))
        if tombstone_retention_ts:
            merged = merged.filter(
                (~F.col("is_deleted"))
                | (F.col("warc_ts") >= F.lit(tombstone_retention_ts))
            )
        new_base, total_rows = self._write_bucketed_base(
            merged, snap, self._nb(snap), "compact",
            approx_bytes=self._approx_input_bytes(snap),
        )
        metrics = {
            "compaction": True,
            "base_rows": total_rows,
            "deltas_folded": len(snap["deltas"]),
            "bytes_rewritten": self._entry_bytes(new_base.values()),
            "seconds": round(time.perf_counter() - t0, 3),
        }
        return self._commit(
            snap, None, metrics=metrics, lineage=[],
            new_base=new_base, new_base_rows=total_rows,
            folded_deltas=snap["deltas"],
            expect_base_of=snap,
        )

    def _compact_partial(
        self,
        snap: dict,
        tombstone_retention_ts: str | None,
        buckets: list[int],
        *,
        retain_epochs: set[int] | None = None,
        drop_keys: list[str] | None = None,
    ) -> dict:
        """Fold the captured deltas into ``buckets``' base slices only.

        One pass over the deltas (persisted, split hot/cold), the base
        read limited to the selected buckets. Cold delta rows are deduped
        per url (the winner survives — same (warc_ts, seq) resolution as
        every read, so collapsing losers is semantics-preserving) and
        written back as one residual group; cold BASE buckets are carried
        forward by reference. Iceberg analogue: rewrite_data_files with a
        partition filter."""
        t0 = time.perf_counter()
        hot = sorted({int(b) for b in buckets})
        hot_set = set(hot)
        nb = self._nb(snap)
        bad = [b for b in hot if b < 0 or b >= nb]
        if bad:
            raise ValueError(f"buckets {bad} outside [0, {nb})")
        retention = (
            (~F.col("is_deleted"))
            | (F.col("warc_ts") >= F.lit(tombstone_retention_ts))
            if tombstone_retention_ts else None
        )
        retain = set(retain_epochs or ())
        if retain and drop_keys:
            raise ValueError(
                "drop_keys cannot combine with retain_epochs: a retained "
                "delta group may hold a purged key's rows — purge folds "
                "every group"
            )
        if retain:
            # same re-anchoring as compact_hot: this snap may be a
            # CommitConflict-retry re-capture newer than the caller's
            retain |= self._feed_retain_set(snap)
        if retain and tombstone_retention_ts:
            raise ValueError(
                "tombstone_retention_ts cannot combine with retain_epochs: "
                "a retained group may hold an older (late-data) live row "
                "for a url whose tombstone would be retired before the "
                "fold ever sees that row — fold fully, then expire"
            )
        # retained (feed-servable) epochs' groups ride through untouched —
        # neither folded into the base nor binpacked into the residual
        fold_groups = [
            d for d in snap["deltas"]
            if d.get("epoch_id") is None or int(d["epoch_id"]) not in retain
        ]
        delta = self._read_file_groups(
            snap, [(int(d["schema_v"]), d["files"]) for d in fold_groups]
        )
        if delta is None:
            if not drop_keys:
                # nothing foldable: partial compaction is a no-op
                return {"compaction": True, "partial": True, "noop": True}
            # purge with zero pending deltas: the victim base buckets
            # still rewrite (the purge is ABOUT the base bytes)
            base_hot = self._base_df(snap, hot)
            if base_hot is None:
                return {"compaction": True, "partial": True, "noop": True}
            merged_hot = base_hot.filter(
                ~F.col("url").isin(list(drop_keys))
            )
            hot_base, hot_rows = self._write_bucketed_base(
                merged_hot, snap, nb, "compact",
                approx_bytes=self._approx_input_bytes(snap, hot),
            )
            new_base = {
                b: e for b, e in snap["base"].items() if int(b) not in hot_set
            }
            new_base.update(hot_base)
            total_rows = sum(
                int(e.get("rows") or 0) for e in new_base.values()
            )
            metrics = {
                "compaction": True,
                "partial": True,
                "buckets_folded": hot,
                "base_rows": total_rows,
                "deltas_folded": 0,
                "deltas_retained": len(snap["deltas"]),
                "residual_rows": 0,
                "bytes_rewritten": self._entry_bytes(hot_base.values()),
                "seconds": round(time.perf_counter() - t0, 3),
            }
            return self._commit(
                snap, None, metrics=metrics, lineage=[],
                new_base=new_base, new_base_rows=total_rows,
                folded_deltas=[],
                expect_base_of=snap,
            )
        delta = delta.persist()
        try:
            hot_col = F.col("bkt").isin(hot)
            base_hot = self._base_df(snap, hot)
            merged_hot = dedup_latest(
                delta.filter(hot_col) if base_hot is None
                else base_hot.unionByName(delta.filter(hot_col))
            )
            if drop_keys:
                # purge_keys guarantees the key set hashes inside the
                # hot buckets, so filtering the hot merge removes every
                # stored version; the cold residual cannot contain them
                merged_hot = merged_hot.filter(
                    ~F.col("url").isin(list(drop_keys))
                )
            residual = dedup_latest(delta.filter(~hot_col))
            if retention is not None:
                # retention applies ONLY where base and deltas merged: a
                # residual tombstone may be guarding a live row in a cold
                # (carried-forward) base bucket — dropping it would
                # resurrect that row. Cold tombstones retire when their
                # bucket eventually folds.
                merged_hot = merged_hot.filter(retention)
            hot_base, hot_rows = self._write_bucketed_base(
                merged_hot, snap, nb, "compact",
                approx_bytes=self._approx_input_bytes(snap, hot),
            )
            # residual write: no shuffle (the dedup agg already placed
            # rows); bkt+url sort within tasks so the bkt IN filter on
            # future reads prunes at row-group granularity
            rel_dir = f"data/resid_{uuid.uuid4().hex[:8]}"
            residual.sortWithinPartitions("bkt", "url").write.mode(
                "overwrite"
            ).parquet(os.path.join(self.path, rel_dir))
            res_files, res_rows, _ = self._list_files(rel_dir)
            res_stats = self._maybe_stats(res_files)
        finally:
            delta.unpersist()
        new_delta = (
            {
                "files": res_files,
                "schema_v": snap["schema_v"],
                "rows": res_rows,
                # no single source epoch: these rows span every folded
                # epoch's cold-bucket remainder. None keeps them out of
                # changes_between's serving range (feed over folded epochs
                # raises, exactly as after a full compaction) and out of
                # the side-index epoch sync (g.get("epoch_id") == e never
                # matches).
                "epoch_id": None,
                "folded_epochs": sorted(
                    {
                        int(d["epoch_id"]) for d in fold_groups
                        if d.get("epoch_id") is not None
                    }
                    | {
                        int(e) for d in fold_groups
                        for e in d.get("folded_epochs", ())
                    }
                ),
                # the residual is the folded epochs' COMPLETE net
                # change-set only when this fold touched no base bucket
                # AND every absorbed prior residual was itself complete
                # (an incomplete ancestor is missing hot rows forever;
                # a pre-flag residual's hotness is unknown → not complete)
                "feed_complete": not hot and all(
                    d.get("epoch_id") is not None
                    or d.get("feed_complete", False)
                    for d in fold_groups
                ),
                **(
                    {"stats_ref": self._write_manifest(res_stats)}
                    if res_stats else {}
                ),
            }
            if res_rows else None
        )
        new_base = {
            b: e for b, e in snap["base"].items() if int(b) not in hot_set
        }
        new_base.update(hot_base)
        total_rows = sum(int(e.get("rows") or 0) for e in new_base.values())
        res_bytes = sum(
            os.path.getsize(os.path.join(self.path, f))
            for f in res_files if os.path.exists(os.path.join(self.path, f))
        )
        metrics = {
            "compaction": True,
            "partial": True,
            "buckets_folded": hot,
            "base_rows": total_rows,
            "deltas_folded": len(fold_groups),
            "deltas_retained": len(snap["deltas"]) - len(fold_groups),
            "residual_rows": res_rows,
            "bytes_rewritten": self._entry_bytes(hot_base.values()) + res_bytes,
            "seconds": round(time.perf_counter() - t0, 3),
        }
        return self._commit(
            snap, None, metrics=metrics, lineage=[],
            new_base=new_base, new_base_rows=total_rows,
            new_delta=new_delta,
            folded_deltas=fold_groups,
            expect_base_of=snap,
        )

    def rebucket(self, new_n_buckets: int) -> dict:
        """Partition evolution (Iceberg's bucket-spec evolution, executed
        as one rewrite): re-hash the whole table — base AND deltas folded
        — into ``new_n_buckets`` and commit atomically. The bucket count
        chosen at table creation is wrong two orders of magnitude later;
        without this, a 10^10-row table is stuck with buckets sized for
        10^8 (stragglers in compaction, coarse lookup pruning).

        Semantics: readers of any pre-rebucket snapshot (time travel,
        in-flight reads pinned to a captured version) still see the old
        layout — files are immutable and the manifest records n_buckets
        per snapshot. A concurrent epoch/compaction commit aborts this
        rewrite (its delta/base was produced under the OLD hashing and
        set-merge rebase cannot re-hash it); we retry from the fresh
        snapshot, and the abandoned files become cleanup_orphans() fodder.
        Staged (WAP) epochs hold old-layout change-sets too — publish or
        abort them first; a stale stage that survives anyway is rejected
        at publish time (n_buckets recorded in the staged manifest)."""
        if new_n_buckets < 1:
            raise ValueError("new_n_buckets must be >= 1")
        while True:
            snap = self.current_snapshot()
            if self._nb(snap) == new_n_buckets:
                return {"rebucket": True, "noop": True,
                        "n_buckets": new_n_buckets}
            staged = self.staged_epochs()
            if staged:
                raise ValueError(
                    f"staged epochs {sorted(staged)} hold change-sets under "
                    f"the current bucketing; publish or abort them before "
                    f"rebucketing"
                )
            merged = (
                self.read(version=snap["version"])
                .drop("bkt")
                .withColumn("bkt", bucket_of(F.col("url"), new_n_buckets))
            )
            new_base, total_rows = self._write_bucketed_base(
                merged, snap, new_n_buckets, "rebucket",
                approx_bytes=self._approx_input_bytes(snap),
            )
            metrics = {
                "rebucket": True,
                "n_buckets": new_n_buckets,
                "base_rows": total_rows,
                "deltas_folded": len(snap["deltas"]),
            }
            try:
                out = self._commit(
                    snap, None, metrics=metrics, lineage=[],
                    new_base=new_base, new_base_rows=total_rows,
                    folded_deltas=snap["deltas"],
                    expect_base_of=snap, expect_deltas_of=snap,
                    n_buckets=new_n_buckets,
                )
            except CommitConflict:
                continue  # concurrent commit; rewrite from fresh snapshot
            self.n_buckets = new_n_buckets
            return out

    # ------------------------------------------------------------------
    # schema evolution (add / rename / widen) — manifest-only, no rewrite
    # ------------------------------------------------------------------

    def _bump_schema(
        self, snap: dict, new_ddl: str, rename: dict | None = None,
        drop: dict | None = None,
    ) -> None:
        """Commit one schema version bump derived from ``snap``; raises
        CommitConflict if another DDL assigned the same schema_v first —
        two concurrent bumps must not hand out the same version number to
        different DDLs (the manifest's schema map is append-only by key)."""
        new_schema_v = snap["schema_v"] + 1
        schemas = dict(snap["schemas"], **{str(new_schema_v): new_ddl})
        renames = list(snap["renames"])
        if rename:
            renames.append(dict(rename, schema_v=new_schema_v))
        drops = list(snap.get("drops", []))
        if drop:
            drops.append(dict(drop, schema_v=new_schema_v))
        self._commit(
            snap, None,
            metrics={"schema_change": True, "schema_v": new_schema_v},
            lineage=[], schema_v=new_schema_v, schemas=schemas,
            renames=renames, drops=drops,
            expect_schema_v_of=snap,
        )

    def add_column(self, name: str, spark_type: str) -> None:
        # DDL-parse the type: accepts both constructor names ('long') and
        # simpleString/DDL names ('bigint', 'decimal(10,2)') — evolve-mode
        # replication feeds simpleString() forms here
        dt = T.StructType.fromDDL(f"x {spark_type}")[0].dataType
        if (
            self.cluster_mode == "zorder"
            and len(self.sort_columns) >= 2
            and name in self.sort_columns
        ):
            from .zorder import validate_zorder_columns

            validate_zorder_columns(
                T.StructType().add(name, dt), self.sort_columns
            )
        while True:
            snap = self.current_snapshot()
            cur = self.schema(snap)
            if name in cur.fieldNames():
                return
            new = T.StructType(cur.fields).add(name, dt)
            try:
                return self._bump_schema(snap, _ddl_of(new))
            except CommitConflict:
                continue  # recompute against the DDL that beat us

    def rename_column(self, old: str, new: str) -> None:
        while True:
            snap = self.current_snapshot()
            cur = self.schema(snap)
            if old not in cur.fieldNames():
                return
            fields = [
                T.StructField(new if f.name == old else f.name, f.dataType, f.nullable)
                for f in cur.fields
            ]
            try:
                return self._bump_schema(
                    snap, _ddl_of(T.StructType(fields)),
                    rename={"from": old, "to": new},
                )
            except CommitConflict:
                continue

    #: columns the MOR resolution and tombstone semantics stand on —
    #: never droppable (reference: Embulk's remove_columns filter refuses
    #: nothing, but it has no keyed merge to protect)
    PROTECTED_COLUMNS = frozenset({"url", "warc_ts", "seq", "is_deleted"})

    def _wire_resolver(self, snap: dict):
        """resolve(wire_name) → current column name, or None if the wire
        column's payload must be discarded. Walks the interleaved
        rename/drop chain in schema_v order. After a drop, the wire name
        RE-BINDS to a later re-ADD of the same name (a producer that kept
        emitting it targets the new column) — but NOT to a rename that
        reused the name (the renamed column owns it; the wire column
        predates the drop). Mirrors Iceberg's field-id reasoning without
        field ids."""
        chain = sorted(
            [dict(r, _op="rename") for r in snap["renames"]]
            + [dict(d, _op="drop") for d in snap.get("drops", [])],
            key=lambda c: c["schema_v"],
        )
        names_at = {
            int(v): {p.strip().split()[0] for p in ddl.split(",")}
            for v, ddl in snap["schemas"].items()
        }

        def resolve(name: str) -> str | None:
            pos_v = 0
            while True:
                nxt = next(
                    (
                        c for c in chain
                        if c["schema_v"] > pos_v and (
                            (c["_op"] == "rename" and c["from"] == name)
                            or (c["_op"] == "drop" and c["name"] == name)
                        )
                    ),
                    None,
                )
                if nxt is None:
                    return name
                if nxt["_op"] == "rename":
                    name, pos_v = nxt["to"], nxt["schema_v"]
                    continue
                d_v = nxt["schema_v"]
                readd_v = min(
                    (v for v, ns in names_at.items()
                     if v > d_v and name in ns),
                    default=None,
                )
                if readd_v is None:
                    return None  # dropped, never re-introduced
                claimed = any(
                    c["_op"] == "rename" and c["to"] == name
                    and d_v < c["schema_v"] <= readd_v
                    for c in chain
                )
                if claimed:
                    return None  # the reused name belongs to a rename
                pos_v = readd_v  # re-bind to the re-added incarnation

        return resolve

    def drop_column(self, name: str) -> None:
        """Drop a column manifest-only (zero rewrite — Embulk's
        remove_columns as a lake DDL, Iceberg's drop-column semantics):
        readers stop selecting it; pre-drop files keep the bytes on disk
        but a later re-add of the same name reads NULL from them, never
        the old values (no resurrection — pinned by the drops list in
        :meth:`_normalize`)."""
        if name in self.PROTECTED_COLUMNS:
            raise ValueError(
                f"column {name!r} is load-bearing for the keyed merge "
                f"(protected: {sorted(self.PROTECTED_COLUMNS)})"
            )
        while True:
            snap = self.current_snapshot()
            cur = self.schema(snap)
            if name not in cur.fieldNames():
                return
            fields = [f for f in cur.fields if f.name != name]
            try:
                return self._bump_schema(
                    snap, _ddl_of(T.StructType(fields)),
                    drop={"name": name},
                )
            except CommitConflict:
                continue

    def widen_column(self, name: str, to_embulk_type: str) -> None:
        """Widen per the reference lattice (schema_guess.rb:112-128);
        incompatible pairs widen to string."""
        from ..functions.coerce import EMBULK_TO_SPARK

        while True:
            snap = self.current_snapshot()
            cur = self.schema(snap)
            fields = []
            for f in cur.fields:
                if f.name == name:
                    fields.append(
                        T.StructField(name, EMBULK_TO_SPARK[to_embulk_type], True)
                    )
                else:
                    fields.append(f)
            try:
                return self._bump_schema(snap, _ddl_of(T.StructType(fields)))
            except CommitConflict:
                continue


    # ------------------------------------------------------------------
    # maintenance: orphan cleanup & snapshot expiry
    # ------------------------------------------------------------------

    def _referenced_files(self, snaps: list[dict]) -> set[str]:
        refs: set[str] = set()
        for snap in snaps:
            for entry in snap["base"].values():
                refs.update(entry["files"])
            for d in snap["deltas"]:
                refs.update(d["files"])
        return refs

    def cleanup_orphans(self, grace_seconds: float = 3600.0) -> dict:
        """Delete data files referenced by NO retained snapshot — debris of
        crashes between a delta write and its commit. Files younger than
        ``grace_seconds`` are kept (they may belong to an in-flight
        pipelined epoch). Reference semantics: Embulk's ``cleanup``
        command removing intermediate data of failed transactions
        (exec/BulkLoader.java:471-505, cli/Command.java:5)."""
        # EVERY ref pins files, whichever ref runs the GC: main's
        # snapshots/staged, this handle's (if a branch), and every
        # branch's — a branch handle must never treat main-only files
        # as orphans (or vice versa)
        bd = self._branches_dir()
        snap_dirs = {os.path.join(self.path, "snapshots"), self._snap_dir}
        staged_dirs = {os.path.join(self.path, "staged"), self._staged_dir}
        if os.path.isdir(bd):
            for n in sorted(os.listdir(bd)):
                snap_dirs.add(os.path.join(bd, n, "snapshots"))
                staged_dirs.add(os.path.join(bd, n, "staged"))
        snaps = []
        for d in sorted(snap_dirs):
            if not os.path.isdir(d):
                continue
            for fn in sorted(os.listdir(d)):
                if fn.startswith("v") and fn.endswith(".json"):
                    with open(os.path.join(d, fn)) as f:
                        snaps.append(json.load(f))
        refs = self._referenced_files(snaps)
        mrefs = {
            e["stats_ref"]
            for snap in snaps
            for e in list(snap["base"].values()) + snap["deltas"]
            if e.get("stats_ref")
        }
        # staged (WAP) epochs are deliberately not in any snapshot yet —
        # their files are referenced by the staged manifests, not orphans
        for d in staged_dirs:
            if not os.path.isdir(d):
                continue
            for fn in sorted(os.listdir(d)):
                if fn.startswith("e") and fn.endswith(".json"):
                    with open(os.path.join(d, fn)) as f:
                        man = json.load(f)
                    if man.get("delta"):
                        refs.update(man["delta"]["files"])
                        if man["delta"].get("stats_ref"):
                            mrefs.add(man["delta"]["stats_ref"])
        now = time.time()
        removed, kept_young = [], 0
        for root, _dirs, fns in os.walk(self._data_dir):
            for fn in fns:
                fp = os.path.join(root, fn)
                rel = os.path.relpath(fp, self.path)
                if rel in refs or not fn.endswith(".parquet"):
                    continue
                if now - os.path.getmtime(fp) < grace_seconds:
                    kept_young += 1
                    continue
                os.remove(fp)
                removed.append(rel)
        # drop now-empty data directories
        for root, dirs, fns in os.walk(self._data_dir, topdown=False):
            if root != self._data_dir and not dirs and not fns:
                os.rmdir(root)
        # stats manifest sidecars referenced by NO retained snapshot or
        # staged epoch (debris of expired snapshots / crashed writes) go
        # the same way, under the same grace window
        man_removed = 0
        mdir = os.path.join(self.path, "manifests")
        if os.path.isdir(mdir):
            for fn in sorted(os.listdir(mdir)):
                rel = f"manifests/{fn}"
                fp = os.path.join(mdir, fn)
                if rel in mrefs or not fn.endswith(".json"):
                    continue
                if now - os.path.getmtime(fp) < grace_seconds:
                    kept_young += 1
                    continue
                os.remove(fp)
                man_removed += 1
        return {"orphans_removed": len(removed), "kept_in_grace": kept_young,
                "manifests_removed": man_removed}

    def rollback_to(self, version: int) -> dict:
        """Restore the table to snapshot ``version``'s state by publishing
        a NEW snapshot carrying that state (Iceberg rollback semantics:
        history is never rewritten, so time travel and concurrent readers
        stay consistent, and create-exclusive versioning keeps the
        rollback linearizable with in-flight epoch commits).

        Epochs undone by the rollback leave ``committed_epochs``, so a
        subsequent replay re-applies exactly the undone epochs through the
        normal idempotent path — "roll back the bad batch, fix, replay" is
        the reference's resume story inverted (exec/BulkLoader.java:584-659
        re-runs uncommitted tasks; rollback un-commits them).

        Refused when the target snapshot has been expired or any of its
        data files were collected (``cleanup_orphans`` after expiry)."""
        try:
            target = self.snapshot_at(version)
        except FileNotFoundError:
            raise ValueError(
                f"snapshot v{version} does not exist (expired?) — "
                "cannot roll back past expire_snapshots"
            )
        missing = [
            f
            for f in sorted(self._referenced_files([target]))
            if not os.path.exists(os.path.join(self.path, f))
        ]
        if missing:
            raise ValueError(
                f"snapshot v{version} references {len(missing)} collected "
                f"data file(s) (first: {missing[0]}) — unrecoverable after "
                "cleanup_orphans"
            )
        with self._commit_lock:
            while True:
                cur = self.current_snapshot()
                if cur["version"] == version:
                    return {"rolled_back_to": version, "noop": True}
                committed_at = time.time()
                new_snap = {
                    "version": cur["version"] + 1,
                    "epoch_id": None,
                    "committed_epochs": target["committed_epochs"],
                    "schema_v": target["schema_v"],
                    "schemas": target["schemas"],
                    "renames": target["renames"],
                    "drops": target.get("drops", []),
                    "base": target["base"],
                    "base_rows": target["base_rows"],
                    "deltas": target["deltas"],
                    # the sketch is monotone state: it rolls back with the
                    # epoch set and re-merges when the epochs replay
                    "url_hll": target.get("url_hll") or {},
                    # properties are CURRENT-state config, not data state:
                    # a rollback restores rows, not knobs
                    "properties": cur.get("properties") or {},
                    "metrics": {
                        "op": "rollback",
                        "to_version": version,
                        "committed_at": committed_at,
                    },
                    "lineage": [],
                    "committed_at": committed_at,
                }
                try:
                    _atomic_create_json(
                        self._snap_path(new_snap["version"]), new_snap
                    )
                    return {
                        "rolled_back_to": version,
                        "new_version": new_snap["version"],
                        "uncommitted_epochs": sorted(
                            set(cur["committed_epochs"])
                            - set(target["committed_epochs"])
                        ),
                    }
                except FileExistsError:
                    continue  # concurrent commit took the version: rebase

    def bulk_import(
        self,
        source,
        epoch_id: int,
        *,
        extract: bool = True,
    ) -> dict:
        """Initial bulk load (Hudi bootstrap / Iceberg ``add_files`` — and
        the reference's one-shot bulk-load identity, EmbulkRunner's run
        path): a snapshot-shaped ``source`` (a DataFrame or a parquet
        path; duplicates per url resolved by the usual (warc_ts, seq)
        order) lands DIRECTLY as the hash-bucketed base in ONE distributed
        job — no per-event delta commits, no compaction debt, no replay.
        At 100 TB this is the difference between one bucketed write and
        10^10 events ground through the epoch machinery.

        Requires an EMPTY base (no prior base, no pending deltas): on a
        populated table new rows must reconcile against existing state,
        which is ``merge_epoch``'s job. Imported rows get ``seq`` 0 unless
        the source carries one, so any later change event outranks its
        imported baseline. ``op``/``is_deleted`` columns are honored
        (a changelog dump imports with its tombstones intact); other
        missing payload columns null-fill against the current schema.
        ``extract=True`` fills ``text`` from ``html`` (Arrow-batched UDF)
        where the source didn't provide it. Idempotent by ``epoch_id``
        through the same committed-epoch set as streaming commits."""
        t0 = time.perf_counter()
        snap = self.current_snapshot()
        if epoch_id in set(snap["committed_epochs"]):
            return {"epoch_id": epoch_id, "skipped_duplicate_epoch": True}
        if snap["base"] or snap["deltas"]:
            raise ValueError(
                "bulk_import requires an empty table (base and deltas); "
                "route incremental rows through merge_epoch"
            )
        approx_bytes = None
        if isinstance(source, str):
            total = 0
            for root, _dirs, fns in os.walk(source):
                total += sum(
                    os.path.getsize(os.path.join(root, f))
                    for f in fns if f.endswith(".parquet")
                )
            approx_bytes = total or None
            source = self.spark.read.parquet(source)
        cur = self.schema(snap)
        nb = self._nb(snap)
        df = source.filter(F.col("url").isNotNull())
        if "is_deleted" not in df.columns and "op" in df.columns:
            df = df.withColumn("is_deleted", F.col("op") == "D")
        if "seq" not in df.columns:
            df = df.withColumn("seq", F.lit(0).cast("long"))
        for field in cur.fields:
            if field.name not in df.columns:
                df = df.withColumn(
                    field.name, F.lit(None).cast(field.dataType)
                )
        df = df.withColumn(
            "is_deleted", F.coalesce(F.col("is_deleted"), F.lit(False))
        )
        df = df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in cur.fields]
        )
        merged = dedup_latest(df)
        if extract and "html" in merged.columns and "text" in merged.columns:
            merged = merged.withColumn(
                "text",
                F.coalesce(F.col("text"), extract_text(F.col("html"))),
            )
        merged = merged.withColumn("bkt", bucket_of(F.col("url"), nb))
        new_base, total_rows = self._write_bucketed_base(
            merged, snap, nb, "import", approx_bytes=approx_bytes
        )
        hll_regs = None
        if self.url_hll:
            from ..operators.sketch import hll_sketch

            files = [f for e in new_base.values() for f in e["files"]]
            urls = self.spark.read.parquet(
                *[os.path.join(self.path, f) for f in files]
            ).select("url")
            hll_regs = {
                str(r["bucket"]): int(r["rho"])
                for r in hll_sketch(urls, "url", []).collect()
            }
        lineage = [
            {"bucket": int(b), "rows": e["rows"], "files": len(e["files"])}
            for b, e in sorted(
                new_base.items(), key=lambda kv: int(kv[0])
            )
        ]
        metrics = {
            "import": True,
            "epoch_id": epoch_id,
            "rows_imported": total_rows,
            "base_files": sum(len(e["files"]) for e in new_base.values()),
            "bytes_written": self._entry_bytes(new_base.values()),
            "seconds": round(time.perf_counter() - t0, 3),
        }
        return self._commit(
            snap, epoch_id, metrics=metrics, lineage=lineage,
            new_base=new_base, new_base_rows=total_rows,
            expect_base_of=snap, expect_nb=nb, hll_regs=hll_regs,
        )

    def clone_to(self, dest_path: str, *, version: int | None = None) -> dict:
        """Zero-copy shallow clone (Delta ``SHALLOW CLONE`` / Iceberg
        snapshot-ref table): materialize an INDEPENDENT table at
        ``dest_path`` whose v0 snapshot carries this table's state at
        ``version`` (default: current). Data files and stats-manifest
        sidecars are HARD-LINKED, not copied — O(files) metadata ops,
        zero data bytes moved — and because a hard link pins the inode,
        the clone survives the source's ``cleanup_orphans``/compaction
        (Delta's documented vacuum-breaks-clones hazard doesn't apply;
        blocks free only when BOTH tables drop the file). Cross-device
        destinations degrade to a copy per file.

        The clone keeps ``committed_epochs`` (duplicate-delivery
        protection carries over: replaying the source's stream against
        the clone skips already-applied epochs), schema history, bucket
        layout, and the url HLL; it starts with fresh history (no tags,
        branches, staged epochs, or old snapshots). Writes to either
        table never affect the other — dev/test sandboxes over a
        production lake for the price of the metadata. On an object
        store, implement with absolute-URI manifests instead; the posix
        form expresses the same O(metadata) contract."""
        snap = (
            self.snapshot_at(version) if version is not None
            else self.current_snapshot()
        )
        dest_path = os.path.abspath(dest_path)
        if os.path.abspath(self.path) == dest_path:
            raise ValueError("clone destination is the table itself")
        dest_snap_dir = os.path.join(dest_path, "snapshots")
        if os.path.isdir(dest_snap_dir) and any(
            f.endswith(".json") for f in os.listdir(dest_snap_dir)
        ):
            raise ValueError(
                f"{dest_path} is already a table — clone needs a fresh dir"
            )
        refs = sorted(self._referenced_files([snap]))
        missing = [
            f for f in refs
            if not os.path.exists(os.path.join(self.path, f))
        ]
        if missing:
            raise ValueError(
                f"snapshot v{snap['version']} references {len(missing)} "
                f"collected data file(s) (first: {missing[0]}) — "
                "unrecoverable after cleanup_orphans"
            )
        groups = list(snap["base"].values()) + list(snap["deltas"])
        refs += sorted(
            {g["stats_ref"] for g in groups if g.get("stats_ref")}
        )
        os.makedirs(dest_snap_dir, exist_ok=True)
        bytes_shared, copied = 0, 0
        for rel in refs:
            src = os.path.join(self.path, rel)
            dst = os.path.join(dest_path, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(src, dst)
            except FileExistsError:
                pass  # rerun after a partial clone crash: same content
            except OSError:
                import shutil

                shutil.copy2(src, dst)  # cross-device: degrade to copy
                copied += 1
            bytes_shared += os.path.getsize(src)
        committed_at = time.time()
        clone_snap = {
            "version": 0,
            "epoch_id": None,
            "committed_epochs": snap["committed_epochs"],
            "schema_v": snap["schema_v"],
            "schemas": snap["schemas"],
            "renames": snap["renames"],
            "drops": snap.get("drops", []),
            "n_buckets": self._nb(snap),
            "base": snap["base"],
            "base_rows": snap["base_rows"],
            "deltas": snap["deltas"],
            "url_hll": snap.get("url_hll") or {},
            "properties": snap.get("properties") or {},
            "metrics": {
                "clone": True,
                "cloned_from": os.path.abspath(self.path),
                "clone_source_version": snap["version"],
                "committed_at": committed_at,
            },
            "lineage": [],
            "committed_at": committed_at,
        }
        try:
            _atomic_create_json(
                os.path.join(dest_snap_dir, "v00000000.json"), clone_snap
            )
        except FileExistsError:
            raise ValueError(
                f"{dest_path} gained a snapshot mid-clone — clone needs a "
                "fresh dir"
            )
        return {
            "cloned_to": dest_path,
            "clone_source_version": snap["version"],
            "files_linked": len(refs) - copied,
            "files_copied": copied,
            "bytes_shared": bytes_shared,
        }

    def verify_against_events(
        self, events: DataFrame, *, extract: bool = True
    ) -> dict:
        """Anti-entropy check: recompute the expected final state from the
        RAW event log (one batch dedup + extraction — deliberately not
        the replay path's per-epoch machinery) and diff it against
        ``published()``. Returns mismatch counts; 0/0/0 certifies the
        epoch-commit/resume/compaction/rebucket pipeline reproduced the
        log exactly. O(log + table) — a maintenance job, not a hot path;
        text comparison is by md5 so the join carries digests, not
        documents."""
        data = events.filter(F.col("op") != "S")
        latest = dedup_latest(
            data.select("url", "warc_ts", "seq", "op", "html", "lang")
        )
        expect = latest.filter(F.col("op") != "D").select(
            "url", "seq",
            F.md5(
                extract_text(F.col("html")).cast("binary")
            ).alias("_txt") if extract else F.lit(None).alias("_txt"),
        )
        got = self.published().select(
            "url", "seq",
            F.md5(F.col("text").cast("binary")).alias("_txt")
            if extract else F.lit(None).alias("_txt"),
        )
        j = expect.alias("e").join(got.alias("g"), "url", "full")
        report = j.agg(
            F.sum(F.when(F.col("g.seq").isNull(), 1).otherwise(0)).alias("missing"),
            F.sum(F.when(F.col("e.seq").isNull(), 1).otherwise(0)).alias("extra"),
            F.sum(
                F.when(
                    F.col("e.seq").isNotNull() & F.col("g.seq").isNotNull()
                    & (
                        (F.col("e.seq") != F.col("g.seq"))
                        | ~F.col("e._txt").eqNullSafe(F.col("g._txt"))
                    ),
                    1,
                ).otherwise(0)
            ).alias("mismatched"),
            F.count(F.lit(1)).alias("urls_checked"),
        ).collect()[0]
        out = {k: int(report[k] or 0) for k in
               ("missing", "extra", "mismatched", "urls_checked")}
        out["ok"] = not (out["missing"] or out["extra"] or out["mismatched"])
        return out

    # ------------------------------------------------------------------
    # tags: immutable named snapshot refs (Iceberg tag refs)
    # ------------------------------------------------------------------

    def _tags_dir(self) -> str:
        d = os.path.join(self.path, "tags")
        os.makedirs(d, exist_ok=True)
        return d

    def tag(self, name: str, version: int | None = None) -> dict:
        """Pin a snapshot under an immutable name (audit/release refs:
        ``prod-2026-08``, ``eval-corpus-v3``). Tagged snapshots survive
        ``expire_snapshots``, so their data files stay live for
        ``cleanup_orphans`` — a tag is a retention lease, exactly
        Iceberg's tag-ref semantics. Create-exclusive: re-tagging an
        existing name raises (drop it first); tags never move."""
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"invalid tag name {name!r}")
        v = int(version) if version is not None \
            else self.current_snapshot()["version"]
        if not os.path.exists(self._snap_path(v)):
            raise ValueError(f"snapshot v{v} does not exist (expired?)")
        _atomic_create_json(
            os.path.join(self._tags_dir(), f"{name}.json"),
            {"name": name, "version": v, "created_at": time.time()},
        )
        return {"tag": name, "version": v}

    def tags(self) -> dict[str, int]:
        out = {}
        for fn in sorted(os.listdir(self._tags_dir())):
            if fn.endswith(".json"):
                with open(os.path.join(self._tags_dir(), fn)) as f:
                    t = json.load(f)
                out[t["name"]] = int(t["version"])
        return out

    def drop_tag(self, name: str) -> dict:
        p = os.path.join(self._tags_dir(), f"{name}.json")
        existed = os.path.exists(p)
        if existed:
            os.remove(p)
        return {"tag": name, "dropped": existed}

    def read_tag(self, name: str) -> DataFrame:
        """Time-travel read by tag name (published rows, tombstones
        filtered) — the named-release read path."""
        tags = self.tags()
        if name not in tags:
            raise ValueError(f"unknown tag {name!r} (have {sorted(tags)})")
        return self.published(version=tags[name])

    def version_as_of(self, ts) -> int:
        """Newest snapshot version whose commit wall-clock is ≤ ``ts``
        (Iceberg's TIMESTAMP AS OF). ``ts`` is epoch seconds or a
        datetime (naive = UTC). Driver-side metadata walk over the
        snapshot log — O(retained snapshots), no data IO. Resolution is
        by max qualifying VERSION, not max committed_at, so a wall-clock
        step backwards between commits (NTP) can't make time travel
        non-monotone; snapshots missing a clock (pre-feature files)
        count as always-eligible. Raises if ``ts`` precedes the first
        retained commit — expired history is a hard error, not a silent
        older-state read."""
        if isinstance(ts, datetime):
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=timezone.utc)
            ts = ts.timestamp()
        # compare in whole microseconds: datetime carries µs resolution,
        # so fromtimestamp(committed_at) can round a hair BELOW the stored
        # float and a float/datetime pair naming the same instant would
        # otherwise resolve to different versions
        ts_us = round(float(ts) * 1e6)
        best = None
        for fn in self._snapshot_files():
            with open(os.path.join(self._snap_dir, fn)) as f:
                snap = json.load(f)
            if round(float(snap.get("committed_at", 0.0)) * 1e6) <= ts_us:
                v = int(snap["version"])
                best = v if best is None else max(best, v)
        if best is None:
            raise ValueError(
                f"no snapshot committed at or before ts={ts} "
                "(history expired or table younger than ts)"
            )
        return best

    def read_as_of(self, ts) -> DataFrame:
        """Published rows as of a wall-clock instant (timestamp time
        travel): ``published(version=version_as_of(ts))`` — the
        audit/debug read path ("what did the table serve at 14:02?")."""
        return self.published(version=self.version_as_of(ts))

    # ------------------------------------------------------------------
    # branches: named mutable refs + fast-forward publish (Iceberg
    # branch semantics — the multi-epoch generalization of WAP)
    # ------------------------------------------------------------------

    def _branches_dir(self) -> str:
        return os.path.join(self.path, "branches")

    def create_branch(
        self, name: str, *, at_version: int | None = None,
        if_not_exists: bool = False,
    ) -> dict:
        """Fork a branch from this ref's snapshot ``at_version`` (default:
        current head). The branch is an independent snapshot namespace
        sharing the table's data files — open it with
        ``ParquetLakeTable(spark, path, ref=name)`` (or :meth:`branch`)
        and replay/compact/stage on it exactly like main; main's readers
        never see it until :meth:`fast_forward`. Use cases: multi-epoch
        backfill audited as a whole, schema-migration rehearsal, an
        always-auditable staging lane (Iceberg's audit-branch workflow).

        Crash-safe: the seed snapshot writes FIRST, ``BRANCH.json`` is
        the create-exclusive commit point last — a crash in between
        leaves an invisible torn dir (``branches()`` ignores dirs with
        no BRANCH.json) that a redelivery completes. An existing name
        raises; ``if_not_exists=True`` skips instead (the redelivery
        contract for at-least-once admin pipelines — CREATE BRANCH IF
        NOT EXISTS)."""
        if not name or name == "main" or "/" in name or name.startswith("."):
            raise ValueError(f"invalid branch name {name!r}")
        bdir = os.path.join(self._branches_dir(), name)
        if os.path.exists(os.path.join(bdir, "BRANCH.json")):
            if if_not_exists:
                with open(os.path.join(bdir, "BRANCH.json")) as f:
                    meta = json.load(f)
                return {
                    "branch": name,
                    "fork_version": meta.get("fork_version"),
                    "skipped_existing": True,
                }
            raise ValueError(f"branch {name!r} already exists")
        snap = (
            self.snapshot_at(at_version) if at_version is not None
            else self.current_snapshot()
        )
        sdir = os.path.join(bdir, "snapshots")
        os.makedirs(sdir, exist_ok=True)
        # seed first: the fork snapshot, verbatim (snapshots are self-
        # contained manifests, so the branch never reads main's snapshot
        # dir again). Idempotent under redelivery: a leftover seed from
        # a crashed attempt is the same immutable content.
        try:
            _atomic_create_json(
                os.path.join(sdir, f"v{snap['version']:08d}.json"), snap
            )
        except FileExistsError:
            pass
        # a redelivery after a crash between seed write and BRANCH.json
        # may pick a DIFFERENT fork snapshot (head advanced, or a lower
        # explicit at_version): the prior attempt's seed would then be
        # the max-version file and branches()/fast_forward would take it
        # as the head, diverging from fork_version. Drop every seed that
        # is not the chosen fork BEFORE committing BRANCH.json (the dir
        # is invisible until BRANCH.json exists, so this is safe).
        for f in os.listdir(sdir):
            if (
                f.startswith("v")
                and f.endswith(".json")
                and f != f"v{snap['version']:08d}.json"
            ):
                os.unlink(os.path.join(sdir, f))
        meta = {
            "name": name,
            "fork_ref": self.ref,
            "fork_version": snap["version"],
            "created_at": time.time(),
        }
        _atomic_create_json(os.path.join(bdir, "BRANCH.json"), meta)
        return {"branch": name, "fork_version": snap["version"]}

    def branch(self, name: str) -> "ParquetLakeTable":
        """A handle committing to branch ``name`` (same table dir)."""
        return ParquetLakeTable(
            self.spark, self.path,
            compact_min_deltas=self.compact_min_deltas,
            compact_ratio=self.compact_ratio,
            compact_mode=self.compact_mode,
            url_hll=self.url_hll, ref=name,
            feed_retain_epochs=self._feed_retain_epochs,
        )

    def branches(self) -> dict[str, dict]:
        """name → {fork_version, head_version} for every branch ref."""
        bd = self._branches_dir()
        out: dict[str, dict] = {}
        if not os.path.isdir(bd):
            return out
        for n in sorted(os.listdir(bd)):
            mp = os.path.join(bd, n, "BRANCH.json")
            sdir = os.path.join(bd, n, "snapshots")
            if not os.path.exists(mp):
                continue
            with open(mp) as f:
                meta = json.load(f)
            heads = sorted(
                f for f in os.listdir(sdir)
                if f.startswith("v") and f.endswith(".json")
            ) if os.path.isdir(sdir) else []
            out[n] = {
                "fork_version": int(meta["fork_version"]),
                "head_version": int(heads[-1][1:9]) if heads else None,
            }
        return out

    def drop_branch(self, name: str) -> dict:
        """Delete a branch ref; its branch-only data files become
        cleanup_orphans() fodder."""
        bdir = os.path.join(self._branches_dir(), name)
        existed = os.path.isdir(bdir)
        if existed:
            shutil.rmtree(bdir)
        return {"branch": name, "dropped": existed}

    def fast_forward(self, name: str) -> dict:
        """Publish branch ``name``'s head as this ref's next snapshot —
        atomic, manifest-only (no data moves: the branch wrote its files
        into the shared data dir). Requires THIS ref to still be at the
        branch's fork version (the ancestor condition of Iceberg's
        fast_forward); if main advanced since the fork, raises
        CommitConflict — re-branch from the new head and replay the
        branch's epochs through the normal idempotent path."""
        bdir = os.path.join(self._branches_dir(), name)
        mp = os.path.join(bdir, "BRANCH.json")
        if not os.path.exists(mp):
            raise ValueError(f"unknown branch {name!r}")
        with open(mp) as f:
            meta = json.load(f)
        sdir = os.path.join(bdir, "snapshots")
        heads = sorted(
            f for f in os.listdir(sdir)
            if f.startswith("v") and f.endswith(".json")
        )
        with open(os.path.join(sdir, heads[-1])) as f:
            head = json.load(f)
        if head["version"] == meta["fork_version"]:
            return {"fast_forward": name, "noop": True}
        # empty-batch markers live in snapshot metrics, and _empty_epochs
        # scans only THIS ref's snapshot files — carry the branch's
        # markers for the adopted epochs into the publish snapshot, or a
        # later changes_between on main would count an adopted empty
        # epoch as "compacted into the base" and raise
        branch_empty: set[int] = set()
        for fn in heads:
            try:
                with open(os.path.join(sdir, fn)) as f:
                    m = json.load(f).get("metrics") or {}
            except (OSError, ValueError):
                continue
            if m.get("empty_batch") and m.get("epoch_id") is not None:
                branch_empty.add(int(m["epoch_id"]))
            branch_empty |= {int(e) for e in m.get("empty_epochs", ())}
        with self._commit_lock:
            while True:
                cur = self.current_snapshot()
                if cur["version"] != meta["fork_version"]:
                    # redelivery check BEFORE conflicting: a fast_forward
                    # that committed and crashed before returning must
                    # skip on redelivery, not refuse its own work — scan
                    # the ref's history since the fork for the adoption
                    # record of exactly this branch head
                    for v in range(
                        meta["fork_version"] + 1, cur["version"] + 1
                    ):
                        try:
                            m = (
                                self.snapshot_at(v).get("metrics") or {}
                            )
                        except (OSError, ValueError, KeyError):
                            continue
                        if (
                            m.get("fast_forward") == name
                            and m.get("from_branch_version")
                            == head["version"]
                        ):
                            return {
                                "fast_forward": name,
                                "version": v,
                                "skipped_duplicate": True,
                            }
                    raise CommitConflict(
                        f"{self.ref} advanced past the fork point "
                        f"(v{meta['fork_version']} → v{cur['version']}) — "
                        f"re-branch and replay the branch's epochs"
                    )
                new = dict(head)
                new["version"] = cur["version"] + 1
                adopted = sorted(
                    set(head["committed_epochs"])
                    - set(cur["committed_epochs"])
                )
                new["metrics"] = {
                    "fast_forward": name,
                    "from_branch_version": head["version"],
                    "empty_epochs": sorted(branch_empty & set(adopted)),
                    "committed_at": time.time(),
                }
                new["committed_at"] = time.time()
                try:
                    _atomic_create_json(self._snap_path(new["version"]), new)
                    return {
                        "fast_forward": name,
                        "version": new["version"],
                        "epochs_adopted": adopted,
                    }
                except FileExistsError:
                    continue  # racer took the version; recheck ancestor

    def expire_snapshots(self, keep_last: int = 10) -> dict:
        """Retain only the newest ``keep_last`` snapshots plus every
        TAGGED snapshot; data files referenced solely by expired
        snapshots become orphans (collect them with ``cleanup_orphans``).
        Mirrors Iceberg's expire_snapshots maintenance action with
        tag-ref retention."""
        files = self._snapshot_files()
        pinned = {f"v{v:08d}.json" for v in self.tags().values()}
        candidates = files[:-keep_last] if keep_last > 0 else []
        to_drop = [f for f in candidates if f not in pinned]
        for f in to_drop:
            os.remove(os.path.join(self._snap_dir, f))
        return {"snapshots_expired": len(to_drop),
                "snapshots_retained": len(files) - len(to_drop),
                "snapshots_pinned_by_tags": len(pinned & set(candidates))}


def _ddl_of(schema: T.StructType) -> str:
    return ", ".join(f"{f.name} {f.dataType.simpleString().upper()}" for f in schema.fields)
