"""embulk-output-jdbc write-mode semantics over a parquet table directory.

The most-installed Embulk output family (embulk-output-jdbc /
-mysql/-postgresql; plugin contract is public docs) loads every run into
an *intermediate table* and publishes it inside ONE transaction, with six
modes. Re-expressed Spark-first as a manifest-versioned parquet table:

====================  =====================================================
mode                  semantics (matching the jdbc plugin's contract)
====================  =====================================================
``insert``            staged load, then transactional append; target
                      created if missing
``insert_direct``     append without resumed-transaction bookkeeping (the
                      jdbc plugin's non-transactional fast path)
``truncate_insert``   transactional "DELETE all + INSERT": staged rows
                      become the whole content, but the TABLE DEFINITION
                      is preserved — incoming rows are coerced to the
                      existing schema (missing cols null, extras dropped,
                      casts with setter policy: failure → null)
``replace``           the staged table *becomes* the target (drop +
                      rename): schema re-derived from the incoming frame
``merge``             upsert on ``merge_keys``: conflicting keys updated
                      (incoming wins), new keys inserted
``merge_direct``      merge without resumed-transaction bookkeeping
====================  =====================================================

Why not a plain ``df.write.mode(...)``: Spark's overwrite is not atomic
(a reader can see a half-deleted directory) and append cannot be made
idempotent under driver retry. Here every mode commits by
create-exclusive manifest version (the same optimistic-concurrency
primitive as the CDC lake, ``streaming/lake.py``): readers resolve the
highest ``manifest-N.json`` and see one consistent file-set; a crashed
run leaves only an orphaned stage directory (never a torn table); a
retried transactional run with the same ``txn_id`` is skipped — the jdbc
plugin's resumed-transaction guarantee (reference analogue: the output
transaction in spi/OutputPlugin.java:56-76 — one ``transaction()``
wrapping all tasks, committed once).

Scale story (100 TB): when the table has ``merge_keys``, every staged
group is hash-bucketed on them (``bkt=K`` leaf dirs, layout pinned in
the manifest). A ``merge`` change-set touches only the buckets its keys
hash into: those leaves are READ and rewritten (broadcast anti-join +
union), every cold leaf carries into the new manifest *by reference* —
never read, never copied. Cost is O(hot buckets + Δ), not O(table).
``insert`` appends leaves without reading the table at all.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.lake import _atomic_create_json

_MANIFEST_RE = re.compile(r"manifest-(\d+)\.json$")

MODES = (
    "insert",
    "insert_direct",
    "truncate_insert",
    "replace",
    "merge",
    "merge_direct",
)


def _schema_ddl(df: DataFrame) -> str:
    return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)


def _leaf_bkt(leaf: str) -> int | None:
    """Bucket id of a manifest leaf path, or None for unbucketed leaves."""
    tail = leaf.rsplit("/", 1)[-1]
    return int(tail.split("=", 1)[1]) if tail.startswith("bkt=") else None


class JdbcModeTable:
    """A directory table with jdbc-output transaction semantics.

    Layout: ``path/data/g-<uuid>[/bkt=K]/part-*.parquet`` leaf dirs +
    ``path/manifest-N.json`` listing the live leaves; highest N wins.
    Every manifest leaf holds plain parquet files (``bkt`` lives in the
    path only), so reads are uniform and a leaf is the unit of
    carry-by-reference.
    """

    def __init__(self, spark: SparkSession, path: str, n_buckets: int = 16):
        self.spark = spark
        self.path = path
        self.n_buckets = n_buckets
        os.makedirs(os.path.join(path, "data"), exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def _versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.path):
            m = _MANIFEST_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _manifest(self) -> dict | None:
        vs = self._versions()
        if not vs:
            return None
        with open(os.path.join(self.path, f"manifest-{vs[-1]}.json")) as f:
            cur = json.load(f)
        cur["_version"] = vs[-1]
        return cur

    def _commit(self, cur_version: int, payload: dict) -> int:
        """Create-exclusive next manifest; FileExistsError → a concurrent
        writer won and the caller rebases (same contract as the lake)."""
        nxt = cur_version + 1
        _atomic_create_json(
            os.path.join(self.path, f"manifest-{nxt}.json"), payload
        )
        return nxt

    # -- read --------------------------------------------------------------
    def _read_leaves(self, man: dict, leaves: list[str]) -> DataFrame:
        paths = [os.path.join(self.path, "data", lf) for lf in leaves]
        return self.spark.read.schema(man["schema_ddl"]).parquet(*paths)

    def load(self) -> DataFrame:
        man = self._manifest()
        if man is None or not man["leaves"]:
            raise FileNotFoundError(f"no committed table at {self.path}")
        return self._read_leaves(man, man["leaves"])

    # -- write -------------------------------------------------------------
    def write(
        self,
        df: DataFrame,
        mode: str = "insert",
        *,
        merge_keys: list[str] | None = None,
        txn_id: str | None = None,
    ) -> dict:
        if mode not in MODES:
            raise ValueError(f"unknown jdbc output mode: {mode}")
        if mode.startswith("merge") and not merge_keys:
            raise ValueError("merge modes need merge_keys")

        man = self._manifest() or {
            "_version": 0,
            "leaves": [],
            "schema_ddl": _schema_ddl(df),
            "txns": [],
            "merge_keys": merge_keys,
            "n_buckets": self.n_buckets,
        }
        # Bucket layout is a table property, not a handle property: once a
        # manifest exists its n_buckets wins, so a handle reopened with a
        # different constructor value can never stage leaves under one
        # bucketing while merge pruning assumes another (which would carry
        # conflicting keys by reference without reading them).
        self.n_buckets = man.get("n_buckets") or self.n_buckets
        direct = mode.endswith("_direct")
        if txn_id is not None and not direct and txn_id in man["txns"]:
            return {"mode": mode, "skipped_duplicate_txn": True, "rows": 0}

        if man["leaves"] and mode != "replace":
            # preserve the table definition: coerce incoming to it
            df = self._coerce_to(df, man["schema_ddl"])

        # replace re-creates the table: the caller's merge_keys (like its
        # schema) supersede the old manifest's, and the committed payload
        # must match what the staged leaves were actually bucketed on.
        keys = (
            merge_keys
            if mode == "replace"
            else (man.get("merge_keys") or merge_keys)
        )
        if mode in ("insert", "insert_direct"):
            new_leaves, n = self._stage(df, keys)
            keep = list(man["leaves"])
        elif mode in ("truncate_insert", "replace"):
            new_leaves, n = self._stage(
                df, keys if mode == "truncate_insert" else merge_keys
            )
            keep = []
        else:  # merge / merge_direct
            new_leaves, n, keep = self._merge(df, man, keys)

        payload = {
            "leaves": keep + new_leaves,
            "schema_ddl": (
                _schema_ddl(df)
                if mode == "replace" or not man["leaves"]
                else man["schema_ddl"]
            ),
            "txns": (man["txns"] + [txn_id])
            if (txn_id is not None and not direct)
            else man["txns"],
            "merge_keys": keys,
            "n_buckets": man.get("n_buckets", self.n_buckets),
        }
        try:
            self._commit(man["_version"], payload)
        except FileExistsError:
            # lost the race: drop our staged groups and let the caller
            # retry against the new manifest (idempotent via txn_id)
            for lf in new_leaves:
                shutil.rmtree(
                    os.path.join(self.path, "data", lf.split("/", 1)[0]), True
                )
            raise
        return {"mode": mode, "skipped_duplicate_txn": False, "rows": n}

    # -- internals ---------------------------------------------------------
    def _coerce_to(self, df: DataFrame, schema_ddl: str) -> DataFrame:
        target = self.spark.createDataFrame([], schema_ddl).schema
        cols = []
        for f in target:
            if f.name in df.columns:
                cols.append(F.col(f.name).try_cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return df.select(*cols)

    def _bkt_col(self, keys: list[str], nb: int):
        return F.pmod(
            F.xxhash64(*[F.col(c).cast("string") for c in keys]), F.lit(nb)
        )

    def _stage(
        self, df: DataFrame, bucketed_on: list[str] | None
    ) -> tuple[list[str], int]:
        """Write one new file group; returns (leaf paths, row count).
        With bucket keys the group is laid out as ``bkt=K`` leaves so a
        later merge can carry cold buckets by reference."""
        group = f"g-{uuid.uuid4().hex}"
        out = os.path.join(self.path, "data", group)
        nb = self.n_buckets
        if bucketed_on:
            df.withColumn("bkt", self._bkt_col(bucketed_on, nb)).write.partitionBy(
                "bkt"
            ).parquet(out)
            leaves = [
                f"{group}/{sub}"
                for sub in sorted(os.listdir(out))
                if sub.startswith("bkt=")
            ]
        else:
            df.write.parquet(out)
            leaves = [group]
        if bucketed_on and not leaves:
            return [], 0  # empty batch: partitionBy wrote no leaves
        n = self.spark.read.parquet(out).count()
        return leaves, n

    def merge_frame(
        self, df: DataFrame, man: dict, keys: list[str]
    ) -> tuple[DataFrame, list[str], list[str]]:
        """The merge read-side: (merged frame, leaves read, leaves
        carried). Only hot-bucket + unbucketed leaves are READ; the
        change-set keys are deduped and broadcast for the anti-join
        (table side never shuffles). Exposed so the plan gate
        (tools/explain_plans.py) asserts exactly the shape _merge
        executes."""
        hot = {r[0] for r in df.select(
            self._bkt_col(keys, man.get("n_buckets", self.n_buckets))
        ).distinct().collect()}
        read_leaves = [
            lf
            for lf in man["leaves"]
            if (_leaf_bkt(lf) is None or _leaf_bkt(lf) in hot)
        ]
        keep = [lf for lf in man["leaves"] if lf not in set(read_leaves)]
        if read_leaves:
            cur = self._read_leaves(man, read_leaves)
            survivors = cur.join(
                F.broadcast(df.select(*keys).distinct()),
                on=keys,
                how="left_anti",
            )
            merged = survivors.unionByName(df.select(cur.columns))
        else:
            merged = df
        return merged, read_leaves, keep

    def _merge(
        self, df: DataFrame, man: dict, keys: list[str]
    ) -> tuple[list[str], int, list[str]]:
        """Upsert ``df`` on ``keys``; returns (new leaves, rows written,
        carried leaves)."""
        nb = man.get("n_buckets", self.n_buckets)
        merged, _read, keep = self.merge_frame(df, man, keys)
        group = f"g-{uuid.uuid4().hex}"
        out = os.path.join(self.path, "data", group)
        merged.withColumn("bkt", self._bkt_col(keys, nb)).write.partitionBy(
            "bkt"
        ).parquet(out)
        leaves = [
            f"{group}/{sub}"
            for sub in sorted(os.listdir(out))
            if sub.startswith("bkt=")
        ]
        n = self.spark.read.parquet(out).count() if leaves else 0
        return leaves, n, keep

    def history(self) -> list[dict]:
        """All manifest versions, oldest first (time travel / audit)."""
        out = []
        for v in self._versions():
            with open(os.path.join(self.path, f"manifest-{v}.json")) as f:
                m = json.load(f)
            m["version"] = v
            out.append(m)
        return out


def cleanup_orphans(path: str) -> list[str]:
    """Remove data groups no manifest references (crashed stages). Safe
    any time: leaves enter a manifest only after their files are fully
    written and the manifest commit is create-exclusive."""
    live: set[str] = set()
    for name in os.listdir(path):
        if _MANIFEST_RE.match(name):
            with open(os.path.join(path, name)) as f:
                for lf in json.load(f)["leaves"]:
                    live.add(lf.split("/", 1)[0])
    removed = []
    data = os.path.join(path, "data")
    for g in sorted(os.listdir(data)):
        if g not in live:
            shutil.rmtree(os.path.join(data, g), True)
            removed.append(g)
    return removed
