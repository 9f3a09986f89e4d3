"""Shared lakehouse-table primitives: the commit-conflict type, the
create-exclusive JSON commit, and the crashed-dir-swap healing helpers
used by every module that rewrites parquet directories in place
(purge cascades, side-index epoch dirs). Split out of lake.py (round 4)
so the table's mixin modules can share them without an import cycle;
``streaming.lake`` re-exports every name, so existing imports keep
working."""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

from pyspark.sql import functions as F
from pyspark.sql import types as T


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





def _ddl_of(schema: T.StructType) -> str:
    return ", ".join(f"{f.name} {f.dataType.simpleString().upper()}" for f in schema.fields)
