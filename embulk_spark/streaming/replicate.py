"""Lake-to-lake replication over the incremental change feed — a
downstream read replica (reporting copy, DR mirror, cross-environment
promotion source) maintained at O(change-set) cost per sync.

The reference ships data between systems by re-running a bulk pipeline
per destination (input → filters → output per config,
/root/reference/embulk-core/src/main/java/org/embulk/exec/BulkLoader.java:318-370);
at CDC scale the replica instead tails the source table's OWN change
feed: ``consume_changes`` lands exactly-once range directories, and
``ParquetLakeTable.apply_changes`` commits each range as one replica
epoch — no re-parse, no re-dedup, no re-extraction (the text column
rides through byte-identical). A 100 TB source with 0.1%-per-epoch
churn costs the replica 0.1% writes per sync, never a table copy.

Crash-safety composes from the two primitives' own contracts:

- source poll: ``consume_changes`` is exactly-once into the feed dir
  (stale landed ranges are adopted, never recomputed overlapping);
- replica apply: keyed by the range's upper epoch — duplicate delivery
  skips, and a crash between poll and apply just leaves an unapplied
  range dir that the next step picks up (``applied`` is read from the
  replica's OWN committed-epoch set, not from a side cursor).

Every epoch id the replica commits is a range HEAD: epochs inside a
range are folded into its net rows (the replica's history is coarser
than the source's — by design, it mirrors state, not the event log).
"""

from __future__ import annotations

import os
import shutil


def _range_dirs(feed_dir: str) -> list[tuple[int, int, str]]:
    """(since, head, dirname) for every landed range, ascending by head."""
    out = []
    for d in os.listdir(feed_dir):
        if not d.startswith("range_"):
            continue
        parts = d.split("_")
        out.append((int(parts[1]), int(parts[2]), d))
    return sorted(out, key=lambda t: t[1])


def replicate_step(
    source, replica, feed_dir: str, *, prune: bool = False,
    evolve: bool = False,
) -> dict:
    """One crash-safe replication step: poll the source's feed cursor
    (landing any newly committed range), then apply every landed range
    the replica has not committed yet, in epoch order. Poll it from cron
    or a driver loop — the replication daemon step.

    ``prune`` deletes range dirs already applied AND behind the consumer
    cursor (safe: ``consume_changes`` only ever re-reads the range at
    the current cursor). ``evolve`` propagates additive source schema
    evolution to the replica (see ``apply_changes``). Idempotent at
    every crash point; see module docstring for the argument.
    """
    os.makedirs(feed_dir, exist_ok=True)
    poll = source.consume_changes(feed_dir)
    applied = replica.committed_epochs()
    done: list[int] = []
    for since, head, d in _range_dirs(feed_dir):
        if head in applied:
            continue
        feed = source.spark.read.parquet(os.path.join(feed_dir, d))
        replica.apply_changes(feed, head, evolve=evolve)
        done.append(head)
    if prune:
        cursor = int(poll["since_epoch"]) if poll.get("noop") else int(
            poll["until_epoch"]
        )
        applied = replica.committed_epochs()
        for _since, head, d in _range_dirs(feed_dir):
            if head in applied and head < cursor:
                shutil.rmtree(os.path.join(feed_dir, d), ignore_errors=True)
    return {
        "polled": poll,
        "applied_epochs": done,
        "replica_epochs": sorted(replica.committed_epochs()),
    }
