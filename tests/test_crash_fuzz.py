"""Crash-interleaving fuzz over the commit lattice (VERDICT r2 item 4).

Round 2's review fixes (purge vs staged WAP epochs, NULL-key quarantine
rows, concurrent rebucket vs compaction) showed the crash-window bug
class is live. This harness makes it systematically searchable: run a
sequence of lake operations {merge_epoch, WAP stage/publish, compact,
rebucket, purge_keys, duplicate delivery} while a fault injector
kills the process-model at the k-th filesystem mutation — for EVERY k —
then asserts the invariant lattice:

1. **no torn reads**: a fresh handle over the crashed table opens and
   serves a consistent committed snapshot (published() neither raises
   nor double-counts);
2. **roll-forward**: recovery (fresh handle + cleanup_orphans(0) +
   re-running the crashed op, i.e. the CDC at-least-once redelivery
   contract) then the remaining ops produces EXACTLY the reference
   final state of an uninterrupted run — byte-equal rows, equal
   committed-epoch sets;
3. **hard-death fidelity**: once the injector fires, every later
   filesystem mutation in that attempt also fails — code that swallows
   the first failure and keeps committing gets caught.

The injector intercepts the posix mutation primitives every commit
path funnels through (os.rename / os.link / os.replace /
shutil.rmtree) — os.link is the create-exclusive snapshot commit point
(_atomic_create_json), rename is the dir-swap / staged-promote point,
rmtree the cleanup point.

Default run sweeps every crash point of two sequences (~fast); set
CRASH_FUZZ_FULL=1 to sweep all sequences (the committed
FUZZCHECK.json evidence run covers 1000+ interleavings via
tools/crash_fuzz_sweep.py, which reuses this module).
"""

from __future__ import annotations

import datetime
import os
import shutil

import pytest

from embulk_spark.streaming.lake import ParquetLakeTable


class InjectedCrash(Exception):
    pass


class FsCrashInjector:
    """Raise InjectedCrash at the n-th intercepted filesystem mutation
    and on EVERY mutation after it (hard process death, not a single
    flaky syscall)."""

    _TARGETS = (
        (os, "rename"),
        (os, "link"),
        (os, "replace"),
        (os, "unlink"),
        (os, "remove"),
        (os, "makedirs"),
        (os, "rmdir"),
        (shutil, "rmtree"),
        (shutil, "move"),
    )

    def __init__(self, crash_at: int | None):
        self.crash_at = crash_at
        self.count = 0
        self.fired = False
        self._orig: list = []

    def _wrap(self, fn):
        def inner(*a, **kw):
            if self.fired:
                raise InjectedCrash("post-crash filesystem op")
            if self.crash_at is not None and self.count == self.crash_at:
                self.fired = True
                raise InjectedCrash(f"crash at fs op {self.count}")
            self.count += 1
            return fn(*a, **kw)

        return inner

    def __enter__(self):
        for mod, name in self._TARGETS:
            fn = getattr(mod, name)
            self._orig.append((mod, name, fn))
            setattr(mod, name, self._wrap(fn))
        return self

    def __exit__(self, *exc):
        for mod, name, fn in self._orig:
            setattr(mod, name, fn)
        return False


# ---------------------------------------------------------------------------
# deterministic operation sequences
# ---------------------------------------------------------------------------


def _events(spark, epoch: int, n: int = 10):
    rows = [
        (
            epoch * 100 + i,
            "D" if i % 5 == 4 else "U",
            f"http://h{i % 5}.example/p{i % 3}",
            datetime.datetime(2026, 4, 1 + epoch, 8, i, 0),
            f"<html><body>e{epoch} item {i} text</body></html>".encode(),
            "en",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "seq long, op string, url string, warc_ts timestamp, "
        "html binary, lang string",
    )


def _sequences(spark):
    return {
        "merge_compact_merge": [
            ("merge1", lambda t: t.merge_epoch(_events(spark, 1), 1)),
            ("merge2", lambda t: t.merge_epoch(_events(spark, 2), 2)),
            ("compact", lambda t: t.compact()),
            ("merge3", lambda t: t.merge_epoch(_events(spark, 3), 3)),
        ],
        "wap_stage_publish": [
            ("merge1", lambda t: t.merge_epoch(_events(spark, 1), 1)),
            (
                "stage2",
                lambda t: t.merge_epoch(_events(spark, 2), 2, stage=True),
            ),
            ("publish2", lambda t: t.publish_staged(2)),
            ("compact", lambda t: t.compact()),
        ],
        "rebucket_mid_stream": [
            ("merge1", lambda t: t.merge_epoch(_events(spark, 1), 1)),
            ("rebucket", lambda t: t.rebucket(8)),
            ("merge2", lambda t: t.merge_epoch(_events(spark, 2), 2)),
            ("compact", lambda t: t.compact()),
        ],
        "purge_rtbf": [
            ("merge1", lambda t: t.merge_epoch(_events(spark, 1), 1)),
            ("merge2", lambda t: t.merge_epoch(_events(spark, 2), 2)),
            (
                "purge",
                lambda t: t.purge_keys(["http://h1.example/p1"]),
            ),
            ("merge3", lambda t: t.merge_epoch(_events(spark, 3), 3)),
        ],
        "duplicate_delivery": [
            ("merge1", lambda t: t.merge_epoch(_events(spark, 1), 1)),
            ("merge2", lambda t: t.merge_epoch(_events(spark, 2), 2)),
            ("dup2", lambda t: t.merge_epoch(_events(spark, 2), 2)),
            ("compact", lambda t: t.compact()),
        ],
    }


def _final_rows(t: ParquetLakeTable):
    # published() serves live rows only (tombstones filtered); byte-level
    # equality over key, winning version, and extracted text
    return sorted(
        (r["url"], r["seq"], r["text"])
        for r in t.published().select("url", "seq", "text").collect()
    )


def _run_reference(spark, path, ops):
    t = ParquetLakeTable(spark, path, n_buckets=4)
    for _, fn in ops:
        fn(t)
    return _final_rows(t), t.committed_epochs()


def _recover_and_finish(spark, path, ops, crashed_at, ref_rows, ref_epochs, ctx):
    """The recovery contract: fresh handle (process restart), orphan GC,
    redeliver the crashed op (CDC at-least-once), run the rest, and land
    on the reference final state exactly."""
    rt = ParquetLakeTable(spark, path, n_buckets=4)
    rt.cleanup_orphans(grace_seconds=0.0)
    for _opname, fn in ops[crashed_at:]:
        fn(rt)
    assert _final_rows(rt) == ref_rows, ctx
    assert rt.committed_epochs() == ref_epochs, ctx


def run_crash_sweep(
    spark, base_dir, name, ops, crash_points, *, double_fault: bool = False
):
    """Run the sequence once per crash point; returns the number of
    interleavings exercised. Asserts the invariant lattice for each.
    ``double_fault``: for every primary crash, additionally sweep a
    SECOND crash through the recovery/redelivery path (state snapshotted
    per second-crash point) — recovery itself must be crash-safe."""
    ref_rows, ref_epochs = _run_reference(
        spark, os.path.join(base_dir, f"ref_{name}"), ops
    )
    exercised = 0
    for k in crash_points:
        path = os.path.join(base_dir, f"{name}_k{k}")
        t = ParquetLakeTable(spark, path, n_buckets=4)
        crashed_at = None
        with FsCrashInjector(k):
            try:
                for i, (_opname, fn) in enumerate(ops):
                    fn(t)
            except InjectedCrash:
                crashed_at = i
        if crashed_at is None:
            # k exceeded the sequence's total fs ops: clean run
            assert _final_rows(t) == ref_rows
            return exercised
        exercised += 1
        # 1. torn-read check: a fresh reader sees a consistent snapshot
        reader = ParquetLakeTable(spark, path, n_buckets=4)
        reader.published().count()  # must not raise
        if double_fault:
            for j in range(0, 500):
                pj = os.path.join(base_dir, f"{name}_k{k}_j{j}")
                shutil.copytree(path, pj)
                rt = ParquetLakeTable(spark, pj, n_buckets=4)
                second_at = None
                at = crashed_at  # crash inside cleanup → resume at same op
                with FsCrashInjector(j):
                    try:
                        rt.cleanup_orphans(grace_seconds=0.0)
                        for idx in range(crashed_at, len(ops)):
                            at = idx
                            ops[idx][1](rt)
                    except InjectedCrash:
                        second_at = at
                if second_at is None:
                    shutil.rmtree(pj, ignore_errors=True)
                    break  # recovery ran clean: j space exhausted
                exercised += 1
                ParquetLakeTable(spark, pj, n_buckets=4).published().count()
                # resume from the op IN PROGRESS at the second crash — a
                # recovery driver knows its position (replay_batches
                # resumes by committed_epochs the same way). Re-running
                # ALREADY-COMPLETED non-epoch admin ops (purge) after
                # later commits is not redelivery, it's a new request.
                _recover_and_finish(
                    spark, pj, ops, second_at, ref_rows, ref_epochs,
                    (name, k, j, second_at),
                )
                shutil.rmtree(pj, ignore_errors=True)
        # 2. recovery + roll-forward from the primary crash
        _recover_and_finish(
            spark, path, ops, crashed_at, ref_rows, ref_epochs, (name, k)
        )
    return exercised


_DEFAULT = ("merge_compact_merge", "wap_stage_publish")


@pytest.mark.parametrize(
    "name",
    [
        "merge_compact_merge",
        "wap_stage_publish",
        "rebucket_mid_stream",
        "purge_rtbf",
        "duplicate_delivery",
    ],
)
def test_crash_interleavings(spark, tmp_path, name):
    if name not in _DEFAULT and not os.environ.get("CRASH_FUZZ_FULL"):
        pytest.skip("full sweep via CRASH_FUZZ_FULL=1 / crash_fuzz_sweep.py")
    ops = _sequences(spark)[name]
    # sweep every crash point until the sequence runs clean
    n = run_crash_sweep(spark, str(tmp_path), name, ops, range(0, 500))
    assert n > 0
