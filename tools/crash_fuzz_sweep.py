"""Full crash-interleaving sweep → FUZZCHECK.json (committed evidence).

Reuses the harness in tests/test_crash_fuzz.py (injector + invariant
assertions) and extends the sequence table with the longer lattice
paths (schema DDL, branches, delete/update, many-epoch streams) so the
committed run covers 1000+ distinct (sequence, crash-point)
interleavings. Each interleaving asserts: no torn reads after the
crash, and recovery + redelivery reaches the uninterrupted run's exact
final state.

Usage: python tools/crash_fuzz_sweep.py [out.json]
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from test_crash_fuzz import _events, _sequences, run_crash_sweep  # noqa: E402

from embulk_spark.session import get_spark  # noqa: E402


def _extra_sequences(spark):
    from embulk_spark.streaming.lake import ParquetLakeTable  # noqa

    def ev(e):
        return _events(spark, e)

    return {
        "many_epochs_autocompact": [
            (f"merge{e}", (lambda e: lambda t: t.merge_epoch(ev(e), e))(e))
            for e in range(1, 6)
        ]
        + [("compact", lambda t: t.compact())],
        "schema_evolution": [
            ("merge1", lambda t: t.merge_epoch(ev(1), 1)),
            ("addcol", lambda t: t.add_column("rank", "double")),
            ("merge2", lambda t: t.merge_epoch(ev(2), 2)),
            ("rename", lambda t: t.rename_column("rank", "prio")),
            ("compact", lambda t: t.compact()),
        ],
        "delete_update_where": [
            ("merge1", lambda t: t.merge_epoch(ev(1), 1)),
            (
                "delete",
                lambda t: t.delete_where(
                    "url = 'http://h2.example/p2'", 50
                ),
            ),
            ("merge2", lambda t: t.merge_epoch(ev(2), 2)),
            ("compact", lambda t: t.compact()),
        ],
        "branch_fast_forward": [
            ("merge1", lambda t: t.merge_epoch(ev(1), 1)),
            ("mkbranch", lambda t: t.create_branch("audit", if_not_exists=True)),
            ("merge2b", lambda t: t.branch("audit").merge_epoch(ev(2), 2)),
            ("ff", lambda t: t.fast_forward("audit")),
            ("merge3", lambda t: t.merge_epoch(ev(3), 3)),
        ],
        "stage_abort_restage": [
            ("merge1", lambda t: t.merge_epoch(ev(1), 1)),
            ("stage2", lambda t: t.merge_epoch(ev(2), 2, stage=True)),
            ("abort2", lambda t: t.abort_staged(2)),
            ("stage2b", lambda t: t.merge_epoch(ev(2), 2, stage=True)),
            ("publish2", lambda t: t.publish_staged(2)),
        ],
    }


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "FUZZCHECK.json"
    )
    spark = get_spark(
        "crash_fuzz_sweep", master="local[8]", shuffle_partitions=4
    )
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    base = tempfile.mkdtemp(prefix="crash_fuzz_", dir=scratch)
    seqs = dict(_sequences(spark))
    seqs.update(_extra_sequences(spark))
    report = {
        "generated_at": datetime.datetime.now().isoformat(
            timespec="seconds"
        ),
        "sequences": {},
        "total_interleavings": 0,
        "failures": 0,
    }
    t0 = time.time()
    for name, ops in seqs.items():
        t1 = time.time()
        try:
            n = run_crash_sweep(
                spark, base, name, ops, range(0, 2000), double_fault=True
            )
            report["sequences"][name] = {
                "interleavings": n,
                "ok": True,
                "seconds": round(time.time() - t1, 1),
            }
            report["total_interleavings"] += n
        except Exception as e:  # a sequence failure must not kill the sweep
            report["sequences"][name] = {
                "ok": False,
                "error": f"{type(e).__name__}: {e}"[:500],
            }
            report["failures"] += 1
        print(
            f"{name}: {report['sequences'][name]}",
            flush=True,
        )
    report["total_seconds"] = round(time.time() - t0, 1)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({
        "total_interleavings": report["total_interleavings"],
        "failures": report["failures"],
    }))
    return 1 if report["failures"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
