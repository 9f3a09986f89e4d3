"""One-command round-record step (VERDICT r4 ask #10): the per-round
performance evidence cannot be skipped piecemeal when a single driver
produces all of it. Runs, in order, each as a subprocess so one leg's
session config can't leak into the next:

  1. bench.py                       — headline replay + per-query table
                                      (BENCH/ROUND_DIFF.md auto-diff)
  2. bench/scaling.py --capacity    — the 1-vs-4-core efficiency gate
  3. bench/flatness.py --clustered-buckets 3
                                    — the clustered-Δ O(Δ) flatness leg
  4. bench/sf1_leg.py               — 10× scale-up of the top-N queries
                                      PLUS the flagship replay (r4 ask 5)

Every leg appends/rewrites its own record (BENCH/BASELINE.md sections,
BENCH/SF1.json, BENCH/FLATNESS_CLUSTERED.json); this driver just
sequences them and stops on the first failure so a partial record is
obvious. Budget: ~50-70 min on an idle 32-core host — run it once with
the round's CLOSING engine.

Usage: python bench/record_round.py [--skip bench,scaling,flatness,sf1]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

LEGS = [
    ("bench", [sys.executable, os.path.join(REPO, "bench.py")]),
    ("scaling", [sys.executable, os.path.join(HERE, "scaling.py"),
                 "--capacity"]),
    # --events-per-epoch 120000 --n-buckets 64 pins the r4
    # clustered-leg protocol (window = 3/64 buckets ≈ 4.7% locality;
    # the defaults — 350k Δ over 3/32 buckets — are a different,
    # harsher design point whose gates are not cross-round comparable)
    ("flatness", [sys.executable, os.path.join(HERE, "flatness.py"),
                  "--clustered-buckets", "3",
                  "--events-per-epoch", "120000",
                  "--n-buckets", "64"]),
    ("sf1", [sys.executable, os.path.join(HERE, "sf1_leg.py")]),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="",
                    help="comma-separated leg names to skip")
    args = ap.parse_args()
    skip = {s.strip() for s in args.skip.split(",") if s.strip()}
    for name, cmd in LEGS:
        if name in skip:
            print(f"[record_round] SKIP {name}", flush=True)
            continue
        t0 = time.perf_counter()
        print(f"[record_round] RUN {name}: {' '.join(cmd)}", flush=True)
        r = subprocess.run(cmd, cwd=REPO)
        dt = round(time.perf_counter() - t0, 1)
        if r.returncode != 0:
            print(f"[record_round] FAIL {name} after {dt}s "
                  f"(rc={r.returncode}) — record is PARTIAL", flush=True)
            return r.returncode
        print(f"[record_round] OK {name} in {dt}s", flush=True)
    print("[record_round] complete", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
