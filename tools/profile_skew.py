"""Reproduce + profile the skew_hot50 high-parallelism replay leg.

Runs the same job as bench/scaling.py's 32-core leg with the Spark event
log on, then prints a per-stage breakdown (duration, task count, max/median
task time) so the serializing stage is visible. Usage:

    python tools/profile_skew.py [--cpus 32] [--events 8000000] [--hot 0.5]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--events", type=int, default=8_000_000)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--hot", type=float, default=0.5)
    ap.add_argument("--pipeline-depth", type=int, default=None)
    args = ap.parse_args()

    from embulk_spark.session import get_spark
    from embulk_spark.sources.events import change_stream
    from embulk_spark.streaming.lake import ParquetLakeTable
    from embulk_spark.streaming.replay import replay_batches

    evlog = f"/dev/shm/skew_evlog_{args.cpus}"
    shutil.rmtree(evlog, ignore_errors=True)
    os.makedirs(evlog, exist_ok=True)

    spark = get_spark(
        "profile_skew",
        master=f"local[{args.cpus}]",
        shuffle_partitions=32,
        extra_conf={
            "spark.local.dir": f"/dev/shm/spark_prof_{args.cpus}",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evlog,
        },
    )

    events_path = f"/dev/shm/prof_events_{args.hot}_{args.events}_{args.epochs}"
    if not os.path.isdir(events_path):
        t0 = time.perf_counter()
        change_stream(
            spark, args.events, args.events // 10, args.epochs,
            hot_frac=args.hot, num_partitions=64,
        ).write.partitionBy("epoch").mode("overwrite").parquet(events_path)
        print(f"gen: {time.perf_counter() - t0:.1f}s", flush=True)

    events = spark.read.parquet(events_path)
    n_total = events.count()

    # warm-up (same as scaling.py)
    warm_path = f"/dev/shm/prof_warm_{args.cpus}"
    shutil.rmtree(warm_path, ignore_errors=True)
    warm = ParquetLakeTable(spark, warm_path, n_buckets=32)
    replay_batches(warm, events, max_epochs=1)
    shutil.rmtree(warm_path, ignore_errors=True)

    table_path = f"/dev/shm/prof_table_{args.cpus}"
    shutil.rmtree(table_path, ignore_errors=True)
    table = ParquetLakeTable(spark, table_path, n_buckets=32)
    t0 = time.perf_counter()
    replay_batches(table, events, pipeline_depth=args.pipeline_depth)
    dt = time.perf_counter() - t0
    final_rows = table.published().count()
    print(
        f"TIMED replay: {dt:.2f}s  {n_total / dt:,.0f} ev/s  rows={final_rows}",
        flush=True,
    )
    t_mark = time.time() * 1000

    spark.stop()

    # ---- parse event log: stage durations + task-time skew ----
    stages: dict[int, dict] = {}
    tasks: dict[int, list] = {}
    log_files = []
    for root, _dirs, fns in os.walk(evlog):
        log_files += [os.path.join(root, fn) for fn in fns if "appstatus" not in fn]
    for fp in log_files:
        with open(fp) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                et = ev.get("Event")
                if et == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    stages[si["Stage ID"]] = {
                        "name": si["Stage Name"].split("\n")[0][:70],
                        "ntasks": si["Number of Tasks"],
                        "submit": si.get("Submission Time", 0),
                        "complete": si.get("Completion Time", 0),
                    }
                elif et == "SparkListenerTaskEnd":
                    ti = ev["Task Info"]
                    sid = ev["Stage ID"]
                    tasks.setdefault(sid, []).append(
                        ti["Finish Time"] - ti["Launch Time"]
                    )

    rows = []
    for sid, s in sorted(stages.items()):
        ts = sorted(tasks.get(sid, []))
        if not ts:
            continue
        dur = (s["complete"] - s["submit"]) / 1000
        rows.append((dur, sid, s, ts))
    rows.sort(reverse=True)
    print("\n== stages by wall duration (top 15) ==")
    print(f"{'dur_s':>7} {'sid':>4} {'n':>4} {'max_t':>7} {'p50_t':>7} {'sum_t':>8}  name")
    for dur, sid, s, ts in rows[:15]:
        print(
            f"{dur:7.2f} {sid:4d} {len(ts):4d} {max(ts)/1000:7.2f}"
            f" {ts[len(ts)//2]/1000:7.2f} {sum(ts)/1000:8.1f}  {s['name']}"
        )


if __name__ == "__main__":
    main()
