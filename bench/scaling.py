"""Two-parallelism scaling evidence (sandbox realization of the north
rule's N vs 4N executors criterion — see BASELINE.md protocol).

Runs the SAME replay job on the SAME pre-generated input at local[8] and
local[32] (fresh JVM, fresh table + state each run), reports events/sec at
both plus efficiency = (tp_32 / tp_8) / (32/8). Also runs a hot-domain
skew variant (one host = 50% of events) to show the salted/bucketed merge
keeps efficiency above the 0.8 gate under skew.

Usage:  python bench/scaling.py [--events N] [--epochs K] [--out BENCH/BASELINE.md]
Each leg is executed as a subprocess with its own SparkSession so the JVM
thread pool really is 8 vs 32 threads.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LEG_SCRIPT = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from embulk_spark.session import get_spark
from embulk_spark.sources.events import change_stream
from embulk_spark.streaming.lake import ParquetLakeTable
from embulk_spark.streaming.replay import replay_batches

cpus = {cpus}
events_path = {events_path!r}
n_events, n_urls, n_epochs, hot = {n_events}, {n_urls}, {n_epochs}, {hot}
spark = get_spark("scaling_leg", master=f"local[{{cpus}}]",
                  shuffle_partitions=2*cpus,
                  extra_conf={{"spark.local.dir": f"/dev/shm/spark_scaling_{{cpus}}"}})
if not os.path.isdir(events_path):
    change_stream(spark, n_events, n_urls, n_epochs, hot_frac=hot,
                  num_partitions=64).write.mode("overwrite").parquet(events_path)
events = spark.read.parquet(events_path)
n_total = events.count()
table_path = f"/dev/shm/scaling_table_{{cpus}}_{hot}"
shutil.rmtree(table_path, ignore_errors=True)
table = ParquetLakeTable(spark, table_path, n_buckets=64)
t0 = time.perf_counter()
replay_batches(table, events)
dt = time.perf_counter() - t0
final_rows = table.published().count()
shutil.rmtree(table_path, ignore_errors=True)
print("LEGRESULT " + json.dumps({{"cpus": cpus, "events": n_total,
      "seconds": round(dt, 2), "events_per_sec": round(n_total/dt, 1),
      "final_rows": final_rows}}))
"""


def run_leg(cpus: int, events_path: str, n_events: int, n_urls: int,
            n_epochs: int, hot: float) -> dict:
    code = LEG_SCRIPT.format(
        repo=REPO, cpus=cpus, events_path=events_path, n_events=n_events,
        n_urls=n_urls, n_epochs=n_epochs, hot=hot,
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for line in out.stdout.splitlines():
        if line.startswith("LEGRESULT "):
            return json.loads(line[len("LEGRESULT "):])
    raise RuntimeError(f"leg cpus={cpus} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=400_000)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    args = ap.parse_args()
    n_urls = args.events // 10

    results: dict[str, dict] = {}
    for label, hot in (("zipf_hot20", 0.20), ("skew_hot50", 0.50)):
        events_path = f"/dev/shm/scaling_events_{label}_{args.events}"
        legs = {}
        for cpus in (8, 32):
            legs[cpus] = run_leg(cpus, events_path, args.events, n_urls,
                                 args.epochs, hot)
            print(label, legs[cpus], flush=True)
        eff = (legs[32]["events_per_sec"] / legs[8]["events_per_sec"]) / (32 / 8)
        results[label] = {"legs": legs, "efficiency": round(eff, 3)}

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    lines = [
        "# BENCH/BASELINE — measured throughput & scaling efficiency",
        "",
        "Protocol per `BASELINE.md`: same job, same pre-generated input, two",
        "local parallelism levels (local[8] vs local[32]; fresh JVM, fresh",
        "target table and state per leg; `spark.sql.shuffle.partitions` =",
        "2×cores; scratch on tmpfs so the sandbox's virtio-disk fsync stalls",
        "don't pollute the measurement). Efficiency = (tp_32/tp_8) / (32/8);",
        "gate ≥ 0.8.",
        "",
        f"- generated change stream: {args.events:,} base events"
        f" (+~5% duplicate deliveries), {args.epochs} epochs,"
        f" {n_urls:,} urls, full html payloads, text extraction on",
        "- job: epoch-by-epoch exactly-once MERGE replay into the bucketed",
        "  snapshot table (dedup → extract → merge → commit, per epoch)",
        "",
        "| variant | cpus | events | seconds | events/sec | final rows |",
        "|---|---|---|---|---|---|",
    ]
    for label, r in results.items():
        for cpus in (8, 32):
            leg = r["legs"][cpus]
            lines.append(
                f"| {label} | {cpus} | {leg['events']:,} | {leg['seconds']}"
                f" | {leg['events_per_sec']:,} | {leg['final_rows']:,} |"
            )
    lines += [
        "",
        "| variant | scaling efficiency (8→32 cores, ideal 4×) | gate ≥ 0.8 |",
        "|---|---|---|",
    ]
    for label, r in results.items():
        ok = "PASS" if r["efficiency"] >= 0.8 else "FAIL"
        lines.append(f"| {label} | {r['efficiency']} | {ok} |")
    lines += [
        "",
        "`zipf_hot20` is the standard stream (hottest host = 20% of events,",
        "Zipf(1.2) tail); `skew_hot50` concentrates 50% of all events on one",
        "host to stress hot-domain skew — the max_by hash-agg dedup (map-side",
        "partial combine) and salted bucket writes keep the merge balanced.",
        "",
        f"Generated {time.strftime('%Y-%m-%d %H:%M:%S')} on local[8]/local[32],"
        " 32-core host, 128 GiB.",
        "",
        "```json",
        json.dumps(results, indent=2),
        "```",
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
