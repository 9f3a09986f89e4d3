"""Replication-cost leg: feed-driven replica sync vs full-copy rebuild
under steady churn, appended as a section to BENCH/BASELINE.md.

The claim under test is the lake-to-lake replication scale story
(streaming/replicate.py): once a replica has bootstrapped, each sync
costs O(change-set) — the feed range's net rows are written once, with
no re-dedup of the table and no re-extraction — while the naive
alternative (rewrite the replica from the source's published state, the
reference's per-destination bulk re-run shape,
exec/BulkLoader.java:318-370) pays O(table) per refresh regardless of
how little changed.

Protocol: phase 1 builds a compacted source and bootstraps the replica
from the first feed range (that range IS the whole table — bootstrap is
O(table) for any method). Phase 2 replays churn epochs touching ~1% of
the key universe; after each epoch we time one replicate_step and read
the replica-side bytes written from its commit metrics. The full-copy
comparison is measured once (rewrite a second replica from
source.published()) and counted once per sync, since that is what a
refresh schedule would pay. Final states are verified row-identical
across the replica, the copy, and the source.

Usage: python bench/replicate_bench.py [--base-events N] [--churn-epochs K]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-events", type=int, default=2_000_000)
    ap.add_argument("--base-urls", type=int, default=400_000)
    ap.add_argument("--churn-events", type=int, default=240_000)
    ap.add_argument("--churn-urls", type=int, default=4_000)
    ap.add_argument("--churn-epochs", type=int, default=6)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from embulk_spark.session import get_spark
    from embulk_spark.sources.events import change_stream
    from embulk_spark.streaming.lake import ParquetLakeTable
    from embulk_spark.streaming.replay import apply_epoch, replay_batches
    from embulk_spark.streaming.replicate import replicate_step

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    spark = get_spark(
        "replicate_bench", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf=(
            {"spark.local.dir": os.path.join(scratch, "spark_local")}
            if scratch else {}
        ),
    )
    work = tempfile.mkdtemp(prefix="replicate_bench_", dir=scratch)

    base_path = os.path.join(work, "base_events")
    change_stream(
        spark, args.base_events, args.base_urls, 2,
        num_partitions=2 * args.cpus,
    ).write.partitionBy("epoch").parquet(base_path)
    src = ParquetLakeTable(
        spark, os.path.join(work, "src"), n_buckets=args.buckets,
        compact_min_deltas=10**9,
    )
    replay_batches(src, spark.read.parquet(base_path))

    # bootstrap: the first range is the whole table — O(table) for ANY
    # replication method, so it is reported separately, not amortized.
    # The replica bootstraps BEFORE the source compacts (the feed serves
    # delta files; folding them into the base retires them from the
    # serving range — changes_between's documented contract). A replica
    # created after compaction starts from read() + a fresh cursor.
    rep = ParquetLakeTable(
        spark, os.path.join(work, "rep"), n_buckets=args.buckets,
        compact_min_deltas=10**9,
    )
    feed = os.path.join(work, "feed")
    t0 = time.perf_counter()
    replicate_step(src, rep, feed, prune=True)
    bootstrap_sec = time.perf_counter() - t0
    src.compact()  # cursor is at head — later ranges need only new epochs

    churn_path = os.path.join(work, "churn_events")
    change_stream(
        spark, args.churn_events, args.churn_urls, args.churn_epochs,
        num_partitions=2 * args.cpus,
    ).withColumn("seq", F.col("seq") + 100_000_000) \
     .withColumn("epoch", F.col("epoch") + 10) \
     .write.partitionBy("epoch").parquet(churn_path)
    churn = spark.read.parquet(churn_path)
    n_churn = churn.count()

    sync_secs, sync_bytes = [], 0
    for e in range(10, 10 + args.churn_epochs):
        apply_epoch(src, churn.filter(F.col("epoch") == e), e)
        t0 = time.perf_counter()
        replicate_step(src, rep, feed, prune=True)
        sync_secs.append(time.perf_counter() - t0)
    for m in rep.metrics_history():
        if m.get("replicated") and not m.get("empty_batch"):
            sync_bytes += m.get("delta_bytes", 0)
    # subtract the bootstrap range's bytes: steady-state accounting
    boot_bytes = next(
        m.get("delta_bytes", 0) for m in rep.metrics_history()
        if m.get("replicated")
    )
    steady_bytes = sync_bytes - boot_bytes

    # the naive alternative: rebuild a replica from the source's full
    # state — what a scheduled full refresh pays PER SYNC. Measured
    # GENEROUSLY: one bulk apply_changes of the merged state (no event
    # replay, no re-extraction) — still O(table)
    copy = ParquetLakeTable(
        spark, os.path.join(work, "copy"), n_buckets=args.buckets,
        compact_min_deltas=10**9,
    )
    t0 = time.perf_counter()
    copy.apply_changes(src.read(), 0)
    copy_sec = time.perf_counter() - t0
    copy_bytes = sum(
        m.get("delta_bytes", 0) for m in copy.metrics_history()
        if m.get("delta_bytes")
    )

    # row-identity across replica, copy, and source
    a = src.published().select("url", "seq")
    b = rep.published().select("url", "seq")
    c = copy.published().select("url", "seq")
    assert a.exceptAll(b).count() + b.exceptAll(a).count() == 0, "rep diverged"
    assert a.exceptAll(c).count() + c.exceptAll(a).count() == 0, "copy diverged"

    per_sync_sec = sum(sync_secs) / len(sync_secs)
    ratio_bytes = copy_bytes * args.churn_epochs / max(1, steady_bytes)
    lines = [
        "",
        "## Replication cost under steady churn: feed sync vs full-copy "
        f"rebuild (source {args.base_events:,} events / "
        f"{args.base_urls:,} urls, {args.buckets} buckets; churn "
        f"{n_churn:,} events over {args.churn_urls:,} urls × "
        f"{args.churn_epochs} epochs; local[{args.cpus}])",
        "",
        "| method | per-sync seconds | replica bytes written over "
        f"{args.churn_epochs} syncs | final state |",
        "|---|---|---|---|",
        f"| feed sync (replicate_step) | {per_sync_sec:.2f} | "
        f"{steady_bytes:,} | row-identical |",
        f"| full-copy rebuild | {copy_sec:.2f} | "
        f"{copy_bytes * args.churn_epochs:,} | row-identical |",
        "",
        f"Bootstrap (first range = whole table): {bootstrap_sec:.2f} s — "
        "O(table) for any method, paid once. Steady state, the feed "
        f"replica wrote **{ratio_bytes:.0f}× fewer bytes** than scheduled "
        "full refreshes and paid no extraction CPU (winner rows replicate "
        "as bytes). Per-sync cost is O(change-set): at a 100 TB source "
        "with 0.1%-per-epoch churn the gap is ~10^3 by construction.",
    ]
    with open(args.out, "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
