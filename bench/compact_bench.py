"""Maintenance-cost leg: full vs hot (partial) compaction under steady
churn against an established base, appended as a section to
BENCH/BASELINE.md.

The claim under test is the partial-compaction scale story
(streaming/lake.py::compact_hot). The CDC steady state at the 10^10-event
design point is a large base taking epochs that each touch a SMALL key
subset: a full fold then rewrites the whole base to retire a sliver of
pending rows, while hot mode binpacks the deduped remainder (never
touching the base) and folds a bucket's slice only once its cumulative
churn justifies the rewrite (delta rows ≥ compact_ratio × base slice).

Protocol: phase 1 builds an identical base in both tables (same events,
one explicit full compaction, auto-compaction suppressed) so the
comparison starts from the same bytes; phase 2 replays identical churn
epochs over ~1% of the key universe with auto-compaction on and the SAME
operational requirement — keep pending delta groups bounded at
min_deltas. Full mode can only satisfy it with whole-base folds
(compact_ratio=0 so its global gate actually fires at the bound — with
the default gate it just defers maintenance and lets read-amplification
grow); hot mode satisfies it with deduped binpacks, folding a base slice
only when a bucket's cumulative churn rivals it. We compare phase-2
maintenance bytes-rewritten and wall seconds from the snapshot metrics
and require the final published states to be row-identical.

Usage: python bench/compact_bench.py [--base-events N] [--churn-epochs K]
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
    ap.add_argument("--min-deltas", type=int, default=2)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from embulk_spark.session import get_spark
    from embulk_spark.sources.events import change_stream
    from embulk_spark.streaming.lake import ParquetLakeTable
    from embulk_spark.streaming.replay import replay_batches

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    spark = get_spark(
        "compact_bench", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf=(
            {"spark.local.dir": os.path.join(scratch, "spark_local")}
            if scratch else {}
        ),
    )
    work = tempfile.mkdtemp(prefix="compact_bench_", dir=scratch)

    # phase 1: the established base — 2 epochs over the full key universe
    base_path = os.path.join(work, "base_events")
    change_stream(
        spark, args.base_events, args.base_urls, 2,
        num_partitions=2 * args.cpus,
    ).write.partitionBy("epoch").parquet(base_path)
    base_events = spark.read.parquet(base_path)

    # phase 2: steady churn — epochs each touching ~1% of the universe
    # (url_of(i) is deterministic by index, so these ARE base urls)
    churn_path = os.path.join(work, "churn_events")
    change_stream(
        spark, args.churn_events, args.churn_urls, args.churn_epochs,
        num_partitions=2 * args.cpus,
    ).withColumn("seq", F.col("seq") + 100_000_000) \
     .withColumn("epoch", F.col("epoch") + 10) \
     .write.partitionBy("epoch").parquet(churn_path)
    churn_events = spark.read.parquet(churn_path)
    n_churn = churn_events.count()

    results = {}
    for mode in ("full", "hot"):
        tdir = os.path.join(work, f"table_{mode}")
        table = ParquetLakeTable(
            spark, tdir, n_buckets=args.buckets,
            compact_min_deltas=10**9,  # suppress auto-compaction in build
            # full mode's global row-ratio gate would indefinitely defer
            # maintenance under narrow churn; zero it so the group-count
            # bound is actually enforced (hot's per-bucket trigger keeps
            # its default — binpack satisfies the bound without base IO)
            compact_ratio=0.0 if mode == "full" else 1.0,
            compact_mode=mode,
        )
        replay_batches(table, base_events)
        table.compact()  # both modes start from an identical folded base
        v_base = table.current_snapshot()["version"]
        base_bytes = sum(
            f["bytes"] or 0 for f in table.files() if f["kind"] == "base"
        )

        table.compact_min_deltas = args.min_deltas
        t0 = time.perf_counter()
        replay_batches(table, churn_events)
        wall = time.perf_counter() - t0
        comps = [
            m for m in table.metrics_history()
            if m.get("compaction") and m["snapshot_version"] > v_base
        ]
        results[mode] = {
            "table": table,
            "base_bytes": base_bytes,
            "churn_seconds": round(wall, 2),
            "events_per_sec": round(n_churn / wall, 1),
            "n_compactions": len(comps),
            "maint_seconds": round(sum(m.get("seconds", 0) for m in comps), 2),
            "bytes_rewritten": sum(m.get("bytes_rewritten", 0) for m in comps),
            "partial_folds": sum(1 for m in comps if m.get("partial")),
            "pending_deltas": len(table.current_snapshot()["deltas"]),
            "pending_rows": sum(
                d.get("rows") or 0
                for d in table.current_snapshot()["deltas"]
            ),
        }

    # final states must be row-identical across modes
    a = results["full"]["table"].published().select("url", "seq")
    b = results["hot"]["table"].published().select("url", "seq")
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert diff == 0, f"full vs hot final state diverges: {diff} rows"

    ratio = (
        results["full"]["bytes_rewritten"]
        / max(1, results["hot"]["bytes_rewritten"])
    )
    lines = [
        "",
        "## Maintenance cost under steady churn: full vs hot (partial) "
        f"compaction (base {args.base_events:,} events / "
        f"{args.base_urls:,} urls ≈ {results['full']['base_bytes']:,} "
        f"bytes; churn {n_churn:,} events over {args.churn_urls:,} urls "
        f"× {args.churn_epochs} epochs; {args.buckets} buckets, "
        f"local[{args.cpus}], compact_min_deltas={args.min_deltas})",
        "",
        "| mode | compactions (partial) | maint bytes rewritten | "
        "maint seconds | churn events/sec | pending groups / rows |",
        "|---|---|---|---|---|---|",
    ]
    for mode in ("full", "hot"):
        r = results[mode]
        lines.append(
            f"| {mode} | {r['n_compactions']} ({r['partial_folds']}) | "
            f"{r['bytes_rewritten']:,} | {r['maint_seconds']} | "
            f"{r['events_per_sec']:,} | "
            f"{r['pending_deltas']} / {r['pending_rows']:,} |"
        )
    lines += [
        "",
        f"To hold the same pending-group bound, full compaction rewrote "
        f"**{ratio:.1f}×** the bytes hot mode did (final published states "
        "verified row-identical). Hot mode binpacks the deduped churn "
        "remainder — never touching base buckets whose cumulative churn "
        "is below compact_ratio × their slice — so its maintenance IO is "
        "O(churned keys) while each full fold pays O(base). The ratio "
        "scales linearly with base/churn size: at 10^9 live rows and "
        "10^5-url epochs it is ~10^4.",
    ]
    with open(args.out, "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
