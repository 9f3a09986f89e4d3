"""Change-rate recrawl scheduling — closing the CDC loop back into the
crawl: the lake's observed change history per url estimates how often
each page actually changes, and the estimate schedules the next fetch
(frequently-changing pages recrawl sooner). The revisit-policy shape
follows Cho & Garcia-Molina's "Effective Page Refresh Policies for Web
Crawlers" (TODS 2003): model page changes as a Poisson process and
derive the refresh interval from the estimated change rate. A CDC feed
observes the change *times* themselves (not sampled visit outcomes), so
the exponential inter-arrival MLE applies directly:

    interval = (last_change − first_change) / (n_changes − 1)

clamped to a [min, max] politeness/staleness band; a url seen only once
gets the max interval (nothing is known about its rate yet).

The reference has no crawl surface; its nearest shape is the
incremental-ingest cursor (reference
embulk-core/src/main/java/org/embulk/exec/BulkLoader.java:584-659 keeps
per-task committed state to decide what to process next run) — this is
the same "previous runs decide the next run's work" contract, lifted to
per-url fetch times.

All arithmetic is integer epoch-micros until the final display columns,
so the DuckDB oracle (generated from the same constants) is bit-equal:
span and interval are exact BIGINTs, `DIV` ≡ `//` on non-negatives, and
only the derived *_sec / ratio columns are doubles.

Scale shape: one per-url hash agg (map-side combine — count/min/max are
all partials) is the only shuffle over the O(changes) feed; the horizon
(observation end) is a broadcast 1-row aggregate, never a collect. The
output is O(urls) and joins straight into schedule_frontier's entry
side if a frontier refresh wants it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default politeness/staleness band (seconds)
DEFAULT_MIN_INTERVAL_SEC = 3600
DEFAULT_MAX_INTERVAL_SEC = 7 * 86400


def recrawl_schedule(
    changes: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    *,
    min_interval_sec: int = DEFAULT_MIN_INTERVAL_SEC,
    max_interval_sec: int = DEFAULT_MAX_INTERVAL_SEC,
) -> DataFrame:
    """Per-url refresh schedule from an observed change log.

    Returns (url, n_changes, first_change, last_change, interval_sec,
    next_fetch_at, overdue_ratio): ``interval_sec`` the clamped
    inter-arrival MLE, ``next_fetch_at`` = last_change + interval,
    ``overdue_ratio`` how many intervals have elapsed unobserved between
    last_change and the horizon (the feed's max timestamp — a broadcast
    1-row agg): ≥ 1 means the fetch is due, and ordering by it yields
    the refresh queue."""
    min_us = int(min_interval_sec) * 1_000_000
    max_us = int(max_interval_sec) * 1_000_000
    # NTZ sources (plain parquet timestamps) read as the session zone
    # (UTC everywhere here) — cast so unix_micros accepts either flavor
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per_url = changes.groupBy(F.col(url_col).alias("url")).agg(
        F.count(F.lit(1)).alias("n_changes"),
        F.min(ts_us).alias("first_us"),
        F.max(ts_us).alias("last_us"),
    )
    horizon = changes.agg(F.max(ts_us).alias("horizon_us"))
    interval_us = F.when(
        F.col("n_changes") >= 2,
        F.least(
            F.greatest(
                F.expr("(last_us - first_us) DIV (n_changes - 1)"),
                F.lit(min_us),
            ),
            F.lit(max_us),
        ),
    ).otherwise(F.lit(max_us))
    sched = per_url.crossJoin(F.broadcast(horizon)).withColumn(
        "interval_us", interval_us
    )
    return sched.select(
        "url",
        "n_changes",
        F.timestamp_micros(F.col("first_us")).alias("first_change"),
        F.timestamp_micros(F.col("last_us")).alias("last_change"),
        (F.col("interval_us") / F.lit(1_000_000.0)).alias("interval_sec"),
        F.timestamp_micros(F.col("last_us") + F.col("interval_us")).alias(
            "next_fetch_at"
        ),
        (
            (F.col("horizon_us") - F.col("last_us"))
            / F.col("interval_us").cast("double")
        ).alias("overdue_ratio"),
    )


def recrawl_oracle_sql(
    changes_sql: str,
    *,
    min_interval_sec: int = DEFAULT_MIN_INTERVAL_SEC,
    max_interval_sec: int = DEFAULT_MAX_INTERVAL_SEC,
) -> str:
    """DuckDB mirror of recrawl_schedule over an inline relation
    yielding (url, ts) — same integer-micros arithmetic, same clamp."""
    min_us = int(min_interval_sec) * 1_000_000
    max_us = int(max_interval_sec) * 1_000_000
    return f"""
WITH _rc_per_url AS (
  SELECT url, count(*) AS n_changes,
         min(epoch_us(ts)) AS first_us,
         max(epoch_us(ts)) AS last_us
  FROM ({changes_sql}) GROUP BY url
),
_rc_h AS (SELECT max(epoch_us(ts)) AS horizon_us FROM ({changes_sql})),
_rc AS (
  SELECT *, CASE WHEN n_changes >= 2
                 THEN least(greatest((last_us - first_us)
                                     // (n_changes - 1),
                                     {min_us}), {max_us})
                 ELSE {max_us} END AS interval_us
  FROM _rc_per_url CROSS JOIN _rc_h
)
SELECT url, n_changes,
       make_timestamp(first_us) AS first_change,
       make_timestamp(last_us) AS last_change,
       interval_us / 1000000.0 AS interval_sec,
       make_timestamp(last_us + interval_us) AS next_fetch_at,
       (horizon_us - last_us) / interval_us::DOUBLE AS overdue_ratio
FROM _rc
"""
