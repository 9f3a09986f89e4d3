"""Watermarked stream-stream enrichment join.

The change stream often isn't the only live feed: the crawler also emits
a FETCH log (url, fetch_ts, status, latency) on its own cadence. Joining
them batch-side would mean landing both first; the streaming join
enriches in flight.

Why this shape survives 10^10 events: a stream-stream join's state store
holds every row until the OTHER side's watermark proves no future match
can arrive. An unbounded join condition would buffer both streams
forever; the equi-key (url) plus an explicit EVENT-TIME RANGE
(``fetch_ts ∈ [warc_ts - within, warc_ts]``) lets Spark evict state as
the watermarks advance — per-key state is bounded by the ``within``
horizon × arrival rate, never by stream length. The url equi-condition
also keeps the physical plan a hash-partitioned streaming join (both
sides shuffle on url once), not a broadcast-nested-loop over time.

Semantics (reference analogue: Embulk has no joins — this is north-rule
"enrichment before the sink" territory): each change event picks up the
fetch records observed in the ``within`` window ENDING at its warc_ts —
the fetches that produced/preceded the change. ``left_outer`` keeps
changes with no fetch record (nulls on the fetch side), emitted once the
fetch watermark passes the window, which is the Spark-supported outer
form (the outer side must be the watermarked stream whose state expiry
proves the non-match).

Column-name hygiene: both sides carry ``url``; the fetch side is
prefixed ``f_`` before the join so downstream code never sees ambiguous
attributes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FETCH_SCHEMA = (
    "url STRING, fetch_ts TIMESTAMP, status INT, latency_ms DOUBLE"
)


def _fetch_prefixed(fetches: DataFrame) -> DataFrame:
    return fetches.select(
        [F.col(c).alias(f"f_{c}") for c in fetches.columns]
    )


def join_condition(within: str):
    """The equi-key + event-time-range condition shared by the streaming
    and batch forms (one definition, so the pytest batch oracle and the
    stream can't drift)."""
    return (
        (F.col("url") == F.col("f_url"))
        & (F.col("f_fetch_ts") >= F.col("warc_ts") - F.expr(f"INTERVAL {within}"))
        & (F.col("f_fetch_ts") <= F.col("warc_ts"))
    )


def enrich_changes(
    changes: DataFrame,
    fetches: DataFrame,
    *,
    within: str = "24 hours",
    join_type: str = "inner",
) -> DataFrame:
    """Batch form of the enrichment join — also the oracle for the
    streaming form (identical condition via :func:`join_condition`)."""
    return changes.join(
        _fetch_prefixed(fetches), join_condition(within), join_type
    ).drop("f_url")


def stream_enrich_changes(
    spark: SparkSession,
    events_path: str,
    fetch_path: str,
    checkpoint_dir: str,
    out_path: str,
    *,
    within: str = "24 hours",
    watermark: str = "1 minute",
    join_type: str = "inner",
    events_schema_ddl: str | None = None,
    fetch_schema_ddl: str = FETCH_SCHEMA,
) -> None:
    """Tail two parquet directories as streams and write the enriched
    change events append-only to ``out_path``.

    Both sides are watermarked: the join needs the fetch watermark to
    close a change's window (and, for ``left_outer``, to certify a
    non-match), and the change watermark to evict buffered fetch rows.
    APPEND mode: each enriched row is emitted exactly once, when the
    watermarks prove its match set complete — idempotent on restart via
    the checkpoint, like every other sink here."""
    from ..sources.events import EVENT_SCHEMA

    if join_type not in ("inner", "left_outer"):
        raise ValueError(
            "stream-stream enrichment supports inner or left_outer "
            f"(got {join_type!r})"
        )
    changes = (
        spark.readStream.schema(events_schema_ddl or EVENT_SCHEMA)
        .parquet(events_path)
        .withWatermark("warc_ts", watermark)
    )
    fetches = _fetch_prefixed(
        spark.readStream.schema(fetch_schema_ddl).parquet(fetch_path)
    ).withWatermark("f_fetch_ts", watermark)
    joined = changes.join(fetches, join_condition(within), join_type).drop(
        "f_url"
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
