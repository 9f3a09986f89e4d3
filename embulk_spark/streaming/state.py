"""Custom stateful streaming operator: per-url CDC state tracking via
``applyInPandasWithState`` (Arrow-batched, grouped state).

This is the streaming-native hot-state companion to the MOR lake table:
the state store holds one small record per url (latest (warc_ts, seq),
tombstone flag, event count) and each micro-batch emits a change-log row
per url whose winner CHANGED — i.e. the net effect of the batch, exactly
what a downstream cache/index invalidation feed wants. The lake table
remains the durable source of truth (html/text payloads never enter the
state store — state must stay small; the store scales with distinct
urls, not with events).

Embulk analogue: none (Embulk is stateless between tasks); this covers
the north star's "custom stateful operators" surface. Plugin-chain
analogue of a stateful filter stage
(/root/reference/embulk-core/src/main/java/org/embulk/spi/util/FiltersInternal.java:41-88),
but keyed and distributed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: state per url: ordering key + liveness + counters (fixed-width, tiny)
STATE_DDL = "ts_us LONG, seq LONG, is_deleted BOOLEAN, n_events LONG"

#: emitted whenever a batch touches a url (n_events advanced); downstream
#: invalidation feeds filter on winner_changed, counters read every row —
#: emitting only on winner change would undercount n_events when a batch
#: carries only losing (older) events for a url
OUT_DDL = (
    "url STRING, ts_us LONG, seq BIGINT, is_deleted BOOLEAN, "
    "n_events BIGINT, first_seen BOOLEAN, winner_changed BOOLEAN"
)


def _update_url_state(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold a url's micro-batch events into its state; emit one row per
    touched url (winner_changed marks actual advances). Pure function of
    (state, batch) — deterministic under retries, so exactly-once sinks
    stay exactly-once."""
    (url,) = key
    if state.exists:
        ts_us, seq, is_deleted, n_events = state.get
        first_seen = False
    else:
        ts_us, seq, is_deleted, n_events = -1, -1, False, 0
        first_seen = True

    changed = False
    n_before = n_events
    for pdf in pdf_iter:
        # vectorized winner of the batch slice: max (warc_ts, seq)
        if len(pdf) == 0:
            continue
        # unit-robust µs (pandas may hand datetime64[ns] or [us])
        ts = pdf["warc_ts"].to_numpy().astype("datetime64[us]").astype("int64")
        sq = pdf["seq"].to_numpy()
        ops = pdf["op"].to_numpy()
        n_events += len(pdf)
        beats_state = (ts > ts_us) | ((ts == ts_us) & (sq > seq))
        if beats_state.any():
            i = int(np.lexsort((sq, ts))[-1])  # argmax of (ts, seq)
            ts_us, seq = int(ts[i]), int(sq[i])
            is_deleted = ops[i] == "D"
            changed = True

    state.update((ts_us, seq, bool(is_deleted), int(n_events)))
    if n_events != n_before:
        yield pd.DataFrame(
            [
                {
                    "url": url,
                    "ts_us": ts_us,
                    "seq": seq,
                    "is_deleted": bool(is_deleted),
                    "n_events": int(n_events),
                    "first_seen": first_seen,
                    "winner_changed": changed,
                }
            ]
        )


def track_url_state(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    out_path: str,
    *,
    schema_ddl: str | None = None,
) -> None:
    """Tail the change stream and append the per-url winner change-log to
    ``out_path`` (availableNow; resumes from the checkpoint)."""
    from ..sources.events import EVENT_SCHEMA

    reader = (
        spark.readStream.schema(schema_ddl or EVENT_SCHEMA)
        .parquet(events_path)
        .filter("op <> 'S'")
        .select("url", "warc_ts", "seq", "op")
    )
    changes = reader.groupBy("url").applyInPandasWithState(
        _update_url_state,
        outputStructType=OUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_path)

    q = (
        changes.writeStream.outputMode("update")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def latest_state(spark: SparkSession, out_path: str) -> DataFrame:
    """Collapse the change-log to the current winner per url. n_events is
    strictly increasing per url across emitted rows (every emitted row saw
    ≥1 new event), so the lexicographically-largest (n_events, ts_us, seq)
    row IS the newest row — even when a loser-only batch repeated the
    winner's (ts_us, seq)."""
    from pyspark.sql import functions as F

    log = spark.read.parquet(out_path)
    pick = lambda c: F.max_by(c, F.struct("n_events", "ts_us", "seq"))
    return log.groupBy("url").agg(
        pick(F.col("ts_us")).alias("ts_us"),
        pick(F.col("seq")).alias("seq"),
        pick(F.col("is_deleted")).alias("is_deleted"),
        F.max("n_events").alias("n_events"),
    )
