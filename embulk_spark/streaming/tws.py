"""Per-url CDC state tracking on Spark 4's ``transformWithStateInPandas``
(the arbitrary-state v2 API: typed state variables, initial-state
bootstrap, optional state TTL).

Same contract as ``streaming.state`` (the ``applyInPandasWithState``
operator): the state store holds one tiny fixed-width record per url and
each micro-batch emits one change-log row per *touched* url. What the v2
API adds, and why it matters for the CDC engine at 10^10 events:

- **Initial-state bootstrap**: a new stream can warm-start its state from
  the lake table's current winners (``initialState=``), so a tracker
  deployed against an already-populated table does not mis-flag every
  known url as ``first_seen`` and does not regress winners behind rows
  the table already holds. With ``applyInPandasWithState`` the only
  options were replaying all history or accepting wrong flags.
- **State TTL**: with ``ttl_hours`` set, a url idle longer than the TTL
  is evicted by the store itself (RocksDB compaction-time filtering, no
  scan job). At web scale the active-url working set is a sliding
  window; TTL bounds state by *recently-touched* urls instead of all
  urls ever seen. Evicted urls that reappear are re-bootstrapped as
  ``first_seen`` — downstream consumers treat that as cache-refill, the
  lake table (durable truth) is unaffected.
- **RocksDB state store**: transformWithState requires the RocksDB
  provider — disk-backed state with changelog checkpointing, the store
  you want when state no longer fits the executor heap.

The fold itself is identical to ``state._update_url_state`` (max by
(warc_ts, seq), delete-stays-deleted via the winning op) so the two
operators are drop-in interchangeable; ``tests/test_tws.py`` pins output
parity on the same stream.

Embulk analogue: none (Embulk is stateless between tasks); north-star
"custom stateful operators" surface, v2.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from .state import OUT_DDL, STATE_DDL

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class UrlWinnerProcessor(StatefulProcessor):
    """Fold each url's micro-batch events into a winner ValueState; emit
    one change-log row per touched url (schema ``state.OUT_DDL``)."""

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._winner = handle.getValueState(
            "winner", STATE_DDL, ttlDurationMs=self._ttl_ms
        )

    def handleInitialState(
        self, key: tuple, initialState: pd.DataFrame, timerValues: TimerValues
    ) -> None:
        # One row per url from the lake's current winners: seed state,
        # emit nothing (bootstrap is not a change).
        row = initialState.iloc[0]
        ts_us = (
            np.datetime64(row["warc_ts"], "us").astype("int64")
            if "warc_ts" in initialState.columns
            else int(row["ts_us"])
        )
        self._winner.update(
            (int(ts_us), int(row["seq"]), bool(row["is_deleted"]), 0)
        )

    def handleInputRows(
        self,
        key: tuple,
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        (url,) = key
        prior = self._winner.get()
        if prior is not None:
            ts_us, seq, is_deleted, n_events = prior
            first_seen = False
        else:
            ts_us, seq, is_deleted, n_events = -1, -1, False, 0
            first_seen = True

        changed = False
        n_before = n_events
        for pdf in rows:
            if len(pdf) == 0:
                continue
            ts = pdf["warc_ts"].to_numpy().astype("datetime64[us]").astype("int64")
            sq = pdf["seq"].to_numpy()
            ops = pdf["op"].to_numpy()
            n_events += len(pdf)
            beats = (ts > ts_us) | ((ts == ts_us) & (sq > seq))
            if beats.any():
                i = int(np.lexsort((sq, ts))[-1])
                ts_us, seq = int(ts[i]), int(sq[i])
                is_deleted = ops[i] == "D"
                changed = True

        self._winner.update((ts_us, seq, bool(is_deleted), int(n_events)))
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

    def close(self) -> None:
        pass


def track_url_state_tws(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    out_path: str,
    *,
    schema_ddl: str | None = None,
    initial_state: DataFrame | None = None,
    ttl_hours: float | None = None,
) -> None:
    """Tail the change stream with the v2 stateful operator and append the
    per-url winner change-log to ``out_path`` (availableNow; resumes from
    the checkpoint).

    ``initial_state``: one row per url with columns
    ``url, warc_ts (or ts_us), seq, is_deleted`` — e.g. the lake table's
    published winners — consumed only when the checkpoint is fresh.
    ``ttl_hours``: evict urls idle longer than this (processing-time TTL).
    """
    import importlib.util

    from ..sources.events import EVENT_SCHEMA

    try:
        has_pb = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        has_pb = False
    if not has_pb:
        # the TWS Python worker speaks protobuf to the JVM state server;
        # fail fast with the remedy instead of a mid-query worker crash
        raise RuntimeError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(state-server protocol); install it or use "
            "streaming.state.track_url_state (v1, same contract)"
        )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)
    try:
        reader = (
            spark.readStream.schema(schema_ddl or EVENT_SCHEMA)
            .parquet(events_path)
            .filter("op <> 'S'")
            .select("url", "warc_ts", "seq", "op")
        )
        ttl_ms = int(ttl_hours * 3_600_000) if ttl_hours is not None else None
        changes = reader.groupBy("url").transformWithStateInPandas(
            statefulProcessor=UrlWinnerProcessor(ttl_ms=ttl_ms),
            outputStructType=OUT_DDL,
            outputMode="update",
            # TTL needs a clock; otherwise run clock-free like v1
            timeMode="processingTime" if ttl_ms is not None else "none",
            initialState=(
                initial_state.groupBy("url") if initial_state is not None else None
            ),
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
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
