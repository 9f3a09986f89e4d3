"""Gap-based sessionization: per-event session assignment and per-session
aggregation, batch and streaming.

The reference processes records independently and has no notion of event
time (its Timestamps are parse/format values, reference
spi/time/Timestamp.java:15-30); sessionization is part of the analytics
surface this engine adds over the change-event stream.

Session semantics match Spark's native ``session_window``: an event at
``t`` extends the current session iff ``t - prev_t <= gap`` (the window
a prior event opens is CLOSED at ``prev_t + gap``); only a strictly
larger gap starts a new session. Both operators and both DuckDB oracles
pin this same boundary rule (tests/test_cluster_sessions.py holds them
to agreement at exactly-``gap`` spacing).

Scale design:

- ``sessionize`` (per-event session ids) is one window spec —
  ``partitionBy(key).orderBy(ts, tiebreak)`` — carrying a lag-compare and
  a running sum: exactly one shuffle + per-partition sort, the minimum any
  per-event assignment can do. Hot keys serialize their own sort only
  (Spark sorts each key's run inside a partition; a single key's events
  stream through one task — for a key holding a material fraction of all
  events, pre-split by day/bucket first).
- ``session_stats`` (per-session rollup) uses the native
  ``F.session_window`` hash aggregation: map-side partial session merge,
  one shuffle on the key, and the SAME call works under Structured
  Streaming with a watermark (late events merge or open sessions exactly
  as Spark's stateful session-window operator defines), so the batch
  numbers and the streaming numbers cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Add ``session_idx`` (1-based per key, in time order) and
    ``session_id`` (globally unique ``key#idx``) to every row.
    ``tiebreak`` makes ordering total when two events share a timestamp."""
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            - F.unix_micros(prev_ts.cast("timestamp"))
            > gap_seconds * 1_000_000
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # F.concat, not concat_ws: a NULL key must yield a NULL session_id
    # (concat_ws would silently drop the key and emit the bare index,
    # colliding NULL-key sessions with each other; matches SQL ||)
    return df.withColumn("session_idx", F.sum(new_session).over(run)).withColumn(
        "session_id",
        F.concat(
            F.col(key).cast("string"), F.lit("#"),
            F.col("session_idx").cast("string"),
        ),
    )


def session_stats(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """One row per (key, session): start/end/duration/count plus any extra
    ``aggs``. Native ``session_window`` hash agg — streaming-capable with
    a watermark on ``ts_col``."""
    extra = aggs or {}
    out = (
        df.groupBy(
            F.col(key),
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds").alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            *[c.alias(n) for n, c in extra.items()],
        )
        .withColumn(
            "duration_sec",
            F.round(
                (
                    F.unix_micros(F.col("session_end").cast("timestamp"))
                    - F.unix_micros(F.col("session_start").cast("timestamp"))
                )
                / 1e6,
                6,
            ),
        )
    )
    return out.drop("sw")
