"""SCD Type-2 history build: a change stream folded into validity intervals.

The CDC counterpart of the lake's newest-wins MERGE (operators/merge.py):
instead of keeping only the latest version per key, keep EVERY distinct
version as a row with a ``[valid_from, valid_to)`` interval — the classic
slowly-changing-dimension shape a warehouse consumer expects from a
binlog tail. The reference has no history semantics at all (Embulk
overwrites or appends per run; resume replays whole tasks,
reference exec/BulkLoader.java:584-659) — this is the incremental-ingest
extension the north rule's lakehouse target implies.

Semantics:

- Events are ordered per key by ``(ts, tie-break)`` — the same total
  order the MERGE dedup uses (``(warc_ts, seq)`` there), so the SCD-2
  view and the latest-per-key table always agree on the current row.
- Consecutive events whose tracked attributes are unchanged are
  collapsed (a no-op update extends the current interval instead of
  opening a new version) — null-safe comparison, so NULL→NULL is "same"
  and NULL→value opens a version.
- ``valid_to`` of version *i* is ``valid_from`` of version *i+1*;
  the last version has ``valid_to = NULL`` and ``is_current = true``.
  Intervals are half-open ``[from, to)``.

Scale shape: one shuffle — everything is windows over the SAME
``partitionBy(key) orderBy(ts, tie)`` spec, so Catalyst plans a single
exchange (the change-detect lag, then lead/row_number on the collapsed
rows re-sort in place without re-partitioning). No joins, no driver
state; at 10^10 events this is the cost of one wide sort per key bucket,
and the change-detect filter shrinks the frame before the second window
runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    *,
    tie_cols: list[str] | None = None,
    collapse: bool = True,
) -> DataFrame:
    """Fold a change-event stream into SCD-2 version rows.

    Returns ``key_cols + attr_cols`` plus ``valid_from`` (= the event's
    ``ts_col``), ``valid_to`` (next version's ``valid_from``, NULL for
    the open version), ``version`` (1-based per key) and ``is_current``.

    ``tie_cols`` break equal-timestamp ordering deterministically (the
    ``seq`` of the CDC contract); ``collapse=False`` keeps no-op updates
    as distinct versions.
    """
    ties = tie_cols or []
    order = [F.col(ts_col), *[F.col(c) for c in ties]]
    w = Window.partitionBy(*key_cols).orderBy(*order)

    out = df
    if collapse:
        attrs = F.struct(*[F.col(c) for c in attr_cols])
        prev = F.lag(attrs).over(w)
        out = (
            out.withColumn("_chg", prev.isNull() | ~prev.eqNullSafe(attrs))
            .filter(F.col("_chg"))
            .drop("_chg")
        )
    nxt: Column = F.lead(F.col(ts_col)).over(w)
    return out.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        F.row_number().over(w).alias("version"),
        nxt.isNull().alias("is_current"),
    )
