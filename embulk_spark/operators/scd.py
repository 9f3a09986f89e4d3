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


def scd2_join(
    facts: DataFrame,
    dim: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    how: str = "inner",
    broadcast_dim: bool = False,
    dim_prefix: str = "",
) -> DataFrame:
    """Temporal (as-of) join of a fact stream against an SCD-2 dimension:
    each fact row picks THE dimension version valid at its ``ts_col``
    (``valid_from <= ts < valid_to``, open ``valid_to`` = current).

    Scale shape: because a key's versions PARTITION time, the range
    predicate matches at most one version — so this stays a plain
    hash equi-join on ``keys`` with a post-join validity filter (fan-out
    bounded by versions-per-key, typically a handful), never a
    nested-loop range join. ``broadcast_dim`` for dimension-sized
    histories skips the shuffle entirely. ``how='left'`` keeps facts
    predating every version (dim columns null). ``dim_prefix``
    namespaces dimension attributes on collisions."""
    if how not in ("inner", "left"):
        raise ValueError("scd2_join supports how='inner'|'left'")
    fact_cols = set(facts.columns)
    clash = [
        c for c in dim.columns if c not in keys and (dim_prefix + c) in fact_cols
    ]
    if clash:
        raise ValueError(
            f"dimension columns {clash} collide with fact columns — "
            f"pass dim_prefix to namespace them"
        )
    renamed = dim.select(
        *[F.col(k).alias(f"__d_{k}") for k in keys],
        *[F.col(c).alias(dim_prefix + c) for c in dim.columns if c not in keys],
    )
    side = F.broadcast(renamed) if broadcast_dim else renamed
    cond = None
    for k in keys:
        eq = facts[k] == side[f"__d_{k}"]
        cond = eq if cond is None else cond & eq
    vf = F.col(dim_prefix + "valid_from")
    vt = F.col(dim_prefix + "valid_to")
    valid = (F.col(ts_col) >= vf) & (vt.isNull() | (F.col(ts_col) < vt))
    if how == "inner":
        return facts.join(side, cond, "inner").filter(valid).drop(
            *[f"__d_{k}" for k in keys]
        )
    # left: validity must live in the join condition, not a post-filter
    return facts.join(side, cond & valid, "left").drop(
        *[f"__d_{k}" for k in keys]
    )
