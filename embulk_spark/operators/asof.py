"""As-of (point-in-time) join: attach to each left row the latest right
row with ``right.ts <= left.ts`` for the same key.

Spark has no ASOF join operator (a naive range join explodes to
O(|L|·|R|) per key before picking the max); the reference has no joins at
all (Embulk filters are per-record, reference spi/FilterPlugin.java:15-35).
This is the union+ordered-carry-forward formulation:

1. union the two inputs on (key, ts) with a side tag,
2. one window ``partitionBy(key).orderBy(ts, side)`` computes
   ``last(right_payload, ignorenulls=True)`` over the unbounded-preceding
   frame — the right row "carries forward" to every later left row,
3. keep the left rows.

Cost: exactly one shuffle + one per-key ordered pass over |L|+|R| rows —
the same price as sessionize, and the best any per-event point-in-time
lookup can do without a pre-bucketed layout. Ties (equal timestamps) rank
the right row first, so the join is inclusive (``>=``), matching DuckDB's
``ASOF JOIN`` semantics, which oracle-checks this operator. Hot keys: the
per-key ordered pass runs in a single task per key; for a key holding a
material fraction of the stream, pre-partition by a coarse time bucket and
as-of join within buckets (carrying each bucket's last state forward).

``tolerance_seconds`` nulls the match when the right row is older than the
allowance (pandas ``merge_asof`` tolerance semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str | None = None,
    payload: list[str] | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of-backward join (``right_ts <= left_ts``, inclusive).

    ``payload`` — right columns to attach (default: all but key+ts); they
    must not collide with left column names. Right rows should be unique
    per (key, ts): among equal-timestamp right rows the carried one is
    otherwise unspecified."""
    right_ts = right_ts or left_ts
    payload = payload or [
        c for c in right.columns if c not in {on, right_ts}
    ]
    reserved = {"_ts", "_side", "_r", "asof_ts", "_match_ts"}
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload collides with left columns: {sorted(clash)}")
    held = reserved & set(left.columns)
    if held:
        raise ValueError(f"left columns collide with asof_join internals: {sorted(held)}")
    # the right payload is as reserved-sensitive as the left: 'asof_ts'
    # would duplicate the output column, '_match_ts' the carry struct field
    held_r = reserved & set(payload)
    if held_r:
        raise ValueError(
            f"right payload collides with asof_join internals: {sorted(held_r)}"
        )
    # a NULL-timestamp right row would sort NULLS FIRST and carry its
    # payload to every earlier left row; ASOF semantics (DuckDB, pandas
    # merge_asof) never match NULL ts
    right = right.filter(F.col(right_ts).isNotNull())

    r_struct = F.struct(
        F.col(right_ts).alias("_match_ts"), *[F.col(c) for c in payload]
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),  # right sorts before left at equal ts
        r_struct.alias("_r"),
    )
    l = left.select(
        *left.columns,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_r", ignorenulls=True).over(w)
    if tolerance_seconds is not None:
        carried = F.when(
            F.unix_micros(F.col("_ts").cast("timestamp"))
            - F.unix_micros(carried["_match_ts"].cast("timestamp"))
            <= int(tolerance_seconds * 1_000_000),
            carried,
        )
    out = u.withColumn("_hit", carried).filter(F.col("_side") == 1)
    return out.select(
        *left.columns,
        *[F.col("_hit")[c].alias(c) for c in payload],
        F.col("_hit")["_match_ts"].alias("asof_ts"),
    )
