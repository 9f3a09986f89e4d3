"""Incremental-columns cursor scan — the embulk-input-jdbc ``incremental:
true`` contract (public plugin config: ``incremental_columns`` +
ConfigDiff ``last_record``) re-expressed over table-shaped inputs.

The reference's most-used input family resumes by remembering the last
``(updated_at, id)`` tuple and issuing ``WHERE (updated_at, id) >
(?, ?)`` ordered queries on the next run. The Spark-first shape:

- the resume predicate is the expanded lexicographic comparison
  ``c1 > v1 OR (c1 = v1 AND c2 > v2) OR ...`` of plain Column ops —
  Catalyst pushes it INTO the parquet scan (PushedFilters), so an
  incremental run over a 100 TB table reads only row groups whose
  min/max straddle the cursor, never the table;
- the next cursor is ONE agg — ``max(struct(cols))`` with map-side
  combine — not an ORDER BY (the reference needs ordered queries
  because it streams rows; a distributed scan just reduces).

``last_record`` values round-trip through the JSON ConfigDiff exactly
like the reference's (timestamps as ISO strings, cast back to the
column's own type here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cursor_predicate(df: DataFrame, cols: list[str], last: list) -> Column:
    """Lexicographic ``tuple(cols) > tuple(last)`` as pushdown-able
    Column ops. ``last`` values are cast to each column's own type (the
    ConfigDiff stores JSON scalars)."""
    if len(cols) != len(last):
        raise ValueError(
            f"last_record has {len(last)} values for {len(cols)} "
            f"incremental_columns"
        )
    lits = [
        F.lit(v).cast(df.schema[c].dataType) for c, v in zip(cols, last)
    ]
    # OR of per-position terms: position i contributes
    # (c0 = v0 AND ... AND c(i-1) = v(i-1) AND ci > vi) — each term is
    # pushdown-able on its own, so the scan prunes on the leading column
    pred = None
    for i, (c, lv) in enumerate(zip(cols, lits)):
        term = F.col(c) > lv
        for j in range(i):
            term = (F.col(cols[j]) == lits[j]) & term
        pred = term if pred is None else pred | term
    return pred


def incremental_scan(
    df: DataFrame,
    incremental_columns: list[str],
    last_record: list | None = None,
    *,
    compute_cursor: bool = True,
) -> tuple[DataFrame, dict]:
    """Rows strictly after ``last_record`` in ``incremental_columns``
    order, plus the next run's ConfigDiff (``{"last_record": [...]}``).

    The cursor advances only when rows qualify (an empty increment
    re-emits the old cursor, the reference's behavior); values serialize
    JSON-safe (timestamps → ISO strings). ``compute_cursor=False`` skips
    the max(struct) aggregation job entirely (preview/read-only paths
    that throw the ConfigDiff away must not pay a table scan for it)."""
    out = df
    if last_record is not None:
        out = df.filter(cursor_predicate(df, incremental_columns, last_record))
    if not compute_cursor:
        return out, {"last_record": list(last_record) if last_record else None}
    row = out.agg(
        F.max(F.struct(*[F.col(c) for c in incremental_columns])).alias("m")
    ).head()
    if row is None or row["m"] is None:
        diff = {"last_record": list(last_record) if last_record else None}
        return out, diff
    nxt = []
    for c, v in zip(incremental_columns, row["m"]):
        nxt.append(v.isoformat(sep=" ") if hasattr(v, "isoformat") else v)
    return out, {"last_record": nxt}
