"""Deterministic Count-Min sketch + heavy hitters: bounded-memory
frequency estimation for hot-key monitoring.

The north rule's skew story (salted repartition, AQE skew joins) needs
to KNOW the hot keys; at 10^10 events "count every url, sort by count"
is a full shuffle of the key universe. A Count-Min sketch compresses
the frequency table to d×w counters (d=4, w=2^14 → 512 KiB of longs)
that merge with ``+`` — the third leg of the sketch toolkit
(operators/bloom.py membership, operators/sketch.py cardinality), with
the same md5-position convention so every counter is engine-parity and
a DuckDB oracle replays the sketch exactly.

Guarantee (classic CM): est(x) ≥ true(x) always (never undercounts),
and est(x) ≤ true(x) + εN with prob 1-δ for ε = e/w, δ = e^-d — so
w=2^14, d=4 over-counts by ≲ 0.017% of the stream with ~98% confidence
per key. Point queries take min over the d rows.

Scale shape: build = explode d positions → ONE hash agg with map-side
partial ``sum`` combine onto ≤ d·w rows (the counter frame — constant
size at any input). Probe = explode the candidates' d positions →
broadcast join the counter frame → ``min`` agg back to one row per
candidate. The stream never shuffles on the raw key; the only
key-grained shuffle in ``heavy_hitters`` is over the already-filtered
candidate set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default geometry: 4 rows × 16384 counters
CMS_DEPTH = 4
CMS_WIDTH = 1 << 14


def _position(value: Column, row: int, width: int, salt: str) -> Column:
    """Counter column of hash row ``row``: first 15 md5 hex chars
    (60 bits, sign-safe) of ``salt{row}:value`` mod width — the
    operators/bloom.py position convention."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}{row}:"), value.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return (h % width).cast("int")


def cms_build(
    df: DataFrame,
    value_col: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """Counter frame (row, pos, cnt): ≤ depth·width rows whatever the
    input size. Merge sketches by union + re-sum (``cms_merge``);
    ``weight_col`` counts weighted occurrences (defaults to 1/row)."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    pos = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _position(F.col(value_col), i, width, salt).alias("pos"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rp"),
        w.alias("_w"),
    )
    return (
        pos.select("rp.row", "rp.pos", "_w")
        .groupBy("row", "pos")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Combine counter frames: + is commutative/associative, so partial
    (per-epoch) sketches merge to exactly the batch sketch."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "pos").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    value_col: str,
    keep_cols: list[str],
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = "cms",
) -> DataFrame:
    """Point-query each candidate row's ``value_col``: est_count = min
    over the d counters. The sketch broadcasts (constant size); the
    candidate set is whatever the caller prunes it to."""
    probe = candidates.select(
        *keep_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _position(F.col(value_col), i, width, salt).alias("pos"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rp"),
    ).select(*keep_cols, "rp.row", "rp.pos")
    return (
        probe.join(F.broadcast(sketch), ["row", "pos"], "left")
        .groupBy(*keep_cols)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    *,
    threshold: int,
    candidates: DataFrame | None = None,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = "cms",
) -> DataFrame:
    """Keys whose estimated frequency ≥ threshold, with their estimates
    — the hot-key report that sizes salting/skew handling.

    CM never undercounts, so NO true heavy hitter is missed (recall 1);
    rare over-count collisions can add false positives, which a caller
    needing exactness verifies with one exact count over this (tiny)
    over-threshold set.

    ``candidates`` is where the asymptotics live: default None
    enumerates ``df``'s distinct keys — a hash agg whose shuffle cost
    matches an exact count, fine for one-shot reports. The CDC shape is
    to pass THIS epoch's keys as candidates and ``cms_merge`` the
    per-epoch sketches: the probe then costs O(Δ) against counts
    accumulated over the WHOLE stream history, which no exact counter
    does without re-shuffling the history (see tests/test_cms.py
    incremental scenario)."""
    sketch = cms_build(df, value_col, depth=depth, width=width, salt=salt)
    cand = (
        candidates
        if candidates is not None
        else df.select(F.col(value_col).alias("key")).distinct()
    )
    est = cms_estimate(
        cand, sketch, "key", ["key"], depth=depth, width=width, salt=salt
    )
    return est.filter(F.col("est_count") >= threshold)


def cms_oracle_sql(
    table_expr: str,
    value_sql: str,
    *,
    threshold: int,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = "cms",
) -> str:
    """DuckDB mirror of heavy_hitters, generated from the same
    constants (single source of truth)."""
    return f"""
WITH pos AS (
  SELECT i AS row,
         (('0x' || substr(md5('{salt}' || i::varchar || ':' || CAST({value_sql} AS VARCHAR)), 1, 15))::bigint
          % {width})::int AS pos
  FROM {table_expr}, range({depth}) _rng(i)
),
sk AS (SELECT row, pos, count(*)::bigint AS cnt FROM pos GROUP BY 1, 2),
cand AS (SELECT DISTINCT CAST({value_sql} AS VARCHAR) AS key FROM {table_expr}),
probe AS (
  SELECT c.key, i AS row,
         (('0x' || substr(md5('{salt}' || i::varchar || ':' || c.key), 1, 15))::bigint
          % {width})::int AS pos
  FROM cand c, range({depth}) _rng(i)
),
est AS (
  SELECT p.key, min(coalesce(s.cnt, 0)) AS est_count
  FROM probe p LEFT JOIN sk s ON s.row = p.row AND s.pos = p.pos
  GROUP BY p.key
)
SELECT key, est_count FROM est WHERE est_count >= {threshold}
"""
