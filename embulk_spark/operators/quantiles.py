"""Deterministic mergeable histogram → quantile estimation: the
distribution leg of the sketch toolkit (operators/bloom.py membership,
sketch.py cardinality, cms.py frequency — this adds SHAPE).

A corpus pipeline monitors distributions, not just counts: doc-length
p50/p95 per language, quality-score drift per epoch. At 10^10 rows an
exact quantile is a full sort; `percentile_approx` answers once but its
internal sketch is neither engine-portable nor unit-inspectable. A
fixed-edge histogram is: bin counts are exact integers, merge with
``+`` (per-epoch histograms fold into the all-history one, exactly like
the CMS counter frame), and the quantile estimate is a closed-form
linear interpolation any engine reproduces bit-for-bit from the same
edges — so the DuckDB oracle replays it end to end.

Accuracy is the usual histogram bound: an estimated quantile lands in
the true value's bin, i.e. error ≤ the local bin width. Callers pick
edges to taste (log-spaced for heavy-tailed lengths); edge choice is a
monitoring contract, not a tuning knob, which is exactly why the sketch
stays deterministic under merges and replays.

Scale shape: build = ONE hash agg with map-side partial ``sum`` combine
onto ≤ groups × (len(edges)-1) rows — constant output at any input
size, no sort anywhere. The rank window inside ``hist_quantiles`` runs
over the (tiny) histogram frame, never the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: log-spaced default edges for document character lengths (heavy tail)
LENGTH_EDGES = [0.0, 50.0, 100.0, 200.0, 400.0, 800.0, 1600.0, 3200.0]


def _edges_array(edges: list[float]):
    return F.array(*[F.lit(float(e)) for e in edges])


def _bin_of(value, edges: list[float]):
    """Bin index of ``value``: (#edges ≤ v) clamped to [1, m] then -1 —
    bin i covers [edges[i], edges[i+1]), outliers clamp into the end
    bins. Pure codegen'd HOF over a literal array (no UDF)."""
    m = len(edges) - 1
    n_le = F.size(
        F.filter(_edges_array(edges), lambda e: e <= value.cast("double"))
    )
    return (F.least(F.greatest(n_le, F.lit(1)), F.lit(m)) - 1).alias("bin")


def hist_build(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    edges: list[float] = LENGTH_EDGES,
) -> DataFrame:
    """Histogram frame (group..., bin, cnt). Merge per-epoch frames with
    :func:`hist_merge`; bins with zero count are simply absent."""
    return (
        df.select(*group_cols, _bin_of(F.col(value_col), edges))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(*sketches: DataFrame) -> DataFrame:
    """Combine histogram frames: + is commutative/associative, so
    per-epoch histograms merge to exactly the batch histogram."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    gcols = [c for c in out.columns if c not in ("cnt",)]
    return out.groupBy(*gcols).agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    hist: DataFrame,
    group_cols: list[str],
    qs: list[float],
    *,
    edges: list[float] = LENGTH_EDGES,
    decimals: int = 9,
) -> DataFrame:
    """Quantile estimates from a histogram frame: per group and q, the
    first bin whose cumulative count reaches q·N, linearly interpolated
    within the bin — est = lo + (hi-lo)·(q·N − cum_before)/cnt, rounded
    to ``decimals`` so cross-engine float rendering agrees. Returns
    (group..., q, n, est)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*group_cols)
    h = (
        hist.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("n", F.sum("cnt").over(wtot))
    )
    qdf = h.select(
        *group_cols, "bin", "cnt", "cum", "n",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    ).withColumn("target", F.col("q") * F.col("n"))
    first = (
        qdf.filter(F.col("cum") >= F.col("target"))
        .groupBy(*group_cols, "q")
        .agg(
            F.min_by(
                F.struct("bin", "cnt", "cum", "n", "target"), F.col("bin")
            ).alias("s")
        )
        .select(*group_cols, "q", "s.*")
    )
    earr = _edges_array(edges)
    lo = F.element_at(earr, F.col("bin") + 1)
    hi = F.element_at(earr, F.col("bin") + 2)
    est = lo + (hi - lo) * (F.col("target") - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
    return first.select(
        *group_cols, "q", "n", F.round(est, decimals).alias("est")
    )


def length_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    qs: list[float],
    *,
    edges: list[float] = LENGTH_EDGES,
) -> DataFrame:
    """build + estimate in one call — the one-shot report shape."""
    return hist_quantiles(
        hist_build(df, value_col, group_cols, edges=edges),
        group_cols, qs, edges=edges,
    )


def quantiles_oracle_sql(
    table_expr: str,
    value_sql: str,
    group_sql: list[str],
    qs: list[float],
    *,
    edges: list[float] = LENGTH_EDGES,
    decimals: int = 9,
) -> str:
    """DuckDB mirror of length_quantiles, generated from the same edges
    and q list (single source of truth, the cms_oracle_sql convention)."""
    m = len(edges) - 1
    elist = ", ".join(repr(float(e)) for e in edges)
    qlist = ", ".join(repr(float(q)) for q in qs)
    gsel = ", ".join(group_sql)
    return f"""
WITH binned AS (
  SELECT {gsel},
         least(greatest(len(list_filter([{elist}],
               e -> e <= CAST({value_sql} AS DOUBLE))), 1), {m}) - 1 AS bin
  FROM {table_expr}
),
hist AS (
  SELECT {gsel}, bin, count(*)::bigint AS cnt FROM binned GROUP BY ALL
),
cum AS (
  -- ::bigint: sum(BIGINT) widens to HUGEINT, which a pandas fetch
  -- floatifies (70 -> 70.0) and a strict value-hash then rejects
  -- against Spark's int64 ``n`` output column (the r04 driver-gate
  -- failure mode on substring_dedup/corpus_export/token_packing)
  SELECT *, sum(cnt) OVER (PARTITION BY {gsel} ORDER BY bin)::bigint AS cum,
            sum(cnt) OVER (PARTITION BY {gsel})::bigint AS n
  FROM hist
),
probe AS (
  SELECT c.*, q.q, q.q * c.n AS target
  FROM cum c, (SELECT unnest([{qlist}]) AS q) q
),
first AS (
  SELECT * EXCLUDE rn FROM (
    SELECT *, row_number() OVER (PARTITION BY {gsel}, q ORDER BY bin) AS rn
    FROM probe WHERE cum >= target) WHERE rn = 1
)
SELECT {gsel}, q, n,
       round([{elist}][bin + 1]
             + ([{elist}][bin + 2] - [{elist}][bin + 1])
               * (target - (cum - cnt)) / cnt, {decimals}) AS est
FROM first
"""
