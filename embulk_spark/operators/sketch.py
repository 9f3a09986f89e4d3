"""Deterministic HyperLogLog cardinality sketch: mergeable per-group
distinct-count estimation whose registers — and estimate — are
bit-identical across engines and runs.

At 100 TB "how many distinct urls per source/day?" is a rollup you want
without a `count(distinct)` shuffle of the full key set per group: HLL
compresses each group's membership set into m = 2^p one-byte registers
(p=8 → 256 registers) that merge with `max` — so partial sketches
combine map-side, across epochs, and across tables, exactly like the
packed-long Bloom words (operators/bloom.py). Spark's built-in
`approx_count_distinct` is also HLL but its hash is engine-private;
this one pins the house md5 convention (operators/sample.py::
hash_uniform, operators/bloom.py::_position) so a DuckDB oracle —
and any other engine — reproduces every register and the estimate
EXACTLY, and an incremental (per-epoch merged) sketch is bit-equal to
the batch one.

No reference analogue (Embulk keeps no cross-run aggregate state,
reference exec/BulkLoader.java:299-306); SURVEY §2.10 curation surface.

Scale shape: ONE real shuffle — groupBy(group, bucket).max(rho) has
map-side partial combine, so at most |groups|·m rows cross the wire no
matter how many input rows; the second agg (registers → estimate) is
over that already-tiny frame. Nothing collects.

Determinism notes (why the estimate hash-matches, not just registers):
- hash = first 15 md5 hex chars (60 bits, never sign-extends);
  bucket = low p bits, w = high (60-p) bits.
- rho = leading-zero count of w within (60-p) bits, + 1 — computed as
  `(60-p) - length(bin(w)) + 1` (w > 0), identical in Spark and DuckDB.
- The harmonic sum Σ 2^-M_j is computed in INTEGER arithmetic at scale
  2^50 (terms `1 << (50 - least(M_j, 50))`, empty registers contribute
  2^50): a sum of exact longs has no float rounding, no ordering
  sensitivity. Only the final α·m²·2^50 / intsum happens in doubles —
  one expression, same literals, IEEE-identical everywhere.
- The standard small-range linear-counting correction (est ≤ 2.5m and
  some register still zero → m·ln(m/V)) IS applied: ln() is libm-
  specific in its last ulp, but its input domain here is the ≤ m
  rationals m/V, and tests/test_sketch.py asserts every one of them
  lands ≥ 1e-6 away from a floor(x+0.5) boundary — so the two engines'
  ln can disagree by ~1e-13 and still round identically. Verified
  determinism, not assumed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 60 hash bits total (15 md5 hex chars — fits a signed long exactly)
HASH_BITS = 60
#: integer scale for the harmonic sum: max term 2^50, m·2^50 ≤ 2^58 < 2^63
SUM_SCALE = 50


def _hash60(value: Column, salt: str) -> Column:
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), value.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def _alpha_expr(m: int) -> str:
    """The HLL bias constant α_m as ONE arithmetic expression evaluated
    from the same literals in every engine (never a pre-rounded float)."""
    return f"0.7213 / (1.0 + 1.079 / {m}.0)"


def hll_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    p: int = 8,
    salt: str = "hll",
) -> DataFrame:
    """Per-group register frame: one row per (group, bucket) that has at
    least one hit, with the max rank. This IS the mergeable sketch —
    union any number of these and re-run `groupBy(group, bucket).max`
    to combine (see ``hll_merge``); empty buckets are implicit zeros.
    """
    m = 1 << p
    w_bits = HASH_BITS - p
    h = _hash60(F.col(value_col), salt)
    w = F.shiftright(h, p)  # high bits — bitwise, never a double division
    # (a `/` here would round through a 53-bit double mantissa at 2^60)
    rho = (
        F.when(w == 0, F.lit(w_bits + 1))
        .otherwise(F.lit(w_bits) - F.length(F.bin(w)) + 1)
        .cast("int")
    )
    return (
        df.select(*group_cols, (h % m).cast("int").alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Combine register frames (same group/bucket schema): max wins.
    max is idempotent and commutative, so incremental (per-epoch) and
    batch sketches are bit-equal — the Bloom ``bit_or`` contract."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "rho"]
    return out.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(sketch: DataFrame, group_cols: list[str], *, p: int = 8) -> DataFrame:
    """Registers → per-group raw HLL estimate.

    Returns (group…, est_distinct long, zero_registers int, intsum long);
    ``intsum`` is the exact integer harmonic sum (the auditable part of
    the estimate), ``zero_registers`` feeds an optional caller-side
    linear-counting correction.
    """
    m = 1 << p
    term = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), {SUM_SCALE} - least(rho, {SUM_SCALE}))"
    )
    per_group = sketch.groupBy(*group_cols).agg(
        F.sum(term).alias("_present_sum"),
        F.count(F.lit(1)).alias("_present_buckets"),
    )
    intsum = (
        F.col("_present_sum")
        + (F.lit(m) - F.col("_present_buckets")) * F.lit(1 << SUM_SCALE)
    ).cast("long")
    raw = F.expr(
        f"CAST(floor({_alpha_expr(m)} * {m}.0 * {m}.0 "
        f"* CAST(shiftleft(CAST(1 AS BIGINT), {SUM_SCALE}) AS DOUBLE) "
        f"/ CAST(intsum AS DOUBLE) + 0.5) AS BIGINT)"
    )
    est = F.expr(
        f"CASE WHEN _raw <= {int(2.5 * m)} AND zero_registers > 0 "
        f"THEN CAST(floor({m}.0 * ln({m}.0 / zero_registers) + 0.5) AS BIGINT) "
        f"ELSE _raw END"
    )
    return (
        per_group.withColumn("intsum", intsum)
        .withColumn("zero_registers", (F.lit(m) - F.col("_present_buckets")).cast("int"))
        .withColumn("_raw", raw)
        .withColumn("est_distinct", est)
        .select(*group_cols, "est_distinct", "zero_registers", "intsum")
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    p: int = 8,
    salt: str = "hll",
) -> DataFrame:
    """groupBy(group).approx distinct ``value_col`` in one pass:
    sketch → estimate. Two aggs, but only the first sees the data."""
    return hll_estimate(
        hll_sketch(df, value_col, group_cols, p=p, salt=salt), group_cols, p=p
    )


def merge_register_dicts(*reg_dicts: dict) -> dict:
    """Driver-side register merge for manifest-resident sketches (the
    lake's cumulative url cardinality, streaming/lake.py): bucket → max
    rho. Keys may be str (JSON round-trip) or int; output keys are str
    so the result is JSON-stable."""
    out: dict[str, int] = {}
    for regs in reg_dicts:
        for k, v in (regs or {}).items():
            k = str(int(k))
            if v > out.get(k, 0):
                out[k] = int(v)
    return out


def estimate_from_registers(regs: dict, *, p: int = 8) -> int:
    """Pure-Python mirror of ``hll_estimate`` (same integer harmonic sum,
    same correction) for ≤ m-entry register dicts living in a snapshot
    manifest — a driver-side metric, so no engine-parity constraint, but
    the arithmetic is kept identical anyway."""
    import math

    m = 1 << p
    present = {int(k): int(v) for k, v in (regs or {}).items()}
    intsum = sum(1 << (SUM_SCALE - min(v, SUM_SCALE)) for v in present.values())
    intsum += (m - len(present)) * (1 << SUM_SCALE)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = int(math.floor(alpha * m * m * float(1 << SUM_SCALE) / float(intsum) + 0.5))
    zeros = m - len(present)
    if raw <= int(2.5 * m) and zeros > 0:
        return int(math.floor(m * math.log(m / zeros) + 0.5))
    return raw


def hll_oracle_sql(
    table_expr: str,
    value_sql: str,
    group_sql: list[str],
    *,
    p: int = 8,
    salt: str = "hll",
) -> str:
    """DuckDB SQL computing the identical sketch + estimate — generated
    from the SAME constants as the operator (single source of truth)."""
    m = 1 << p
    w_bits = HASH_BITS - p
    g = ", ".join(group_sql)
    return f"""
WITH h AS (
  SELECT {g},
         ('0x' || substr(md5('{salt}:' || CAST({value_sql} AS VARCHAR)), 1, 15))::bigint AS hv
  FROM {table_expr}
),
r AS (
  SELECT {g}, (hv % {m})::int AS bucket,
         CASE WHEN hv // {m} = 0 THEN {w_bits + 1}
              ELSE {w_bits} - length(bin(hv // {m})) + 1 END AS rho
  FROM h
),
regs AS (
  SELECT {g}, bucket, max(rho) AS rho FROM r GROUP BY ALL
),
sums AS (
  SELECT {g},
         (sum(1::bigint << ({SUM_SCALE} - least(rho, {SUM_SCALE}))::int)
          + ({m} - count(*)) * (1::bigint << {SUM_SCALE}))::bigint AS intsum,
         ({m} - count(*))::int AS zero_registers
  FROM regs GROUP BY ALL
),
raw AS (
  SELECT *, CAST(floor({_alpha_expr(m)} * {m}.0 * {m}.0
                  * CAST(1::bigint << {SUM_SCALE} AS DOUBLE)
                  / CAST(intsum AS DOUBLE) + 0.5) AS BIGINT) AS est_raw
  FROM sums
)
SELECT {g},
       CASE WHEN est_raw <= {int(2.5 * m)} AND zero_registers > 0
            THEN CAST(floor({m}.0 * ln({m}.0 / zero_registers) + 0.5) AS BIGINT)
            ELSE est_raw END AS est_distinct,
       zero_registers, intsum
FROM raw
"""
