"""HyperLogLog sketch: engine-parity registers/estimate, mergeability,
and the incremental == batch contract."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from embulk_spark.operators.sketch import (
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_oracle_sql,
    hll_sketch,
)


def _docs(spark, n=3000, groups=3):
    return spark.range(n).select(
        (F.col("id") % groups).cast("int").alias("g"),
        # ~n/2 distinct values per group, with collisions across rows
        F.concat(F.lit("u"), (F.pmod(F.col("id") * 7919, F.lit(n // 2))).cast("string")).alias("v"),
    )


def test_estimate_matches_duckdb_oracle(spark):
    df = _docs(spark)
    got = {
        (r.g, r.est_distinct, r.zero_registers, r.intsum)
        for r in hll_distinct(df, "v", ["g"]).collect()
    }
    pdf = df.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    want = {
        tuple(r)
        for r in con.execute(
            hll_oracle_sql("t", "v", ["g"])
        ).fetchall()
    }
    assert got == want


def test_estimate_accuracy(spark):
    # raw HLL at p=8 has ~6.5% std error; allow 3 sigma
    df = _docs(spark, n=20000, groups=1)
    exact = df.select("v").distinct().count()
    est = hll_distinct(df, "v", ["g"]).collect()[0].est_distinct
    assert abs(est - exact) / exact < 0.2


def test_merge_is_bit_exact_with_batch(spark):
    df = _docs(spark, n=4000)
    parts = [df.filter(F.pmod(F.xxhash64("v"), F.lit(3)) == i) for i in range(3)]
    merged = hll_merge(*[hll_sketch(p, "v", ["g"]) for p in parts])
    batch = hll_sketch(df, "v", ["g"])
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, batch.collect()))
    # and therefore identical estimates
    em = {tuple(r) for r in hll_estimate(merged, ["g"]).collect()}
    eb = {tuple(r) for r in hll_estimate(batch, ["g"]).collect()}
    assert em == eb


def test_merge_idempotent_duplicate_delivery(spark):
    # re-delivering the same sketch (duplicate epoch) changes nothing
    df = _docs(spark, n=1000)
    s = hll_sketch(df, "v", ["g"])
    twice = hll_merge(s, s)
    assert sorted(map(tuple, twice.collect())) == sorted(map(tuple, s.collect()))


def test_empty_group_and_single_value(spark):
    # linear-counting regime: 1 value -> est = floor(256*ln(256/255)+0.5) = 1
    df = spark.createDataFrame([Row(g=0, v="only")])
    out = hll_distinct(df, "v", ["g"]).collect()
    assert len(out) == 1
    assert out[0].zero_registers == 255
    assert out[0].est_distinct == 1


def test_linear_counting_never_near_rounding_boundary():
    # The ln() in the small-range correction is the one libm-dependent
    # term; its whole input domain is m/V for V in 1..m. Assert every
    # possible output is far from a floor(x+0.5) boundary, so a 1-ulp
    # cross-engine ln() difference can never flip the estimate.
    import math

    m = 256
    for v in range(1, m + 1):
        x = m * math.log(m / v)
        frac = abs((x + 0.5) - round(x + 0.5))
        assert v == m or frac > 1e-6, (v, x)


@pytest.mark.parametrize("p", [4, 8, 12])
def test_plan_is_two_hash_aggs_no_extra_shuffle(spark, p):
    df = _docs(spark)
    plan = hll_distinct(df, "v", ["g"], p=p)._jdf.queryExecution().executedPlan().toString()
    # partial combine on the wide agg: at most 2 exchanges (bucket agg + group agg)
    assert plan.count("Exchange") <= 2
    assert "partial_max" in plan
