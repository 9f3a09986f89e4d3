"""Count-Min sketch: never-undercount guarantee, merge == batch,
incremental O(Δ) hot-key probe, DuckDB parity."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from embulk_spark.operators.cms import (
    cms_build,
    cms_estimate,
    cms_merge,
    cms_oracle_sql,
    heavy_hitters,
)


def _stream(spark, n=5000):
    # zipf-ish: key k appears ~ n/(k+1) times
    return spark.range(n).select(
        F.concat(F.lit("u"), F.floor(F.sqrt(F.col("id"))).cast("string")).alias("key")
    )


def test_never_undercounts_and_hot_keys_exact(spark):
    df = _stream(spark)
    exact = {r.key: r.cnt for r in df.groupBy("key").agg(F.count("*").alias("cnt")).collect()}
    hh = {r.key: r.est_count for r in heavy_hitters(df, "key", threshold=100).collect()}
    # recall 1: every key with true count >= threshold is present
    for k, c in exact.items():
        if c >= 100:
            assert k in hh and hh[k] >= c
    # at this width collisions are vanishingly unlikely: estimates exact
    assert all(hh[k] == exact[k] for k in hh if k in exact)


def test_merge_equals_batch(spark):
    df = _stream(spark, 3000)
    parts = [df.filter(F.pmod(F.xxhash64("key"), F.lit(3)) == i) for i in range(3)]
    merged = cms_merge(*[cms_build(p, "key") for p in parts])
    batch = cms_build(df, "key")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, batch.collect()))


def test_incremental_epoch_probe(spark):
    # the CDC shape: per-epoch sketches merged; THIS epoch's keys probed
    # against lifetime counts at O(epoch) cost
    e0 = _stream(spark, 2000)
    e1 = spark.createDataFrame([("u1",), ("u1",), ("brandnew",)], ["key"])
    lifetime = cms_merge(cms_build(e0, "key"), cms_build(e1, "key"))
    probe = cms_estimate(e1.distinct(), lifetime, "key", ["key"])
    got = {r.key: r.est_count for r in probe.collect()}
    true_u1 = e0.filter("key = 'u1'").count() + 2
    assert got["u1"] >= true_u1
    assert got["brandnew"] >= 1
    # weights: a weighted build counts the weight column
    w = spark.createDataFrame([("x", 10), ("x", 5)], ["key", "n"])
    sk = cms_build(w, "key", weight_col="n")
    est = cms_estimate(w.select("key").distinct(), sk, "key", ["key"])
    assert est.collect()[0].est_count == 15


def test_matches_duckdb_oracle(spark):
    df = _stream(spark, 2000)
    got = {tuple(r) for r in heavy_hitters(df, "key", threshold=50).collect()}
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = {tuple(r) for r in con.execute(
        cms_oracle_sql("t", "key", threshold=50)
    ).fetchall()}
    assert got == want


def test_sketch_size_is_bounded(spark):
    sk = cms_build(_stream(spark, 5000), "key")
    assert sk.count() <= 4 * (1 << 14)
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan  # map-side combine before the exchange
