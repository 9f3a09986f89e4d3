"""Bin-bucketed interval join: exactness vs a naive range predicate."""

from __future__ import annotations

from pyspark.sql import functions as F

from embulk_spark.operators.ranges import interval_join


def _points(spark):
    # 200 deterministic points over [0, 1000)
    return spark.range(200).select(
        F.col("id").alias("pid"), ((F.col("id") * 37) % 1000).cast("double").alias("t")
    )


def _intervals(spark):
    # overlapping, nested, boundary-touching, and zero-length intervals
    rows = [
        (0, 0.0, 100.0),
        (1, 50.0, 150.0),      # overlaps 0
        (2, 60.0, 70.0),       # nested in 1
        (3, 100.0, 100.0),     # zero-length: matches nothing (half-open)
        (4, 999.0, 2000.0),    # extends past the data
        (5, 70.0, 71.0),       # narrower than the bin width
    ]
    return spark.createDataFrame(rows, "iid long, lo double, hi double")


def _naive(points, intervals):
    return points.crossJoin(intervals).filter(
        (F.col("t") >= F.col("lo")) & (F.col("t") < F.col("hi"))
    )


def test_matches_naive_cross_join(spark):
    got = interval_join(
        _points(spark), _intervals(spark),
        point_col="t", lo_col="lo", hi_col="hi", bin_width=64.0,
    )
    a = sorted((r.pid, r.iid) for r in got.select("pid", "iid").collect())
    b = sorted(
        (r.pid, r.iid)
        for r in _naive(_points(spark), _intervals(spark)).select("pid", "iid").collect()
    )
    assert a == b and len(a) > 0
    # each qualifying pair appears exactly once (single-bin meeting point)
    assert len(a) == len(set(a))


def test_half_open_boundaries(spark):
    pts = spark.createDataFrame([(1, 10.0), (2, 20.0)], "pid long, t double")
    iv = spark.createDataFrame([(7, 10.0, 20.0)], "iid long, lo double, hi double")
    got = interval_join(
        pts, iv, point_col="t", lo_col="lo", hi_col="hi", bin_width=5.0
    )
    assert [(r.pid, r.iid) for r in got.collect()] == [(1, 7)]  # lo in, hi out


def test_keys_restrict_matches(spark):
    pts = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 5.0)], "pid long, k string, t double"
    )
    iv = spark.createDataFrame(
        [(7, "a", 0.0, 10.0)], "iid long, k string, lo double, hi double"
    )
    got = interval_join(
        pts, iv, point_col="t", lo_col="lo", hi_col="hi",
        bin_width=8.0, keys=["k"],
    )
    assert [(r.pid, r.iid) for r in got.collect()] == [(1, 7)]


def test_broadcast_path_equals_shuffle_path(spark):
    a = interval_join(
        _points(spark), _intervals(spark),
        point_col="t", lo_col="lo", hi_col="hi", bin_width=30.0,
        broadcast_intervals=True,
    )
    b = interval_join(
        _points(spark), _intervals(spark),
        point_col="t", lo_col="lo", hi_col="hi", bin_width=30.0,
    )
    assert sorted(map(tuple, a.select("pid", "iid").collect())) == sorted(
        map(tuple, b.select("pid", "iid").collect())
    )
    # the broadcast variant plans a hash join on the bin key, not a
    # nested-loop range join
    plan = a._sc._jvm.PythonSQLUtils.explainString(
        a._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
