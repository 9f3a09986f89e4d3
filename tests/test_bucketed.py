"""Bucketed co-located joins: the write-once-shuffle layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embulk_spark.sinks.files import register_bucketed, write_bucketed


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    a = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "t_a", str(tmp_path / "a"),
                   bucket_cols=["k"], n_buckets=8, sort_cols=["k"])
    write_bucketed(b, "t_b", str(tmp_path / "b"),
                   bucket_cols=["k"], n_buckets=8, sort_cols=["k"])
    try:
        j = spark.table("t_a").join(spark.table("t_b"), "k")
        plan = _plan(j)
        # the join is co-located: no shuffle on either side
        assert "Exchange" not in plan, plan
        assert j.count() == 2000

        # control: the same join over plain parquet shuffles both sides
        a.write.mode("overwrite").parquet(str(tmp_path / "pa"))
        b.write.mode("overwrite").parquet(str(tmp_path / "pb"))
        pj = spark.read.parquet(str(tmp_path / "pa")).join(
            spark.read.parquet(str(tmp_path / "pb")), "k"
        )
        assert "Exchange" in _plan(pj)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_a")
        spark.sql("DROP TABLE IF EXISTS t_b")


def test_register_bucketed_reattaches_layout(spark, tmp_path, no_broadcast):
    a = spark.range(500).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    write_bucketed(a, "t_reg", str(tmp_path / "r"),
                   bucket_cols=["k"], n_buckets=4)
    spark.sql("DROP TABLE t_reg")  # catalog forgets; files remain
    try:
        register_bucketed(
            spark, "t_reg", str(tmp_path / "r"), "k bigint, v int",
            bucket_cols=["k"], n_buckets=4,
        )
        # bucketed agg needs no exchange either
        g = spark.table("t_reg").groupBy("k").agg(F.sum("v"))
        assert "Exchange" not in _plan(g)
        assert spark.table("t_reg").count() == 500
    finally:
        spark.sql("DROP TABLE IF EXISTS t_reg")
