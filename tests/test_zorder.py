"""Z-order clustered compaction (streaming/zorder.py + cluster_mode).

Pins (1) the Morton key expression against a python reference, (2) the
end-to-end property that justifies the feature: with two independent
sort columns, a zorder-clustered base prunes files for predicates on
EITHER column while the lexicographic control prunes only the leading
one — and both layouts read back identical rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from embulk_spark.streaming.lake import ParquetLakeTable
from embulk_spark.streaming.zorder import (
    quantile_edges,
    validate_zorder_columns,
    with_z_column,
    z_value,
)


def _morton(a: int, b: int, bits: int) -> int:
    z = 0
    for j in range(bits):
        z |= ((a >> j) & 1) << (2 * j)
        z |= ((b >> j) & 1) << (2 * j + 1)
    return z


def test_z_value_matches_python_morton(spark):
    rows = [(a, b) for a in range(8) for b in range(8)]
    df = spark.createDataFrame(rows, "a long, b long")
    # edges 1..7 make bin(x) == x for x in [0, 8)
    edges = {"a": [float(i) for i in range(1, 8)],
             "b": [float(i) for i in range(1, 8)]}
    got = {
        (r["a"], r["b"]): r["_z"]
        for r in df.withColumn("_z", z_value(df, ["a", "b"], edges, bits=3))
        .collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _morton(a, b, 3), (a, b)
    # the write path's two-step (bin-materializing) form is bit-equal
    got2 = {
        (r["a"], r["b"]): r["_z"]
        for r in with_z_column(df, ["a", "b"], edges, bits=3).collect()
    }
    assert got2 == got


def test_quantile_edges_are_monotone_and_skew_adaptive(spark):
    # 90% of mass at 0 — rank binning must spend most edges inside the
    # hot region's boundary, not spread them over [0, 1000] evenly
    rows = [(0,)] * 900 + [(i,) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "a long")
    edges = quantile_edges(df, ["a"], bits=4)["a"]
    assert edges == sorted(edges)
    assert edges.count(0.0) >= len(edges) // 2


def _build(spark, path, mode):
    table = ParquetLakeTable(
        spark, path, n_buckets=2,
        stats_columns=("a", "b"), sort_columns=("a", "b"),
        cluster_mode=mode, compact_min_deltas=10_000,
    )
    table.add_column("a", "long")
    table.add_column("b", "long")
    n = 4000
    changes = spark.range(n).select(
        F.col("id").alias("seq"),
        F.lit("U").alias("op"),
        F.concat(F.lit("u://"), F.col("id")).alias("url"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.lit("en").alias("lang"),
        # two INDEPENDENT uniform dimensions
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(256)).alias("a"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(256)).alias("b"),
    )
    table.merge_epoch(changes, 0, extract=False)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        table.compact()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return table


def test_zorder_prunes_both_columns_range_only_leading(spark, tmp_path):
    zt = _build(spark, str(tmp_path / "z"), "zorder")
    rt = _build(spark, str(tmp_path / "r"), "range")

    za = zt.scan_plan([("a", "<", 32)])
    zb = zt.scan_plan([("b", "<", 32)])
    ra = rt.scan_plan([("a", "<", 32)])
    rb = rt.scan_plan([("b", "<", 32)])
    assert za["files_skipped"] > 0 and zb["files_skipped"] > 0
    assert ra["files_skipped"] > 0
    # lexicographic files span ~the full b range: nothing to skip
    assert rb["files_skipped"] == 0

    # both layouts are semantically identical to a plain filtered read
    for table in (zt, rt):
        for col in ("a", "b"):
            got = sorted(
                r["url"]
                for r in table.scan_where([(col, "<", 32)]).collect()
            )
            want = sorted(
                r["url"]
                for r in table.published().filter(F.col(col) < 32).collect()
            )
            assert got == want and len(got) > 0


def test_zorder_single_sort_column_falls_back_to_range(spark, tmp_path):
    # with one sort column zorder degenerates; the write takes the
    # lexicographic branch and still prunes on it
    table = ParquetLakeTable(
        spark, str(tmp_path / "t"), n_buckets=2,
        stats_columns=("lang",), sort_columns=("lang",),
        cluster_mode="zorder", compact_min_deltas=10_000,
    )
    changes = spark.range(400).select(
        F.col("id").alias("seq"),
        F.lit("U").alias("op"),
        F.concat(F.lit("u://"), F.col("id")).alias("url"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.concat(F.lit("l"), F.pmod(F.col("id"), F.lit(8))).alias("lang"),
    )
    table.merge_epoch(changes, 0, extract=False)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        table.compact()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    plan = table.scan_plan([("lang", "=", "l3")])
    assert plan["files_skipped"] > 0
    assert table.scan_where([("lang", "=", "l3")]).count() == 50


def test_cluster_mode_validated():
    with pytest.raises(ValueError, match="cluster_mode"):
        ParquetLakeTable(None, "/tmp/x", cluster_mode="hilbert")


def test_zorder_layout_fails_fast(spark, tmp_path):
    # a string sort column must be rejected at CONSTRUCTION, not hours
    # later when auto-maintenance first folds
    with pytest.raises(ValueError, match="unsupported type"):
        ParquetLakeTable(
            spark, str(tmp_path / "t1"), n_buckets=2,
            sort_columns=("lang", "seq"), cluster_mode="zorder",
        )
    # bit-budget overflow (11 cols x 6 bits > 63) also fails fast
    from pyspark.sql import types as T

    with pytest.raises(ValueError, match="bit budget"):
        validate_zorder_columns(
            T.StructType(), [f"c{i}" for i in range(11)]
        )
    # an add_column that would make a zorder sort column unquantizable
    # is rejected at DDL time
    table = ParquetLakeTable(
        spark, str(tmp_path / "t2"), n_buckets=2,
        sort_columns=("a", "seq"), cluster_mode="zorder",
    )
    with pytest.raises(ValueError, match="unsupported type"):
        table.add_column("a", "string")
    table.add_column("a", "long")  # numeric is fine


def test_patch_merge_rejects_map_payload(spark):
    from embulk_spark.operators.merge import patch_latest_per_key

    df = spark.createDataFrame(
        [("k", 1, "U", {"x": "1"})],
        "k string, o int, op string, m map<string,string>",
    )
    # auto-detect skips the non-orderable map column
    out = patch_latest_per_key(df, key="k", order=("o",))
    assert "m" not in out.columns
    # asking for it explicitly is a clear error, not an AnalysisException
    with pytest.raises(ValueError, match="non-orderable"):
        patch_latest_per_key(df, key="k", order=("o",), payload=["m"])


def test_cli_show_refuses_to_bootstrap(spark, tmp_path, capsys):
    from embulk_spark import cli

    missing = str(tmp_path / "no_such_table")
    assert cli.main(["show", missing, "--count"]) == 1
    assert "no lake table" in capsys.readouterr().err
    import os

    assert not os.path.exists(missing)  # nothing was created
