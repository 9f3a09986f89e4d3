"""embulk-output-jdbc mode semantics on the manifest-versioned parquet
table: the six modes' contracts, atomic publication, duplicate-txn
skips, coercion-to-table-definition, and the merge path's
carry-cold-buckets-by-reference scale property."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from embulk_spark.sinks.jdbc_modes import JdbcModeTable, cleanup_orphans


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string, score double")


@pytest.fixture()
def base(spark):
    return _df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)])


def test_insert_appends_transactionally(spark, tmp_path, base):
    t = JdbcModeTable(spark, str(tmp_path / "t"))
    t.write(base, "insert", txn_id="run-1")
    t.write(_df(spark, [(4, "d", 4.0)]), "insert", txn_id="run-2")
    assert t.load().count() == 4
    # a retried transactional run is skipped (resumed-transaction rule)
    r = t.write(_df(spark, [(4, "d", 4.0)]), "insert", txn_id="run-2")
    assert r["skipped_duplicate_txn"] and t.load().count() == 4
    # insert_direct skips the bookkeeping: same txn_id applies again
    t.write(_df(spark, [(5, "e", 5.0)]), "insert_direct", txn_id="run-2")
    assert t.load().count() == 5


def test_truncate_insert_preserves_table_definition(spark, tmp_path, base):
    t = JdbcModeTable(spark, str(tmp_path / "t"))
    t.write(base, "insert")
    # incoming frame: extra column, missing column, castable id
    inc = spark.createDataFrame(
        [("7", "g", True), ("8", "h", False)], "id string, name string, extra boolean"
    )
    t.write(inc, "truncate_insert")
    out = t.load()
    assert out.schema.simpleString() == base.schema.simpleString()
    assert {r["id"] for r in out.collect()} == {7, 8}
    assert all(r["score"] is None for r in out.collect())


def test_replace_rederives_schema(spark, tmp_path, base):
    t = JdbcModeTable(spark, str(tmp_path / "t"))
    t.write(base, "insert")
    inc = spark.createDataFrame([(1, "x")], "k long, v string")
    t.write(inc, "replace")
    out = t.load()
    assert [f.name for f in out.schema] == ["k", "v"]
    assert out.count() == 1


def test_merge_upserts_and_carries_cold_buckets(spark, tmp_path):
    t = JdbcModeTable(spark, str(tmp_path / "t"), n_buckets=8)
    big = spark.range(0, 400).select(
        F.col("id"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
        F.col("id").cast("double").alias("score"),
    )
    t.write(big, "merge", merge_keys=["id"])
    leaves_before = set(t._manifest()["leaves"])

    # a small change-set: update 3 rows, insert 2 new
    inc = _df(
        spark,
        [(1, "one", -1.0), (2, "two", -2.0), (3, "three", -3.0),
         (1000, "k", 0.5), (1001, "l", 0.6)],
    )
    t.write(inc, "merge", merge_keys=["id"])
    out = t.load()
    assert out.count() == 402
    got = {r["id"]: r["name"] for r in out.filter("id in (1,2,3,1000)").collect()}
    assert got == {1: "one", 2: "two", 3: "three", 1000: "k"}

    # scale contract: buckets the change-set does not hash into carry
    # into the new manifest BY REFERENCE (same leaf paths, never copied)
    leaves_after = set(t._manifest()["leaves"])
    carried = leaves_before & leaves_after
    assert carried, "cold buckets must carry by reference"
    hot = {r["bkt"] for r in inc.withColumn(
        "bkt", F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(8))
    ).select("bkt").distinct().collect()}
    assert len(leaves_before) - len(carried) == len(hot)


def test_merge_direct_and_missing_keys(spark, tmp_path, base):
    t = JdbcModeTable(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError):
        t.write(base, "merge")
    t.write(base, "merge_direct", merge_keys=["id"])
    t.write(_df(spark, [(3, "c2", 9.0)]), "merge_direct", merge_keys=["id"])
    out = {r["id"]: r["name"] for r in t.load().collect()}
    assert out == {1: "a", 2: "b", 3: "c2"}


def test_crash_leaves_table_intact_and_cleanup(spark, tmp_path, base):
    path = str(tmp_path / "t")
    t = JdbcModeTable(spark, path)
    t.write(base, "insert")
    v1_rows = t.load().count()
    # simulate a crash mid-stage: files written, manifest never committed
    orphan_leaves, _ = t._stage(_df(spark, [(9, "z", 9.9)]), None)
    assert t.load().count() == v1_rows  # readers never see the orphan
    removed = cleanup_orphans(path)
    assert removed == orphan_leaves
    assert t.load().count() == v1_rows
    # live groups survive cleanup
    assert cleanup_orphans(path) == []


def test_history_records_every_commit(spark, tmp_path, base):
    t = JdbcModeTable(spark, str(tmp_path / "t"))
    t.write(base, "insert", txn_id="a")
    t.write(base.withColumn("score", F.lit(0.0)), "truncate_insert", txn_id="b")
    hist = t.history()
    assert [h["version"] for h in hist] == [1, 2]
    assert hist[1]["txns"] == ["a", "b"]

def test_reopened_handle_repins_n_buckets(spark, tmp_path):
    """A handle reopened with a different n_buckets must adopt the
    manifest's layout: staging with the constructor's value while merge
    pruning uses the manifest's would carry conflicting keys by
    reference without reading them (silent stale duplicates)."""
    path = str(tmp_path / "t")
    t8 = JdbcModeTable(spark, path, n_buckets=8)
    big = spark.range(0, 400).select(
        F.col("id"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
        F.col("id").cast("double").alias("score"),
    )
    t8.write(big, "merge", merge_keys=["id"])

    # reopen with a DIFFERENT constructor bucket count and keep writing
    t16 = JdbcModeTable(spark, path, n_buckets=16)
    t16.write(_df(spark, [(7, "seven", -7.0)]), "insert")
    assert t16.n_buckets == 8  # re-pinned from the manifest
    t16.write(_df(spark, [(7, "SEVEN", 70.0)]), "merge", merge_keys=["id"])

    out = t16.load()
    assert out.count() == 400  # no duplicate id anywhere
    assert out.groupBy("id").count().filter("count > 1").count() == 0
    assert {r["name"] for r in out.filter("id = 7").collect()} == {"SEVEN"}
    # every bucketed leaf in the live manifest is within the pinned layout
    man = t16._manifest()
    assert man["n_buckets"] == 8
    bkts = {
        int(lf.rsplit("bkt=", 1)[1])
        for lf in man["leaves"]
        if "bkt=" in lf
    }
    assert bkts and max(bkts) < 8


def test_replace_records_caller_merge_keys(spark, tmp_path, base):
    """replace re-creates the table: the committed merge_keys must be
    the caller's (matching the staged bucketing), not the old
    manifest's."""
    t = JdbcModeTable(spark, str(tmp_path / "t"))
    t.write(base, "merge_direct", merge_keys=["id"])
    inc = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    t.write(inc, "replace", merge_keys=["k"])
    assert t._manifest()["merge_keys"] == ["k"]
    # subsequent merges on the new keys behave (no silent dupes)
    t.write(
        spark.createDataFrame([(2, "Y2"), (3, "z")], "k long, v string"),
        "merge",
        merge_keys=["k"],
    )
    out = {r["k"]: r["v"] for r in t.load().collect()}
    assert out == {1: "x", 2: "Y2", 3: "z"}
