"""Merkle anti-entropy replica diff (operators/merkle.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from embulk_spark.operators.merkle import leaf_digests, replica_diff


def _tbl(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_identical_replicas_diff_empty(spark):
    rows = [(i, f"v{i}") for i in range(500)]
    a, b = _tbl(spark, rows), _tbl(spark, list(reversed(rows)))
    assert replica_diff(a, b, "k", ["v"]).count() == 0


def test_digests_partitioning_and_order_independent(spark):
    rows = [(i, f"v{i}") for i in range(300)]
    a = _tbl(spark, rows)
    b = _tbl(spark, list(reversed(rows))).repartition(13)
    da = {r.leaf: (r.digest, r.n_rows) for r in leaf_digests(a, "k", ["v"]).collect()}
    db = {r.leaf: (r.digest, r.n_rows) for r in leaf_digests(b, "k", ["v"]).collect()}
    assert da == db


def test_divergence_localized_to_leaves(spark):
    rows = [(i, f"v{i}") for i in range(2000)]
    a = _tbl(spark, rows)
    # replica b: one modified row, one missing row, one extra row
    brows = [(k, ("CORRUPT" if k == 7 else v)) for k, v in rows if k != 1234]
    brows.append((99999, "extra"))
    b = _tbl(spark, brows)
    div = replica_diff(a, b, "k", ["v"]).collect()
    # each broken key lands in its own leaf (4096 leaves, 3 keys):
    # expect 2..3 divergent leaves (hash collisions merely merge them)
    assert 1 <= len(div) <= 3
    # the count channel sees the missing/extra rows
    assert any(r.n_a != r.n_b for r in div)
    # every divergent leaf's digests disagree or counts disagree
    for r in div:
        assert r.digest_a != r.digest_b or r.n_a != r.n_b
    # total rows covered by divergent leaves is a tiny fraction of the
    # table — the repair-shipping bound
    assert sum(max(r.n_a, r.n_b) for r in div) < 0.02 * len(rows)


def test_value_change_without_count_change_detected(spark):
    rows = [(i, f"v{i}") for i in range(100)]
    a = _tbl(spark, rows)
    b = _tbl(spark, [(k, ("X" if k == 50 else v)) for k, v in rows])
    div = replica_diff(a, b, "k", ["v"]).collect()
    assert len(div) == 1
    assert div[0].n_a == div[0].n_b  # counts agree — digest caught it


def test_multi_value_columns(spark):
    a = spark.createDataFrame(
        [(1, "x", 10), (2, "y", 20)], "k long, v string, w long"
    )
    b = spark.createDataFrame(
        [(1, "x", 10), (2, "y", 21)], "k long, v string, w long"
    )
    div = replica_diff(a, b, "k", ["v", "w"]).collect()
    assert len(div) == 1
