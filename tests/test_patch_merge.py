"""Column-level CDC patch merge (minimal row images).

Pins patch_latest_per_key against a row-at-a-time python replay of the
same semantics (apply events in order; U patches non-null columns, D
wipes the row), plus the operator-level invariants the CDC path relies
on: duplicate-delivery idempotence and partitioning invariance.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from embulk_spark.operators.merge import patch_latest_per_key

SCHEMA = "k string, o1 int, o2 int, op string, a string, b int"


def _df(spark, rows, n_parts=1):
    df = spark.createDataFrame(rows, SCHEMA)
    return df.repartition(n_parts) if n_parts > 1 else df


def _by_key(df):
    return {r["k"]: r.asDict() for r in df.collect()}


def _replay(rows):
    """Sequential single-threaded oracle: apply in (o1, o2) order."""
    state: dict = {}
    for k, o1, o2, op, a, b in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        cur = state.setdefault(
            k, {"k": k, "a": None, "b": None, "is_deleted": False}
        )
        if op == "D":
            cur.update(a=None, b=None, is_deleted=True)
        else:
            cur["is_deleted"] = False
            if a is not None:
                cur["a"] = a
            if b is not None:
                cur["b"] = b
        cur["last_o1"], cur["last_o2"] = o1, o2
    return state


def test_per_column_latest_setter_wins(spark):
    rows = [
        ("u1", 1, 0, "U", "first-a", 10),
        ("u1", 2, 0, "U", None, 20),       # patches b only; a carries
        ("u1", 3, 0, "U", "third-a", None),  # patches a only; b carries
        ("u2", 1, 0, "U", "x", None),
    ]
    out = _by_key(patch_latest_per_key(_df(spark, rows), key="k", order=("o1", "o2")))
    assert out["u1"] == {
        "k": "u1", "a": "third-a", "b": 20,
        "is_deleted": False, "last_o1": 3, "last_o2": 0,
    }
    assert out["u2"]["a"] == "x" and out["u2"]["b"] is None


def test_delete_fences_and_rebuild(spark):
    rows = [
        ("gone", 1, 0, "U", "a", 1),
        ("gone", 2, 0, "D", None, None),
        ("back", 1, 0, "U", "old", 1),
        ("back", 2, 0, "D", None, None),
        ("back", 3, 0, "U", None, 9),  # rebuilds b only; a stays wiped
    ]
    out = _by_key(patch_latest_per_key(_df(spark, rows), key="k", order=("o1", "o2")))
    assert out["gone"]["is_deleted"] is True
    assert out["gone"]["a"] is None and out["gone"]["b"] is None
    assert out["back"] == {
        "k": "back", "a": None, "b": 9,
        "is_deleted": False, "last_o1": 3, "last_o2": 0,
    }


def test_second_order_column_breaks_ties(spark):
    rows = [
        ("k", 1, 5, "U", "late", None),
        ("k", 1, 2, "U", "early", 7),
        ("k", 1, 3, "D", None, None),  # delete between the two patches
    ]
    out = _by_key(patch_latest_per_key(_df(spark, rows), key="k", order=("o1", "o2")))
    assert out["k"]["a"] == "late" and out["k"]["b"] is None
    assert out["k"]["is_deleted"] is False


def test_duplicate_delivery_and_partitioning_invariant(spark):
    rng = random.Random(7)
    rows = []
    for i in range(600):
        k = f"u{rng.randrange(40)}"
        op = "D" if rng.random() < 0.15 else "U"
        a = f"v{i}" if op == "U" and rng.random() < 0.5 else None
        b = i if op == "U" and rng.random() < 0.5 else None
        rows.append((k, i, 0, op, a, b))
    want = _replay(rows)
    one = _by_key(patch_latest_per_key(_df(spark, rows), key="k", order=("o1", "o2")))
    assert one == want
    # ~duplicate delivery (whole batch twice) and different partitioning
    dup = _by_key(
        patch_latest_per_key(
            _df(spark, rows + rows, n_parts=7), key="k", order=("o1", "o2")
        )
    )
    assert dup == want


def test_payload_autodetect_and_op_passthrough(spark):
    rows = [("k", 1, 0, "U", "a", 3)]
    df = _df(spark, rows)
    out = patch_latest_per_key(df, key="k", order=("o1", "o2"))
    assert set(out.columns) == {"k", "a", "b", "is_deleted", "last_o1", "last_o2"}
    # explicit payload subset: other columns simply don't appear
    out2 = patch_latest_per_key(df, key="k", order=("o1", "o2"), payload=["b"])
    assert set(out2.columns) == {"k", "b", "is_deleted", "last_o1", "last_o2"}


def test_plan_is_one_partial_combined_agg(spark):
    rows = [("k", 1, 0, "U", "a", 3), ("k", 2, 0, "U", None, 4)]
    out = patch_latest_per_key(_df(spark, rows, n_parts=2), key="k", order=("o1", "o2"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one key shuffle (the fixture's own round-robin repartition aside)
    assert plan.count("hashpartitioning(k") == 1
    assert "partial" in plan.lower()  # map-side combine before it
