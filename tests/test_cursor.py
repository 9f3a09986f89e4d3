"""Incremental-columns cursor scan (sources/cursor.py) — the
embulk-input-jdbc ``incremental: true`` resume contract."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from embulk_spark.pipeline import run
from embulk_spark.sources.cursor import cursor_predicate, incremental_scan


def _frame(spark):
    t = dt.datetime
    return spark.createDataFrame(
        [
            Row(updated_at=t(2026, 1, 1, 10), id=1, v="a"),
            Row(updated_at=t(2026, 1, 1, 10), id=2, v="b"),
            Row(updated_at=t(2026, 1, 2, 9), id=1, v="c"),
            Row(updated_at=t(2026, 1, 3, 8), id=5, v="d"),
        ]
    )


def test_cursor_first_run_and_resume(spark):
    df = _frame(spark)
    out, diff = incremental_scan(df, ["updated_at", "id"])
    assert out.count() == 4
    assert diff["last_record"] == ["2026-01-03 08:00:00", 5]
    # second run: nothing new → empty, cursor re-emitted unchanged
    out2, diff2 = incremental_scan(df, ["updated_at", "id"], diff["last_record"])
    assert out2.count() == 0
    assert diff2["last_record"] == diff["last_record"]


def test_cursor_tuple_semantics(spark):
    df = _frame(spark)
    # strictly-after (2026-01-01 10:00, 1): same-ts id=2 qualifies,
    # id=1 itself does not
    out, diff = incremental_scan(
        df, ["updated_at", "id"], ["2026-01-01 10:00:00", 1]
    )
    got = {(r.updated_at.isoformat(sep=" "), r.id) for r in out.collect()}
    assert got == {
        ("2026-01-01 10:00:00", 2),
        ("2026-01-02 09:00:00", 1),
        ("2026-01-03 08:00:00", 5),
    }
    assert diff["last_record"] == ["2026-01-03 08:00:00", 5]


def test_cursor_predicate_pushes_down(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    _frame(spark).write.parquet(p)
    df = spark.read.parquet(p)
    pred = cursor_predicate(df, ["updated_at", "id"], ["2026-01-02 00:00:00", 0])
    plan = df.filter(pred)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan" in plan


def test_cursor_via_pipeline_configdiff_loop(spark, tmp_path):
    src = str(tmp_path / "src.parquet")
    out_dir = str(tmp_path / "out1")
    _frame(spark).write.parquet(src)
    cfg = {
        "in": {
            "type": "parquet",
            "path": src,
            "incremental": True,
            "incremental_columns": ["updated_at", "id"],
        },
        "out": {"type": "file", "path_prefix": out_dir,
                "formatter": {"type": "csv"}},
    }
    diff = run(spark, cfg)
    assert diff["in"]["last_record"] == ["2026-01-03 08:00:00", 5]
    # append newer rows, re-run with the ConfigDiff: only the delta flows
    t = dt.datetime
    spark.createDataFrame(
        [Row(updated_at=t(2026, 1, 4, 7), id=9, v="e")]
    ).write.mode("append").parquet(src)
    cfg["out"]["path_prefix"] = str(tmp_path / "out2")
    diff2 = run(spark, cfg, config_diff=diff)
    assert diff2["in"]["last_record"] == ["2026-01-04 07:00:00", 9]
    import glob

    rows = []
    for f in glob.glob(str(tmp_path / "out2") + "/*.csv"):
        rows += [l for l in open(f).read().splitlines() if l and "updated_at" not in l]
    assert len(rows) == 1 and rows[0].endswith("e")


def test_cursor_predicate_exhaustive_small_domain(spark):
    """Every cursor over the 3×3 tuple domain: the Column predicate
    must agree with Python tuple comparison exactly (the reference's
    ORDER BY (a,b) WHERE (a,b) > (x,y) contract)."""
    rows = [(a, b) for a in range(3) for b in range(3)]
    df = spark.createDataFrame(rows, "a LONG, b LONG")
    for cur in rows:
        got = {
            (r.a, r.b)
            for r in df.filter(cursor_predicate(df, ["a", "b"], list(cur))).collect()
        }
        want = {t for t in rows if t > cur}
        assert got == want, cur
