"""Change-rate recrawl scheduling (operators/recrawl.py): inter-arrival
MLE, clamping band, single-observation default, overdue ratio, and
DuckDB-oracle parity on a literal change log."""

from __future__ import annotations

import datetime as dt

import duckdb

from embulk_spark.operators.recrawl import (
    recrawl_oracle_sql,
    recrawl_schedule,
)

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _changes_df(spark, rows):
    return spark.createDataFrame(rows, "url string, ts timestamp")


def _sched(spark, rows, **kw):
    out = recrawl_schedule(_changes_df(spark, rows), **kw)
    return {r.url: r for r in out.collect()}


def test_mle_interval_and_next_fetch(spark):
    # 3 changes over 4 h → interval = 2 h; horizon is u-fast's last ts
    rows = [
        ("u", T0),
        ("u", T0 + dt.timedelta(hours=1)),
        ("u", T0 + dt.timedelta(hours=4)),
        ("u-fast", T0 + dt.timedelta(hours=10)),
    ]
    got = _sched(spark, rows)["u"]
    assert got.n_changes == 3
    assert got.interval_sec == 2 * 3600.0
    assert got.next_fetch_at == T0 + dt.timedelta(hours=6)
    # 6 h unobserved / 2 h interval
    assert got.overdue_ratio == 3.0


def test_clamp_band_and_singleton(spark):
    rows = [
        # 2 changes 10 s apart → clamped UP to min (1 h)
        ("fast", T0),
        ("fast", T0 + dt.timedelta(seconds=10)),
        # 2 changes 30 d apart → clamped DOWN to max (7 d)
        ("slow", T0),
        ("slow", T0 + dt.timedelta(days=30)),
        # single observation → max interval
        ("once", T0),
    ]
    got = _sched(spark, rows)
    assert got["fast"].interval_sec == 3600.0
    assert got["slow"].interval_sec == 7 * 86400.0
    assert got["once"].interval_sec == 7 * 86400.0
    assert got["once"].next_fetch_at == T0 + dt.timedelta(days=7)


def test_custom_band(spark):
    rows = [("u", T0), ("u", T0 + dt.timedelta(seconds=30))]
    got = _sched(spark, rows, min_interval_sec=10, max_interval_sec=20)
    assert got["u"].interval_sec == 20.0  # 30 s MLE clamped to max 20


def test_oracle_parity_literal(spark):
    rows = [
        ("a", T0 + dt.timedelta(seconds=i * 7001, microseconds=123))
        for i in range(5)
    ] + [
        ("b", T0),
        ("b", T0 + dt.timedelta(days=2, seconds=1)),
        ("c", T0 + dt.timedelta(hours=3)),
    ]
    got = recrawl_schedule(_changes_df(spark, rows)).toPandas()
    vals = ", ".join(
        f"('{u}', TIMESTAMP '{ts}')" for u, ts in rows
    )
    want = duckdb.sql(
        recrawl_oracle_sql(
            f"SELECT * FROM (VALUES {vals}) AS t(url, ts)"
        )
    ).df()
    key = lambda df: sorted(
        tuple(str(v) for v in row)
        for row in df[sorted(df.columns)].itertuples(index=False)
    )
    assert sorted(got.columns) == sorted(want.columns)
    assert key(got) == key(want)
