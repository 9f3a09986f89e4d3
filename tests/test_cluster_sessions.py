"""Duplicate clustering, sessionization, and as-of join.

Oracle discipline mirrors the reference's vanilla-run suites
(embulk-ruby/test/vanilla/run-test.rb:1-35): every algorithmic operator is
pinned against an independent computation — hand-enumerated components
here, DuckDB window/ASOF SQL in the driver contract."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from embulk_spark.operators.asof import asof_join
from embulk_spark.operators.cluster import (
    connected_components,
    dup_clusters,
    keep_canonical,
)
from embulk_spark.operators.sessions import session_stats, sessionize


def _ts(minute: int, second: int = 0):
    return datetime.datetime(2024, 1, 1, 0, minute, second)


# ---------------------------------------------------------------------------
# connected components / keep-one dedup


def test_connected_components_chain_and_island(spark):
    # chain 1-2-3-4 (diameter 3) + island 10-11; 5 never appears
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {
        (r.id, r.component)
        for r in connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_connected_components_merges_across_pair_order(spark):
    # components found regardless of which side the smaller id is on
    pairs = spark.createDataFrame(
        [(7, 3), (3, 9), (20, 9)], "id_a long, id_b long"
    )
    got = {(r.id, r.component) for r in connected_components(pairs).collect()}
    assert got == {(3, 3), (7, 3), (9, 3), (20, 3)}


def test_dup_clusters_and_keep_canonical(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base, 10),
            (2, base + " tail", 99),  # near-dup of 1, longer
            (3, "completely different content about spark shuffles here", 50),
            (4, base + " tail", 99),  # exact dup of 2
        ],
        "doc_id long, text string, n_chars int",
    )
    comps = dup_clusters(docs, "text", "doc_id", k=16, bands=8, threshold=0.3)
    labels = {r.doc_id: r.component for r in comps.collect()}
    assert labels.keys() == {1, 2, 4} and len(set(labels.values())) == 1
    kept = keep_canonical(docs, comps, "doc_id", prefer=["n_chars"])
    # winner: max (n_chars, doc_id) -> doc 4; singleton doc 3 survives
    assert {r.doc_id for r in kept.collect()} == {3, 4}


def test_keep_canonical_without_prefer_uses_id(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    comps = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id long, component long"
    )
    kept = keep_canonical(docs, comps, "doc_id")
    assert {r.doc_id for r in kept.collect()} == {2, 3}


# ---------------------------------------------------------------------------
# sessionization


def test_sessionize_gap_boundary_matches_session_window(spark):
    # gaps: 59s (same session), exactly 60s (same — inclusive boundary,
    # matching session_window), 61s (new session)
    rows = [
        ("u", _ts(0, 0)),
        ("u", _ts(0, 59)),
        ("u", _ts(1, 59)),  # +60s -> extends (window closes AT prev+gap)
        ("u", _ts(3, 0)),  # +61s -> new session
        ("v", _ts(0, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {
        (r.user_id, r.ts): r.session_idx
        for r in sessionize(df, "user_id", "ts", 60).collect()
    }
    assert got == {
        ("u", _ts(0, 0)): 1,
        ("u", _ts(0, 59)): 1,
        ("u", _ts(1, 59)): 1,
        ("u", _ts(3, 0)): 2,
        ("v", _ts(0, 0)): 1,
    }
    # native session_window agrees on the session count per key
    stats = session_stats(df, "user_id", "ts", 60)
    per_key = {
        r.user_id: r.n
        for r in stats.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_key == {"u": 2, "v": 1}


def test_session_stats_values(spark):
    df = spark.createDataFrame(
        [("u", _ts(0, 0)), ("u", _ts(0, 30)), ("u", _ts(5, 0))],
        "user_id string, ts timestamp",
    )
    rows = sorted(
        session_stats(df, "user_id", "ts", 60).collect(),
        key=lambda r: r.session_start,
    )
    assert [r.n_events for r in rows] == [2, 1]
    assert rows[0].duration_sec == 30.0
    assert rows[1].duration_sec == 0.0


# ---------------------------------------------------------------------------
# as-of join


def _frames(spark):
    left = spark.createDataFrame(
        [("k", _ts(1), 100), ("k", _ts(5), 101), ("k", _ts(9), 102),
         ("x", _ts(2), 103)],
        "k string, ts timestamp, ev long",
    )
    right = spark.createDataFrame(
        [("k", _ts(1), 1.0), ("k", _ts(6), 2.0)],
        "k string, ts timestamp, px double",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    got = {
        r.ev: (r.px, r.asof_ts)
        for r in asof_join(left, right, "k", "ts").collect()
    }
    # ts(1) matches the equal-timestamp right row (inclusive >=)
    assert got == {
        100: (1.0, _ts(1)),
        101: (1.0, _ts(1)),
        102: (2.0, _ts(6)),
        103: (None, None),  # key never seen on the right
    }


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    got = {
        r.ev: r.px
        for r in asof_join(
            left, right, "k", "ts", tolerance_seconds=180
        ).collect()
    }
    # ev=101 is 4 min after its match -> nulled; ev=102 is 3 min -> kept
    assert got == {100: 1.0, 101: None, 102: 2.0, 103: None}


def test_asof_payload_collision_raises(spark):
    left, right = _frames(spark)
    try:
        asof_join(left, right.withColumnRenamed("px", "ev"), "k", "ts")
    except ValueError as e:
        assert "ev" in str(e)
    else:
        raise AssertionError("expected ValueError on payload collision")


def test_session_stats_streaming_matches_batch(spark, tmp_path):
    """The SAME session_stats call runs under Structured Streaming: with a
    watermark, closed sessions emitted in append mode must equal the batch
    rollup (the operator's streaming-capable claim, pinned)."""
    import datetime as _dt

    from embulk_spark.operators.sessions import session_stats

    rows = [
        ("u", _ts(0, 0)), ("u", _ts(0, 30)), ("u", _ts(5, 0)),
        ("v", _ts(1, 0)), ("v", _ts(1, 30)),
    ]
    src = str(tmp_path / "sess_src")
    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    real = spark.createDataFrame(rows, "user_id string, ts timestamp")
    real.coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = (
            spark.readStream.schema("user_id string, ts timestamp").parquet(src)
        )
        agg = session_stats(
            stream.withWatermark("ts", "1 second"), "user_id", "ts", 60
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # batch 1: watermark advances past the real events
    sentinel = spark.createDataFrame(
        [("_sentinel", _dt.datetime(2024, 1, 2))], "user_id string, ts timestamp"
    )
    sentinel.coalesce(1).write.mode("append").parquet(src)
    run_once()  # batch 2: all real sessions are now below the watermark

    got = {
        (r.user_id, r.session_start, r.n_events, r.duration_sec)
        for r in spark.read.parquet(out).collect()
        if r.user_id != "_sentinel"
    }
    want = {
        (r.user_id, r.session_start, r.n_events, r.duration_sec)
        for r in session_stats(real, "user_id", "ts", 60).collect()
    }
    assert got == want and len(want) == 3


def test_asof_ignores_null_ts_right_rows(spark):
    left = spark.createDataFrame(
        [("k", _ts(0, 30), 1)], "k string, ts timestamp, ev long"
    )
    right = spark.createDataFrame(
        [("k", None, 9.9), ("k", _ts(1), 2.0)],
        "k string, ts timestamp, px double",
    )
    row = asof_join(left, right, "k", "ts").head()
    # the NULL-ts row must never match (ASOF semantics); ts(1) is later
    assert row.px is None and row.asof_ts is None


def test_asof_reserved_left_column_raises(spark):
    left = spark.createDataFrame([("k", _ts(1), 1)], "k string, ts timestamp, _side long")
    right = spark.createDataFrame([("k", _ts(0), 2.0)], "k string, ts timestamp, px double")
    try:
        asof_join(left, right, "k", "ts")
    except ValueError as e:
        assert "_side" in str(e)
    else:
        raise AssertionError("expected ValueError on reserved column")


def test_sessionize_null_key_yields_null_session_id(spark):
    df = spark.createDataFrame(
        [(None, _ts(0)), ("u", _ts(0))], "user_id string, ts timestamp"
    )
    rows = {r.user_id: r for r in sessionize(df, "user_id", "ts", 60).collect()}
    assert rows["u"].session_id == "u#1"
    assert rows[None].session_id is None  # not a bare "1" colliding globally


def test_asof_reserved_right_payload_raises(spark):
    """A right payload named like an output/internal column ('asof_ts',
    '_match_ts') must raise instead of emitting duplicate columns."""
    left = spark.createDataFrame([("k", _ts(1), 1)], "k string, ts timestamp, ev long")
    right = spark.createDataFrame(
        [("k", _ts(0), 2.0)], "k string, ts timestamp, asof_ts double"
    )
    try:
        asof_join(left, right, "k", "ts")
    except ValueError as e:
        assert "asof_ts" in str(e)
    else:
        raise AssertionError("expected ValueError on reserved right payload")
