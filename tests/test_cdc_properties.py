"""Property-based CDC semantics: random small change streams (with
duplicates, late events, deletes, ties) must replay to exactly the state
an independent DuckDB window-oracle computes — whatever the epoch
assignment, arrival order, or pipeline depth.

Reference contract being fuzzed: ordering by (warc_ts, seq), tombstone
wins over late older updates, duplicate delivery no-ops
(/root/reference/embulk-core/src/main/java/org/embulk/exec/BulkLoader.java:154-159,584-690).
Spark round-trips are slow, so hypothesis runs few, dense examples.
"""

from __future__ import annotations

from datetime import datetime, timezone

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from embulk_spark.streaming.lake import ParquetLakeTable
from embulk_spark.streaming.replay import replay_batches


@st.composite
def change_streams(draw):
    n_urls = draw(st.integers(2, 6))
    n_events = draw(st.integers(4, 40))
    rows = []
    for seq in range(n_events):
        url = f"u://{draw(st.integers(0, n_urls - 1))}"
        op = draw(st.sampled_from(["I", "U", "U", "D"]))
        # coarse timestamps force (warc_ts) ties broken by seq
        ts = datetime(2024, 1, 1, 0, 0, draw(st.integers(0, 5)),
                      tzinfo=timezone.utc)
        epoch = draw(st.integers(0, 2))
        rows.append((seq, epoch, op, url, ts,
                     None if op == "D" else f"<p>v{seq}</p>".encode(),
                     None if op == "D" else "en", None))
    # duplicate deliveries: re-send some rows in a later epoch
    for i in draw(st.lists(st.integers(0, n_events - 1), max_size=5)):
        r = rows[i]
        rows.append(r[:1] + (min(2, r[1] + 1),) + r[2:])
    return rows


SCHEMA = ("seq LONG, epoch LONG, op STRING, url STRING, warc_ts TIMESTAMP, "
          "html BINARY, lang STRING, schema_change STRING")


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=5, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(change_streams())
def test_random_stream_matches_window_oracle(spark, tmp_path_factory, rows):
    tmp = tmp_path_factory.mktemp("prop")
    events = spark.createDataFrame(rows, schema=SCHEMA)
    table = ParquetLakeTable(spark, str(tmp / "t"), n_buckets=2,
                             compact_min_deltas=2, compact_ratio=0.0)
    replay_batches(table, events, pipeline_depth=2)

    got = {
        (r["url"], r["seq"], r["text"])
        for r in table.published().select("url", "seq", "text").collect()
    }

    pdf = pd.DataFrame(
        rows, columns=["seq", "epoch", "op", "url", "warc_ts", "html",
                       "lang", "schema_change"],
    )
    con = duckdb.connect()
    con.register("ev", pdf)
    want_rows = con.execute(
        """
        SELECT url, seq, html FROM (
          SELECT url, op, seq, html,
                 row_number() OVER (PARTITION BY url
                                    ORDER BY warc_ts DESC, seq DESC) rn
          FROM ev) WHERE rn = 1 AND op <> 'D'
        """
    ).fetchall()
    from embulk_spark.functions.extract import extract_text_oracle

    want = {
        (u, s, extract_text_oracle(bytes(h)) if h is not None else None)
        for u, s, h in want_rows
    }
    assert got == want


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=4, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(change_streams(), st.lists(st.booleans(), min_size=3, max_size=3))
def test_random_replication_matches_oracle(
    spark, tmp_path_factory, rows, polls
):
    """A replica synced at ARBITRARY poll points (some epochs coalesce
    into one range, some polls are no-ops) ends byte-identical to the
    DuckDB window oracle — whatever the stream or the poll schedule."""
    from embulk_spark.streaming.replicate import replicate_step

    tmp = tmp_path_factory.mktemp("prop_rep")
    events = spark.createDataFrame(rows, schema=SCHEMA)
    src = ParquetLakeTable(spark, str(tmp / "src"), n_buckets=2,
                           compact_min_deltas=10_000)
    rep = ParquetLakeTable(spark, str(tmp / "rep"), n_buckets=2,
                           compact_min_deltas=10_000)
    feed = str(tmp / "feed")
    for e in range(3):
        replay_batches(src, events.filter(f"epoch = {e}"), pipeline_depth=1)
        if polls[e]:
            replicate_step(src, rep, feed)
    replicate_step(src, rep, feed)  # final catch-up

    got = {
        (r["url"], r["seq"], r["text"])
        for r in rep.published().select("url", "seq", "text").collect()
    }
    pdf = pd.DataFrame(
        rows, columns=["seq", "epoch", "op", "url", "warc_ts", "html",
                       "lang", "schema_change"],
    )
    con = duckdb.connect()
    con.register("ev", pdf)
    want_rows = con.execute(
        """
        SELECT url, seq, html FROM (
          SELECT url, op, seq, html,
                 row_number() OVER (PARTITION BY url
                                    ORDER BY warc_ts DESC, seq DESC) rn
          FROM ev) WHERE rn = 1 AND op <> 'D'
        """
    ).fetchall()
    from embulk_spark.functions.extract import extract_text_oracle

    want = {
        (u, s, extract_text_oracle(bytes(h)) if h is not None else None)
        for u, s, h in want_rows
    }
    assert got == want


@pytest.mark.filterwarnings("ignore")
@settings(max_examples=4, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(change_streams(), st.lists(
    st.one_of(st.none(),  # binpack
              st.lists(st.integers(0, 1), max_size=2)),  # bucket subset
    min_size=1, max_size=3))
def test_random_partial_compactions_preserve_state(
    spark, tmp_path_factory, rows, folds
):
    """Arbitrary interleavings of partial folds / binpacks between epochs
    never change the published state vs a never-compacted control."""
    tmp = tmp_path_factory.mktemp("prop_pc")
    events = spark.createDataFrame(rows, schema=SCHEMA)
    control = ParquetLakeTable(spark, str(tmp / "ctl"), n_buckets=2,
                               compact_min_deltas=10_000)
    replay_batches(control, events, pipeline_depth=1)
    want = {(r.url, r.seq) for r in control.published().collect()}

    table = ParquetLakeTable(spark, str(tmp / "t"), n_buckets=2,
                             compact_min_deltas=10_000)
    plan = list(folds)
    for e in range(3):
        replay_batches(table, events.filter(f"epoch = {e}"),
                       pipeline_depth=1)
        if plan:
            f = plan.pop(0)
            table.compact(buckets=[] if f is None else sorted(set(f)))
    got = {(r.url, r.seq) for r in table.published().collect()}
    assert got == want
