"""End-to-end CDC replay correctness against a DuckDB oracle.

The reference's semantics under test (file:line cites):
- final-state equivalence after full replay — Embulk's commit gate
  (exec/BulkLoader.java:541-548) and golden end-to-end runs
  (embulk-junit4/TestingEmbulk.java:317-363);
- resume from partial run re-applies only uncommitted epochs
  (exec/BulkLoader.java:584-659,665-690);
- duplicate delivery is a no-op — atomic+idempotent output contract
  (exec/BulkLoader.java:154-159);
- latest-(warc_ts, seq) wins; a delete stays deleted against late older
  updates (our ordering rule over the reference's resume/ordering model).
"""

from __future__ import annotations

from datetime import datetime

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from embulk_spark.functions.extract import extract_text_oracle
from embulk_spark.sources.events import change_stream
from embulk_spark.streaming.lake import ParquetLakeTable
from embulk_spark.streaming.replay import apply_epoch, replay_batches

N_EVENTS, N_URLS, N_EPOCHS = 3000, 400, 6


@pytest.fixture(scope="module")
def events_pdf(spark):
    df = change_stream(spark, N_EVENTS, N_URLS, N_EPOCHS, num_partitions=8)
    return df.toPandas()


def oracle_final_state(events_pdf: pd.DataFrame) -> pd.DataFrame:
    """Independent final-state computation: DuckDB arg_max + the pinned
    Python extractor."""
    con = duckdb.connect()
    con.register("ev", events_pdf)
    win = con.execute(
        """
        SELECT url, op, seq, warc_ts, html, lang FROM (
          SELECT url, op, seq, warc_ts, html, lang,
                 row_number() OVER (
                   PARTITION BY url ORDER BY warc_ts DESC, seq DESC
                 ) AS rn
          FROM ev WHERE op <> 'S'
        ) WHERE rn = 1
        """
    ).fetchdf()
    live = win[win["op"] != "D"].copy()
    live["text"] = live["html"].map(
        lambda h: extract_text_oracle(bytes(h)) if h is not None else None
    )
    return (
        live[["url", "warc_ts", "seq", "text", "lang"]]
        .sort_values("url")
        .reset_index(drop=True)
    )


def engine_final_state(table: ParquetLakeTable) -> pd.DataFrame:
    pdf = (
        table.published()
        .select("url", "warc_ts", "seq", "text", "lang")
        .toPandas()
    )
    return pdf.sort_values("url").reset_index(drop=True)


def assert_states_equal(got: pd.DataFrame, want: pd.DataFrame):
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    assert list(got["url"]) == list(want["url"])
    for col in ("seq", "text", "lang"):
        mism = got[col].reset_index(drop=True) != want[col].reset_index(drop=True)
        assert not mism.any(), f"{col} mismatch at urls {list(got['url'][mism])[:5]}"
    # timestamps: compare as epoch micros
    gt = pd.to_datetime(got["warc_ts"]).astype("int64")
    wt = pd.to_datetime(want["warc_ts"]).astype("int64")
    assert (gt == wt).all()


def test_full_replay_matches_oracle(spark, events_pdf, tmp_path):
    table = ParquetLakeTable(spark, str(tmp_path / "t1"), n_buckets=8)
    events = spark.createDataFrame(events_pdf)
    metrics = replay_batches(table, events)
    assert len(metrics) == N_EPOCHS
    assert all("rows_written" in m or m.get("empty_batch") for m in metrics)
    assert_states_equal(engine_final_state(table), oracle_final_state(events_pdf))
    # lineage present per commit
    snap = table.current_snapshot()
    assert snap["lineage"] and all("rows" in e for e in snap["lineage"])
    assert snap["metrics"]["rows_in"] > 0


def test_resume_from_partial_replay(spark, events_pdf, tmp_path):
    path = str(tmp_path / "t2")
    events = spark.createDataFrame(events_pdf)
    table = ParquetLakeTable(spark, path, n_buckets=8)
    replay_batches(table, events, max_epochs=2)
    assert len(table.committed_epochs()) == 2
    # "crash": new handle, same storage — no driver state survives
    table2 = ParquetLakeTable(spark, path, n_buckets=8)
    m2 = replay_batches(table2, events)
    assert len(m2) == N_EPOCHS - 2
    assert_states_equal(engine_final_state(table2), oracle_final_state(events_pdf))


def test_duplicate_epoch_delivery_is_noop(spark, events_pdf, tmp_path):
    table = ParquetLakeTable(spark, str(tmp_path / "t3"), n_buckets=8)
    events = spark.createDataFrame(events_pdf)
    replay_batches(table, events)
    v_before = table.current_snapshot()["version"]
    # re-deliver epoch 1 in full
    m = apply_epoch(table, events.filter(F.col("epoch") == 1), 1)
    assert m.get("skipped_duplicate_epoch")
    assert table.current_snapshot()["version"] == v_before
    assert_states_equal(engine_final_state(table), oracle_final_state(events_pdf))


def test_delete_stays_deleted_against_late_update(spark, tmp_path):
    table = ParquetLakeTable(spark, str(tmp_path / "t4"), n_buckets=2)
    url = "https://hostX.example.org/p/1"
    mk = lambda seq, op, s, html: (
        seq, op, url, datetime(2024, 1, 1, 0, 0, s), html, "en",
    )
    cols = "seq long, op string, url string, warc_ts timestamp, html binary, lang string"
    e0 = spark.createDataFrame(
        [mk(1, "I", 1, b"<p>v1</p>"), mk(3, "D", 5, None)], cols
    )
    e1 = spark.createDataFrame([mk(2, "U", 3, b"<p>v2-late</p>")], cols)
    table.merge_epoch(e0, 0)
    table.merge_epoch(e1, 1)
    assert table.published().count() == 0, "late older update must not resurrect"
    # tombstone retained internally with the delete's ordering key
    t = table.read().collect()
    assert len(t) == 1 and t[0]["is_deleted"] and t[0]["seq"] == 3


def test_in_batch_duplicates_collapse(spark, tmp_path):
    table = ParquetLakeTable(spark, str(tmp_path / "t5"), n_buckets=2)
    cols = "seq long, op string, url string, warc_ts timestamp, html binary, lang string"
    ts = datetime(2024, 1, 1, 0, 0, 1)
    rows = [(1, "I", "u1", ts, b"<p>a</p>", "en")] * 3
    m = table.merge_epoch(spark.createDataFrame(rows, cols), 0)
    assert m["rows_in"] == 3 and m["keys_in_batch"] == 1 and m["dedup_count"] == 2
    assert table.published().count() == 1


def test_commit_metrics_stage_trace(spark, tmp_path):
    """TransactionStage analogue: commit metrics carry the stage
    progression and per-phase timings (exec/TransactionStage.java)."""
    from embulk_spark.sources.events import change_stream
    from embulk_spark.streaming.lake import ParquetLakeTable
    from embulk_spark.streaming.replay import apply_epoch

    ev = change_stream(spark, 400, 60, 2, with_html=False)
    t = ParquetLakeTable(spark, str(tmp_path / "stage_tbl"), n_buckets=4)
    m = apply_epoch(t, ev.filter("epoch = 0"), 0)
    assert m["stages"] == ["RUN_BEGIN", "JOB_DONE", "FILES_LISTED", "COMMITTED"]
    assert set(m["phase_seconds"]) == {"job", "list_files", "metrics"}
    assert all(v >= 0 for v in m["phase_seconds"].values())
    m2 = apply_epoch(t, ev.filter("epoch = 0"), 0)
    assert m2["skipped_duplicate_epoch"] and m2["stages"][-1] == "SKIPPED"
