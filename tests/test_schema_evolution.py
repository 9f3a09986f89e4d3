"""Schema evolution (add / rename / widen) through the replay path, plus
the Structured-Streaming surface with checkpoint restart.

Reference semantics under test:
- between-run re-guess -> ConfigDiff merge is Embulk's schema-evolution
  mechanism (exec/GuessExecutor.java:142-195, EmbulkRunner.java:252-258);
  we compress it into in-stream 'S' events applied as manifest-only DDL.
- widening follows the guess lattice
  (embulk-ruby/lib/embulk/guess/schema_guess.rb:112-128).
- resume-from-checkpoint mirrors BulkLoader.doResume re-running only
  uncommitted work (exec/BulkLoader.java:584-690).
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_spark.streaming.lake import ParquetLakeTable
from embulk_spark.streaming.replay import replay_batches, stream_events

TS0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _ev(seq, epoch, op, url, ts_off=0, html=b"<p>x</p>", lang="en",
        schema_change=None, **extra):
    return {
        "seq": seq, "epoch": epoch, "op": op, "url": url,
        "warc_ts": datetime(2024, 1, 1, 0, 0, ts_off, tzinfo=timezone.utc),
        "html": None if op == "D" else html,
        "lang": None if op == "D" else lang,
        "schema_change": schema_change,
        **extra,
    }


def _schema(extra_ddl: str = "") -> T.StructType:
    base = (
        "seq LONG, epoch LONG, op STRING, url STRING, warc_ts TIMESTAMP, "
        "html BINARY, lang STRING, schema_change STRING"
    )
    return T.StructType.fromDDL(base + (", " + extra_ddl if extra_ddl else ""))


def test_add_column_flows_through_merge(spark, tmp_path):
    """Epoch 0 writes without 'score'; an S event adds it; epoch 1 events
    carry score values. Old rows read back null, new rows carry data —
    files are never rewritten."""
    table = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    e0 = [
        _ev(1, 0, "I", "u://a", 1, score=None),
        _ev(2, 0, "I", "u://b", 2, score=None),
    ]
    add = json.dumps({"action": "add", "column": "score", "type": "long"})
    e1 = [
        _ev(3, 1, "S", "u://-", 3, schema_change=add, score=None),
        _ev(4, 1, "U", "u://b", 4, score=7),
        _ev(5, 1, "I", "u://c", 5, score=9),
    ]
    events = spark.createDataFrame(e0 + e1, schema=_schema("score LONG"))
    replay_batches(table, events)
    got = {r["url"]: r["score"] for r in table.published().collect()}
    assert got == {"u://a": None, "u://b": 7, "u://c": 9}
    assert "score" in table.schema().fieldNames()


def test_rename_column_preserves_data(spark, tmp_path):
    table = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    e0 = [_ev(1, 0, "I", "u://a", 1, lang="de")]
    ren = json.dumps({"action": "rename", "from": "lang", "to": "language"})
    e1 = [
        _ev(2, 1, "S", "u://-", 2, schema_change=ren),
        _ev(3, 1, "I", "u://b", 3, lang="fr"),
    ]
    events = spark.createDataFrame(e0 + e1, schema=_schema())
    replay_batches(table, events)
    names = table.schema().fieldNames()
    assert "language" in names and "lang" not in names
    got = {r["url"]: r["language"] for r in table.published().collect()}
    # old file (written as 'lang') normalizes under the new name;
    # the epoch-1 event's payload keeps flowing in via the core-column map
    assert got == {"u://a": "de", "u://b": "fr"}


def test_rename_added_column_payload_flows(spark, tmp_path):
    """add 'score', rename score->points; producers keep emitting 'score'
    (per the reference's next-run-config model, a producer learns of a
    rename only on its next run) — post-rename payloads must land under
    'points', not be silently dropped before the rename map applies."""
    table = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    add = json.dumps({"action": "add", "column": "score", "type": "long"})
    ren = json.dumps({"action": "rename", "from": "score", "to": "points"})
    e0 = [
        _ev(1, 0, "S", "u://-", 1, schema_change=add, score=None),
        _ev(2, 0, "I", "u://a", 2, score=3),
    ]
    e1 = [
        _ev(3, 1, "S", "u://-", 3, schema_change=ren, score=None),
        _ev(4, 1, "I", "u://b", 4, score=7),  # still the original name
        _ev(5, 1, "U", "u://a", 5, score=8),
    ]
    events = spark.createDataFrame(e0 + e1, schema=_schema("score LONG"))
    replay_batches(table, events)
    names = table.schema().fieldNames()
    assert "points" in names and "score" not in names
    got = {r["url"]: r["points"] for r in table.published().collect()}
    assert got == {"u://a": 8, "u://b": 7}


def test_widen_column_lattice(spark, tmp_path):
    """long+double -> double per the reference lattice
    (schema_guess.rb:112-128); old long values cast losslessly."""
    table = ParquetLakeTable(
        spark, str(tmp_path / "t"), n_buckets=4,
        schema_ddl=(
            "url STRING, warc_ts TIMESTAMP, seq BIGINT, html BINARY, "
            "text STRING, lang STRING, score BIGINT, is_deleted BOOLEAN"
        ),
    )
    e0 = [_ev(1, 0, "I", "u://a", 1, score=3)]
    widen = json.dumps({"action": "widen", "column": "score", "to": "double"})
    e1 = [
        _ev(2, 1, "S", "u://-", 2, schema_change=widen, score=None),
        _ev(3, 1, "I", "u://b", 3, score=5),
    ]
    events = spark.createDataFrame(e0 + e1, schema=_schema("score LONG"))
    replay_batches(table, events)
    field = {f.name: f.dataType for f in table.schema().fields}
    assert isinstance(field["score"], T.DoubleType)
    got = {r["url"]: r["score"] for r in table.published().collect()}
    assert got == {"u://a": 3.0, "u://b": 5.0}


def test_evolution_survives_compaction(spark, tmp_path):
    table = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    e0 = [_ev(1, 0, "I", "u://a", 1, score=None)]
    add = json.dumps({"action": "add", "column": "score", "type": "long"})
    e1 = [
        _ev(2, 1, "S", "u://-", 2, schema_change=add, score=None),
        _ev(3, 1, "U", "u://a", 3, score=11),
    ]
    events = spark.createDataFrame(e0 + e1, schema=_schema("score LONG"))
    replay_batches(table, events)
    table.compact()
    got = {r["url"]: r["score"] for r in table.published().collect()}
    assert got == {"u://a": 11}
    # post-compaction the base is written at the current schema version
    snap = table.current_snapshot()
    assert all(e["schema_v"] == snap["schema_v"] for e in snap["base"].values())


def test_pipelined_replay_equals_sequential(spark, tmp_path):
    """pipeline_depth=2 overlaps epoch jobs; final state must equal the
    sequential replay (MOR winner selection is commit-order independent),
    even with compaction firing mid-stream (folded_deltas must not drop a
    concurrently committed delta)."""
    from embulk_spark.sources.events import change_stream

    events = change_stream(spark, 1200, 150, 6, num_partitions=4).cache()
    seq_t = ParquetLakeTable(spark, str(tmp_path / "seq"), n_buckets=4)
    replay_batches(seq_t, events, pipeline_depth=1)
    pipe_t = ParquetLakeTable(
        spark, str(tmp_path / "pipe"), n_buckets=4,
        compact_min_deltas=2, compact_ratio=0.0,  # compact aggressively
    )
    out = replay_batches(pipe_t, events, pipeline_depth=3)
    assert len(out) == 6 and all("epoch_id" in m for m in out)
    got = {(r["url"], r["seq"]) for r in pipe_t.published().collect()}
    want = {(r["url"], r["seq"]) for r in seq_t.published().collect()}
    assert got == want
    assert pipe_t.committed_epochs() == {0, 1, 2, 3, 4, 5}


def test_stream_window_metrics_watermark(spark, tmp_path):
    """Append-mode windowed metrics: only watermark-closed windows are
    emitted, and their counts equal a batch aggregation of the same
    events restricted to those windows."""
    from embulk_spark.sources.events import change_stream
    from embulk_spark.streaming.replay import stream_window_metrics

    events = change_stream(spark, 3000, 400, 3, num_partitions=4).cache()
    src = str(tmp_path / "src")
    events.coalesce(2).write.mode("append").parquet(src)

    out, ckpt = str(tmp_path / "metrics"), str(tmp_path / "ckpt")
    stream_window_metrics(spark, src, ckpt, out,
                          window="10 minutes", watermark="1 minute")
    got = spark.read.parquet(out)
    assert got.count() > 0  # stream spans ~50min → several closed windows
    # every emitted (window, op) row matches the batch ground truth
    batch = (
        events.groupBy(F.window("warc_ts", "10 minutes").alias("w"), "op")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "op", "n_events")
    )
    joined = got.select("window_start", "op", "n_events").join(
        batch.withColumnRenamed("n_events", "n_batch"), ["window_start", "op"]
    )
    assert joined.filter(F.col("n_events") != F.col("n_batch")).count() == 0
    assert joined.count() == got.count()
    # the final (unclosed) window must NOT be in the append output
    last_start = batch.agg(F.max("window_start")).collect()[0][0]
    assert got.filter(F.col("window_start") == last_start).count() == 0


def test_stream_events_checkpoint_resume(spark, tmp_path):
    """Structured-Streaming surface: tail a parquet dir with availableNow,
    stop, add more files, restart with the same checkpoint — each file is
    applied exactly once and the final state matches a full batch replay."""
    from embulk_spark.sources.events import EVENT_SCHEMA, change_stream

    events = change_stream(spark, 600, 80, 3, num_partitions=4).cache()
    ep0 = events.filter(F.col("epoch") == 0)
    rest = events.filter(F.col("epoch") > 0)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ep0.coalesce(1).write.mode("append").parquet(src)

    t_stream = ParquetLakeTable(spark, str(tmp_path / "stream_t"), n_buckets=4)
    stream_events(spark, t_stream, src, ckpt, max_files_per_trigger=1)
    n_after_first = t_stream.published().count()
    assert n_after_first > 0

    rest.coalesce(2).write.mode("append").parquet(src)
    # "restart": new query, same checkpoint — offsets resume past file 1
    stream_events(spark, t_stream, src, ckpt, max_files_per_trigger=1)

    t_batch = ParquetLakeTable(spark, str(tmp_path / "batch_t"), n_buckets=4)
    replay_batches(t_batch, events)

    got = {
        (r["url"], r["seq"]) for r in t_stream.published().collect()
    }
    want = {
        (r["url"], r["seq"]) for r in t_batch.published().collect()
    }
    assert got == want


def test_drop_column_manifest_only(spark, tmp_path):
    """An S event drops 'lang': readers stop selecting it, files are not
    rewritten, later events' lang payloads are discarded."""
    import pytest

    table = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    e0 = [_ev(1, 0, "I", "u://a", 1, lang="de")]
    drop = json.dumps({"action": "drop", "column": "lang"})
    e1 = [
        _ev(2, 1, "S", "u://-", 2, schema_change=drop),
        _ev(3, 1, "I", "u://b", 3, lang="fr"),
    ]
    files_before = None
    events = spark.createDataFrame(e0 + e1, schema=_schema())
    replay_batches(table, events, max_epochs=1)
    files_before = sorted(f["path"] for f in table.files())
    replay_batches(table, events)
    assert "lang" not in table.schema().fieldNames()
    assert "lang" not in table.published().columns
    # epoch-0 files untouched (manifest-only DDL)
    assert set(files_before) <= {f["path"] for f in table.files()}
    with pytest.raises(ValueError, match="load-bearing"):
        table.drop_column("url")


def test_drop_then_readd_does_not_resurrect(spark, tmp_path):
    """Iceberg's no-resurrection rule without field ids: score dropped at
    v then re-added — pre-drop files read NULL, never the old values."""
    table = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    add = json.dumps({"action": "add", "column": "score", "type": "long"})
    drop = json.dumps({"action": "drop", "column": "score"})
    e0 = [
        _ev(1, 0, "S", "u://-", 1, schema_change=add, score=None),
        _ev(2, 0, "I", "u://a", 2, score=3),
    ]
    e1 = [_ev(3, 1, "S", "u://-", 3, schema_change=drop, score=None)]
    e2 = [
        _ev(4, 2, "S", "u://-", 4, schema_change=add, score=None),
        _ev(5, 2, "I", "u://b", 5, score=9),
    ]
    events = spark.createDataFrame(e0 + e1 + e2, schema=_schema("score LONG"))
    replay_batches(table, events)
    got = {r["url"]: r["score"] for r in table.published().collect()}
    # u://a's pre-drop 3 is gone for good; u://b's post-readd 9 lands
    assert got == {"u://a": None, "u://b": 9}


def test_rename_into_dropped_name_keeps_order(spark, tmp_path):
    """drop 'lang' at v1, then rename an added column INTO 'lang' at v3:
    pre-drop files' original lang bytes must stay hidden while the
    renamed column's values read back under the reused name."""
    table = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    drop = json.dumps({"action": "drop", "column": "lang"})
    add = json.dumps({"action": "add", "column": "tongue", "type": "string"})
    ren = json.dumps({"action": "rename", "from": "tongue", "to": "lang"})
    e0 = [_ev(1, 0, "I", "u://a", 1, lang="de", tongue=None)]
    e1 = [
        _ev(2, 1, "S", "u://-", 2, schema_change=drop, tongue=None),
        _ev(3, 1, "S", "u://-", 3, schema_change=add, tongue=None),
        _ev(4, 1, "S", "u://-", 4, schema_change=ren, tongue=None),
        _ev(5, 1, "I", "u://b", 5, tongue="fr"),
    ]
    events = spark.createDataFrame(e0 + e1, schema=_schema("tongue STRING"))
    replay_batches(table, events)
    got = {r["url"]: r["lang"] for r in table.published().collect()}
    assert got == {"u://a": None, "u://b": "fr"}
