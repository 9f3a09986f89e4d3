"""Debezium envelope source: wire-format parse, op mapping, tombstones,
schemas.enable wrapper, snapshot flag, seq precedence, and end-to-end
replay of a Debezium stream into the lake (final state == replaying the
same logical events natively)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from embulk_spark.sources.debezium import (
    PAGE_ROW_DDL,
    debezium_change_events,
    debezium_envelope_col,
    parse_debezium,
    read_debezium_files,
)


def _env(op, after=None, before=None, *, pos=None, ts_ms=0, snapshot=None,
         txn_order=None, lsn=None, wrap=False):
    payload = {"op": op, "ts_ms": ts_ms, "source": {"connector": "t", "ts_ms": ts_ms}}
    if after is not None:
        payload["after"] = after
    if before is not None:
        payload["before"] = before
    if pos is not None:
        payload["source"]["pos"] = pos
    if lsn is not None:
        payload["source"]["lsn"] = lsn
    if snapshot is not None:
        payload["source"]["snapshot"] = snapshot
    if txn_order is not None:
        payload["transaction"] = {"id": "tx", "total_order": txn_order}
    if wrap:
        return json.dumps({"schema": {"type": "struct"}, "payload": payload})
    return json.dumps(payload)


ROW = {"url": "https://a.test/1", "warc_ts": 1704067200000, "html": "PGI+", "lang": "en"}


def _parse(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "value string")
    return parse_debezium(df, PAGE_ROW_DDL)


def test_op_mapping_and_image_pick(spark):
    out = _parse(
        spark,
        [
            _env("c", after=ROW, pos=1),
            _env("r", after=ROW, pos=2, snapshot="true"),
            _env("u", after={**ROW, "lang": "de"}, before=ROW, pos=3),
            _env("d", before={**ROW, "lang": "fr"}, pos=4),
        ],
    ).orderBy("seq").collect()
    assert [r.op for r in out] == ["I", "I", "U", "D"]
    assert [r.is_snapshot for r in out] == [False, True, False, False]
    # update reads AFTER, delete reads BEFORE (the pre-image)
    assert out[2].lang == "de" and out[3].lang == "fr"
    assert all(r.url == ROW["url"] for r in out)


def test_tombstones_garbage_and_unknown_ops_dropped(spark):
    out = _parse(
        spark,
        [
            _env("c", after=ROW, pos=1),
            None,  # Kafka compaction tombstone
            "",  # empty value
            "{not json",  # mid-stream garbage must not error
            _env("t", pos=9),  # truncate: no row image
            json.dumps({"op": "u"}),  # parseable but imageless
        ],
    ).collect()
    assert len(out) == 1 and out[0].op == "I"


def test_schemas_enable_wrapper_parses_identically(spark):
    flat = _parse(spark, [_env("c", after=ROW, pos=7)]).collect()
    wrapped = _parse(spark, [_env("c", after=ROW, pos=7, wrap=True)]).collect()
    assert flat == wrapped


def test_seq_precedence_txn_lsn_pos_tsms(spark):
    out = _parse(
        spark,
        [
            _env("c", after=ROW, pos=1, lsn=10, txn_order=100, ts_ms=5),
            _env("c", after=ROW, pos=2, lsn=20, ts_ms=5),
            _env("c", after=ROW, pos=3, ts_ms=5),
            _env("c", after=ROW, ts_ms=5),
        ],
    ).orderBy("src_ts_ms", "seq").collect()
    assert sorted(r.seq for r in out) == [3, 5, 20, 100]


def test_change_events_types_and_roundtrip(spark):
    """Synth (pure JVM) → parse → engine frame, types included."""
    base = spark.range(6).select(
        F.concat(F.lit("https://s.test/"), F.col("id")).alias("url"),
        (F.lit(1704067200000) + F.col("id") * 1000).alias("warc_ts"),
        F.base64(F.concat(F.lit("<b>"), F.col("id").cast("string")).cast("binary")).alias("html"),
        F.lit("en").alias("lang"),
        F.col("id").alias("pos"),
    )
    values = base.select(
        debezium_envelope_col(
            F.lit("c"),
            F.struct("url", "warc_ts", "html", "lang"),
            pos=F.col("pos"),
            ts_ms=F.col("warc_ts"),
            schemas_enable=F.col("pos") % 2 == 0,
        ).alias("value")
    )
    ev = debezium_change_events(values).orderBy("seq").collect()
    assert len(ev) == 6
    assert [r.seq for r in ev] == list(range(6))
    assert ev[3].html == b"<b>3"
    assert str(ev[0].warc_ts) == "2024-01-01 00:00:00"
    assert {r.op for r in ev} == {"I"}


def test_read_debezium_files_and_lake_replay_parity(spark, tmp_path):
    """A jsonl Debezium dump replays into the lake and lands the same
    final state as applying the equivalent native events."""
    from embulk_spark.streaming.lake import ParquetLakeTable

    lines = [
        _env("c", after={"url": "u1", "warc_ts": 1000, "html": "aGk=", "lang": "en"}, pos=1, ts_ms=1000),
        _env("c", after={"url": "u2", "warc_ts": 2000, "html": "aGk=", "lang": "de"}, pos=2, ts_ms=2000, wrap=True),
        _env("u", after={"url": "u1", "warc_ts": 3000, "html": "eW8=", "lang": "en"},
             before={"url": "u1", "warc_ts": 1000, "html": "aGk=", "lang": "en"}, pos=3, ts_ms=3000),
        _env("d", before={"url": "u2", "warc_ts": 2000, "html": "aGk=", "lang": "de"}, pos=4, ts_ms=4000),
        _env("t", pos=5),
    ]
    p = tmp_path / "topic.jsonl"
    p.write_text("\n".join(lines) + "\n")

    raw = read_debezium_files(spark, str(p))
    assert raw.count() == 4
    events = debezium_change_events(spark.read.text(str(p)))

    lake = ParquetLakeTable(spark, str(tmp_path / "tbl"), n_buckets=2)
    lake.merge_epoch(events, epoch_id=0, extract=False)
    final = {r.url: r for r in lake.published().collect()}
    assert set(final) == {"u1"}
    assert bytes(final["u1"].html) == b"yo"
    assert str(final["u1"].warc_ts) == "1970-01-01 00:00:03"


def test_stream_binlog_directory_tail(spark, tmp_path):
    """stream_binlog: Debezium jsonl files appearing in a prefix are
    tailed into the lake with exactly-once batches; a restart with the
    same checkpoint re-delivers nothing."""
    from embulk_spark.streaming.lake import ParquetLakeTable
    from embulk_spark.streaming.replay import stream_binlog

    d = tmp_path / "binlog"
    d.mkdir()
    (d / "00001.jsonl").write_text(
        "\n".join(
            [
                _env("c", after=ROW, pos=1, ts_ms=1),
                _env("u", after={**ROW, "lang": "de"}, pos=2, ts_ms=2),
                _env(
                    "c",
                    after={**ROW, "url": "https://b.test/2"},
                    pos=3,
                    ts_ms=3,
                ),
            ]
        )
        + "\n"
    )
    table = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=4)
    ckpt = str(tmp_path / "ckpt")
    stream_binlog(spark, table, str(d), ckpt)
    pub = {(r.url, r.lang) for r in table.published().select("url", "lang").collect()}
    assert pub == {("https://a.test/1", "de"), ("https://b.test/2", "en")}
    n_epochs_1 = len(table.committed_epochs())
    # new file arrives: delete for b.test
    (d / "00002.jsonl").write_text(
        _env("d", before={**ROW, "url": "https://b.test/2"}, pos=9, ts_ms=9) + "\n"
    )
    stream_binlog(spark, table, str(d), ckpt)
    pub2 = {r.url for r in table.published().select("url").collect()}
    assert pub2 == {"https://a.test/1"}
    # restart with same checkpoint and no new files: no-op
    stream_binlog(spark, table, str(d), ckpt)
    assert {r.url for r in table.published().select("url").collect()} == pub2
    assert len(table.committed_epochs()) > n_epochs_1


def test_cli_stream_binlog(spark, tmp_path):
    from embulk_spark import cli
    from embulk_spark.streaming.lake import ParquetLakeTable

    d = tmp_path / "bl"
    d.mkdir()
    (d / "x.jsonl").write_text(_env("c", after=ROW, pos=1) + "\n")
    rc = cli.main([
        "replay", str(d), str(tmp_path / "t"),
        "--checkpoint", str(tmp_path / "ck"),
        "--source-format", "debezium", "--master", "local[4]",
    ])
    assert rc == 0
    t = ParquetLakeTable(spark, str(tmp_path / "t"))
    assert {r.url for r in t.published().select("url").collect()} == {ROW["url"]}


def test_stream_binlog_routed(spark, tmp_path):
    """One Debezium stream carrying two tables (source.table) routed to
    two lakes with per-(table, batch) exactly-once."""
    from embulk_spark.streaming.lake import ParquetLakeTable
    from embulk_spark.streaming.replay import stream_binlog

    def env_t(op, tbl, after=None, before=None, pos=None):
        v = json.loads(_env(op, after=after, before=before, pos=pos))
        v["source"]["table"] = tbl
        return json.dumps(v)

    d = tmp_path / "bl"
    d.mkdir()
    (d / "1.jsonl").write_text(
        "\n".join(
            [
                env_t("c", "pages", ROW, pos=1),
                env_t("c", "assets", {**ROW, "url": "https://img/1"}, pos=2),
                env_t("d", "assets", before={**ROW, "url": "https://img/1"}, pos=3),
            ]
        )
        + "\n"
    )
    tables = {
        "pages": ParquetLakeTable(spark, str(tmp_path / "p"), n_buckets=2),
        "assets": ParquetLakeTable(spark, str(tmp_path / "a"), n_buckets=2),
    }
    stream_binlog(spark, None, str(d), str(tmp_path / "ck"), route=tables)
    assert {r.url for r in tables["pages"].published().select("url").collect()} == {
        ROW["url"]
    }
    assert tables["assets"].published().count() == 0  # insert then delete
    assert len(tables["assets"].committed_epochs()) == 1
