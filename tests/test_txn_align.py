"""Source-transaction boundary alignment (streaming/txn_align.py): an
epoch commit must be a prefix of COMMITTED source transactions — rows
whose wal2json commit marker hasn't arrived defer to a later batch,
survive restarts, and replay exactly-once under batch retries."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from embulk_spark.sources.debezium import (
    wal2json_change_events,
    wal2json_txn_markers,
)
from embulk_spark.streaming.replay import stream_binlog
from embulk_spark.streaming.lake import ParquetLakeTable
from embulk_spark.streaming.txn_align import TxnAligner

TS = "2024-01-01 00:00:00.123456+00"


def _line(action, xid, url=None, lsn="0/1", html="\\x3c623e"):
    d = {"action": action, "schema": "public", "table": "pages",
         "timestamp": TS, "lsn": lsn, "xid": xid}
    if action in ("I", "U", "D"):
        d["columns"] = [
            {"name": "url", "type": "text", "value": url},
            {"name": "warc_ts", "type": "int8", "value": 1704067200000},
            {"name": "html", "type": "bytea", "value": html},
            {"name": "lang", "type": "text", "value": "en"},
        ]
    return json.dumps(d)


def _lines_df(spark, lines):
    return spark.createDataFrame([(v,) for v in lines], "value string")


def _events(spark, lines):
    return wal2json_change_events(_lines_df(spark, lines), with_txn=True)


def test_aligner_defers_open_txn_and_releases_on_commit(spark, tmp_path):
    al = TxnAligner(spark, str(tmp_path / "st"))
    # batch 0: txn 1 complete; txn 2 rows but no commit marker yet
    b0 = [
        _line("B", 1), _line("I", 1, "u1", lsn="0/1"),
        _line("C", 1),
        _line("B", 2), _line("I", 2, "u2", lsn="0/2"),
        _line("U", 2, "u3", lsn="0/3"),
    ]
    ready = al.align(
        _events(spark, b0), wal2json_txn_markers(_lines_df(spark, b0)), 0
    )
    assert {r["url"] for r in ready.collect()} == {"u1"}
    assert al.open_txns() == [2]
    # batch 1: txn 2 commits, txn 3 opens
    b1 = [_line("C", 2), _line("B", 3), _line("I", 3, "u4", lsn="0/4")]
    ready = al.align(
        _events(spark, b1), wal2json_txn_markers(_lines_df(spark, b1)), 1
    )
    assert {r["url"] for r in ready.collect()} == {"u2", "u3"}
    assert al.open_txns() == [3]


def test_aligner_null_xid_passes_and_retry_is_idempotent(spark, tmp_path):
    al = TxnAligner(spark, str(tmp_path / "st"))
    b0 = [_line("I", None, "u1"), _line("B", 9), _line("I", 9, "u2")]
    ev = _events(spark, b0)
    marks = wal2json_txn_markers(_lines_df(spark, b0))
    first = {r["url"] for r in al.align(ev, marks, 0).collect()}
    # re-delivered batch 0 (crash before checkpoint): identical split,
    # manifest write skips, state unchanged
    again = {r["url"] for r in al.align(ev, marks, 0).collect()}
    assert first == again == {"u1"}
    assert al.open_txns() == [9]
    assert al._versions() == [0]


def test_aligner_cleanup_keeps_latest(spark, tmp_path):
    al = TxnAligner(spark, str(tmp_path / "st"))
    for i in range(4):
        b = [_line("B", 50 + i), _line("I", 50 + i, f"u{i}")]
        al.align(
            _events(spark, b), wal2json_txn_markers(_lines_df(spark, b)), i
        )
    dropped = al.cleanup(keep_last=2)
    assert dropped == [0, 1]
    assert al._versions() == [2, 3]
    # pending still carries every open txn (deferred set accumulates)
    assert al.open_txns() == [50, 51, 52, 53]


def test_stream_binlog_txn_align_end_to_end(spark, tmp_path):
    """The tail cuts mid-transaction: the cut rows stay invisible until
    the commit marker's file arrives; final state equals a whole-stream
    apply."""
    src = tmp_path / "binlog"
    src.mkdir()
    table = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=2)
    ck = str(tmp_path / "ck")

    # file 1: txn 100 committed, txn 101 cut mid-way
    (src / "a.jsonl").write_text("\n".join([
        _line("B", 100), _line("I", 100, "u1", lsn="0/1"), _line("C", 100),
        _line("B", 101), _line("I", 101, "u2", lsn="0/2"),
    ]) + "\n")
    stream_binlog(spark, table, str(src), ck,
                  wire_format="wal2json", txn_align=True)
    assert {r["url"] for r in table.published().collect()} == {"u1"}

    # file 2: the rest of txn 101 + its commit
    (src / "b.jsonl").write_text("\n".join([
        _line("U", 101, "u3", lsn="0/3"), _line("C", 101),
    ]) + "\n")
    stream_binlog(spark, table, str(src), ck,
                  wire_format="wal2json", txn_align=True)
    assert {r["url"] for r in table.published().collect()} == {
        "u1", "u2", "u3"
    }

    # control: the same lines applied without alignment in one shot
    control = ParquetLakeTable(spark, str(tmp_path / "c"), n_buckets=2)
    allev = _events(
        spark,
        (src / "a.jsonl").read_text().splitlines()
        + (src / "b.jsonl").read_text().splitlines(),
    ).drop("txn_xid").withColumn(
        "schema_change", F.lit(None).cast("string")
    )
    control.merge_epoch(allev, 0)
    assert (
        {r["url"] for r in table.published().collect()}
        == {r["url"] for r in control.published().collect()}
    )


def test_stream_binlog_txn_align_maxwell(spark, tmp_path):
    """Maxwell's commit flag drives the same alignment: the flag row is
    the txn's last event, so the group releases with it."""
    src = tmp_path / "mx"
    src.mkdir()
    table = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=2)
    ck = str(tmp_path / "ck")

    def mx(typ, url, xid, xoff, commit=False):
        d = {"database": "db", "table": "pages", "type": typ,
             "ts": 1704067200, "xid": xid, "xoffset": xoff,
             "data": {"url": url, "warc_ts": 1704067200000,
                      "html": "PGI+", "lang": "en"}}
        if commit:
            d["commit"] = True
        return json.dumps(d)

    # file 1: txn 7 complete (commit on last row); txn 8 cut mid-way
    (src / "a.jsonl").write_text("\n".join([
        mx("insert", "u1", 7, 0),
        mx("insert", "u2", 7, 1, commit=True),
        mx("insert", "u3", 8, 0),
    ]) + "\n")
    stream_binlog(spark, table, str(src), ck,
                  wire_format="maxwell", txn_align=True)
    assert {r["url"] for r in table.published().collect()} == {"u1", "u2"}

    # file 2: txn 8's commit-flagged tail row
    (src / "b.jsonl").write_text(
        mx("update", "u4", 8, 1, commit=True) + "\n"
    )
    stream_binlog(spark, table, str(src), ck,
                  wire_format="maxwell", txn_align=True)
    assert {r["url"] for r in table.published().collect()} == {
        "u1", "u2", "u3", "u4"
    }


# ---------------------------------------------------------------------------
# property: ANY batch split of a txn stream yields exactly the committed
# transactions' events, each released no earlier than its commit marker
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def txn_streams(draw):
    """A wal2json-shaped line list: n txns of 1-3 events each, the last
    0-2 txns left OPEN (no C marker), plus random cut points."""
    n_txn = draw(st.integers(1, 4))
    n_open = draw(st.integers(0, min(2, n_txn)))
    lines, seq = [], 0
    committed = set()
    for x in range(n_txn):
        xid = 100 + x
        lines.append(_line("B", xid))
        for _ in range(draw(st.integers(1, 3))):
            lines.append(_line("I", xid, f"u{seq}", lsn=f"0/{seq + 1:X}"))
            seq += 1
        if x < n_txn - n_open:
            lines.append(_line("C", xid))
            committed.add(xid)
    n_cuts = draw(st.integers(0, min(3, max(0, len(lines) - 1))))
    cuts = sorted(draw(st.lists(
        st.integers(1, max(1, len(lines) - 1)),
        min_size=n_cuts, max_size=n_cuts, unique=True,
    )))
    return lines, cuts, committed


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(txn_streams())
def test_any_split_releases_exactly_committed_txns(spark, tmp_path_factory, s):
    lines, cuts, committed = s
    al = TxnAligner(spark, str(tmp_path_factory.mktemp("al")))
    batches, prev = [], 0
    for c in cuts + [len(lines)]:
        if c > prev:
            batches.append(lines[prev:c])
            prev = c
    released = []
    marks_seen: set[int] = set()
    for i, b in enumerate(batches):
        marks_seen |= {
            json.loads(ln)["xid"] for ln in b
            if json.loads(ln)["action"] == "C"
        }
        ready = al.align(
            _events(spark, b), wal2json_txn_markers(_lines_df(spark, b)), i
        ).collect()
        # nothing releases before its commit marker has arrived
        assert {r["txn_xid"] for r in ready} <= marks_seen
        released.extend((r["txn_xid"], r["url"]) for r in ready)
    want = {
        (xid, url)
        for xid, url in [
            (json.loads(ln)["xid"],
             json.loads(ln)["columns"][0]["value"])
            for ln in lines if json.loads(ln).get("columns")
        ]
        if xid in committed
    }
    assert set(released) == want
    assert len(released) == len(set(released)), "no duplicate releases"
    # open txns stay pending
    assert set(al.open_txns()) == {
        json.loads(ln)["xid"] for ln in lines
        if json.loads(ln)["action"] == "I"
    } - committed
