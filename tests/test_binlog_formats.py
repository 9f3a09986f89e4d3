"""Maxwell, Canal, and wal2json wire formats parse to the SAME typed
change-row contract as the Debezium parser, so replay is
format-agnostic: op mapping, seq packing (xid/lsn), batch explode
(canal), all-strings casting (canal), minimal old-image (maxwell),
delete identity image + hex bytea (wal2json), garbage tolerance, and
lake-replay parity across all four formats.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from embulk_spark.sources.debezium import (
    canal_change_events,
    maxwell_change_events,
    parse_canal,
    parse_maxwell,
    parse_wal2json,
    wal2json_change_events,
)

URL = "https://a.test/1"
TSMS = 1704067200000


def _mx(type_, data=None, *, xid=None, xoffset=None, ts=1704067200):
    d = {"database": "db", "table": "pages", "type": type_, "ts": ts}
    if data is not None:
        d["data"] = data
    if xid is not None:
        d["xid"] = xid
    if xoffset is not None:
        d["xoffset"] = xoffset
    return json.dumps(d)


def _cn(type_, rows, *, id_=1, es=TSMS, is_ddl=False):
    return json.dumps({
        "database": "db", "table": "pages", "type": type_, "es": es,
        "ts": es + 5, "id": id_, "isDdl": is_ddl, "data": rows,
    })


def _wj(action, row=None, *, lsn="0/1", xid=None,
        ts="2024-01-01 00:00:00.123456+00", identity=None):
    d = {"action": action, "schema": "public", "table": "pages",
         "timestamp": ts}
    if lsn is not None:
        d["lsn"] = lsn
    if xid is not None:
        d["xid"] = xid
    if row is not None:
        d["columns"] = [
            {"name": k, "type": "text", "value": v} for k, v in row.items()
        ]
    if identity is not None:
        d["identity"] = [
            {"name": k, "type": "text", "value": v}
            for k, v in identity.items()
        ]
    return json.dumps(d)


def _pg_row(r):
    """wal2json renders bytea hex (``\\x..``) where the others base64."""
    import base64

    out = dict(r)
    if out.get("html") is not None:
        out["html"] = "\\x" + base64.b64decode(out["html"]).hex()
    return out


ROW = {"url": URL, "warc_ts": TSMS, "html": "PGI+", "lang": "en"}
ROW_S = {k: str(v) for k, v in ROW.items()}  # canal stringifies values

DDL = "url STRING, warc_ts BIGINT, html STRING, lang STRING"


def _df(spark, values):
    return spark.createDataFrame([(v,) for v in values], "value string")


def test_maxwell_ops_seq_and_snapshot(spark):
    out = parse_maxwell(_df(spark, [
        _mx("insert", ROW, xid=5, xoffset=0),
        _mx("update", {**ROW, "lang": "de"}, xid=5, xoffset=1),
        _mx("delete", {**ROW, "lang": "fr"}, xid=6, xoffset=0),
        _mx("bootstrap-insert", ROW),              # seq falls back to ts
        _mx("bootstrap-start", None),              # no row: dropped
        "not json at all",                         # garbage: dropped
        _mx("table-create", ROW),                  # DDL noise: dropped
    ]), DDL).orderBy("seq").collect()
    # xid-packed seqs order first; the bootstrap row's ts-seconds
    # fallback (~1.7e9) lands after them
    assert [r["op"] for r in out] == ["I", "U", "D", "I"]
    assert out[3]["is_snapshot"] and out[3]["seq"] == 1704067200
    assert [r["seq"] for r in out[:3]] == [
        5 * (1 << 20), 5 * (1 << 20) + 1, 6 * (1 << 20)
    ]
    assert out[1]["lang"] == "de" and out[2]["lang"] == "fr"
    assert out[0]["src_ts_ms"] == TSMS


def test_canal_batch_explode_and_string_casts(spark):
    rows = [ROW_S, {**ROW_S, "url": URL + "b", "warc_ts": None}]
    out = parse_canal(_df(spark, [
        _cn("INSERT", rows, id_=3),
        _cn("UPDATE", [{**ROW_S, "lang": "de"}], id_=4),
        _cn("DELETE", [ROW_S], id_=5),
        _cn("ALTER", [ROW_S], id_=6, is_ddl=True),   # DDL: dropped
        "",                                          # empty: dropped
    ]), DDL).orderBy("seq").collect()
    assert [r["op"] for r in out] == ["I", "I", "U", "D"]
    # batch rows keep intra-envelope order in seq
    assert [r["seq"] for r in out[:2]] == [3 * (1 << 20), 3 * (1 << 20) + 1]
    assert out[0]["warc_ts"] == TSMS          # "170…" STRING → BIGINT
    assert out[1]["warc_ts"] is None          # JSON null stays NULL
    assert out[2]["lang"] == "de"
    assert all(r["src_ts_ms"] == TSMS for r in out)


def test_ddl_to_schema_changes_subset():
    from embulk_spark.sources.debezium import ddl_to_schema_changes as d

    assert d("ALTER TABLE pages ADD COLUMN score DOUBLE NOT NULL") == [
        {"action": "add", "column": "score", "type": "double"}
    ]
    assert d("alter table `db`.`pages` add rank int(11), drop column old1") == [
        {"action": "add", "column": "rank", "type": "long"},
        {"action": "drop", "column": "old1"},
    ]
    assert d("ALTER TABLE t RENAME COLUMN a TO b") == [
        {"action": "rename", "from": "a", "to": "b"}
    ]
    assert d("ALTER TABLE t MODIFY COLUMN price DECIMAL(10,2)") == [
        {"action": "widen", "column": "price", "to": "double"}
    ]
    assert d("ALTER TABLE t CHANGE `a` `b` BIGINT") == [
        {"action": "rename", "from": "a", "to": "b"},
        {"action": "widen", "column": "b", "to": "long"},
    ]
    assert d("ALTER TABLE t ADD flag TINYINT(1)") == [
        {"action": "add", "column": "flag", "type": "boolean"}
    ]
    # inexpressible DDL must yield nothing, never raise
    assert d("ALTER TABLE t ADD INDEX idx (a)") == []  # matches nothing
    assert d("CREATE TABLE t (a INT)") == []
    assert d("") == [] and d(None) == []


def test_canal_ddl_drives_lake_schema_evolution(spark, tmp_path):
    import json as _json

    from embulk_spark.sources.debezium import canal_schema_change_events
    from embulk_spark.streaming.lake import ParquetLakeTable
    from embulk_spark.streaming.replay import apply_schema_change

    lines = [
        _cn("INSERT", [ROW_S], id_=1),
        _json.dumps({
            "database": "db", "table": "pages", "type": "ALTER",
            "es": TSMS, "ts": TSMS + 5, "id": 2, "isDdl": True,
            "sql": "ALTER TABLE pages ADD COLUMN score DOUBLE",
            "data": None,
        }),
        _cn("UPDATE", [{**ROW_S, "lang": "de"}], id_=3),
    ]
    df = _df(spark, lines)
    ddl_events = canal_schema_change_events(df).orderBy("seq").collect()
    assert len(ddl_events) == 1 and ddl_events[0]["op"] == "S"
    payload = _json.loads(ddl_events[0]["schema_change"])
    assert payload == {"action": "add", "column": "score", "type": "double"}

    table = ParquetLakeTable(spark, str(tmp_path / "t"), n_buckets=2,
                             compact_min_deltas=10_000)
    table.merge_epoch(canal_change_events(df), 0)
    apply_schema_change(table, ddl_events[0]["schema_change"])
    # post-DDL events carry the evolved column end-to-end
    ev = spark.createDataFrame(
        [(99, "U", URL, None, None, "en", 0.7)],
        "seq long, op string, url string, warc_ts timestamp, html binary, "
        "lang string, score double",
    ).withColumn("warc_ts", F.lit("2024-02-01 00:00:00").cast("timestamp"))
    table.merge_epoch(ev, 1, extract=False)
    row = table.published().filter(F.col("url") == URL).collect()[0]
    assert row["score"] == 0.7


def test_wal2json_ops_seq_identity_and_bytea(spark):
    lines = [
        _wj("I", _pg_row(ROW), lsn="0/10"),
        _wj("U", _pg_row({**ROW, "lang": "de"}), lsn="A/2"),
        # delete: replica-identity image only, no columns
        _wj("D", None, identity={"url": URL, "warc_ts": TSMS}, lsn="0/30"),
        # transaction markers / truncate / logical message: filtered
        _wj("B", None, lsn="0/5"),
        _wj("C", None, lsn="0/35"),
        _wj("T", None, lsn="0/36"),
        _wj("M", None, lsn="0/37"),
        # no lsn (include-lsn off): seq falls back to xid
        _wj("I", _pg_row({**ROW, "url": URL + "x"}), lsn=None, xid=777),
        "not json at all",
        "",
    ]
    out = parse_wal2json(_df(spark, lines), DDL).collect()
    # LSN hi/lo packs as hi·2^32+lo ("0/10"→16, "A/2"→10·2^32+2), xid
    # fallback when include-lsn is off; B/C/T/M and garbage drop
    assert {(r["seq"], r["op"]) for r in out} == {
        (16, "I"), (10 * (1 << 32) + 2, "U"), (48, "D"), (777, "I")
    }
    assert {r["src_ts_ms"] for r in out} == {TSMS + 123}
    # delete row image comes from identity; columns absent → lang null
    d = [r for r in out if r["op"] == "D"][0]
    assert d["url"] == URL and d["warc_ts"] == TSMS and d["lang"] is None
    # bytea hex decodes through the adapter
    ev = wal2json_change_events(_df(spark, [lines[0]]))
    assert bytes(ev.collect()[0]["html"]) == b"<b>"


def test_wire_formats_replay_to_identical_state(spark, tmp_path):
    """The same logical change sequence in Debezium, Maxwell, Canal, and
    wal2json wire formats must produce byte-identical lake states."""
    from embulk_spark.sources.debezium import debezium_change_events
    from embulk_spark.streaming.lake import ParquetLakeTable

    def dz(op, row, pos):
        p = {"op": op, "ts_ms": TSMS, "source": {"ts_ms": TSMS, "pos": pos}}
        p["before" if op == "d" else "after"] = row
        return json.dumps(p)

    logical = [  # (op-ish, row, order)
        ("I", ROW, 1),
        ("U", {**ROW, "lang": "de", "warc_ts": TSMS + 1000}, 2),
        ("I", {**ROW, "url": URL + "2"}, 3),
        ("D", {**ROW, "url": URL + "2", "warc_ts": TSMS + 2000}, 4),
    ]
    dz_lines = [dz({"I": "c", "U": "u", "D": "d"}[o], r, s)
                for o, r, s in logical]
    mx_lines = [
        _mx({"I": "insert", "U": "update", "D": "delete"}[o], r, xid=s,
            xoffset=0)
        for o, r, s in logical
    ]
    cn_lines = [
        _cn({"I": "INSERT", "U": "UPDATE", "D": "DELETE"}[o],
            [{k: (None if v is None else str(v)) for k, v in r.items()}],
            id_=s)
        for o, r, s in logical
    ]
    wj_lines = [
        _wj({"I": "I", "U": "U", "D": "D"}[o],
            _pg_row(r) if o != "D" else None,
            identity=_pg_row(r) if o == "D" else None,
            lsn=f"0/{s:X}")
        for o, r, s in logical
    ]
    states = []
    for name, lines, adapter in (
        ("dz", dz_lines, debezium_change_events),
        ("mx", mx_lines, maxwell_change_events),
        ("cn", cn_lines, canal_change_events),
        ("wj", wj_lines, wal2json_change_events),
    ):
        ev = adapter(_df(spark, lines))
        table = ParquetLakeTable(spark, str(tmp_path / name), n_buckets=2,
                                 compact_min_deltas=10_000)
        table.merge_epoch(ev, 0)
        states.append(sorted(
            (r["url"], r["lang"], r["text"], r["warc_ts"])
            for r in table.published().collect()
        ))
    assert states[0] == states[1] == states[2] == states[3]
    assert len(states[0]) == 1  # url2 deleted; url1 survives as 'de'
    assert states[0][0][1] == "de"


def _mo(op, o=None, o2=None, *, t=1700000000, i=1, ns="web.pages"):
    return json.dumps({
        "ts": {"$timestamp": {"t": t, "i": i}},
        "op": op, "ns": ns,
        **({"o": o} if o is not None else {}),
        **({"o2": o2} if o2 is not None else {}),
    })


def test_mongo_oplog_ops_images_and_ns_filter(spark):
    from embulk_spark.sources.debezium import parse_mongo_oplog

    lines = [
        _mo("i", {"url": "u1", "warc_ts": TSMS, "lang": "en"}, i=1),
        # $set partial: only lang touched; key rides in o2
        _mo("u", {"$set": {"lang": "de"}}, {"url": "u1"}, i=2),
        # replace-style update: full doc in o, key in o2
        _mo("u", {"url": "u2", "warc_ts": TSMS + 1, "lang": "fr"},
            {"url": "u2"}, i=3),
        _mo("d", {"url": "u1"}, i=4),
        _mo("n", {"msg": "noop"}, i=5),                       # dropped
        _mo("c", {"create": "pages"}, i=6),                   # dropped
        _mo("i", {"url": "ux"}, ns="other.coll", i=7),        # ns-filtered
        "garbage line",
    ]
    out = parse_mongo_oplog(
        _df(spark, lines), "url STRING, warc_ts BIGINT, lang STRING",
        ns="web.pages",
    ).collect()
    by_seq = {r["seq"] - (1700000000 << 32): r for r in out}
    assert sorted(by_seq) == [1, 2, 3, 4]
    assert by_seq[1]["op"] == "I" and by_seq[1]["lang"] == "en"
    p = by_seq[2]
    assert p["op"] == "U" and p["is_partial"]
    assert p["url"] == "u1" and p["lang"] == "de" and p["warc_ts"] is None
    r = by_seq[3]
    assert r["op"] == "U" and not r["is_partial"] and r["lang"] == "fr"
    d = by_seq[4]
    assert d["op"] == "D" and d["url"] == "u1"
    assert {r["src_ts_ms"] for r in out} == {1700000000 * 1000}


def test_mongo_oplog_set_stream_through_patch_merge(spark):
    """$set partial updates resolve with the column-level patch merge:
    each column keeps its latest setter, a delete fences history."""
    from embulk_spark.operators.merge import patch_latest_per_key
    from embulk_spark.sources.debezium import parse_mongo_oplog

    lines = [
        _mo("i", {"url": "u1", "warc_ts": 10, "lang": "en"}, i=1),
        _mo("u", {"$set": {"lang": "de"}}, {"url": "u1"}, i=2),
        _mo("u", {"$set": {"warc_ts": 99}}, {"url": "u1"}, i=3),
        _mo("i", {"url": "u2", "warc_ts": 20, "lang": "fr"}, i=4),
        _mo("d", {"url": "u2"}, i=5),
        _mo("u", {"$set": {"lang": "it"}}, {"url": "u2"}, i=6),
    ]
    ev = parse_mongo_oplog(
        _df(spark, lines), "url STRING, warc_ts BIGINT, lang STRING"
    ).withColumn("op", F.when(F.col("op") == "D", "D").otherwise("U"))
    final = patch_latest_per_key(
        ev, key="url", order=["seq"], payload=["warc_ts", "lang"]
    )
    got = {r["url"]: (r["warc_ts"], r["lang"], r["is_deleted"])
           for r in final.collect()}
    # u1: lang from seq 2, warc_ts from seq 3 — per-column latest setter
    assert got["u1"] == (99, "de", False)
    # u2: delete fences the insert; the later $set rebuilds lang only
    assert got["u2"] == (None, "it", False)


# ---------------------------------------------------------------------------
# DynamoDB Streams
# ---------------------------------------------------------------------------

def test_dynamodb_stream_typed_decode(spark):
    from embulk_spark.sources.debezium import parse_dynamodb_stream

    recs = [
        # INSERT: full typed image
        '{"eventName":"INSERT","dynamodb":{"ApproximateCreationDateTime":1700000000.5,'
        '"Keys":{"pk":{"S":"u1"}},'
        '"NewImage":{"pk":{"S":"u1"},"n":{"N":"42"},"score":{"N":"1.5"},'
        '"ok":{"BOOL":true},"blob":{"B":"aGk="},"gone":{"NULL":true}},'
        '"SequenceNumber":"101"}}',
        # MODIFY: new image wins
        '{"eventName":"MODIFY","dynamodb":{"ApproximateCreationDateTime":1700000001,'
        '"Keys":{"pk":{"S":"u1"}},'
        '"NewImage":{"pk":{"S":"u1"},"n":{"N":"43"},"ok":{"BOOL":false}},'
        '"OldImage":{"pk":{"S":"u1"},"n":{"N":"42"}},'
        '"SequenceNumber":"102"}}',
        # REMOVE: tombstone, key only
        '{"eventName":"REMOVE","dynamodb":{"ApproximateCreationDateTime":1700000002,'
        '"Keys":{"pk":{"S":"u2"}},"OldImage":{"pk":{"S":"u2"}},'
        '"SequenceNumber":"103"}}',
        # control-record noise a parser must drop
        '{"eventName":"ENABLE","dynamodb":{}}',
        "",
    ]
    df = spark.createDataFrame([(r,) for r in recs], "value string")
    rows = parse_dynamodb_stream(
        df,
        "pk string, n bigint, score double, ok boolean, blob binary, gone string",
    ).collect()
    assert [r.op for r in rows] == ["I", "U", "D"]
    ins, mod, rem = rows
    assert ins.pk == "u1" and ins.n == 42 and ins.score == 1.5
    assert ins.ok is True and bytes(ins.blob) == b"hi"
    assert ins.gone is None  # NULL:true marker
    assert ins.seq == 101 and ins.seq_str == "101"
    assert ins.src_ts_ms == 1700000000500
    assert mod.n == 43 and mod.ok is False
    assert mod.score is None  # absent from image → NULL
    assert rem.pk == "u2" and rem.n is None  # tombstone: keys only
    assert not ins.is_partial and not ins.is_snapshot


def test_dynamodb_stream_oversize_seq_falls_to_str(spark):
    from embulk_spark.sources.debezium import parse_dynamodb_stream

    rec = (
        '{"eventName":"INSERT","dynamodb":{"ApproximateCreationDateTime":1,'
        '"Keys":{"pk":{"S":"x"}},"NewImage":{"pk":{"S":"x"}},'
        '"SequenceNumber":"4950011926370664446942202864401"}}'
    )
    df = spark.createDataFrame([(rec,)], "value string")
    row = parse_dynamodb_stream(df, "pk string").collect()[0]
    assert row.seq is None  # beyond bigint — cast nulls out
    assert row.seq_str == "4950011926370664446942202864401"
