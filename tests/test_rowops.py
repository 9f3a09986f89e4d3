"""Ecosystem filter plugins (row / column / typecast / add_time /
expand_json) and the regexp parser."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from embulk_spark.operators.rowops import (
    add_time,
    column_ops,
    expand_json,
    row_filter,
    typecast_columns,
)
from embulk_spark.pipeline import apply_filter
from embulk_spark.sources.files import parse_regexp_column, read_regexp

UTC = dt.timezone.utc


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [
            Row(id=1, name="alpha", score=3.5, ts=dt.datetime(2026, 1, 1, 0, 0, 0)),
            Row(id=2, name="beta", score=None, ts=dt.datetime(2026, 1, 2, 0, 0, 0)),
            Row(id=3, name="gamma", score=9.0, ts=dt.datetime(2026, 1, 3, 0, 0, 0)),
            Row(id=4, name=None, score=1.0, ts=dt.datetime(2026, 1, 4, 0, 0, 0)),
        ]
    )


# ---------------------------------------------------------------------------
# filter-row
# ---------------------------------------------------------------------------

def test_row_filter_and(frame):
    out = row_filter(
        frame,
        [
            {"column": "score", "operator": ">=", "argument": 3},
            {"column": "name", "operator": "start_with", "argument": "a"},
        ],
    )
    assert [r.id for r in out.collect()] == [1]


def test_row_filter_or_and_not(frame):
    out = row_filter(
        frame,
        [
            {"column": "name", "operator": "==", "argument": "beta"},
            {"column": "score", "operator": ">", "argument": 5, "not": True},
        ],
        condition="OR",
    )
    # not(score>5) keeps score<=5 and NULL scores → ids 1,2,4; OR beta adds nothing new
    assert sorted(r.id for r in out.collect()) == [1, 2, 4]


def test_row_filter_null_timestamp_regexp(frame):
    out = row_filter(frame, [{"column": "name", "operator": "IS NOT NULL"}])
    assert out.count() == 3
    out = row_filter(
        frame,
        [{"column": "ts", "operator": ">", "argument": "2026-01-02 00:00:00"}],
    )
    assert sorted(r.id for r in out.collect()) == [3, 4]
    out = row_filter(frame, [{"column": "name", "operator": "regexp", "argument": "a$"}])
    assert sorted(r.id for r in out.collect()) == [1, 2, 3]


def test_row_filter_unknown_operator(frame):
    with pytest.raises(ValueError):
        row_filter(frame, [{"column": "id", "operator": "~~", "argument": 1}])


# ---------------------------------------------------------------------------
# filter-column
# ---------------------------------------------------------------------------

def test_column_keep_reorder_default(frame):
    out = column_ops(
        frame,
        columns=[
            {"name": "name"},
            {"name": "id"},
            {"name": "source", "type": "string", "default": "crawl"},
        ],
    )
    assert out.columns == ["name", "id", "source"]
    assert out.select("source").distinct().collect()[0][0] == "crawl"


def test_column_add_src_and_drop(frame):
    out = column_ops(
        frame,
        add_columns=[{"name": "label", "src": "name"}],
        drop_columns=[{"name": "ts"}, "score"],
    )
    assert out.columns == ["id", "name", "label"]
    assert out.filter("label = name OR (label IS NULL AND name IS NULL)").count() == 4


# ---------------------------------------------------------------------------
# filter-typecast
# ---------------------------------------------------------------------------

def test_typecast_setter_semantics(spark):
    df = spark.createDataFrame(
        [Row(n="42", f="1.5", b="true", t="2026-02-03 04:05:06", junk="xx")]
    )
    out = typecast_columns(
        df,
        [
            {"name": "n", "type": "long"},
            {"name": "f", "type": "double"},
            {"name": "b", "type": "boolean"},
            {"name": "t", "type": "timestamp"},
            {"name": "junk", "type": "long"},
        ],
    ).collect()[0]
    assert out.n == 42 and out.f == 1.5 and out.b is True
    assert out.t == dt.datetime(2026, 2, 3, 4, 5, 6)
    assert out.junk is None  # setter policy: failed cast nulls, never errors


def test_typecast_numeric_down_and_up(frame):
    out = typecast_columns(
        frame, [{"name": "score", "type": "long"}, {"name": "id", "type": "string"}]
    )
    rows = {r.id: r.score for r in out.collect()}
    assert rows["1"] == 4  # 3.5 rounds half-up like LongColumnSetter
    assert rows["2"] is None


# ---------------------------------------------------------------------------
# filter-add_time
# ---------------------------------------------------------------------------

def test_add_time_from_value_and_column(frame):
    out = add_time(
        frame,
        {
            "to_column": {"name": "ingest_ts", "type": "timestamp"},
            "from_value": {"value": "2026-08-20 00:00:00"},
        },
    )
    assert out.select("ingest_ts").distinct().collect()[0][0] == dt.datetime(
        2026, 8, 20
    )
    out = add_time(
        frame,
        {"to_column": {"name": "t2", "type": "timestamp"}, "from_column": {"name": "ts"}},
    )
    assert out.filter("t2 = ts").count() == 4


# ---------------------------------------------------------------------------
# filter-expand_json
# ---------------------------------------------------------------------------

def test_expand_json_with_root_and_types(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, record='{"meta": {"n": "7", "when": "2026-01-05 00:00:00", "tag": "x"}}'),
            Row(id=2, record='{"meta": {"n": "bad", "tag": "y"}}'),
        ]
    )
    out = expand_json(
        df,
        "record",
        [
            {"name": "n", "type": "long"},
            {"name": "when", "type": "timestamp"},
            {"name": "tag", "type": "string"},
        ],
        root="/meta",
    )
    assert out.columns == ["id", "n", "when", "tag"]
    rows = {r.id: r for r in out.collect()}
    assert rows[1].n == 7 and rows[1].when == dt.datetime(2026, 1, 5)
    assert rows[2].n is None and rows[2].when is None and rows[2].tag == "y"


def test_expand_json_keep(spark):
    df = spark.createDataFrame([Row(record='{"a": 1}')])
    out = expand_json(df, "record", [{"name": "a", "type": "long"}], keep=True)
    assert out.columns == ["record", "a"]


# ---------------------------------------------------------------------------
# parser-regexp
# ---------------------------------------------------------------------------

CLF_PATTERN = (
    r'^(\S+) \S+ \S+ \[([^\]]+)\] "(\S+) (\S+)[^"]*" (\d+) (\d+|-)'
)
CLF_COLUMNS = [
    {"name": "host", "type": "string"},
    {"name": "time", "type": "timestamp", "format": "%d/%b/%Y:%H:%M:%S %z"},
    {"name": "method", "type": "string"},
    {"name": "path", "type": "string"},
    {"name": "code", "type": "long"},
    {"name": "size", "type": "long"},
]

LOG_LINES = [
    '10.0.0.1 - - [05/Feb/2026:10:00:00 +0000] "GET /index.html HTTP/1.1" 200 512',
    '10.0.0.2 - - [05/Feb/2026:10:00:01 +0000] "POST /submit HTTP/1.1" 302 -',
    "this line does not match at all",
]


def test_parse_regexp_clf(spark, tmp_path):
    p = tmp_path / "access.log"
    p.write_text("\n".join(LOG_LINES) + "\n")
    out = read_regexp(
        spark, [str(p)], {"format": CLF_PATTERN, "columns": CLF_COLUMNS}
    ).orderBy("host")
    rows = out.collect()
    assert len(rows) == 2  # the junk line is skipped
    assert rows[0].host == "10.0.0.1" and rows[0].code == 200 and rows[0].size == 512
    assert rows[0].method == "GET" and rows[0].path == "/index.html"
    assert rows[0].time == dt.datetime(2026, 2, 5, 10, 0, 0)
    assert rows[1].size is None  # "-" nulls through the long setter


def test_parse_regexp_column_on_frame(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([Row(line="k=alpha v=12"), Row(line="k=beta v=nope")])
    out = parse_regexp_column(
        df,
        F.col("line"),
        r"^k=(\w+) v=(\w+)$",
        [{"name": "k", "type": "string"}, {"name": "v", "type": "long"}],
    )
    rows = {r.k: r.v for r in out.collect()}
    assert rows == {"alpha": 12, "beta": None}


# ---------------------------------------------------------------------------
# pipeline dispatch
# ---------------------------------------------------------------------------

def test_apply_filter_dispatch(frame):
    out = apply_filter(
        frame,
        {
            "type": "row",
            "conditions": [{"column": "id", "operator": "<=", "argument": 2}],
        },
    )
    assert out.count() == 2
    out = apply_filter(frame, {"type": "typecast", "columns": [{"name": "id", "type": "string"}]})
    assert dict(out.dtypes)["id"] == "string"
    out = apply_filter(
        frame,
        {
            "type": "add_time",
            "to_column": {"name": "at"},
            "from_value": {"value": "2026-01-01 00:00:00"},
        },
    )
    assert "at" in out.columns
    out = apply_filter(frame, {"type": "column", "drop_columns": [{"name": "ts"}]})
    assert "ts" not in out.columns


# ---------------------------------------------------------------------------
# filter-hash / filter-gsub / filter-split / ltsv parser
# ---------------------------------------------------------------------------

def test_hash_columns_plain_and_salted(frame):
    import hashlib

    from embulk_spark.operators.rowops import hash_columns

    out = hash_columns(
        frame,
        [
            {"name": "name", "algorithm": "sha256"},
            {"name": "id", "algorithm": "md5", "secret_key": "s3",
             "new_name": "id_h"},
        ],
    ).collect()
    by_id = {}
    for r in out:
        assert not hasattr(r, "id")  # renamed away
        by_id[r.id_h] = r
    exp_name = hashlib.sha256(b"alpha").hexdigest()
    exp_id = hashlib.md5(b"s31").hexdigest()
    assert exp_id in by_id and by_id[exp_id].name == exp_name
    # null input stays null
    assert any(r.name is None for r in out)


def test_hash_columns_unknown_algo(frame):
    from embulk_spark.operators.rowops import hash_columns

    with pytest.raises(ValueError):
        hash_columns(frame, [{"name": "name", "algorithm": "crc99"}]).collect()


def test_gsub_columns(frame):
    from embulk_spark.operators.rowops import gsub_columns

    out = gsub_columns(frame, [{"name": "name", "pattern": "[aeiou]", "to": "*"}])
    got = {r.id: r.name for r in out.collect()}
    assert got[1] == "*lph*" and got[3] == "g*mm*"


def test_split_rows(spark):
    from embulk_spark.operators.rowops import split_rows

    df = spark.createDataFrame(
        [Row(id=1, tags="a, b ,c"), Row(id=2, tags="x"), Row(id=3, tags=None)]
    )
    out = split_rows(df, "tags")
    got = sorted((r.id, r.tags) for r in out.collect())
    assert got == [(1, "a"), (1, "b"), (1, "c"), (2, "x")]  # null row drops
    kept = split_rows(df, "tags", keep_column=True)
    assert set(kept.columns) == {"id", "tags", "tags_elem"}


def test_parse_ltsv(spark, tmp_path):
    from embulk_spark.sources.files import read_ltsv

    p = tmp_path / "log.ltsv"
    p.write_text(
        "host:h1\tcode:200\tsize:12\n"
        "host:h2\tcode:404\n"              # size absent → null
        "host:h3\tcode:xx\tsize:9\tcode:500\n"  # dup label: last wins
    )
    out = read_ltsv(
        spark, [str(p)],
        {"columns": [
            {"name": "host", "type": "string"},
            {"name": "code", "type": "long"},
            {"name": "size", "type": "long"},
        ]},
    )
    got = {r.host: (r.code, r.size) for r in out.collect()}
    assert got == {"h1": (200, 12), "h2": (404, None), "h3": (500, 9)}


def test_pipeline_dispatch_new_filters(spark):
    df = spark.createDataFrame([Row(id=1, email="a@b.c", tags="x,y")])
    out = apply_filter(df, {"type": "hash", "columns": [
        {"name": "email", "algorithm": "sha256"}]})
    assert out.collect()[0].email != "a@b.c"
    out = apply_filter(df, {"type": "gsub", "columns": [
        {"name": "email", "pattern": "@.*", "to": "@redacted"}]})
    assert out.collect()[0].email == "a@redacted"
    out = apply_filter(df, {"type": "split", "target_key": "tags"})
    assert out.count() == 2


# ---------------------------------------------------------------------------
# parser-poslen / parser-none
# ---------------------------------------------------------------------------

def test_parse_poslen(spark, tmp_path):
    from embulk_spark.sources.files import read_poslen

    p = tmp_path / "fixed.dat"
    p.write_text(
        "0001alpha     0200\n"
        "0002beta      04xx\n"   # bad numeric tail → null
        "0003          0500\n"   # blank name → '' after trim
    )
    cols = [
        {"name": "id", "type": "long", "pos": 0, "len": 4},
        {"name": "name", "type": "string", "pos": 4, "len": 10},
        {"name": "code", "type": "long", "pos": 14, "len": 4},
    ]
    out = read_poslen(spark, [str(p)], {"columns": cols})
    got = {r.id: (r.name, r.code) for r in out.collect()}
    assert got == {1: ("alpha", 200), 2: ("beta", None), 3: ("", 500)}
    # trim: false keeps the pad bytes on strings
    raw = read_poslen(spark, [str(p)], {"columns": cols, "trim": False})
    assert raw.collect()[0].name == "alpha     "


def test_parser_none_passthrough(spark, tmp_path):
    from embulk_spark.sources.files import read_input_files

    p = tmp_path / "raw.log"
    p.write_text("line one\nline two\n")
    df, _ = read_input_files(
        spark, {"path_prefix": str(p), "parser": {"type": "none"}}
    )
    assert df.columns == ["payload"]
    assert {r.payload for r in df.collect()} == {"line one", "line two"}


# ---------------------------------------------------------------------------
# filter-base64 / filter-join_file
# ---------------------------------------------------------------------------

def test_base64_roundtrip(spark):
    df = spark.createDataFrame([Row(id=1, tok="hello"), Row(id=2, tok=None)])
    enc = apply_filter(df, {"type": "base64", "columns": [
        {"name": "tok", "encode": True}]})
    assert {r.tok for r in enc.collect()} == {"aGVsbG8=", None}
    dec = apply_filter(enc, {"type": "base64", "columns": [
        {"name": "tok", "decode": True}]})
    assert {r.tok for r in dec.collect()} == {"hello", None}
    # invalid base64 nulls out (setter policy), never errors
    bad = spark.createDataFrame([Row(tok="!!not-base64!!")])
    out = apply_filter(bad, {"type": "base64", "columns": [
        {"name": "tok", "decode": True}]})
    assert out.collect()[0].tok is None


def test_join_file_inline_broadcast(spark):
    df = spark.createDataFrame(
        [Row(id=1, host="a.com"), Row(id=2, host="b.org"), Row(id=3, host="nix")]
    )
    conf = {
        "type": "join_file",
        "on": [{"base": "host", "file": "domain"}],
        "columns": [
            {"name": "domain", "type": "string"},
            {"name": "owner", "type": "string"},
        ],
        "data": [
            {"domain": "a.com", "owner": "alice"},
            {"domain": "b.org", "owner": "bob"},
            {"domain": "a.com", "owner": "zed"},  # dup key: first-wins (min)
        ],
        "prefix": "m_",
    }
    out = apply_filter(df, conf)
    got = {r.id: r.m_owner for r in out.collect()}
    assert got == {1: "alice", 2: "bob", 3: None}
    # the lookup side must be broadcast — the stream never shuffles
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # inner drops unmatched
    inner = apply_filter(df, {**conf, "join": "inner"})
    assert {r.id for r in inner.collect()} == {1, 2}


def test_join_file_from_csv(spark, tmp_path):
    side = tmp_path / "master.csv"
    side.write_text("a.com,alice\nb.org,bob\n")
    df = spark.createDataFrame([Row(host="a.com"), Row(host="c.net")])
    out = apply_filter(df, {
        "type": "join_file",
        "on": [{"base": "host", "file": "domain"}],
        "file_path_prefix": str(side),
        "parser": {
            "type": "csv",
            "header_line": False,
            "columns": [
                {"name": "domain", "type": "string"},
                {"name": "owner", "type": "string"},
            ],
        },
    })
    got = {r.host: r.owner for r in out.collect()}
    assert got == {"a.com": "alice", "c.net": None}


def test_flatten_json_array(spark):
    from embulk_spark.operators.rowops import flatten_json

    df = spark.createDataFrame(
        [
            Row(id=1, rec='{"items": [{"sku": "a", "qty": 2}, {"sku": "b", "qty": 3}]}'),
            Row(id=2, rec='{"items": []}'),
            Row(id=3, rec='{"other": 1}'),     # pointer misses → dropped
            Row(id=4, rec="not json"),         # garbage → dropped
        ]
    )
    out = flatten_json(
        df, "rec", "/items",
        [{"name": "sku", "type": "string"}, {"name": "qty", "type": "long"}],
    )
    got = {(r.id, r.sku, r.qty) for r in out.collect()}
    assert got == {(1, "a", 2), (1, "b", 3)}
    assert out.columns == ["id", "sku", "qty"]
    # dispatch via pipeline config
    out2 = apply_filter(df, {
        "type": "flatten_json", "json_column_name": "rec",
        "array_root": "/items",
        "expanded_columns": [{"name": "sku", "type": "string"}],
    })
    assert {r.sku for r in out2.collect()} == {"a", "b"}


def test_flatten_json_root_array_default(spark):
    """Config omitting array_root flattens a ROOT-level array (RFC 6901
    root = empty pointer, not '/')."""
    df = spark.createDataFrame([Row(rec='[{"v": 1}, {"v": 2}]')])
    out = apply_filter(df, {
        "type": "flatten_json", "json_column_name": "rec",
        "expanded_columns": [{"name": "v", "type": "long"}],
    })
    assert sorted(r.v for r in out.collect()) == [1, 2]


def test_eval_same_column_twice_last_wins(spark):
    df = spark.createDataFrame([Row(x=1)])
    out = apply_filter(df, {"type": "eval", "columns": [
        {"name": "y", "expr": "x + 1"},
        {"name": "y", "expr": "y * 10"},  # references the first
    ]})
    assert out.collect()[0].y == 20
