"""MessagePack codec + parser plugin (embulk-parser-msgpack analogue)."""

from __future__ import annotations

import math

import pytest

from embulk_spark.sources.msgpack import iter_values, pack_one, unpack_one

PARSER = {
    "type": "msgpack",
    "columns": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
    ],
}


def test_codec_roundtrip_all_widths():
    cases = [
        None, True, False,
        0, 1, 127, 128, 255, 256, 65535, 65536, 2**32, 2**63 - 1,
        -1, -32, -33, -128, -129, -32768, -32769, -(2**31) - 1, -(2**63),
        0.0, 1.5, -2.25, 1e300,
        "", "a", "x" * 31, "y" * 32, "z" * 300, "ü†🎉",
        b"", b"\x00\xff", b"b" * 300,
        [], [1, "two", None, [3.5]], list(range(20)),
        {}, {"k": 1, "nested": {"a": [True]}},
    ]
    for v in cases:
        got, p = unpack_one(pack_one(v))
        assert got == v, v
    # stream of several values
    blob = b"".join(pack_one(v) for v in [1, "two", {"three": 3}])
    assert list(iter_values(blob)) == [1, "two", {"three": 3}]


def test_codec_rejects_truncation():
    blob = pack_one({"key": "value"})
    with pytest.raises(ValueError):
        unpack_one(blob[:-3])
    with pytest.raises(ValueError):
        unpack_one(b"")


def test_codec_ext_passthrough():
    # fixext4 type -1 (the msgpack timestamp ext): decoded as (code, bytes)
    blob = b"\xd6\xff\x00\x00\x01\x00"
    v, p = unpack_one(blob)
    assert v == (-1, b"\x00\x00\x01\x00") and p == len(blob)


def test_parse_map_rows_sequence_file(spark, tmp_path):
    from embulk_spark.sources.files import read_input_files

    recs = [
        {"id": 1, "name": "alpha", "score": 1.5, "ok": True, "extra": "zz"},
        {"id": 2, "name": None, "score": None, "ok": False},
        {"name": "gamma", "id": 3},  # key order must not matter
    ]
    (tmp_path / "d.msgpack").write_bytes(b"".join(pack_one(r) for r in recs))
    df, _ = read_input_files(
        spark, {"path_prefix": str(tmp_path / "d"), "parser": PARSER}
    )
    got = sorted(df.collect(), key=lambda r: r.id)
    assert [(r.id, r.name, r.score, r.ok) for r in got] == [
        (1, "alpha", 1.5, True),
        (2, None, None, False),
        (3, "gamma", None, None),
    ]


def test_parse_array_rows_array_file(spark, tmp_path):
    from embulk_spark.sources.msgpack import read_msgpack

    rows = [[1, "a", 0.5, True], [2, "b", 1.5, False]]
    (tmp_path / "d.msgpack").write_bytes(pack_one(rows))
    parser = dict(PARSER, row_encoding="array", file_encoding="array")
    got = sorted(
        read_msgpack(spark, [str(tmp_path / "d.msgpack")], parser).collect(),
        key=lambda r: r.id,
    )
    assert [(r.id, r.name) for r in got] == [(1, "a"), (2, "b")]


def test_parse_type_lenience_and_json(spark, tmp_path):
    from embulk_spark.sources.msgpack import read_msgpack

    parser = {
        "type": "msgpack",
        "columns": [
            {"name": "id", "type": "long"},
            {"name": "payload", "type": "json"},
        ],
    }
    recs = [{"id": "not-a-number", "payload": {"b": [1, 2], "a": True}}]
    (tmp_path / "d.msgpack").write_bytes(b"".join(pack_one(r) for r in recs))
    r = read_msgpack(spark, [str(tmp_path / "d.msgpack")], parser).collect()[0]
    assert r.id is None  # string-setter lenience: wrong shape → null
    assert r.payload == '{"a":true,"b":[1,2]}'  # canonical sorted-key json
