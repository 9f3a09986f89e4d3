"""Avro Object Container File parser (embulk-parser-avro analogue)."""

from __future__ import annotations

import pytest

from embulk_spark.sources.avro import iter_container, write_container

SCHEMA = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
    ],
}

RECORDS = [
    {"id": 1, "name": "alpha", "score": 1.5, "ok": True, "tags": ["x", "y"]},
    {"id": -(2**40), "name": None, "score": -0.25, "ok": False, "tags": []},
    {"id": 2**62, "name": "ü†", "score": 0.0, "ok": True, "tags": ["z"]},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(codec):
    blob = write_container(SCHEMA, RECORDS, codec=codec)
    assert list(iter_container(blob)) == RECORDS


def test_container_rejects_garbage():
    with pytest.raises(ValueError):
        list(iter_container(b"NotAvro"))
    blob = write_container(SCHEMA, RECORDS)
    with pytest.raises(ValueError):
        list(iter_container(blob[:-5]))  # torn sync marker


def test_varint_edge_widths():
    schema = {"type": "record", "name": "N", "fields": [
        {"name": "v", "type": "long"}]}
    vals = [0, -1, 1, 63, -64, 64, 2**31, -(2**31) - 1, 2**63 - 1, -(2**63)]
    blob = write_container(schema, [{"v": v} for v in vals])
    assert [r["v"] for r in iter_container(blob)] == vals


def test_read_avro_with_declared_columns(spark, tmp_path):
    from embulk_spark.sources.files import read_input_files

    (tmp_path / "d.avro").write_bytes(
        write_container(SCHEMA, RECORDS, codec="deflate")
    )
    df, _ = read_input_files(
        spark,
        {
            "path_prefix": str(tmp_path / "d"),
            "parser": {
                "type": "avro",
                "columns": [
                    {"name": "id", "type": "long"},
                    {"name": "name", "type": "string"},
                    {"name": "score", "type": "double"},
                    {"name": "ok", "type": "boolean"},
                    {"name": "tags", "type": "json"},
                    {"name": "missing", "type": "string"},
                ],
            },
        },
    )
    got = sorted(df.collect(), key=lambda r: r.id)
    assert [r.id for r in got] == sorted(r["id"] for r in RECORDS)
    by_id = {r.id: r for r in got}
    assert by_id[1].name == "alpha" and by_id[1].tags == '["x","y"]'
    assert by_id[-(2**40)].name is None
    assert all(r.missing is None for r in got)
