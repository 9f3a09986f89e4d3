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


# ---------------------------------------------------------------------------
# schema resolution (Avro spec "Schema Resolution"): reader-schema
# evolution against files written under an older/newer writer schema
# ---------------------------------------------------------------------------

W_SCHEMA = {
    "type": "record",
    "name": "Page",
    "fields": [
        {"name": "id", "type": "int"},
        {"name": "title", "type": "string"},
        {"name": "score", "type": "float"},
        {"name": "legacy", "type": "string"},  # dropped by the reader
        {"name": "opt", "type": ["null", "int"]},
        {"name": "kind", "type": {"type": "enum", "name": "K",
                                  "symbols": ["A", "B", "NEW"]}},
    ],
}

W_RECORDS = [
    {"id": 7, "title": "t1", "score": 1.5, "legacy": "x", "opt": 3,
     "kind": "A"},
    {"id": 8, "title": "t2", "score": 2.5, "legacy": "y", "opt": None,
     "kind": "NEW"},
]


def _resolve_all(reader):
    blob = write_container(W_SCHEMA, W_RECORDS)
    return list(iter_container(blob, reader_schema=reader))


def test_resolution_promotions_defaults_aliases_drops():
    reader = {
        "type": "record",
        "name": "Page",
        "fields": [
            {"name": "id", "type": "long"},              # int → long
            {"name": "headline", "type": "string",
             "aliases": ["title"]},                      # renamed field
            {"name": "score", "type": "double"},         # float → double
            {"name": "opt", "type": ["null", "long"]},   # union promote
            {"name": "lang", "type": "string",
             "default": "und"},                          # new w/ default
            {"name": "weights", "type": {"type": "array",
                                         "items": "double"},
             "default": [1.0]},                          # complex default
            {"name": "kind",
             "type": {"type": "enum", "name": "K", "symbols": ["A", "B"],
                      "default": "A"}},                  # enum default
        ],
    }
    out = _resolve_all(reader)
    assert out[0] == {
        "id": 7, "headline": "t1", "score": 1.5, "opt": 3, "lang": "und",
        "weights": [1.0], "kind": "A",
    }
    # unknown writer symbol falls to the reader's enum default; null
    # union branch survives; 'legacy' is gone
    assert out[1]["kind"] == "A" and out[1]["opt"] is None
    assert "legacy" not in out[1]
    assert isinstance(out[0]["id"], int) and isinstance(out[0]["score"], float)


def test_resolution_string_bytes_promotions():
    w = {"type": "record", "name": "R",
         "fields": [{"name": "s", "type": "string"},
                    {"name": "b", "type": "bytes"}]}
    blob = write_container(w, [{"s": "héllo", "b": b"\x01\x02"}])
    r = {"type": "record", "name": "R",
         "fields": [{"name": "s", "type": "bytes"},
                    {"name": "b", "type": "string"}]}
    (rec,) = iter_container(blob, reader_schema=r)
    assert rec["s"] == "héllo".encode() and rec["b"] == "\x01\x02"


def test_resolution_missing_default_errors():
    reader = {
        "type": "record", "name": "Page",
        "fields": [{"name": "nope", "type": "string"}],
    }
    blob = write_container(W_SCHEMA, W_RECORDS)
    with pytest.raises(ValueError, match="no default"):
        list(iter_container(blob, reader_schema=reader))


def test_resolution_incompatible_primitive_errors():
    reader = {
        "type": "record", "name": "Page",
        "fields": [{"name": "score", "type": "long"}],  # float → long: no
    }
    blob = write_container(W_SCHEMA, W_RECORDS)
    with pytest.raises(ValueError, match="does not resolve"):
        list(iter_container(blob, reader_schema=reader))


def test_read_avro_reader_schema_end_to_end(spark, tmp_path):
    """parser config: reader_schema + declared columns compose — the
    evolved shape lands as typed Spark columns."""
    from embulk_spark.sources.avro import read_avro

    p = tmp_path / "f.avro"
    p.write_bytes(write_container(W_SCHEMA, W_RECORDS))
    reader = {
        "type": "record", "name": "Page",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "headline", "type": "string", "aliases": ["title"]},
            {"name": "lang", "type": "string", "default": "und"},
        ],
    }
    out = read_avro(
        spark, [str(p)],
        {"reader_schema": reader,
         "columns": [
             {"name": "id", "type": "long"},
             {"name": "headline", "type": "string"},
             {"name": "lang", "type": "string"},
         ]},
    ).orderBy("id").collect()
    assert [(r["id"], r["headline"], r["lang"]) for r in out] == [
        (7, "t1", "und"), (8, "t2", "und"),
    ]


def test_union_named_branches_match_by_fullname():
    """A reader union with two record branches must pick the branch whose
    fullname (or alias) matches the writer record — not the first record
    branch (spec: named types match by name, not kind)."""
    cat = {"type": "record", "name": "Cat", "fields": [
        {"name": "meow", "type": "string"}]}
    dog = {"type": "record", "name": "Dog", "fields": [
        {"name": "bark", "type": "string"}]}
    w_schema = {"type": "record", "name": "Pet", "fields": [
        {"name": "p", "type": dog}]}
    blob = write_container(w_schema, [{"p": {"bark": "woof"}}])

    # reader union lists Cat FIRST; writer wrote a Dog — must resolve to
    # the Dog branch (kind-only matching would pick Cat and mis-decode)
    reader = {"type": "record", "name": "Pet", "fields": [
        {"name": "p", "type": [
            {"type": "record", "name": "Cat", "fields": [
                {"name": "meow", "type": "string",
                 "default": "?"}]},
            {"type": "record", "name": "Dog", "fields": [
                {"name": "bark", "type": "string"}]},
        ]}]}
    out = list(iter_container(blob, reader_schema=reader))
    assert out == [{"p": {"bark": "woof"}}]

    # reader renamed Dog → Hound with an alias: still matches
    reader_alias = {"type": "record", "name": "Pet", "fields": [
        {"name": "p", "type": [
            {"type": "record", "name": "Hound", "aliases": ["Dog"],
             "fields": [{"name": "bark", "type": "string"}]},
        ]}]}
    out = list(iter_container(blob, reader_schema=reader_alias))
    assert out == [{"p": {"bark": "woof"}}]

    # no name-matching branch at all → error, not silent wrong-branch
    reader_none = {"type": "record", "name": "Pet", "fields": [
        {"name": "p", "type": [
            {"type": "record", "name": "Cat", "fields": [
                {"name": "meow", "type": "string", "default": "?"}]},
        ]}]}
    with pytest.raises(ValueError):
        list(iter_container(blob, reader_schema=reader_none))


def test_union_named_branches_namespace_fullname():
    """Namespaced fullname matching: writer com.ex.Dog resolves only to
    the reader branch with the same fullname."""
    w_schema = {"type": "record", "name": "Pet", "fields": [
        {"name": "p", "type": {
            "type": "record", "name": "Dog", "namespace": "com.ex",
            "fields": [{"name": "bark", "type": "string"}]}}]}
    blob = write_container(w_schema, [{"p": {"bark": "arf"}}])
    reader = {"type": "record", "name": "Pet", "fields": [
        {"name": "p", "type": [
            {"type": "record", "name": "Dog", "namespace": "other",
             "fields": [{"name": "bark", "type": "string",
                         "default": "-"}]},
            {"type": "record", "name": "Dog", "namespace": "com.ex",
             "fields": [{"name": "bark", "type": "string"}]},
        ]}]}
    out = list(iter_container(blob, reader_schema=reader))
    assert out == [{"p": {"bark": "arf"}}]
