"""Avro Object Container File parser: .avro files → typed rows.

Reference analogue: ``embulk-parser-avro`` (ecosystem plugin). The Spark
distribution's avro *datasource* module is not bundled in this container
(only avro-core jars), so the container-file layer is vendored pure
Python per the Avro 1.11 spec: header magic ``Obj\\x01`` + metadata map
(``avro.schema`` JSON, ``avro.codec`` null|deflate) + sync-marker-framed
data blocks of binary-encoded records. zigzag varints, IEEE little-endian
floats, length-prefixed bytes/strings, unions as (index, value), arrays/
maps as counted blocks.

Execution shape: one task per file (binaryFile) → ``mapInPandas`` decode
(Arrow batches back to the JVM). Deflate blocks inflate with stdlib zlib
(raw deflate, per spec). Declared ``columns`` prune+coerce on top of the
writer schema, like the parquet/orc parser path.
"""

from __future__ import annotations

import json
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

AVRO_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary decoder
# ---------------------------------------------------------------------------

class _Reader:
    __slots__ = ("b", "p")

    def __init__(self, b: bytes, p: int = 0):
        self.b, self.p = b, p

    def long(self) -> int:
        """zigzag varint (int and long share the encoding)."""
        shift, acc = 0, 0
        while True:
            try:
                byte = self.b[self.p]
            except IndexError:
                raise ValueError("truncated avro varint") from None
            self.p += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            if shift > 63:
                raise ValueError("avro varint too long")
        return (acc >> 1) ^ -(acc & 1)

    def raw(self, n: int) -> bytes:
        if self.p + n > len(self.b):
            raise ValueError("truncated avro payload")
        out = self.b[self.p : self.p + n]
        self.p += n
        return out

    def read(self, schema):
        """Decode one value under a (parsed-JSON) schema."""
        if isinstance(schema, list):  # union: long index picks the branch
            idx = self.long()
            if not 0 <= idx < len(schema):
                raise ValueError(f"avro union index {idx} out of range")
            return self.read(schema[idx])
        if isinstance(schema, dict):
            t = schema["type"]
            if t == "record":
                return {
                    f["name"]: self.read(f["type"]) for f in schema["fields"]
                }
            if t == "enum":
                return schema["symbols"][self.long()]
            if t == "fixed":
                return self.raw(schema["size"])
            if t == "array":
                out = []
                while True:
                    n = self.long()
                    if n == 0:
                        break
                    if n < 0:  # block with byte size prefix
                        n = -n
                        self.long()
                    for _ in range(n):
                        out.append(self.read(schema["items"]))
                return out
            if t == "map":
                out = {}
                while True:
                    n = self.long()
                    if n == 0:
                        break
                    if n < 0:
                        n = -n
                        self.long()
                    for _ in range(n):
                        k = self.raw(self.long()).decode("utf-8")
                        out[k] = self.read(schema["values"])
                return out
            schema = t  # {'type': 'string', logicalType: ...} etc.
        if schema == "null":
            return None
        if schema == "boolean":
            return self.raw(1) != b"\x00"
        if schema in ("int", "long"):
            return self.long()
        if schema == "float":
            return struct.unpack("<f", self.raw(4))[0]
        if schema == "double":
            return struct.unpack("<d", self.raw(8))[0]
        if schema == "bytes":
            return self.raw(self.long())
        if schema == "string":
            return self.raw(self.long()).decode("utf-8", "replace")
        raise ValueError(f"unsupported avro schema {schema!r}")

    def read_resolved(self, w, r):
        """Decode one value written under schema ``w``, resolved to
        reader schema ``r`` per the Avro spec's Schema Resolution rules:
        field matching by name or reader alias, missing reader fields
        from defaults, extra writer fields decoded-and-dropped, numeric/
        string-bytes promotions, enum default symbols, per-branch union
        matching."""
        if isinstance(w, list):  # writer union: branch picked by index
            idx = self.long()
            if not 0 <= idx < len(w):
                raise ValueError(f"avro union index {idx} out of range")
            return self.read_resolved(w[idx], r)
        if isinstance(r, list):  # reader union: first matching branch
            for br in r:
                if _resolvable(w, br):
                    return self.read_resolved(w, br)
            raise ValueError(
                f"no reader union branch matches writer schema {w!r}"
            )
        wt = w["type"] if isinstance(w, dict) else w
        rt = r["type"] if isinstance(r, dict) else r
        if wt == "record" and rt == "record":
            rfields = {f["name"]: f for f in r["fields"]}
            aliases = {
                a: f["name"]
                for f in r["fields"]
                for a in f.get("aliases", ())
            }
            out, seen = {}, set()
            for wf in w["fields"]:
                tgt = (
                    wf["name"]
                    if wf["name"] in rfields
                    else aliases.get(wf["name"])
                )
                if tgt is None:
                    self.read(wf["type"])  # decode & drop
                else:
                    out[tgt] = self.read_resolved(
                        wf["type"], rfields[tgt]["type"]
                    )
                    seen.add(tgt)
            for rf in r["fields"]:
                if rf["name"] not in seen:
                    if "default" not in rf:
                        raise ValueError(
                            f"reader field {rf['name']!r} absent in writer "
                            "schema and has no default"
                        )
                    out[rf["name"]] = _default_value(
                        rf["type"], rf["default"]
                    )
            return out
        if wt == "array" and rt == "array":
            out = []
            while True:
                n = self.long()
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    self.long()
                for _ in range(n):
                    out.append(self.read_resolved(w["items"], r["items"]))
            return out
        if wt == "map" and rt == "map":
            out = {}
            while True:
                n = self.long()
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    self.long()
                for _ in range(n):
                    k = self.raw(self.long()).decode("utf-8")
                    out[k] = self.read_resolved(w["values"], r["values"])
            return out
        if wt == "enum" and rt == "enum":
            sym = w["symbols"][self.long()]
            if sym in r["symbols"]:
                return sym
            if "default" in r:  # enum default symbol (Avro ≥1.9)
                return r["default"]
            raise ValueError(f"enum symbol {sym!r} not in reader schema")
        if wt == "fixed" and rt == "fixed":
            if w["size"] != r["size"]:
                raise ValueError("fixed size mismatch in schema resolution")
            return self.raw(w["size"])
        v = self.read(w)  # primitive: decode as written, then promote
        if rt == wt:
            return v
        if rt in _PROMOTIONS.get(wt, ()):
            if rt in ("float", "double"):
                return float(v)
            if rt == "long":
                return int(v)
            if rt == "bytes":
                return v.encode("utf-8")
            if rt == "string":
                return v.decode("utf-8", "replace")
        raise ValueError(
            f"writer schema {wt!r} does not resolve to reader {rt!r}"
        )


#: spec promotion lattice (writer type → allowed reader types)
_PROMOTIONS = {
    "int": {"long", "float", "double"},
    "long": {"float", "double"},
    "float": {"double"},
    "string": {"bytes"},
    "bytes": {"string"},
}


#: named-type kinds: the spec matches these by fullname/alias, not kind
_NAMED_KINDS = {"record", "enum", "fixed"}


def _fullname(s: dict) -> str | None:
    """Avro fullname of a named-type schema dict (spec: a dotted ``name``
    is already full; else ``namespace.name``)."""
    n = s.get("name")
    if n is None or "." in n or not s.get("namespace"):
        return n
    return f"{s['namespace']}.{n}"


def _names_match(w: dict, r: dict) -> bool:
    """Spec named-type match: reader fullname equals writer fullname, or
    writer fullname is among the reader's aliases (relative aliases
    resolve against the reader's namespace)."""
    wn, rn = _fullname(w), _fullname(r)
    if wn is None or rn is None:
        return wn == rn
    if wn == rn:
        return True
    ns = rn.rsplit(".", 1)[0] if "." in rn else None
    aliases = {
        a if "." in a or not ns else f"{ns}.{a}"
        for a in r.get("aliases", ())
    }
    return wn in aliases


def _resolvable(w, r) -> bool:
    """Can a value written as ``w`` resolve to reader branch ``r``?
    (Used for reader-union branch selection.) Named types (record /
    enum / fixed) match by fullname or reader alias, per the spec — a
    bare kind match would decode into the wrong branch of a reader
    union holding two record (or enum) branches."""
    if isinstance(w, list):
        return any(_resolvable(br, r) for br in w)
    if isinstance(r, list):
        return any(_resolvable(w, br) for br in r)
    wt = w["type"] if isinstance(w, dict) else w
    rt = r["type"] if isinstance(r, dict) else r
    if wt in _NAMED_KINDS and rt in _NAMED_KINDS:
        return wt == rt and _names_match(w, r)
    return wt == rt or rt in _PROMOTIONS.get(wt, ())


def _default_value(schema, default):
    """Materialize a reader-field JSON default under its schema (spec:
    bytes/fixed defaults are ISO-8859-1 strings; union defaults belong
    to the FIRST branch)."""
    if isinstance(schema, list):
        return _default_value(schema[0], default)
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return None
    if t in ("bytes", "fixed"):
        return default.encode("iso-8859-1")
    if t == "array":
        return [_default_value(schema["items"], x) for x in default]
    if t == "map":
        return {
            k: _default_value(schema["values"], v)
            for k, v in default.items()
        }
    if t == "record":
        return {
            f["name"]: _default_value(
                f["type"], default.get(f["name"], f.get("default"))
            )
            for f in schema["fields"]
        }
    if t in ("float", "double"):
        return float(default)
    return default


def iter_container(data: bytes, reader_schema: dict | None = None):
    """Yield decoded records from an Object Container File blob. With
    ``reader_schema``, each record is decoded under the file's writer
    schema and RESOLVED to the reader schema (spec Schema Resolution):
    renamed fields via aliases, new fields from defaults, dropped
    fields skipped, int→long→float→double / string↔bytes promotions —
    the read-side half of schema evolution for Avro inputs."""
    if data[:4] != AVRO_MAGIC:
        raise ValueError("not an avro object container file")
    r = _Reader(data, 4)
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            k = r.raw(r.long()).decode("utf-8")
            meta[k] = r.raw(r.long())
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    sync = r.raw(16)
    while r.p < len(r.b):
        count = r.long()
        size = r.long()
        block = r.raw(size)
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)  # raw deflate per spec
        br = _Reader(block)
        for _ in range(count):
            if reader_schema is not None:
                yield br.read_resolved(schema, reader_schema)
            else:
                yield br.read(schema)
        if r.raw(16) != sync:
            raise ValueError("avro sync marker mismatch")


# ---------------------------------------------------------------------------
# binary encoder (fixture/synthesis side)
# ---------------------------------------------------------------------------

def _zz(v: int) -> bytes:
    acc = (v << 1) ^ (v >> 63) if v < 0 else (v << 1)
    out = bytearray()
    while True:
        if acc < 0x80:
            out.append(acc)
            return bytes(out)
        out.append((acc & 0x7F) | 0x80)
        acc >>= 7


def _encode(schema, v) -> bytes:
    if isinstance(schema, list):
        # pick the first matching branch (null vs not is the common case)
        for i, br in enumerate(schema):
            if (br == "null") == (v is None):
                return _zz(i) + _encode(br, v)
        raise ValueError("no matching avro union branch")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return b"".join(
                _encode(f["type"], v[f["name"]]) for f in schema["fields"]
            )
        if t == "enum":
            return _zz(schema["symbols"].index(v))
        if t == "fixed":
            if len(v) != schema["size"]:
                raise ValueError("fixed value size mismatch")
            return bytes(v)
        if t == "array":
            body = b"".join(_encode(schema["items"], x) for x in v)
            return (_zz(len(v)) + body + _zz(0)) if v else _zz(0)
        if t == "map":
            body = b"".join(
                _zz(len(k.encode())) + k.encode() + _encode(schema["values"], x)
                for k, x in v.items()
            )
            return (_zz(len(v)) + body + _zz(0)) if v else _zz(0)
        schema = t
    if schema == "null":
        return b""
    if schema == "boolean":
        return b"\x01" if v else b"\x00"
    if schema in ("int", "long"):
        return _zz(int(v))
    if schema == "float":
        return struct.pack("<f", float(v))
    if schema == "double":
        return struct.pack("<d", float(v))
    if schema == "bytes":
        return _zz(len(v)) + bytes(v)
    if schema == "string":
        raw = v.encode("utf-8")
        return _zz(len(raw)) + raw
    raise ValueError(f"unsupported avro schema {schema!r}")


def write_container(schema: dict, records: list[dict], codec: str = "null") -> bytes:
    """Serialize records to one Object Container File blob (deterministic
    fixed sync marker — fixtures must be reproducible)."""
    sync = b"\x00\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c\x0d\x0e\x0f"
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    out = bytearray(AVRO_MAGIC)
    out += _zz(len(meta))
    for k, v in sorted(meta.items()):
        out += _zz(len(k.encode())) + k.encode() + _zz(len(v)) + v
    out += _zz(0)
    out += sync
    if records:
        body = b"".join(_encode(schema, r) for r in records)
        if codec == "deflate":
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            body = co.compress(body) + co.flush()
        out += _zz(len(records)) + _zz(len(body)) + body + sync
    return bytes(out)


# ---------------------------------------------------------------------------
# parser plugin surface
# ---------------------------------------------------------------------------

def parse_avro_blobs(df: DataFrame, blob_col: str, parser: dict) -> DataFrame:
    """BINARY column of container files → typed rows. Declared ``columns``
    select/coerce record fields (missing → null); complex values render as
    canonical json for string/json columns (the plugin's behavior)."""
    from .files import _apply_timestamp_formats, _declared_schema
    from .msgpack import _coerce_cell

    columns = parser["columns"]
    schema = _declared_schema(columns)
    names = [c["name"] for c in columns]
    types = [c["type"] for c in columns]
    reader_schema = parser.get("reader_schema")

    src = df.select(F.col(blob_col).alias("_blob"))

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf["_blob"]:
                for rec in iter_container(bytes(blob), reader_schema):
                    if not isinstance(rec, dict):
                        rec = {"value": rec}
                    rows.append(
                        [
                            _coerce_cell(rec.get(n), t)
                            for n, t in zip(names, types)
                        ]
                    )
            yield pd.DataFrame(rows, columns=names, dtype=object)

    parsed = src.mapInPandas(_parse, schema=schema)
    return _apply_timestamp_formats(parsed, columns)


def read_avro(spark: SparkSession, paths: list[str], parser: dict) -> DataFrame:
    """Parser ``type: avro``: one task per container file."""
    bins = spark.read.format("binaryFile").load(paths).select("content")
    return parse_avro_blobs(bins, "content", parser)
