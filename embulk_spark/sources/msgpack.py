"""MessagePack parser: binary msgpack streams → typed rows.

Reference analogue: ``embulk-parser-msgpack`` (ecosystem plugin), whose
options this mirrors — ``row_encoding: map | array`` (each record is a
msgpack map keyed by column name, or a positional array) and
``file_encoding: sequence | array`` (the file is a raw stream of record
values, or one top-level array of them). MessagePack is also the
reference's own in-memory JSON column representation (msgpack-core in
embulk-core's dependency set, spi/json value classes), so wire-parity
here exercises the same value model.

The codec is vendored pure-Python (full msgpack spec: all int/str/bin/
array/map widths, float32/64, ext passthrough) — no msgpack library in
this container. Decode runs member-at-a-time inside ``mapInPandas``
(Arrow batches, one Python hop), the same execution shape as the WARC
scanner: one task per file, peak memory one record batch.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# vendored codec
# ---------------------------------------------------------------------------

def unpack_one(b: bytes, p: int = 0):
    """Decode ONE msgpack value at offset ``p`` → (value, next_offset).
    Maps → dict, arrays → list, str → str (utf-8, REPLACE), bin → bytes,
    ext → (type, bytes) tuple. Raises ValueError on truncation."""
    try:
        t = b[p]
    except IndexError:
        raise ValueError("truncated msgpack: no type byte") from None
    p += 1
    if t <= 0x7F:  # positive fixint
        return t, p
    if t >= 0xE0:  # negative fixint
        return t - 0x100, p
    if 0x80 <= t <= 0x8F:
        return _unpack_map(b, p, t & 0x0F)
    if 0x90 <= t <= 0x9F:
        return _unpack_array(b, p, t & 0x0F)
    if 0xA0 <= t <= 0xBF:
        n = t & 0x1F
        return _take(b, p, n).decode("utf-8", "replace"), p + n
    if t == 0xC0:
        return None, p
    if t == 0xC2:
        return False, p
    if t == 0xC3:
        return True, p
    if t in (0xC4, 0xC5, 0xC6):  # bin8/16/32
        w = 1 << (t - 0xC4)
        n = _uint(b, p, w)
        p += w
        return bytes(_take(b, p, n)), p + n
    if t in (0xC7, 0xC8, 0xC9):  # ext8/16/32
        w = 1 << (t - 0xC7)
        n = _uint(b, p, w)
        p += w
        code = struct.unpack_from(">b", b, p)[0]
        return (code, bytes(_take(b, p + 1, n))), p + 1 + n
    if t == 0xCA:
        return struct.unpack_from(">f", b, p)[0], p + 4
    if t == 0xCB:
        return struct.unpack_from(">d", b, p)[0], p + 8
    if t in (0xCC, 0xCD, 0xCE, 0xCF):  # uint8/16/32/64
        w = 1 << (t - 0xCC)
        return _uint(b, p, w), p + w
    if t in (0xD0, 0xD1, 0xD2, 0xD3):  # int8/16/32/64
        w = 1 << (t - 0xD0)
        v = _uint(b, p, w)
        bits = 8 * w
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v, p + w
    if 0xD4 <= t <= 0xD8:  # fixext 1/2/4/8/16
        n = 1 << (t - 0xD4)
        code = struct.unpack_from(">b", b, p)[0]
        return (code, bytes(_take(b, p + 1, n))), p + 1 + n
    if t in (0xD9, 0xDA, 0xDB):  # str8/16/32
        w = 1 << (t - 0xD9)
        n = _uint(b, p, w)
        p += w
        return _take(b, p, n).decode("utf-8", "replace"), p + n
    if t in (0xDC, 0xDD):  # array16/32
        w = 2 << (t - 0xDC)
        n = _uint(b, p, w)
        return _unpack_array(b, p + w, n)
    if t in (0xDE, 0xDF):  # map16/32
        w = 2 << (t - 0xDE)
        n = _uint(b, p, w)
        return _unpack_map(b, p + w, n)
    raise ValueError(f"bad msgpack type byte 0x{t:02x}")


def _take(b: bytes, p: int, n: int) -> bytes:
    if p + n > len(b):
        raise ValueError("truncated msgpack payload")
    return b[p : p + n]


def _uint(b: bytes, p: int, w: int) -> int:
    return int.from_bytes(_take(b, p, w), "big")


def _unpack_array(b: bytes, p: int, n: int):
    out = []
    for _ in range(n):
        v, p = unpack_one(b, p)
        out.append(v)
    return out, p


def _unpack_map(b: bytes, p: int, n: int):
    out = {}
    for _ in range(n):
        k, p = unpack_one(b, p)
        v, p = unpack_one(b, p)
        out[k] = v
    return out, p


def iter_values(b: bytes):
    """Yield every top-level msgpack value in a byte stream."""
    p = 0
    while p < len(b):
        v, p = unpack_one(b, p)
        yield v


def pack_one(v) -> bytes:
    """Encode one value (None/bool/int/float/str/bytes/list/dict) —
    canonical smallest-width encodings, map keys in insertion order."""
    if v is None:
        return b"\xc0"
    if v is True:
        return b"\xc3"
    if v is False:
        return b"\xc2"
    if isinstance(v, int):
        if 0 <= v <= 0x7F:
            return bytes([v])
        if -32 <= v < 0:
            return bytes([v & 0xFF])
        if v >= 0:
            for code, w in ((0xCC, 1), (0xCD, 2), (0xCE, 4), (0xCF, 8)):
                if v < (1 << (8 * w)):
                    return bytes([code]) + v.to_bytes(w, "big")
            raise ValueError("int too large for msgpack")
        for code, w in ((0xD0, 1), (0xD1, 2), (0xD2, 4), (0xD3, 8)):
            if -(1 << (8 * w - 1)) <= v:
                return bytes([code]) + (v & ((1 << (8 * w)) - 1)).to_bytes(w, "big")
        raise ValueError("int too small for msgpack")
    if isinstance(v, float):
        return b"\xcb" + struct.pack(">d", v)
    if isinstance(v, str):
        raw = v.encode("utf-8")
        n = len(raw)
        if n <= 0x1F:
            return bytes([0xA0 | n]) + raw
        for code, w in ((0xD9, 1), (0xDA, 2), (0xDB, 4)):
            if n < (1 << (8 * w)):
                return bytes([code]) + n.to_bytes(w, "big") + raw
    if isinstance(v, (bytes, bytearray)):
        n = len(v)
        for code, w in ((0xC4, 1), (0xC5, 2), (0xC6, 4)):
            if n < (1 << (8 * w)):
                return bytes([code]) + n.to_bytes(w, "big") + bytes(v)
    if isinstance(v, (list, tuple)):
        n = len(v)
        if n <= 0x0F:
            head = bytes([0x90 | n])
        elif n < (1 << 16):
            head = b"\xdc" + n.to_bytes(2, "big")
        else:
            head = b"\xdd" + n.to_bytes(4, "big")
        return head + b"".join(pack_one(x) for x in v)
    if isinstance(v, dict):
        n = len(v)
        if n <= 0x0F:
            head = bytes([0x80 | n])
        elif n < (1 << 16):
            head = b"\xde" + n.to_bytes(2, "big")
        else:
            head = b"\xdf" + n.to_bytes(4, "big")
        return head + b"".join(pack_one(k) + pack_one(x) for k, x in v.items())
    raise TypeError(f"cannot msgpack-encode {type(v).__name__}")


# ---------------------------------------------------------------------------
# parser plugin surface
# ---------------------------------------------------------------------------

def _coerce_cell(v, etype: str):
    """msgpack value → declared Embulk type (string-setter lenience:
    wrong-shape values null out rather than erroring, timestamps stay
    strings for _apply_timestamp_formats)."""
    import json as _json

    if v is None:
        return None
    if etype == "long":
        if isinstance(v, bool):
            return int(v)
        if isinstance(v, (int, float)):
            return int(v)
        return None
    if etype == "double":
        return float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else None
    if etype == "boolean":
        return v if isinstance(v, bool) else None
    if etype == "json":
        return _json.dumps(v, separators=(",", ":"), sort_keys=True)
    # string / timestamp
    if isinstance(v, (dict, list)):
        return _json.dumps(v, separators=(",", ":"), sort_keys=True)
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return str(v) if not isinstance(v, str) else v


def parse_msgpack_blobs(
    df: DataFrame,
    blob_col: str,
    parser: dict,
) -> DataFrame:
    """Parse a BINARY column of msgpack streams into typed rows (flat-map:
    one blob → many records). ``row_encoding``/``file_encoding`` as in the
    plugin; unknown map keys are ignored, missing ones null."""
    from .files import _apply_timestamp_formats, _declared_schema

    columns = parser["columns"]
    row_enc = parser.get("row_encoding", "map")
    file_enc = parser.get("file_encoding", "sequence")
    schema = _declared_schema(columns)
    names = [c["name"] for c in columns]
    types = [c["type"] for c in columns]

    src = df.select(F.col(blob_col).alias("_blob"))

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[list] = []
            for blob in pdf["_blob"]:
                values = iter_values(bytes(blob))
                if file_enc == "array":
                    top = list(values)
                    records = top[0] if top and isinstance(top[0], list) else []
                else:
                    records = values
                for rec in records:
                    if row_enc == "map":
                        if not isinstance(rec, dict):
                            continue
                        cells = [rec.get(n) for n in names]
                    else:
                        if not isinstance(rec, list):
                            continue
                        cells = [
                            rec[i] if i < len(rec) else None
                            for i in range(len(names))
                        ]
                    rows.append(
                        [_coerce_cell(v, t) for v, t in zip(cells, types)]
                    )
            yield pd.DataFrame(rows, columns=names, dtype=object)

    parsed = src.mapInPandas(_parse, schema=schema)
    return _apply_timestamp_formats(parsed, columns)


def read_msgpack(spark: SparkSession, paths: list[str], parser: dict) -> DataFrame:
    """Parser ``type: msgpack`` over files: one task per file
    (binaryFile), stream-decoded member-at-a-time."""
    bins = spark.read.format("binaryFile").load(paths).select("content")
    return parse_msgpack_blobs(bins, "content", parser)
