"""Archive/decoder inputs: zip, tar (+tar.gz/bz2/xz), and single-stream
xz/gzip/bzip2 files → text lines → any line parser.

The Spark-native re-expression of Embulk's decoder chain for container
formats (ecosystem plugin ``embulk-decoder-commons-compress``; core chain
composition at reference spi/util/DecodersInternal.java:28-41 — decoders
wrap first-to-last between the file input and the parser). Spark handles
gzip/bzip2 codecs by extension natively; archives that carry MANY members
(zip/tar) need a flat-map, which is exactly Embulk's model of one
FileInput task fanning out members as separate "files" to the parser.

Execution shape: ``binaryFile`` scan = one task per archive (archives are
not splittable — same boundary as the reference and as .csv.gz in Spark),
then ONE ``mapInPandas`` flat-map per archive decoding member-by-member
(peak memory = one decompressed member, never the whole archive). At 100
TB the parallelism unit is the archive file, so many small-to-medium
archives scale linearly; a single huge archive is a single task in any
engine that honors the container format.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: magic prefixes for single-stream decompressors
_GZIP_MAGIC = b"\x1f\x8b"
_BZIP2_MAGIC = b"BZh"
_XZ_MAGIC = b"\xfd7zXZ\x00"
_ZIP_MAGIC = b"PK\x03\x04"

LINES_DDL = "path STRING, member STRING, line_no BIGINT, value STRING"


def _decompress_stream(name: str, data: bytes) -> bytes | None:
    """Single-stream decompress by magic (gzip/bzip2/xz); None if the
    bytes are not a recognized single-stream container."""
    if data[:2] == _GZIP_MAGIC:
        import gzip

        return gzip.decompress(data)
    if data[:3] == _BZIP2_MAGIC:
        import bz2

        return bz2.decompress(data)
    if data[:6] == _XZ_MAGIC:
        import lzma

        return lzma.decompress(data)
    return None


def _strip_ext(name: str) -> str:
    for ext in (".gz", ".bz2", ".xz"):
        if name.endswith(ext):
            return name[: -len(ext)]
    return name


def _iter_members(path: str, data: bytes):
    """Yield (member_name, text_bytes) for every file member of an
    archive blob. Dispatch: zip → tar(.gz/.bz2/.xz) → single-stream
    (possibly wrapping an inner tar) → plain bytes."""
    import tarfile
    import zipfile

    if data[:4] == _ZIP_MAGIC:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            for info in zf.infolist():
                if not info.is_dir():
                    yield info.filename, zf.read(info)
        return
    inner = _decompress_stream(path, data)
    if inner is not None:
        data, path = inner, _strip_ext(path)
    # tar? (plain or just-unwrapped .tar.{gz,bz2,xz})
    try:
        tf = tarfile.open(fileobj=io.BytesIO(data), mode="r:")
    except tarfile.TarError:
        tf = None
    if tf is not None:
        with tf:
            for m in tf:
                if m.isfile():
                    f = tf.extractfile(m)
                    if f is not None:
                        yield m.name, f.read()
        return
    # single-stream compressed text (file.csv.xz) or plain passthrough
    yield path.rsplit("/", 1)[-1], data


def read_archive_lines(
    spark: SparkSession, paths: list[str], charset: str = "UTF-8"
) -> DataFrame:
    """Archive glob → one row per text line with (path, member, line_no)
    provenance. Decode errors REPLACE (the LineDecoder policy, reference
    spi/util/LineDecoderInternal charset handling)."""
    bins = spark.read.format("binaryFile").load(paths).select("path", "content")

    def _explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, blob in zip(pdf["path"], pdf["content"]):
                for member, data in _iter_members(path, bytes(blob)):
                    text = data.decode(charset, errors="replace")
                    lines = text.splitlines()
                    if not lines:
                        continue
                    yield pd.DataFrame(
                        {
                            "path": path,
                            "member": member,
                            "line_no": range(1, len(lines) + 1),
                            "value": lines,
                        }
                    )

    return bins.mapInPandas(_explode, schema=LINES_DDL)


def read_archive(
    spark: SparkSession, paths: list[str], parser: dict
) -> DataFrame:
    """Parse archive member lines with any line parser (csv / json /
    regexp / ltsv) — the full Embulk chain file-input → decoder → parser
    for container formats. ``skip_header_lines`` (and ``header_line``)
    apply PER MEMBER, like Embulk applies them per file task."""
    from .files import (
        _apply_timestamp_formats,
        _declared_schema,
        parse_ltsv_column,
        parse_regexp_column,
    )

    ptype = parser.get("type", "csv")
    lines = read_archive_lines(spark, paths, parser.get("charset", "UTF-8"))
    if ptype == "csv":
        skip = int(
            parser.get("skip_header_lines", 1 if parser.get("header_line") else 0)
        )
        marker = parser.get("comment_line_marker")
        if marker:
            keep = ~F.col("value").startswith(marker)
            nullstr = parser.get("null_string")
            if nullstr and nullstr.startswith(marker):
                keep = keep | F.col("value").startswith(nullstr)
            lines = lines.filter(keep)
        body = lines.filter(F.col("line_no") > skip)
        opts = {
            "delimiter": parser.get("delimiter", ","),
            "quote": parser.get("quote", '"'),
            "escape": parser.get("escape", '"'),
        }
        if parser.get("null_string"):
            opts["nullValue"] = parser["null_string"]
        schema = _declared_schema(parser["columns"])
        parsed = body.select(
            F.from_csv(F.col("value"), schema.simpleString(), opts).alias("r")
        ).select("r.*")
        return _apply_timestamp_formats(parsed, parser["columns"])
    if ptype == "json":
        columns = parser.get("columns")
        if not columns:
            return lines.select(F.col("value").alias("record"))
        struct = _declared_schema(columns)
        parsed = lines.select(
            F.from_json(F.col("value"), struct).alias("r")
        ).select("r.*")
        return _apply_timestamp_formats(parsed, columns)
    if ptype == "regexp":
        return parse_regexp_column(
            lines, F.col("value"), parser["format"], parser["columns"]
        )
    if ptype == "ltsv":
        return parse_ltsv_column(lines, F.col("value"), parser["columns"])
    raise ValueError(f"archive decoder: unsupported parser type {ptype!r}")
