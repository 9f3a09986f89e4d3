"""WARC (ISO 28500) input source — Common-Crawl-style web archives.

The north-star input is "Common-Crawl-style web pages"; Common Crawl
ships them as WARC files. This is the engine's FileInputPlugin +
ParserPlugin pair for that container (reference contract:
embulk-core/src/main/java/org/embulk/spi/FileInputPlugin.java:15-43 —
one task per file — and spi/ParserPlugin.java:14-31 — file bytes →
typed records), re-expressed Spark-first: a `binaryFile` scan (one
parquet-style split per file, Spark schedules files across executors
exactly like Embulk's per-file tasks) feeding a `mapInPandas` flat-map
that turns each archive blob into N typed records.

Scale shape: WARC is a concatenation of length-prefixed records
(Content-Length header), so parsing is a single forward scan per file —
no seeking, no global state, embarrassingly parallel at one-file
granularity (the Common-Crawl layout: ~1 GiB files × 80k files/crawl).
Record payloads move driver-free through Arrow batches; nothing is ever
collected. Gzipped archives (the Common-Crawl default is per-record
gzip members) decompress with the stdlib streaming reader inside the
same pass.

Python here is the sanctioned container-parsing path (binary format
Spark has no reader for): per-FILE python with Arrow-batched output,
never per-row UDF work in a hot expression. The synthesis direction
(`warc_record_col`) is pure JVM Columns, so fixtures for tests/bench
cost no Python at all.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Output schema of the parser (one row per WARC record).
WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("warc_type", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

_CRLF2 = b"\r\n\r\n"


def _parse_header_block(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # [0] is the WARC/1.x version line
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii", "replace").lower()] = v.strip().decode(
                "utf-8", "replace"
            )
    return headers


def parse_warc_bytes(data: bytes) -> Iterator[dict]:
    """Forward-scan one (decompressed) WARC blob into record dicts.

    Record grammar (ISO 28500 §4): version line + named fields, CRLF CRLF,
    exactly Content-Length payload bytes, CRLF CRLF trailer. The scan
    trusts Content-Length (the only correct strategy — payloads routinely
    contain things that look like record boundaries) and resyncs on the
    next ``WARC/`` magic if a record is malformed.

    For ``application/http`` payloads the HTTP envelope is split off:
    ``http_status``/``content_type`` come from the response head and
    ``payload`` is the entity body alone (the html).
    """
    pos, n = 0, len(data)
    while pos < n:
        if not data.startswith(b"WARC/", pos):
            nxt = data.find(b"\r\nWARC/", pos)
            if nxt < 0:
                return
            pos = nxt + 2
            continue
        head_end = data.find(_CRLF2, pos)
        if head_end < 0:
            return
        headers = _parse_header_block(data[pos:head_end])
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            pos = head_end + 4
            continue
        body = data[head_end + 4 : head_end + 4 + clen]
        pos = head_end + 4 + clen
        if data.startswith(_CRLF2, pos):
            pos += 4

        http_status = None
        content_type = headers.get("content-type")
        payload = body
        if (content_type or "").startswith("application/http"):
            split = body.find(_CRLF2)
            http_head = body[: split if split >= 0 else len(body)]
            payload = body[split + 4 :] if split >= 0 else b""
            lines = http_head.split(b"\r\n")
            first = lines[0].split()
            if len(first) >= 2 and first[0].startswith(b"HTTP/"):
                try:
                    http_status = int(first[1])
                except ValueError:
                    http_status = None
            content_type = None
            for line in lines[1:]:
                if line.lower().startswith(b"content-type:"):
                    content_type = (
                        line.partition(b":")[2].strip().decode("utf-8", "replace")
                    )
                    break

        ts = headers.get("warc-date")
        yield {
            "warc_type": headers.get("warc-type"),
            "url": headers.get("warc-target-uri"),
            "warc_ts": pd.Timestamp(ts).tz_localize(None)
            if ts and ts.endswith("Z")
            else (pd.Timestamp(ts) if ts else None),
            "record_id": headers.get("warc-record-id"),
            "http_status": http_status,
            "content_type": content_type,
            "payload": payload,
        }


def _maybe_gunzip(data: bytes) -> bytes:
    """Common Crawl gzips each record as its own member; GzipFile reads
    multi-member streams end-to-end in one pass."""
    if data[:2] == b"\x1f\x8b":
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as f:
            return f.read()
    return data


def parse_warc_blobs(
    df: DataFrame, blob_col: str = "content", *, keep_cols: list[str] | None = None
) -> DataFrame:
    """Flat-map a column of WARC file blobs (plain or gzip) into records.

    1 blob row → N record rows via ``mapInPandas`` (Arrow both ways);
    ``keep_cols`` are carried through from the blob row (e.g. the file
    path for lineage, mirroring Embulk's per-task ``last_path`` cursor,
    sources/files.py).
    """
    carry = keep_cols or []
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name in carry]
        + list(WARC_RECORD_SCHEMA.fields)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for _, r in pdf.iterrows():
                blob = r[blob_col]
                if blob is None:
                    continue
                base = {c: r[c] for c in carry}
                for rec in parse_warc_bytes(_maybe_gunzip(bytes(blob))):
                    rows.append({**base, **rec})
            if rows:
                yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(gen, schema=out_schema)


def read_warc_files(
    spark: SparkSession, path: str, *, keep_path: bool = True
) -> DataFrame:
    """FileInputPlugin for WARC: ``binaryFile`` scan (one task per file —
    Embulk's task model, spi/FileInputPlugin.java:15-43) → record parse.
    Accepts a directory, glob, or single file; ``.warc`` and ``.warc.gz``
    both work (gzip sniffed by magic bytes, functions/guess.py style)."""
    files = spark.read.format("binaryFile").load(path)
    return parse_warc_blobs(
        files.select(
            F.col("path"), F.col("content")
        ),
        keep_cols=["path"] if keep_path else None,
    )


def warc_change_events(records: DataFrame) -> DataFrame:
    """Crawl archive → change stream: WARC records (parse_warc_blobs /
    read_warc_files output) as the engine's canonical events
    ``(seq, op, url, warc_ts, html, lang)``, replayable by merge_epoch.

    Record-type semantics (ISO 28500 §6):
    - ``response`` with a 2xx status → an upsert carrying the html;
    - ``revisit`` → DROPPED on purpose: a revisit asserts the content
      was UNCHANGED since the capture it refers to (identical-payload
      -digest profile), so the lake's retained version is already the
      truth — emitting nothing is the CDC-correct reading and gives
      Common-Crawl-style dedup'd archives O(actual-change) ingest;
    - 4xx/5xx responses, warcinfo/request/metadata records → dropped
      (no page state).

    ``seq``: a crawl has no binlog order; xxhash64(record_id) breaks
    (url, warc_ts) ties deterministically so replay is re-run-stable
    (any tie winner is content-identical in practice — same crawl
    instant, same url)."""
    return (
        records.filter(
            (F.col("warc_type") == "response")
            & F.col("url").isNotNull()
            & F.col("http_status").between(200, 299)
        )
        .select(
            F.xxhash64(F.col("record_id")).alias("seq"),
            F.lit("U").alias("op"),
            "url",
            F.col("warc_ts").cast("timestamp").alias("warc_ts"),
            F.col("payload").alias("html"),
            F.lit(None).cast("string").alias("lang"),
        )
    )


def warc_record_col(
    url: Column, ts: Column, html: Column, *, status: Column | None = None
) -> Column:
    """Synthesize one WARC response record as a string Column — pure JVM
    (fixtures/bench never pay Python to BUILD archives). The HTTP
    envelope carries ``text/html; charset=utf-8``; Content-Length counts
    UTF-8 octets of the full HTTP payload. ``concat_ws('', ...)`` +
    ``octet_length`` keep it whole-stage-codegen-friendly."""
    http_head = F.concat(
        F.lit("HTTP/1.1 "),
        (status if status is not None else F.lit(200)).cast("string"),
        F.lit(" OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"),
    )
    http_payload = F.concat(http_head, html)
    return F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        url,
        F.lit("\r\nWARC-Date: "),
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit("\r\nWARC-Record-ID: <urn:md5:"),
        F.md5(url.cast("binary")),
        F.lit(">\r\nContent-Type: application/http; msgtype=response"),
        F.lit("\r\nContent-Length: "),
        F.octet_length(http_payload).cast("string"),
        F.lit("\r\n\r\n"),
        http_payload,
        F.lit("\r\n\r\n"),
    )


def warcinfo_col(filename: Column) -> Column:
    """A ``warcinfo`` leader record (what real crawls put first in every
    file) — parsers must pass over non-response records."""
    body = F.concat(F.lit("software: embulk-spark\r\nisPartOf: synth\r\n"))
    return F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Filename: "),
        filename,
        F.lit("\r\nWARC-Date: 2024-01-01T00:00:00Z"),
        F.lit("\r\nWARC-Record-ID: <urn:md5:"),
        F.md5(filename.cast("binary")),
        F.lit(">\r\nContent-Type: application/warc-fields"),
        F.lit("\r\nContent-Length: "),
        F.octet_length(body).cast("string"),
        F.lit("\r\n\r\n"),
        body,
        F.lit("\r\n\r\n"),
    )
