"""Debezium-envelope change-event source (the binlog/WAL wire format).

Real binlog/WAL tails don't arrive as bare rows: Debezium (the de-facto
open-source CDC connector family) wraps every change in a JSON envelope
``{before, after, source{ts_ms, lsn/pos, snapshot, ...}, op, ts_ms,
transaction{total_order, ...}}`` with op codes ``c``(reate), ``u``(pdate),
``d``(elete), ``r``(ead = initial snapshot), and Kafka log compaction
adds a null-value *tombstone* record after every delete. This module is
the engine's InputPlugin+ParserPlugin pair for that format (reference
contract: embulk-core/src/main/java/org/embulk/spi/InputPlugin.java:16-43
— typed records out of a transactional source — and
spi/ParserPlugin.java:14-31 — raw bytes → schema'd rows), re-expressed
Spark-first.

Scale shape: the whole parse is ONE ``from_json`` over an explicit
envelope schema plus pure Column maps — no UDF, no shuffle, fully
whole-stage-codegen'd, and Catalyst prunes unreferenced envelope fields
out of the JSON parse (``from_json`` schema pruning). A 10^10-event
Kafka topic parses at scan speed; nothing here is per-row Python.

Envelope-variant handling: connectors run with or without the Kafka
Connect ``schemas.enable`` wrapper (``{"schema": ..., "payload": {...}}``
vs the flat envelope). ``get_json_object($.payload)`` + ``coalesce``
normalizes both in the same JVM pass.

The synthesis direction (``debezium_envelope_col``) is pure JVM
``to_json`` so fixtures/bench build wire-format streams for free —
mirrors sources/warc.py's synth/parse symmetry.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Debezium source-block fields the parser understands (connector-portable
#: subset: MySQL uses file+pos, Postgres lsn, both ts_ms + snapshot).
_SOURCE_DDL = (
    "version STRING, connector STRING, name STRING, ts_ms BIGINT, "
    "snapshot STRING, db STRING, `table` STRING, server_id BIGINT, "
    "file STRING, pos BIGINT, lsn BIGINT, row INT"
)

_TXN_DDL = "id STRING, total_order BIGINT, data_collection_order BIGINT"

#: op code → engine op. ``r`` (snapshot read) applies as an insert.
OP_MAP = {"c": "I", "r": "I", "u": "U", "d": "D"}


def envelope_schema(row_ddl: str) -> T.StructType:
    """Debezium envelope schema for a table whose row image has
    ``row_ddl`` columns (declared in WIRE types: temporal columns are
    epoch-millis BIGINT, bytea/blob columns are base64 STRING — that is
    what the JSON actually carries)."""
    row = T.StructType.fromDDL(row_ddl)
    return T.StructType(
        [
            T.StructField("before", row),
            T.StructField("after", row),
            T.StructField("source", T.StructType.fromDDL(_SOURCE_DDL)),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("transaction", T.StructType.fromDDL(_TXN_DDL)),
        ]
    )


def parse_debezium(
    df: DataFrame,
    row_ddl: str,
    value_col: str = "value",
    *,
    keep_cols: list[str] | None = None,
    with_source_table: bool = False,
) -> DataFrame:
    """Parse a column of Debezium JSON envelopes into typed change rows.

    One JVM pass: tombstone filter → payload-unwrap coalesce →
    ``from_json`` → op map + image pick. Output columns:

    - ``op``: I/U/D (``c``/``r`` → I, ``u`` → U, ``d`` → D; other codes —
      ``t`` truncate, ``m`` message — are dropped: they carry no row)
    - ``seq``: total order for newer-wins resolution —
      ``coalesce(transaction.total_order, source.lsn, source.pos, ts_ms)``
      (exactly the precedence a consumer of mixed connectors wants)
    - ``src_ts_ms``: the database commit time (source.ts_ms)
    - ``is_snapshot``: true for initial-snapshot reads (source.snapshot
      in true/last/incremental)
    - the row image columns (``before`` for deletes — Debezium puts the
      final pre-image there and ``after: null`` — else ``after``)

    Kafka-compaction tombstones (null/empty value) and unparseable
    envelopes (``op`` null after PERMISSIVE parse) are filtered, never
    errors: a WAL tail must survive garbage mid-stream.
    """
    v = F.col(value_col)
    keep = [F.col(c) for c in (keep_cols or [])]
    env_s = envelope_schema(row_ddl)
    payload = F.coalesce(F.get_json_object(v, "$.payload"), v)
    env = F.from_json(payload, env_s)
    parsed = df.filter(v.isNotNull() & (F.trim(v) != "")).select(
        *keep, env.alias("e")
    )
    op_in = F.col("e.op")
    op_out = F.when(op_in.isin("c", "r"), F.lit("I")).when(
        op_in == "u", F.lit("U")
    ).when(op_in == "d", F.lit("D"))
    image = F.when(op_in == "d", F.col("e.before")).otherwise(F.col("e.after"))
    seq = F.coalesce(
        F.col("e.transaction.total_order"),
        F.col("e.source.lsn"),
        F.col("e.source.pos"),
        F.col("e.ts_ms"),
    )
    snap = F.coalesce(
        F.lower(F.col("e.source.snapshot")).isin("true", "last", "incremental"),
        F.lit(False),
    )
    # with_source_table: surface source.table for multi-table routing
    extra = [F.col("e.source.table").alias("table")] if with_source_table else []
    extra_names = ["table"] if with_source_table else []
    return (
        parsed.filter(op_in.isin(*OP_MAP))
        .select(
            *[F.col(c) for c in (keep_cols or [])],
            *extra,
            op_out.alias("op"),
            seq.alias("seq"),
            F.col("e.source.ts_ms").alias("src_ts_ms"),
            snap.alias("is_snapshot"),
            image.alias("row"),
        )
        .filter(F.col("row").isNotNull())
        .select(
            *(keep_cols or []), *extra_names,
            "op", "seq", "src_ts_ms", "is_snapshot", "row.*"
        )
    )


#: Wire row DDL for the north-rule page table: timestamps ride as
#: epoch-millis, html as base64 (Debezium bytes semantics).
PAGE_ROW_DDL = "url STRING, warc_ts BIGINT, html STRING, lang STRING"


def debezium_change_events(
    df: DataFrame, value_col: str = "value", *, with_table: bool = False
) -> DataFrame:
    """North-rule adapter: Debezium envelopes of the Common-Crawl page
    table → the engine's canonical change-event frame
    ``(seq, op, url, warc_ts, html, lang)`` — directly replayable by
    ``streaming.replay.replay_batches`` / ``LakeTable.merge_epoch``.
    Wire→engine type mends: epoch-millis → timestamp, base64 → binary.
    ``with_table`` keeps the envelope's source.table tag for
    multi-table routing (replay.route_epoch)."""
    return parse_debezium(
        df, PAGE_ROW_DDL, value_col, with_source_table=with_table
    ).select(
        *(["table"] if with_table else []),
        "seq",
        "op",
        "url",
        F.timestamp_millis(F.col("warc_ts")).alias("warc_ts"),
        F.unbase64(F.col("html")).alias("html"),
        "lang",
    )


def read_debezium_files(
    spark: SparkSession, path: str, row_ddl: str = PAGE_ROW_DDL
) -> DataFrame:
    """FileInputPlugin for a jsonl dump of a Debezium topic (one envelope
    per line — the shape `kafka-console-consumer` / Kafka Connect file
    sinks produce). ``spark.read.text`` keeps one task per split."""
    return parse_debezium(spark.read.text(path), row_ddl)


#: Maxwell (Zendesk's MySQL binlog daemon) flat envelope: one JSON per
#: row change, ``type`` insert/update/delete/bootstrap-*, ``data`` the
#: post-image (deletes carry the final pre-image there), ``old`` only
#: the CHANGED columns' pre-values (minimal row image — pairs with
#: operators/merge.py::patch_latest_per_key).
MAXWELL_OP_MAP = {
    "insert": "I", "bootstrap-insert": "I", "update": "U", "delete": "D",
}


def maxwell_schema(row_ddl: str) -> T.StructType:
    row = T.StructType.fromDDL(row_ddl)
    return T.StructType(
        [
            T.StructField("database", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("ts", T.LongType()),       # epoch SECONDS
            T.StructField("xid", T.LongType()),
            T.StructField("xoffset", T.LongType()),
            T.StructField("commit", T.BooleanType()),
            T.StructField("position", T.StringType()),
            T.StructField("data", row),
            T.StructField("old", row),
        ]
    )


def parse_maxwell(
    df: DataFrame,
    row_ddl: str,
    value_col: str = "value",
    *,
    keep_cols: list[str] | None = None,
    with_source_table: bool = False,
    with_txn: bool = False,
) -> DataFrame:
    """Maxwell JSON lines → the SAME typed change-row contract as
    :func:`parse_debezium` (op/seq/src_ts_ms/is_snapshot + row image),
    so downstream replay is wire-format-agnostic. One ``from_json``
    pass, pure Columns.

    ``seq``: Maxwell's total order is (xid, xoffset) within the binlog —
    packed as ``xid·2^20 + xoffset`` (a transaction beyond 2^20 row
    events would interleave, acceptable for ordering ties), falling back
    to ``ts`` seconds when xid is absent (bootstrap rows)."""
    v = F.col(value_col)
    env = F.from_json(v, maxwell_schema(row_ddl))
    parsed = df.filter(v.isNotNull() & (F.trim(v) != "")).select(
        *[F.col(c) for c in (keep_cols or [])], env.alias("e")
    )
    t = F.col("e.type")
    op_out = (
        F.when(t.isin("insert", "bootstrap-insert"), F.lit("I"))
        .when(t == "update", F.lit("U"))
        .when(t == "delete", F.lit("D"))
    )
    seq = F.coalesce(
        F.col("e.xid") * F.lit(1 << 20)
        + F.coalesce(F.col("e.xoffset"), F.lit(0)),
        F.col("e.ts"),
    )
    extra = [F.col("e.table").alias("table")] if with_source_table else []
    extra_names = ["table"] if with_source_table else []
    if with_txn:
        # grouping xid for transaction-boundary alignment (txn_align.py)
        extra.append(F.col("e.xid").alias("txn_xid"))
        extra_names.append("txn_xid")
    return (
        parsed.filter(t.isin(*MAXWELL_OP_MAP))
        .select(
            *(keep_cols or []),
            *extra,
            op_out.alias("op"),
            seq.alias("seq"),
            (F.col("e.ts") * 1000).alias("src_ts_ms"),
            F.col("e.type").startswith("bootstrap").alias("is_snapshot"),
            F.col("e.data").alias("row"),
        )
        .filter(F.col("row").isNotNull())
        .select(
            *(keep_cols or []), *extra_names,
            "op", "seq", "src_ts_ms", "is_snapshot", "row.*",
        )
    )


def maxwell_txn_markers(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Committed xids in a batch of Maxwell lines: the LAST row of each
    transaction carries ``"commit": true`` (public Maxwell docs), so a
    txn is committed exactly when its flag row has arrived."""
    env = F.from_json(F.col(value_col), "xid long, commit boolean")
    return (
        df.select(env.alias("e"))
        .filter(F.col("e.commit") & F.col("e.xid").isNotNull())
        .select(F.col("e.xid").alias("xid"))
    )


def maxwell_change_events(
    df: DataFrame,
    value_col: str = "value",
    *,
    with_table: bool = False,
    with_txn: bool = False,
) -> DataFrame:
    """North-rule adapter: Maxwell lines of the page table → the
    canonical change-event frame (same wire types as Debezium's)."""
    return parse_maxwell(
        df, PAGE_ROW_DDL, value_col,
        with_source_table=with_table, with_txn=with_txn,
    ).select(
        *(["table"] if with_table else []),
        *(["txn_xid"] if with_txn else []),
        "seq",
        "op",
        "url",
        F.timestamp_millis(F.col("warc_ts")).alias("warc_ts"),
        F.unbase64(F.col("html")).alias("html"),
        "lang",
    )


def parse_canal(
    df: DataFrame,
    row_ddl: str,
    value_col: str = "value",
    *,
    keep_cols: list[str] | None = None,
    with_source_table: bool = False,
) -> DataFrame:
    """Alibaba Canal flatMessage JSON → the same typed change-row
    contract. Canal batches MULTIPLE rows per envelope (``data`` is an
    array) and stringifies every value, so the parse is from_json to
    ``array<map<string,string>>`` → posexplode → per-column try_cast to
    the declared row types (NULL-safe: canal encodes SQL NULL as JSON
    null map values). ``seq``: (envelope id, row index) packed —
    canal's id is the per-instance monotone batch counter."""
    row = T.StructType.fromDDL(row_ddl)
    env_s = T.StructType(
        [
            T.StructField("database", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("es", T.LongType()),   # source execute-time ms
            T.StructField("ts", T.LongType()),   # canal process-time ms
            T.StructField("id", T.LongType()),
            T.StructField("isDdl", T.BooleanType()),
            T.StructField(
                "data", T.ArrayType(T.MapType(T.StringType(), T.StringType()))
            ),
        ]
    )
    v = F.col(value_col)
    env = F.from_json(v, env_s)
    parsed = (
        df.filter(v.isNotNull() & (F.trim(v) != ""))
        .select(*[F.col(c) for c in (keep_cols or [])], env.alias("e"))
        .filter(
            ~F.coalesce(F.col("e.isDdl"), F.lit(False))
            & F.upper(F.col("e.type")).isin("INSERT", "UPDATE", "DELETE")
        )
        .select(
            *(keep_cols or []),
            "e",
            F.posexplode(F.col("e.data")).alias("_i", "_row"),
        )
    )
    t = F.upper(F.col("e.type"))
    op_out = (
        F.when(t == "INSERT", F.lit("I"))
        .when(t == "UPDATE", F.lit("U"))
        .otherwise(F.lit("D"))
    )
    cells = [
        F.col("_row").getItem(f.name).try_cast(f.dataType).alias(f.name)
        for f in row.fields
    ]
    extra = [F.col("e.table").alias("table")] if with_source_table else []
    return parsed.select(
        *(keep_cols or []),
        *extra,
        op_out.alias("op"),
        (F.col("e.id") * F.lit(1 << 20) + F.col("_i")).alias("seq"),
        F.coalesce(F.col("e.es"), F.col("e.ts")).alias("src_ts_ms"),
        F.lit(False).alias("is_snapshot"),
        *cells,
    )


def canal_change_events(
    df: DataFrame, value_col: str = "value", *, with_table: bool = False
) -> DataFrame:
    """North-rule adapter: Canal flatMessages of the page table → the
    canonical change-event frame."""
    return parse_canal(
        df, PAGE_ROW_DDL, value_col, with_source_table=with_table
    ).select(
        *(["table"] if with_table else []),
        "seq",
        "op",
        "url",
        F.timestamp_millis(F.col("warc_ts")).alias("warc_ts"),
        F.unbase64(F.col("html")).alias("html"),
        "lang",
    )


def parse_wal2json(
    df: DataFrame,
    row_ddl: str,
    value_col: str = "value",
    *,
    keep_cols: list[str] | None = None,
    with_source_table: bool = False,
    with_txn: bool = False,
) -> DataFrame:
    """PostgreSQL logical decoding via wal2json **format-version 2**
    (one JSON action per line; public plugin docs) → the same typed
    change-row contract as :func:`parse_debezium`.

    v2 renders each row as ``columns: [{name, type, value}, ...]`` —
    and, for deletes, the replica-identity image as ``identity: [...]``
    — so the parse is one ``from_json`` (scalar values of any JSON type
    land in the string field verbatim), ``map_from_entries``, then one
    ``try_cast`` per declared column. ``B``/``C`` (begin/commit), ``T``
    (truncate) and ``M`` (message) actions are filtered out.

    ``seq``: the LSN ``hi/lo`` pair packed as ``hi·2^32 + lo`` — the WAL
    byte offset, Postgres's own total order; falls back to ``xid`` when
    the stream was produced without ``include-lsn``. ``src_ts_ms`` from
    the ``include-timestamp`` field (``+00`` offset form). No snapshot
    marker exists in this wire format: ``is_snapshot`` is always false
    (initial-load rows arrive as plain inserts)."""
    row = T.StructType.fromDDL(row_ddl)
    cell = T.ArrayType(
        T.StructType(
            [
                T.StructField("name", T.StringType()),
                T.StructField("value", T.StringType()),
            ]
        )
    )
    env_s = T.StructType(
        [
            T.StructField("action", T.StringType()),
            T.StructField("schema", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("timestamp", T.StringType()),
            T.StructField("lsn", T.StringType()),
            T.StructField("xid", T.LongType()),
            T.StructField("columns", cell),
            T.StructField("identity", cell),
        ]
    )
    v = F.col(value_col)
    env = F.from_json(v, env_s)
    a = F.col("e.action")
    parsed = (
        df.filter(v.isNotNull() & (F.trim(v) != ""))
        .select(*[F.col(c) for c in (keep_cols or [])], env.alias("e"))
        .filter(a.isin("I", "U", "D"))
        .select(
            *(keep_cols or []),
            "e",
            F.map_from_entries(
                F.coalesce(F.col("e.columns"), F.col("e.identity"))
            ).alias("_m"),
        )
        .filter(F.col("_m").isNotNull())
    )
    lsn_seq = (
        F.conv(F.split(F.col("e.lsn"), "/")[0], 16, 10).cast("long")
        * F.lit(1 << 32)
        + F.conv(F.split(F.col("e.lsn"), "/")[1], 16, 10).cast("long")
    )
    cells = [
        F.col("_m").getItem(f.name).try_cast(f.dataType).alias(f.name)
        for f in row.fields
    ]
    extra = [F.col("e.table").alias("table")] if with_source_table else []
    if with_txn:
        # the grouping xid for transaction-boundary alignment
        # (streaming/txn_align.py); NULL when include-xids was off
        extra.append(F.col("e.xid").alias("txn_xid"))
    return parsed.select(
        *(keep_cols or []),
        *extra,
        F.col("e.action").alias("op"),
        F.coalesce(lsn_seq, F.col("e.xid")).alias("seq"),
        F.unix_millis(F.to_timestamp(F.col("e.timestamp"))).alias("src_ts_ms"),
        F.lit(False).alias("is_snapshot"),
        *cells,
    )


def _pg_bytea(col: Column) -> Column:
    """Postgres hex-format bytea (``\\x48...``) → binary; NULL-safe."""
    return F.unhex(F.regexp_replace(col, r"^\\x", ""))


def wal2json_change_events(
    df: DataFrame,
    value_col: str = "value",
    *,
    with_table: bool = False,
    with_txn: bool = False,
) -> DataFrame:
    """North-rule adapter: wal2json v2 lines of the page table → the
    canonical change-event frame (html arrives as hex bytea)."""
    return parse_wal2json(
        df, PAGE_ROW_DDL, value_col,
        with_source_table=with_table, with_txn=with_txn,
    ).select(
        *(["table"] if with_table else []),
        *(["txn_xid"] if with_txn else []),
        "seq",
        "op",
        "url",
        F.timestamp_millis(F.col("warc_ts")).alias("warc_ts"),
        _pg_bytea(F.col("html")).alias("html"),
        "lang",
    )


def wal2json_txn_markers(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Committed xids in a batch of wal2json v2 lines: ``C`` actions
    carry the transaction's xid (``include-transaction`` +
    ``include-xids``). One from_json over two fields — cheap enough to
    run alongside the event parse on the same lines."""
    env = F.from_json(F.col(value_col), "action string, xid long")
    return (
        df.select(env.alias("e"))
        .filter((F.col("e.action") == "C") & F.col("e.xid").isNotNull())
        .select(F.col("e.xid").alias("xid"))
    )


def parse_mongo_oplog(
    df: DataFrame,
    row_ddl: str,
    value_col: str = "value",
    *,
    ns: str | None = None,
    keep_cols: list[str] | None = None,
    with_source_table: bool = False,
) -> DataFrame:
    """MongoDB replica-set oplog entries (public ``oplog.rs`` format:
    ``op`` i/u/d/n/c, ``ns`` db.collection, ``ts`` as Extended-JSON
    ``$timestamp {t, i}``, ``o``/``o2`` documents) → the same typed
    change-row contract as the other wire parsers, with MINIMAL row
    images for ``$set`` updates:

    - ``i``: full document from ``o``;
    - ``u`` carrying ``o.$set``: PARTIAL image — only the set fields are
      non-null, untouched columns arrive NULL. This is the
      binlog_row_image=minimal shape: resolve downstream with
      ``operators/merge.py::patch_latest_per_key`` (per-column latest
      setter), not whole-row latest-wins;
    - ``u`` without ``$set`` (replace-style): full document from ``o``,
      key fields joined in from ``o2``;
    - ``d``: tombstone, key from ``o``;
    - ``n`` (noop) / ``c`` (command) drop; ``ns=`` filters to one
      collection.

    ``seq``: ``ts.t·2^32 + ts.i`` — the oplog timestamp's own total
    order. The $set-NULL ambiguity (a true SET col=NULL is
    indistinguishable from "not updated") is inherent to minimal
    images; see patch_latest_per_key's contract."""
    row = T.StructType.fromDDL(row_ddl)
    o_schema = T.StructType(list(row.fields) + [T.StructField("$set", row)])
    env_s = T.StructType(
        [
            T.StructField(
                "ts",
                T.StructType(
                    [
                        T.StructField(
                            "$timestamp",
                            T.StructType(
                                [
                                    T.StructField("t", T.LongType()),
                                    T.StructField("i", T.LongType()),
                                ]
                            ),
                        )
                    ]
                ),
            ),
            T.StructField("op", T.StringType()),
            T.StructField("ns", T.StringType()),
            T.StructField("o", o_schema),
            T.StructField("o2", row),
        ]
    )
    v = F.col(value_col)
    env = F.from_json(v, env_s)
    parsed = (
        df.filter(v.isNotNull() & (F.trim(v) != ""))
        .select(*[F.col(c) for c in (keep_cols or [])], env.alias("e"))
        .filter(F.col("e.op").isin("i", "u", "d"))
    )
    if ns is not None:
        parsed = parsed.filter(F.col("e.ns") == ns)
    op = F.col("e.op")
    oset = F.col("e.o").getField("$set")
    is_set = oset.isNotNull()
    tsf = F.col("e.ts").getField("$timestamp")
    cells = []
    for f in row.fields:
        img = (
            F.when(op == "i", F.col("e.o").getField(f.name))
            .when((op == "u") & is_set, oset.getField(f.name))
            .when((op == "u") & ~is_set, F.col("e.o").getField(f.name))
            .when(op == "d", F.col("e.o").getField(f.name))
        )
        # o2 carries the key fields of an update; payload fields there
        # are null, so coalesce is key-join + image in one expression
        cells.append(
            F.coalesce(F.col("e.o2").getField(f.name), img).alias(f.name)
        )
    extra = (
        [F.substring_index(F.col("e.ns"), ".", -1).alias("table")]
        if with_source_table else []
    )
    op_out = (
        F.when(op == "i", F.lit("I"))
        .when(op == "u", F.lit("U"))
        .otherwise(F.lit("D"))
    )
    return parsed.select(
        *(keep_cols or []),
        *extra,
        op_out.alias("op"),
        (tsf.getField("t") * F.lit(1 << 32) + F.coalesce(
            tsf.getField("i"), F.lit(0)
        )).alias("seq"),
        (tsf.getField("t") * 1000).alias("src_ts_ms"),
        F.lit(False).alias("is_snapshot"),
        ((op == "u") & is_set).alias("is_partial"),
        *cells,
    )


def parse_dynamodb_stream(
    df: DataFrame,
    row_ddl: str,
    value_col: str = "value",
    *,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """DynamoDB Streams records (the public Kinesis-adapter/Lambda
    shape: ``eventName`` INSERT/MODIFY/REMOVE, ``dynamodb.Keys`` /
    ``NewImage`` / ``OldImage`` as typed attribute-value maps
    ``{"S":…,"N":"…","BOOL":…,"NULL":true,"B":base64}``) → the same
    typed change-row contract as the other wire parsers.

    Typed decode per declared engine type: string←S, long/double←N
    (DynamoDB numbers travel as strings), boolean←BOOL, binary←B
    (base64), timestamp←S ISO or N epoch-ms; an attribute carrying
    ``NULL:true`` — or absent from the image — lands as NULL. REMOVE
    rows are tombstones: key fields from ``Keys``, payload NULL.

    ``seq``: SequenceNumber try-cast to bigint. The production caveat:
    real stream sequence numbers are up to 40 decimal digits — beyond
    bigint, order by (src_ts_ms, lexicographic zero-padded
    SequenceNumber) instead; ``seq_str`` carries the raw value for
    exactly that."""
    row = T.StructType.fromDDL(row_ddl)
    av = T.StructType(
        [
            T.StructField("S", T.StringType()),
            T.StructField("N", T.StringType()),
            T.StructField("BOOL", T.BooleanType()),
            T.StructField("NULL", T.BooleanType()),
            T.StructField("B", T.StringType()),
        ]
    )
    avmap = T.MapType(T.StringType(), av)
    env_s = T.StructType(
        [
            T.StructField("eventName", T.StringType()),
            T.StructField(
                "dynamodb",
                T.StructType(
                    [
                        T.StructField(
                            "ApproximateCreationDateTime", T.DoubleType()
                        ),
                        T.StructField("Keys", avmap),
                        T.StructField("NewImage", avmap),
                        T.StructField("OldImage", avmap),
                        T.StructField("SequenceNumber", T.StringType()),
                    ]
                ),
            ),
        ]
    )
    v = F.col(value_col)
    env = F.from_json(v, env_s)
    parsed = (
        df.filter(v.isNotNull() & (F.trim(v) != ""))
        .select(*[F.col(c) for c in (keep_cols or [])], env.alias("e"))
        .filter(
            F.col("e.eventName").isin("INSERT", "MODIFY", "REMOVE")
        )
    )
    op = F.col("e.eventName")
    keys = F.col("e.dynamodb.Keys")
    img = F.when(op == "REMOVE", keys).otherwise(
        F.col("e.dynamodb.NewImage")
    )

    def cell(f):
        a = img.getItem(f.name)
        # coalesce the marker: an absent NULL field must read as False,
        # not SQL-null (which would null the whole when() branch)
        null_marked = a.isNull() | F.coalesce(
            a.getField("NULL"), F.lit(False)
        )
        t = f.dataType.simpleString()
        if t == "boolean":
            out = a.getField("BOOL")
        elif t in ("bigint", "int"):
            out = a.getField("N").cast(f.dataType)
        elif t == "double":
            out = a.getField("N").cast("double")
        elif t == "binary":
            out = F.unbase64(a.getField("B"))
        elif t == "timestamp":
            out = F.coalesce(
                F.to_timestamp(a.getField("S")),
                F.timestamp_millis(a.getField("N").cast("long")),
            )
        else:
            out = a.getField("S")
        return F.when(~null_marked, out).alias(f.name)

    op_out = (
        F.when(op == "INSERT", F.lit("I"))
        .when(op == "MODIFY", F.lit("U"))
        .otherwise(F.lit("D"))
    )
    seq_str = F.col("e.dynamodb.SequenceNumber")
    return parsed.select(
        *(keep_cols or []),
        op_out.alias("op"),
        seq_str.try_cast("long").alias("seq"),
        seq_str.alias("seq_str"),
        (F.col("e.dynamodb.ApproximateCreationDateTime") * 1000)
        .cast("long")
        .alias("src_ts_ms"),
        F.lit(False).alias("is_snapshot"),
        F.lit(False).alias("is_partial"),
        *[cell(f) for f in row.fields],
    )


#: MySQL → engine type lattice for DDL-driven evolution (the engine's
#: six-type model, reference spi/type — everything maps into it).
_MYSQL_TYPE_MAP = [
    (("tinyint(1)", "bool", "boolean"), "boolean"),
    (("bigint", "int", "integer", "mediumint", "smallint", "tinyint"),
     "long"),
    (("double", "float", "decimal", "numeric", "real"), "double"),
    (("datetime", "timestamp", "date", "time"), "timestamp"),
    (("json",), "json"),
]


def _mysql_type(t: str) -> str:
    t = t.strip().lower()
    for prefixes, out in _MYSQL_TYPE_MAP:
        if any(t == p or t.startswith(p + "(") or t.startswith(p + " ")
               for p in prefixes):
            return out
    return "string"  # varchar/char/text/blob/enum/... → string


_DDL_CLAUSE_RE = re.compile(r"(?is)^\s*alter\s+table\s+\S+\s+(.*)$")


def ddl_to_schema_changes(sql: str) -> list[dict]:
    """Parse a MySQL ``ALTER TABLE`` statement into the engine's
    schema-change payloads (streaming/replay.py::apply_schema_change —
    ``{"action": add|rename|widen|drop, ...}``), one per comma-separated
    clause. Supported clause subset (what binlog DDL traffic actually
    carries): ``ADD [COLUMN] name type``, ``DROP [COLUMN] name``,
    ``RENAME COLUMN a TO b``, ``MODIFY [COLUMN] name type`` (→ widen),
    ``CHANGE [COLUMN] a b type`` (→ rename, plus widen when the type
    moved). Unrecognized statements/clauses yield [] — DDL the engine
    can't express (indexes, charsets, partitioning) must not poison the
    stream. Identifier backquotes are stripped; types map into the
    engine's six-type model (unknown → string)."""
    m = _DDL_CLAUSE_RE.match(sql or "")
    if not m:
        return []
    body = m.group(1).rstrip(" ;")
    # split on top-level commas (types like decimal(10,2) carry commas)
    clauses, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            clauses.append(body[start:i])
            start = i + 1
    clauses.append(body[start:])
    uq = lambda s: s.strip().strip("`\"")  # noqa: E731
    # ADD/DROP also introduce non-column objects — those clauses are
    # structural noise here, not columns named "INDEX"
    not_cols = {"index", "key", "constraint", "unique", "primary",
                "foreign", "fulltext", "spatial", "partition", "check"}
    out: list[dict] = []
    for c in clauses:
        c = c.strip()
        if (
            (m := re.match(r"(?is)^add\s+(?:column\s+)?(\S+)\s+(\S+)", c))
            and uq(m.group(1)).lower() not in not_cols
        ):
            out.append({"action": "add", "column": uq(m.group(1)),
                        "type": _mysql_type(m.group(2))})
        elif (
            (m := re.match(r"(?is)^drop\s+(?:column\s+)?(\S+)$", c))
            and uq(m.group(1)).lower() not in not_cols
        ):
            out.append({"action": "drop", "column": uq(m.group(1))})
        elif m := re.match(
            r"(?is)^rename\s+column\s+(\S+)\s+to\s+(\S+)$", c
        ):
            out.append({"action": "rename", "from": uq(m.group(1)),
                        "to": uq(m.group(2))})
        elif m := re.match(
            r"(?is)^modify\s+(?:column\s+)?(\S+)\s+(\S+)", c
        ):
            out.append({"action": "widen", "column": uq(m.group(1)),
                        "to": _mysql_type(m.group(2))})
        elif m := re.match(
            r"(?is)^change\s+(?:column\s+)?(\S+)\s+(\S+)\s+(\S+)", c
        ):
            old, new = uq(m.group(1)), uq(m.group(2))
            if old != new:
                out.append({"action": "rename", "from": old, "to": new})
            out.append({"action": "widen", "column": new,
                        "to": _mysql_type(m.group(3))})
    return out


def canal_schema_change_events(
    df: DataFrame, value_col: str = "value", *, with_table: bool = False
) -> DataFrame:
    """Canal DDL flatMessages (``isDdl: true``, ``sql`` carries the
    statement) → the engine's op='S' schema-change events, replayable by
    ``replay_batches`` alongside the data events: each supported ALTER
    clause becomes one event, (envelope id, clause index)-ordered so DDL
    serializes against the surrounding data batches. The SQL-subset
    parse runs in an Arrow-batched pandas UDF over the FEW DDL rows
    (DDL is ~0 rpm next to row traffic — never the hot path)."""
    env_s = T.StructType(
        [
            T.StructField("type", T.StringType()),
            T.StructField("es", T.LongType()),
            T.StructField("id", T.LongType()),
            T.StructField("table", T.StringType()),
            T.StructField("isDdl", T.BooleanType()),
            T.StructField("sql", T.StringType()),
        ]
    )
    v = F.col(value_col)
    ddl = (
        df.filter(v.isNotNull() & (F.trim(v) != ""))
        .select(F.from_json(v, env_s).alias("e"))
        .filter(F.coalesce(F.col("e.isDdl"), F.lit(False)))
        .select("e.id", "e.es", "e.table", "e.sql")
    )

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _parse(sql: pd.Series) -> pd.Series:
        import json as _json

        return sql.map(
            lambda s: [_json.dumps(p) for p in ddl_to_schema_changes(s)]
        )

    tcol = [F.col("table")] if with_table else []
    return (
        ddl.select(
            "id", "es", "table",
            F.posexplode(_parse(F.col("sql"))).alias("_i", "payload"),
        )
        .select(
            *tcol,
            (F.col("id") * F.lit(1 << 20) + F.col("_i")).alias("seq"),
            F.lit("S").alias("op"),
            F.lit(None).cast("string").alias("url"),
            F.timestamp_millis(F.col("es")).alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"),
            F.lit(None).cast("string").alias("lang"),
            F.col("payload").alias("schema_change"),
        )
    )


def debezium_envelope_col(
    op: Column,
    after: Column | None,
    *,
    before: Column | None = None,
    pos: Column | None = None,
    ts_ms: Column | None = None,
    snapshot: Column | None = None,
    schemas_enable: Column | None = None,
    table: Column | None = None,
) -> Column:
    """Synthesize one envelope as a JSON string Column — pure JVM
    (``to_json`` over a struct; fixtures never pay Python to BUILD wire
    streams). ``after``/``before`` are struct Columns in WIRE types (see
    ``envelope_schema``). ``to_json`` omits null fields, which parses
    identically to Debezium's explicit ``"before": null``. When
    ``schemas_enable`` is true for a row, the envelope is wrapped in the
    Kafka Connect ``{"schema":…,"payload":…}`` carrier."""
    parts: list[Column] = []
    if before is not None:
        parts.append(before.alias("before"))
    if after is not None:
        parts.append(after.alias("after"))
    src_fields = [
        F.lit("synth").alias("connector"),
        (ts_ms if ts_ms is not None else F.lit(None).cast("long")).alias("ts_ms"),
    ]
    if pos is not None:
        src_fields.append(pos.cast("long").alias("pos"))
    if snapshot is not None:
        src_fields.append(snapshot.alias("snapshot"))
    if table is not None:
        src_fields.append(table.alias("table"))
    parts.append(F.struct(*src_fields).alias("source"))
    parts.append(op.alias("op"))
    if ts_ms is not None:
        parts.append(ts_ms.cast("long").alias("ts_ms"))
    flat = F.to_json(F.struct(*parts))
    if schemas_enable is None:
        return flat
    wrapped = F.concat(
        F.lit('{"schema":{"type":"struct","optional":false},"payload":'),
        flat,
        F.lit("}"),
    )
    return F.when(schemas_enable, wrapped).otherwise(flat)
