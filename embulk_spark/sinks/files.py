"""File output: DataFrame → formatted files (csv/json[l]), plus the
stdout/null sinks.

Re-expression of Embulk's output chain formatter → encoders → file-output
(composed in the reference at spi/FileOutputRunner.java:110-134):

- embulk-formatter-csv (newline / delimiter / header / timezone-stable
  timestamp text; formatting analogue spi/util/PagePrinter.java:39-99)
  → ``df.write.csv`` options;
- embulk-encoder-gzip/-bzip2 → ``option("compression", ...)``;
- embulk-output-file's ``prefix + index + suffix`` file naming
  (used by the reference tests, embulk-junit4/.../TestingEmbulk.java:330-346)
  → Spark's part-file naming under a prefix directory; ``min_output_tasks``
  fan-out (exec/LocalExecutorPlugin.java:44-48) is Spark's partition count;
- embulk-output-stdout / -null → ``df.show()`` / count-only action.

Writes are transactional per directory: Spark's file-output committer gives
the same all-tasks-commit-or-fail gate as BulkLoader's commit check
(exec/BulkLoader.java:541-548). For the exactly-once CDC sink see
``embulk_spark.streaming.lake`` instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.coerce import timestamp_to_string

NEWLINES = {"CRLF": "\r\n", "LF": "\n", "CR": "\r"}


def _formatted(df: DataFrame, formatter: dict) -> DataFrame:
    """Render timestamp columns as canonical text the way PagePrinter does
    (spi/util/PagePrinter.java:67-99 via Instants.java:20-76), so output
    bytes are deterministic across sessions/timezones."""
    cols = []
    for f in df.schema.fields:
        if f.dataType.typeName() == "timestamp":
            cols.append(timestamp_to_string(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def write_csv(df: DataFrame, out_config: dict) -> None:
    formatter = out_config.get("formatter", {})
    writer = (
        _formatted(df, formatter)
        .write.mode(out_config.get("mode", "overwrite"))
        .option("delimiter", formatter.get("delimiter", ","))
        .option("header", str(bool(formatter.get("header_line", True))).lower())
        .option("lineSep", NEWLINES.get(formatter.get("newline", "LF"), "\n"))
        .option("charset", formatter.get("charset", "UTF-8"))
        .option("quote", formatter.get("quote", '"'))
        .option("escape", formatter.get("escape", '"'))
        .option("nullValue", formatter.get("null_string", ""))
    )
    codec = _encoder_codec(out_config)
    if codec:
        writer = writer.option("compression", codec)
    writer.csv(_out_dir(out_config))


def write_jsonl(df: DataFrame, out_config: dict) -> None:
    writer = df.write.mode(out_config.get("mode", "overwrite"))
    codec = _encoder_codec(out_config)
    if codec:
        writer = writer.option("compression", codec)
    writer.json(_out_dir(out_config))


def write_parquet(df: DataFrame, out_config: dict) -> None:
    df.write.mode(out_config.get("mode", "overwrite")).parquet(_out_dir(out_config))


#: Spark type name → Avro primitive for the formatter-avro schema map
_SPARK_TO_AVRO = {
    "long": "long",
    "integer": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "binary": "bytes",
}


def _binary_rows(df: DataFrame, out_config: dict):
    """Shared shape for the binary formatters (avro/msgpack): timestamps
    render canonical first (byte-determinism), then each partition
    yields its row dicts. Nullable handling: pandas NaN → None, integral
    columns restored to int (pandas widens nullable longs to float)."""
    import pandas as pd

    df2 = _formatted(df, out_config.get("formatter", {}))
    int_cols = {
        f.name for f in df2.schema.fields if f.dataType.typeName() in ("long", "integer")
    }

    def rows_of(pdf: pd.DataFrame) -> list[dict]:
        recs = []
        for r in pdf.itertuples(index=False):
            d = {}
            for k, v in zip(pdf.columns, r):
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    d[k] = None
                elif k in int_cols:
                    d[k] = int(v)
                elif isinstance(v, bytearray):
                    d[k] = bytes(v)
                else:
                    d[k] = v
            recs.append(d)
        return recs

    return df2, rows_of


def _write_partition_files(
    df2: DataFrame, out_dir: str, suffix: str, blob_of
) -> None:
    """FileOutputPlugin unit: ONE output file per task, written by the
    executor (deterministic part-<partition> names; local-FS contract
    like the reference's file output — object stores would swap in
    their client here). Empty partitions emit nothing."""
    import os

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        if f.startswith("part-"):
            os.unlink(os.path.join(out_dir, f))

    def _write(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        chunks = [pdf for pdf in it if len(pdf)]
        n = 0
        if chunks:
            blob = blob_of(pd.concat(chunks, ignore_index=True))
            with open(os.path.join(out_dir, f"part-{pid:05d}{suffix}"), "wb") as fh:
                fh.write(blob)
            n = sum(len(c) for c in chunks)
        yield pd.DataFrame({"n": [n]})

    df2.mapInPandas(_write, "n long").agg(F.sum("n")).head()


def write_avro(df: DataFrame, out_config: dict) -> None:
    """formatter-avro (ecosystem): Object Container Files via the
    vendored pure-Python OCF writer (sources/avro.py), nullable columns
    as ["null", T] unions, deflate when an encoder is configured."""
    from ..sources.avro import write_container

    df2, rows_of = _binary_rows(df, out_config)
    fields = []
    for f in df2.schema.fields:
        t = _SPARK_TO_AVRO.get(f.dataType.typeName())
        if t is None:
            raise ValueError(f"formatter-avro: unsupported type {f.dataType}")
        fields.append({"name": f.name, "type": ["null", t] if f.nullable else t})
    schema = {"type": "record", "name": "record", "fields": fields}
    codec = "deflate" if _encoder_codec(out_config) else "null"
    _write_partition_files(
        df2,
        _out_dir(out_config),
        ".avro",
        lambda pdf: write_container(schema, rows_of(pdf), codec=codec),
    )


def write_msgpack(df: DataFrame, out_config: dict) -> None:
    """formatter-msgpack (ecosystem): map-encoded row stream per file
    (the parser's `row_encoding: map`, `file_encoding: sequence`)."""
    from ..sources.msgpack import pack_one

    df2, rows_of = _binary_rows(df, out_config)
    _write_partition_files(
        df2,
        _out_dir(out_config),
        ".msgpack",
        lambda pdf: b"".join(pack_one(r) for r in rows_of(pdf)),
    )


def _out_dir(out_config: dict) -> str:
    # Embulk writes prefix+%03d+suffix flat files; Spark's equivalent unit
    # is the prefix directory (part files inside). Strip a trailing
    # separator-ish char so `/tmp/out_` becomes directory `/tmp/out_`.
    return out_config["path_prefix"]


def _encoder_codec(out_config: dict) -> str | None:
    encs = out_config.get("encoders") or []
    for e in encs:
        t = e.get("type")
        if t in ("gzip", "bzip2"):
            return {"gzip": "gzip", "bzip2": "bzip2"}[t]
    return None


def write_output(df: DataFrame, out_config: dict) -> dict:
    """Dispatch on out.type; returns a TaskReport-like dict (rows, sink)."""
    otype = out_config.get("type", "stdout")
    if otype == "file":
        fmt = out_config.get("formatter", {}).get("type", "csv")
        if fmt == "csv":
            write_csv(df, out_config)
        elif fmt in ("json", "jsonl"):
            write_jsonl(df, out_config)
        elif fmt == "parquet":
            write_parquet(df, out_config)
        elif fmt == "orc":
            df.write.mode(out_config.get("mode", "overwrite")).orc(
                _out_dir(out_config)
            )
        elif fmt == "avro":
            write_avro(df, out_config)
        elif fmt == "msgpack":
            write_msgpack(df, out_config)
        else:
            raise ValueError(f"unknown formatter type: {fmt}")
        return {"type": "file", "path_prefix": out_config["path_prefix"]}
    if otype == "corpus_shards":
        # sharded training-corpus export with audit manifest
        # (sinks/corpus.py): deterministic md5 shards + _manifest.json
        from .corpus import write_corpus_shards

        manifest = write_corpus_shards(
            df,
            out_config["path"],
            id_col=out_config.get("id", "doc_id"),
            text_col=out_config.get("column", "text"),
            n_shards=int(out_config.get("n_shards", 16)),
            salt=str(out_config.get("salt", "shard1")),
            fmt=out_config.get("format", "parquet"),
        )
        return {
            "type": "corpus_shards",
            "path": out_config["path"],
            "rows": manifest["total_rows"],
            "n_tokens": manifest["total_tokens"],
        }
    if otype == "lake":
        # output-lake: the pipeline run IS one CDC transaction — rows land
        # as ONE idempotent epoch commit on a ParquetLakeTable (or, with
        # mode: import, as the bulk-load base of an empty table). This is
        # the bridge between the reference's bulk-load identity and the
        # exactly-once sink: re-running a config with the same epoch
        # skips (committed-epoch set), and the returned config_diff
        # advances the epoch so `run --config-diff` loops become an
        # incremental ingest pipeline. Config:
        #   path, epoch (default 0), mode merge|import, n_buckets,
        #   columns: {url: <src>, warc_ts: <src>, ...} target←source map,
        #   extract (default: only when no text column is provided).
        from ..streaming.lake import ParquetLakeTable

        ev = df
        for tgt, src in (out_config.get("columns") or {}).items():
            ev = ev.withColumnRenamed(src, tgt)
        if "url" not in ev.columns:
            raise ValueError(
                "lake output needs a 'url' column — map one with "
                "columns: {url: <source column>}"
            )
        defaults = {
            "op": F.lit("U"),
            "seq": F.lit(0).cast("long"),
            "warc_ts": F.to_timestamp(F.lit("1970-01-01 00:00:00")),
            "html": F.lit(None).cast("binary"),
            "lang": F.lit(None).cast("string"),
        }
        for name, default in defaults.items():
            if name not in ev.columns:
                ev = ev.withColumn(name, default)
        epoch = int(out_config.get("epoch", 0))
        extract = bool(out_config.get("extract", "text" not in ev.columns))
        table = ParquetLakeTable(
            df.sparkSession, out_config["path"],
            n_buckets=int(out_config.get("n_buckets", 16)),
        )
        mode = out_config.get("mode", "merge")
        if mode == "import":
            report = table.bulk_import(ev, epoch, extract=extract)
        elif mode == "merge":
            report = table.merge_epoch(ev, epoch, extract=extract)
        else:
            raise ValueError(f"unknown lake output mode: {mode}")
        return {
            "type": "lake",
            "path": out_config["path"],
            "epoch": epoch,
            "skipped_duplicate_epoch": bool(
                report.get("skipped_duplicate_epoch")
            ),
            "rows": report.get("rows_written", report.get("rows_imported")),
            "config_diff": {"epoch": epoch + 1},
        }
    if otype == "jdbc_table":
        # embulk-output-jdbc analogue: six write modes with staged-load +
        # single-transaction publication (sinks/jdbc_modes.py)
        from .jdbc_modes import JdbcModeTable

        table = JdbcModeTable(
            df.sparkSession,
            out_config["path"],
            n_buckets=int(out_config.get("n_buckets", 16)),
        )
        report = table.write(
            df,
            out_config.get("mode", "insert"),
            merge_keys=out_config.get("merge_keys"),
            txn_id=out_config.get("txn_id"),
        )
        return {"type": "jdbc_table", "path": out_config["path"], **report}
    if otype == "stdout":
        df.show(truncate=False)
        return {"type": "stdout"}
    if otype == "null":
        # embulk-output-null: consume & discard (still runs the plan once)
        df.write.format("noop").mode("overwrite").save()
        return {"type": "null"}
    raise ValueError(f"unknown output type: {otype}")


# ---------------------------------------------------------------------------
# bucketed tables — pre-shuffled layouts for co-located (shuffle-free) joins
# ---------------------------------------------------------------------------

def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    *,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sort-clustered) parquet
    table: the shuffle on ``bucket_cols`` is paid ONCE at write time, and
    every later equi-join/aggregation on those columns between tables
    bucketed the same way plans with NO exchange — the co-located-join
    layout for fact tables that join repeatedly at 100 TB (dims
    broadcast; same-keyed facts bucket). ``sort_cols`` additionally
    pre-sorts within buckets so the join skips its sort step too."""
    w = (
        df.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def register_bucketed(
    spark: SparkSession,
    name: str,
    path: str,
    ddl: str,
    *,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Re-attach an existing bucketed layout to a (fresh) catalog — on a
    cluster the metastore persists table metadata, but a new local
    session must re-register or Spark forgets the files are bucketed and
    re-shuffles. Idempotent."""
    sort = (
        f"SORTED BY ({', '.join(sort_cols)})" if sort_cols else ""
    )
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({ddl}) USING parquet "
        f"CLUSTERED BY ({', '.join(bucket_cols)}) {sort} "
        f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
    )
