"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC replay on sf0.001.
``queries()`` exposes one entry per implemented operator (SURVEY.md §2 and
the training-data-pipeline extensions); ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible one. Column names/aliases match
between both sides (the driver sorts columns by name before hashing).
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable


def _scratch_root(kind: str, sf_dir: str) -> str:
    """Fresh per-PROCESS scratch dir for a stateful query (lake build +
    epoch folds): two concurrent runners (the oracle gate and
    tools/explain_plans.py both execute queries()) must never rmtree /
    fold the same root. Stale siblings from dead processes are swept so
    repeated gate runs don't accumulate in tmp."""
    import glob
    import hashlib
    import os

    base = "embulk_spark_%s_%s" % (
        kind, hashlib.md5(sf_dir.encode()).hexdigest()[:8],
    )
    for d in glob.glob(os.path.join(tempfile.gettempdir(), base + "_p*")):
        try:
            pid = int(d.rsplit("_p", 1)[1])
            os.kill(pid, 0)  # raises if that process is gone
        except ProcessLookupError:
            shutil.rmtree(d, ignore_errors=True)
        except (ValueError, PermissionError):
            pass
    root = os.path.join(
        tempfile.gettempdir(), f"{base}_p{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    return root

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_DEFAULT = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship: CDC replay of the events table into a lake table
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: treat sf0.001 ``events`` as a change stream keyed by
    user_id ('error' ⇒ delete), replay it epoch-by-epoch through the
    exactly-once MERGE sink, and return the published final state."""
    from embulk_spark.streaming.lake import ParquetLakeTable
    from embulk_spark.streaming.replay import replay_batches

    ev = _t(spark, SF_DEFAULT, "events")
    changes = ev.select(
        F.col("event_id").alias("seq"),
        F.pmod(F.col("event_id"), F.lit(4)).cast("long").alias("epoch"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.concat(F.lit("user://"), F.col("user_id").cast("string")).alias("url"),
        F.col("ts").alias("warc_ts"),
        F.encode(F.concat(F.lit("<p>"), F.col("props"), F.lit("</p>")), "utf-8").alias(
            "html"
        ),
        F.lit("en").alias("lang"),
        F.lit(None).cast("string").alias("schema_change"),
    )
    tmp = tempfile.mkdtemp(prefix="embulk_spark_entry_")
    shutil.rmtree(tmp, ignore_errors=True)
    table = ParquetLakeTable(spark, tmp, n_buckets=4)
    replay_batches(table, changes)
    return table.published()


# ---------------------------------------------------------------------------
# queries — each (spark, sf_dir) -> DataFrame
# ---------------------------------------------------------------------------

def _q_cdc_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-event-per-key via max_by hash agg (dedup_latest pattern)."""
    ev = _t(spark, sf_dir, "events")
    pick = lambda c: F.max_by(c, F.struct("ts", "event_id"))
    return ev.groupBy("user_id").agg(
        pick(F.col("event_id")).alias("last_event_id"),
        pick(F.col("event_type")).alias("last_event_type"),
        pick(F.col("value")).alias("last_value"),
        F.unix_micros(pick(F.col("ts")).cast("timestamp")).alias("last_ts_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


def _q_cdc_apply_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog apply: latest per key wins; latest=='error' ⇒ deleted."""
    ev = _t(spark, sf_dir, "events")
    pick = lambda c: F.max_by(c, F.struct("ts", "event_id"))
    latest = ev.groupBy("user_id").agg(
        pick(F.col("event_type")).alias("last_type"),
        pick(F.col("value")).alias("last_value"),
        F.unix_micros(pick(F.col("ts")).cast("timestamp")).alias("last_ts_us"),
    )
    return latest.filter(F.col("last_type") != "error").select(
        "user_id", "last_value", "last_ts_us"
    )


def _q_cdc_patch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level CDC patch merge for minimal row images
    (operators/merge.py:patch_latest_per_key — MySQL
    binlog_row_image=minimal / Debezium partial updates): each payload
    column resolves to its latest setter independently, a delete fences
    everything before it. Fixture: each event type patches ONE column
    (view→view_val, purchase→purchase_val, click→click_props;
    signup patches nothing), 'error' is the delete."""
    from embulk_spark.operators.merge import patch_latest_per_key

    ev = _t(spark, sf_dir, "events")
    batch = ev.select(
        F.col("user_id").alias("uid"),
        F.col("event_id").alias("ord"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.when(F.col("event_type") == "view", F.col("value")).alias("view_val"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias(
            "purchase_val"
        ),
        F.when(F.col("event_type") == "click", F.col("props")).alias(
            "click_props"
        ),
    )
    return patch_latest_per_key(batch, key="uid", order=("ord",))


def _q_cdc_ingest_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-commit ingest metrics shape: counts + exact distinct + sums."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        F.unix_micros(F.max("ts").cast("timestamp")).alias("max_ts_us"),
    )


def _q_filter_remove_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embulk-filter-remove_columns ≡ projection (build.gradle:17)."""
    ev = _t(spark, sf_dir, "events")
    return ev.drop("props", "value").select(
        "event_id", "user_id", "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    )


def _q_filter_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embulk-filter-rename ≡ withColumnRenamed (build.gradle:18)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumnRenamed("event_type", "type")
        .withColumnRenamed("value", "v")
        .select("event_id", "type", "v")
    )


def _q_filter_row_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embulk-filter-row: AND-combined predicate chain with a negated
    regexp condition (operators/rowops.py:row_filter) — pure Column
    predicates, pushed to the parquet scan by Catalyst."""
    from embulk_spark.operators.rowops import row_filter

    ev = _t(spark, sf_dir, "events")
    out = row_filter(
        ev,
        [
            {"column": "event_type", "operator": "start_with", "argument": "p"},
            {"column": "value", "operator": ">=", "argument": 50.0},
            {"column": "props", "operator": "regexp",
             "argument": '"k": 1[0-9]}', "not": True},
        ],
        "AND",
    )
    return out.select("event_id", "event_type", "value")


def _q_filter_column_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embulk-filter-column: keep+reorder with src copy and typed default,
    then add_columns (operators/rowops.py:column_ops)."""
    from embulk_spark.operators.rowops import column_ops

    ev = _t(spark, sf_dir, "events")
    return column_ops(
        ev,
        columns=[
            {"name": "event_id"},
            {"name": "kind", "src": "event_type"},
            {"name": "site", "type": "string", "default": "cc"},
        ],
        add_columns=[{"name": "kind_copy", "src": "kind"}],
    )


def _q_filter_typecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embulk-filter-typecast: re-type columns with the coercion-setter
    matrix (operators/rowops.py:typecast_columns) — double→long rounds
    half-away-from-zero, string→boolean is TRUE-set-or-null, timestamp→
    long is epoch seconds, all reference *ColumnSetter semantics."""
    from embulk_spark.operators.rowops import typecast_columns

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "value", "ts", "event_type"
    )
    out = typecast_columns(
        ev,
        [
            {"name": "value", "type": "long"},
            {"name": "ts", "type": "long"},
            {"name": "event_type", "type": "boolean"},
        ],
    )
    return out


def _q_filter_add_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embulk-filter-add_time: event-time column from another column and
    from a fixed value (operators/rowops.py:add_time)."""
    from embulk_spark.operators.rowops import add_time

    ev = _t(spark, sf_dir, "events").select("event_id", "ts")
    out = add_time(ev, {"to_column": {"name": "etime"},
                        "from_column": {"name": "ts"}})
    out = add_time(
        out,
        {"to_column": {"name": "batch_time"},
         "from_value": {"value": "2024-06-01 12:00:00",
                        "format": "%Y-%m-%d %H:%M:%S"}},
    )
    # events.ts is TIMESTAMP_NTZ in the parquet; session tz is UTC, so the
    # NTZ→TZ cast is identity on the instant and unix_micros can apply.
    return out.select(
        "event_id",
        F.unix_micros(F.col("etime").cast("timestamp")).alias("etime_us"),
        F.unix_micros(F.col("batch_time").cast("timestamp")).alias("batch_time_us"),
    )


def _q_filter_flatten_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embulk-filter-flatten_json (operators/rowops.py:flatten_json):
    one row per element of a JSON array — synthesize a 2-element items
    array per event (pure JVM concat), flatten it back."""
    from embulk_spark.operators.rowops import flatten_json

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.concat(
            F.lit('{"items": [{"k": "a", "v": '),
            F.col("event_id"),
            F.lit('}, {"k": "b", "v": '),
            F.col("event_id") * 2,
            F.lit("}]}"),
        ).alias("rec"),
    )
    return flatten_json(
        ev, "rec", "/items",
        [{"name": "k", "type": "string"}, {"name": "v", "type": "long"}],
    )


def _q_filter_expand_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embulk-filter-expand_json: one JSON column → typed top-level
    columns via get_json_object + setter coercion
    (operators/rowops.py:expand_json)."""
    from embulk_spark.operators.rowops import expand_json

    ev = _t(spark, sf_dir, "events").select("event_id", "props")
    return expand_json(ev, "props", [{"name": "k", "type": "long"}])


def _q_parser_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embulk-parser-regexp: named-group line parsing → typed columns
    (sources/files.py:parse_regexp_column); non-matching lines skipped,
    captures coerced with string-setter semantics. Fixture: rebuild a
    log-ish line from documents, parse it back."""
    from embulk_spark.sources.files import parse_regexp_column

    docs = _t(spark, sf_dir, "documents")
    lines = docs.select(
        F.concat_ws(
            " ", F.col("doc_id"), F.col("lang"), F.col("n_chars")
        ).alias("value")
    )
    return parse_regexp_column(
        lines,
        F.col("value"),
        r"^(\d+) ([a-z]+) (\d+)$",
        [
            {"name": "doc_id", "type": "long"},
            {"name": "lang", "type": "string"},
            {"name": "n_chars", "type": "long"},
        ],
    )


def _q_parser_poslen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embulk-parser-poslen: fixed-width records → typed columns
    (sources/files.py:parse_poslen_column). Fixture: render documents
    fields into padded slots with format_string (pure JVM), slice them
    back out; trim + string-setter coercion give the plugin's
    null-on-bad-numeric policy."""
    from embulk_spark.sources.files import parse_poslen_column

    docs = _t(spark, sf_dir, "documents")
    lines = docs.select(
        F.format_string("%08d%-6s%010d", "doc_id", "lang", "n_chars").alias("value")
    )
    return parse_poslen_column(
        lines,
        F.col("value"),
        [
            {"name": "doc_id", "type": "long", "pos": 0, "len": 8},
            {"name": "lang", "type": "string", "pos": 8, "len": 6},
            {"name": "n_chars", "type": "long", "pos": 14, "len": 10},
        ],
    )


def _q_incremental_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embulk-input-jdbc incremental contract (sources/cursor.py): rows
    strictly after the (ts, event_id) cursor tuple — the lexicographic
    predicate pushes into the parquet scan, the next cursor is one
    max(struct) agg, never an ORDER BY."""
    from embulk_spark.sources.cursor import incremental_scan

    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    out, _ = incremental_scan(ev, ["ts", "event_id"], ["2024-01-15 12:00:00", 0])
    return out.select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
    )


def _q_filter_join_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embulk-filter-join_file: broadcast lookup join against a small
    master table (operators/rowops.py:join_file) — the stream side never
    shuffles; the side is first-wins deduped on its key. Fixture: map
    lang → script family over documents."""
    from embulk_spark.operators.rowops import join_file

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return join_file(
        docs,
        {
            "on": [{"base": "lang", "file": "code"}],
            "columns": [
                {"name": "code", "type": "string"},
                {"name": "family", "type": "string"},
            ],
            "data": [
                {"code": "en", "family": "germanic"},
                {"code": "de", "family": "germanic"},
                {"code": "fr", "family": "romance"},
                {"code": "es", "family": "romance"},
                {"code": "en", "family": "zz-dup-loses"},
            ],
            "prefix": "m_",
        },
    )


def _q_parser_grok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embulk-parser-grok (sources/grok.py): grok compiles ONCE on the
    driver to a java regex + typed columns, parsing is the codegen'd
    regexp_extract chain. Fixture: render an apache-ish access line from
    documents, parse it back with named %{...:field:type} refs."""
    from embulk_spark.sources.grok import parse_grok_column

    docs = _t(spark, sf_dir, "documents")
    lines = docs.select(
        F.format_string(
            "10.0.0.%d GET /doc/%d %d", F.col("doc_id") % 256, "doc_id", "n_chars"
        ).alias("value")
    )
    return parse_grok_column(
        lines,
        F.col("value"),
        "%{IPV4:clientip} %{WORD:verb} %{URIPATH:path} %{INT:size:int}",
    )


def _q_parser_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embulk-parser-xml (sources/xml.py): repeated <row> elements → one
    record each, pure regexp_extract_all/explode — no XML lib, no
    Python. Fixture: render documents rows into an XML fragment (lang is
    [a-z]+ so no entity escaping enters the fixture), parse back: @id
    attribute + child elements, absent <views> on every 5th row → null."""
    from embulk_spark.sources.xml import parse_xml_column

    docs = _t(spark, sf_dir, "documents")
    xml = docs.select(
        F.concat(
            F.lit('<page id="'), F.col("doc_id"), F.lit('">'),
            F.lit("<lang>"), F.col("lang"), F.lit("</lang>"),
            F.when(
                F.col("doc_id") % 5 != 0,
                F.concat(F.lit("<views>"), F.col("n_chars"), F.lit("</views>")),
            ).otherwise(F.lit("")),
            F.lit("</page>"),
        ).alias("value")
    )
    return parse_xml_column(
        xml,
        F.col("value"),
        "page",
        [
            {"name": "@id", "type": "long"},
            {"name": "lang", "type": "string"},
            {"name": "views", "type": "long"},
        ],
    )


def _q_filter_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter-eval (operators/rowops.py:eval_columns): the ecosystem's
    per-row Ruby interpreters re-expressed as Catalyst SQL exprs —
    codegen'd, constant-folded, predicate pushed to the scan."""
    from embulk_spark.operators.rowops import eval_columns

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return eval_columns(
        ev,
        {
            "where": "value > 0 AND event_type IN ('click', 'view')",
            "columns": [
                {"name": "value_sq", "expr": "round(value * value, 4)"},
                {"name": "kind", "expr": "upper(event_type)"},
            ],
            "drop": ["event_type"],
        },
    )


def _q_coerce_setters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-column-setter coercions (spi/util/dynamic/*.java)."""
    from embulk_spark.functions.coerce import (
        boolean_to_long,
        double_to_boolean,
        double_to_long,
        string_to_boolean,
        string_to_long,
        timestamp_to_long,
    )

    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        double_to_long(F.col("value")).alias("value_as_long"),
        double_to_boolean(F.col("value")).alias("value_as_bool"),
        string_to_long(F.col("event_type")).alias("type_as_long"),
        string_to_boolean(F.col("event_type")).alias("type_as_bool"),
        timestamp_to_long(F.col("ts")).alias("ts_epoch_sec"),
        boolean_to_long(F.col("value") > 100).alias("gt100_as_long"),
    )


def _q_preview_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preview: first 15 records (exec/PreviewExecutor.java:45-47),
    deterministic order by event_id."""
    ev = _t(spark, sf_dir, "events")
    return ev.orderBy("event_id").limit(15).select(
        "event_id", "user_id", "event_type", "value", "props",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )


def _q_parse_json_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json-type column access (embulk-parser-json / json column type)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("props_k"),
    )


def _q_timestamp_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instants canonical rendering (spi/time/Instants.java:20-76)."""
    from embulk_spark.functions.coerce import timestamp_to_string

    ev = _t(spark, sf_dir, "events")
    return ev.select("event_id", timestamp_to_string(F.col("ts")).alias("ts_canon"))


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_spark.operators.dedup import exact_dedup_groups

    docs = _t(spark, sf_dir, "documents")
    return exact_dedup_groups(docs, "text", "doc_id")


def _q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_spark.functions.textops import quality_features

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", *quality_features(F.col("text")))


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_spark.functions.textops import lang_id_sql

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id_sql(F.col("text")).alias("lang_pred"))


def _q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_spark.functions.textops import fingerprint, token_count

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        fingerprint(F.col("text")).alias("fp"),
        token_count(F.col("text")).alias("n_tokens"),
    )


def _q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish pre-tokenizer counts per document — the pair
    a 100 TB token-budget accountant needs (whitespace undercounts CJK and
    punctuation-heavy text; the GPT-2-style pre-token count tracks real
    BPE billing). Both are pure JVM Column regexes."""
    from embulk_spark.functions.textops import bpe_token_count, token_count

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("ws_tokens"),
        bpe_token_count(F.col("text")).alias("bpe_tokens"),
    )


def _synth_url_col() -> F.Column:
    """Deterministic messy url per doc_id (documents has no url column):
    mixed-case scheme/host, default & non-default ports, fragments,
    trailing slashes — the canonicalization edge matrix. Mirrored exactly
    by the oracle SQL."""
    did = F.col("doc_id")
    scheme = (
        F.when(did % 3 == 0, F.lit("HTTP://"))
        .when(did % 3 == 1, F.lit("https://"))
        .otherwise(F.lit("HTTPS://"))
    )
    port = (
        F.when(did % 4 == 0, F.lit(":80"))
        .when(did % 4 == 1, F.lit(":443"))
        .when(did % 4 == 2, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = (
        F.when(did % 5 == 0, F.lit("/"))
        .when(did % 5 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("/P"), (did % 9).cast("string")))
    )
    frag = F.when(did % 6 == 0, F.lit("#Frag")).otherwise(F.lit(""))
    return F.concat(
        scheme, F.lit("Host"), (did % 40).cast("string"),
        F.lit(".Sub.Example.ORG"), port, path, frag,
    )


def _q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + host/domain extraction (web-corpus dedup
    key prep) — pure JVM regex Columns (functions/textops.py)."""
    from embulk_spark.functions.textops import canonical_url, url_domain, url_host

    docs = _t(spark, sf_dir, "documents")
    u = _synth_url_col()
    return docs.select(
        "doc_id",
        u.alias("url"),
        canonical_url(u).alias("canon_url"),
        url_host(u).alias("host"),
        url_domain(u).alias("domain"),
    )


def _synth_robots_and_urls(spark: SparkSession, sf_dir: str):
    """Deterministic robots.txt corpus + URL universe from doc_id (the
    documents fixture has neither): 8 hosts, every host a ``*`` group
    (Disallow /private, Allow /private/ok, one EMPTY Disallow that must
    be dropped, a comment line), even hosts additionally a two-agent
    specific group whose rules vary by host — the full RFC 9309 edge
    matrix (specific-shadows-star, longest-prefix, allow-on-tie,
    default-allow). Mirrored exactly by the oracle SQL."""
    docs = _t(spark, sf_dir, "documents")
    h = F.col("h")
    base = F.lit(
        "# corpus politeness\nUser-agent: *\nDisallow: /private\n"
        "Allow: /private/ok\nDisallow:\n"
    )
    spec = F.concat(
        F.lit("User-agent: GoodBot\nUser-agent: OtherBot\nDisallow: /p"),
        (h % 3).cast("string"),
        F.lit("\nAllow: /p"), (h % 3).cast("string"), F.lit("2\n"),
    )
    robots = (
        docs.select((F.col("doc_id") % 8).cast("int").alias("h")).distinct()
        .select(
            F.concat(F.lit("host"), h.cast("string"),
                     F.lit(".example.org")).alias("host"),
            F.when(h % 2 == 0, F.concat(base, spec))
             .otherwise(base).alias("robots_txt"),
        )
    )
    did = F.col("doc_id")
    path = (
        F.when(did % 11 == 0, F.lit("/private/okay"))
        .when(did % 7 == 0, F.lit("/private/file"))
        .otherwise(F.concat(F.lit("/p"), (did % 13).cast("string"), F.lit("/x")))
    )
    urls = docs.select(
        F.concat(F.lit("https://host"), (did % 8).cast("string"),
                 F.lit(".example.org"), path).alias("url")
    )
    return robots, urls


def _q_robots_permissions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt crawl-permission gate (operators/robots.py): parse the
    per-host robots corpus into an RFC 9309 rules table (group windows
    over O(hosts) rows), then BROADCAST it against the URL universe —
    the URL frame never shuffles on host; the per-url winner is a
    partial-combine max_by over (prefix length, allow, path)."""
    from embulk_spark.operators.robots import parse_robots, robots_match

    robots, urls = _synth_robots_and_urls(spark, sf_dir)
    return robots_match(urls, parse_robots(robots), agent="GoodBot")


def _synth_sitemaps(spark: SparkSession, sf_dir: str):
    """Deterministic per-host sitemap.xml corpus from doc_id (the
    fixture has none): the same 8-host/path family as the robots synth
    so the permission gate bites; ~1/5 entries omit <lastmod>, ~1/4
    omit <priority> (spec default 0.5), and repeated locs across docs
    carry differing attributes to exercise the dedup agg. Entries are
    sorted INSIDE each sitemap body (array_sort / string_agg ORDER BY)
    so both engines concatenate identical XML."""
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    path = (
        F.when(did % 11 == 0, F.lit("/private/okay"))
        .when(did % 7 == 0, F.lit("/private/file"))
        .otherwise(F.concat(F.lit("/p"), (did % 13).cast("string"), F.lit("/x")))
    )
    entry = F.concat(
        F.lit("<url><loc>https://host"), (did % 8).cast("string"),
        F.lit(".example.org"), path, F.lit("</loc>"),
        F.when(
            did % 5 != 0,
            F.concat(F.lit("<lastmod>2026-0"), (1 + did % 9).cast("string"),
                     F.lit("-"), (10 + did % 19).cast("string"),
                     F.lit("</lastmod>")),
        ).otherwise(F.lit("")),
        F.when(
            did % 4 != 0,
            F.concat(F.lit("<priority>0."), (did % 10).cast("string"),
                     F.lit("</priority>")),
        ).otherwise(F.lit("")),
        F.lit("</url>"),
    )
    return (
        docs.select(
            F.concat(F.lit("host"), (did % 8).cast("string"),
                     F.lit(".example.org")).alias("host"),
            entry.alias("entry"),
        )
        .groupBy("host")
        .agg(
            F.concat(
                F.lit('<?xml version="1.0"?><urlset>'),
                F.array_join(F.array_sort(F.collect_list("entry")), ""),
                F.lit("</urlset>"),
            ).alias("sitemap_xml")
        )
    )


def _q_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap-fed crawl frontier (operators/frontier.py): per-host
    sitemap.xml bodies parse to (loc, lastmod, priority) entries via
    pure JVM regexps (1→k explode, no XML lib), duplicate locs collapse
    with a deterministic max agg, the robots gate (broadcast rules)
    drops disallowed urls BEFORE slotting, and each host's queue gets
    politeness slots: (priority DESC, lastmod DESC, loc) order,
    fetch_at_sec = slot × 1.5 s."""
    from embulk_spark.operators.frontier import parse_sitemaps, schedule_frontier
    from embulk_spark.operators.robots import parse_robots

    robots, _ = _synth_robots_and_urls(spark, sf_dir)
    entries = parse_sitemaps(_synth_sitemaps(spark, sf_dir))
    out = schedule_frontier(
        entries, parse_robots(robots), agent="GoodBot", delay_sec=1.5
    )
    # lastmod as text so both engines' date cells render identically
    return out.withColumn("lastmod", F.col("lastmod").cast("string"))


def _q_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-rate recrawl scheduling (operators/recrawl.py): the events
    fixture stands in for the lake's per-url change feed (url from
    user_id); per url one hash agg estimates the Poisson change rate
    (exponential inter-arrival MLE, integer-micros arithmetic) and emits
    the clamped refresh interval, next fetch time, and overdue ratio vs
    the feed horizon (broadcast 1-row agg, no collect)."""
    from embulk_spark.operators.recrawl import recrawl_schedule

    ev = _t(spark, sf_dir, "events")
    changes = ev.select(
        F.concat(
            F.lit("https://host"), (F.col("user_id") % 8).cast("string"),
            F.lit(".example.org/u"), F.col("user_id").cast("string"),
        ).alias("url"),
        "ts",
    )
    return recrawl_schedule(changes)


def _q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass (emails/phones/ipv4 → <TAG>) with per-kind audit
    counts; PII is planted deterministically since the corpus has none."""
    from embulk_spark.functions.textops import pii_counts, redact_pii

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(F.lit(" contact user"), did.cast("string"),
                     F.lit("@Example.com now")),
        ).otherwise(F.lit("")),
        F.when(did % 4 == 0, F.lit(" call +1 (555) 123-4567 ok")).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(F.lit(" from 10.0."), (did % 256).cast("string"), F.lit(".7")),
        ).otherwise(F.lit("")),
    )
    return docs.select(
        "doc_id",
        F.md5(redact_pii(planted)).alias("redacted_md5"),
        *pii_counts(planted),
    )


def _q_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters (dup-line fraction, top
    2-/3-gram coverage, bullet/ellipsis lines) — pure Column HOFs, no
    explode/shuffle (functions/textops.py::repetition_report)."""
    from embulk_spark.functions.textops import repetition_report

    docs = _t(spark, sf_dir, "documents")
    return repetition_report(docs, "text", "doc_id")


def _q_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style page cleanup (Raffel et al. 2020 §2.2): line-level rules
    (terminal punctuation, ≥5 words, boilerplate phrases) + page-level
    flags (lorem ipsum, code brace) and the keep verdict — pure Column
    array HOFs, zero shuffles (functions/textops.py::c4_report)."""
    from embulk_spark.functions.textops import c4_report

    docs = _t(spark, sf_dir, "documents")
    return c4_report(docs, "text", "doc_id")


def _q_script_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode script detection (functions/textops.py::script_report):
    per-block letter counts → dominant script + purity, pure JVM
    regexp_count. Fixture mixes deterministic non-latin suffixes into
    the latin documents so every branch discriminates."""
    from embulk_spark.functions.textops import script_report

    docs = _t(spark, sf_dir, "documents")
    mixed = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 4 == 1, F.lit(" привет мир словами" * 40))
            .when(F.col("doc_id") % 4 == 2, F.lit(" 你好世界汉字很多" * 40))
            .when(F.col("doc_id") % 4 == 3, F.lit(" مرحبا بالعالم" * 40))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return script_report(mixed, "text", "doc_id")


def _q_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021 App. A, published MassiveWeb
    thresholds): word count/length bounds, symbol ratios, bullet/ellipsis
    line shape, alpha-word fraction, stop-word hits, keep verdict — pure
    Column array HOFs, zero shuffles (functions/textops.py::gopher_report).
    min_words lowered to 10 so the synthetic docs exercise both sides."""
    from embulk_spark.functions.textops import gopher_report

    docs = _t(spark, sf_dir, "documents")
    return gopher_report(docs, "text", "doc_id", min_words=10)


def _q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) corpus composition report: doc/token/char counts
    + in-group exact-dup rate — one hash agg with map-side combine
    (functions/textops.py::corpus_mixture_stats)."""
    from embulk_spark.functions.textops import corpus_mixture_stats

    docs = _t(spark, sf_dir, "documents")
    return corpus_mixture_stats(docs, "text", ["source", "lang"])


def _q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_spark.operators.dedup import minhash_df

    docs = _t(spark, sf_dir, "documents")
    sigs = minhash_df(docs, "text", "doc_id", k=8)
    return sigs.select("doc_id", F.concat_ws(",", "sig").alias("sig_csv"))


def _q_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup maintenance (operators/incremental.py): the
    corpus arrives as two CDC epochs (doc_id parity), each epoch updates
    a persistent signature index (O(Δ) hashing) and band-probes its
    change-set against the as-of-epoch corpus. The oracle is the BATCH
    near-dup SQL over all documents — certifying incremental == batch."""
    import hashlib
    import os

    from embulk_spark.operators.incremental import SignatureIndex

    docs = _t(spark, sf_dir, "documents")
    path = _scratch_root("sigidx", sf_dir)
    idx = SignatureIndex(spark, path, k=16, bands=4)
    out = None
    for e in (0, 1):
        idx.update_epoch(docs.filter(F.col("doc_id") % 2 == e), "text", e)
        pairs = idx.near_dups_for_epoch(e, threshold=0.5)
        out = pairs if out is None else out.unionByName(pairs)
    return out.distinct()


def _q_incremental_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental inverted term-stats index (operators/termindex.py):
    epoch 0 ingests every document, epoch 1 delivers updates (doc_id%4==1
    gets ' upd1' appended) and deletes (doc_id%10==3) — each epoch
    tokenizes only its change-set (O(Δ) text bytes). The oracle computes
    document frequencies over the corpus's FINAL state in SQL, certifying
    incremental == batch through supersede and tombstones."""
    import hashlib
    import os

    from embulk_spark.operators.termindex import TermIndex

    docs = _t(spark, sf_dir, "documents")
    path = _scratch_root("termidx", sf_dir)
    idx = TermIndex(spark, path, id_col="doc_id", id_type="bigint")
    idx.update_epoch(docs, "text", 0)
    changed = docs.filter(
        (F.col("doc_id") % 4 == 1) | (F.col("doc_id") % 10 == 3)
    ).select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 3, F.lit(None).cast("string"))
        .otherwise(F.concat(F.col("text"), F.lit(" upd1")))
        .alias("text"),
    )
    idx.update_epoch(changed, "text", 1)
    return idx.term_df()


def _q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_spark.operators.dedup import minhash_near_dups

    docs = _t(spark, sf_dir, "documents")
    return minhash_near_dups(docs, "text", "doc_id", k=16, bands=4, threshold=0.5)


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "text", "doc_id", k=16, bands=4, threshold=0.3)


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_spark.operators.dedup import simhash_df

    docs = _t(spark, sf_dir, "documents")
    return simhash_df(docs, "text", "doc_id")


def _q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dups: 16-bit band bucket join (pigeonhole: hamming ≤ 3
    ⇒ ≥1 exact band of 4), hamming via bit_count(xor) — never all-pairs."""
    from embulk_spark.operators.dedup import simhash_near_dups

    docs = _t(spark, sf_dir, "documents")
    return simhash_near_dups(docs, "text", "doc_id", max_hamming=3).select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).select("embedding").head()
    )
    return [float(x) for x in row["embedding"]]


def _planes(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    rows = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id").isin(1, 2, 3, 4))
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    return [[float(x) for x in r["embedding"]] for r in rows]


def _q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_spark.operators.ann import cosine_topk

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    return cosine_topk(emb, _query_vec(spark, sf_dir), k=10)


def _q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_spark.operators.ann import ann_lsh_topk

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    return ann_lsh_topk(emb, _query_vec(spark, sf_dir), _planes(spark, sf_dir), k=10)


def _centroids(spark: SparkSession, sf_dir: str, n: int = 8) -> list[list[float]]:
    """Deterministic IVF coarse centroids: the corpus vectors vec_id 1..n
    (centroid index = vec_id - 1). Sampling centroids from the data is the
    standard IVF bootstrap; taking the lowest ids keeps it reproducible."""
    rows = (
        _t(spark, sf_dir, "embeddings")
        .filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= n))
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    return [[float(x) for x in r["embedding"]] for r in rows]


def _q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from embulk_spark.operators.ann import ann_ivf_topk

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    return ann_ivf_topk(
        emb, _query_vec(spark, sf_dir), _centroids(spark, sf_dir), k=10, nprobe=2
    )


def _q_stateful_url_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): run
    the per-url winner tracker over the events table as a change stream
    (availableNow) and return the reconstructed final state — which must
    equal the SQL window oracle.

    The change-log lands in a process-lifetime scratch dir (reclaimed at
    exit, not at return) so the returned frame stays DISTRIBUTED — no
    driver collect in the query path; the caller's .count()/.collect()
    reads the parquet change-log lazily like any other source."""
    import atexit
    import shutil
    import tempfile

    from embulk_spark.streaming.state import latest_state, track_url_state

    ev = _t(spark, sf_dir, "events")
    changes = ev.select(
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.concat(F.lit("user://"), F.col("user_id").cast("string")).alias("url"),
        F.col("ts").alias("warc_ts"),
    )
    work = tempfile.mkdtemp(prefix="embulk_spark_state_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    src = f"{work}/src"
    changes.coalesce(2).write.mode("overwrite").parquet(src)
    track_url_state(
        spark, src, f"{work}/ckpt", f"{work}/log",
        schema_ddl="seq LONG, op STRING, url STRING, warc_ts TIMESTAMP",
    )
    return latest_state(spark, f"{work}/log")


def _q_cdc_changes_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental change-feed read (streaming/lake.py::changes_between):
    replay the events table as 3 CDC epochs into a scratch lake, then read
    the net changes of epochs 1-2 only — one winner per touched url,
    deletes as tombstones, cost O(change-set) not O(table). Oracle: the
    same window over the raw events restricted to those epochs."""
    import atexit
    import shutil
    import tempfile

    from embulk_spark.streaming.lake import ParquetLakeTable

    ev = _t(spark, sf_dir, "events")
    changes = ev.select(
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.concat(F.lit("user://"), F.col("user_id").cast("string")).alias("url"),
        F.col("ts").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.lit(None).cast("string").alias("lang"),
        (F.col("event_id") % 3).alias("epoch"),
    )
    work = tempfile.mkdtemp(prefix="embulk_spark_feed_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    table = ParquetLakeTable(spark, f"{work}/lake", n_buckets=4)
    for e in (0, 1, 2):
        table.merge_epoch(
            changes.filter(F.col("epoch") == e).drop("epoch"), e, extract=False
        )
    feed = table.changes_between(0, 2)
    return feed.select(
        "url",
        F.col("seq").cast("long").alias("seq"),
        "is_deleted",
        F.unix_micros(F.col("warc_ts")).alias("ts_us"),
    )


def _q_cdc_replicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lake-to-lake replication (streaming/replicate.py): replay the
    events table as 3 CDC epochs into a source lake, maintain a replica
    from the source's change feed — one consume_changes poll + one
    apply_changes commit per epoch, O(change-set) each, no re-dedup/
    re-extraction — and return the REPLICA's published state. Oracle:
    the upsert winner per url over the raw events (replica ≡ source ≡
    changelog apply)."""
    import atexit
    import shutil
    import tempfile

    from embulk_spark.streaming.lake import ParquetLakeTable
    from embulk_spark.streaming.replicate import replicate_step

    ev = _t(spark, sf_dir, "events")
    changes = ev.select(
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.concat(F.lit("user://"), F.col("user_id").cast("string")).alias("url"),
        F.col("ts").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.lit(None).cast("string").alias("lang"),
        (F.col("event_id") % 3).alias("epoch"),
    )
    work = tempfile.mkdtemp(prefix="embulk_spark_replica_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    src = ParquetLakeTable(spark, f"{work}/src", n_buckets=4)
    # replica on a DIFFERENT bucket layout: apply_changes re-buckets
    rep = ParquetLakeTable(spark, f"{work}/rep", n_buckets=2)
    for e in (0, 1, 2):
        src.merge_epoch(
            changes.filter(F.col("epoch") == e).drop("epoch"), e,
            extract=False,
        )
        replicate_step(src, rep, f"{work}/feed")
    return rep.published().select(
        "url",
        F.col("seq").cast("long").alias("seq"),
        F.unix_micros(F.col("warc_ts")).alias("ts_us"),
    )


def _q_maxwell_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maxwell binlog wire format (sources/debezium.py::parse_maxwell):
    synthesize Maxwell JSON lines from the events table with pure-JVM
    to_json, parse them back through the format parser, and return the
    typed change rows. Oracle: the same mapping computed directly in
    SQL — a lossless wire round-trip."""
    from embulk_spark.sources.debezium import parse_maxwell

    ev = _t(spark, sf_dir, "events")
    lines = ev.select(
        F.to_json(F.struct(
            F.lit("db").alias("database"),
            F.lit("events").alias("table"),
            F.when(F.col("event_type") == "error", F.lit("delete"))
            .when(F.col("event_type") == "view", F.lit("insert"))
            .otherwise(F.lit("update")).alias("type"),
            F.unix_seconds(F.col("ts").cast("timestamp")).alias("ts"),
            F.col("event_id").alias("xid"),
            F.lit(0).cast("long").alias("xoffset"),
            F.struct(
                F.col("user_id"), F.col("value"), F.col("props")
            ).alias("data"),
        )).alias("value")
    )
    out = parse_maxwell(
        lines, "user_id BIGINT, value DOUBLE, props STRING"
    )
    return out.select(
        "op", "seq", "src_ts_ms", "user_id",
        F.col("value").alias("v"), "props",
    )


def _q_wal2json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """wal2json v2 wire format (sources/debezium.py::parse_wal2json —
    PostgreSQL logical decoding, public plugin docs): synthesize v2
    action lines from the events table with pure-JVM to_json (columns
    as {name,value} entry arrays, LSN hex pair, include-timestamp
    rendering), parse back through the format parser, return the typed
    change rows. Oracle: the same mapping computed directly in SQL — a
    lossless wire round-trip."""
    from embulk_spark.sources.debezium import parse_wal2json

    ev = _t(spark, sf_dir, "events")

    def entry(name: str, col) -> F.Column:
        return F.struct(
            F.lit(name).alias("name"), col.cast("string").alias("value")
        )

    lines = ev.select(
        F.to_json(F.struct(
            F.when(F.col("event_type") == "error", F.lit("D"))
            .when(F.col("event_type") == "view", F.lit("I"))
            .otherwise(F.lit("U")).alias("action"),
            F.lit("public").alias("schema"),
            F.lit("events").alias("table"),
            F.date_format(
                F.col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS'+00'"
            ).alias("timestamp"),
            F.concat(
                F.lit("0/"), F.conv(F.col("event_id"), 10, 16)
            ).alias("lsn"),
            F.array(
                entry("user_id", F.col("user_id")),
                entry("value", F.col("value")),
                entry("props", F.col("props")),
            ).alias("columns"),
        )).alias("value")
    )
    out = parse_wal2json(
        lines, "user_id BIGINT, value DOUBLE, props STRING"
    )
    return out.select(
        "op", "seq", "src_ts_ms", "user_id",
        F.col("value").alias("v"), "props",
    )


def _q_canal_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canal flatMessage wire format (sources/debezium.py::parse_canal):
    synthesize Canal JSON (stringified values, batched data arrays) from
    the events table, parse back, return typed rows — the all-strings →
    declared-types casting and the batch posexplode under test. Oracle:
    the direct SQL mapping."""
    from embulk_spark.sources.debezium import parse_canal

    ev = _t(spark, sf_dir, "events")
    lines = ev.select(
        F.to_json(F.struct(
            F.lit("db").alias("database"),
            F.lit("events").alias("table"),
            F.when(F.col("event_type") == "error", F.lit("DELETE"))
            .when(F.col("event_type") == "view", F.lit("INSERT"))
            .otherwise(F.lit("UPDATE")).alias("type"),
            F.unix_millis(F.col("ts").cast("timestamp")).alias("es"),
            (F.unix_millis(F.col("ts").cast("timestamp")) + 5).alias("ts"),
            F.col("event_id").alias("id"),
            F.lit(False).alias("isDdl"),
            F.array(F.create_map(
                F.lit("user_id"), F.col("user_id").cast("string"),
                F.lit("value"), F.col("value").cast("string"),
                F.lit("props"), F.col("props"),
            )).alias("data"),
        )).alias("value")
    )
    out = parse_canal(lines, "user_id BIGINT, value DOUBLE, props STRING")
    return out.select(
        "op", "seq", "src_ts_ms", "user_id",
        F.col("value").alias("v"), "props",
    )


def _q_stream_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream enrichment join (streaming/joins.py):
    non-click events as the change stream, clicks as the fetch log, both
    tailed as parquet streams and joined on url within a 24h event-time
    window ENDING at each change (state bounded by the window, not the
    stream). Oracle: the identical batch join in SQL — the streaming
    APPEND output must equal it row-for-row."""
    import atexit
    import shutil
    import tempfile

    from embulk_spark.streaming.joins import stream_enrich_changes

    ev = _t(spark, sf_dir, "events")
    changes = ev.filter(F.col("event_type") != "click").select(
        F.col("event_id").alias("seq"),
        F.lit(0).cast("long").alias("epoch"),
        F.lit("U").alias("op"),
        F.concat(F.lit("user://"), F.col("user_id").cast("string")).alias("url"),
        F.col("ts").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("schema_change"),
    )
    fetches = ev.filter(F.col("event_type") == "click").select(
        F.concat(F.lit("user://"), F.col("user_id").cast("string")).alias("url"),
        F.col("ts").alias("fetch_ts"),
        (F.col("event_id") % 400).cast("int").alias("status"),
    )
    work = tempfile.mkdtemp(prefix="embulk_spark_sjoin_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    changes.write.parquet(f"{work}/ev")
    fetches.write.parquet(f"{work}/fetch")
    stream_enrich_changes(
        spark, f"{work}/ev", f"{work}/fetch", f"{work}/ckpt", f"{work}/out",
        within="24 hours",
        fetch_schema_ddl="url STRING, fetch_ts TIMESTAMP, status INT",
    )
    out = spark.read.parquet(f"{work}/out")
    return out.select(
        "url",
        F.col("seq").cast("long").alias("seq"),
        F.unix_micros(F.col("f_fetch_ts")).alias("f_ts_us"),
        F.col("f_status").cast("long").alias("f_status"),
    )


def _q_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC from periodic full dumps (operators/merge.py::snapshot_diff +
    lake.apply_snapshot — Debezium/DMS full-load-then-diff when the
    source has no binlog): bulk-import a FIRST crawl (latest per user
    among even event_ids), then apply a SECOND full dump (latest per
    user over all events; users whose final event is 'error' drop out of
    the dump). Unchanged users emit nothing, changed/new users upsert,
    vanished users delete — the table must converge to exactly the
    second dump. Oracle: the all-events upsert winner per user, errors
    excluded."""
    import atexit
    import shutil
    import tempfile

    from embulk_spark.operators.merge import dedup_latest
    from embulk_spark.streaming.lake import ParquetLakeTable

    ev = _t(spark, sf_dir, "events")
    rows = ev.select(
        F.concat(F.lit("user://"), F.col("user_id").cast("string")).alias("url"),
        F.col("ts").alias("warc_ts"),
        F.col("event_id").alias("seq"),
        F.col("props").alias("text"),
        F.col("event_type").alias("lang"),
    )
    first_crawl = dedup_latest(rows.filter(F.col("seq") % 2 == 0))
    second_crawl = dedup_latest(rows).filter(F.col("lang") != "error")
    work = tempfile.mkdtemp(prefix="embulk_spark_snapdiff_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    table = ParquetLakeTable(spark, f"{work}/t", n_buckets=4)
    table.bulk_import(first_crawl, epoch_id=0, extract=False)
    out = table.apply_snapshot(
        second_crawl, epoch_id=1, compare=("text", "lang"), extract=False,
        delete_ts="2030-01-01 00:00:00",
    )
    assert out["snapshot_diff"] and not out.get("skipped_duplicate_epoch")
    return table.published().select(
        "url", "lang", F.col("text").alias("props")
    )


def _q_lake_bulk_import(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Initial bulk load (streaming/lake.py::bulk_import — Hudi bootstrap /
    Iceberg add_files; the reference's one-shot bulk-load run,
    EmbulkRunner.java:239-276): the events table, shaped as a snapshot
    dump with duplicates and tombstones, lands DIRECTLY as the bucketed
    base in one job — no per-event deltas, no compaction debt. Oracle:
    the (ts, event_id)-latest row per user whose final op isn't a
    delete."""
    import atexit
    import shutil
    import tempfile

    from embulk_spark.streaming.lake import ParquetLakeTable

    ev = _t(spark, sf_dir, "events")
    dump = ev.select(
        F.concat(F.lit("user://"), F.col("user_id").cast("string")).alias("url"),
        F.col("ts").alias("warc_ts"),
        F.col("event_id").alias("seq"),
        F.lit(None).cast("binary").alias("html"),
        F.col("props").alias("text"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("string"))
        .otherwise(F.col("event_type"))
        .alias("lang"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    work = tempfile.mkdtemp(prefix="embulk_spark_import_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    table = ParquetLakeTable(spark, f"{work}/t", n_buckets=4)
    out = table.bulk_import(dump, epoch_id=0, extract=False)
    snap = table.current_snapshot()
    assert out["rows_imported"] > 0 and snap["deltas"] == [], (
        "bulk_import must land as base only"
    )
    return table.published().select(
        "url",
        F.col("seq").cast("long").alias("seq"),
        F.unix_micros(F.col("warc_ts")).alias("ts_us"),
        "lang",
        F.col("text").alias("props"),
    )


def _q_lake_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy shallow clone (streaming/lake.py::clone_to — Delta
    SHALLOW CLONE): replay epochs 0-1 into a source lake, hard-link-clone
    it, apply epoch 2 to the CLONE only, and return the clone's state.
    Asserted in-line: the source never advances, and the clone inherits
    duplicate-delivery protection (re-delivering epoch 0 skips). Oracle:
    the upsert winner per url over ALL epochs — the clone must equal the
    state a single uncloned table would reach."""
    import atexit
    import shutil
    import tempfile

    from embulk_spark.streaming.lake import ParquetLakeTable

    ev = _t(spark, sf_dir, "events")
    changes = ev.select(
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.concat(F.lit("user://"), F.col("user_id").cast("string")).alias("url"),
        F.col("ts").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.lit(None).cast("string").alias("lang"),
        (F.col("event_id") % 3).alias("epoch"),
    )
    work = tempfile.mkdtemp(prefix="embulk_spark_clone_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    src = ParquetLakeTable(spark, f"{work}/src", n_buckets=4)
    for e in (0, 1):
        src.merge_epoch(
            changes.filter(F.col("epoch") == e).drop("epoch"), e,
            extract=False,
        )
    src.clone_to(f"{work}/dev")
    dev = ParquetLakeTable(spark, f"{work}/dev")
    src_version = src.current_snapshot()["version"]
    dup = dev.merge_epoch(
        changes.filter(F.col("epoch") == 0).drop("epoch"), 0, extract=False
    )
    assert dup.get("skipped_duplicate_epoch"), (
        "clone must inherit the committed-epoch set"
    )
    dev.merge_epoch(
        changes.filter(F.col("epoch") == 2).drop("epoch"), 2, extract=False
    )
    assert src.current_snapshot()["version"] == src_version, (
        "writing to the clone must not advance the source"
    )
    return dev.published().select(
        "url",
        F.col("seq").cast("long").alias("seq"),
        F.unix_micros(F.col("warc_ts")).alias("ts_us"),
    )


def _q_lake_scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-pruned predicate scan over the MOR lake — Iceberg manifest
    lower/upper bounds + scan planning (streaming/filestats.py,
    ParquetLakeTable.scan_where). Fixture: the events table replayed as
    3 CDC epochs into a stats-collecting lake, then compacted under a
    ``lang`` sort order so each bucket's base files hold disjoint lang
    ranges; the scan plans from manifest stats alone and reads only the
    files whose [min,max] can match (asserted: >0 files skipped).
    Result ≡ published().filter(lang='click') ≡ the upsert-winner
    oracle with the same predicate. Reference analogue: write-time
    metadata deciding what the next run reads (the ``last_path`` cursor,
    exec/BulkLoader.java:584-659), generalized to column ranges."""
    import atexit
    import shutil
    import tempfile

    from embulk_spark.streaming.lake import ParquetLakeTable

    ev = _t(spark, sf_dir, "events")
    changes = ev.select(
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.concat(F.lit("user://"), F.col("user_id").cast("string")).alias("url"),
        F.col("ts").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("string"))
        .otherwise(F.col("event_type"))
        .alias("lang"),
        (F.col("event_id") % 3).alias("epoch"),
    )
    work = tempfile.mkdtemp(prefix="embulk_spark_scanstats_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    table = ParquetLakeTable(
        spark, f"{work}/t", n_buckets=4,
        stats_columns=("warc_ts", "lang"), sort_columns=("lang",),
    )
    for e in (0, 1, 2):
        table.merge_epoch(
            changes.filter(F.col("epoch") == e).drop("epoch"), e,
            extract=False,
        )
    # compact with enough output partitions that each bucket's base is
    # several sort-clustered files — the shape file-granular pruning
    # skips within (conf restored after).
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        table.compact()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    plan = table.scan_plan([("lang", "=", "click")])
    if not (plan["files_skipped"] > 0 and plan["buckets_clean"]):
        raise AssertionError(f"stats pruned nothing: {plan}")
    return table.scan_where([("lang", "=", "click")]).select(
        "url",
        F.col("seq").cast("long").alias("seq"),
        F.unix_micros(F.col("warc_ts")).alias("ts_us"),
        "lang",
    )


def _q_lake_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered compaction (streaming/zorder.py, Delta
    OPTIMIZE ZORDER BY analogue): two INDEPENDENT numeric payload
    dimensions (a = event_id % 251, b = event_id % 257 — CRT-independent
    over the fixture range), compacted under cluster_mode='zorder' so
    manifest per-file stats prune a selective predicate on EITHER
    column (asserted for both; a lexicographic sort could only serve
    the leading one). Result ≡ published().filter(b < 32)."""
    import atexit
    import shutil
    import tempfile

    from embulk_spark.streaming.lake import ParquetLakeTable

    ev = _t(spark, sf_dir, "events")
    changes = ev.select(
        F.col("event_id").alias("seq"),
        F.lit("U").alias("op"),
        F.concat(F.lit("ev://"), F.col("event_id").cast("string")).alias("url"),
        F.col("ts").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("event_type").alias("lang"),
        F.pmod(F.col("event_id"), F.lit(251)).alias("a"),
        F.pmod(F.col("event_id"), F.lit(257)).alias("b"),
    )
    work = tempfile.mkdtemp(prefix="embulk_spark_zorder_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    table = ParquetLakeTable(
        spark, f"{work}/t", n_buckets=2, compact_min_deltas=10_000,
        stats_columns=("a", "b"), sort_columns=("a", "b"),
        cluster_mode="zorder",
    )
    table.add_column("a", "long")
    table.add_column("b", "long")
    table.merge_epoch(changes, 0, extract=False)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        table.compact()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    pa = table.scan_plan([("a", "<", 32)])
    pb = table.scan_plan([("b", "<", 32)])
    if not (pa["files_skipped"] > 0 and pb["files_skipped"] > 0):
        raise AssertionError(f"zorder pruned nothing: a={pa} b={pb}")
    return table.scan_where([("b", "<", 32)]).select(
        "url",
        F.col("seq").cast("long").alias("seq"),
        "a",
        "b",
        "lang",
    )


def _q_lake_lookup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned point lookup over the MOR lake — Parquet's column
    bloom index hoisted into the manifest (streaming/filestats.py bloom
    half, ParquetLakeTable.scan_plan's merge-key strong rule). Fixture:
    the events table replayed as 5 uncompacted CDC epochs into a
    key_bloom lake; looking up 3 urls must skip delta files whose bloom
    says "definitely absent" (asserted) while returning exactly the
    upsert winners for those keys — soundly, because url is the merge
    key: every version of a key lives only in files containing it.
    Reference analogue: write-time metadata deciding what the next run
    reads (exec/BulkLoader.java:584-659), sharpened to per-file key
    membership."""
    import atexit
    import shutil
    import tempfile

    from embulk_spark.streaming.lake import ParquetLakeTable

    ev = _t(spark, sf_dir, "events")
    changes = ev.select(
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.concat(F.lit("user://"), F.col("user_id").cast("string")).alias("url"),
        F.col("ts").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("string"))
        .otherwise(F.col("event_type"))
        .alias("lang"),
        # epoch by USER (not event) so each key's versions are epoch-local
        # — the shape a lookup can prune (a key present in every delta
        # file is, correctly, read from every delta file)
        (F.col("user_id") % 5).alias("epoch"),
    )
    work = tempfile.mkdtemp(prefix="embulk_spark_keybloom_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    table = ParquetLakeTable(
        spark, f"{work}/t", n_buckets=4, compact_min_deltas=10_000,
        key_bloom=True,
    )
    for e in range(5):
        table.merge_epoch(
            changes.filter(F.col("epoch") == e).drop("epoch"), e,
            extract=False,
        )
    keys = [
        f"user://{r.user_id}"
        for r in ev.select("user_id").distinct().orderBy("user_id")
        .limit(3).collect()
    ]
    plan = table.scan_plan([("url", "in", keys)])
    if not (plan["files_skipped"] > 0
            and plan["delta_files_read"] < plan["delta_files_total"]):
        raise AssertionError(f"bloom pruned nothing: {plan}")
    return table.lookup_urls(keys).select(
        "url",
        F.col("seq").cast("long").alias("seq"),
        F.unix_micros(F.col("warc_ts")).alias("ts_us"),
        "lang",
    )


def _q_lake_scan_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-side dynamic file pruning for a semi join
    (ParquetLakeTable.scan_semi — Delta/Spark DFP re-expressed over the
    manifest): the probe side (urls with a purchase event) decides the
    file set BEFORE any table IO — collected once, turned into a
    key-equality scan that opens only bloom/bucket-hit files; past the
    key cap it degrades to a full merge + AQE semi join. Fixture: the
    events table replayed as 5 uncompacted epochs keyed by user, probed
    with the purchase-active keys; result = current live winners for
    exactly those keys."""
    import atexit
    import shutil
    import tempfile

    from embulk_spark.streaming.lake import ParquetLakeTable

    ev = _t(spark, sf_dir, "events")
    changes = ev.select(
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.concat(F.lit("user://"), F.col("user_id").cast("string")).alias("url"),
        F.col("ts").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("string"))
        .otherwise(F.col("event_type"))
        .alias("lang"),
        (F.col("user_id") % 5).alias("epoch"),
    )
    work = tempfile.mkdtemp(prefix="embulk_spark_scansemi_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    table = ParquetLakeTable(
        spark, f"{work}/t", n_buckets=4, compact_min_deltas=10_000,
        key_bloom=True,
    )
    for e in range(5):
        table.merge_epoch(
            changes.filter(F.col("epoch") == e).drop("epoch"), e,
            extract=False,
        )
    probe = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.concat(F.lit("user://"), F.col("user_id").cast("string"))
            .alias("url")
        )
    )
    return table.scan_semi(probe).select(
        "url",
        F.col("seq").cast("long").alias("seq"),
        F.unix_micros(F.col("warc_ts")).alias("ts_us"),
        "lang",
    )


def _q_lake_key_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC "log of a key": every retained version of a key with epoch
    provenance (ParquetLakeTable.key_history) — Debezium's per-key topic
    replay / Iceberg's changelog scan narrowed to a point query, pruned
    per-file by the manifest merge-key blooms. Fixture: events replayed
    as 5 uncompacted epochs keyed by ``event_id % 5`` so each url's
    versions spread across epochs; history of 3 keys must equal the per
    (url, epoch) upsert winner set, tombstones included. Reference
    analogue: resume state exposing per-task commit provenance
    (exec/BulkLoader.java:584-659), sharpened to per-key versions."""
    import atexit
    import shutil
    import tempfile

    from embulk_spark.streaming.lake import ParquetLakeTable

    ev = _t(spark, sf_dir, "events")
    changes = ev.select(
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.concat(F.lit("user://"), F.col("user_id").cast("string")).alias("url"),
        F.col("ts").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("string"))
        .otherwise(F.col("event_type"))
        .alias("lang"),
        # epoch by EVENT so one key's versions land in several epochs —
        # the shape a history query exists for
        (F.col("event_id") % 5).alias("epoch"),
    )
    work = tempfile.mkdtemp(prefix="embulk_spark_keyhist_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    table = ParquetLakeTable(
        spark, f"{work}/t", n_buckets=4, compact_min_deltas=10_000,
        key_bloom=True,
    )
    for e in range(5):
        table.merge_epoch(
            changes.filter(F.col("epoch") == e).drop("epoch"), e,
            extract=False,
        )
    keys = [
        f"user://{r.user_id}"
        for r in ev.select("user_id").distinct().orderBy("user_id")
        .limit(3).collect()
    ]
    return table.key_history(keys).select(
        "url",
        "epoch",
        F.col("seq").cast("long").alias("seq"),
        F.unix_micros(F.col("warc_ts")).alias("ts_us"),
        "lang",
        "is_deleted",
    )


def _q_guess_cell_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed schema inference: classify string cells per the Embulk
    guess lattice (functions/guess.py, schema_guess.rb:47-84) as an
    Arrow-batched pandas UDF. DuckDB oracle: guess_type_sql() — the same
    lattice incl. the time-format branch, expanded to RE2-safe regexes
    from the same pattern constants (equivalence pinned exhaustively in
    tests/test_guess.py)."""
    from embulk_spark.functions.guess import guess_type

    @F.pandas_udf("string")
    def _gt(s: pd.Series) -> pd.Series:
        def one(v):
            t = guess_type(v)
            return t[0] if isinstance(t, tuple) else t
        return s.map(one, na_action=None)

    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        _gt(F.col("event_type")).alias("t_event_type"),
        _gt(F.col("user_id").cast("string")).alias("t_user_id"),
        _gt(F.col("value").cast("string")).alias("t_value"),
        _gt(F.col("props")).alias("t_props"),
    )


def _data_planes(
    spark: SparkSession, sf_dir: str, *, target_bucket_rows: int = 128,
    multiple_of: int = 1,
) -> list[list[float]]:
    """AUTO-SIZED data-vector hyperplanes: the first
    ``auto_plane_count(N)`` embeddings (vec_id 1..k). The round-4 sf1
    leg caught the previous FIXED 4-plane fixture going super-linear
    (14.7× at 10× rows: bucket occupancy grows with N, pair work
    Σ bucket² with it); sizing k by log2(N/target) keeps the expected
    bucket at ~target rows, so pair work stays ~N·target — the
    operators/ann.py auto_plane_count contract, now exercised by the
    query itself. At the oracle scales (sf0.01 N=500, sf0.1 N=2000) k
    is exactly 4, so the pinned DuckDB SQL (vec_id IN (1,2,3,4))
    remains the valid replica of what runs."""
    from embulk_spark.operators.ann import auto_plane_count

    emb = _t(spark, sf_dir, "embeddings")
    k = auto_plane_count(emb.count(), target_bucket_rows)
    k = -(-k // multiple_of) * multiple_of
    rows = (
        emb.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= k))
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    return [[float(x) for x in r["embedding"]] for r in rows]


def _q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via hyperplane-LSH bucket self-join
    (no O(N^2) cross join; see operators/ann.py). Plane count auto-sizes
    with corpus size (see _data_planes)."""
    from embulk_spark.operators.ann import embedding_near_dups

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_near_dups(
        emb, _data_planes(spark, sf_dir), threshold=0.35
    )


def _q_embedding_neardup_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-OR multi-probe variant (operators/ann.py): candidates when ANY
    band of sign bits agrees — the recall-extension the full-code
    equality misses at bucket boundaries. Plane count auto-sizes in
    band-multiples (see _data_planes)."""
    from embulk_spark.operators.ann import embedding_near_dups

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_near_dups(
        emb, _data_planes(spark, sf_dir, multiple_of=2),
        threshold=0.35, n_bands=2,
    )


def _q_multimodal_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed media metadata from magic bytes, all JVM-side
    (functions/multimodal.py); media synthesized deterministically from
    the documents table (same construction in the oracle)."""
    from embulk_spark.functions.multimodal import media_meta_cols, synth_media_col

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id", synth_media_col(F.col("doc_id"), F.col("text")).alias("media")
    )
    return media.select("doc_id", *media_meta_cols(F.col("media")))


def _q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode/feature-extract over mapInPandas with the REAL vendored
    BMP codec (functions/multimodal.py::decode_bmp24): synth real
    24-bpp bitmaps whose dims/pixels are pure arithmetic in doc_id, decode
    them back, return the features. Full DuckDB oracle (the oracle
    recomputes the features arithmetically — the decoder must agree with
    the encoder byte-for-byte through the actual BMP container)."""
    from embulk_spark.functions.multimodal import decode_image_features, synth_bmp_col

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("id"), synth_bmp_col(F.col("doc_id")).alias("media")
    )
    return decode_image_features(media)


def _q_multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode/feature-extract with the REAL vendored PNG codec
    (functions/multimodal.py::decode_png — chunk walk, zlib inflate,
    5-filter unfilter): synth real PNGs whose dims/pixels are pure
    arithmetic in doc_id, decode them back. Full DuckDB oracle on
    (width, height, mean) — n_bytes is dropped because a zlib stream's
    length is not SQL arithmetic."""
    from embulk_spark.functions.multimodal import decode_image_features, synth_png_col

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("id"), synth_png_col(F.col("doc_id")).alias("media")
    )
    return decode_image_features(media).select(
        "id", "container", "width", "height", "mean_luma"
    )


def _q_multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode/feature-extract with the REAL vendored baseline JPEG
    codec (functions/jpeg.py — marker walk, huffman entropy decode with
    byte-unstuffing, dequantize, IDCT): synth real JPEGs whose BLOCK-
    CONSTANT pixels make the lossy round trip closed-form (only the DC
    coefficient survives; recon = clamp(2·round_half_away((v−128)/2) +
    128) under Q00=16), so the DuckDB oracle recomputes the decoded
    mean arithmetically — the decoder must agree with the encoder
    through the actual bitstream. n_bytes dropped (huffman stream
    length is not SQL arithmetic)."""
    from embulk_spark.functions.multimodal import (
        decode_image_features,
        synth_jpeg_col,
    )

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("id"),
        synth_jpeg_col(F.col("doc_id")).alias("media"),
    )
    return decode_image_features(media).select(
        "id", "container", "width", "height", "mean_luma"
    )


def _q_multimodal_decode_progressive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Image decode with the vendored PROGRESSIVE JPEG path
    (functions/jpeg.py Annex-G scans: DC successive approximation, two
    spectral AC bands, refinement passes): same block-constant closed
    form as the baseline-JPEG fixture, reached through a completely
    different bitstream — the DuckDB oracle recomputes the decoded mean
    arithmetically, so every scan kind must compose to the exact
    coefficients."""
    from embulk_spark.functions.multimodal import (
        decode_image_features,
        synth_jpeg_progressive_col,
    )

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("id"),
        synth_jpeg_progressive_col(F.col("doc_id")).alias("media"),
    )
    return decode_image_features(media).select(
        "id", "container", "width", "height", "mean_luma"
    )


def _q_multimodal_decode_arith(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Image decode with the vendored ARITHMETIC-coded JPEG path
    (functions/jpeg_arith.py — SOF9, T.81 Annex D QM coder with the
    Table D.3 estimation state machine and the F.1.4.4 DC/AC
    statistical models): same block-constant closed form as the
    baseline-JPEG fixture, reached through the arithmetic entropy
    coder — the DuckDB oracle recomputes the decoded mean
    arithmetically, so coder + models must be exact inverses of the
    encoder through the real bitstream."""
    from embulk_spark.functions.multimodal import (
        decode_image_features,
        synth_jpeg_arith_col,
    )

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("id"),
        synth_jpeg_arith_col(F.col("doc_id")).alias("media"),
    )
    return decode_image_features(media).select(
        "id", "container", "width", "height", "mean_luma"
    )


def _q_multimodal_decode_prog_arith(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Image decode with the vendored PROGRESSIVE-arithmetic JPEG path
    (SOF10 — G.2 successive-approximation scans over the QM coder:
    DC first/refine, banded AC first/refine): same block-constant
    closed form, reached through the fourth and last 8-bit DCT
    bitstream flavor."""
    from embulk_spark.functions.multimodal import (
        decode_image_features,
        synth_jpeg_prog_arith_col,
    )

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("id"),
        synth_jpeg_prog_arith_col(F.col("doc_id")).alias("media"),
    )
    return decode_image_features(media).select(
        "id", "container", "width", "height", "mean_luma"
    )


def _q_multimodal_decode_lossless(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Image decode with the vendored LOSSLESS JPEG path (SOF3 — T.81
    Annex H: seven-predictor prediction, modulo-65536 diffs, huffman
    categories): decode reproduces the pixel function EXACTLY, so the
    DuckDB oracle is a PLAIN pixel mean — zero codec arithmetic, the
    strongest oracle shape of the whole image tier. Predictor rotates
    with doc_id so all seven are driver-exercised."""
    from embulk_spark.functions.multimodal import (
        decode_image_features,
        synth_jpeg_lossless_col,
    )

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("id"),
        synth_jpeg_lossless_col(F.col("doc_id")).alias("media"),
    )
    return decode_image_features(media).select(
        "id", "container", "width", "height", "mean_luma"
    )


def _q_multimodal_decode_12bit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Image decode with the vendored 12-BIT extended-sequential JPEG
    path (SOF1 — level shift 2048, DC categories to 15, means scaled
    by exactly 255/4095): block-constant closed form
    clamp(2·round_half_away((v−2048)/2) + 2048, 0, 4095)."""
    from embulk_spark.functions.multimodal import (
        decode_image_features,
        synth_jpeg_12bit_col,
    )

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("id"),
        synth_jpeg_12bit_col(F.col("doc_id")).alias("media"),
    )
    return decode_image_features(media).select(
        "id", "container", "width", "height", "mean_luma"
    )


def _q_multimodal_avif_meta(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """AVIF metadata tier: REAL ISOBMFF box walk (meta → iprp → ipco →
    ispe, ISO 14496-12 grammar incl. FullBox offsets) recovers the
    image spatial extent from minimal-but-conformant AVIF skeletons;
    mean_luma is honestly NULL — AV1 pixel decode is the one remaining
    declared image-codec boundary, and a NULL never poses as a decoded
    value. Dims are pure arithmetic in doc_id, so the oracle needs no
    parser."""
    from embulk_spark.functions.multimodal import (
        decode_image_features,
        synth_avif_col,
    )

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("id"),
        synth_avif_col(F.col("doc_id")).alias("media"),
    )
    return decode_image_features(media).select(
        "id", "container", "width", "height", "mean_luma"
    )


def _q_multimodal_gif_frames(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL animated-GIF frame iteration (functions/gif.py::gif_frames
    — GCE delay/disposal/transparency, per-frame canvas composition)
    as a flat-map: 3 deterministic full-screen frames per doc, so the
    DuckDB oracle recomputes every frame's (delay, mean) from the
    palette/index arithmetic — the frame-sampling pipeline stage made
    real for the one animated container with a vendored codec."""
    from embulk_spark.functions.multimodal import (
        gif_frame_features,
        synth_gif_animated_col,
    )

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("id"),
        synth_gif_animated_col(F.col("doc_id")).alias("media"),
    )
    return gif_frame_features(media)


def _q_multimodal_webp_frames(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL animated-WebP frame iteration (functions/vp8l.py::
    webp_frames — VP8X canvas, ANIM background, ANMF blend/disposal,
    VP8L pixel decode per frame) as a flat-map: 3 deterministic
    full-canvas frames per doc; the DuckDB oracle recomputes every
    frame's (duration, mean) from the per-frame-shifted
    synth_webp_bytes pixel arithmetic."""
    from embulk_spark.functions.multimodal import (
        synth_webp_animated_col,
        webp_frame_features,
    )

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("id"),
        synth_webp_animated_col(F.col("doc_id")).alias("media"),
    )
    return webp_frame_features(media)


def _q_multimodal_webp_lossy_frames(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Animated-WebP frame iteration over LOSSY (VP8 key-frame)
    sub-bitstreams: each ANMF frame runs the vendored VP8 pipeline
    (boolean coder, tokens, IDCT/WHT, prediction, loop filter) and
    converts to RGB via full-range BT.601 — the fixtures' flat chroma
    makes RGB == Y exactly, so the DuckDB oracle recomputes every
    frame's mean as MB arithmetic despite the lossy codec."""
    from embulk_spark.functions.multimodal import (
        synth_webp_lossy_animated_col,
        webp_frame_features,
    )

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("id"),
        synth_webp_lossy_animated_col(F.col("doc_id")).alias("media"),
    )
    return webp_frame_features(media)


def _q_multimodal_resize_real(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL image resize end-to-end: synth real BMPs → resize_images
    (integer aspect box to max_side=8, nearest-neighbor re-encode as
    real BMP bytes) → decode_image_features over the RESIZED bytes.
    The DuckDB oracle recomputes the target box with the same integer
    arithmetic and the resized mean through the nearest source map
    src = (dst·src_dim)//dst_dim — the resize pipeline stage made
    real, adjudicated through a full decode of its output."""
    from embulk_spark.functions.multimodal import (
        decode_image_features,
        resize_images,
        synth_bmp_col,
    )

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("id"),
        synth_bmp_col(F.col("doc_id")).alias("media"),
    )
    resized = resize_images(media, max_side=8)
    return decode_image_features(resized).select(
        "id", "container", "width", "height", "mean_luma"
    )


def _q_multimodal_decode_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode/feature-extract with the REAL vendored GIF codec
    (functions/gif.py — header/LSD/palette walk, extension skip, full
    variable-width LZW decompress, palette map): synth real GIFs whose
    palette entries and pixel indices are pure arithmetic in doc_id,
    decode them back. Full DuckDB oracle on (width, height, mean) —
    n_bytes dropped because an LZW stream's length is not SQL
    arithmetic."""
    from embulk_spark.functions.multimodal import (
        decode_image_features,
        synth_gif_col,
    )

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("id"),
        synth_gif_col(F.col("doc_id")).alias("media"),
    )
    return decode_image_features(media).select(
        "id", "container", "width", "height", "mean_luma"
    )


def _q_multimodal_decode_webp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode/feature-extract with the REAL vendored VP8L
    (lossless WebP) codec (functions/vp8l.py — RIFF walk, LSB-first bit
    reader, simple + normal prefix codes with code-length codes, LZ77
    backrefs): synth real lossless WebPs whose pixels are pure
    arithmetic in doc_id (odd rows duplicate the row above — emitted as
    LZ77 references, so the copy path is exercised by construction).
    Full DuckDB oracle on (width, height, mean); mean is over R,G,B
    (alpha excluded). n_bytes dropped (entropy-coded stream length is
    not SQL arithmetic)."""
    from embulk_spark.functions.multimodal import (
        decode_image_features,
        synth_webp_col,
    )

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("id"),
        synth_webp_col(F.col("doc_id")).alias("media"),
    )
    return decode_image_features(media).select(
        "id", "container", "width", "height", "mean_luma"
    )


def _q_multimodal_decode_vp8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode/feature-extract with the REAL vendored lossy-VP8
    key-frame decoder (functions/vp8.py — boolean arithmetic coder,
    full token trees with the RFC 6386 probability tables, dequant,
    integer IDCT/WHT, intra prediction, loop filter; conformance-locked
    pixel-exact against the system libwebp): synth real lossy WebPs
    whose MB-constant luma reconstructs EXACTLY (DC-pred + single Y2-DC
    per MB), so the DuckDB oracle recomputes (width, height, luma mean)
    as pure arithmetic in doc_id."""
    from embulk_spark.functions.multimodal import (
        decode_image_features,
        synth_vp8_col,
    )

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("id"),
        synth_vp8_col(F.col("doc_id")).alias("media"),
    )
    return decode_image_features(media).select(
        "id", "container", "width", "height", "mean_luma"
    )


def _q_multimodal_decode_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plumbing path for containers with no vendored codec (deterministic
    fake backend behind _decode_backend — rows-only check)."""
    from embulk_spark.functions.multimodal import decode_image_features, synth_media_col

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("id"),
        synth_media_col(F.col("doc_id"), F.col("text")).alias("media"),
    )
    return decode_image_features(media)


def _q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (flat-map via mapInPandas; fake demux —
    rows-only check)."""
    from embulk_spark.functions.multimodal import sample_frames, synth_media_col

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("id"),
        synth_media_col(F.col("doc_id"), F.col("text")).alias("media"),
    )
    return sample_frames(media, every_ms=1000, max_frames=4).drop("frame")


def _q_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio metadata from REAL PCM WAV bytes, parsed entirely JVM-side
    (functions/multimodal.py::wav_meta_cols — no Python in the plan):
    synth canonical WAVs whose params are pure arithmetic in doc_id,
    parse the actual RIFF header back. The oracle recomputes the fields
    arithmetically — the parser must agree with the encoder byte-for-byte
    through the real container."""
    from embulk_spark.functions.multimodal import synth_wav_col, wav_meta_cols

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id", synth_wav_col(F.col("doc_id")).alias("media")
    )
    return media.select("doc_id", *wav_meta_cols(F.col("media")))


def _q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-level audio features (RMS, peak) via the real WAV decode:
    numpy-vectorized over Arrow batches (mapInPandas). Oracle recomputes
    RMS/peak from the synth sample arithmetic."""
    from embulk_spark.functions.multimodal import (
        decode_audio_features,
        synth_wav_col,
    )

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("id"), synth_wav_col(F.col("doc_id")).alias("media")
    )
    return decode_audio_features(media)


def _q_benchmark_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data decontamination (operators/dedup.py::
    benchmark_overlap): per-doc distinct 3-gram shingle overlap vs an
    eval set drawn from the corpus (doc_id % 97 == 0 — guarantees real
    hits). Corpus side shuffles once; the eval shingle set broadcasts."""
    from embulk_spark.operators.dedup import benchmark_overlap

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return benchmark_overlap(docs, bench, "text", "doc_id", shingle_n=3)


def _q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-line report (functions/textops.py::
    boilerplate_lines): documents get a deterministic synthetic footer
    line (doc_id % 5 variants — the documents fixture has no newlines),
    and the report must surface exactly the lines shared across ≥ 10
    docs, counted once per document. Mirrored by the oracle SQL."""
    from embulk_spark.functions.textops import boilerplate_lines

    docs = _t(spark, sf_dir, "documents")
    lined = docs.select(
        F.concat_ws(
            "\n",
            F.col("text"),
            F.concat(F.lit("(c) footer variant "), (F.col("doc_id") % 5)),
        ).alias("text")
    )
    return boilerplate_lines(lined, "text", min_docs=10)


def _q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style cross-document paragraph dedup (operators/dedup.py::
    dedup_paragraphs): docs get deterministic shared header (doc_id % 7)
    and footer (doc_id % 3) lines around their own body; paragraphs
    repeated across ≥ 2 docs survive only at their global first
    occurrence (min (doc_id, pos)) and every document's text is rewritten
    in place. The oracle replays the exact normalize→md5→winner→rebuild
    arithmetic in SQL."""
    from embulk_spark.operators.dedup import dedup_paragraphs

    docs = _t(spark, sf_dir, "documents")
    lined = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.lit("promo header "), (F.col("doc_id") % 7)),
            F.col("text"),
            F.concat(F.lit("(c) footer "), (F.col("doc_id") % 3)),
        ).alias("text"),
    )
    return dedup_paragraphs(lined, "text", "doc_id", min_docs=2)


def _q_sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic reservoir (operators/sample.py::sample_exact_k):
    EXACTLY 5 events per event_type, ranked by the salted md5 uniform —
    the eval-draw/per-domain-cap primitive rate sampling can't provide.
    Same rows every run/partitioning/engine; the oracle replays the
    identical hash rank."""
    from embulk_spark.operators.sample import sample_exact_k

    ev = _t(spark, sf_dir, "events")
    return sample_exact_k(
        ev.select("event_type", "event_id"), ["event_type"], 5, "event_id"
    )


def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus sampling (operators/sample.py):
    per-lang keep-rates applied via a salted md5 row hash — identical
    sample every run/partitioning/engine (the oracle replays the exact
    arithmetic), one broadcast join + codegen'd filter, no shuffle."""
    from embulk_spark.operators.sample import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(
        docs.select("doc_id", "lang"),
        ["lang"],
        {"en": 0.5, "de": 0.25},
        "doc_id",
        default_rate=0.1,
    )


def _q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast(
                    "decimal(28,6)"
                )
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_join_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast join orders⋈customer + top-10 revenue customers."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


def _q_join_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (3-way join with per-side pushdown filters):
    revenue of unshipped BUILDING-segment orders as of a cutoff date.
    Customer filter broadcast into orders, orders⋈lineitem as the one
    big equi-join (AQE plans it); both date filters push to the scans.
    Top-10 by revenue with deterministic orderkey tiebreak."""
    cutoff = "1998-03-15"
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_us"
            ),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def _q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


def _q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs → connected components (min-label
    propagation, operators/cluster.py): the clustering stage of keep-one
    fuzzy dedup. Component label = smallest doc_id in the cluster."""
    from embulk_spark.operators.cluster import dup_clusters

    docs = _t(spark, sf_dir, "documents")
    return dup_clusters(docs, "text", "doc_id", k=16, bands=4, threshold=0.5)


def _q_dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one fuzzy dedup: per near-dup cluster keep the doc with the
    largest (n_chars, doc_id); singletons survive untouched."""
    from embulk_spark.operators.cluster import dup_clusters, keep_canonical

    docs = _t(spark, sf_dir, "documents")
    comps = dup_clusters(docs, "text", "doc_id", k=16, bands=4, threshold=0.5)
    return keep_canonical(docs, comps, "doc_id", prefer=["n_chars"]).select(
        "doc_id"
    )


def _q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event gap-based session assignment (operators/sessions.py):
    one window spec = one shuffle + per-key sort; 30-min gap, inclusive
    boundary (session_window semantics)."""
    from embulk_spark.operators.sessions import sessionize

    ev = _t(spark, sf_dir, "events")
    out = sessionize(ev, "user_id", "ts", 1800, tiebreak="event_id")
    return out.select("event_id", "user_id", "session_idx", "session_id")


def _q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rollup via the NATIVE F.session_window hash agg (the
    streaming-capable path — same call works under a watermark)."""
    from embulk_spark.operators.sessions import session_stats

    ev = _t(spark, sf_dir, "events")
    out = session_stats(ev, "user_id", "ts", 1800)
    return out.select(
        "user_id",
        F.unix_micros(F.col("session_start").cast("timestamp")).alias("start_us"),
        F.unix_micros(F.col("session_end").cast("timestamp")).alias("end_us"),
        "n_events",
        "duration_sec",
    )


def _q_asof_join_attrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase as-of joined (backward,
    inclusive) to the user's latest prior click — the union+carry-forward
    ASOF join (operators/asof.py), oracle-checked against DuckDB's native
    ASOF LEFT JOIN."""
    from embulk_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    out = asof_join(purchases, clicks, "user_id", "ts", payload=["click_value"])
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "value",
        "click_value",
        F.unix_micros(F.col("asof_ts").cast("timestamp")).alias("click_ts_us"),
    )


def _q_msgpack_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MessagePack parser (sources/msgpack.py, the embulk-parser-msgpack
    analogue with the vendored pure-Python codec): pack `documents` rows
    into per-group msgpack streams (map rows, sequence files), parse them
    back through the mapInPandas scanner. The oracle recomputes every
    field from `documents` — width-selection or map-decode bugs break
    parity (doc_id spans fixint→uint16, score exercises float64)."""
    import pandas as pd

    from embulk_spark.sources.msgpack import pack_one, parse_msgpack_blobs

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text",
        (F.col("doc_id") / F.lit(4.0)).alias("score"),
        (F.col("doc_id") % 3 == 0).alias("flag"),
        (F.col("doc_id") % 16).alias("grp"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        blob = b"".join(
            pack_one(
                {
                    "doc_id": int(r.doc_id),
                    "lang": r.lang,
                    "text": r.text,
                    "score": float(r.score),
                    "flag": bool(r.flag),
                }
            )
            for r in pdf.itertuples()
        )
        return pd.DataFrame({"blob": [blob]})

    blobs = docs.groupBy("grp").applyInPandas(_pack, "blob BINARY")
    return parse_msgpack_blobs(
        blobs,
        "blob",
        {
            "columns": [
                {"name": "doc_id", "type": "long"},
                {"name": "lang", "type": "string"},
                {"name": "text", "type": "string"},
                {"name": "score", "type": "double"},
                {"name": "flag", "type": "boolean"},
            ]
        },
    )


def _q_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro Object Container File parser (sources/avro.py, vendored
    pure-Python OCF codec — deflate blocks, zigzag varints, null unions):
    write `documents` rows into per-group container blobs, parse them
    back. The oracle recomputes the packed fields from `documents`; the
    null-union branch is exercised by blanking lang on every 7th row."""
    import pandas as pd

    from embulk_spark.sources.avro import parse_avro_blobs, write_container

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 7 != 0, F.col("lang")).alias("lang"),
        "text",
        (F.col("doc_id") * F.lit(0.125)).alias("score"),
        (F.col("doc_id") % 16).alias("grp"),
    )
    schema = {
        "type": "record",
        "name": "Doc",
        "fields": [
            {"name": "doc_id", "type": "long"},
            {"name": "lang", "type": ["null", "string"]},
            {"name": "text", "type": "string"},
            {"name": "score", "type": "double"},
        ],
    }

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        recs = [
            {
                "doc_id": int(r.doc_id),
                "lang": None if r.lang is None else str(r.lang),
                "text": r.text,
                "score": float(r.score),
            }
            for r in pdf.itertuples()
        ]
        return pd.DataFrame(
            {"blob": [write_container(schema, recs, codec="deflate")]}
        )

    blobs = docs.groupBy("grp").applyInPandas(_pack, "blob BINARY")
    return parse_avro_blobs(
        blobs,
        "blob",
        {
            "columns": [
                {"name": "doc_id", "type": "long"},
                {"name": "lang", "type": "string"},
                {"name": "text", "type": "string"},
                {"name": "score", "type": "double"},
            ]
        },
    )


def _q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC source (sources/warc.py): synthesize Common-Crawl-style
    archives from `documents` with pure JVM Columns (warcinfo leader +
    per-page response records, grouped 32 pages/blob), parse them back
    through the mapInPandas record scanner, and emit the recovered
    fields. The oracle recomputes every field directly from `documents`
    — any header/envelope/Content-Length bug breaks parity."""
    from embulk_spark.sources.warc import (
        parse_warc_blobs,
        warc_record_col,
        warcinfo_col,
    )

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(F.lit("https://crawl.test/d"), F.col("doc_id")).alias("url"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("doc_id").cast("double"))
        ).alias("ts"),
        F.concat(
            F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")
        ).alias("html"),
        (F.col("doc_id") % 32).alias("grp"),
    )
    recs = pages.select(
        "grp",
        "url",
        warc_record_col(F.col("url"), F.col("ts"), F.col("html")).alias("rec"),
    )
    blobs = recs.groupBy("grp").agg(
        F.concat(
            warcinfo_col(F.concat(F.lit("synth-"), F.col("grp"))),
            F.concat_ws(
                "",
                F.array_sort(F.collect_list(F.struct("url", "rec"))).getField(
                    "rec"
                ),
            ),
        )
        .cast("binary")
        .alias("content")
    )
    return (
        parse_warc_blobs(blobs)
        .filter(F.col("warc_type") == "response")
        .select(
            "url",
            "warc_ts",
            "http_status",
            "content_type",
            F.col("payload").cast("string").alias("html"),
        )
    )


def _q_binlog_route_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table binlog routing semantics, oracle-checkable: synthesize
    a Debezium topic from `documents` whose envelopes carry
    ``source.table`` (pages/assets by doc parity), parse with
    ``with_table=True`` (the route tag path stream_binlog/route_epoch
    consume), then resolve latest-per-(table, url). The stateful
    exactly-once side is pytest's job (tests/test_routing.py); THIS pins
    that the tag survives the wire and partitions the key space."""
    from embulk_spark.sources.debezium import (
        PAGE_ROW_DDL,
        debezium_change_events,
        debezium_envelope_col,
    )

    docs = _t(spark, sf_dir, "documents")
    base_ms = 1704067200000
    page = docs.select(
        "doc_id",
        F.concat(F.lit("https://r.test/d"), (F.col("doc_id") % 50)).alias("url"),
        (F.lit(base_ms) + F.col("doc_id") * 1000).alias("ts_ms"),
        F.base64(F.col("lang").cast("binary")).alias("html"),
        "lang",
    )
    values = page.select(
        debezium_envelope_col(
            F.lit("c"),
            F.struct(
                "url", F.col("ts_ms").alias("warc_ts"), "html", "lang"
            ),
            pos=F.col("doc_id"),
            ts_ms=F.col("ts_ms"),
            table=F.when(F.col("doc_id") % 2 == 0, F.lit("pages")).otherwise(
                F.lit("assets")
            ),
        ).alias("value")
    )
    ev = debezium_change_events(values, with_table=True)
    return (
        ev.groupBy("table", "url")
        .agg(
            F.max_by("lang", "seq").alias("last_lang"),
            F.max("seq").alias("last_seq"),
            F.count("*").alias("n_events"),
        )
    )


def _q_debezium_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium envelope source (sources/debezium.py): synthesize a
    binlog-tail topic from `documents` with pure JVM Columns — snapshot
    reads (op r) for every 5th doc, creates for the rest, updates for
    every 3rd, deletes (pre-image in `before`) for every 7th, plus
    Kafka-compaction tombstones and op-t truncate noise that a parser
    must drop — half the envelopes wrapped in the Kafka Connect
    schemas.enable carrier. Parse it back through the one-pass
    from_json path and emit the canonical change rows. The oracle
    recomputes every field straight from `documents` — any op-map /
    image-pick / seq-precedence / wire-type bug breaks parity."""
    from embulk_spark.sources.debezium import (
        debezium_envelope_col,
        parse_debezium,
        PAGE_ROW_DDL,
    )

    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    base_ms = 1704067200000  # 2024-01-01 UTC
    page = docs.select(
        F.col("doc_id"),
        F.concat(F.lit("https://crawl.test/d"), F.col("doc_id")).alias("url"),
        (F.lit(base_ms) + F.col("doc_id") * 1000).alias("ts_ms"),
        F.base64(
            F.concat(
                F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")
            ).cast("binary")
        ).alias("html"),
        F.base64(
            F.concat(
                F.lit("<html><body>"), F.col("text"), F.lit(" v2</body></html>")
            ).cast("binary")
        ).alias("html2"),
        F.col("lang"),
    )
    row1 = F.struct(
        F.col("url"), F.col("ts_ms").alias("warc_ts"), F.col("html"), F.col("lang")
    )
    births = page.select(
        debezium_envelope_col(
            F.when(F.col("doc_id") % 5 == 0, F.lit("r")).otherwise(F.lit("c")),
            row1,
            pos=F.col("doc_id"),
            ts_ms=F.col("ts_ms"),
            snapshot=F.when(F.col("doc_id") % 5 == 0, F.lit("true")),
            schemas_enable=F.col("doc_id") % 2 == 0,
        ).alias("value")
    )
    updates = page.filter(F.col("doc_id") % 3 == 0).select(
        debezium_envelope_col(
            F.lit("u"),
            F.struct(
                F.col("url"),
                (F.col("ts_ms") + n * 1000).alias("warc_ts"),
                F.col("html2").alias("html"),
                F.col("lang"),
            ),
            before=row1,
            pos=F.col("doc_id") + n,
            ts_ms=F.col("ts_ms") + n * 1000,
            schemas_enable=F.col("doc_id") % 2 == 0,
        ).alias("value")
    )
    deletes = page.filter(F.col("doc_id") % 7 == 0).select(
        debezium_envelope_col(
            F.lit("d"),
            None,
            before=row1,
            pos=F.col("doc_id") + 2 * n,
            ts_ms=F.col("ts_ms") + 2 * n * 1000,
        ).alias("value")
    )
    tombstones = page.filter(F.col("doc_id") % 7 == 0).select(
        F.lit(None).cast("string").alias("value")
    )
    truncates = page.filter(F.col("doc_id") % 97 == 0).select(
        debezium_envelope_col(
            F.lit("t"), None, pos=F.col("doc_id") + 3 * n
        ).alias("value")
    )
    topic = births.unionAll(updates).unionAll(deletes).unionAll(
        tombstones
    ).unionAll(truncates)
    return parse_debezium(topic, PAGE_ROW_DDL).select(
        "seq",
        "op",
        "is_snapshot",
        "url",
        F.timestamp_millis(F.col("warc_ts")).alias("warc_ts"),
        F.md5(F.unbase64(F.col("html"))).alias("html_md5"),
        "lang",
    )


def _q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR hashed-unigram importance weights (operators/weighting.py):
    per-doc log-likelihood ratio of target (lang='en') vs raw token
    distributions over 1024 md5 buckets — two partial-combine aggs +
    one broadcast join, text never shuffles."""
    from embulk_spark.operators.weighting import dsir_weights

    docs = _t(spark, sf_dir, "documents")
    return dsir_weights(docs, F.col("lang") == "en", n_buckets=1024)


def _q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-span dedup (operators/substr.py):
    cut every redundant duplicated 8-gram run, keeping each gram's
    global first occurrence. The oracle replays the identical k-gram /
    winner / island-merge / rebuild pipeline in SQL."""
    from embulk_spark.operators.substr import substring_dedup

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return substring_dedup(docs, "text", "doc_id", k=8)


def _q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length chunking (operators/pack.py): strided token
    windows (max 64 tokens, stride 48 → 16-token overlap), the
    HuggingFace return_overflowing_tokens convention. Oracle replays the
    same start-index arithmetic + list slicing in SQL."""
    from embulk_spark.operators.pack import chunk_documents

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_documents(docs, "text", "doc_id", max_tokens=64, stride=48)


def _q_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk packing (operators/pack.py): global
    token offsets in a deterministic (bucket, md5-key) order, cut every
    512 tokens. Distributed as a two-level prefix sum (per-bucket window
    + broadcast bucket offsets); the oracle collapses it to ONE SQL
    window over the identical total order."""
    from embulk_spark.operators.pack import pack_token_budget

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return pack_token_budget(
        docs, "doc_id", budget=512, text_col="text", n_buckets=256,
        salt="pack1",
    ).select(
        "doc_id", "n_tokens", "global_offset", "seq_id", "offset_in_seq",
        "spans_boundary",
    )


def _q_corpus_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded corpus export round-trip (sinks/corpus.py): write the
    documents table as 8 deterministic md5 shards + audit manifest, then
    RE-READ the export from disk and aggregate per-shard rows / token
    counts / content fingerprints. The oracle computes the same stats
    from the SOURCE table — disk round-trip must be lossless."""
    import hashlib
    import os

    from embulk_spark.sinks.corpus import row_fingerprint, write_corpus_shards

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    path = _scratch_root("corpus", sf_dir)
    write_corpus_shards(docs, path, n_shards=8)
    back = spark.read.parquet(path)
    return back.groupBy("shard").agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(
            F.size(F.filter(F.split("text", r"\s+"), lambda w: w != F.lit("")))
        ).alias("n_tokens"),
        # string-rendered: the 2^64-plus sum exceeds int64, and pandas
        # would lossily floatify DuckDB's hugeint on the oracle side
        F.sum(row_fingerprint(F.col("doc_id"), F.col("text")))
        .cast("string")
        .alias("content_sum"),
    )


def _q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail partitioning (operators/weighting.py):
    per-language ntile(3) of the hashed-bigram LM score, deterministic
    (score, doc_id) order. The oracle wraps the shared LM SQL with the
    identical window."""
    from embulk_spark.operators.weighting import ccnet_buckets

    docs = _t(spark, sf_dir, "documents")
    return ccnet_buckets(docs, F.col("lang") == "en")


def _q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary induction (functions/textops.py): top-300
    lowercased whitespace tokens by count — partial-combine wordcount +
    TakeOrderedAndProject, deterministic (count desc, token) boundary."""
    from embulk_spark.functions.textops import vocab_topk

    docs = _t(spark, sf_dir, "documents").select("text")
    return vocab_topk(docs, "text", k=300)


def _q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode text normalization (functions/textops.py): zero-width /
    control strip, unicode space/quote/dash/ellipsis folds, whitespace
    tidy — a pure JVM regexp_replace chain. The oracle applies the
    IDENTICAL chain (generated from the same pattern constants) in
    DuckDB."""
    from embulk_spark.functions.textops import normalize_text

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    norm = normalize_text(F.col("text"))
    return docs.select(
        "doc_id",
        norm.alias("text_norm"),
        (~norm.eqNullSafe(F.col("text"))).alias("changed"),
        F.length(norm).alias("n_chars_norm"),
    )


def _normalize_sql_expr(col: str) -> str:
    """The normalize_text chain as one nested DuckDB expression, built
    from the SAME pattern constants the Spark side compiles — the two
    engines cannot drift."""
    from embulk_spark.functions import textops as T

    steps = [
        (T._ZERO_WIDTH, ""), ("\r\n", "\n"), ("\r", "\n"),
        (T._CONTROL, ""), (T._UNI_SPACE, " "),
        (T._SINGLE_QUOTES, "'"), (T._DOUBLE_QUOTES, '"'),
        (T._DASHES, "-"), ("\u2026", "..."),
        (" {2,}", " "), (" *\n *", "\n"), ("\n{3,}", "\n\n"),
        (r"^\s+|\s+$", ""),
    ]
    def esc_pat(pat: str) -> str:
        # DuckDB single-quoted literals are verbatim (no backslash
        # processing), but raw C0 bytes (NUL!) break the SQL parser —
        # encode them as RE2 \x{..} escapes, which pass through the
        # literal untouched and are interpreted by the regex engine
        out = []
        for ch in pat:
            o = ord(ch)
            if o < 0x20 or o == 0x7F:
                out.append(f"\\x{{{o:02x}}}")
            elif ch == "'":
                out.append("''")
            else:
                out.append(ch)
        return "".join(out)

    expr = col
    for pat, rep in steps:
        # replacement strings: RE2 rewrite has no \x escapes; newlines
        # embed as raw bytes (legal inside a SQL string literal)
        r = rep.replace("'", "''")
        expr = f"regexp_replace({expr}, '{esc_pat(pat)}', '{r}', 'g')"
    return expr


#: synthetic HTML page template, the SINGLE source of truth for both
#: engines (the documents fixture carries no html): ('lit', s) literal
#: segments, ('col', name) string-cast columns, ('mod2', even, odd) a
#: doc_id-parity branch. Exercises every step of the extract_text chain:
#: comment, title, style/script drop-blocks (with a raw '<' inside the
#: script), nav/list/heading/para block tags, inline tags, and entities.
_HTML_PAGE_PARTS: list = [
    ("lit", '<html><head><title> Doc '), ("col", "doc_id"),
    ("lit", ' &amp; co </title><style>p { margin: 0; }</style>'
            '<script type="text/x">var j = 1 < 2; // junk</script>'
            '</head><body><!-- gen --><nav><ul><li>Home</li>'
            '<li>Docs</li></ul></nav><h1>Doc '), ("col", "doc_id"),
    ("lit", '</h1><p>'), ("col", "text"),
    ("lit", '</p><div>Tags &lt;b&gt; &amp; &quot;quotes&quot;&nbsp;here.</div>'),
    ("mod2",
     [("lit", '<blockquote>even '), ("col", "lang"), ("lit", '</blockquote>')],
     [("lit", '<span>odd <b>bold</b> text</span>')]),
    ("lit", '<footer>(c) Example &amp; Co</footer></body></html>'),
]


def _synth_html_col(parts=None):
    """The template as a Spark Column expression."""
    parts = _HTML_PAGE_PARTS if parts is None else parts
    cols = []
    for p in parts:
        if p[0] == "lit":
            cols.append(F.lit(p[1]))
        elif p[0] == "col":
            cols.append(F.col(p[1]).cast("string"))
        else:
            cols.append(
                F.when(F.col("doc_id") % 2 == 0, _synth_html_col(p[1]))
                .otherwise(_synth_html_col(p[2]))
            )
    return F.concat(*cols)


def _synth_html_sql(parts=None) -> str:
    """The SAME template as a DuckDB concat expression."""
    parts = _HTML_PAGE_PARTS if parts is None else parts
    frags = []
    for p in parts:
        if p[0] == "lit":
            frags.append("'" + p[1].replace("'", "''") + "'")
        elif p[0] == "col":
            frags.append(f"CAST({p[1]} AS VARCHAR)")
        else:
            frags.append(
                f"(CASE WHEN doc_id % 2 = 0 THEN {_synth_html_sql(p[1])}"
                f" ELSE {_synth_html_sql(p[2])} END)"
            )
    return "(" + " || ".join(frags) + ")"


def _html_title_sql_pat() -> str:
    from embulk_spark.functions.textops import HTML_TITLE_RE
    return HTML_TITLE_RE.replace("'", "''")


def _html_strip_sql_expr(col: str) -> str:
    """extract_text's strip chain (comments → drop-blocks → block tags →
    any tag → entity folds) as one nested DuckDB expression, generated
    from the operator's OWN pattern constants, then the shared
    normalize_text chain on top — engines cannot drift."""
    from embulk_spark.functions import textops as T

    def esc(pat: str) -> str:
        return pat.replace("'", "''")

    expr = f"regexp_replace({col}, '{esc(T._HTML_COMMENT)}', '', 'g')"
    for tag in T.HTML_DROP_BLOCK_TAGS:
        pat = rf"(?is)<{tag}\b[^>]*>.*?</{tag}>"
        expr = f"regexp_replace({expr}, '{esc(pat)}', '', 'g')"
    expr = f"regexp_replace({expr}, '{esc(T._HTML_BLOCK_TAG)}', chr(10), 'g')"
    expr = f"regexp_replace({expr}, '{esc(T._HTML_ANY_TAG)}', '', 'g')"
    expr = f"regexp_replace({expr}, '{esc(T._HTML_NL_RUN)}', chr(10), 'g')"
    for ent, rep in T.HTML_ENTITY_FOLDS:
        r = rep.replace("'", "''")
        expr = f"replace({expr}, '{ent}', '{r}')"
    return _normalize_sql_expr(expr)


def _q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML main-content text extraction (functions/textops.py::
    extract_text): the html→text step between the crawl and every
    corpus filter. Comments/script/style/template blocks dropped, block
    tags become line breaks, inline tags stripped, entities folded,
    then the shared normalize_text whitespace tidy; plus <title> and
    the text/html ratio boilerplate signal. One narrow JVM projection —
    no shuffle, no UDF; html synthesized inline from documents via the
    same template the oracle concatenates."""
    from embulk_spark.functions.textops import extract_page_text

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    pages = docs.select("doc_id", _synth_html_col().alias("html"))
    out = extract_page_text(pages, "html")
    return out.select(
        "doc_id", "title",
        F.col("text").alias("main_text"),
        "text_ratio", "n_words",
    )


def _q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style hashed-bigram LM quality score
    (operators/weighting.py): add-α bigram model trained on lang='en'
    docs, per-doc bits-per-bigram. Count tables aggregate to ≤ B rows
    before the broadcast joins — text never shuffles."""
    from embulk_spark.operators.weighting import lm_perplexity

    docs = _t(spark, sf_dir, "documents")
    return lm_perplexity(docs, F.col("lang") == "en")


def _q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators/semdedup.py): deterministic 2-iteration
    k-means (k=8, init = lowest ids, centroids rounded to 9 dp) then
    keep/drop by cosine to each cluster's lowest-id canonical. The
    oracle unrolls the identical Lloyd iterations in SQL."""
    from embulk_spark.operators.semdedup import kmeans_fit, semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    cents = kmeans_fit(emb, k=8, n_iter=2)
    return semantic_dedup(emb, cents, threshold=0.92)


def _synth_url_rules_df(spark: SparkSession):
    return spark.createDataFrame(
        [
            ("domain", "blocked.com"),
            ("host", "bad.example.org"),
            ("prefix", "https://www.site.net/ads"),
        ],
        "kind string, pattern string",
    )


def _q_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL blocklist (operators/urlfilter.py): domain/host/prefix rules
    applied as ONE broadcast hash anti join keyed on the registered
    domain — corpus scanned once, never shuffled, no LIKE-ANY scan."""
    from embulk_spark.operators.urlfilter import apply_url_rules

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    dom = (
        F.when(did % 4 == 0, F.lit("Blocked.COM"))
        .when(did % 4 == 1, F.lit("example.org"))
        .when(did % 4 == 2, F.lit("site.net"))
        .otherwise(F.lit("good.io"))
    )
    sub = (
        F.when(did % 3 == 0, F.lit("www."))
        .when(did % 3 == 1, F.lit("bad."))
        .otherwise(F.lit(""))
    )
    path = F.when(did % 5 == 0, F.lit("/ads/x")).otherwise(
        F.concat(F.lit("/p"), (did % 7).cast("string"))
    )
    urls = docs.select(
        "doc_id", F.concat(F.lit("https://"), sub, dom, path).alias("url")
    )
    return apply_url_rules(urls, _synth_url_rules_df(spark), mode="block")


def _q_scd2_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal join against the SCD-2 dimension (operators/scd.py:
    scd2_join): facts = events probed 30 minutes after their own ts —
    each picks the dimension version valid at that instant (hash
    equi-join + validity filter, never a range nested-loop). Left join:
    probes past the last version still match it (open valid_to);
    there are no pre-first-version probes by construction, which the
    row count pins."""
    from embulk_spark.operators.scd import scd2_history, scd2_join

    ev = _t(spark, sf_dir, "events")
    dim = scd2_history(ev, ["user_id"], "ts", ["event_type"], tie_cols=["event_id"])
    facts = ev.select(
        "event_id",
        "user_id",
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("probe_ts"),
    )
    out = scd2_join(
        facts, dim, keys=["user_id"], ts_col="probe_ts", how="left",
        dim_prefix="d_",
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("probe_ts").cast("timestamp")).alias("probe_ts_us"),
        F.col("d_event_type").alias("dim_type"),
        F.col("d_version").cast("long").alias("dim_version"),
    )


def _q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history (operators/scd.py): the events change stream
    folded into per-user validity intervals — consecutive same-type
    events collapse, ``valid_to`` = next version's ``valid_from``, one
    shuffle (all windows share one partitioning)."""
    from embulk_spark.operators.scd import scd2_history

    ev = _t(spark, sf_dir, "events")
    hist = scd2_history(
        ev, ["user_id"], "ts", ["event_type"], tie_cols=["event_id"]
    )
    return hist.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("valid_from").cast("timestamp")).alias("valid_from_us"),
        F.unix_micros(F.col("valid_to").cast("timestamp")).alias("valid_to_us"),
        F.col("version").cast("long").alias("version"),
        "is_current",
    )


def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration damped PageRank (operators/graph.py) over the
    customer→supplier link graph (distinct pairs via orders⋈lineitem):
    5 rounds, each one shuffle join + partial-sum hash agg, dangling
    mass via a broadcast 1-row frame, lineage truncated per round. The
    oracle unrolls the 5 rounds as chained CTEs."""
    from embulk_spark.operators.graph import pagerank

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_custkey").alias("src"),
        (F.lit(1000000) + F.col("l_suppkey")).alias("dst"),
    )
    ranks = pagerank(edges, iters=5, damping=0.85)
    return ranks.select("node", F.round("rank", 12).alias("rank"))


def _q_feed_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSS/Atom feed parsing (sources/feeds.py): render each user's
    events as one multi-item feed document (even users RSS 2.0 with
    RFC-822 pubDates, odd users Atom with link-href + ISO updated),
    parse back to the normalized (kind, guid, title, link, pub_ts)
    record — regexp explode + per-field extract, all codegen. The
    oracle rebuilds the expected records straight from events;
    timestamps compare as epoch micros (second precision survives the
    round-trip)."""
    from embulk_spark.sources.feeds import parse_feed_column

    parsed = parse_feed_column(_feed_docs_fixture(spark, sf_dir), F.col("doc"))
    return parsed.select(
        "kind", "guid", "title", "link",
        F.unix_micros("pub_ts").alias("pub_us"),
    )


def _feed_docs_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user multi-item feed documents rendered from events (even
    users RSS 2.0, odd users Atom) — shared by feed_parse and
    feed_refresh_candidates."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.date_trunc("second", F.col("ts")).alias("ts2"),
    )
    rss_item = F.concat(
        F.lit("<item><guid>evt:"), F.col("event_id"),
        F.lit("</guid><title>"), F.col("event_type"),
        F.lit(" #"), F.col("event_id"),
        F.lit("</title><link>https://example.com/u/"), F.col("user_id"),
        F.lit("/e/"), F.col("event_id"),
        F.lit("</link><pubDate>"),
        F.date_format("ts2", "EEE, dd MMM yyyy HH:mm:ss"),
        F.lit(" GMT</pubDate></item>"),
    )
    atom_entry = F.concat(
        F.lit("<entry><id>evt:"), F.col("event_id"),
        F.lit("</id><title>"), F.col("event_type"),
        F.lit(" #"), F.col("event_id"),
        F.lit('</title><link href="https://example.com/u/'),
        F.col("user_id"), F.lit("/e/"), F.col("event_id"),
        F.lit('"/><updated>'),
        F.date_format("ts2", "yyyy-MM-dd'T'HH:mm:ss"),
        F.lit("Z</updated></entry>"),
    )
    body = F.when(F.col("user_id") % 2 == 0, rss_item).otherwise(atom_entry)
    docs = (
        ev.select("user_id", "event_id", body.alias("_s"))
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("event_id", "_s"))),
                    lambda x: x["_s"],
                ),
            ).alias("_items")
        )
        .select(
            F.when(
                F.col("user_id") % 2 == 0,
                F.concat(
                    F.lit('<rss version="2.0"><channel><title>u'),
                    F.col("user_id"), F.lit("</title>"),
                    F.col("_items"), F.lit("</channel></rss>"),
                ),
            )
            .otherwise(
                F.concat(
                    F.lit('<feed xmlns="http://www.w3.org/2005/Atom"><title>u'),
                    F.col("user_id"), F.lit("</title>"),
                    F.col("_items"), F.lit("</feed>"),
                )
            )
            .alias("doc")
        )
    )
    return docs


def _q_feed_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-driven staleness detection (sources/feeds.py::
    feed_refresh_candidates): parse the feed fixture, join the freshest
    per-link claim against a published lake state derived from the same
    events (event_id%3==0 current, ==1 one hour behind the feed, ==2
    never crawled) — emit exactly the stale+new fetch set. One
    map-side max per link, one equi-join on url."""
    from embulk_spark.sources.feeds import (
        feed_refresh_candidates,
        parse_feed_column,
    )

    entries = parse_feed_column(
        _feed_docs_fixture(spark, sf_dir), F.col("doc")
    )
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.date_trunc("second", F.col("ts")).alias("ts2"),
    )
    published = ev.filter(F.col("event_id") % 3 != 2).select(
        F.concat(
            F.lit("https://example.com/u/"), F.col("user_id"),
            F.lit("/e/"), F.col("event_id"),
        ).alias("url"),
        F.when(F.col("event_id") % 3 == 0, F.col("ts2"))
        .otherwise(F.col("ts2") - F.expr("INTERVAL 1 HOUR"))
        .alias("warc_ts"),
    )
    out = feed_refresh_candidates(entries, published)
    return out.select(
        "url", F.unix_micros("feed_ts").alias("feed_us"), "status"
    )


def _q_dynamodb_stream_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DynamoDB Streams wire parser (sources/debezium.py::
    parse_dynamodb_stream): render the public Kinesis-adapter record
    shape from events with pure JVM concat — INSERTs with full typed
    images (S/N/BOOL attribute values), MODIFYs, key-only REMOVE
    tombstones — parse back through the one-pass from_json path. The
    oracle rebuilds every typed field straight from events."""
    from embulk_spark.sources.debezium import parse_dynamodb_stream

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_seconds(F.date_trunc("second", F.col("ts"))).alias("ats"),
    )
    sid = F.col("event_id")
    bool_s = F.when(sid % 2 == 0, F.lit("true")).otherwise(F.lit("false"))
    image = lambda n_expr: F.concat(  # noqa: E731
        F.lit('{"pk":{"S":"e'), sid, F.lit('"},"etype":{"S":"'),
        F.col("event_type"), F.lit('"},"n":{"N":"'), n_expr,
        F.lit('"},"ok":{"BOOL":'), bool_s, F.lit("}}"),
    )
    head = F.concat(
        F.lit('{"eventName":"'),
        F.when(sid % 5 == 0, F.lit("REMOVE"))
        .when(sid % 5 == 1, F.lit("MODIFY"))
        .otherwise(F.lit("INSERT")),
        F.lit('","dynamodb":{"ApproximateCreationDateTime":'),
        F.col("ats"),
        F.lit(',"Keys":{"pk":{"S":"e'), sid, F.lit('"}}'),
    )
    tail = F.concat(
        F.lit(',"SequenceNumber":"'), sid, F.lit('"}}')
    )
    rec = F.concat(
        head,
        F.when(sid % 5 == 0, F.lit(""))
        .when(
            sid % 5 == 1,
            F.concat(F.lit(',"NewImage":'), image(sid * 3 + 1)),
        )
        .otherwise(F.concat(F.lit(',"NewImage":'), image(sid * 3))),
        tail,
    )
    return parse_dynamodb_stream(
        ev.select(rec.alias("value")),
        "pk string, etype string, n bigint, ok boolean",
    )


def _q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV bottom-k set-overlap estimation (operators/kmv.py):
    distinct-user overlap between every event-type pair — union /
    jaccard / intersection estimates from k=64 sketches built on the
    exact md5-prefix uniform (bit-identical cross-engine; the oracle
    recomputes sketches and estimators verbatim). One exchange on the
    group key; pair algebra touches only ≤k-element arrays."""
    from embulk_spark.operators.kmv import kmv_overlap, kmv_sketch

    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    sk = kmv_sketch(ev, ["event_type"], "user_id", k=64)
    out = kmv_overlap(sk, ["event_type"], k=64)
    return out.withColumn("shared", F.col("shared").cast("long"))


def _q_replica_merkle_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle anti-entropy (operators/merkle.py::replica_diff): replica
    A = documents; replica B drops doc_id%97==3, rewrites lang to 'xx'
    on doc_id%83==0, and adds one extra row — the diff localizes every
    corruption to its leaf bucket (4096 leaves) with digest+count
    channels, ONE corpus shuffle per side. Oracle recomputes the same
    md5/bit_xor digest algebra at leaf level."""
    from embulk_spark.operators.merkle import replica_diff

    a = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    b = (
        a.filter(F.col("doc_id") % 97 != 3)
        .select(
            "doc_id",
            "text",
            F.when(F.col("doc_id") % 83 == 0, F.lit("xx"))
            .otherwise(F.col("lang"))
            .alias("lang"),
        )
        .unionByName(
            spark.range(1).select(
                F.lit(999999).cast("long").alias("doc_id"),
                F.lit("extra row").alias("text"),
                F.lit("en").alias("lang"),
            )
        )
    )
    return replica_diff(a, b, "doc_id", ["text", "lang"])


def _q_incremental_chunk_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental content-addressed chunk store (operators/
    chunkstore.py): 4 epochs (doc_id%4) ingest in order, each chunking
    only its Δ and committing only store-novel hashes. Output = the
    per-epoch dedup metrics; the oracle partitions the batch chunking
    by first-seen epoch, certifying incremental == batch."""
    from embulk_spark.operators.chunkstore import ChunkStore

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    store = ChunkStore(spark, _scratch_root("chunkstore", sf_dir))
    rows = []
    for e in range(4):
        m = store.ingest_epoch(docs.filter(F.col("doc_id") % 4 == e), e)
        rows.append(
            (e, m["chunks_seen"], m["new_chunks"], m["dup_chunks"],
             m["new_chars"])
        )
    return spark.createDataFrame(
        rows,
        "epoch long, chunks_seen long, new_chunks long, dup_chunks long, "
        "new_chars long",
    )


def _q_page_change_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot change magnitude (operators/cdchunk.py::
    chunk_change_stats) — the recrawl-scheduler input: chunk two
    snapshots, multiset-intersect per (key, chunk-md5), classify on
    integer char counts (unchanged / minor ≥70% retained / major).
    Snapshot fixture: documents vs a deterministic edit — doc_id%3==0
    unchanged, ==1 a 5-char insertion at offset 40, ==2 a
    vowel-translate rewrite. The oracle re-runs the identical chunk
    pipeline over both sides."""
    from embulk_spark.operators.cdchunk import chunk_change_stats

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    t = F.col("text")
    edited = (
        F.when(F.col("doc_id") % 3 == 0, t)
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                t.substr(F.lit(1), F.lit(40)),
                F.lit("[rev]"),
                t.substr(F.lit(41), F.length(t)),
            ),
        )
        .otherwise(F.translate(t, "aeiou", "01234"))
    )
    new = docs.select("doc_id", edited.alias("text"))
    return chunk_change_stats(docs, new)


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Poisson sampling + Horvitz–Thompson factors
    (operators/sample.py::weighted_sample): inclusion probability ∝
    doc length (n_chars over its corpus mean — the length prior corpus
    builders weight by), exact cross-engine parity (integer-derived
    uniform, one IEEE multiply — no ln/pow keys). Narrow codegen
    filter; the 1-row mean enters via broadcast."""
    from embulk_spark.operators.sample import weighted_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    stats = docs.agg(
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avgc")
    )
    weighted = docs.crossJoin(F.broadcast(stats)).withColumn(
        "w", F.col("n_chars") / F.col("avgc")
    )
    out = weighted_sample(weighted, 0.25, "w", "doc_id")
    return out.select(
        "doc_id",
        "lang",
        "n_chars",
        F.round("incl_p", 12).alias("incl_p"),
        F.round("ht_factor", 12).alias("ht_factor"),
    )


def _q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking + chunk-level dedup rollup
    (operators/cdchunk.py): md5-window cut rule (window 16, divisor
    64), keeper = corpus-wide min doc_id·1e5+idx per chunk hash.
    Chunking is a narrow codegen projection; dedup is one shuffle on
    the uniform chunk-md5 key + a partial-agg rollup to doc_id. The
    oracle recomputes the identical cut set via lateral
    generate_series + the same md5 windows."""
    from embulk_spark.operators.cdchunk import chunk_dedup_stats

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_dedup_stats(docs)


def _q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg HITS hubs/authorities (operators/graph.py::hits) over
    the same customer→supplier link graph as pagerank: 4 rounds, each
    two edge-shuffle joins + partial-sum hash aggs, the per-half-step
    L2 norm a broadcast 1-row frame. The oracle unrolls the rounds as
    chained CTEs with the identical operation order."""
    from embulk_spark.operators.graph import hits

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_custkey").alias("src"),
        (F.lit(1000000) + F.col("l_suppkey")).alias("dst"),
    )
    state = hits(edges, iters=4)
    return state.select(
        "node",
        F.round("hub", 12).alias("hub"),
        F.round("auth", 12).alias("auth"),
    )


def _q_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership probe (operators/bloom.py): docs with
    doc_id%4≠0 build an m=2^20-bit corpus fingerprint (bit_or-packed
    longs, broadcastable at any corpus size); the doc_id%4==0 batch is
    probed without the corpus in the plan. ``exact_present`` (left-semi
    ground truth) exposes the false-positive contract: never
    exact&&!bloom, sometimes bloom&&!exact."""
    from embulk_spark.operators.bloom import bloom_build, bloom_probe

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.pmod("doc_id", F.lit(4)) != 0)
    batch = docs.filter(F.pmod("doc_id", F.lit(4)) == 0)
    bloom = bloom_build(corpus, "text", m_bits=1 << 20, k=5)
    probed = bloom_probe(batch, bloom, "text", ["doc_id"], m_bits=1 << 20, k=5)
    exact = (
        batch.join(
            corpus.select(F.col("text").alias("_ct")).distinct(),
            batch["text"] == F.col("_ct"),
            "left",
        )
        .groupBy("doc_id")
        .agg(F.max(F.col("_ct").isNotNull()).alias("exact_present"))
    )
    return probed.join(exact, "doc_id")


def _q_metrics_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-metrics rollup: ROLLUP(event_type, day) subtotal lattice —
    per-(type, day), per-type, and grand-total rows in ONE pass
    (Catalyst expands grouping sets map-side; no per-level rescan)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "value",
            "user_id",
        )
        .rollup("event_type", "day")
        .agg(
            F.grouping_id().alias("grp"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
    )


#: BM25 topic seed — terms that actually occur in the synthetic corpus
_BM25_TERMS = ["join", "shuffle", "broadcast", "customer"]


def _q_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against a topic seed list
    (operators/retrieval.py) — the targeted-crawl quality prior. Query
    terms broadcast; only matching (doc, term) pairs shuffle; corpus
    constants come from one tiny agg crossed back broadcast."""
    from embulk_spark.operators.retrieval import bm25_scores

    docs = _t(spark, sf_dir, "documents")
    return bm25_scores(docs, _BM25_TERMS)


def _q_incremental_agg_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized aggregate view (operators/aggview.py):
    per-lang doc counts + html bytes maintained in epoch lockstep WITH
    RETRACTIONS. Epoch 0 ingests every document; epoch 1 updates
    doc_id%4==1 (html grows ' upd1') and deletes doc_id%10==3. Each fold
    reads only the changed urls' pre/post winner rows (bucket-pruned time
    travel), never the table; the oracle aggregates the corpus's FINAL
    state in SQL — certifying incremental-with-retractions == batch."""
    import hashlib
    import os

    from embulk_spark.operators.aggview import AggView
    from embulk_spark.streaming.lake import ParquetLakeTable
    from embulk_spark.streaming.replay import apply_epoch

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    root = _scratch_root("aggview", sf_dir)
    table = ParquetLakeTable(
        spark, os.path.join(root, "t"), n_buckets=8,
        compact_min_deltas=10_000,
    )
    view = AggView(
        spark, os.path.join(root, "v"), key_sql="lang", key_name="lang",
        measures={"bytes": "octet_length(html)"},
    )

    def to_events(df, op, seq_off, ts_off):
        return df.select(
            (F.col("doc_id") + seq_off).alias("seq"),
            F.lit(op).alias("op"),
            F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"),
            F.timestamp_seconds(
                F.lit(1_700_000_000 + ts_off) + F.col("doc_id")
            ).alias("warc_ts"),
            F.when(F.lit(op) != "D", F.col("text").cast("binary"))
            .alias("html"),
            F.when(F.lit(op) != "D", F.col("lang")).alias("lang"),
            F.lit(None).cast("string").alias("schema_change"),
        )

    m = apply_epoch(table, to_events(docs, "I", 0, 0), 0)
    view.update_from_lake_epoch(table, 0, delta_dir=m["delta_dir"])
    upd = docs.filter(F.col("doc_id") % 4 == 1).withColumn(
        "text", F.concat("text", F.lit(" upd1"))
    )
    dels = docs.filter(F.col("doc_id") % 10 == 3)
    e1 = to_events(upd, "U", 1_000_000_000, 3600).unionByName(
        to_events(dels, "D", 2_000_000_000, 7200)
    )
    m = apply_epoch(table, e1, 1)
    view.update_from_lake_epoch(table, 1, delta_dir=m["delta_dir"])
    return view.state()


def _q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.py): 8 merge
    rules learned from the documents corpus — ONE corpus-touching
    wordcount, then per round an O(vocab) pair agg + a broadcast 1-row
    argmax feeding a JVM fold (leftmost-first merge, zero Python). The
    oracle unrolls the rounds as chained MATERIALIZED CTEs whose merge
    step is a replace-until-fixpoint recursive CTE over separator-framed
    symbol strings — pinned equivalent to the fold (tests/test_bpe.py)."""
    from embulk_spark.operators.bpe import bpe_train

    docs = _t(spark, sf_dir, "documents").select("text")
    return bpe_train(docs, n_merges=8, min_freq=2)


#: literal merge rules for the bpe_encode query/oracle pair — applying a
#: SHIPPED merge table is the operator's contract (training its own is
#: covered by bpe_merges; trained→encode composition by tests/test_bpe.py).
#: Order matters: rule 2 consumes rule 1's output symbol.
BPE_ENCODE_RULES = [
    ("t", "h", "th"), ("th", "e", "the"), ("a", "n", "an"),
    ("i", "n", "in"), ("e", "r", "er"),
]


def _q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION (operators/bpe.py::bpe_encode): encode
    every document under a shipped merge table as one ZERO-shuffle
    per-row JVM expression — per word a chained leftmost-first fold per
    rule, the same fold the trainer uses, flattened back to document
    order. The oracle replays each rule as a replace-until-fixpoint
    recursive CTE over separator-framed per-word symbol strings and
    rebuilds document order with a position-ordered list aggregation."""
    from embulk_spark.operators.bpe import bpe_encode

    merges = spark.createDataFrame(
        [(k, a, b, m) for k, (a, b, m) in enumerate(BPE_ENCODE_RULES, 1)],
        "round int, pair_a string, pair_b string, merged string",
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    enc = bpe_encode(docs, merges, id_col="doc_id")
    return enc.select(
        "doc_id",
        F.array_join("tokens", " ").alias("tokens_str"),
        "n_tokens",
    )


def _q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine trained quality classifier (operators/classifier.py):
    hashed-unigram logistic regression fit by 3 full-batch GD steps ON
    THE CLUSTER (weights stay a broadcastable ≤B-row frame, text never
    reshuffles), then scored over the same corpus; the oracle unrolls
    the training as chained CTEs. The documents fixture's labels
    (lang/source) are independent of its text, so — like link_extract
    synthesizes html — the labeled corpus is derived INLINE identically
    in both engines: marker tokens appended by label, which the model
    must learn over the shared base vocabulary (tests/test_classifier.py
    pins that it does, acc > 0.95)."""
    from embulk_spark.operators.classifier import quality_classifier

    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" premium curated"))
            .otherwise(F.lit(" lowgrade boiler")),
        ).alias("text"),
        (F.col("doc_id") % 3 == 0).alias("y_true"),
    )
    return quality_classifier(aug, F.col("y_true"))


def _q_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/val/test split (operators/sample.py::
    split_by_group): every user's events land in ONE split via the
    pinned md5-uniform hash on the group key — no shuffle, run/
    partitioning/engine-invariant. Report: per-split row and group
    counts."""
    from embulk_spark.operators.sample import split_by_group

    ev = _t(spark, sf_dir, "events")
    out = split_by_group(ev, "user_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("user_id").alias("n_groups"),
    )


def _q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters (operators/cms.py): users above an
    activity threshold, estimated from a d×w mergeable counter sketch
    (never undercounts → recall 1 on true hot keys). Engine-parity md5
    positions; the oracle replays the sketch counter-for-counter."""
    from embulk_spark.operators.cms import heavy_hitters

    ev = _t(spark, sf_dir, "events")
    # string-typed candidate keys to match the oracle's VARCHAR schema
    cand = ev.select(F.col("user_id").cast("string").alias("key")).distinct()
    return heavy_hitters(ev, "user_id", threshold=70, candidates=cand)


def _q_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraint report
    (operators/validate.py): Embulk's stop_on_invalid_record contract
    generalized to named rules with per-rule violation counts. All
    row-level rules fold into ONE aggregate pass (stack-unpivoted);
    the unique rule adds one map-side-combine hash agg."""
    from embulk_spark.operators.validate import violation_report

    ev = _t(spark, sf_dir, "events")
    return violation_report(
        ev,
        [
            {"column": "user_id", "check": "not_null"},
            {"column": "value", "check": "range", "min": 0, "max": 10},
            {"column": "event_type", "check": "in_set",
             "values": ["click", "view", "purchase"]},
            {"column": "props", "check": "regex", "pattern": "^\\{"},
            {"column": "event_id", "check": "unique"},
            {"check": "expr", "expr": "ts >= timestamp'2024-01-01 00:00:00'",
             "name": "ts_in_2024"},
        ],
    )


def _q_interval_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin-bucketed interval join (operators/ranges.py): attribute point
    events to 45-min maintenance windows every 2 h over Jan 2024 —
    point-in-interval matching as a broadcast HASH join on the quantized
    time bin (fan-out ≤ 2 bins/window), never the BroadcastNestedLoopJoin
    or cartesian a raw BETWEEN predicate plans. Per window: event count +
    distinct users. Times compared in epoch micros on both engines."""
    from embulk_spark.operators.ranges import interval_join

    ev = _t(spark, sf_dir, "events")
    base = 1704067200000000  # 2024-01-01T00:00:00Z, micros
    wins = spark.range(360).select(
        F.col("id").alias("win_id"),
        (F.lit(base) + F.col("id") * 7200000000).alias("lo"),
        (F.lit(base) + F.col("id") * 7200000000 + 2700000000).alias("hi"),
    )
    # fixture ts is TIMESTAMP_NTZ; session tz is pinned UTC, so the cast
    # reads it as UTC — the same convention DuckDB's epoch_us applies
    pts = ev.select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("t")
    )
    hits = interval_join(
        pts, wins, point_col="t", lo_col="lo", hi_col="hi",
        bin_width=2700e6, broadcast_intervals=True,
    )
    return hits.groupBy("win_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


def _q_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantiles (operators/quantiles.py): per-language
    doc-length p50/p90/p99 from a fixed-edge mergeable histogram — the
    distribution leg of the sketch toolkit (bloom/HLL/CMS + shape). The
    oracle replays the same edges and interpolation end to end;
    tests/test_quantiles.py pins incremental (per-half merge) == batch."""
    from embulk_spark.operators.quantiles import length_quantiles

    docs = _t(spark, sf_dir, "documents")
    return length_quantiles(docs, "n_chars", ["lang"], [0.5, 0.9, 0.99])


def _q_anchor_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inbound anchor-text aggregation (functions/textops.py::
    extract_anchors/anchor_edges/top_anchors): per target host, the
    top-2 anchor strings by DISTINCT linking-host vote — the off-page
    title/relevance signal web-corpus pipelines attach to documents.
    Like link_extract, anchor-bearing html is synthesized INLINE from
    (doc_id, text) identically in the oracle; the real JVM regex-pair
    zip operator runs over it."""
    from embulk_spark.functions.textops import anchor_edges, top_anchors

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(F.lit("http://h"), (F.col("doc_id") % 37).cast("string"),
                 F.lit(".example.com/d/"), F.col("doc_id").cast("string")).alias("url"),
        F.concat(
            F.lit('<html><body><p>'), F.col("text"), F.lit('</p>'),
            F.lit('<a href="http://h'), (F.col("doc_id") % 29).cast("string"),
            F.lit('.example.com/p">site '), (F.col("doc_id") % 5).cast("string"),
            F.lit('</a>'),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(F.lit('<a class="x" href="https://h'),
                         (F.col("doc_id") % 11).cast("string"),
                         F.lit('.example.org/q"> read  more </a>'
                               '<a href="http://img.example.net/i"></a>')),
            ).otherwise(F.lit('<a href="/rel">skip</a>')),
            F.lit("</body></html>"),
        ).alias("html"),
    )
    return top_anchors(anchor_edges(pages, "url", "html"), k=2)


def _q_link_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML outlink extraction → host-level in-degree
    (functions/textops.py::extract_links/link_edges). The documents
    fixture carries no html, so link-bearing html is synthesized INLINE
    from (doc_id, text) — identically in the oracle SQL — and the real
    JVM regexp operator runs over it: per dst_host distinct-source
    in-degree, the link-graph build every PageRank run starts from."""
    from embulk_spark.functions.textops import link_edges

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(F.lit("http://h"), (F.col("doc_id") % 37).cast("string"),
                 F.lit(".example.com/d/"), F.col("doc_id").cast("string")).alias("url"),
        F.concat(
            F.lit('<html><body><p>'), F.col("text"), F.lit('</p>'),
            F.lit('<a href="http://h'), (F.col("doc_id") % 29).cast("string"),
            F.lit('.example.com/p">x</a>'),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit('<a href="ftp://skip.me/f">f</a>'
                               '<a href="https://h'),
                         (F.col("doc_id") % 11).cast("string"),
                         F.lit('.example.org/q#frag">y</a>')),
            ).otherwise(F.lit('<a href="/relative/skip">r</a>')),
            F.lit("</body></html>"),
        ).alias("html"),
    )
    edges = link_edges(pages, "url", "html")
    return edges.groupBy("dst_host").agg(
        F.count(F.lit(1)).alias("n_src_hosts")
    )


def _q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog distinct-user sketch per event_type
    (operators/sketch.py): md5-pinned 256-register HLL whose registers
    AND estimate are bit-identical across engines — the oracle runs the
    same sketch from the same constants (hll_oracle_sql is generated
    from the operator's single source of truth). One combine-friendly
    shuffle regardless of input size; sketches merge with max (see
    tests/test_sketch.py incremental==batch)."""
    from embulk_spark.operators.sketch import hll_distinct

    ev = _t(spark, sf_dir, "events")
    return hll_distinct(ev, "user_id", ["event_type"])


def _q_filter_hash_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embulk-filter-hash (operators/rowops.py::hash_columns): one-way
    digests for PII columns — plain md5 rename-aside plus a salted
    sha256 in place, nulls passing through. Oracle: DuckDB's md5/sha256
    produce the same lowercase hex."""
    from embulk_spark.operators.rowops import hash_columns

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "props")
    out = hash_columns(ev, [
        {"name": "user_id", "algorithm": "sha256", "secret_key": "pepper"},
        {"name": "props", "algorithm": "md5", "new_name": "props_md5"},
    ])
    return out.select("event_id", "user_id", "props_md5")


def _q_filter_gsub_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embulk-filter-gsub (rowops.py::gsub_columns): global regexp
    replace staying in codegen; replaced-into-new-name keeps the
    original."""
    from embulk_spark.operators.rowops import gsub_columns

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = gsub_columns(docs, [
        {"name": "text", "pattern": "[aeiou]", "to": "_",
         "new_name": "devoweled"},
    ])
    return out.select(
        "doc_id", F.length("devoweled").alias("n"),
        F.substring("devoweled", 1, 40).alias("head"),
    )


def _q_filter_split_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embulk-filter-split (rowops.py::split_rows): delimited column →
    one row per element, explode in the same stage (no shuffle)."""
    from embulk_spark.operators.rowops import split_rows

    docs = _t(spark, sf_dir, "documents").filter("doc_id < 50").select(
        "doc_id", F.col("text").alias("word")
    )
    return split_rows(docs, "word", delimiter=" ", trim=True)


def _q_parser_ltsv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embulk-parser-ltsv (sources/files.py::parse_ltsv_column):
    label:value TSV lines with DUPLICATE-LABEL-LAST-WINS — the line
    carries a decoy `value:` field before the real one. Oracle: the
    direct column mapping (the decoy must lose)."""
    from embulk_spark.sources.files import parse_ltsv_column

    ev = _t(spark, sf_dir, "events")
    lines = ev.select(
        F.concat_ws(
            "\t",
            F.concat(F.lit("event_id:"), F.col("event_id").cast("string")),
            F.lit("value:DECOY"),
            F.concat(F.lit("etype:"), F.col("event_type")),
            F.concat(F.lit("value:"), F.col("value").cast("string")),
        ).alias("line")
    )
    return parse_ltsv_column(lines, F.col("line"), [
        {"name": "event_id", "type": "long"},
        {"name": "etype", "type": "string"},
        {"name": "value", "type": "double"},
    ])


def _q_filter_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embulk-filter-base64 (rowops.py::base64_columns): per-column
    encode/decode with the null-on-bad-value setter policy (invalid
    base64 → NULL via try_to_binary). Oracle: DuckDB's
    to_base64/from_base64 over the same bytes; the invalid column is
    NULL on both sides."""
    from embulk_spark.operators.rowops import base64_columns

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.col("props").alias("enc_src"),
        F.base64(F.col("event_type").cast("binary")).alias("dec_src"),
        # '!' can never appear in base64: decode must null out
        F.concat(F.col("event_type"), F.lit("!!")).alias("bad_b64"),
    )
    return base64_columns(ev, [
        {"name": "enc_src", "encode": True},
        {"name": "dec_src", "decode": True},
        {"name": "bad_b64", "decode": True},
    ])


def _q_jdbc_mode_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embulk-output-jdbc write modes (sinks/jdbc_modes.py; plugin contract
    = the public embulk-output-jdbc docs; reference transaction shape
    spi/OutputPlugin.java:56-76): bootstrap the table with mode=insert
    from `customer`, merge one change-set derived from `orders`
    (per-customer order totals replace acctbal; customers without orders
    carry through — cold buckets by reference), and retry the same
    txn_id to pin the resumed-transaction no-op. Final state ==
    anti-join ∪ change-set."""
    import tempfile

    from embulk_spark.sinks.jdbc_modes import JdbcModeTable

    work = tempfile.mkdtemp(prefix="embulk_spark_jdbcmode_")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("custkey"),
        F.col("c_name").alias("name"),
        F.round(F.col("c_acctbal").cast("double"), 2).alias("acctbal"),
    )
    table = JdbcModeTable(spark, f"{work}/t", n_buckets=8)
    table.write(cust, "insert", merge_keys=["custkey"], txn_id="bootstrap")
    inc = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("acctbal"))
        .select(
            F.col("o_custkey").cast("long").alias("custkey"),
            F.lit("merged").alias("name"),
            F.col("acctbal").cast("double"),
        )
    )
    table.write(inc, "merge", merge_keys=["custkey"], txn_id="delta-1")
    # duplicate delivery of the committed transaction: must skip
    table.write(inc, "merge", merge_keys=["custkey"], txn_id="delta-1")
    return table.load()


# Driver-rotation note (round 4): the correctness driver samples the
# FIRST 50 registry keys each round. Rounds 1-3 all drew from the same
# prefix, so 64 keys had only local-gate evidence (committed
# CORRECTNESS_LOCAL logs) and zero driver-side checks. queries() now
# lists those never-driver-checked keys FIRST (registry order preserved
# within each group) so CORRECTNESS_r04 finally covers them. Keys NOT
# reached by this round's 50-key sample (the rotation tail) go first
# next round — keep rotating until lifetime driver coverage is 129/129.
_DRIVER_ROTATION_FIRST = [
    # slots 1-3: the r04 driver hash-FAILs, re-adjudicated first (the
    # hugeint-floatification oracle bug is fixed; see the ::bigint
    # casts in their SQL)
    "substring_dedup", "corpus_export", "token_packing",
    # slots 4-20: the 17 keys never driver-checked in r01-r04 — closes
    # lifetime driver coverage at 132/132
    "anchor_topk", "bm25_scores", "bpe_merges", "bpe_encode",
    "data_quality", "filter_base64", "filter_gsub_cols",
    "filter_hash_cols", "filter_split_rows", "group_split",
    "heavy_hitters", "incremental_agg_view", "interval_window_counts",
    "jdbc_mode_merge", "length_quantiles", "parser_ltsv",
    "quality_classifier",
    # slot 21: the new real lossy-VP8 decode key (round 5)
    "multimodal_decode_vp8",
    # slots 22-25: the new real JPEG-family decode keys (round 5:
    # SOF9 sequential-arith + SOF10 progressive-arith + SOF3 lossless
    # + SOF1 12-bit)
    "multimodal_decode_arith", "multimodal_decode_prog_arith",
    "multimodal_decode_lossless", "multimodal_decode_12bit",
    # slot 26: AVIF metadata tier (real ISOBMFF/ispe walk, NULL mean)
    "multimodal_avif_meta",
    # slots 27-29: real animated GIF / WebP frame iteration (flat-map;
    # WebP in both lossless-VP8L and lossy-VP8 frame flavors)
    "multimodal_gif_frames", "multimodal_webp_frames",
    "multimodal_webp_lossy_frames",
    # slot 30: real resize (nearest re-encode, decode-adjudicated)
    "multimodal_resize_real",
    # slot 31+: round-5 late additions (this session)
    "hits_scores", "chunk_dedup", "weighted_sample", "feed_parse",
    "page_change_classify", "incremental_chunk_store",
    "replica_merkle_diff", "kmv_overlap", "dynamodb_stream_parse",
    "feed_refresh_candidates",
    # the rest of the r04 rotation, unchanged order
    "script_id", "corpus_mixture", "stratified_sample", "sample_exact_k",
    "boilerplate_lines", "paragraph_dedup", "benchmark_overlap",
    "incremental_neardup", "incremental_term_df", "simhash_near_dups",
    "ann_ivf_topk", "embedding_neardup_banded", "multimodal_decode_png",
    "multimodal_decode_jpeg", "multimodal_decode_progressive",
    "multimodal_decode_gif",
    "multimodal_decode_webp", "multimodal_decode_fake", "audio_meta",
    "audio_features", "join_shipping_priority", "dup_clusters",
    "dedup_keep_canonical", "sessionize_events", "session_stats",
    "asof_join_attrib", "avro_roundtrip", "msgpack_roundtrip",
    "warc_roundtrip", "binlog_route_latest", "debezium_parse",
    "dsir_weights", "lm_perplexity", "text_normalize",
    "html_extract", "vocab_topk", "ccnet_buckets",
    "doc_chunks", "semantic_dedup", "url_filter",
    "scd2_history", "scd2_join_asof", "pagerank", "bloom_dedup",
    "metrics_rollup", "hll_distinct", "link_extract",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    reg = _query_registry()
    first = {k: reg[k] for k in _DRIVER_ROTATION_FIRST}
    return {**first, **{k: v for k, v in reg.items() if k not in first}}


def _query_registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_latest_per_key": _q_cdc_latest_per_key,
        "cdc_patch_merge": _q_cdc_patch_merge,
        "cdc_apply_upsert": _q_cdc_apply_upsert,
        "cdc_ingest_metrics": _q_cdc_ingest_metrics,
        "cdc_changes_feed": _q_cdc_changes_feed,
        "cdc_replicate": _q_cdc_replicate,
        "cdc_snapshot_diff": _q_cdc_snapshot_diff,
        "maxwell_parse": _q_maxwell_parse,
        "canal_parse": _q_canal_parse,
        "wal2json_parse": _q_wal2json_parse,
        "stream_enrich_join": _q_stream_enrich_join,
        "lake_bulk_import": _q_lake_bulk_import,
        "lake_clone": _q_lake_clone,
        "lake_scan_pruned": _q_lake_scan_pruned,
        "lake_lookup_bloom": _q_lake_lookup_bloom,
        "lake_key_history": _q_lake_key_history,
        "lake_scan_semi": _q_lake_scan_semi,
        "lake_zorder_scan": _q_lake_zorder_scan,
        "filter_remove_columns": _q_filter_remove_columns,
        "filter_rename": _q_filter_rename,
        "filter_row_predicate": _q_filter_row_predicate,
        "filter_column_ops": _q_filter_column_ops,
        "filter_typecast": _q_filter_typecast,
        "filter_add_time": _q_filter_add_time,
        "filter_expand_json": _q_filter_expand_json,
        "filter_flatten_json": _q_filter_flatten_json,
        "parser_regexp": _q_parser_regexp,
        "parser_poslen": _q_parser_poslen,
        "parser_grok": _q_parser_grok,
        "parser_xml": _q_parser_xml,
        "filter_join_file": _q_filter_join_file,
        "filter_eval": _q_filter_eval,
        "incremental_cursor": _q_incremental_cursor,
        "coerce_setters": _q_coerce_setters,
        "preview_sample": _q_preview_sample,
        "parse_json_column": _q_parse_json_column,
        "timestamp_canonical": _q_timestamp_canonical,
        "dedup_exact": _q_dedup_exact,
        "text_quality": _q_text_quality,
        "lang_id": _q_lang_id,
        "doc_fingerprint": _q_doc_fingerprint,
        "token_stats": _q_token_stats,
        "url_canonicalize": _q_url_canonicalize,
        "robots_permissions": _q_robots_permissions,
        "crawl_frontier": _q_crawl_frontier,
        "recrawl_schedule": _q_recrawl_schedule,
        "pii_redact": _q_pii_redact,
        "repetition_filters": _q_repetition_filters,
        "c4_filters": _q_c4_filters,
        "gopher_filters": _q_gopher_filters,
        "script_id": _q_script_id,
        "corpus_mixture": _q_corpus_mixture,
        "stratified_sample": _q_stratified_sample,
        "sample_exact_k": _q_sample_exact_k,
        "boilerplate_lines": _q_boilerplate_lines,
        "paragraph_dedup": _q_paragraph_dedup,
        "benchmark_overlap": _q_benchmark_overlap,
        "minhash_signatures": _q_minhash_signatures,
        "minhash_near_dups": _q_minhash_near_dups,
        "incremental_neardup": _q_incremental_neardup,
        "incremental_term_df": _q_incremental_term_df,
        "ngram_jaccard": _q_ngram_jaccard,
        "simhash": _q_simhash,
        "simhash_near_dups": _q_simhash_near_dups,
        "ann_cosine_topk": _q_ann_cosine_topk,
        "ann_lsh_topk": _q_ann_lsh_topk,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "stateful_url_changelog": _q_stateful_url_changelog,
        "guess_cell_types": _q_guess_cell_types,
        "embedding_neardup": _q_embedding_neardup,
        "embedding_neardup_banded": _q_embedding_neardup_banded,
        "multimodal_sniff": _q_multimodal_sniff,
        "multimodal_decode": _q_multimodal_decode,
        "multimodal_decode_png": _q_multimodal_decode_png,
        "multimodal_decode_jpeg": _q_multimodal_decode_jpeg,
        "multimodal_decode_progressive": _q_multimodal_decode_progressive,
        "multimodal_decode_arith": _q_multimodal_decode_arith,
        "multimodal_decode_prog_arith": _q_multimodal_decode_prog_arith,
        "multimodal_decode_lossless": _q_multimodal_decode_lossless,
        "multimodal_decode_12bit": _q_multimodal_decode_12bit,
        "multimodal_avif_meta": _q_multimodal_avif_meta,
        "multimodal_gif_frames": _q_multimodal_gif_frames,
        "multimodal_webp_frames": _q_multimodal_webp_frames,
        "multimodal_webp_lossy_frames": _q_multimodal_webp_lossy_frames,
        "multimodal_resize_real": _q_multimodal_resize_real,
        "multimodal_decode_gif": _q_multimodal_decode_gif,
        "multimodal_decode_webp": _q_multimodal_decode_webp,
        "multimodal_decode_vp8": _q_multimodal_decode_vp8,
        "multimodal_decode_fake": _q_multimodal_decode_fake,
        "multimodal_frames": _q_multimodal_frames,
        "audio_meta": _q_audio_meta,
        "audio_features": _q_audio_features,
        "agg_pricing_summary": _q_agg_pricing_summary,
        "join_revenue_topk": _q_join_revenue_topk,
        "join_shipping_priority": _q_join_shipping_priority,
        "window_topk_per_group": _q_window_topk_per_group,
        "dup_clusters": _q_dup_clusters,
        "dedup_keep_canonical": _q_dedup_keep_canonical,
        "sessionize_events": _q_sessionize_events,
        "session_stats": _q_session_stats,
        "asof_join_attrib": _q_asof_join_attrib,
        "avro_roundtrip": _q_avro_roundtrip,
        "msgpack_roundtrip": _q_msgpack_roundtrip,
        "warc_roundtrip": _q_warc_roundtrip,
        "binlog_route_latest": _q_binlog_route_latest,
        "debezium_parse": _q_debezium_parse,
        "dsir_weights": _q_dsir_weights,
        "lm_perplexity": _q_lm_perplexity,
        "substring_dedup": _q_substring_dedup,
        "text_normalize": _q_text_normalize,
        "html_extract": _q_html_extract,
        "vocab_topk": _q_vocab_topk,
        "ccnet_buckets": _q_ccnet_buckets,
        "corpus_export": _q_corpus_export,
        "doc_chunks": _q_doc_chunks,
        "token_packing": _q_token_packing,
        "semantic_dedup": _q_semantic_dedup,
        "url_filter": _q_url_filter,
        "scd2_history": _q_scd2_history,
        "scd2_join_asof": _q_scd2_join_asof,
        "pagerank": _q_pagerank,
        "hits_scores": _q_hits,
        "chunk_dedup": _q_chunk_dedup,
        "weighted_sample": _q_weighted_sample,
        "feed_parse": _q_feed_parse,
        "page_change_classify": _q_page_change_classify,
        "incremental_chunk_store": _q_incremental_chunk_store,
        "replica_merkle_diff": _q_replica_merkle_diff,
        "kmv_overlap": _q_kmv_overlap,
        "dynamodb_stream_parse": _q_dynamodb_stream_parse,
        "feed_refresh_candidates": _q_feed_refresh,
        "bloom_dedup": _q_bloom_dedup,
        "metrics_rollup": _q_metrics_rollup,
        "hll_distinct": _q_hll_distinct,
        "link_extract": _q_link_extract,
        "anchor_topk": _q_anchor_topk,
        "length_quantiles": _q_length_quantiles,
        "interval_window_counts": _q_interval_window_counts,
        "data_quality": _q_data_quality,
        "bm25_scores": _q_bm25_scores,
        "heavy_hitters": _q_heavy_hitters,
        "group_split": _q_group_split,
        "quality_classifier": _q_quality_classifier,
        "bpe_merges": _q_bpe_merges,
        "bpe_encode": _q_bpe_encode,
        "incremental_agg_view": _q_incremental_agg_view,
        "jdbc_mode_merge": _q_jdbc_mode_merge,
        "filter_base64": _q_filter_base64,
        "filter_hash_cols": _q_filter_hash_cols,
        "filter_gsub_cols": _q_filter_gsub_cols,
        "filter_split_rows": _q_filter_split_rows,
        "parser_ltsv": _q_parser_ltsv,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles (same aliases, same values)
# ---------------------------------------------------------------------------

_LATEST_CTE = """
WITH latest AS (
  SELECT * FROM (
    SELECT user_id, event_id, event_type, value, ts,
           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn,
           count(*) OVER (PARTITION BY user_id) cnt
    FROM events
  ) WHERE rn = 1
)
"""

def _bpe_oracle() -> str:
    """Single source of truth: the operator module generates its own
    DuckDB mirror (operators/bpe.py::bpe_train_oracle_sql)."""
    from embulk_spark.operators.bpe import bpe_train_oracle_sql

    return bpe_train_oracle_sql(n_merges=8, min_freq=2)


def _minhash_sig_sql(k: int) -> str:
    """DuckDB expression for the engine's exact minhash signature: same
    md5-derived 32-bit shingle hash, same affine permutation constants
    (single source of truth: operators/dedup.py::minhash_params)."""
    from embulk_spark.operators.dedup import MINHASH_P, minhash_params

    a, b = minhash_params(k)
    h = "(('0x' || left(md5(x), 8))::bigint)"
    elems = ", ".join(
        f"list_min([(({a[i]} * {h} + {b[i]}) % {MINHASH_P}) FOR x IN sh])"
        for i in range(k)
    )
    return f"[{elems}]"


_MINHASH_CTE = """
WITH w AS (
  SELECT doc_id,
         list_distinct([array_to_string(ws[j+1:j+3], ' ') FOR j IN range(len(ws)-2)]) sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') ws FROM documents)
  WHERE len(ws) >= 3
),
s AS (
  SELECT doc_id, sh, {sig} sig
  FROM w WHERE len(sh) > 0
),
b AS (
  SELECT doc_id, sh, sig, i AS band_idx,
         md5(array_to_string(sig[i*{rpb}+1:(i+1)*{rpb}], '|')) AS band
  FROM s, range({bands}) t(i)
),
cand AS (
  SELECT DISTINCT a.doc_id id_a, c.doc_id id_b,
         a.sig sig_a, c.sig sig_b, a.sh sh_a, c.sh sh_b
  FROM b a JOIN b c
    ON a.band_idx = c.band_idx AND a.band = c.band AND a.doc_id < c.doc_id
)
"""


#: DuckDB mirror of operators/dedup.py::_simhash64_py — identical ASCII-\s+
#: distinct tokens, identical per-token uint64 (first 16 md5 hex chars),
#: identical bit votes; the hugeint arithmetic reproduces the signed-64
#: wraparound of the stored signature.
_SIMHASH_CTE = r"""
WITH toks AS (
  SELECT doc_id,
         list_distinct(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                   x -> x <> '')) AS tks
  FROM documents
),
bits AS (
  SELECT doc_id, r.i AS i,
         sum(CASE WHEN ((('0x' || left(md5(u.tok), 16))::ubigint >> r.i) & 1) = 1
                  THEN 1 ELSE -1 END) AS acc
  FROM toks, unnest(tks) AS u(tok), range(64) r(i)
  GROUP BY doc_id, r.i
),
rawsig AS (
  SELECT doc_id,
         sum(CASE WHEN acc > 0 THEN (1::hugeint << i) ELSE 0::hugeint END) AS s
  FROM bits GROUP BY doc_id
),
sig AS (
  SELECT d.doc_id,
         (CASE WHEN coalesce(r.s, 0::hugeint) >= 9223372036854775808::hugeint
               THEN r.s - 18446744073709551616::hugeint
               ELSE coalesce(r.s, 0::hugeint) END)::bigint AS simhash
  FROM documents d LEFT JOIN rawsig r ON d.doc_id = r.doc_id
)
"""


def _cc_oracle_sql() -> str:
    """Near-dup pairs (the minhash CTE at k=16/4 bands, threshold 0.5)
    symmetrized into an edge list, plus the transitive closure ``reach``:
    (id, comp) for every label reachable from id. min(comp) per id is the
    component — the independent check of operators/cluster.py's min-label
    propagation."""
    return (
        _MINHASH_CTE.replace("WITH w AS", "WITH RECURSIVE w AS", 1).format(
            sig=_minhash_sig_sql(16), rpb=4, bands=4
        )
        + """
        , pairs AS (
          SELECT id_a, id_b FROM cand
          WHERE len([i FOR i IN range(16) IF sig_a[i+1] = sig_b[i+1]]) / 16.0 >= 0.5
        ),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs
        ),
        reach(id, comp) AS (
          SELECT a, a FROM edges
          UNION
          SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.id
        )
        """
    )


def _pagerank_oracle_sql(iters: int = 5, damping: float = 0.85) -> str:
    """Unroll ``iters`` damped-PageRank rounds as chained CTEs (the
    semantic_dedup Lloyd-unroll technique) over the customer→supplier
    edge list; identical operation order to operators/graph.py so the
    doubles agree to well past the 12-decimal rounding."""
    d = repr(damping)
    head = """
WITH edges AS (
  SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
deg AS (SELECT src, count(*)::double AS od FROM edges GROUP BY src),
nn AS (SELECT count(*)::double AS n FROM nodes),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)
"""
    steps = []
    for i in range(1, iters + 1):
        prev = f"r{i - 1}"
        steps.append(f"""
r{i} AS (
  SELECT no.node,
         (1 - {d}) / (SELECT n FROM nn)
         + {d} * (COALESCE(c.inflow, 0)
                  + (SELECT COALESCE(sum(r.rank), 0) FROM {prev} r
                     LEFT JOIN deg dg ON dg.src = r.node WHERE dg.src IS NULL)
                    / (SELECT n FROM nn)) AS rank
  FROM nodes no
  LEFT JOIN (
    SELECT e.dst AS node, sum(r.rank / dg.od) AS inflow
    FROM {prev} r JOIN deg dg ON dg.src = r.node JOIN edges e ON e.src = r.node
    GROUP BY e.dst
  ) c ON c.node = no.node
)""")
    return head + "," + ",".join(steps)


def _chunk_side_sql(tag: str, src: str) -> str:
    """One snapshot side of the page-change oracle: the chunk pipeline
    from the chunk_dedup oracle (same cut rule, window 16 / divisor 64
    / salt 'cdcc:'), rolled up to per-(doc, chunk-md5) counts."""
    return f"""
d{tag} AS (
  SELECT doc_id, text, length(text) AS L FROM {src}
  WHERE text IS NOT NULL AND length(text) >= 1
),
cut{tag} AS (
  SELECT d.doc_id, t.i AS e
  FROM d{tag} d, UNNEST(generate_series(16, d.L - 1)) AS t(i)
  WHERE ('0x' || substr(md5('cdcc:' || substr(d.text, t.i - 15, 16)), 1, 8))::bigint % 64 = 0
),
end{tag} AS (
  SELECT doc_id, e FROM cut{tag}
  UNION ALL SELECT doc_id, L FROM d{tag}
),
ch{tag} AS (
  SELECT doc_id, e, lag(e, 1, 0) OVER (PARTITION BY doc_id ORDER BY e) AS s
  FROM end{tag}
),
grp{tag} AS (
  SELECT c.doc_id, md5(substr(d.text, c.s + 1, c.e - c.s)) AS h,
         count(*)::bigint AS cnt, max(c.e - c.s) AS ln
  FROM ch{tag} c JOIN d{tag} d ON d.doc_id = c.doc_id
  GROUP BY c.doc_id, md5(substr(d.text, c.s + 1, c.e - c.s))
)"""


def _page_change_oracle_sql() -> str:
    return (
        """
WITH newt AS (
  SELECT doc_id,
         CASE doc_id % 3
           WHEN 0 THEN text
           WHEN 1 THEN substr(text, 1, 40) || '[rev]' || substr(text, 41)
           ELSE translate(text, 'aeiou', '01234')
         END AS text
  FROM documents
),"""
        + _chunk_side_sql("_o", "documents")
        + ","
        + _chunk_side_sql("_n", "newt")
        + """,
j AS (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         COALESCE(o.cnt, 0) AS c_old, COALESCE(n.cnt, 0) AS c_new,
         COALESCE(o.ln, n.ln) AS ln
  FROM grp_o o FULL OUTER JOIN grp_n n
    ON n.doc_id = o.doc_id AND n.h = o.h
),
pk AS (
  SELECT doc_id,
         sum(c_old * ln)::bigint AS old_chars,
         sum(c_new * ln)::bigint AS new_chars,
         sum(least(c_old, c_new) * ln)::bigint AS shared_chars
  FROM j GROUP BY doc_id
)
SELECT doc_id, old_chars, new_chars, shared_chars,
       CASE WHEN new_chars > 0
            THEN round(1.0 - shared_chars::double / new_chars::double, 12)
            ELSE 1.0 END AS change_ratio,
       CASE WHEN shared_chars = old_chars AND shared_chars = new_chars
              THEN 'unchanged'
            WHEN new_chars = 0 THEN 'major'
            WHEN shared_chars * 10 >= new_chars * 7 THEN 'minor'
            ELSE 'major' END AS change_class
FROM pk
"""
    )


def _hits_oracle_sql(iters: int = 4) -> str:
    """Unroll ``iters`` HITS rounds as chained CTEs over the same
    customer→supplier edge list as the pagerank oracle; identical
    operation order (in/out sum → L2 normalize per half-step) to
    operators/graph.py::hits so the doubles agree well past the
    12-decimal rounding."""
    head = """
WITH edges AS (
  SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
h0 AS (SELECT node, 1.0::double AS hub FROM nodes)
"""
    # DuckDB inlines plain CTEs, so every reference re-expands its whole
    # upstream chain: keep each CTE referenced ONCE downstream (norm as
    # its own 1-row CTE entering via cross join), giving ~4^iters base
    # expansions — the same budget class as the driver-proven pagerank
    # unroll (3^5). Scalar-subquery norms (3 refs/step) blow up to
    # 9^iters and exhaust file handles.
    steps = []
    for i in range(1, iters + 1):
        steps.append(f"""
a{i}r AS (
  SELECT e.dst AS node, sum(h.hub) AS x
  FROM h{i - 1} h JOIN edges e ON e.src = h.node GROUP BY e.dst
),
a{i}n AS (SELECT sqrt(sum(x * x)) AS nrm FROM a{i}r),
a{i} AS (
  SELECT no.node,
         CASE WHEN n.nrm > 0 THEN COALESCE(r.x, 0) / n.nrm
              ELSE 0.0 END AS auth
  FROM nodes no LEFT JOIN a{i}r r ON r.node = no.node CROSS JOIN a{i}n n
),
h{i}r AS (
  SELECT e.src AS node, sum(a.auth) AS x
  FROM a{i} a JOIN edges e ON e.dst = a.node GROUP BY e.src
),
h{i}n AS (SELECT sqrt(sum(x * x)) AS nrm FROM h{i}r),
h{i} AS (
  SELECT no.node,
         CASE WHEN n.nrm > 0 THEN COALESCE(r.x, 0) / n.nrm
              ELSE 0.0 END AS hub
  FROM nodes no LEFT JOIN h{i}r r ON r.node = no.node CROSS JOIN h{i}n n
)""")
    return head + "," + ",".join(steps) + f"""
SELECT h.node, round(h.hub, 12) AS hub, round(a.auth, 12) AS auth
FROM h{iters} h JOIN a{iters} a ON a.node = h.node
"""


#: per-event session assignment: lag + running sum, inclusive gap boundary
#: (diff > gap starts a new session) — the exact semantics of
#: operators/sessions.py::sessionize and Spark's session_window
_SESSION_CTE = """
WITH s AS (
  SELECT event_id, user_id, ts,
         sum(CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::bigint
           AS session_idx
  FROM (
    SELECT event_id, user_id, ts,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
  )
)
"""


def _guess_cell_types_sql() -> str:
    from embulk_spark.functions.guess import guess_type_sql

    return f"""
    SELECT event_id,
           {guess_type_sql('event_type')} AS t_event_type,
           {guess_type_sql('user_id::varchar')} AS t_user_id,
           {guess_type_sql('value::varchar')} AS t_value,
           {guess_type_sql('props')} AS t_props
    FROM events
    """


def _semantic_dedup_sql(k: int = 8, dim: int = 64, threshold: float = 0.92) -> str:
    """Unrolled DuckDB mirror of operators/semdedup.py with n_iter=2:
    init c0 = k lowest-id vectors; assign → per-dim avg rounded to 9 dp
    (c1), assign → c2; final assignment with c2; canonical = min id per
    cluster; cosine + keep verdict. Assignment argmax uses the identical
    norm-scaled dot and lowest-cid tie-break."""
    avg_terms = ", ".join(f"round(avg(v[{i + 1}]), 9)" for i in range(dim))

    def assign(src: str, cents: str) -> str:
        return f"""(
          SELECT vec_id, v, cid FROM (
            SELECT {src}.vec_id, {src}.v, {cents}.cid,
                   row_number() OVER (
                     PARTITION BY {src}.vec_id
                     ORDER BY list_dot_product({src}.v, {cents}.c)
                              / sqrt(list_dot_product({cents}.c, {cents}.c)) DESC,
                              {cents}.cid ASC) AS rn
            FROM {src} CROSS JOIN {cents}
          ) WHERE rn = 1
        )"""

    return f"""
        WITH e AS (SELECT vec_id, embedding::double[] AS v FROM embeddings),
        c0 AS (
          SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cid, v AS c
          FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k})
        ),
        a1 AS {assign('e', 'c0')},
        c1 AS (SELECT cid, [{avg_terms}] AS c FROM a1 GROUP BY cid),
        a2 AS {assign('e', 'c1')},
        c2 AS (SELECT cid, [{avg_terms}] AS c FROM a2 GROUP BY cid),
        fin AS {assign('e', 'c2')},
        canon AS (SELECT cid, min(vec_id) AS canon_id FROM fin GROUP BY cid),
        cvec AS (
          SELECT canon.cid, canon.canon_id, fin.v AS cv
          FROM canon JOIN fin ON fin.vec_id = canon.canon_id
        ),
        scored AS (
          SELECT fin.vec_id, fin.cid AS cluster, cvec.canon_id,
                 round(list_dot_product(fin.v, cvec.cv)
                       / (sqrt(list_dot_product(fin.v, fin.v))
                          * sqrt(list_dot_product(cvec.cv, cvec.cv))), 6) AS cos_canon
          FROM fin JOIN cvec ON fin.cid = cvec.cid
        )
        SELECT vec_id, cluster, canon_id, cos_canon,
               (vec_id = canon_id OR cos_canon < {threshold}) AS keep
        FROM scored
        """


#: the hashed add-alpha bigram LM scoring query, shared by the
#: lm_perplexity oracle and the ccnet_buckets oracle (which wraps it)
_LM_SQL = r"""
        SELECT g.doc_id, count(*) AS n_bigrams,
               round(sum(-(ln(coalesce(c_bi, 0) + 1.0)
                           - ln(coalesce(c_ctx, 0) + 4096.0)))
                     / count(*) / ln(2.0), 6) AS bits_per_bigram
        FROM (
          SELECT doc_id, is_target,
                 ('0x' || left(md5('lmctx:' || ws[i]), 8))::bigint
                   % 1024 AS hp,
                 ('0x' || left(md5('lmbi:' || ws[i] || ' ' || ws[i+1]), 8))::bigint
                   % 4096 AS hb
          FROM (
            SELECT doc_id, (lang = 'en') AS is_target,
                   list_filter(regexp_split_to_array(lower(text), '\s+'),
                               x -> x <> '') AS ws
            FROM documents
          ) w, unnest(range(1, len(ws))) AS t(i)
          WHERE len(ws) >= 2
        ) g
        LEFT JOIN (
          SELECT hp, count(*) AS c_ctx
          FROM (
            SELECT ('0x' || left(md5('lmctx:' || ws[i]), 8))::bigint
                     % 1024 AS hp
            FROM (
              SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS ws
              FROM documents WHERE lang = 'en'
            ) w2, unnest(range(1, len(ws))) AS t(i)
            WHERE len(ws) >= 2
          ) GROUP BY hp
        ) c_ctx USING (hp)
        LEFT JOIN (
          SELECT hb, count(*) AS c_bi
          FROM (
            SELECT ('0x' || left(md5('lmbi:' || ws[i] || ' ' || ws[i+1]), 8))::bigint
                     % 4096 AS hb
            FROM (
              SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS ws
              FROM documents WHERE lang = 'en'
            ) w3, unnest(range(1, len(ws))) AS t(i)
            WHERE len(ws) >= 2
          ) GROUP BY hb
        ) c_bi USING (hb)
        GROUP BY g.doc_id
"""


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_latest_per_key": _LATEST_CTE
        + """
        SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
               value AS last_value, epoch_us(ts) AS last_ts_us, cnt AS n_events
        FROM latest
        """,
        "cdc_apply_upsert": _LATEST_CTE
        + """
        SELECT user_id, value AS last_value, epoch_us(ts) AS last_ts_us
        FROM latest WHERE event_type <> 'error'
        """,
        "cdc_patch_merge": """
        WITH ev AS (
          SELECT user_id AS uid, event_id AS ord,
                 CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
                 CASE WHEN event_type = 'view' THEN value END AS view_val,
                 CASE WHEN event_type = 'purchase' THEN value END AS purchase_val,
                 CASE WHEN event_type = 'click' THEN props END AS click_props
          FROM events
        ), g AS (
          SELECT uid,
                 max(ord) FILTER (WHERE op = 'D') AS dord,
                 max(ord) FILTER (WHERE op = 'U') AS uord,
                 max(ord) AS last_ord,
                 max_by(view_val, ord)
                   FILTER (WHERE op = 'U' AND view_val IS NOT NULL) AS vv,
                 max(ord) FILTER (WHERE op = 'U' AND view_val IS NOT NULL) AS vo,
                 max_by(purchase_val, ord)
                   FILTER (WHERE op = 'U' AND purchase_val IS NOT NULL) AS pv,
                 max(ord) FILTER (WHERE op = 'U' AND purchase_val IS NOT NULL) AS po,
                 max_by(click_props, ord)
                   FILTER (WHERE op = 'U' AND click_props IS NOT NULL) AS cv,
                 max(ord) FILTER (WHERE op = 'U' AND click_props IS NOT NULL) AS co
          FROM ev GROUP BY uid
        )
        SELECT uid,
               CASE WHEN vo IS NOT NULL AND (dord IS NULL OR vo > dord)
                    THEN vv END AS view_val,
               CASE WHEN po IS NOT NULL AND (dord IS NULL OR po > dord)
                    THEN pv END AS purchase_val,
               CASE WHEN co IS NOT NULL AND (dord IS NULL OR co > dord)
                    THEN cv END AS click_props,
               (dord IS NOT NULL AND (uord IS NULL OR uord < dord)) AS is_deleted,
               last_ord
        FROM g
        """,
        "cdc_ingest_metrics": """
        SELECT event_type,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               sum(value::decimal(18,4))::double AS sum_value,
               epoch_us(max(ts)) AS max_ts_us
        FROM events GROUP BY event_type
        """,
        "filter_remove_columns": """
        SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
        """,
        "filter_rename": """
        SELECT event_id, event_type AS type, value AS v FROM events
        """,
        "filter_row_predicate": """
        SELECT event_id, event_type, value FROM events
        WHERE starts_with(event_type, 'p') AND value >= 50.0
          AND NOT regexp_matches(props, '"k": 1[0-9]}')
        """,
        "filter_column_ops": """
        SELECT event_id, event_type AS kind, 'cc' AS site,
               event_type AS kind_copy
        FROM events
        """,
        "filter_typecast": """
        SELECT event_id,
               CASE WHEN isnan(value) OR NOT isfinite(value) THEN NULL
                    ELSE round(value, 0)::bigint END AS value,
               (epoch_us(ts) // 1000000)::bigint AS ts,
               CASE WHEN event_type IN ('true','True','TRUE','yes','Yes','YES',
                                        't','T','y','Y','on','On','ON','1')
                    THEN TRUE ELSE NULL END AS event_type
        FROM events
        """,
        "filter_add_time": """
        SELECT event_id, epoch_us(ts) AS etime_us,
               epoch_us(TIMESTAMP '2024-06-01 12:00:00') AS batch_time_us
        FROM events
        """,
        "filter_expand_json": """
        SELECT event_id, json_extract(props, '$.k')::bigint AS k FROM events
        """,
        "parser_regexp": """
        WITH lines AS (
          SELECT doc_id::varchar || ' ' || lang || ' ' || n_chars::varchar
                 AS value
          FROM documents
        )
        SELECT regexp_extract(value, '^(\\d+) ([a-z]+) (\\d+)$', 1)::bigint
                 AS doc_id,
               regexp_extract(value, '^(\\d+) ([a-z]+) (\\d+)$', 2) AS lang,
               regexp_extract(value, '^(\\d+) ([a-z]+) (\\d+)$', 3)::bigint
                 AS n_chars
        FROM lines
        WHERE regexp_matches(value, '^(\\d+) ([a-z]+) (\\d+)$')
        """,
        # parser_poslen: rebuild the fixed-width line with printf, slice
        # with substring (1-based), trim pads, cast back — same
        # null-on-bad-numeric policy both sides (input here is clean)
        "parser_poslen": """
        WITH lines AS (
          SELECT printf('%08d%-6s%010d', doc_id, lang, n_chars) AS value
          FROM documents
        )
        SELECT trim(substring(value, 1, 8))::bigint AS doc_id,
               trim(substring(value, 9, 6)) AS lang,
               trim(substring(value, 15, 10))::bigint AS n_chars
        FROM lines
        """,
        # parser_grok: recompute the rendered access-line fields directly
        "parser_grok": """
        SELECT '10.0.0.' || (doc_id % 256)::varchar AS clientip,
               'GET' AS verb,
               '/doc/' || doc_id::varchar AS path,
               n_chars AS size
        FROM documents
        """,
        # parser_xml: @id attribute + children; every 5th row has no
        # <views> child → null
        "parser_xml": """
        SELECT doc_id AS id, lang,
               CASE WHEN doc_id % 5 <> 0 THEN n_chars END AS views
        FROM documents
        """,
        "filter_eval": """
        SELECT event_id, value,
               round(value * value, 4) AS value_sq,
               upper(event_type) AS kind
        FROM events
        WHERE value > 0 AND event_type IN ('click', 'view')
        """,
        "filter_flatten_json": """
        SELECT event_id, 'a' AS k, event_id AS v FROM events
        UNION ALL
        SELECT event_id, 'b' AS k, event_id * 2 AS v FROM events
        """,
        # incremental_cursor: strictly-after tuple comparison, same
        # lexicographic expansion
        "incremental_cursor": """
        SELECT event_id, epoch_us(ts) AS ts_us, event_type
        FROM events
        WHERE ts > TIMESTAMP '2024-01-15 12:00:00'
           OR (ts = TIMESTAMP '2024-01-15 12:00:00' AND event_id > 0)
        """,
        # filter_join_file: LEFT JOIN against the inline master; the
        # duplicate 'en' row loses first-wins (min over payload struct)
        "filter_join_file": """
        WITH master(code, family) AS (
          VALUES ('en', 'germanic'), ('de', 'germanic'),
                 ('fr', 'romance'), ('es', 'romance'),
                 ('en', 'zz-dup-loses')
        ), dedup AS (
          SELECT code, min(family) AS family FROM master GROUP BY code
        )
        SELECT d.doc_id, d.lang, m.family AS m_family
        FROM documents d LEFT JOIN dedup m ON d.lang = m.code
        """,
        "coerce_setters": """
        SELECT event_id,
               CASE WHEN isnan(value) OR NOT isfinite(value) THEN NULL
                    ELSE round(value, 0)::bigint END AS value_as_long,
               value > 0.0 AS value_as_bool,
               CASE WHEN regexp_matches(event_type, '^[+-]?\\d+$')
                    THEN event_type::bigint ELSE NULL END AS type_as_long,
               CASE WHEN event_type IN ('true','True','TRUE','yes','Yes','YES',
                                        't','T','y','Y','on','On','ON','1')
                    THEN TRUE ELSE NULL END AS type_as_bool,
               (epoch_us(ts) // 1000000)::bigint AS ts_epoch_sec,
               CASE WHEN value > 100 THEN 1 ELSE 0 END::bigint AS gt100_as_long
        FROM events
        """,
        "preview_sample": """
        SELECT event_id, user_id, event_type, value, props, epoch_us(ts) AS ts_us
        FROM events ORDER BY event_id LIMIT 15
        """,
        "parse_json_column": """
        SELECT event_id, json_extract(props, '$.k')::bigint AS props_k FROM events
        """,
        "timestamp_canonical": """
        SELECT event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') ||
               CASE WHEN epoch_us(ts) % 1000000 <> 0
                    THEN '.' || lpad((epoch_us(ts) % 1000000)::varchar, 6, '0')
                    ELSE '' END || ' UTC' AS ts_canon
        FROM events
        """,
        "dedup_exact": """
        SELECT md5(text) AS text_md5, min(doc_id) AS keeper_id,
               count(*) AS n_docs
        FROM documents GROUP BY md5(text)
        """,
        "text_quality": """
        SELECT doc_id,
               length(text) AS n_chars_m,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
               round(length(text)::double / len(regexp_split_to_array(trim(text), '\\s+')), 4) AS mean_token_len,
               round(length(regexp_replace(text, '[^.!?,;:]', '', 'g'))::double / length(text), 6) AS punct_ratio,
               round(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))::double / length(text), 6) AS alpha_ratio,
               round((len(regexp_extract_all(lower(text), '\\bthe\\b'))
                      + len(regexp_extract_all(lower(text), '\\band\\b'))
                      + len(regexp_extract_all(lower(text), '\\bof\\b')))::double
                     / len(regexp_split_to_array(trim(text), '\\s+')), 6) AS stopword_ratio
        FROM documents
        """,
        "lang_id": """
        WITH sc AS (
          SELECT doc_id,
            len(regexp_extract_all(lower(text), '\\bthe\\b')) + len(regexp_extract_all(lower(text), '\\band\\b')) + len(regexp_extract_all(lower(text), '\\bof\\b')) AS s_en,
            len(regexp_extract_all(lower(text), '\\bder\\b')) + len(regexp_extract_all(lower(text), '\\bund\\b')) + len(regexp_extract_all(lower(text), '\\bist\\b')) AS s_de,
            len(regexp_extract_all(lower(text), '\\ble\\b')) + len(regexp_extract_all(lower(text), '\\bla\\b')) + len(regexp_extract_all(lower(text), '\\bet\\b')) AS s_fr
          FROM documents
        )
        SELECT doc_id,
               CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_fr THEN 'en'
                    WHEN s_de > 0 AND s_de >= s_fr THEN 'de'
                    WHEN s_fr > 0 THEN 'fr'
                    ELSE 'unknown' END AS lang_pred
        FROM sc
        """,
        "doc_fingerprint": """
        SELECT doc_id,
               md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
        FROM documents
        """,
        "url_canonicalize": """
        WITH u AS (
          SELECT doc_id,
            (CASE doc_id % 3 WHEN 0 THEN 'HTTP://' WHEN 1 THEN 'https://' ELSE 'HTTPS://' END)
            || 'Host' || (doc_id % 40)::varchar || '.Sub.Example.ORG'
            || (CASE doc_id % 4 WHEN 0 THEN ':80' WHEN 1 THEN ':443' WHEN 2 THEN ':8080' ELSE '' END)
            || (CASE doc_id % 5 WHEN 0 THEN '/' WHEN 1 THEN '' ELSE '/P' || (doc_id % 9)::varchar END)
            || (CASE doc_id % 6 WHEN 0 THEN '#Frag' ELSE '' END) AS url
          FROM documents
        ),
        c AS (
          SELECT doc_id, url,
            regexp_replace(
              regexp_replace(
                lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)),
                '^(https://[^/:]*):443$', '\\1'),
              '^(http://[^/:]*):80$', '\\1')
            || regexp_replace(
                 regexp_replace(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', ''),
                 '#.*$', '') AS joined,
            lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1)) AS host
          FROM u
        )
        SELECT doc_id, url,
               regexp_replace(joined, '^([a-z][a-z0-9+.-]*://[^/?#]+)/$', '\\1') AS canon_url,
               host,
               regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain
        FROM c
        """,
        "pii_redact": """
        WITH p AS (
          SELECT doc_id,
            text
            || (CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id::varchar || '@Example.com now' ELSE '' END)
            || (CASE WHEN doc_id % 4 = 0 THEN ' call +1 (555) 123-4567 ok' ELSE '' END)
            || (CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.' || (doc_id % 256)::varchar || '.7' ELSE '' END) AS t
          FROM documents
        )
        SELECT doc_id,
          md5(regexp_replace(regexp_replace(regexp_replace(t,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
              '\\+?\\d{1,3}[-. (]{1,2}\\d{3}[-. )]{1,2}\\d{3}[-. ]?\\d{4}', '<PHONE>', 'g'),
              '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IPV4>', 'g')) AS redacted_md5,
          len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
          len(regexp_extract_all(t, '\\+?\\d{1,3}[-. (]{1,2}\\d{3}[-. )]{1,2}\\d{3}[-. ]?\\d{4}')) AS n_phone,
          len(regexp_extract_all(t, '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')) AS n_ipv4
        FROM p
        """,
        # c4_filters: the SAME line/page rules as textops.c4_cols, line
        # arrays via DuckDB list lambdas; sentence count = terminal-mark
        # splits minus one (both engines agree on '' → 0 sentences)
        "c4_filters": r"""
        WITH l AS (
          SELECT doc_id, text,
            list_filter(
              list_transform(string_split(text, chr(10)), x -> trim(x)),
              x -> x <> ''
                AND regexp_matches(x, '[.!?"”]$')
                AND len(list_filter(string_split_regex(x, '\s+'),
                                    w -> w <> '')) >= 5
                AND NOT contains(lower(x), 'javascript')
                AND NOT contains(lower(x), 'terms of use')
                AND NOT contains(lower(x), 'privacy policy')
                AND NOT contains(lower(x), 'cookie policy')
                AND NOT contains(lower(x), 'uses cookies')
            ) AS kept
          FROM documents
        ), c AS (
          -- DuckDB's array_to_string([]) is NULL; Spark's array_join is ''
          SELECT doc_id,
                 coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
                 len(kept) AS n_kept_lines,
                 len(string_split_regex(
                   coalesce(array_to_string(kept, chr(10)), ''),
                   '[.!?]')) - 1 AS n_sentences,
                 (contains(lower(text), 'lorem ipsum')
                  OR contains(text, '{')) AS page_flagged
          FROM l
        )
        SELECT doc_id, clean_text, n_kept_lines, n_sentences, page_flagged,
               (n_sentences >= 3 AND NOT page_flagged) AS c4_keep
        FROM c
        """,
        # script_id: same unicode-block classes via RE2; CASE chain in
        # declaration order replicates the tie-break priority
        "script_id": """
        WITH m AS (
          SELECT doc_id,
            text || CASE
              WHEN doc_id % 4 = 1 THEN repeat(' привет мир словами', 40)
              WHEN doc_id % 4 = 2 THEN repeat(' 你好世界汉字很多', 40)
              WHEN doc_id % 4 = 3 THEN repeat(' مرحبا بالعالم', 40)
              ELSE '' END AS text
          FROM documents
        ), c AS (
          SELECT doc_id,
            len(regexp_extract_all(text, '[A-Za-zÀ-ɏ]')) AS n_latin,
            len(regexp_extract_all(text, '[Ѐ-ӿ]')) AS n_cyrillic,
            len(regexp_extract_all(text, '[Ͱ-Ͽ]')) AS n_greek,
            len(regexp_extract_all(text, '[؀-ۿ]')) AS n_arabic,
            len(regexp_extract_all(text, '[֐-׿]')) AS n_hebrew,
            len(regexp_extract_all(text, '[ऀ-ॿ]')) AS n_devanagari,
            len(regexp_extract_all(text, '[一-鿿぀-ヿ가-힯]')) AS n_cjk
          FROM m
        )
        SELECT doc_id, n_latin, n_cyrillic, n_greek, n_arabic, n_hebrew,
               n_devanagari, n_cjk,
               CASE
                 WHEN n_latin > 0 AND n_latin = greatest(n_latin, n_cyrillic,
                   n_greek, n_arabic, n_hebrew, n_devanagari, n_cjk)
                   THEN 'latin'
                 WHEN n_cyrillic > 0 AND n_cyrillic = greatest(n_latin,
                   n_cyrillic, n_greek, n_arabic, n_hebrew, n_devanagari,
                   n_cjk) THEN 'cyrillic'
                 WHEN n_greek > 0 AND n_greek = greatest(n_latin, n_cyrillic,
                   n_greek, n_arabic, n_hebrew, n_devanagari, n_cjk)
                   THEN 'greek'
                 WHEN n_arabic > 0 AND n_arabic = greatest(n_latin,
                   n_cyrillic, n_greek, n_arabic, n_hebrew, n_devanagari,
                   n_cjk) THEN 'arabic'
                 WHEN n_hebrew > 0 AND n_hebrew = greatest(n_latin,
                   n_cyrillic, n_greek, n_arabic, n_hebrew, n_devanagari,
                   n_cjk) THEN 'hebrew'
                 WHEN n_devanagari > 0 AND n_devanagari = greatest(n_latin,
                   n_cyrillic, n_greek, n_arabic, n_hebrew, n_devanagari,
                   n_cjk) THEN 'devanagari'
                 WHEN n_cjk > 0 AND n_cjk = greatest(n_latin, n_cyrillic,
                   n_greek, n_arabic, n_hebrew, n_devanagari, n_cjk)
                   THEN 'cjk'
                 ELSE 'unknown' END AS script,
               round(greatest(n_latin, n_cyrillic, n_greek, n_arabic,
                              n_hebrew, n_devanagari, n_cjk)
                     / greatest(n_latin + n_cyrillic + n_greek + n_arabic
                                + n_hebrew + n_devanagari + n_cjk, 1), 6)
                 AS script_purity
        FROM c
        """,
        # gopher_filters: identical rule arithmetic via DuckDB list
        # lambdas; words lowercase-split like textops._nonempty_words
        "gopher_filters": r"""
        WITH w AS (
          SELECT doc_id, text,
            list_filter(string_split_regex(lower(text), '\s+'),
                        x -> x <> '') AS words,
            list_filter(
              list_transform(string_split(text, chr(10)), x -> trim(x)),
              x -> x <> '') AS lines
          FROM documents
        ), f AS (
          SELECT doc_id,
            len(words) AS n_words,
            round(coalesce(list_sum(list_transform(words, x -> len(x))), 0)
                  / greatest(len(words), 1), 6) AS mean_word_len,
            len(string_split(text, '#')) - 1 AS n_hash,
            len(string_split(text, '...')) - 1 AS n_ellipsis,
            round(len(list_filter(lines, l -> regexp_matches(l, '^[-*•]')))
                  / greatest(len(lines), 1), 6) AS bullet_line_frac,
            round(len(list_filter(lines, l -> regexp_matches(l, '\.\.\.$')))
                  / greatest(len(lines), 1), 6) AS ellipsis_line_frac,
            round(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
                  / greatest(len(words), 1), 6) AS alpha_word_frac,
            (CASE WHEN list_contains(words, 'the') THEN 1 ELSE 0 END
             + CASE WHEN list_contains(words, 'be') THEN 1 ELSE 0 END
             + CASE WHEN list_contains(words, 'to') THEN 1 ELSE 0 END
             + CASE WHEN list_contains(words, 'of') THEN 1 ELSE 0 END
             + CASE WHEN list_contains(words, 'and') THEN 1 ELSE 0 END
             + CASE WHEN list_contains(words, 'that') THEN 1 ELSE 0 END
             + CASE WHEN list_contains(words, 'have') THEN 1 ELSE 0 END
             + CASE WHEN list_contains(words, 'with') THEN 1 ELSE 0 END
            ) AS stop_hits
          FROM w
        )
        SELECT doc_id, n_words, mean_word_len, bullet_line_frac,
               ellipsis_line_frac, alpha_word_frac, stop_hits,
               (n_words >= 10 AND n_words <= 100000) AS ok_word_count,
               (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
                 AS ok_mean_word_len,
               (round(n_hash / greatest(n_words, 1), 6) <= 0.1
                AND round(n_ellipsis / greatest(n_words, 1), 6) <= 0.1)
                 AS ok_symbol_ratio,
               (bullet_line_frac <= 0.9 AND ellipsis_line_frac <= 0.3)
                 AS ok_line_shape,
               (alpha_word_frac >= 0.8) AS ok_alpha_words,
               (stop_hits >= 2) AS ok_stop_words,
               ((n_words >= 10 AND n_words <= 100000)
                AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
                AND (round(n_hash / greatest(n_words, 1), 6) <= 0.1
                     AND round(n_ellipsis / greatest(n_words, 1), 6) <= 0.1)
                AND (bullet_line_frac <= 0.9 AND ellipsis_line_frac <= 0.3)
                AND alpha_word_frac >= 0.8 AND stop_hits >= 2)
                 AS gopher_keep
        FROM f
        """,
        "repetition_filters": """
        WITH base AS (
          SELECT doc_id,
            list_filter(list_transform(string_split(text, chr(10)),
                                       l -> trim(l)), l -> l <> '') AS lines,
            list_filter(string_split_regex(lower(text), '\\s+'),
                        w -> w <> '') AS ws
          FROM documents
        ), grams AS (
          SELECT doc_id, lines,
            CASE WHEN len(ws) >= 2 THEN
              list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
            ELSE []::varchar[] END AS g2,
            CASE WHEN len(ws) >= 3 THEN
              list_transform(range(1, len(ws) - 1),
                             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
            ELSE []::varchar[] END AS g3
          FROM base
        ), top2 AS (
          SELECT doc_id, max(c)::double / sum(c) AS frac
          FROM (SELECT doc_id, gram, count(*) AS c
                FROM (SELECT doc_id, unnest(g2) AS gram FROM grams)
                GROUP BY doc_id, gram)
          GROUP BY doc_id
        ), top3 AS (
          SELECT doc_id, max(c)::double / sum(c) AS frac
          FROM (SELECT doc_id, gram, count(*) AS c
                FROM (SELECT doc_id, unnest(g3) AS gram FROM grams)
                GROUP BY doc_id, gram)
          GROUP BY doc_id
        )
        SELECT g.doc_id,
          CASE WHEN len(g.lines) > 0 THEN
            round((len(g.lines) - len(list_distinct(g.lines)))::double
                  / len(g.lines), 6) ELSE 0.0 END AS dup_line_frac,
          coalesce(round(top2.frac, 6), 0.0) AS top2gram_frac,
          coalesce(round(top3.frac, 6), 0.0) AS top3gram_frac,
          CASE WHEN len(g.lines) > 0 THEN
            round(len(list_filter(g.lines, l ->
              starts_with(l, '-') OR starts_with(l, '*') OR
              starts_with(l, '•') OR ends_with(l, '...')))::double
              / len(g.lines), 6) ELSE 0.0 END AS bullet_ellipsis_line_frac
        FROM grams g
        LEFT JOIN top2 ON g.doc_id = top2.doc_id
        LEFT JOIN top3 ON g.doc_id = top3.doc_id
        """,
        "corpus_mixture": """
        SELECT source, lang,
               count(*) AS n_docs,
               sum(len(regexp_split_to_array(trim(text), '\\s+')))::bigint
                 AS total_tokens,
               round(avg(length(text)), 4) AS mean_chars,
               round((count(*) - count(DISTINCT
                       md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                     ))::double / count(*), 6) AS dup_rate
        FROM documents GROUP BY source, lang
        """,
        "minhash_signatures": """
        WITH w AS (
          SELECT doc_id,
                 list_distinct([array_to_string(ws[j+1:j+3], ' ') FOR j IN range(len(ws)-2)]) sh
          FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') ws FROM documents)
          WHERE len(ws) >= 3
        )
        SELECT doc_id,
               array_to_string({sig8}, ',') AS sig_csv
        FROM w WHERE len(sh) > 0
        """.format(sig8=_minhash_sig_sql(8)),
        "minhash_near_dups": _MINHASH_CTE.format(sig=_minhash_sig_sql(16), rpb=4, bands=4)
        + """
        SELECT id_a, id_b,
               round(len([i FOR i IN range(16) IF sig_a[i+1] = sig_b[i+1]]) / 16.0, 6) AS jaccard_est
        FROM cand
        WHERE len([i FOR i IN range(16) IF sig_a[i+1] = sig_b[i+1]]) / 16.0 >= 0.5
        """,
        # identical to the batch minhash_near_dups oracle ON PURPOSE: the
        # incremental index's defining invariant is that replaying the
        # corpus as epoch deltas yields exactly the batch pair set
        "incremental_neardup": _MINHASH_CTE.format(
            sig=_minhash_sig_sql(16), rpb=4, bands=4
        )
        + """
        SELECT id_a, id_b,
               round(len([i FOR i IN range(16) IF sig_a[i+1] = sig_b[i+1]]) / 16.0, 6) AS jaccard_est
        FROM cand
        WHERE len([i FOR i IN range(16) IF sig_a[i+1] = sig_b[i+1]]) / 16.0 >= 0.5
        """,
        "ngram_jaccard": _MINHASH_CTE.format(sig=_minhash_sig_sql(16), rpb=4, bands=4)
        + """
        SELECT id_a, id_b,
               round(len(list_intersect(sh_a, sh_b))::double
                     / (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))), 6) AS jaccard
        FROM cand
        WHERE len(list_intersect(sh_a, sh_b))::double
              / (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))) >= 0.3
        """,
        "simhash": _SIMHASH_CTE + """
        SELECT doc_id, simhash FROM sig
        """,
        "simhash_near_dups": _SIMHASH_CTE + """
        , u AS (
          SELECT doc_id, simhash,
                 (CASE WHEN simhash < 0
                       THEN simhash::hugeint + 18446744073709551616::hugeint
                       ELSE simhash::hugeint END)::ubigint AS us
          FROM sig
        ),
        b AS (
          SELECT doc_id, simhash, r.i AS band_idx,
                 ((us >> (r.i * 16)) & 65535) AS band_key
          FROM u, range(4) r(i)
        ),
        cand AS (
          SELECT DISTINCT a.doc_id id_a, c.doc_id id_b, a.simhash sa, c.simhash sb
          FROM b a JOIN b c ON a.band_idx = c.band_idx AND a.band_key = c.band_key
                            AND a.doc_id < c.doc_id
        )
        SELECT id_a, id_b, bit_count(xor(sa, sb))::bigint AS hamming
        FROM cand WHERE bit_count(xor(sa, sb)) <= 3
        """,
        "ann_cosine_topk": """
        WITH q AS (SELECT embedding::double[] qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               round(list_dot_product(embedding::double[], qv)
                     / (sqrt(list_dot_product(embedding::double[], embedding::double[]))
                        * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
        FROM embeddings, q WHERE vec_id <> 0
        ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
        """,
        # ann_lsh_topk: multi-probe semantics (operators/ann.py::
        # lsh_probe_buckets) — probe the n_probes = 2·P+1 = 9 buckets
        # minimizing the summed |margin| of flipped sign bits (cost
        # rounded to 6 decimals, ties by bucket id), then exact cosine
        # within the probed buckets.
        "ann_lsh_topk": """
        WITH p AS (SELECT vec_id pid, embedding::double[] pv FROM embeddings WHERE vec_id IN (1,2,3,4)),
        q AS (SELECT embedding::double[] qv FROM embeddings WHERE vec_id = 0),
        b AS (
          SELECT e.vec_id, e.embedding::double[] ev,
                 sum(CASE WHEN list_dot_product(e.embedding::double[], p.pv) > 0
                          THEN (1::bigint << (p.pid - 1)) ELSE 0 END) AS bucket_id
          FROM embeddings e, p WHERE e.vec_id <> 0 GROUP BY e.vec_id, ev
        ),
        m AS (
          SELECT p.pid, list_dot_product(q.qv, p.pv) AS margin FROM p, q
        ),
        qb AS (
          SELECT sum(CASE WHEN margin > 0
                          THEN (1::bigint << (pid - 1)) ELSE 0 END) AS qbucket
          FROM m
        ),
        probes AS (
          SELECT cand.range AS bucket
          FROM range(16) cand, qb
          ORDER BY round((SELECT sum(CASE WHEN (xor(cand.range, qb.qbucket) >> (m.pid - 1)) & 1 = 1
                                          THEN abs(m.margin) ELSE 0 END)
                          FROM m), 6) ASC,
                   cand.range ASC
          LIMIT 9
        )
        SELECT b.vec_id,
               round(list_dot_product(ev, qv)
                     / (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
        FROM b, q WHERE b.bucket_id IN (SELECT bucket FROM probes)
        ORDER BY cos_sim DESC, b.vec_id ASC LIMIT 10
        """,
        "ann_ivf_topk": """
        WITH c AS (
          SELECT vec_id - 1 AS cid, embedding::double[] cv,
                 sqrt(list_dot_product(embedding::double[], embedding::double[])) cn
          FROM embeddings WHERE vec_id BETWEEN 1 AND 8
        ),
        q AS (SELECT embedding::double[] qv FROM embeddings WHERE vec_id = 0),
        probe AS (
          SELECT cid FROM c, q
          ORDER BY list_dot_product(qv, cv) / cn DESC, cid ASC LIMIT 2
        ),
        assign AS (
          SELECT e.vec_id, e.embedding::double[] ev, c.cid,
                 row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_dot_product(e.embedding::double[], c.cv) / c.cn DESC,
                            c.cid ASC) rn
          FROM embeddings e, c WHERE e.vec_id <> 0
        )
        SELECT a.vec_id,
               round(list_dot_product(a.ev, q.qv)
                     / (sqrt(list_dot_product(a.ev, a.ev))
                        * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
        FROM assign a, q
        WHERE a.rn = 1 AND a.cid IN (SELECT cid FROM probe)
        ORDER BY cos_sim DESC, a.vec_id ASC LIMIT 10
        """,
        "token_stats": """
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens,
               len(regexp_extract_all(text,
                   $$'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+$$)) AS bpe_tokens
        FROM documents
        """,
        "stateful_url_changelog": """
        WITH latest AS (
          SELECT user_id, event_id, event_type, ts,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) rn,
                 count(*) OVER (PARTITION BY user_id) cnt
          FROM events
        )
        SELECT 'user://' || user_id AS url,
               epoch_us(ts) AS ts_us,
               event_id AS seq,
               event_type = 'error' AS is_deleted,
               cnt AS n_events
        FROM latest WHERE rn = 1
        """,
        "guess_cell_types": _guess_cell_types_sql(),
        "embedding_neardup": """
        WITH p AS (SELECT vec_id pid, embedding::double[] pv FROM embeddings WHERE vec_id IN (1,2,3,4)),
        b AS (
          SELECT e.vec_id, e.embedding::double[] ev,
                 sum(CASE WHEN list_dot_product(e.embedding::double[], p.pv) > 0
                          THEN (1::bigint << (p.pid - 1)) ELSE 0 END) AS bucket_id
          FROM embeddings e, p GROUP BY e.vec_id, ev
        )
        SELECT a.vec_id AS id_a, c.vec_id AS id_b,
               round(list_dot_product(a.ev, c.ev)
                     / (sqrt(list_dot_product(a.ev, a.ev))
                        * sqrt(list_dot_product(c.ev, c.ev))), 6) AS cos_sim
        FROM b a JOIN b c ON a.bucket_id = c.bucket_id AND a.vec_id < c.vec_id
        WHERE round(list_dot_product(a.ev, c.ev)
                    / (sqrt(list_dot_product(a.ev, a.ev))
                       * sqrt(list_dot_product(c.ev, c.ev))), 6) >= 0.35
        """,
        "multimodal_sniff": r"""
        WITH m AS (
          SELECT doc_id,
                 CASE doc_id % 5
                   WHEN 0 THEN '\x89PNG\x0D\x0A\x1A\x0A'::blob || encode(text)
                   WHEN 1 THEN '\xFF\xD8\xFF\xE0'::blob || encode(text)
                   WHEN 2 THEN 'RIFF'::blob || encode(text)
                   WHEN 3 THEN '\x00\x00\x00\x20ftyp'::blob || encode(text)
                   ELSE encode(text)
                 END AS media
          FROM documents
        )
        SELECT doc_id,
               CASE WHEN left(hex(media),8) = '52494646'
                         AND substr(hex(media),17,8) = '57454250' THEN 'webp'
                    WHEN left(hex(media),16) = '89504E470D0A1A0A' THEN 'png'
                    WHEN left(hex(media),6)  = 'FFD8FF' THEN 'jpeg'
                    WHEN left(hex(media),12) IN ('474946383761','474946383961') THEN 'gif'
                    WHEN left(hex(media),8)  = '52494646' THEN 'riff'
                    WHEN left(hex(media),6)  = '494433' THEN 'mp3'
                    WHEN left(hex(media),8)  = '664C6143' THEN 'flac'
                    WHEN left(hex(media),8)  = '1A45DFA3' THEN 'mkv'
                    WHEN left(hex(media),8)  = '000001BA' THEN 'mpeg'
                    WHEN left(hex(media),4)  = '424D' THEN 'bmp'
                    WHEN substr(hex(media),9,8) = '66747970'
                         AND substr(hex(media),17,8)
                             IN ('61766966','61766973') THEN 'avif'
                    WHEN substr(hex(media),9,8) = '66747970' THEN 'mp4'
                    ELSE 'bin' END AS container,
               CASE WHEN left(hex(media),8) = '52494646'
                         AND substr(hex(media),17,8) = '57454250' THEN 'image'
                    WHEN left(hex(media),16) = '89504E470D0A1A0A' THEN 'image'
                    WHEN left(hex(media),6)  = 'FFD8FF' THEN 'image'
                    WHEN left(hex(media),12) IN ('474946383761','474946383961') THEN 'image'
                    WHEN left(hex(media),8)  = '52494646' THEN 'audio'
                    WHEN left(hex(media),6)  = '494433' THEN 'audio'
                    WHEN left(hex(media),8)  = '664C6143' THEN 'audio'
                    WHEN left(hex(media),8)  = '1A45DFA3' THEN 'video'
                    WHEN left(hex(media),8)  = '000001BA' THEN 'video'
                    WHEN left(hex(media),4)  = '424D' THEN 'image'
                    WHEN substr(hex(media),9,8) = '66747970'
                         AND substr(hex(media),17,8)
                             IN ('61766966','61766973') THEN 'image'
                    WHEN substr(hex(media),9,8) = '66747970' THEN 'video'
                    ELSE 'unknown' END AS modality,
               octet_length(media) AS n_bytes,
               left(hex(media), 16) AS magic_hex
        FROM m
        """,
        "embedding_neardup_banded": """
        WITH p AS (SELECT vec_id pid, embedding::double[] pv FROM embeddings WHERE vec_id IN (1,2,3,4)),
        b AS (
          SELECT e.vec_id, e.embedding::double[] ev,
                 sum(CASE WHEN list_dot_product(e.embedding::double[], p.pv) > 0
                          THEN (1::bigint << (p.pid - 1)) ELSE 0 END) AS bucket_id
          FROM embeddings e, p GROUP BY e.vec_id, ev
        ),
        bd AS (
          SELECT vec_id, ev, r.i AS band_idx, (bucket_id >> (r.i * 2)) & 3 AS band_key
          FROM b, range(2) r(i)
        ),
        cand AS (
          SELECT DISTINCT a.vec_id id_a, c.vec_id id_b, a.ev ev_a, c.ev ev_b
          FROM bd a JOIN bd c ON a.band_idx = c.band_idx AND a.band_key = c.band_key
                              AND a.vec_id < c.vec_id
        )
        SELECT id_a, id_b,
               round(list_dot_product(ev_a, ev_b)
                     / (sqrt(list_dot_product(ev_a, ev_a))
                        * sqrt(list_dot_product(ev_b, ev_b))), 6) AS cos_sim
        FROM cand
        WHERE round(list_dot_product(ev_a, ev_b)
                    / (sqrt(list_dot_product(ev_a, ev_a))
                       * sqrt(list_dot_product(ev_b, ev_b))), 6) >= 0.35
        """,
        # multimodal_decode: REAL vendored BMP codec; the oracle recomputes
        # width/height/mean arithmetically from the synth ramp (the decode
        # must agree with the encode through the actual 24-bpp container,
        # padding and all). The mean is an exact integer sum over pixels
        # with ONE double division — bit-identical in both engines.
        "multimodal_decode": """
        WITH g AS (
          SELECT doc_id, 4 + doc_id % 13 AS w, 4 + (doc_id * 7) % 11 AS h
          FROM documents
        ),
        sums AS (
          -- constant grid + bound filter (dims ≤ 16×14): range() can't
          -- take lateral column args in DuckDB
          SELECT doc_id, w, h,
                 sum((x.range + y.range + doc_id) % 256
                     + (x.range + 2 * y.range + 2 * doc_id) % 256
                     + (3 * x.range + y.range + 5 * doc_id) % 256) AS s
          FROM g, range(17) x, range(15) y
          WHERE x.range < w AND y.range < h
          GROUP BY doc_id, w, h
        )
        SELECT doc_id AS id, 'bmp' AS container, w AS width, h AS height,
               s / (3.0 * w * h) AS mean_luma,
               54 + h * ((3 * w + 3) // 4 * 4) AS n_bytes
        FROM sums
        """,
        # multimodal_decode_png: REAL vendored PNG codec; same contract as
        # the BMP oracle — recompute the synth ramp arithmetically, so the
        # decoder must agree with the encoder through zlib + chunk CRCs.
        "multimodal_decode_png": """
        WITH g AS (
          SELECT doc_id, 3 + doc_id % 14 AS w, 3 + (doc_id * 5) % 12 AS h
          FROM documents
        ),
        sums AS (
          SELECT doc_id, w, h,
                 sum((2 * x.range + y.range + doc_id) % 256
                     + (x.range + 3 * y.range + 4 * doc_id) % 256
                     + (x.range + y.range + 7 * doc_id) % 256) AS s
          FROM g, range(17) x, range(15) y
          WHERE x.range < w AND y.range < h
          GROUP BY doc_id, w, h
        )
        SELECT doc_id AS id, 'png' AS container, w AS width, h AS height,
               s / (3.0 * w * h) AS mean_luma
        FROM sums
        """,
        # multimodal_decode_jpeg: REAL vendored baseline JPEG codec; the
        # fixture is block-constant so the lossy round trip is exact:
        # only DC survives — dc = round-half-away((v-128)/2) (Q00=16,
        # DC=8·(v-128) under T.81 DCT scaling), recon = clamp(2·dc+128).
        # The mean is the exact integer pixel sum with ONE double
        # division, matching the decoder's arithmetic bit-for-bit.
        "multimodal_decode_jpeg": """
        WITH g AS (
          SELECT doc_id,
                 1 + doc_id % 3 AS bw,
                 1 + (doc_id * 5) % 3 AS bh
          FROM documents
        ),
        blocks AS (
          SELECT doc_id, bw, bh,
                 (17 * x.range + 31 * y.range + doc_id) % 256 AS v
          FROM g, range(3) x, range(3) y
          WHERE x.range < bw AND y.range < bh
        ),
        recon AS (
          SELECT doc_id, bw, bh,
                 LEAST(255, GREATEST(0,
                   2 * (CASE WHEN v >= 128
                             THEN floor((v - 128) / 2.0 + 0.5)
                             ELSE -floor((128 - v) / 2.0 + 0.5) END)
                   + 128)) AS pv
          FROM blocks
        )
        SELECT doc_id AS id, 'jpeg' AS container,
               (8 * bw)::int AS width, (8 * bh)::int AS height,
               sum(pv) * 64 / (64.0 * bw * bh) AS mean_luma
        FROM recon
        GROUP BY doc_id, bw, bh
        """,
        # multimodal_resize_real: the BMP ramp resized through the
        # integer aspect box (max_side 8) and the nearest source map,
        # then re-decoded — all arithmetic, incl. the identity path
        # for images already inside the box.
        "multimodal_resize_real": """
        WITH g AS (
          SELECT doc_id,
                 4 + doc_id % 13 AS w,
                 4 + (doc_id * 7) % 11 AS h
          FROM documents
        ),
        box AS (
          SELECT doc_id, w, h,
                 CASE WHEN GREATEST(w, h) > 8
                      THEN GREATEST(1, (w * 8) // GREATEST(w, h))
                      ELSE w END AS ow,
                 CASE WHEN GREATEST(w, h) > 8
                      THEN GREATEST(1, (h * 8) // GREATEST(w, h))
                      ELSE h END AS oh
          FROM g
        ),
        px AS (
          SELECT doc_id, ow, oh,
                 (x.range * w) // ow AS sx,
                 (y.range * h) // oh AS sy
          FROM box, range(16) x, range(14) y
          WHERE x.range < ow AND y.range < oh
        ),
        sums AS (
          SELECT doc_id, ow, oh,
                 sum((sx + sy + doc_id) % 256
                     + (sx + 2 * sy + 2 * doc_id) % 256
                     + (3 * sx + sy + 5 * doc_id) % 256) AS s
          FROM px GROUP BY doc_id, ow, oh
        )
        SELECT doc_id AS id, 'bmp' AS container,
               ow::int AS width, oh::int AS height,
               s / (3.0 * ow * oh) AS mean_luma
        FROM sums
        """,
        # multimodal_webp_lossy_frames: 3 full-canvas VP8 key frames —
        # MB-constant luma with flat chroma, so RGB == Y exactly and
        # per-frame means are MB arithmetic with the shift 17·k inside
        # the [40, 216) value band; duration = 25+k ms.
        "multimodal_webp_lossy_frames": """
        WITH g AS (
          SELECT doc_id,
                 (1 + doc_id % 3) AS mbw,
                 (1 + (doc_id * 7) % 2) AS mbh
          FROM documents
        ),
        sums AS (
          SELECT doc_id, mbw, mbh, k.range AS k,
                 sum(40 + (29 * x.range + 47 * y.range + doc_id
                           + 17 * k.range) % 176) AS s,
                 count(*) AS n
          FROM g, range(3) x, range(2) y, range(3) k
          WHERE x.range < mbw AND y.range < mbh
          GROUP BY doc_id, mbw, mbh, k.range
        )
        SELECT doc_id AS id, k::int AS frame_idx,
               (16 * mbw)::int AS width, (16 * mbh)::int AS height,
               (25 + k)::int AS duration_ms,
               s / (1.0 * n) AS mean_luma
        FROM sums
        """,
        # multimodal_webp_frames: 3 full-canvas no-blend frames — per-
        # frame means are the synth_webp_bytes arithmetic (odd rows
        # duplicate the row above, the encoder's LZ77 invariant) with
        # the per-frame shift 17·k; duration = 40+k ms.
        "multimodal_webp_frames": """
        WITH g AS (
          SELECT doc_id, 3 + doc_id % 12 AS w, 3 + (doc_id * 3) % 10 AS h
          FROM documents
        ),
        sums AS (
          SELECT doc_id, w, h, k.range AS k,
                 sum((x.range + 2 * (y.range - y.range % 2) + doc_id
                      + 17 * k.range) % 256
                     + (2 * x.range + (y.range - y.range % 2)
                        + 3 * doc_id + 17 * k.range) % 256
                     + (x.range + (y.range - y.range % 2)
                        + 5 * doc_id + 17 * k.range) % 256) AS s
          FROM g, range(14) x, range(12) y, range(3) k
          WHERE x.range < w AND y.range < h
          GROUP BY doc_id, w, h, k.range
        )
        SELECT doc_id AS id, k::int AS frame_idx,
               w::int AS width, h::int AS height,
               (40 + k)::int AS duration_ms,
               s / (3.0 * w * h) AS mean_luma
        FROM sums
        """,
        # multimodal_gif_frames: 3 full-screen disposal-1 frames — the
        # composed canvas IS each frame, so per-frame means are the
        # same palette/index arithmetic as multimodal_decode_gif with
        # the per-frame index shift 17·k; delay = 4+k cs.
        "multimodal_gif_frames": """
        WITH g AS (
          SELECT doc_id, 3 + doc_id % 13 AS w, 3 + (doc_id * 7) % 11 AS h
          FROM documents
        ),
        px AS (
          SELECT doc_id, w, h, k.range AS k,
                 (2 * x.range + 3 * y.range + doc_id + 17 * k.range)
                   % 256 AS i
          FROM g, range(15) x, range(13) y, range(3) k
          WHERE x.range < w AND y.range < h
        ),
        sums AS (
          SELECT doc_id, w, h, k,
                 sum((3 * i + doc_id) % 256 + (5 * i + 2 * doc_id) % 256
                     + (7 * i + 11 * doc_id) % 256) AS s
          FROM px GROUP BY doc_id, w, h, k
        )
        SELECT doc_id AS id, k::int AS frame_idx,
               w::int AS width, h::int AS height,
               (4 + k)::int AS delay_cs,
               s / (3.0 * w * h) AS mean_luma
        FROM sums
        """,
        # multimodal_avif_meta: the ispe dims are arithmetic in doc_id;
        # mean_luma is NULL by design (no AV1 pixel decode).
        "multimodal_avif_meta": """
        SELECT doc_id AS id, 'avif' AS container,
               (16 + (doc_id * 37) % 2048)::int AS width,
               (16 + (doc_id * 53) % 1536)::int AS height,
               NULL::double AS mean_luma
        FROM documents
        """,
        # multimodal_decode_12bit: SOF1 extended-sequential closed
        # form at 12-bit — recon = clamp(2·rha((v−2048)/2) + 2048,
        # 0, 4095), mean scaled by 255/4095.
        "multimodal_decode_12bit": """
        WITH g AS (
          SELECT doc_id,
                 1 + doc_id % 3 AS bw,
                 1 + (doc_id * 5) % 3 AS bh
          FROM documents
        ),
        blocks AS (
          SELECT doc_id, bw, bh,
                 (661 * x.range + 997 * y.range + 37 * doc_id) % 4096 AS v
          FROM g, range(3) x, range(3) y
          WHERE x.range < bw AND y.range < bh
        ),
        recon AS (
          SELECT doc_id, bw, bh,
                 LEAST(4095, GREATEST(0,
                   2 * (CASE WHEN v >= 2048
                             THEN floor((v - 2048) / 2.0 + 0.5)
                             ELSE -floor((2048 - v) / 2.0 + 0.5) END)
                   + 2048)) AS pv
          FROM blocks
        )
        SELECT doc_id AS id, 'jpeg' AS container,
               (8 * bw)::int AS width, (8 * bh)::int AS height,
               sum(pv) * 255 / (4095.0 * bw * bh * 64) * 64 AS mean_luma
        FROM recon
        GROUP BY doc_id, bw, bh
        """,
        # multimodal_decode_lossless: SOF3 is EXACT, so the oracle is
        # the plain pixel mean of the synth function — no codec
        # arithmetic at all.
        "multimodal_decode_lossless": """
        WITH g AS (
          SELECT doc_id,
                 8 * (1 + doc_id % 3) AS w,
                 8 * (1 + (doc_id * 5) % 3) AS h
          FROM documents
        ),
        px AS (
          SELECT doc_id, w, h,
                 (29 * x.range + 43 * y.range + doc_id) % 256 AS v
          FROM g, range(24) x, range(24) y
          WHERE x.range < w AND y.range < h
        )
        SELECT doc_id AS id, 'jpeg' AS container,
               w::int AS width, h::int AS height,
               sum(v) / (1.0 * w * h) AS mean_luma
        FROM px
        GROUP BY doc_id, w, h
        """,
        # multimodal_decode_prog_arith: the SAME closed form — the
        # SOF10 G.2 successive-approximation scans over the QM coder
        # must reach identical coefficients through a fourth bitstream.
        "multimodal_decode_prog_arith": """
        WITH g AS (
          SELECT doc_id,
                 1 + doc_id % 3 AS bw,
                 1 + (doc_id * 5) % 3 AS bh
          FROM documents
        ),
        blocks AS (
          SELECT doc_id, bw, bh,
                 (17 * x.range + 31 * y.range + doc_id) % 256 AS v
          FROM g, range(3) x, range(3) y
          WHERE x.range < bw AND y.range < bh
        ),
        recon AS (
          SELECT doc_id, bw, bh,
                 LEAST(255, GREATEST(0,
                   2 * (CASE WHEN v >= 128
                             THEN floor((v - 128) / 2.0 + 0.5)
                             ELSE -floor((128 - v) / 2.0 + 0.5) END)
                   + 128)) AS pv
          FROM blocks
        )
        SELECT doc_id AS id, 'jpeg' AS container,
               (8 * bw)::int AS width, (8 * bh)::int AS height,
               sum(pv) * 64 / (64.0 * bw * bh) AS mean_luma
        FROM recon
        GROUP BY doc_id, bw, bh
        """,
        # multimodal_decode_arith: the SAME closed form — the SOF9 QM
        # arithmetic coder (Annex D state machine + F.1.4.4 models)
        # must reach identical coefficients through a third bitstream.
        "multimodal_decode_arith": """
        WITH g AS (
          SELECT doc_id,
                 1 + doc_id % 3 AS bw,
                 1 + (doc_id * 5) % 3 AS bh
          FROM documents
        ),
        blocks AS (
          SELECT doc_id, bw, bh,
                 (17 * x.range + 31 * y.range + doc_id) % 256 AS v
          FROM g, range(3) x, range(3) y
          WHERE x.range < bw AND y.range < bh
        ),
        recon AS (
          SELECT doc_id, bw, bh,
                 LEAST(255, GREATEST(0,
                   2 * (CASE WHEN v >= 128
                             THEN floor((v - 128) / 2.0 + 0.5)
                             ELSE -floor((128 - v) / 2.0 + 0.5) END)
                   + 128)) AS pv
          FROM blocks
        )
        SELECT doc_id AS id, 'jpeg' AS container,
               (8 * bw)::int AS width, (8 * bh)::int AS height,
               sum(pv) * 64 / (64.0 * bw * bh) AS mean_luma
        FROM recon
        GROUP BY doc_id, bw, bh
        """,
        # multimodal_decode_progressive: the SAME closed form —
        # the Annex-G scan machinery must reach identical coefficients
        # through a different bitstream.
        "multimodal_decode_progressive": """
        WITH g AS (
          SELECT doc_id,
                 1 + doc_id % 3 AS bw,
                 1 + (doc_id * 5) % 3 AS bh
          FROM documents
        ),
        blocks AS (
          SELECT doc_id, bw, bh,
                 (17 * x.range + 31 * y.range + doc_id) % 256 AS v
          FROM g, range(3) x, range(3) y
          WHERE x.range < bw AND y.range < bh
        ),
        recon AS (
          SELECT doc_id, bw, bh,
                 LEAST(255, GREATEST(0,
                   2 * (CASE WHEN v >= 128
                             THEN floor((v - 128) / 2.0 + 0.5)
                             ELSE -floor((128 - v) / 2.0 + 0.5) END)
                   + 128)) AS pv
          FROM blocks
        )
        SELECT doc_id AS id, 'jpeg' AS container,
               (8 * bw)::int AS width, (8 * bh)::int AS height,
               sum(pv) * 64 / (64.0 * bw * bh) AS mean_luma
        FROM recon
        GROUP BY doc_id, bw, bh
        """,
        # multimodal_decode_gif: REAL vendored GIF codec; the fixture's
        # palette and indices are arithmetic in doc_id, so the oracle
        # recomputes the decode through palette[(2x+3y+doc)%256] — the
        # decoder must agree with the encoder through the LZW stream.
        "multimodal_decode_gif": """
        WITH g AS (
          SELECT doc_id, 3 + doc_id % 13 AS w, 3 + (doc_id * 7) % 11 AS h
          FROM documents
        ),
        px AS (
          SELECT doc_id, w, h,
                 (2 * x.range + 3 * y.range + doc_id) % 256 AS i
          FROM g, range(15) x, range(13) y
          WHERE x.range < w AND y.range < h
        ),
        sums AS (
          SELECT doc_id, w, h,
                 sum((3 * i + doc_id) % 256 + (5 * i + 2 * doc_id) % 256
                     + (7 * i + 11 * doc_id) % 256) AS s
          FROM px GROUP BY doc_id, w, h
        )
        SELECT doc_id AS id, 'gif' AS container, w AS width, h AS height,
               s / (3.0 * w * h) AS mean_luma
        FROM sums
        """,
        # multimodal_decode_webp: REAL vendored VP8L codec; odd rows
        # duplicate the row above (the encoder emits them as LZ77
        # references), so the oracle's ye = y - y%2 folds the copy.
        # Mean over R,G,B — alpha (constant 255) excluded.
        "multimodal_decode_webp": """
        WITH g AS (
          SELECT doc_id, 3 + doc_id % 12 AS w, 3 + (doc_id * 3) % 10 AS h
          FROM documents
        ),
        sums AS (
          SELECT doc_id, w, h,
                 sum((x.range + 2 * (y.range - y.range % 2) + doc_id) % 256
                     + (2 * x.range + (y.range - y.range % 2)
                        + 3 * doc_id) % 256
                     + (x.range + (y.range - y.range % 2)
                        + 5 * doc_id) % 256) AS s
          FROM g, range(14) x, range(12) y
          WHERE x.range < w AND y.range < h
          GROUP BY doc_id, w, h
        )
        SELECT doc_id AS id, 'webp' AS container, w AS width, h AS height,
               s / (3.0 * w * h) AS mean_luma
        FROM sums
        """,
        # multimodal_decode_vp8: REAL vendored lossy-VP8 decoder; the
        # fixture is MB-constant (exact reconstruction), so mean_luma =
        # the plain average of the per-MB values. s/n equals the
        # decoder's sum_pixels/(w*h) EXACTLY in IEEE (factor 256 is a
        # power of two).
        "multimodal_decode_vp8": """
        WITH g AS (
          SELECT doc_id,
                 (1 + doc_id % 3) AS mbw,
                 (1 + (doc_id * 7) % 2) AS mbh
          FROM documents
        ),
        sums AS (
          SELECT doc_id, mbw, mbh,
                 sum(40 + (29 * x.range + 47 * y.range + doc_id) % 176)
                   AS s,
                 count(*) AS n
          FROM g, range(3) x, range(2) y
          WHERE x.range < mbw AND y.range < mbh
          GROUP BY doc_id, mbw, mbh
        )
        SELECT doc_id AS id, 'webp' AS container,
               (16 * mbw)::int AS width, (16 * mbh)::int AS height,
               s / (1.0 * n) AS mean_luma
        FROM sums
        """,
        # multimodal_decode_fake / multimodal_frames: the stubbed codec
        # backend digests md5(UPPERCASE-HEX(bytes)) — ASCII-safe, so DuckDB
        # (whose md5 takes VARCHAR only) recomputes it exactly as
        # md5(hex(blob)); full oracles, no longer rows-only.
        "multimodal_decode_fake": r"""
        WITH m AS (
          SELECT doc_id,
                 CASE doc_id % 5
                   WHEN 0 THEN '\x89PNG\x0D\x0A\x1A\x0A'::blob || encode(text)
                   ELSE '\xFF\xD8\xFF\xE0'::blob || encode(text)
                 END AS media,
                 CASE doc_id % 5 WHEN 0 THEN 'png' ELSE 'jpeg' END AS container
          FROM documents WHERE doc_id % 5 IN (0, 1)
        ),
        d AS (SELECT doc_id, container, media, md5(hex(media)) AS h FROM m)
        SELECT doc_id AS id, container,
               (16 + ('0x' || substr(h, 1, 4))::int % 4080)::int AS width,
               (16 + ('0x' || substr(h, 5, 4))::int % 4080)::int AS height,
               round(('0x' || substr(h, 9, 4))::int / 65535.0 * 255.0, 4)
                 AS mean_luma,
               octet_length(media) AS n_bytes
        FROM d
        """,
        "multimodal_frames": r"""
        WITH m AS (
          SELECT doc_id, '\x00\x00\x00\x20ftyp'::blob || encode(text) AS media
          FROM documents WHERE doc_id % 5 = 3
        ),
        n AS (
          SELECT doc_id,
                 1 + ('0x' || substr(md5(hex(media)), 13, 2))::int % 4 AS nf
          FROM m
        )
        SELECT doc_id AS id, r.range::int AS frame_idx,
               (r.range * 1000)::bigint AS frame_ts_ms
        FROM n, range(4) r WHERE r.range < nf
        """,
        "cdc_changes_feed": """
        WITH ranged AS (
          SELECT *, row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) rn
          FROM events WHERE event_id % 3 IN (1, 2)
        )
        SELECT 'user://' || user_id AS url,
               event_id AS seq,
               (event_type = 'error') AS is_deleted,
               epoch_us(ts) AS ts_us
        FROM ranged WHERE rn = 1
        """,
        "cdc_replicate": """
        WITH ranged AS (
          SELECT *, row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) rn
          FROM events
        )
        SELECT 'user://' || user_id AS url,
               event_id AS seq,
               epoch_us(ts) AS ts_us
        FROM ranged WHERE rn = 1 AND event_type <> 'error'
        """,
        "maxwell_parse": """
        SELECT CASE WHEN event_type = 'error' THEN 'D'
                    WHEN event_type = 'view' THEN 'I'
                    ELSE 'U' END AS op,
               event_id * 1048576 AS seq,
               (epoch_us(ts) // 1000000) * 1000 AS src_ts_ms,
               user_id, value AS v, props
        FROM events
        """,
        "canal_parse": """
        SELECT CASE WHEN event_type = 'error' THEN 'D'
                    WHEN event_type = 'view' THEN 'I'
                    ELSE 'U' END AS op,
               event_id * 1048576 AS seq,
               epoch_us(ts) // 1000 AS src_ts_ms,
               user_id, value AS v, props
        FROM events
        """,
        "wal2json_parse": """
        SELECT CASE WHEN event_type = 'error' THEN 'D'
                    WHEN event_type = 'view' THEN 'I'
                    ELSE 'U' END AS op,
               event_id AS seq,
               epoch_us(ts) // 1000 AS src_ts_ms,
               user_id, value AS v, props
        FROM events
        """,
        "stream_enrich_join": """
        WITH ch AS (
          SELECT event_id AS seq, 'user://' || user_id AS url, ts AS warc_ts
          FROM events WHERE event_type <> 'click'
        ), f AS (
          SELECT 'user://' || user_id AS url, ts AS fetch_ts,
                 event_id % 400 AS status
          FROM events WHERE event_type = 'click'
        )
        SELECT ch.url, ch.seq,
               epoch_us(f.fetch_ts) AS f_ts_us,
               f.status AS f_status
        FROM ch JOIN f
          ON ch.url = f.url
         AND f.fetch_ts >= ch.warc_ts - INTERVAL 24 HOUR
         AND f.fetch_ts <= ch.warc_ts
        """,
        "cdc_snapshot_diff": """
        WITH latest AS (
          SELECT * FROM (
            SELECT user_id, event_type, props,
                   row_number() OVER (
                     PARTITION BY user_id
                     ORDER BY ts DESC, event_id DESC) rn
            FROM events
          ) WHERE rn = 1
        )
        SELECT 'user://' || user_id AS url,
               event_type AS lang,
               props
        FROM latest WHERE event_type <> 'error'
        """,
        "lake_bulk_import": """
        WITH latest AS (
          SELECT * FROM (
            SELECT user_id, event_id, event_type, props, ts,
                   row_number() OVER (
                     PARTITION BY user_id
                     ORDER BY ts DESC, event_id DESC) rn
            FROM events
          ) WHERE rn = 1
        )
        SELECT 'user://' || user_id AS url,
               event_id AS seq,
               epoch_us(ts) AS ts_us,
               event_type AS lang,
               props
        FROM latest WHERE event_type <> 'error'
        """,
        "lake_clone": _LATEST_CTE
        + """
        SELECT 'user://' || user_id AS url,
               event_id AS seq,
               epoch_us(ts) AS ts_us
        FROM latest WHERE event_type <> 'error'
        """,
        "lake_scan_pruned": """
        WITH ranged AS (
          SELECT *, row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) rn
          FROM events
        )
        SELECT 'user://' || user_id AS url,
               event_id AS seq,
               epoch_us(ts) AS ts_us,
               event_type AS lang
        FROM ranged WHERE rn = 1 AND event_type = 'click'
        """,
        "lake_lookup_bloom": """
        WITH ranged AS (
          SELECT *, row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) rn
          FROM events
        ),
        keys AS (
          SELECT DISTINCT user_id FROM events ORDER BY user_id LIMIT 3
        )
        SELECT 'user://' || user_id AS url,
               event_id AS seq,
               epoch_us(ts) AS ts_us,
               event_type AS lang
        FROM ranged
        WHERE rn = 1 AND event_type <> 'error'
          AND user_id IN (SELECT user_id FROM keys)
        """,
        "lake_scan_semi": """
        WITH ranged AS (
          SELECT *, row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) rn
          FROM events
        ),
        probe AS (
          SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        )
        SELECT 'user://' || user_id AS url,
               event_id AS seq,
               epoch_us(ts) AS ts_us,
               event_type AS lang
        FROM ranged
        WHERE rn = 1 AND event_type <> 'error'
          AND user_id IN (SELECT user_id FROM probe)
        """,
        "lake_zorder_scan": """
        SELECT 'ev://' || event_id AS url,
               event_id AS seq,
               event_id % 251 AS a,
               event_id % 257 AS b,
               event_type AS lang
        FROM events
        WHERE event_id % 257 < 32
        """,
        "lake_key_history": """
        WITH v AS (
          SELECT user_id, event_id % 5 AS epoch, event_id, ts, event_type,
                 row_number() OVER (
                   PARTITION BY user_id, event_id % 5
                   ORDER BY ts DESC, event_id DESC) rn
          FROM events
        ),
        keys AS (
          SELECT DISTINCT user_id FROM events ORDER BY user_id LIMIT 3
        )
        SELECT 'user://' || user_id AS url,
               epoch,
               event_id AS seq,
               epoch_us(ts) AS ts_us,
               CASE WHEN event_type = 'error' THEN NULL
                    ELSE event_type END AS lang,
               (event_type = 'error') AS is_deleted
        FROM v
        WHERE rn = 1 AND user_id IN (SELECT user_id FROM keys)
        """,
        "benchmark_overlap": """
        WITH w AS (
          SELECT doc_id,
                 list_distinct([array_to_string(ws[j+1:j+3], ' ')
                                FOR j IN range(len(ws)-2)]) sh
          FROM (SELECT doc_id,
                       regexp_split_to_array(trim(lower(text)), '\\s+') ws
                FROM documents)
          WHERE len(ws) >= 3
        ),
        bench AS (SELECT DISTINCT unnest(sh) g FROM w WHERE doc_id % 97 = 0),
        ex AS (SELECT doc_id, unnest(sh) g FROM w)
        SELECT e.doc_id,
               count(*) AS n_shingles,
               count(b.g) AS n_overlap,
               round(count(b.g)::double / count(*), 6) AS overlap_frac
        FROM ex e LEFT JOIN bench b ON e.g = b.g
        GROUP BY e.doc_id
        """,
        "boilerplate_lines": """
        WITH lined AS (
          SELECT text || chr(10) || '(c) footer variant ' || (doc_id % 5)::varchar AS t
          FROM documents
        ),
        ex AS (
          SELECT unnest(list_distinct(string_split(t, chr(10)))) AS line
          FROM lined
        )
        SELECT line, count(*) AS n_docs
        FROM ex WHERE trim(line) <> ''
        GROUP BY line HAVING count(*) >= 10
        """,
        "paragraph_dedup": r"""
        WITH docs0 AS (
          SELECT doc_id,
                 concat('promo header ', (doc_id % 7)::varchar, chr(10),
                        text, chr(10),
                        '(c) footer ', (doc_id % 3)::varchar) AS text
          FROM documents
        ), parts AS (
          SELECT doc_id, string_split(text, chr(10)) AS l FROM docs0
        ), paras AS (
          SELECT doc_id, unnest(l) AS para,
                 unnest(range(1, len(l)+1)) - 1 AS pos
          FROM parts
        ), keyed AS (
          SELECT doc_id, pos, para,
                 CASE WHEN trim(para) <> ''
                      THEN md5(lower(trim(regexp_replace(para, '\s+', ' ', 'g'))))
                 END AS k
          FROM paras
        ), stats AS (
          SELECT k, count(DISTINCT doc_id) AS n_docs
          FROM keyed WHERE k IS NOT NULL
          GROUP BY k HAVING count(DISTINCT doc_id) >= 2
        ), ranked AS (
          SELECT doc_id, pos, para, k,
                 row_number() OVER (PARTITION BY k ORDER BY doc_id, pos) AS rn
          FROM keyed
        ), decided AS (
          SELECT r.doc_id, r.pos, r.para,
                 (s.k IS NULL OR r.rn = 1) AS keep
          FROM ranked r LEFT JOIN stats s USING (k)
        ), rebuilt AS (
          SELECT doc_id,
                 string_agg(CASE WHEN keep THEN para END, chr(10)
                            ORDER BY pos) AS new_text,
                 sum(CASE WHEN NOT keep THEN 1 ELSE 0 END)::bigint
                   AS n_paras_dropped
          FROM decided GROUP BY doc_id
        )
        SELECT d.doc_id, coalesce(r.new_text, '') AS text, r.n_paras_dropped
        FROM docs0 d JOIN rebuilt r USING (doc_id)
        """,
        "stratified_sample": """
        SELECT doc_id, lang FROM documents
        WHERE ('0x' || left(md5('mix1:' || doc_id::varchar), 8))::bigint
              / 4294967296.0
              < (CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25 ELSE 0.1 END)
        """,
        "audio_meta": """
        SELECT doc_id,
               1 AS channels,
               8000 * (1 + doc_id % 3) AS sample_rate,
               16 AS bits,
               64 + doc_id % 129 AS n_frames,
               round((64 + doc_id % 129)::double / (8000 * (1 + doc_id % 3)), 6)
                 AS duration_sec
        FROM documents
        """,
        "audio_features": """
        WITH g AS (
          SELECT doc_id, 8000 * (1 + doc_id % 3) AS rate,
                 64 + doc_id % 129 AS n
          FROM documents
        ),
        s AS (
          SELECT doc_id, rate, n,
                 sum(((doc_id * 31 + i.range * 17) % 4096 - 2048)
                     * ((doc_id * 31 + i.range * 17) % 4096 - 2048)) AS ss,
                 max(abs((doc_id * 31 + i.range * 17) % 4096 - 2048)) AS peak
          FROM g, range(193) i WHERE i.range < n
          GROUP BY doc_id, rate, n
        )
        SELECT doc_id AS id, rate AS sample_rate, n AS n_frames,
               sqrt(ss::double / n) AS rms, peak
        FROM s
        """,
        "agg_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity::decimal(18,2))::double AS sum_qty,
               sum(l_extendedprice::decimal(18,2))::double AS sum_base_price,
               sum((l_extendedprice::decimal(18,2) * (1::decimal(18,2) - l_discount::decimal(18,2)))::decimal(28,6))::double AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """,
        "join_revenue_topk": """
        SELECT c_custkey, c_name,
               sum(o_totalprice::decimal(18,2))::double AS revenue,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, c_custkey ASC LIMIT 10
        """,
        "join_shipping_priority": """
        SELECT l_orderkey,
               epoch_us(o_orderdate) AS o_orderdate_us,
               o_orderpriority,
               sum(((l_extendedprice * (1 - l_discount))::decimal(18,4)))::double
                 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
        """,
        "window_topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
          FROM orders
        ) WHERE rnk <= 3
        """,
        # connected components via transitive-closure recursive CTE; the
        # engine's min-label propagation must land on the identical
        # min-id-per-component labels
        "dup_clusters": _cc_oracle_sql() + """
        SELECT id AS doc_id, min(comp) AS component FROM reach GROUP BY id
        """,
        "dedup_keep_canonical": _cc_oracle_sql() + """
        , cc AS (SELECT id, min(comp) AS component FROM reach GROUP BY id),
        winners AS (
          SELECT id FROM (
            SELECT cc.id,
                   row_number() OVER (PARTITION BY cc.component
                                      ORDER BY d.n_chars DESC, cc.id DESC) rn
            FROM cc JOIN documents d ON d.doc_id = cc.id
          ) WHERE rn = 1
        )
        SELECT d.doc_id FROM documents d
        LEFT JOIN cc ON cc.id = d.doc_id
        WHERE cc.id IS NULL OR d.doc_id IN (SELECT id FROM winners)
        """,
        "sessionize_events": _SESSION_CTE + """
        SELECT event_id, user_id, session_idx,
               user_id::varchar || '#' || session_idx::varchar AS session_id
        FROM s
        """,
        "session_stats": _SESSION_CTE + """
        SELECT user_id,
               min(epoch_us(ts)) AS start_us,
               max(epoch_us(ts)) AS end_us,
               count(*)::bigint AS n_events,
               round((max(epoch_us(ts)) - min(epoch_us(ts))) / 1e6, 6) AS duration_sec
        FROM s GROUP BY user_id, session_idx
        """,
        # DuckDB's native ASOF LEFT JOIN is the independent oracle for the
        # union+carry-forward formulation (inclusive >= match)
        "asof_join_attrib": """
        WITH p AS (
          SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'purchase'
        ),
        c AS (
          SELECT user_id, ts, value AS click_value FROM events
          WHERE event_type = 'click'
        )
        SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, p.value,
               c.click_value, epoch_us(c.ts) AS click_ts_us
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        # msgpack_roundtrip: the parse side must invert the pack side
        # through the real wire format; the oracle just recomputes the
        # packed fields from documents.
        "msgpack_roundtrip": """
        SELECT doc_id, lang, text,
               doc_id / 4.0 AS score,
               (doc_id % 3 = 0) AS flag
        FROM documents
        """,
        "avro_roundtrip": """
        SELECT doc_id,
               CASE WHEN doc_id % 7 != 0 THEN lang END AS lang,
               text,
               doc_id * 0.125 AS score
        FROM documents
        """,
        "warc_roundtrip": """
        SELECT 'https://crawl.test/d' || doc_id AS url,
               TIMESTAMP '2024-01-01 00:00:00'
                 + doc_id * INTERVAL 1 SECOND AS warc_ts,
               200 AS http_status,
               'text/html; charset=utf-8' AS content_type,
               '<html><body>' || text || '</body></html>' AS html
        FROM documents
        """,
        # binlog_route_latest: recompute tag + latest-per-(table, url)
        # straight from documents (seq == pos == doc_id)
        "binlog_route_latest": """
        WITH m AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 2 = 0 THEN 'pages' ELSE 'assets' END
                   AS "table",
                 'https://r.test/d' || (doc_id % 50)::varchar AS url,
                 lang
          FROM documents
        )
        SELECT "table", url,
               arg_max(lang, doc_id) AS last_lang,
               max(doc_id) AS last_seq,
               count(*) AS n_events
        FROM m GROUP BY "table", url
        """,
        "debezium_parse": """
        WITH n AS (SELECT count(*) AS n FROM documents),
        births AS (
          SELECT doc_id AS seq, 'I' AS op, (doc_id % 5 = 0) AS is_snapshot,
                 'https://crawl.test/d' || doc_id AS url,
                 TIMESTAMP '2024-01-01 00:00:00'
                   + doc_id * INTERVAL 1 SECOND AS warc_ts,
                 md5('<html><body>' || text || '</body></html>') AS html_md5,
                 lang
          FROM documents
        ),
        updates AS (
          SELECT doc_id + n AS seq, 'U' AS op, false AS is_snapshot,
                 'https://crawl.test/d' || doc_id AS url,
                 TIMESTAMP '2024-01-01 00:00:00'
                   + (doc_id + n) * INTERVAL 1 SECOND AS warc_ts,
                 md5('<html><body>' || text || ' v2</body></html>') AS html_md5,
                 lang
          FROM documents, n WHERE doc_id % 3 = 0
        ),
        deletes AS (
          SELECT doc_id + 2 * n AS seq, 'D' AS op, false AS is_snapshot,
                 'https://crawl.test/d' || doc_id AS url,
                 TIMESTAMP '2024-01-01 00:00:00'
                   + doc_id * INTERVAL 1 SECOND AS warc_ts,
                 md5('<html><body>' || text || '</body></html>') AS html_md5,
                 lang
          FROM documents, n WHERE doc_id % 7 = 0
        )
        SELECT * FROM births
        UNION ALL SELECT * FROM updates
        UNION ALL SELECT * FROM deletes
        """,
        "dsir_weights": r"""
        WITH words AS (
          SELECT doc_id, (lang = 'en') AS is_target,
                 unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                    x -> x <> '')) AS w
          FROM documents
        ),
        bkt AS (
          SELECT doc_id, is_target,
                 ('0x' || left(md5('dsir:' || w), 8))::bigint % 1024 AS bkt
          FROM words
        ),
        counts AS (
          SELECT bkt,
                 count(*) FILTER (WHERE is_target) AS n_t,
                 count(*) AS n_r
          FROM bkt GROUP BY bkt
        ),
        tot AS (SELECT sum(n_t) AS nt_tot, sum(n_r) AS nr_tot FROM counts),
        ratios AS (
          SELECT bkt, ln((n_t + 1.0) / (nt_tot + 1024.0))
                      - ln((n_r + 1.0) / (nr_tot + 1024.0)) AS lr
          FROM counts, tot
        )
        SELECT b.doc_id, count(*) AS n_tokens, round(sum(r.lr), 6) AS dsir_logweight
        FROM bkt b JOIN ratios r USING (bkt)
        GROUP BY b.doc_id
        """,
        "substring_dedup": r"""
        WITH t AS (
          -- [ \t\n\x0B\f\r]: Java's \s spelled out — RE2's \s lacks
          -- \x0B, so a vertical tab tokenizes differently under a bare
          -- '\s+' (found by the round-5 cross-engine property fuzz)
          SELECT doc_id, text,
                 list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'),
                             x -> x <> '') AS toks
          FROM documents
        ),
        g AS (
          SELECT doc_id, i - 1 AS pos,
                 md5(lower(array_to_string(toks[i:i+7], ' '))) AS gkey
          FROM t, unnest(range(1, len(toks) - 6)) AS r(i)
          WHERE len(toks) >= 8
        ),
        s AS (
          SELECT doc_id, pos,
                 count(*) OVER (PARTITION BY gkey) AS cnt,
                 row_number() OVER (
                   PARTITION BY gkey ORDER BY doc_id, pos) AS rn
          FROM g
        ),
        red AS (SELECT doc_id, pos FROM s WHERE cnt >= 2 AND rn > 1),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN pos <= coalesce(max(pos + 8) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1)
                      THEN 0 ELSE 1 END AS new_island
          FROM red
        ),
        isl2 AS (
          SELECT doc_id, pos,
                 sum(new_island) OVER (
                   PARTITION BY doc_id ORDER BY pos) AS island
          FROM isl
        ),
        spans AS (
          SELECT doc_id, island, min(pos) AS sp_s, max(pos) + 8 AS sp_e
          FROM isl2 GROUP BY doc_id, island
        ),
        agg AS (
          -- ::bigint: DuckDB widens sum(BIGINT) to HUGEINT, which a
          -- pandas fetch floatifies (12345 -> 12345.0) and a strict
          -- value-hash then rejects against Spark's int64 (the r04
          -- driver-gate failure mode). Every integer sum that reaches
          -- an output column must be cast back down.
          SELECT doc_id, count(*) AS n_dup_spans,
                 sum(sp_e - sp_s)::bigint AS n_tokens_dropped
          FROM spans GROUP BY doc_id
        ),
        tokidx AS (
          SELECT t.doc_id, j AS idx, toks[j + 1] AS tok
          FROM t, unnest(range(0, len(toks))) AS r(j)
          WHERE t.doc_id IN (SELECT doc_id FROM agg)
        ),
        rebuilt AS (
          SELECT ti.doc_id, string_agg(ti.tok, ' ' ORDER BY ti.idx) AS new_text
          FROM tokidx ti
          WHERE NOT EXISTS (
            SELECT 1 FROM spans sp
            WHERE sp.doc_id = ti.doc_id
              AND ti.idx >= sp.sp_s AND ti.idx < sp.sp_e)
          GROUP BY ti.doc_id
        )
        SELECT t.doc_id,
               CASE WHEN a.doc_id IS NOT NULL
                    THEN coalesce(r.new_text, '') ELSE t.text END AS text,
               coalesce(a.n_dup_spans, 0) AS n_dup_spans,
               coalesce(a.n_tokens_dropped, 0) AS n_tokens_dropped
        FROM t
        LEFT JOIN agg a USING (doc_id)
        LEFT JOIN rebuilt r ON r.doc_id = t.doc_id
        """,
        "corpus_export": r"""
        SELECT ('0x' || left(md5('shard1:' || CAST(doc_id AS VARCHAR)), 8)
               )::bigint % 8 AS shard,
               count(*) AS rows,
               -- ::bigint — keep hugeint out of the output (see
               -- substring_dedup note; r04 driver-gate failure mode).
               -- explicit Java-\s class: RE2 \s lacks \x0B (fuzz find)
               sum(len(list_filter(
                   regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'),
                   x -> x <> '')))::bigint AS n_tokens,
               CAST(sum(('0x' || left(md5(CAST(doc_id AS VARCHAR)
                                          || chr(31) || text), 15))::bigint)
                    AS VARCHAR) AS content_sum
        FROM documents
        GROUP BY shard
        """,
        "vocab_topk": r"""
        SELECT token, count(*) AS n_occurrences
        FROM (
          -- explicit Java-\s class: RE2 \s lacks \x0B (fuzz find)
          SELECT unnest(list_filter(
                   regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'),
                   x -> x <> '')) AS token
          FROM documents
        )
        GROUP BY token
        ORDER BY n_occurrences DESC, token
        LIMIT 300
        """,
        "text_normalize": f"""
        WITH n AS (
          SELECT doc_id, text,
                 {_normalize_sql_expr('text')} AS text_norm
          FROM documents
        )
        SELECT doc_id, text_norm,
               (text_norm IS DISTINCT FROM text) AS changed,
               length(text_norm) AS n_chars_norm
        FROM n
        """,
        "html_extract": f"""
        WITH pages AS (
          SELECT doc_id, {_synth_html_sql()} AS html
          FROM documents
        ),
        x AS (
          SELECT doc_id, html,
                 trim(regexp_extract(html, '{_html_title_sql_pat()}', 1))
                   AS title,
                 {_html_strip_sql_expr('html')} AS main_text
          FROM pages
        )
        SELECT doc_id, title, main_text,
               round(length(main_text) / greatest(length(html), 1), 6)
                 AS text_ratio,
               len(regexp_split_to_array(trim(main_text), '\\s+')) AS n_words
        FROM x
        """,
        "doc_chunks": r"""
        WITH t AS (
          -- explicit Java-\s class: RE2 \s lacks \x0B (fuzz find)
          SELECT doc_id,
                 list_filter(
                     regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'),
                     x -> x <> '') AS toks
          FROM documents
        )
        SELECT doc_id,
               CAST(i AS INT) AS chunk_idx,
               CAST(i * 48 AS INT) AS chunk_start,
               CAST(least(len(toks) - i * 48, 64) AS INT) AS n_chunk_tokens,
               array_to_string(toks[i*48 + 1 : i*48 + 64], ' ') AS chunk_text
        FROM t, unnest(range(0,
               1 + CAST(ceil(greatest(len(toks) - 64, 0) / 48.0) AS BIGINT)
             )) AS r(i)
        WHERE len(toks) > 0
        """,
        "token_packing": r"""
        WITH t AS (
          -- explicit Java-\s class: RE2 \s lacks \x0B (fuzz find)
          SELECT doc_id,
                 len(list_filter(
                     regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'),
                     x -> x <> '')) AS n_tokens,
                 md5('pack1:' || CAST(doc_id AS VARCHAR)) AS okey
          FROM documents
        ),
        b AS (
          SELECT *,
                 CAST(('0x' || substr(okey, 1, 4))::BIGINT % 256 AS INT)
                   AS bkt
          FROM t
        ),
        o AS (
          -- ::bigint on the window sum — DuckDB widens sum(BIGINT) to
          -- HUGEINT, which pandas floatifies and a strict value-hash
          -- rejects vs Spark's int64 (the r04 driver-gate failure mode)
          SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                 coalesce(sum(n_tokens) OVER (
                   ORDER BY bkt, okey, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0)::bigint AS global_offset
          FROM b
        )
        SELECT doc_id, n_tokens, global_offset,
               (global_offset // 512)::bigint AS seq_id,
               (global_offset % 512)::bigint AS offset_in_seq,
               (global_offset % 512 + n_tokens) > 512 AS spans_boundary
        FROM o
        """,
        "lm_perplexity": _LM_SQL,
        "ccnet_buckets": f"""
        WITH lm AS ({_LM_SQL})
        SELECT doc_id, lang, bits_per_bigram, bucket,
               CASE WHEN bucket = 1 THEN 'head'
                    WHEN bucket = 3 THEN 'tail'
                    ELSE 'middle' END AS label
        FROM (
          SELECT d.doc_id, d.lang, lm.bits_per_bigram,
                 ntile(3) OVER (
                   PARTITION BY d.lang
                   ORDER BY lm.bits_per_bigram, lm.doc_id) AS bucket
          FROM lm JOIN documents d ON d.doc_id = lm.doc_id
        )
        """,
        "semantic_dedup": _semantic_dedup_sql(),
        "url_filter": r"""
        WITH u AS (
          SELECT doc_id,
            'https://'
            || (CASE doc_id % 3 WHEN 0 THEN 'www.' WHEN 1 THEN 'bad.' ELSE '' END)
            || (CASE doc_id % 4 WHEN 0 THEN 'Blocked.COM' WHEN 1 THEN 'example.org'
                                WHEN 2 THEN 'site.net' ELSE 'good.io' END)
            || (CASE WHEN doc_id % 5 = 0 THEN '/ads/x'
                     ELSE '/p' || (doc_id % 7)::varchar END) AS url
          FROM documents
        ),
        k AS (
          SELECT doc_id, url,
            lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1)) AS host,
            lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1))
              || regexp_replace(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', '') AS canon
          FROM u
        ),
        kd AS (
          SELECT *, regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS dom FROM k
        ),
        r AS (
          SELECT * FROM (VALUES
            ('domain', 'blocked.com'),
            ('host', 'bad.example.org'),
            ('prefix', 'https://www.site.net/ads')) AS t(kind, pattern)
        ),
        rk AS (
          SELECT kind, pattern,
            CASE WHEN kind = 'prefix' THEN regexp_extract(
                   lower(regexp_extract(pattern, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1)),
                   '([^.]+\.[^.]+)$', 1)
                 ELSE regexp_extract(lower(pattern), '([^.]+\.[^.]+)$', 1)
            END AS rule_domain
          FROM r
        )
        SELECT doc_id, url FROM kd
        WHERE NOT EXISTS (
          SELECT 1 FROM rk
          WHERE kd.dom = rk.rule_domain AND (
            (kind = 'domain' AND kd.dom = lower(pattern))
            OR (kind = 'host' AND (kd.host = lower(pattern)
                                   OR kd.host LIKE '%.' || lower(pattern)))
            OR (kind = 'prefix' AND kd.canon LIKE pattern || '%')
          )
        )
        """,
        # scd2_join_asof: rebuild the dim CTE (same as scd2_history),
        # probe each event 30 min later with the validity predicate
        "scd2_join_asof": """
        WITH ordered AS (
          SELECT user_id, event_type, ts, event_id,
                 row_number() OVER w AS rn,
                 lag(event_type) OVER w AS prev_type
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        chg AS (
          SELECT * FROM ordered
          WHERE rn = 1 OR prev_type IS DISTINCT FROM event_type
        ),
        dim AS (
          SELECT user_id, event_type,
                 ts AS valid_from,
                 lead(ts) OVER w2 AS valid_to,
                 row_number() OVER w2 AS version
          FROM chg
          WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        facts AS (
          SELECT event_id, user_id,
                 ts + INTERVAL 30 MINUTE AS probe_ts
          FROM events
        )
        SELECT f.event_id, f.user_id,
               epoch_us(f.probe_ts) AS probe_ts_us,
               d.event_type AS dim_type,
               d.version AS dim_version
        FROM facts f
        LEFT JOIN dim d
          ON f.user_id = d.user_id
         AND f.probe_ts >= d.valid_from
         AND (d.valid_to IS NULL OR f.probe_ts < d.valid_to)
        """,
        "scd2_history": """
        WITH ordered AS (
          SELECT user_id, event_type, ts, event_id,
                 row_number() OVER w AS rn,
                 lag(event_type) OVER w AS prev_type
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        chg AS (
          SELECT * FROM ordered
          WHERE rn = 1 OR prev_type IS DISTINCT FROM event_type
        )
        SELECT user_id, event_type,
               epoch_us(ts) AS valid_from_us,
               epoch_us(lead(ts) OVER w2) AS valid_to_us,
               row_number() OVER w2 AS version,
               (lead(ts) OVER w2 IS NULL) AS is_current
        FROM chg
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "pagerank": _pagerank_oracle_sql(5, 0.85) + """
        SELECT node, round(rank, 12) AS rank FROM r5
        """,
        "hits_scores": _hits_oracle_sql(4),
        # feed round-trip: expected records rebuilt straight from
        # events; pub_us = second-truncated ts as epoch micros
        "feed_parse": """
        SELECT CASE WHEN user_id % 2 = 0 THEN 'rss' ELSE 'atom' END AS kind,
               'evt:' || event_id AS guid,
               event_type || ' #' || event_id AS title,
               'https://example.com/u/' || user_id || '/e/' || event_id AS link,
               epoch_us(date_trunc('second', ts)) AS pub_us
        FROM events
        """,
        # cross-snapshot change classification: the chunk pipeline
        # (identical to chunk_dedup's) runs over BOTH snapshots; the
        # class is decided on integer char counts
        "page_change_classify": _page_change_oracle_sql(),
        # feed-driven staleness: the stale+new fetch set rebuilt from
        # events (%3==0 current → drop, ==1 stale, ==2 new)
        "feed_refresh_candidates": """
        SELECT 'https://example.com/u/' || user_id || '/e/' || event_id AS url,
               epoch_us(date_trunc('second', ts)) AS feed_us,
               CASE WHEN event_id % 3 = 2 THEN 'new' ELSE 'stale' END AS status
        FROM events WHERE event_id % 3 <> 0
        """,
        # DynamoDB Streams: expected typed rows rebuilt straight from
        # events (REMOVE = key-only tombstone, MODIFY = n*3+1 image)
        "dynamodb_stream_parse": """
        SELECT CASE event_id % 5 WHEN 0 THEN 'D' WHEN 1 THEN 'U' ELSE 'I' END AS op,
               event_id AS seq,
               event_id::varchar AS seq_str,
               epoch_ms(date_trunc('second', ts)) AS src_ts_ms,
               false AS is_snapshot, false AS is_partial,
               'e' || event_id AS pk,
               CASE WHEN event_id % 5 = 0 THEN NULL ELSE event_type END AS etype,
               CASE event_id % 5 WHEN 0 THEN NULL
                    WHEN 1 THEN event_id * 3 + 1
                    ELSE event_id * 3 END AS n,
               CASE WHEN event_id % 5 = 0 THEN NULL
                    ELSE event_id % 2 = 0 END AS ok
        FROM events
        """,
        # KMV bottom-k sketches: identical md5-prefix uniform, k-min
        # via row_number, estimators recomputed with the same exact
        # IEEE arithmetic ((k-1)/u_k, shared/|merged|)
        "kmv_overlap": """
        WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
        u AS (
          SELECT event_type, user_id,
                 ('0x' || left(md5('kmv1:' || user_id), 8))::bigint / 4294967296.0 AS u
          FROM d
        ),
        r AS (
          SELECT event_type, u,
                 row_number() OVER (PARTITION BY event_type ORDER BY u, user_id) AS rn
          FROM u
        ),
        sk AS (
          SELECT event_type, list(u ORDER BY u) AS sk
          FROM r WHERE rn <= 64 GROUP BY event_type
        ),
        p AS (
          SELECT a.event_type AS event_type_1, b.event_type AS event_type_2,
                 a.sk AS sk1, b.sk AS sk2,
                 list_slice(list_sort(list_distinct(list_concat(a.sk, b.sk))), 1, 64) AS m
          FROM sk a JOIN sk b ON a.event_type < b.event_type
        ),
        q AS (
          SELECT event_type_1, event_type_2,
                 len(list_filter(m, x -> list_contains(sk1, x) AND list_contains(sk2, x)))::bigint AS shared,
                 CASE WHEN len(m) < 64 THEN len(m)::double ELSE 63.0 / m[64] END AS ue,
                 len(m)::double AS lm
          FROM p
        )
        SELECT event_type_1, event_type_2, shared,
               round(ue, 12) AS union_est,
               round(shared / lm, 12) AS jaccard_est,
               round((shared / lm) * ue, 12) AS intersect_est
        FROM q
        """,
        # Merkle anti-entropy: identical md5/bit_xor digest algebra at
        # leaf level; digest-or-count mismatch = divergent bucket
        "replica_merkle_diff": """
        WITH a AS (SELECT doc_id, text, lang FROM documents),
        b AS (
          SELECT doc_id, text,
                 CASE WHEN doc_id % 83 = 0 THEN 'xx' ELSE lang END AS lang
          FROM documents WHERE doc_id % 97 <> 3
          UNION ALL SELECT 999999, 'extra row', 'en'
        ),
        da AS (
          SELECT ('0x' || substr(md5('mrkb:' || doc_id), 1, 15))::bigint % 4096 AS leaf,
                 bit_xor(('0x' || substr(md5('mrk1:' || doc_id || '|' || text || chr(1) || lang), 1, 15))::bigint) AS digest,
                 count(*)::bigint AS n
          FROM a GROUP BY 1
        ),
        db AS (
          SELECT ('0x' || substr(md5('mrkb:' || doc_id), 1, 15))::bigint % 4096 AS leaf,
                 bit_xor(('0x' || substr(md5('mrk1:' || doc_id || '|' || text || chr(1) || lang), 1, 15))::bigint) AS digest,
                 count(*)::bigint AS n
          FROM b GROUP BY 1
        )
        SELECT COALESCE(da.leaf, db.leaf) AS leaf,
               COALESCE(da.n, 0) AS n_a, COALESCE(db.n, 0) AS n_b,
               COALESCE(da.digest, 0) AS digest_a,
               COALESCE(db.digest, 0) AS digest_b
        FROM da FULL OUTER JOIN db ON db.leaf = da.leaf
        WHERE COALESCE(da.digest, 0) <> COALESCE(db.digest, 0)
           OR COALESCE(da.n, 0) <> COALESCE(db.n, 0)
        """,
        # incremental == batch: partition the batch chunking's distinct
        # hash set by first-seen epoch (doc_id%4); dup = occurrences
        # answered by content stored earlier (incl. same-epoch repeats)
        "incremental_chunk_store": """
        WITH d AS (
          SELECT doc_id, text, length(text) AS L, doc_id % 4 AS epoch
          FROM documents WHERE text IS NOT NULL AND length(text) >= 1
        ),
        cut AS (
          SELECT d.doc_id, t.i AS e
          FROM d, UNNEST(generate_series(16, d.L - 1)) AS t(i)
          WHERE ('0x' || substr(md5('cdcc:' || substr(d.text, t.i - 15, 16)), 1, 8))::bigint % 64 = 0
        ),
        ends AS (
          SELECT doc_id, e FROM cut UNION ALL SELECT doc_id, L FROM d
        ),
        ch AS (
          SELECT doc_id, e, lag(e, 1, 0) OVER (PARTITION BY doc_id ORDER BY e) AS s
          FROM ends
        ),
        occ AS (
          SELECT d.epoch, md5(substr(d.text, c.s + 1, c.e - c.s)) AS h,
                 c.e - c.s AS ln
          FROM ch c JOIN d ON d.doc_id = c.doc_id
        ),
        first_seen AS (
          SELECT h, min(epoch) AS fe, max(ln) AS ln FROM occ GROUP BY h
        ),
        seen AS (SELECT epoch, count(*)::bigint AS chunks_seen FROM occ GROUP BY epoch),
        novel AS (
          SELECT fe AS epoch, count(*)::bigint AS new_chunks,
                 sum(ln)::bigint AS new_chars
          FROM first_seen GROUP BY fe
        )
        SELECT s.epoch::bigint AS epoch, s.chunks_seen,
               COALESCE(n.new_chunks, 0)::bigint AS new_chunks,
               (s.chunks_seen - COALESCE(n.new_chunks, 0))::bigint AS dup_chunks,
               COALESCE(n.new_chars, 0)::bigint AS new_chars
        FROM seen s LEFT JOIN novel n ON n.epoch = s.epoch
        """,
        # weighted Poisson sampling: p = min(1, 0.25·n_chars/mean),
        # u = exact md5-prefix scaling — no libm in the decision path
        "weighted_sample": """
        WITH s AS (SELECT sum(n_chars)::double / count(*) AS avgc FROM documents)
        SELECT doc_id, lang, n_chars,
               round(least(1.0, 0.25 * (n_chars / avgc)), 12) AS incl_p,
               round(1.0 / least(1.0, 0.25 * (n_chars / avgc)), 12) AS ht_factor
        FROM documents, s
        WHERE ('0x' || left(md5('wps1:' || doc_id), 8))::bigint / 4294967296.0
              < least(1.0, 0.25 * (n_chars / avgc))
        """,
        # content-defined chunking: identical md5-window cut rule
        # (window 16, divisor 64, salt 'cdcc:') recomputed via lateral
        # generate_series; keeper = min(doc_id*1e5+idx) per chunk md5
        "chunk_dedup": """
        WITH d AS (
          SELECT doc_id, text, length(text) AS L FROM documents
          WHERE text IS NOT NULL AND length(text) >= 1
        ),
        cut AS (
          SELECT d.doc_id, t.i AS e
          FROM d, UNNEST(generate_series(16, d.L - 1)) AS t(i)
          WHERE ('0x' || substr(md5('cdcc:' || substr(d.text, t.i - 15, 16)), 1, 8))::bigint % 64 = 0
        ),
        ends AS (
          SELECT doc_id, e FROM cut
          UNION ALL
          SELECT doc_id, L FROM d
        ),
        ch AS (
          SELECT doc_id, e,
                 lag(e, 1, 0) OVER (PARTITION BY doc_id ORDER BY e) AS s,
                 row_number() OVER (PARTITION BY doc_id ORDER BY e) - 1 AS chunk_idx
          FROM ends
        ),
        occ AS (
          SELECT c.doc_id,
                 md5(substr(d.text, c.s + 1, c.e - c.s)) AS h,
                 c.doc_id * 100000 + c.chunk_idx AS okey,
                 c.e - c.s AS chunk_len
          FROM ch c JOIN d ON d.doc_id = c.doc_id
        ),
        keep AS (SELECT h, min(okey) AS keeper FROM occ GROUP BY h)
        SELECT o.doc_id,
               count(*)::bigint AS n_chunks,
               sum(CASE WHEN o.okey <> k.keeper THEN 1 ELSE 0 END)::bigint AS dup_chunks,
               sum(CASE WHEN o.okey <> k.keeper THEN o.chunk_len ELSE 0 END)::bigint AS dup_chars
        FROM occ o JOIN keep k ON k.h = o.h
        GROUP BY o.doc_id
        """,
        "bloom_dedup": """
        WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 0),
        batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0),
        bpos AS (
          SELECT (('0x' || substr(md5('bf' || i::varchar || ':' || text), 1, 15))::bigint
                  % 1048576) AS p
          FROM corpus, range(5) t(i)
        ),
        bloom AS (
          SELECT p // 63 AS word, bit_or(1::bigint << (p % 63)::int) AS bits
          FROM bpos GROUP BY 1
        ),
        probe AS (
          SELECT doc_id,
                 (('0x' || substr(md5('bf' || i::varchar || ':' || text), 1, 15))::bigint
                  % 1048576) AS p
          FROM batch, range(5) t(i)
        ),
        hits AS (
          SELECT pr.doc_id,
                 min(CASE WHEN b.bits IS NOT NULL
                               AND (b.bits & (1::bigint << (pr.p % 63)::int)) <> 0
                          THEN 1 ELSE 0 END) AS allset
          FROM probe pr LEFT JOIN bloom b ON b.word = pr.p // 63
          GROUP BY pr.doc_id
        ),
        ex AS (
          SELECT ba.doc_id,
                 (count(c.text) > 0) AS exact_present
          FROM batch ba
          LEFT JOIN (SELECT DISTINCT text FROM corpus) c ON c.text = ba.text
          GROUP BY ba.doc_id
        )
        SELECT h.doc_id, (h.allset = 1) AS maybe_present, e.exact_present
        FROM hits h JOIN ex e ON e.doc_id = h.doc_id
        """,
        "metrics_rollup": """
        SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               grouping_id(event_type, strftime(date_trunc('day', ts), '%Y-%m-%d')) AS grp,
               count(*) AS n_events,
               round(sum(value), 6) AS sum_value,
               count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY ROLLUP(event_type, strftime(date_trunc('day', ts), '%Y-%m-%d'))
        """,
        "hll_distinct": _hll_oracle(),
        "bm25_scores": _bm25_oracle(),
        "heavy_hitters": _cms_oracle(),
        "length_quantiles": _quantiles_oracle(),
        "sample_exact_k": r"""
        SELECT event_type, event_id FROM (
          SELECT event_type, event_id,
                 row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY ('0x' || left(md5('mix1:' || event_id::varchar), 8))::bigint
                            / 4294967296.0 ASC, event_id ASC) AS rn
          FROM events) WHERE rn <= 5
        """,
        "incremental_term_df": r"""
        WITH corpus AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 4 = 1 THEN text || ' upd1' ELSE text END
                   AS text
          FROM documents WHERE doc_id % 10 <> 3
        ),
        toked AS (
          SELECT doc_id,
                 list_distinct(list_filter(
                   regexp_split_to_array(trim(lower(text)), '\s+'),
                   x -> x <> '')) AS toks
          FROM corpus
        )
        SELECT t AS term, count(*)::bigint AS df
        FROM (SELECT doc_id, unnest(toks) AS t FROM toked)
        GROUP BY t
        """,
        "interval_window_counts": r"""
        WITH wins AS (
          SELECT i AS win_id,
                 1704067200000000 + i * 7200000000 AS lo,
                 1704067200000000 + i * 7200000000 + 2700000000 AS hi
          FROM range(360) t(i)
        )
        SELECT w.win_id, count(*) AS n_events,
               count(DISTINCT e.user_id) AS n_users
        FROM wins w JOIN events e
          ON epoch_us(e.ts) >= w.lo AND epoch_us(e.ts) < w.hi
        GROUP BY w.win_id
        """,
        "quality_classifier": _logreg_oracle(),
        "group_split": """
        WITH u AS (
          SELECT user_id,
                 ('0x' || left(md5('split1:' || user_id::varchar), 8))::bigint
                   / 4294967296.0 AS h
          FROM events
        ),
        s AS (
          SELECT user_id,
                 -- cumulative boundaries as the operator's Python doubles
                 -- (0.8 + 0.1 = 0.9000000000000001 in binary64), never a
                 -- re-derived decimal literal
                 CASE WHEN h < 0.8 THEN 'train'
                      WHEN h < 0.9000000000000001 THEN 'val'
                      ELSE 'test' END AS split
          FROM u
        )
        SELECT split, count(*) AS n_rows, count(DISTINCT user_id) AS n_groups
        FROM s GROUP BY split
        """,
        "link_extract": r"""
        WITH pages AS (
          SELECT 'h' || (doc_id % 37)::varchar || '.example.com' AS src_host,
                 '<html><body><p>' || text || '</p>'
                 || '<a href="http://h' || (doc_id % 29)::varchar || '.example.com/p">x</a>'
                 || CASE WHEN doc_id % 3 = 0
                         THEN '<a href="ftp://skip.me/f">f</a>'
                              || '<a href="https://h' || (doc_id % 11)::varchar
                              || '.example.org/q#frag">y</a>'
                         ELSE '<a href="/relative/skip">r</a>' END
                 || '</body></html>' AS html
          FROM documents
        ),
        links AS (
          SELECT src_host, unnest(regexp_extract_all(html, 'href\s*=\s*"([^"]*)"', 1)) AS dst
          FROM pages
        ),
        edges AS (
          SELECT DISTINCT src_host,
                 lower(regexp_extract(dst, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1)) AS dst_host
          FROM links
          WHERE regexp_matches(dst, '^https?://')
        )
        SELECT dst_host, count(*) AS n_src_hosts
        FROM edges WHERE src_host <> dst_host GROUP BY dst_host
        """,
        "anchor_topk": r"""
        WITH pages AS (
          SELECT 'h' || (doc_id % 37)::varchar || '.example.com' AS src_host,
                 '<html><body><p>' || text || '</p>'
                 || '<a href="http://h' || (doc_id % 29)::varchar
                 || '.example.com/p">site ' || (doc_id % 5)::varchar || '</a>'
                 || CASE WHEN doc_id % 4 = 0
                         THEN '<a class="x" href="https://h' || (doc_id % 11)::varchar
                              || '.example.org/q"> read  more </a>'
                              || '<a href="http://img.example.net/i"></a>'
                         ELSE '<a href="/rel">skip</a>' END
                 || '</body></html>' AS html
          FROM documents
        ),
        m AS (
          SELECT src_host,
                 unnest(regexp_extract_all(html,
                   '<a\s[^>]*?href\s*=\s*"([^"]*)"[^>]*>([^<]*)</a>', 1)) AS href,
                 unnest(regexp_extract_all(html,
                   '<a\s[^>]*?href\s*=\s*"([^"]*)"[^>]*>([^<]*)</a>', 2)) AS anchor
          FROM pages
        ),
        edges AS (
          SELECT DISTINCT src_host,
                 lower(regexp_extract(href,
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1)) AS dst_host,
                 trim(anchor) AS anchor
          FROM m WHERE regexp_matches(href, '^https?://')
        ),
        counts AS (
          SELECT dst_host, anchor, count(*) AS n_hosts
          FROM edges WHERE src_host <> dst_host AND anchor <> ''
          GROUP BY dst_host, anchor
        )
        SELECT dst_host, anchor, n_hosts,
               row_number() OVER (PARTITION BY dst_host
                                  ORDER BY n_hosts DESC, anchor ASC) AS rnk
        FROM counts QUALIFY rnk <= 2
        """,
        "data_quality": r"""
        WITH n AS (SELECT count(*) AS checked FROM events)
        SELECT 'user_id:not_null' AS rule,
               (SELECT count(*) FROM events WHERE user_id IS NULL) AS violations,
               checked FROM n
        UNION ALL
        SELECT 'value:range[0,10]',
               (SELECT count(*) FROM events
                WHERE value IS NOT NULL AND NOT (value >= 0 AND value <= 10)),
               checked FROM n
        UNION ALL
        SELECT 'event_type:in_set',
               (SELECT count(*) FROM events
                WHERE event_type IS NOT NULL
                  AND event_type NOT IN ('click','view','purchase')),
               checked FROM n
        UNION ALL
        SELECT 'props:regex',
               (SELECT count(*) FROM events
                WHERE props IS NOT NULL AND NOT regexp_matches(props, '^\{')),
               checked FROM n
        UNION ALL
        SELECT 'ts_in_2024',
               (SELECT count(*) FROM events
                WHERE NOT (ts >= TIMESTAMP '2024-01-01 00:00:00')),
               checked FROM n
        UNION ALL
        SELECT 'event_id:unique',
               -- ::bigint keeps hugeint (pandas-floatified) out of the
               -- UNION'd violations column (r04 driver-gate failure mode)
               coalesce((SELECT sum(c) FROM (
                  SELECT count(*) AS c FROM events WHERE event_id IS NOT NULL
                  GROUP BY event_id HAVING count(*) > 1)), 0)::bigint,
               (SELECT count(*) FROM events WHERE event_id IS NOT NULL)
        """,
        "bpe_merges": _bpe_oracle(),
        "bpe_encode": _bpe_encode_oracle(),
        "robots_permissions": _robots_oracle(),
        "crawl_frontier": _frontier_oracle(),
        "recrawl_schedule": _recrawl_oracle(),
        "incremental_agg_view": """
        WITH fin AS (
          SELECT lang,
                 CASE WHEN doc_id % 4 = 1 THEN text || ' upd1' ELSE text END
                   AS t
          FROM documents WHERE doc_id % 10 <> 3
        )
        SELECT lang,
               sum(octet_length(encode(t)))::BIGINT AS bytes,
               count(*)::BIGINT AS n_rows
        FROM fin GROUP BY lang
        """,
        "jdbc_mode_merge": """
        WITH inc AS (
          SELECT CAST(o_custkey AS BIGINT) AS custkey,
                 'merged' AS name,
                 ROUND(SUM(o_totalprice), 2) AS acctbal
          FROM orders GROUP BY o_custkey
        )
        SELECT CAST(c_custkey AS BIGINT) AS custkey,
               c_name AS name,
               ROUND(CAST(c_acctbal AS DOUBLE), 2) AS acctbal
        FROM customer
        WHERE c_custkey NOT IN (SELECT custkey FROM inc)
        UNION ALL
        SELECT custkey, name, acctbal FROM inc
        """,
        "filter_base64": """
        SELECT event_id,
               to_base64(encode(props)) AS enc_src,
               event_type AS dec_src,
               CAST(NULL AS VARCHAR) AS bad_b64
        FROM events
        """,
        "filter_hash_cols": """
        SELECT event_id,
               CASE WHEN user_id IS NOT NULL
                    THEN sha256('pepper' || CAST(user_id AS VARCHAR)) END
                 AS user_id,
               CASE WHEN props IS NOT NULL THEN md5(props) END AS props_md5
        FROM events
        """,
        "filter_gsub_cols": """
        SELECT doc_id,
               CAST(length(regexp_replace(text, '[aeiou]', '_', 'g'))
                    AS INTEGER) AS n,
               substr(regexp_replace(text, '[aeiou]', '_', 'g'), 1, 40)
                 AS head
        FROM documents
        """,
        "filter_split_rows": """
        SELECT doc_id, trim(w) AS word
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents WHERE doc_id < 50)
        """,
        "parser_ltsv": """
        SELECT CAST(event_id AS BIGINT) AS event_id,
               event_type AS etype,
               CAST(value AS DOUBLE) AS value
        FROM events
        """,
    }


def _hll_oracle() -> str:
    from embulk_spark.operators.sketch import hll_oracle_sql

    return hll_oracle_sql("events", "user_id", ["event_type"])


#: DuckDB mirror of _synth_robots_and_urls' robots frame — shared by the
#: robots_permissions and crawl_frontier oracles.
_ROBOTS_SYNTH_SQL = """
      SELECT 'host' || h::VARCHAR || '.example.org' AS host,
             CASE WHEN h % 2 = 0 THEN base || spec ELSE base END AS robots_txt
      FROM (
        SELECT h,
               '# corpus politeness' || chr(10) || 'User-agent: *' || chr(10)
                 || 'Disallow: /private' || chr(10)
                 || 'Allow: /private/ok' || chr(10)
                 || 'Disallow:' || chr(10) AS base,
               'User-agent: GoodBot' || chr(10) || 'User-agent: OtherBot'
                 || chr(10) || 'Disallow: /p' || (h % 3)::VARCHAR || chr(10)
                 || 'Allow: /p' || (h % 3)::VARCHAR || '2' || chr(10) AS spec
        FROM (SELECT DISTINCT (doc_id % 8)::INT AS h FROM documents)
      )
    """


def _robots_oracle() -> str:
    from embulk_spark.operators.robots import robots_oracle_sql

    urls_sql = """
      SELECT 'https://host' || (doc_id % 8)::VARCHAR || '.example.org' ||
             CASE WHEN doc_id % 11 = 0 THEN '/private/okay'
                  WHEN doc_id % 7 = 0 THEN '/private/file'
                  ELSE '/p' || (doc_id % 13)::VARCHAR || '/x' END AS url
      FROM documents
    """
    return robots_oracle_sql(urls_sql, _ROBOTS_SYNTH_SQL, agent="goodbot")


#: DuckDB mirror of _synth_sitemaps: same entry construction, same
#: sorted-within-body concatenation (string_agg ORDER BY ≡ array_sort).
_SITEMAPS_SYNTH_SQL = """
  SELECT host,
         '<?xml version="1.0"?><urlset>'
           || string_agg(entry, '' ORDER BY entry) || '</urlset>'
           AS sitemap_xml
  FROM (
    SELECT 'host' || (doc_id % 8)::VARCHAR || '.example.org' AS host,
           '<url><loc>https://host' || (doc_id % 8)::VARCHAR
             || '.example.org'
             || CASE WHEN doc_id % 11 = 0 THEN '/private/okay'
                     WHEN doc_id % 7 = 0 THEN '/private/file'
                     ELSE '/p' || (doc_id % 13)::VARCHAR || '/x' END
             || '</loc>'
             || CASE WHEN doc_id % 5 <> 0
                     THEN '<lastmod>2026-0'
                          || (1 + doc_id % 9)::VARCHAR || '-'
                          || (10 + doc_id % 19)::VARCHAR || '</lastmod>'
                     ELSE '' END
             || CASE WHEN doc_id % 4 <> 0
                     THEN '<priority>0.' || (doc_id % 10)::VARCHAR
                          || '</priority>'
                     ELSE '' END
             || '</url>' AS entry
    FROM documents
  )
  GROUP BY host
"""


def _recrawl_oracle() -> str:
    from embulk_spark.operators.recrawl import recrawl_oracle_sql

    changes_sql = (
        "SELECT 'https://host' || (user_id % 8)::VARCHAR "
        "|| '.example.org/u' || user_id::VARCHAR AS url, ts FROM events"
    )
    return recrawl_oracle_sql(changes_sql)


def _frontier_oracle() -> str:
    from embulk_spark.operators.frontier import frontier_oracle_sql

    return frontier_oracle_sql(
        _SITEMAPS_SYNTH_SQL, _ROBOTS_SYNTH_SQL, agent="goodbot",
        delay_sec=1.5,
    )


def _bpe_encode_oracle() -> str:
    from embulk_spark.operators.bpe import bpe_encode_oracle_sql

    return bpe_encode_oracle_sql(BPE_ENCODE_RULES, id_col="doc_id")


def _bm25_oracle() -> str:
    from embulk_spark.operators.retrieval import bm25_oracle_sql

    return bm25_oracle_sql("documents", _BM25_TERMS)


def _cms_oracle() -> str:
    from embulk_spark.operators.cms import cms_oracle_sql

    return cms_oracle_sql("events", "user_id", threshold=70)


def _quantiles_oracle() -> str:
    from embulk_spark.operators.quantiles import quantiles_oracle_sql

    return quantiles_oracle_sql(
        "documents", "n_chars", ["lang"], [0.5, 0.9, 0.99]
    )


def _logreg_oracle() -> str:
    from embulk_spark.operators.classifier import logreg_oracle_sql

    aug = (
        "(SELECT doc_id, text || CASE WHEN doc_id % 3 = 0 "
        "THEN ' premium curated' ELSE ' lowgrade boiler' END AS text, "
        "(doc_id % 3 = 0) AS y_true FROM documents) aug"
    )
    return logreg_oracle_sql(aug, "y_true")
