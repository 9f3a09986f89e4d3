"""Row/column-level filter plugins from the Embulk plugin ecosystem,
re-expressed as pure Column expressions (no Python in the data path).

The reference distribution ships only remove_columns/rename
(build.gradle:17-18); the ecosystem's most-installed filters are
row-predicate, column add/drop/reorder, typecast, add_time and
expand_json. Their semantics are public plugin contracts:

- filter-row      — per-row predicate chain, conditions AND/OR-combined,
                    each ``{column, operator, argument, not}``.
- filter-column   — ``columns:`` keep+reorder (with ``src``/``default``
                    backfill), ``add_columns:``, ``drop_columns:``.
- filter-typecast — cast columns between the six Embulk types with the
                    engine's coercion-setter semantics (functions/coerce
                    mirrors spi's *ColumnSetter, so a failed cast nulls
                    instead of erroring — reference default-value policy).
- filter-add_time — materialize an event-time column from a fixed value,
                    another column, or ingest time.
- filter-expand_json — one JSON column → typed top-level columns via an
                    RFC 6901 pointer root (same pointer grammar as the
                    json parser, spi/json/JsonParser.java:29-41).

Everything here stays inside whole-stage codegen: predicates are Column
trees, JSON expansion is ``get_json_object``/``from_json``, casts are the
coerce exprs — Catalyst pushes row predicates below the parse where the
source allows it, so at 100 TB a selective filter-row prunes at the scan.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.coerce import (
    EMBULK_TO_SPARK,
    coerce,
    string_to_timestamp,
)

# spark type → embulk type name, for deriving coercion directions from the
# frame's actual schema (filter-typecast declares only the TARGET type)
_SPARK_TO_EMBULK = {
    T.BooleanType(): "boolean",
    T.LongType(): "long",
    T.IntegerType(): "long",
    T.DoubleType(): "double",
    T.FloatType(): "double",
    T.StringType(): "string",
    T.TimestampType(): "timestamp",
    # parquet written without session-tz binding reads back as NTZ; the
    # engine pins the session tz to UTC so both are the same instant
    T.TimestampNTZType(): "timestamp",
}


def _embulk_type_of(df: DataFrame, name: str) -> str:
    dt = df.schema[name].dataType
    return _SPARK_TO_EMBULK.get(dt, "string")


# ---------------------------------------------------------------------------
# filter-row
# ---------------------------------------------------------------------------

#: operator name → Column builder; string operators follow the public
#: filter-row contract (start_with/end_with/include), regexp is rlike.
_ROW_OPS = {
    "==": lambda c, a: c.eqNullSafe(a),
    "!=": lambda c, a: ~c.eqNullSafe(a),
    ">": lambda c, a: c > a,
    ">=": lambda c, a: c >= a,
    "<": lambda c, a: c < a,
    "<=": lambda c, a: c <= a,
    "start_with": lambda c, a: c.startswith(a),
    "end_with": lambda c, a: c.endswith(a),
    "include": lambda c, a: c.contains(a),
    # rlike takes the pattern as a plain str (not a Column) in classic pyspark
    "regexp": lambda c, a: c.rlike(a),
}


def row_condition(df: DataFrame, cond: dict) -> Column:
    """One ``{column, operator, argument, not, format}`` condition as a
    Column predicate. The argument literal is cast to the column's type
    (timestamp arguments honor an optional strptime ``format`` like the
    column configs do); ``IS NULL`` / ``IS NOT NULL`` take no argument."""
    col = F.col(cond["column"])
    op = str(cond.get("operator", "==")).strip()
    opu = op.upper()
    if opu in ("IS NULL", "NULL"):
        pred = col.isNull()
    elif opu in ("IS NOT NULL", "NOT NULL"):
        pred = col.isNotNull()
    else:
        fn = _ROW_OPS.get(op)
        if fn is None:
            raise ValueError(f"filter-row: unknown operator {op!r}")
        arg = cond["argument"]
        dt = df.schema[cond["column"]].dataType
        if op == "regexp":
            lit: Column | str = str(arg)
        elif isinstance(dt, T.TimestampType) and isinstance(arg, str):
            lit = string_to_timestamp(F.lit(arg), cond.get("format"))
        elif op in ("start_with", "end_with", "include"):
            lit = F.lit(str(arg))
        else:
            lit = F.lit(arg).cast(dt)
        pred = fn(col, lit)
    if cond.get("not"):
        pred = ~pred
    return pred


def row_filter(df: DataFrame, conditions: list[dict], condition: str = "AND") -> DataFrame:
    """filter-row: keep rows where the conditions hold, AND- or
    OR-combined. An empty condition list keeps everything."""
    if not conditions:
        return df
    preds = [row_condition(df, c) for c in conditions]
    combined = preds[0]
    for p in preds[1:]:
        combined = (combined | p) if condition.upper() == "OR" else (combined & p)
    return df.filter(combined)


# ---------------------------------------------------------------------------
# filter-column
# ---------------------------------------------------------------------------

def _column_expr(df: DataFrame, spec: dict) -> Column:
    """Resolve one column spec: existing column, ``src`` copy, or typed
    ``default`` literal (used when the named column is absent)."""
    name = spec["name"]
    if "src" in spec:
        return F.col(spec["src"]).alias(name)
    if name in df.columns:
        return F.col(name)
    etype = spec.get("type", "string")
    default = spec.get("default")
    if etype == "timestamp":
        return string_to_timestamp(
            F.lit(default), spec.get("format"), spec.get("timezone")
        ).alias(name)
    return F.lit(default).cast(EMBULK_TO_SPARK[etype]).alias(name)


def column_ops(
    df: DataFrame,
    columns: list[dict] | None = None,
    add_columns: list[dict] | None = None,
    drop_columns: list[dict] | None = None,
) -> DataFrame:
    """filter-column: ``columns`` keeps + reorders (backfilling absent
    names from ``src``/``default``), ``add_columns`` appends, and
    ``drop_columns`` removes — applied in that order, matching the public
    plugin's precedence."""
    if columns:
        df = df.select(*[_column_expr(df, s) for s in columns])
    for s in add_columns or []:
        df = df.withColumn(s["name"], _column_expr(df, s))
    for s in drop_columns or []:
        name = s["name"] if isinstance(s, dict) else s
        df = df.drop(name)
    return df


# ---------------------------------------------------------------------------
# filter-typecast
# ---------------------------------------------------------------------------

def typecast_columns(df: DataFrame, casts: list[dict]) -> DataFrame:
    """filter-typecast: each ``{name, type}`` re-types a column using the
    engine's Embulk coercion semantics (functions/coerce COERCIONS — the
    *ColumnSetter matrix), so e.g. string→long accepts only strict longs
    and boolean→long maps true→1, with failures nulling out rather than
    erroring. ``format``/``timezone`` flow to string→timestamp."""
    by_name = {c["name"]: c for c in casts}
    exprs: list[Column] = []
    for name in df.columns:
        spec = by_name.get(name)
        if spec is None:
            exprs.append(F.col(name))
            continue
        from_t = _embulk_type_of(df, name)
        to_t = spec["type"]
        if from_t == "string" and to_t == "timestamp":
            out = string_to_timestamp(
                F.col(name), spec.get("format"), spec.get("timezone")
            )
        else:
            out = coerce(F.col(name), from_t, to_t)
        exprs.append(out.alias(name))
    return df.select(*exprs)


# ---------------------------------------------------------------------------
# filter-add_time
# ---------------------------------------------------------------------------

def add_time(df: DataFrame, conf: dict) -> DataFrame:
    """filter-add_time: materialize ``to_column`` (timestamp) from
    ``from_value`` (fixed literal — reproducible fixtures), ``from_column``
    (copy + coerce another column), or ``mode: upload_time`` (ingest
    wall-clock; the one non-deterministic choice, as in the plugin)."""
    to_col = conf["to_column"]["name"]
    if "from_value" in conf:
        fv = conf["from_value"]
        value, fmt = fv.get("value"), fv.get("format")
        expr = string_to_timestamp(F.lit(str(value)), fmt, fv.get("timezone"))
    elif "from_column" in conf:
        src = conf["from_column"]["name"]
        from_t = _embulk_type_of(df, src)
        if from_t == "string":
            expr = string_to_timestamp(
                F.col(src), conf["from_column"].get("format"),
                conf["from_column"].get("timezone"),
            )
        else:
            expr = coerce(F.col(src), from_t, "timestamp")
    elif conf.get("mode") == "upload_time":
        expr = F.current_timestamp()
    else:
        raise ValueError("filter-add_time: need from_value, from_column or mode")
    return df.withColumn(to_col, expr)


# ---------------------------------------------------------------------------
# filter-hash
# ---------------------------------------------------------------------------

#: algorithm → Column builder over the (optionally salted) string input
_HASH_FNS = {
    "md5": lambda c: F.md5(c),
    "sha1": lambda c: F.sha1(c),
    "sha256": lambda c: F.sha2(c, 256),
    "sha512": lambda c: F.sha2(c, 512),
}


def hash_columns(df: DataFrame, specs: list[dict]) -> DataFrame:
    """filter-hash: one-way-hash PII columns in place (or under
    ``new_name``). Each spec is ``{name, algorithm, secret_key?,
    new_name?}``; non-string inputs hash their string rendering, nulls
    stay null. ``secret_key`` is prepended as a salt (keyed digest — a
    deterministic, oracle-checkable stand-in for the plugin's HMAC mode;
    plain mode is byte-identical to the plugin). All JVM hash exprs —
    per-row cost is one digest, no shuffle."""
    out = df
    for spec in specs:
        name = spec["name"]
        algo = str(spec.get("algorithm", "sha256")).lower().replace("-", "")
        fn = _HASH_FNS.get(algo)
        if fn is None:
            raise ValueError(f"filter-hash: unknown algorithm {algo!r}")
        src = F.col(name).cast("string")
        if spec.get("secret_key"):
            src = F.concat(F.lit(str(spec["secret_key"])), src)
        hashed = F.when(F.col(name).isNotNull(), fn(src))
        target = spec.get("new_name", name)
        out = (
            out.withColumn(target, hashed)
            if target == name
            else out.withColumn(target, hashed).drop(name)
        )
    return out


# ---------------------------------------------------------------------------
# filter-gsub
# ---------------------------------------------------------------------------

def gsub_columns(df: DataFrame, rules: list[dict]) -> DataFrame:
    """filter-gsub: per-column global regexp replace, ``{name, pattern,
    to, new_name?}`` — regexp_replace stays in codegen; Java and RE2
    agree on the POSIX-class subset used in configs."""
    out = df
    for r in rules:
        name = r["name"]
        repl = F.regexp_replace(
            F.col(name).cast("string"), r["pattern"], r.get("to", "")
        )
        out = out.withColumn(r.get("new_name", name), repl)
    return out


# ---------------------------------------------------------------------------
# filter-split
# ---------------------------------------------------------------------------

def split_rows(
    df: DataFrame,
    column: str,
    delimiter: str = ",",
    keep_column: bool = False,
    trim: bool = True,
) -> DataFrame:
    """filter-split: split a delimited string column into ONE ROW PER
    ELEMENT (the plugin's row-fanout mode). ``explode`` is a generator in
    the same stage — no shuffle; empty/null source rows drop (explode
    semantics, matching the plugin). The exploded element replaces the
    source column unless ``keep_column``."""
    parts = F.split(F.col(column), re.escape(delimiter))
    target = f"{column}_elem" if keep_column else column
    others = [F.col(c) for c in df.columns if keep_column or c != column]
    out = df.select(*others, F.explode(parts).alias(target))
    if trim:
        out = out.withColumn(target, F.trim(F.col(target)))
    return out


# ---------------------------------------------------------------------------
# filter-expand_json
# ---------------------------------------------------------------------------

def expand_json(
    df: DataFrame,
    json_column: str,
    expanded: list[dict],
    root: str | None = None,
    keep: bool = False,
) -> DataFrame:
    """filter-expand_json: expand ``json_column`` into typed top-level
    columns. ``root`` is an RFC 6901 pointer into each document (same
    grammar as the json parser's ``root``); each expanded column is pulled
    with ``get_json_object`` (JVM) and coerced string→type with the
    engine's setter semantics, timestamps honoring per-column formats.
    The source column is dropped unless ``keep``."""
    from ..sources.files import json_pointer_to_path

    src: Column = F.col(json_column)
    if root:
        src = F.get_json_object(src, json_pointer_to_path(root))
    exprs = [F.col(c) for c in df.columns if keep or c != json_column]
    for spec in expanded:
        name, etype = spec["name"], spec.get("type", "string")
        raw = F.get_json_object(src, "$." + name)
        if etype == "timestamp":
            out = string_to_timestamp(raw, spec.get("format"), spec.get("timezone"))
        elif etype == "json":
            out = raw
        else:
            out = coerce(raw, "string", etype)
        exprs.append(out.alias(name))
    return df.select(*exprs)


def flatten_json(
    df: DataFrame,
    json_column: str,
    array_root: str,
    expanded: list[dict],
    keep: bool = False,
) -> DataFrame:
    """filter-flatten_json (ecosystem): one row per ELEMENT of a JSON
    array inside ``json_column`` — the 1→N companion to
    :func:`expand_json`'s 1→1 object expansion. ``array_root`` is an
    RFC 6901 pointer to the array; each element's fields coerce to the
    declared ``expanded`` columns with setter semantics. Rows whose
    pointer resolves to nothing (or not an array) drop — the plugin's
    skip-invalid default. JVM all the way: get_json_object pointer walk
    → from_json(array<struct>) → same-stage explode."""
    from ..functions.coerce import string_to_timestamp
    from ..sources.files import _declared_schema, json_pointer_to_path

    src: Column = F.get_json_object(
        F.col(json_column), json_pointer_to_path(array_root)
    )
    struct = _declared_schema(expanded)
    arr = F.from_json(src, T.ArrayType(struct))
    keep_cols = [c for c in df.columns if keep or c != json_column]
    flat = df.select(*keep_cols, F.explode(arr).alias("_e")).select(
        *keep_cols, "_e.*"
    )
    exprs = [F.col(c) for c in keep_cols]
    for c in expanded:
        name = c["name"]
        if c["type"] == "timestamp":
            exprs.append(
                string_to_timestamp(
                    F.col(name), c.get("format"), c.get("timezone")
                ).alias(name)
            )
        else:
            exprs.append(F.col(name))
    return flat.select(*exprs)


def base64_columns(df: DataFrame, specs: list[dict]) -> DataFrame:
    """filter-base64 (ecosystem): per-column base64 ``encode``/``decode``.
    Encode maps string/binary → base64 text; decode maps base64 text →
    UTF-8 string (the plugin's contract — it round-trips text payloads,
    e.g. opaque cookie/token fields). Invalid base64 nulls out via
    ``try_to_binary``, matching the engine's null-on-bad-value setter
    policy. Pure JVM Column exprs, codegen'd."""
    out = {}
    for spec in specs:
        name = spec["name"]
        if spec.get("encode"):
            # Spark's base64() emits MIME chunking (CRLF every 76
            # chars) for long payloads on this runtime; the plugin
            # contract is RFC 4648 basic (java.util.Base64) — strip the
            # breaks so >57-byte payloads round-trip byte-identically
            # (found by the round-5 hypothesis property fuzz)
            out[name] = F.regexp_replace(
                F.base64(F.col(name).cast("binary")), "[\\r\\n]", ""
            )
        elif spec.get("decode"):
            out[name] = F.try_to_binary(F.col(name), F.lit("base64")).cast("string")
    return df.select(
        *[out[c].alias(c) if c in out else F.col(c) for c in df.columns]
    )


def eval_columns(df: DataFrame, conf: dict) -> DataFrame:
    """filter-eval (the embulk-filter-ruby / -eval / -calc ecosystem
    family): per-row computed columns and a row predicate, declared as
    expressions in the config.

    The reference plugins interpret Ruby per row — the canonical slow
    path. The Spark-first re-expression is Catalyst SQL (``F.expr``):
    the expression compiles ONCE into whole-stage codegen, constant-folds,
    and a selective ``where`` pushes down to the scan like any built-in
    predicate. Config: ``where`` (SQL boolean over the row), ``columns``
    (``{name, expr}`` — add or replace in place), ``drop``."""
    if conf.get("where"):
        df = df.filter(F.expr(conf["where"]))
    for spec in conf.get("columns") or []:
        # withColumn adds-or-replaces; later specs may reference earlier
        df = df.withColumn(spec["name"], F.expr(spec["expr"]))
    if conf.get("drop"):
        df = df.drop(*conf["drop"])
    return df


def join_file(df: DataFrame, conf: dict) -> DataFrame:
    """filter-join_file (ecosystem): enrich the stream with columns from a
    SMALL side table — a master/lookup file (countries, UA strings, host
    → owner maps) — joined on key equality.

    Spark-first shape: the side is read through the ordinary parser chain
    (``file_path_prefix`` + ``parser``, or inline ``data`` rows) and
    **explicitly broadcast** — at 100 TB the stream side never shuffles;
    the lookup rides to every executor once. Left join (the plugin's
    default: unmatched rows keep nulls); ``join: inner`` drops them.
    ``prefix`` namespaces the joined columns (plugin's
    ``joined_columns_prefix``). Duplicate keys on the side would fan out
    the stream, so the side is deduped first-wins on the key — one agg
    over the (tiny) side, never the stream."""
    spark = df.sparkSession
    on = conf.get("on") or [
        {"base": conf["base_column"]["name"], "file": conf["counter_column"]["name"]}
    ]
    prefix = conf.get("prefix", conf.get("joined_columns_prefix", ""))
    if conf.get("data") is not None:
        from ..sources.files import _declared_schema

        side = spark.createDataFrame(
            [tuple(r[c["name"]] for c in conf["columns"]) for r in conf["data"]],
            _declared_schema(conf["columns"]),
        )
    else:
        from ..sources.files import read_input_files

        side, _ = read_input_files(
            spark,
            {
                "path_prefix": conf["file_path_prefix"],
                "parser": conf.get(
                    "parser", {"type": "csv", "columns": conf.get("columns", [])}
                ),
            },
        )
    file_keys = [p["file"] for p in on]
    # first-wins on the side key: deterministic min_by on a stable struct
    payload = [c for c in side.columns if c not in file_keys]
    if payload:
        side = side.groupBy(*file_keys).agg(
            *[
                F.min_by(c, F.struct(*[F.col(p) for p in payload])).alias(c)
                for c in payload
            ]
        )
    else:
        side = side.dropDuplicates(file_keys)
    renamed = side.select(
        *[F.col(k).alias(f"__jf_{k}") for k in file_keys],
        *[F.col(c).alias(prefix + c) for c in payload],
    )
    cond = None
    for p in on:
        eq = df[p["base"]] == renamed[f"__jf_{p['file']}"]
        cond = eq if cond is None else cond & eq
    how = conf.get("join", "left")
    joined = df.join(F.broadcast(renamed), cond, how)
    return joined.drop(*[f"__jf_{k}" for k in file_keys])
