"""File input: glob → typed DataFrame, with declared or guessed schema.

The Spark-native re-expression of Embulk's file-input chain
(file-input → decoders → parser), whose composition lives in the reference
at spi/FileInputRunner.java:101-118,126-145:

- file enumeration + ``last_path`` cursor ≈ embulk-input-file's
  ConfigDiff-based incremental scan (cursor mechanism:
  exec/BulkLoader.java:299-306, written back by EmbulkRunner.java:329-334);
- decoders (gzip/bzip2) ≈ codec-by-extension in Spark file sources
  (spi/util/DecodersInternal.java:28-41 wraps first-to-last; Spark does
  the same transparently);
- parsers (csv/json) ≈ DataFrameReader formats with the schema DECLARED
  up front, exactly like Embulk resolves SchemaConfig → Schema before the
  run (spi/SchemaConfig.java:52-58). Per-column timestamp ``format``
  (spi/ColumnConfig.java:62-73) is honored by reading those columns as
  string and casting with the column's own strptime pattern.

Scale note: one Embulk task per file (FileInputRunner) maps to Spark's
file-split planning — many small files coalesce into splits, one huge
.csv.gz stays a single task only because gzip isn't splittable, same as
the reference. No driver-side data movement happens here; only the file
*listing* is driver-side (as in every Spark file source).
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.coerce import EMBULK_TO_SPARK, string_to_timestamp

#: Embulk newline names → line separator bytes (spi/util/Newline.java:3-8)
NEWLINES = {"CRLF": "\r\n", "LF": "\n", "CR": "\r"}


def list_input_files(
    path_prefix: str, last_path: str | None = None, spark: SparkSession | None = None
) -> list[str]:
    """Enumerate input files for a ``path_prefix``, honoring the
    ``last_path`` cursor: only files strictly after it (lexicographic)
    are new — embulk-input-file's incremental contract.

    Prefixes with a URI scheme (``s3a://`` / ``hdfs://`` / ``file://`` —
    the embulk-input-s3/-gcs/-hdfs family) enumerate through the Hadoop
    FileSystem API of the live session, so object-store inputs get the
    same cursor semantics as local disk; enumeration is one driver-side
    LIST per run (the same cost the reference pays), the data itself is
    only ever read by executors."""
    if "://" in path_prefix and spark is not None:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        jpath = jvm.org.apache.hadoop.fs.Path(path_prefix + "*")
        fs = jpath.getFileSystem(hconf)
        statuses = fs.globStatus(jpath)
        paths = sorted(
            str(s.getPath()) for s in (statuses or []) if s.isFile()
        )
    else:
        paths = sorted(
            p for p in _glob.glob(path_prefix + "*") if os.path.isfile(p)
        )
    if last_path:
        paths = [p for p in paths if p > last_path]
    return paths


def _declared_schema(columns: list[dict]) -> T.StructType:
    """Schema with timestamp columns kept as string for per-column
    format-aware parsing (done in :func:`_apply_timestamp_formats`)."""
    fields = []
    for c in columns:
        etype = c["type"]
        dt = T.StringType() if etype == "timestamp" else EMBULK_TO_SPARK[etype]
        fields.append(T.StructField(c["name"], dt, True))
    return T.StructType(fields)


def _apply_timestamp_formats(df: DataFrame, columns: list[dict]) -> DataFrame:
    exprs = []
    for c in columns:
        name = c["name"]
        if c["type"] == "timestamp":
            exprs.append(
                string_to_timestamp(
                    F.col(name), c.get("format"), c.get("timezone")
                ).alias(name)
            )
        else:
            exprs.append(F.col(name))
    return df.select(*exprs)


def read_csv(
    spark: SparkSession,
    paths: list[str],
    parser: dict,
) -> DataFrame:
    """embulk-parser-csv semantics over Spark's csv source.

    Options mirror the parser task (quote/escape/delimiter/skip_header_
    lines/newline/charset/stop_on_invalid_record; see the column-options
    analogue at spi/ColumnConfig.java:62-73 and LineDecoder task defaults
    at spi/util/LineDecoder.java:24-35)."""
    columns = parser["columns"]
    schema = _declared_schema(columns)
    if "allow_extra_columns" in parser or "allow_optional_columns" in parser:
        # explicit column-count policies take the text path: Spark's csv
        # source is silently lenient in both directions, so enforcing
        # (or selectively allowing) count mismatches needs a probe parse
        return _read_csv_count_policy(
            spark, paths, parser, schema,
            int(parser.get("skip_header_lines",
                           1 if parser.get("header_line") else 0)),
        )
    mode = "FAILFAST" if parser.get("stop_on_invalid_record") else "PERMISSIVE"
    reader = (
        spark.read.schema(schema)
        .option("delimiter", parser.get("delimiter", ","))
        .option("quote", parser.get("quote", '"'))
        .option("escape", parser.get("escape", '"'))
        .option("charset", parser.get("charset", "UTF-8"))
    )
    if parser.get("trim_if_not_quoted"):
        # embulk-parser-csv trim_if_not_quoted (CsvTokenizer contract,
        # declared build.gradle:30): unquoted values lose surrounding
        # whitespace, quoted values keep it — univocity's whitespace
        # options have exactly that quoted/unquoted distinction
        reader = reader.option("ignoreLeadingWhiteSpace", "true").option(
            "ignoreTrailingWhiteSpace", "true"
        )
    qiq = parser.get("quotes_in_quoted_fields")
    if qiq is not None:
        if qiq == "ACCEPT_STRAY_QUOTES_ASSUMING_NO_DELIMITERS_IN_FIELDS":
            # stray quotes become field content; the field ends at the
            # next delimiter — univocity STOP_AT_DELIMITER
            reader = reader.option(
                "unescapedQuoteHandling", "STOP_AT_DELIMITER"
            )
        elif qiq == "ACCEPT_ONLY_RFC4180_ESCAPED":
            # strict RFC 4180: a record with a stray (unescaped) quote
            # is INVALID — skipped, or aborts under
            # stop_on_invalid_record. univocity's RAISE_ERROR aborts the
            # whole file read (not a per-record malformed row), so the
            # per-record policy takes the text path: mask proper quoted
            # sections, flag records with leftover quote chars.
            return _read_csv_strict_quotes(
                spark, paths, parser, schema,
                int(parser.get("skip_header_lines",
                               1 if parser.get("header_line") else 0)),
            )
        else:
            raise ValueError(
                f"unknown quotes_in_quoted_fields policy {qiq!r}"
            )
    reader = reader.option("mode", mode)
    if parser.get("null_string"):
        reader = reader.option("nullValue", parser["null_string"])
    marker = parser.get("comment_line_marker")
    if marker:
        # a null marker that STARTS WITH the comment marker ('#N/A' under
        # '#') marks data lines, not comments (guess_comment_marker
        # classifies them as data) — Spark's single-char `comment` option
        # can't make that distinction, so those configs take the
        # line-filtering text path too
        nullstr = parser.get("null_string")
        null_led = bool(nullstr) and nullstr.startswith(marker)
        if len(marker) == 1 and not null_led:
            # Spark's comment option is single-char ('#'); multi-char
            # markers ('//') go through the line-filtering text path
            reader = reader.option("comment", marker)
        else:
            return _read_csv_skip_n(
                spark, paths, parser, schema,
                int(parser.get("skip_header_lines",
                               1 if parser.get("header_line") else 0)),
            )
    skip = int(parser.get("skip_header_lines", 1 if parser.get("header_line") else 0))
    if skip:
        # Spark's `header` consumes exactly one line per file, like Embulk's
        # skip_header_lines=1 (the common case); >1 needs the text path.
        if skip == 1:
            reader = reader.option("header", "true")
        else:
            return _read_csv_skip_n(spark, paths, parser, schema, skip)
    nl = parser.get("newline")
    if nl in NEWLINES and nl != "CRLF":
        # Spark auto-detects \n and \r\n; only CR-only files need lineSep.
        if nl == "CR":
            reader = reader.option("lineSep", "\r")
    df = reader.csv(paths)
    return _apply_timestamp_formats(df, columns)


def _csv_body_lines(
    spark: SparkSession, paths: list[str], parser: dict, skip: int
) -> DataFrame:
    """One ``value`` column of data lines: comment lines stripped, then
    ``skip`` header lines removed per file. Stays distributed (no driver
    materialization)."""
    from pyspark.sql.window import Window

    txt = spark.read.text(paths).withColumn("_f", F.input_file_name())
    # comment lines are removed BEFORE the header skip counts lines — the
    # dialect guess detects the header on comment-stripped text, so a file
    # whose comments precede the header must skip the HEADER, not a comment
    marker = parser.get("comment_line_marker")
    if marker:
        keep = ~F.col("value").startswith(marker)
        nullstr = parser.get("null_string")
        if nullstr and nullstr.startswith(marker):
            # '#N/A,...' is a data row under marker '#' (see read_csv)
            keep = keep | F.col("value").startswith(nullstr)
        txt = txt.filter(keep)
    if skip:
        w = Window.partitionBy("_f").orderBy(F.monotonically_increasing_id())
        txt = txt.withColumn("_i", F.row_number().over(w)).filter(
            F.col("_i") > skip
        )
    return txt.select("value")


def _csv_opts(parser: dict) -> dict:
    opts = {
        "delimiter": parser.get("delimiter", ","),
        "quote": parser.get("quote", '"'),
        "escape": parser.get("escape", '"'),
    }
    if parser.get("null_string"):
        opts["nullValue"] = parser["null_string"]
    if parser.get("trim_if_not_quoted"):
        opts["ignoreLeadingWhiteSpace"] = "true"
        opts["ignoreTrailingWhiteSpace"] = "true"
    if (
        parser.get("quotes_in_quoted_fields")
        == "ACCEPT_STRAY_QUOTES_ASSUMING_NO_DELIMITERS_IN_FIELDS"
    ):
        opts["unescapedQuoteHandling"] = "STOP_AT_DELIMITER"
    return opts


def _read_csv_skip_n(
    spark: SparkSession, paths: list[str], parser: dict, schema, skip: int
) -> DataFrame:
    """General skip_header_lines>1: text + per-file line index, then parse
    with from_csv. Stays distributed (no driver materialization)."""
    body = _csv_body_lines(spark, paths, parser, skip)
    parsed = body.select(
        F.from_csv(
            F.col("value"), schema.simpleString(), _csv_opts(parser)
        ).alias("r")
    ).select("r.*")
    return _apply_timestamp_formats(parsed, parser["columns"])


def _quoted_section_regex(parser: dict) -> str | None:
    """Regex matching one properly-quoted CSV section under the
    dialect's quote/escape (quote-doubling or distinct-escape), for
    masking quoted content before structural probes. None when the
    dialect has no quote char."""
    import re as _re

    q = parser.get("quote", '"')
    if not q:
        return None
    esc = parser.get("escape", '"')
    if esc and esc != q:
        return (
            _re.escape(q)
            + f"(?:[^{_re.escape(q)}{_re.escape(esc)}]|{_re.escape(esc)}.)*"
            + _re.escape(q)
        )
    return (  # quote-doubling dialect: "([^"]|"")*"
        _re.escape(q)
        + f"(?:[^{_re.escape(q)}]|{_re.escape(q)}{_re.escape(q)})*"
        + _re.escape(q)
    )


def _read_csv_strict_quotes(
    spark: SparkSession, paths: list[str], parser: dict, schema, skip: int
) -> DataFrame:
    """quotes_in_quoted_fields = ACCEPT_ONLY_RFC4180_ESCAPED (the
    embulk-parser-csv default policy, CsvTokenizer contract declared
    build.gradle:30): a record whose text still contains a quote char
    after every properly-quoted section is masked has a STRAY quote and
    is invalid — skipped (Embulk logs-and-skips), or aborts under
    stop_on_invalid_record."""
    body = _csv_body_lines(spark, paths, parser, skip)
    qre = _quoted_section_regex(parser)
    q = parser.get("quote", '"')
    if qre:
        masked = F.regexp_replace(F.col("value"), qre, "Q")
        bad = F.instr(masked, q) > 0
    else:
        bad = F.lit(False)
    if parser.get("stop_on_invalid_record"):
        body = body.withColumn(
            "_ok",
            F.when(
                bad,
                F.raise_error(
                    F.concat(
                        F.lit("invalid record (stray quote): "),
                        F.col("value"),
                    )
                ),
            ).otherwise(F.lit(True)),
        ).filter("_ok").select("value")
    else:
        body = body.filter(~bad).select("value")
    parsed = body.select(
        F.from_csv(
            F.col("value"), schema.simpleString(), _csv_opts(parser)
        ).alias("r")
    ).select("r.*")
    return _apply_timestamp_formats(parsed, parser["columns"])


def _read_csv_count_policy(
    spark: SparkSession, paths: list[str], parser: dict, schema, skip: int
) -> DataFrame:
    """embulk-parser-csv column-count policies (public plugin contract,
    declared /root/reference/build.gradle:30):

    - ``allow_extra_columns`` (default false): a record with MORE fields
      than the schema keeps the declared prefix; extras are dropped.
      When false such a record is INVALID.
    - ``allow_optional_columns`` (default false): a record with FEWER
      fields than the schema null-fills the missing trailing columns.
      When false such a record is INVALID.

    Invalid records are skipped (Embulk logs-and-skips), or abort the
    run when ``stop_on_invalid_record`` — the same policy the typed
    parse applies to unparseable values.

    Mechanics: the exact field count comes from masking quoted sections
    (so quoted delimiters don't count) with a regexp built from the
    dialect's quote/escape, then counting delimiters — pure JVM Columns,
    one pass, no Python, no shuffle. A from_csv-based probe can't do
    this: univocity parses an unquoted empty trailing token as null
    regardless of nullValue, making ``a,b,`` indistinguishable from
    ``a,b``."""
    import re as _re

    n = len(schema)
    body = _csv_body_lines(spark, paths, parser, skip)
    delim = parser.get("delimiter", ",")
    qre = _quoted_section_regex(parser)
    if qre:
        masked = F.regexp_replace(F.col("value"), qre, "Q")
    else:
        masked = F.col("value")
    n_fields = F.size(F.split(masked, _re.escape(delim), -1))
    probed = body.withColumn("_nf", n_fields)
    has_extra = F.col("_nf") > n
    is_short = F.col("_nf") < n
    bad = F.lit(False)
    if not parser.get("allow_extra_columns", False):
        bad = bad | has_extra
    if not parser.get("allow_optional_columns", False):
        bad = bad | is_short
    if parser.get("stop_on_invalid_record"):
        body = probed.withColumn(
            "_ok",
            F.when(
                bad,
                F.raise_error(
                    F.concat(
                        F.lit("invalid record (column count): "),
                        F.col("value"),
                    )
                ),
            ).otherwise(F.lit(True)),
        ).filter("_ok").select("value")
    else:
        body = probed.filter(~bad).select("value")
    parsed = body.select(
        F.from_csv(
            F.col("value"), schema.simpleString(), _csv_opts(parser)
        ).alias("r")
    ).select("r.*")
    return _apply_timestamp_formats(parsed, parser["columns"])


def json_pointer_to_path(pointer: str, digits_as_index: bool = True) -> str:
    """RFC 6901 JSON pointer → Spark JSONPath: ``/store/book/0`` →
    ``$.store.book[0]``, with ``~1``→``/`` and ``~0``→``~`` unescaping
    (the pointer grammar the reference streams from,
    spi/json/JsonParser.java:12-41).

    A pointer can't say whether an all-digit token is an array index or an
    object key — only the document can; ``digits_as_index`` picks the
    reading (``read_json`` coalesces both). Keys that aren't plain
    identifiers (dots, slashes, leading digits) use bracket-quoted form so
    they can't be misread as path structure."""
    import re as _re

    if not pointer:
        return "$"
    out = "$"
    for tok in pointer.split("/")[1:]:
        tok = tok.replace("~1", "/").replace("~0", "~")
        if tok.isdigit() and digits_as_index:
            out += f"[{int(tok)}]"
        elif _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", tok):
            out += f".{tok}"
        else:
            out += "['" + tok.replace("'", "\\'") + "']"
    return out


def read_json(spark: SparkSession, paths: list[str], parser: dict) -> DataFrame:
    """embulk-parser-json: one JSON value per line → columns (when
    ``columns`` declared) or raw ``record`` json column (Embulk's json
    type ≈ canonical JSON text, docs/eeps/eep-0002.md).

    ``root`` (RFC 6901 JSON pointer, the reference's
    parseWithOffsetInJsonPointer — spi/json/JsonParser.java:29-41):
    records are read from that subtree of each document; a pointer
    targeting an array yields one record per element. All JVM-side:
    get_json_object pointer walk + from_json + explode, no Python."""
    columns = parser.get("columns")
    root = parser.get("root") or parser.get("__experimental__json_pointer_to_root")
    if root:
        # all-digit tokens: try the array-index reading first, fall back to
        # the object-key reading per row (the pointer grammar is ambiguous;
        # the document decides — spi/json/JsonParser.java:29-41)
        p_idx = json_pointer_to_path(root, digits_as_index=True)
        p_key = json_pointer_to_path(root, digits_as_index=False)
        sub = F.get_json_object(F.col("value"), p_idx)
        if p_key != p_idx:
            sub = F.coalesce(sub, F.get_json_object(F.col("value"), p_key))
        txt = spark.read.text(paths).select(sub.alias("_sub"))
        if not columns:
            return txt.filter(F.col("_sub").isNotNull()).select(
                F.col("_sub").alias("record")
            )
        struct = _declared_schema(columns)
        arr = F.from_json(F.col("_sub"), T.ArrayType(struct))
        one = F.from_json(F.col("_sub"), struct)
        # array root → one record per element; object root → one record
        records = F.when(arr.isNotNull(), arr).otherwise(F.array(one))
        df = (
            txt.filter(F.col("_sub").isNotNull())
            .select(F.explode(records).alias("_r"))
            .select("_r.*")
        )
        return _apply_timestamp_formats(df, columns)
    if columns:
        df = spark.read.schema(_declared_schema(columns)).json(paths)
        return _apply_timestamp_formats(df, columns)
    return spark.read.text(paths).select(F.col("value").alias("record"))


def parse_regexp_column(
    df: DataFrame, col: F.Column, pattern: str, columns: list[dict]
) -> DataFrame:
    """Named/positional-group regex → typed columns over a string Column
    (the embulk-parser-regex ecosystem plugin). Capture group ``i+1`` maps
    to ``columns[i]`` (Java regex counts named groups positionally too).
    Lines not matching the pattern are skipped, the plugin's default
    invalid-line policy; extracted text coerces with the engine's
    string-setter semantics so a non-numeric capture nulls instead of
    erroring, and timestamp columns honor per-column format/timezone.
    All JVM: rlike gate + one regexp_extract per column, codegen'd."""
    from ..functions.coerce import coerce

    exprs = []
    for i, c in enumerate(columns):
        raw = F.regexp_extract(col, pattern, i + 1)
        etype = c["type"]
        if etype in ("string", "json", "timestamp"):
            out = raw  # timestamps parsed below with their own format
        else:
            out = coerce(raw, "string", etype)
        exprs.append(out.alias(c["name"]))
    matched = df.filter(col.rlike(pattern)).select(*exprs)
    return _apply_timestamp_formats(matched, columns)


def read_regexp(spark: SparkSession, paths: list[str], parser: dict) -> DataFrame:
    """Parser ``type: regexp``: one record per matching line."""
    df = spark.read.text(paths)
    return parse_regexp_column(df, F.col("value"), parser["format"], parser["columns"])


def parse_ltsv_column(
    df: DataFrame, col: F.Column, columns: list[dict]
) -> DataFrame:
    """LTSV (Labeled Tab-Separated Values, the embulk-parser-ltsv
    ecosystem plugin): each line is ``label:value<TAB>label:value...``.
    One tab-split per line, then each declared column pulls the LAST
    field carrying its label (duplicate labels: last occurrence wins,
    matching the plugin's hash-backed rows — str_to_map can't express
    this: ANSI mode rejects duplicate map keys) and coerces with the
    string-setter semantics; absent labels null out. All JVM array HOFs,
    no shuffle."""
    from ..functions.coerce import coerce

    fields = F.split(col, "\t")
    exprs = []
    for c in columns:
        prefix = c["name"] + ":"
        mine = F.filter(fields, lambda x: x.startswith(prefix))
        raw = F.when(
            F.size(mine) > 0,
            F.substring(F.element_at(mine, -1), len(prefix) + 1, 1 << 30),
        )
        etype = c.get("type", "string")
        if etype in ("string", "json", "timestamp"):
            out = raw
        else:
            out = coerce(raw, "string", etype)
        exprs.append(out.alias(c["name"]))
    return _apply_timestamp_formats(df.select(*exprs), columns)


def read_ltsv(spark: SparkSession, paths: list[str], parser: dict) -> DataFrame:
    """Parser ``type: ltsv``: one record per line."""
    df = spark.read.text(paths)
    return parse_ltsv_column(df, F.col("value"), parser["columns"])


def parse_poslen_column(
    df: DataFrame, col: F.Column, columns: list[dict], trim: bool = True
) -> DataFrame:
    """Fixed-width records (the embulk-parser-poslen ecosystem plugin):
    each declared column carries a 0-based byte ``pos`` and a ``len``;
    the slice coerces with the string-setter semantics (bad numerics
    null out, reference default-value policy). COBOL/mainframe dumps and
    Apache-style padded logs are the usual carriers. ``trim`` strips the
    pad spaces before coercion (the plugin's default; ``trim: false``
    keeps raw slices for strings). Pure ``substring`` Columns — codegen'd
    JVM, no shuffle, and Catalyst prunes unreferenced slices at the scan
    when only some columns survive downstream."""
    from ..functions.coerce import coerce

    exprs = []
    for c in columns:
        pos = int(c.get("pos", c.get("position", 0)))
        length = int(c.get("len", c.get("length", 0)))
        raw = F.substring(col, pos + 1, length)
        if trim:
            raw = F.trim(raw)
        etype = c.get("type", "string")
        if etype in ("string", "json", "timestamp"):
            out = raw
        else:
            out = coerce(raw, "string", etype)
        exprs.append(out.alias(c["name"]))
    return _apply_timestamp_formats(df.select(*exprs), columns)


def read_poslen(spark: SparkSession, paths: list[str], parser: dict) -> DataFrame:
    """Parser ``type: poslen``: one fixed-width record per line."""
    df = spark.read.text(paths)
    return parse_poslen_column(
        df, F.col("value"), parser["columns"], trim=parser.get("trim", True)
    )


def read_none(spark: SparkSession, paths: list[str], parser: dict) -> DataFrame:
    """embulk-parser-none: no parsing — every line passes through as one
    string column (default name ``payload``), for pipelines whose filters
    do the real work (gsub/split/regex_replace chains over raw logs)."""
    name = parser.get("column_name", "payload")
    return spark.read.text(paths).select(F.col("value").alias(name))


def read_input_files(
    spark: SparkSession, in_config: dict, last_path: str | None = None
) -> tuple[DataFrame, dict]:
    """The composed file-input chain. Returns (frame, config_diff_in)
    where the diff carries the ``last_path`` cursor for the next run."""
    paths = list_input_files(in_config["path_prefix"], last_path, spark)
    diff = {"last_path": max(paths) if paths else last_path}
    parser = dict(in_config.get("parser", {"type": "csv", "columns": []}))
    # guessed charset/newline land at the in: level (guess_bytes); the
    # parser task consumes them (LineDecoder task, LineDecoder.java:24-35)
    for k in ("charset", "newline"):
        if k in in_config and k not in parser:
            parser[k] = in_config[k]
    ptype = parser.get("type", "csv")
    if not paths:
        cols = parser.get("columns") or []
        empty = spark.createDataFrame([], _declared_schema(cols))
        return _apply_timestamp_formats(empty, cols), diff
    # decoder chain for container formats (zip/tar/xz —
    # embulk-decoder-commons-compress; gzip/bzip2 single streams are
    # handled natively by Spark's codec-by-extension, same as the
    # reference's DecodersInternal wrap). Declared like Embulk:
    #   in: {decoders: [{type: archive}], parser: {...}}
    dec_types = {d.get("type") for d in in_config.get("decoders", [])}
    if dec_types & {"archive", "commons-compress", "zip", "tar", "xz"}:
        from .archives import read_archive

        return read_archive(spark, paths, parser), diff
    if ptype == "csv":
        return read_csv(spark, paths, parser), diff
    if ptype == "json":
        return read_json(spark, paths, parser), diff
    if ptype == "regexp":
        return read_regexp(spark, paths, parser), diff
    if ptype == "ltsv":
        return read_ltsv(spark, paths, parser), diff
    if ptype == "poslen":
        return read_poslen(spark, paths, parser), diff
    if ptype == "grok":
        from .grok import read_grok

        return read_grok(spark, paths, parser), diff
    if ptype == "xml":
        from .xml import read_xml

        return read_xml(spark, paths, parser), diff
    if ptype == "none":
        return read_none(spark, paths, parser), diff
    if ptype == "msgpack":
        from .msgpack import read_msgpack

        return read_msgpack(spark, paths, parser), diff
    if ptype == "avro":
        from .avro import read_avro

        return read_avro(spark, paths, parser), diff
    if ptype in ("parquet", "orc"):
        # columnar self-describing inputs (the embulk-input-parquet /
        # embulk-parser-orc ecosystem plugins): schema comes from the
        # file footer; declared `columns` (optional) prune + coerce on
        # top — column pruning reaches the scan (ReadSchema), so a
        # 2-column projection never reads the other columns' bytes.
        # .format().load(list): reader.orc(*paths) trips a py4j seq
        # conversion bug on multi-path in pyspark 4.1
        df = spark.read.format(ptype).load(paths)
        cols = parser.get("columns") or []
        if cols:
            from ..functions.coerce import EMBULK_TO_SPARK

            df = df.select(
                *[
                    F.col(c["name"]).cast(EMBULK_TO_SPARK[c["type"]]).alias(c["name"])
                    if c.get("type") else F.col(c["name"])
                    for c in cols
                ]
            )
            df = _apply_timestamp_formats(df, cols)
        return df, diff
    raise ValueError(f"unknown parser type: {ptype}")


def inline_records(spark: SparkSession, in_config: dict) -> DataFrame:
    """embulk-input-config analogue (build.gradle:25): records inlined in
    the config — the fixture source for tests/previews."""
    columns = in_config["columns"]
    schema = _declared_schema(columns)
    rows = [tuple(r) for r in in_config.get("values", [])]
    df = spark.createDataFrame(rows, schema)
    return _apply_timestamp_formats(df, columns)
