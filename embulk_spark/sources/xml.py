"""XML record parser (the embulk-parser-xml / embulk-parser-xpath
ecosystem plugins' core use-case: repeated ``<row>`` elements → one
record each, child elements → columns).

Spark-first shape: no XML library and no Python in the data path — the
row split is one codegen'd ``regexp_extract_all`` + ``explode`` (a 1→k
same-stage generator), each column one ``regexp_extract`` over the row
slice, entities unescaped with chained ``replace``. Files read whole
(XML records span lines), one task per file — exactly the reference's
FileInputPlugin unit, so a directory of many XML dumps parallelizes
across the cluster even though a single file is one task. Scope is the
plugins' flat-record contract (child elements + row attributes), not a
general XPath engine; documents with nested same-named tags inside a
row are out of contract, as they are for the regex-based plugin."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def xml_unescape(c: Column) -> Column:
    """The five predefined XML entities + numeric &#NN; for ASCII."""
    out = c
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    # &amp; LAST so &amp;lt; decodes to &lt; not <
    return F.replace(out, F.lit("&amp;"), F.lit("&"))


def parse_xml_column(
    df: DataFrame, col: Column, row_tag: str, columns: list[dict]
) -> DataFrame:
    """Split repeated ``<row_tag>`` elements out of an XML string Column
    and project declared columns.

    Column ``name`` is a child element name, or ``@attr`` for an
    attribute on the row tag itself. Missing element/attribute → null;
    values coerce with the string-setter semantics after entity
    unescape."""
    from ..functions.coerce import coerce

    row_re = rf"(?s)<{row_tag}(\s[^>]*)?>(.*?)</{row_tag}>"
    rows = df.select(
        F.explode(
            F.regexp_extract_all(col, F.lit(row_re), F.lit(0))
        ).alias("_row")
    )
    exprs = []
    for c in columns:
        name, etype = c["name"], c.get("type", "string")
        if name.startswith("@"):
            pat = rf'(?s)<{row_tag}[^>]*\s{name[1:]}="([^"]*)"'
        else:
            pat = rf"(?s)<{name}(?:\s[^>]*)?>(.*?)</{name}>"
        hit = F.regexp_extract_all(F.col("_row"), F.lit(pat), F.lit(1))
        raw = xml_unescape(F.try_element_at(hit, F.lit(1)))  # null when absent
        if etype in ("string", "json", "timestamp"):
            out = raw
        else:
            out = coerce(raw, "string", etype)
        exprs.append(out.alias(name.lstrip("@")))
    from .files import _apply_timestamp_formats

    out_cols = [{**c, "name": c["name"].lstrip("@")} for c in columns]
    return _apply_timestamp_formats(rows.select(*exprs), out_cols)


def read_xml(spark: SparkSession, paths: list[str], parser: dict) -> DataFrame:
    """Parser ``type: xml``: whole-file reads (records span lines), one
    task per file. Config: ``row_tag`` (element repeated per record,
    plugin's ``root``-leaf), ``columns`` (children / ``@attrs``)."""
    df = spark.read.text(paths, wholetext=True)
    return parse_xml_column(
        df, F.col("value"), parser.get("row_tag", "row"), parser["columns"]
    )
