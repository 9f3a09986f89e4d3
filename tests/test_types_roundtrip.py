"""Six-type round-trips and setter-coercion edges — the pytest mirror of
the reference's page round-trip suite
(/root/reference/embulk-core/src/test/java/org/embulk/spi/TestPageBuilderReaderImpl.java:54-346)
and the dynamic-setter semantics (spi/util/dynamic/*.java)."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Row
from pyspark.sql import functions as F

from embulk_spark.functions.coerce import (
    EMBULK_TO_SPARK,
    double_to_long,
    schema_to_struct,
    string_to_boolean,
    string_to_long,
    timestamp_to_string,
)

TS = datetime(2024, 3, 1, 12, 30, 45, 123456, tzinfo=timezone.utc)


def test_six_types_parquet_roundtrip_with_nulls(spark, tmp_path):
    """Every Embulk type + nulls survives write→read bit-exact (the Page
    build→read property; TestPageBuilderReaderImpl testBoolean..testJson)."""
    schema = schema_to_struct(
        [("b", "boolean"), ("l", "long"), ("d", "double"),
         ("s", "string"), ("t", "timestamp"), ("j", "json")]
    )
    rows = [
        Row(b=True, l=2**62, d=-1.5e300, s="ünïcode  ", t=TS.replace(tzinfo=None),
            j='{"k": [1, null]}'),
        Row(b=None, l=None, d=None, s=None, t=None, j=None),
        Row(b=False, l=-1, d=float("inf"), s="", t=datetime(1969, 12, 31, 23, 59, 59),
            j="[]"),
    ]
    df = spark.createDataFrame(rows, schema)
    p = str(tmp_path / "t")
    df.write.parquet(p)
    back = spark.read.schema(schema).parquet(p)
    key = lambda r: repr(r)
    assert sorted(map(tuple, back.collect()), key=key) == sorted(
        map(tuple, df.collect()), key=key
    )
    assert back.schema == schema
    assert [EMBULK_TO_SPARK[t] for t in
            ("boolean", "long", "double", "string", "timestamp", "json")] == [
        f.dataType for f in schema.fields]


def test_long_setter_half_away_from_zero(spark):
    """LongColumnSetter rounds doubles half-away-from-zero
    (spi/util/dynamic/LongColumnSetter.java:37-44)."""
    df = spark.createDataFrame(
        [(0.5,), (1.5,), (-0.5,), (-1.5,), (2.4,), (-2.4,), (2.6,)], "v DOUBLE"
    )
    got = [r[0] for r in df.select(double_to_long(F.col("v"))).collect()]
    assert got == [1, 2, -1, -2, 2, -2, 3]


def test_string_setter_unparseable_goes_null(spark):
    """Unparseable string → null (NullDefaultValueSetter default), exact
    integers parse (LongColumnSetter.java:52-63)."""
    df = spark.createDataFrame(
        [("42",), ("-7",), ("4.5",), ("x",), ("",)], "v STRING"
    )
    got = [r[0] for r in df.select(string_to_long(F.col("v"))).collect()]
    assert got == [42, -7, None, None, None]


def test_string_setter_double_parse(spark):
    """Double.parseDouble semantics incl. trimmed whitespace, exponents,
    Infinity/NaN text forms; junk → null (DoubleColumnSetter.java)."""
    from embulk_spark.functions.coerce import string_to_double

    df = spark.createDataFrame(
        [("1.5",), (" 2.25 ",), ("-3e2",), ("Infinity",), ("x",), ("",)],
        "v STRING",
    )
    got = [r[0] for r in df.select(string_to_double(F.col("v"))).collect()]
    assert got[:4] == [1.5, 2.25, -300.0, float("inf")]
    assert got[4] is None and got[5] is None


def test_string_setter_19_digit_long_range(spark):
    """Long.parseLong accepts the full signed-64 range, including 19-digit
    values in [10^18, 2^63); 2^63 itself overflows → null
    (LongColumnSetter.java:52-63 delegates to Long.parseLong)."""
    df = spark.createDataFrame(
        [("9223372036854775807",),   # Long.MAX_VALUE
         ("-9223372036854775808",),  # Long.MIN_VALUE
         ("1000000000000000000",),   # 10^18
         ("9223372036854775808",),   # MAX+1 → overflow → null
         ("+42",)],
        "v STRING",
    )
    got = [r[0] for r in df.select(string_to_long(F.col("v"))).collect()]
    assert got == [
        9223372036854775807, -9223372036854775808,
        1000000000000000000, None, 42,
    ]


def test_boolean_setter_string_sets(spark):
    """Only members of the TRUE-string set become true; everything else —
    including 'NO'/'off'/'0' — falls through to the default-value setter,
    i.e. null (BooleanColumnSetter.java:56-62 + NullDefaultValueSetter)."""
    df = spark.createDataFrame(
        [("yes",), ("NO",), ("T",), ("off",), ("maybe",), ("1",), ("0",)],
        "v STRING",
    )
    got = [r[0] for r in df.select(string_to_boolean(F.col("v"))).collect()]
    assert got == [True, None, True, None, None, True, None]


def test_timestamp_canonical_text(spark):
    """Instants canonical rendering: 'yyyy-MM-dd HH:mm:ss[.ffffff] UTC'
    (spi/time/Instants.java:20-76) — fractional part only when nonzero."""
    df = spark.createDataFrame(
        [(datetime(2024, 3, 1, 12, 30, 45, 123456),),
         (datetime(2024, 3, 1, 12, 30, 45),)],
        "t TIMESTAMP",
    )
    got = [r[0] for r in df.select(timestamp_to_string(F.col("t"))).collect()]
    assert got == ["2024-03-01 12:30:45.123456 UTC", "2024-03-01 12:30:45 UTC"]


# ---------------------------------------------------------------------------
# ByteSize units (spi/unit/ByteSize.java) + per-column timezone
# (docs/design/timestamp_parsing.md:60-80 fixed-offset policy)
# ---------------------------------------------------------------------------

def test_byte_size_parse_and_format():
    from embulk_spark.functions.units import format_byte_size, parse_byte_size

    assert parse_byte_size("32KB") == 32 * 1024
    assert parse_byte_size("4MB") == 4 << 20
    assert parse_byte_size("1.5GB") == int(1.5 * (1 << 30))
    assert parse_byte_size("123") == 123
    assert parse_byte_size("10 TB") == 10 << 40
    assert parse_byte_size("2pb") == 2 << 50
    assert parse_byte_size(4096) == 4096
    import pytest as _pytest

    for bad in ("", "12XB", "-1KB", "1..2MB", "KB"):
        with _pytest.raises(ValueError):
            parse_byte_size(bad)
    assert format_byte_size(32768, "KB") == "32KB"
    assert format_byte_size(1536, "KB") == "1.50KB"


def test_per_column_timezone_fixed_offset(spark):
    from embulk_spark.functions.coerce import string_to_timestamp

    df = spark.createDataFrame([("2015-01-27 19:23:49",)], "s string")
    got = df.select(
        string_to_timestamp(F.col("s"), "%Y-%m-%d %H:%M:%S", "+09:00")
        .cast("string").alias("t"),
        string_to_timestamp(F.col("s"), "%Y-%m-%d %H:%M:%S", "PST")
        .cast("string").alias("t_pst"),
        string_to_timestamp(F.col("s"), "%Y-%m-%d %H:%M:%S")
        .cast("string").alias("t_utc"),
    ).first()
    # +09:00 local → UTC instant is 9h earlier
    assert got["t"] == "2015-01-27 10:23:49"
    # PST is the FIXED -08:00 offset (reference issue #860 policy)
    assert got["t_pst"] == "2015-01-28 03:23:49"
    assert got["t_utc"] == "2015-01-27 19:23:49"


def test_per_column_timezone_ignored_when_format_has_zone(spark):
    from embulk_spark.functions.coerce import string_to_timestamp

    df = spark.createDataFrame([("2015-01-27 19:23:49 +0200",)], "s string")
    got = df.select(
        string_to_timestamp(F.col("s"), "%Y-%m-%d %H:%M:%S %z", "+09:00")
        .cast("string").alias("t")
    ).first()
    assert got["t"] == "2015-01-27 17:23:49"


def test_region_timezone_rejected():
    from embulk_spark.functions.coerce import string_to_timestamp
    import pytest as _pytest

    with _pytest.raises(ValueError, match="region-based"):
        string_to_timestamp(F.lit("x"), "%Y-%m-%d", "America/Los_Angeles")


def test_byte_size_exact_boundaries():
    from embulk_spark.functions.units import parse_byte_size
    import pytest as _pytest

    assert parse_byte_size(str((1 << 63) - 1)) == (1 << 63) - 1
    assert parse_byte_size(str((1 << 53) + 1)) == (1 << 53) + 1
    with _pytest.raises(ValueError):
        parse_byte_size("8192PB")  # == 2^63, over the (2^63)-1 ceiling


def test_default_format_timezone_no_double_shift(spark):
    from embulk_spark.functions.coerce import string_to_timestamp

    df = spark.createDataFrame(
        [("2015-01-27 19:23:49",), ("2015-01-27 19:23:49+02:00",)], "s string"
    )
    got = [
        r["t"]
        for r in df.select(
            string_to_timestamp(F.col("s"), None, "+09:00")
            .cast("string").alias("t")
        ).collect()
    ]
    # zone-less row shifted by +09:00; zone-carrying row honors ITS zone
    assert got == ["2015-01-27 10:23:49", "2015-01-27 17:23:49"]
