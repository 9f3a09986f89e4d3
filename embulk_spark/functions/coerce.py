"""The six-type system and dynamic column coercions, as Column expressions.

Embulk supports exactly six scalar column types — boolean, long, double,
string, timestamp, json (reference
embulk-core/src/main/java/org/embulk/spi/PageBuilderImpl.java:286-303) —
and coerces values between them via per-type "dynamic column setters"
(embulk-core/src/main/java/org/embulk/spi/util/dynamic/*.java). This module
re-expresses each setter as a JVM-side pyspark Column expression (no Python
in the hot path); unparseable values become null, matching the reference's
NullDefaultValueSetter
(embulk-core/src/main/java/org/embulk/spi/util/dynamic/NullDefaultValueSetter.java).

Type mapping (SURVEY.md §1.2): boolean→BooleanType, long→LongType,
double→DoubleType, string→StringType, timestamp→TimestampType (µs; the
reference keeps nanos, PageBuilderImpl.java:201-207 — documented delta),
json→StringType holding canonical JSON text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Embulk's six types → Spark SQL types (SURVEY.md §1.2 table).
EMBULK_TO_SPARK: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "timestamp": T.TimestampType(),
    "json": T.StringType(),
}

#: The TRUE-string set of BooleanColumnSetter
#: (spi/util/dynamic/BooleanColumnSetter.java:17-21).
TRUE_STRINGS = (
    "true", "True", "TRUE",
    "yes", "Yes", "YES",
    "t", "T", "y", "Y",
    "on", "On", "ON", "1",
)

#: Strings SchemaGuess treats as boolean (guess-side set is wider and
#: case-insensitive-ish; embulk-ruby/lib/embulk/guess/schema_guess.rb:97-110).
GUESS_TRUE_STRINGS = (
    "true", "True", "TRUE", "yes", "Yes", "YES", "t", "T", "y", "Y",
    "on", "On", "ON", "v", "V",
)
GUESS_FALSE_STRINGS = (
    "false", "False", "FALSE", "no", "No", "NO", "f", "F", "n", "N",
    "off", "Off", "OFF",
)


def schema_to_struct(columns: list[tuple[str, str]]) -> T.StructType:
    """Embulk Schema (ordered (name, type) list, SchemaConfig.java:52-58)
    → Spark StructType with the order preserved."""
    return T.StructType(
        [T.StructField(name, EMBULK_TO_SPARK[typ], True) for name, typ in columns]
    )


# ---------------------------------------------------------------------------
# to LONG  (spi/util/dynamic/LongColumnSetter.java:22-81)
# ---------------------------------------------------------------------------

def double_to_long(c: Column) -> Column:
    """Half-away-from-zero rounding; NaN/Inf → null.

    Mirrors LongColumnSetter.set(double): Math.rint then, when the value is
    exactly x.5 away, round away from zero (LongColumnSetter.java:31-46).
    Note Math.rint is half-to-even, so only exact .5 diffs get the
    away-from-zero correction.
    """
    rinted = F.rint(c)
    away = c + F.when(c >= 0, F.lit(0.5)).otherwise(F.lit(-0.5))
    rounded = F.when(F.abs(c - rinted) == 0.5, away).otherwise(rinted)
    return (
        F.when(F.isnan(c) | (F.abs(c) == float("inf")), F.lit(None))
        .otherwise(rounded)
        .cast("long")
    )


def boolean_to_long(c: Column) -> Column:
    """true→1, false→0 (LongColumnSetter.java:22-24)."""
    return F.when(c, F.lit(1)).otherwise(F.lit(0)).cast("long")


def string_to_long(c: Column) -> Column:
    """Long.parseLong semantics: strict integer parse, else null
    (LongColumnSetter.java:50-59). try_cast(long) uses ANSI parse semantics
    (null on overflow/malformed) but accepts surrounding blanks, so gate
    with a strict regex first. Full 19-digit range: values in
    [10^18, 2^63) parse like Long.parseLong; 2^63 and beyond null out."""
    strict = c.rlike(r"^[+-]?\d+$")
    return F.when(strict, c.try_cast("long")).otherwise(
        F.lit(None).cast("long")
    )


def timestamp_to_long(c: Column) -> Column:
    """Timestamp → epoch seconds (LongColumnSetter.java:62-70).
    Accepts TIMESTAMP_NTZ too (session tz is pinned UTC, so the cast is
    instant-preserving)."""
    return F.floor(F.unix_micros(c.cast("timestamp")) / F.lit(1_000_000)).cast("long")


# ---------------------------------------------------------------------------
# to DOUBLE  (spi/util/dynamic/DoubleColumnSetter.java)
# ---------------------------------------------------------------------------

def boolean_to_double(c: Column) -> Column:
    return F.when(c, F.lit(1.0)).otherwise(F.lit(0.0))


def string_to_double(c: Column) -> Column:
    """Double.parseDouble semantics, else null. try_cast('double') matches
    Java's parse for decimal/exponent/Infinity/NaN forms closely enough;
    Java additionally trims whitespace — we replicate that."""
    return F.trim(c).try_cast("double")


def timestamp_to_double(c: Column) -> Column:
    """Epoch seconds + fractional nanos (DoubleColumnSetter.java:55-60);
    Spark carries µs so the fraction is µs-precision."""
    return F.unix_micros(c.cast("timestamp")).cast("double") / F.lit(1_000_000.0)


# ---------------------------------------------------------------------------
# to BOOLEAN  (spi/util/dynamic/BooleanColumnSetter.java)
# ---------------------------------------------------------------------------

def long_to_boolean(c: Column) -> Column:
    """v > 0 (BooleanColumnSetter.java:42-44). Note: negative → false."""
    return c > 0


def double_to_boolean(c: Column) -> Column:
    return c > 0.0


def string_to_boolean(c: Column) -> Column:
    """Member of TRUE_STRINGS → true, anything else (incl. 'false') → null
    (BooleanColumnSetter.java:56-62: non-true strings hit the default-value
    setter, which is null)."""
    return F.when(c.isin(*TRUE_STRINGS), F.lit(True)).otherwise(
        F.lit(None).cast("boolean")
    )


# ---------------------------------------------------------------------------
# to STRING  (spi/util/dynamic/StringColumnSetter.java:22-70)
# ---------------------------------------------------------------------------

#: Canonical instant rendering used by Embulk's Instants.toString
#: (embulk-core/src/main/java/org/embulk/spi/time/Instants.java:20-76):
#: "yyyy-MM-dd HH:mm:ss[.fraction] UTC". We render µs when sub-second.
def timestamp_to_string(c: Column) -> Column:
    c = c.cast("timestamp")
    whole = F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    micros = F.unix_micros(c) % 1_000_000
    frac = F.when(
        micros != 0,
        F.concat(F.lit("."), F.lpad(micros.cast("string"), 6, "0")),
    ).otherwise(F.lit(""))
    return F.concat(whole, frac, F.lit(" UTC"))


def any_to_string(c: Column) -> Column:
    """toString semantics for bool/long/double/string (StringColumnSetter)."""
    return c.cast("string")


# ---------------------------------------------------------------------------
# to TIMESTAMP  (spi/util/dynamic/TimestampColumnSetter.java:22-77)
# ---------------------------------------------------------------------------

def long_to_timestamp(c: Column) -> Column:
    """Epoch seconds → timestamp."""
    return F.timestamp_seconds(c)


def double_to_timestamp(c: Column) -> Column:
    """Seconds + fraction → timestamp (µs resolution)."""
    return F.timestamp_micros(F.round(c * 1_000_000).cast("long"))


#: Ruby-compatible FIXED-offset zone names (docs/design/
#: timestamp_parsing.md:60-80 — region zones are rejected since v0.9;
#: abbreviations resolve to fixed offsets, never DST rules).
FIXED_OFFSET_ZONES = {
    "Z": "+00:00", "UTC": "+00:00", "UT": "+00:00", "GMT": "+00:00",
    "EST": "-05:00", "EDT": "-04:00", "CST": "-06:00", "CDT": "-05:00",
    "MST": "-07:00", "MDT": "-06:00", "PST": "-08:00", "PDT": "-07:00",
}


def string_to_timestamp(
    c: Column, fmt: str | None = None, timezone: str | None = None
) -> Column:
    """Parse with a per-column format (ColumnConfig 'format' option,
    spi/ColumnConfig.java:62-73) or the engine default
    '%Y-%m-%d %H:%M:%S.%N %z' (spi/time/TimestampParser.java:44-51);
    unparseable → null.

    ``timezone``: the per-column default zone for strings WITHOUT zone
    info — interpreted as a FIXED offset per the reference's v0.9 policy
    (docs/design/timestamp_parsing.md:60-80: '+09:00' literal offsets and
    the Ruby abbreviation set; region-based zones are rejected). Ignored
    when the format itself consumes a zone (%z/%Z)."""
    offset = None
    if timezone:
        offset = FIXED_OFFSET_ZONES.get(timezone, timezone)
        if not (offset.startswith("+") or offset.startswith("-")):
            raise ValueError(
                f"region-based timezone {timezone!r} is not supported; "
                "use a fixed offset like '+09:00' (reference v0.9 policy)"
            )
    if fmt is None:
        naive = F.coalesce(
            F.try_to_timestamp(c, F.lit("yyyy-MM-dd HH:mm:ss.SSSSSS")),
            F.try_to_timestamp(c, F.lit("yyyy-MM-dd HH:mm:ss")),
        )
        if offset and offset != "+00:00":
            # per-ROW zone handling on the default path: the strict naive
            # patterns reject strings that carry an inline offset, so only
            # zone-less rows get re-interpreted in the configured offset;
            # zone-carrying rows fall through to the default parser, which
            # honors their own offset (no double shift).
            naive = F.to_utc_timestamp(naive, offset)
        return F.coalesce(naive, F.try_to_timestamp(c))
    parsed = F.try_to_timestamp(c, F.lit(strptime_to_java(fmt)))
    has_zone_directive = any(d in fmt for d in ("%z", "%:z", "%Z"))
    if offset and offset != "+00:00" and not has_zone_directive:
        # session tz is pinned UTC: parsed is the naive reading as UTC;
        # re-interpret it as the configured fixed offset
        parsed = F.to_utc_timestamp(parsed, offset)
    return parsed


# ---------------------------------------------------------------------------
# to JSON  (spi/util/dynamic/JsonColumnSetter.java) — canonical JSON text
# ---------------------------------------------------------------------------

def any_to_json(c: Column) -> Column:
    """Wrap a scalar into canonical JSON text (to_json of the value)."""
    return F.to_json(F.struct(c.alias("v")))


# ---------------------------------------------------------------------------
# strptime (Ruby-style, used throughout Embulk configs) → Java patterns
# ---------------------------------------------------------------------------

_STRPTIME_MAP = {
    "%Y": "yyyy", "%y": "yy",
    "%m": "MM", "%d": "dd", "%e": "d",
    "%H": "HH", "%k": "H", "%I": "hh", "%M": "mm", "%S": "ss",
    "%N": "SSSSSSSSS", "%6N": "SSSSSS", "%3N": "SSS", "%L": "SSS",
    "%z": "xx", "%:z": "xxx", "%Z": "zzz",
    "%a": "EEE", "%A": "EEEE", "%b": "MMM", "%B": "MMMM",
    "%p": "a", "%j": "DDD", "%%": "%",
}


def strptime_to_java(fmt: str) -> str:
    """Convert a Ruby-strptime pattern (Embulk's config format,
    spi/time/TimestampParser.java:9-51) to a Java DateTimeFormatter pattern
    accepted by to_timestamp/date_format."""
    out: list[str] = []
    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%":
            for k in ("%:z", "%6N", "%3N"):
                if fmt.startswith(k, i):
                    out.append(_STRPTIME_MAP[k])
                    i += len(k)
                    break
            else:
                key = fmt[i : i + 2]
                if key in _STRPTIME_MAP:
                    out.append(_STRPTIME_MAP[key])
                    i += 2
                else:  # unknown directive: pass through literally
                    out.append(fmt[i + 1 : i + 2])
                    i += 2
        elif ch.isalpha():
            out.append(f"'{ch}'")
            i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


#: Full coercion dispatch table: (from_type, to_type) → Column fn.
#: Mirrors the setter matrix of spi/util/dynamic/*.java; identity pairs cast.
COERCIONS: dict[tuple[str, str], object] = {
    ("boolean", "long"): boolean_to_long,
    ("double", "long"): double_to_long,
    ("string", "long"): string_to_long,
    ("timestamp", "long"): timestamp_to_long,
    ("boolean", "double"): boolean_to_double,
    ("long", "double"): lambda c: c.cast("double"),
    ("string", "double"): string_to_double,
    ("timestamp", "double"): timestamp_to_double,
    ("long", "boolean"): long_to_boolean,
    ("double", "boolean"): double_to_boolean,
    ("string", "boolean"): string_to_boolean,
    ("boolean", "string"): any_to_string,
    ("long", "string"): any_to_string,
    ("double", "string"): any_to_string,
    ("timestamp", "string"): timestamp_to_string,
    ("long", "timestamp"): long_to_timestamp,
    ("double", "timestamp"): double_to_timestamp,
    ("string", "timestamp"): string_to_timestamp,
}


def coerce(c: Column, from_type: str, to_type: str) -> Column:
    """Coerce ``c`` between two Embulk types with reference semantics.

    Unsupported directions (json→numeric, timestamp→boolean, …) return null,
    matching the reference's default-value fallback."""
    if from_type == to_type:
        return c
    fn = COERCIONS.get((from_type, to_type))
    if fn is None:
        return F.lit(None).cast(EMBULK_TO_SPARK[to_type])
    return fn(c)
