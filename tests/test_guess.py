"""Guess-algorithm tests, ported from the reference corpus:
embulk-ruby/test/vanilla/guess/test_schema_guess.rb:8-45 and
test_time_format_guess.rb, plus newline/charset/compression/csv chain
(newline.rb:10-25, charset.rb:7-13, build.gradle:197)."""

from __future__ import annotations

import gzip

import pytest

from embulk_spark.functions.guess import (
    guess_bytes,
    guess_compression,
    guess_csv_dialect,
    guess_newline,
    guess_time_format,
    guess_type,
    merge_type,
    schema_guess,
    types_from_array_records,
)


# --- schema guess (test_schema_guess.rb) -----------------------------------

def test_guess_basic():
    cols = schema_guess(["int", "str"], [["1", "a"]])
    assert cols == [{"name": "int", "type": "long"}, {"name": "str", "type": "string"}]


def test_coalesce_timestamp_nodelim():
    cols = schema_guess(["a"], [["20160101"], ["20160101"]])
    assert cols == [{"name": "a", "type": "timestamp", "format": "%Y%m%d"}]


def test_coalesce_timestamp_plus_long_is_long():
    cols = schema_guess(["a"], [["20160101"], ["20160101"], ["12345678"]])
    assert cols == [{"name": "a", "type": "long"}]


@pytest.mark.parametrize(
    "s", ["true", "false", "t", "f", "yes", "no", "y", "n", "on", "off"]
)
def test_boolean_case_matrix(s):
    cols = schema_guess(
        ["a"], [[s.lower()], [s.upper()], [s.capitalize()]]
    )
    assert cols == [{"name": "a", "type": "boolean"}], s


def test_merge_lattice():
    assert merge_type("long", "double") == "double"
    assert merge_type("boolean", "long") == "long"
    assert merge_type("timestamp", "long") == "long"
    assert merge_type("boolean", "double") == "string"
    assert merge_type(None, "long") == "long"
    assert merge_type(None, None) is None


def test_double_rejects_leading_zero():
    assert guess_type("001.0") == "string"
    assert guess_type("010.01") == "string"
    assert guess_type("0.1") == "double"
    assert guess_type("NaN") == "double"
    assert guess_type("Infinity") == "double"
    assert guess_type("-1.5e10") == "double"


def test_json_cells():
    assert guess_type({"a": 1}) == "json"
    assert guess_type([1, 2]) == "json"
    assert guess_type('{"a": 1}') == "json"


def test_empty_defaults_to_string():
    assert types_from_array_records([[""], [""]]) == ["string"]


# --- time format guess (test_time_format_guess.rb) -------------------------

@pytest.mark.parametrize(
    "fmt,text",
    [
        ("%Y-%m-%d %H:%M:%S.%N", "2014-01-01 01:01:01.000000001"),
        ("%Y-%m-%d %H:%M:%S.%N", "2014-01-01 01:01:01.000001"),
        ("%Y-%m-%d %H:%M:%S.%L", "2014-01-01 01:01:01.001"),
        ("%Y-%m-%d %H:%M:%S", "2014-01-01 01:01:01"),
        ("%Y-%m-%d %H:%M", "2014-01-01 01:01"),
        ("%Y-%m-%d", "2014-01-01"),
        ("%Y/%m/%d %H-%M-%S,%N", "2014/01/01 01-01-01,000001"),
        ("%Y/%m/%d %H-%M-%S,%L", "2014/01/01 01-01-01,001"),
        ("%Y/%m/%d", "2014/01/01"),
        ("%Y.%m.%d.%H:%M:%S.%L", "2014.01.01.01:01:01.001"),
        ("%Y.%m.%d. %H:%M:%S", "2014.01.01. 01:01:01"),
        ("%m/%d/%Y", "01/01/2014"),
        ("%m.%d.%Y", "01.01.2014"),
        ("%d/%m/%Y", "13/01/2014"),
        ("%d/%m/%Y", "21/01/2014"),
        ("%d/%m/%Y %H-%M-%S", "21/01/2014 01-01-01"),
        ("%Y-%m-%d %H:%M:%S.%N", "2014-12-31 23:59:59.999999999"),
        ("%Y%m%d", "20140101"),
    ],
)
def test_time_format_cases(fmt, text):
    assert guess_time_format([text]) == fmt


def test_iso8601_t_and_zone():
    assert guess_time_format(["2014-01-01T01:01:01"]) == "%Y-%m-%dT%H:%M:%S"
    got = guess_time_format(["2014-01-01 01:01:01 +09:00"])
    assert got == "%Y-%m-%d %H:%M:%S %:z"
    got = guess_time_format(["2014-01-01 01:01:01 +0900"])
    assert got == "%Y-%m-%d %H:%M:%S %z"


def test_rfc2822_apache_ansic():
    assert (
        guess_time_format(["Fri, 20 Feb 2015 22:02:34 UT"])
        == "%a, %d %b %Y %H:%M:%S %z"
    )
    assert (
        guess_time_format(["07/Mar/2004:16:05:49 -0800"])
        == "%d/%b/%Y:%H:%M:%S %z"
    )
    assert guess_time_format(["Fri Feb 20 22:02:34 2015"]) == "%a %b %e %H:%M:%S %Y"


def test_dmy_beats_mdy_on_merge():
    # "01/02/2014" alone is MDY, but together with an unambiguous DMY
    # sample the whole column flips to DMY (time_format_guess.rb:152-160)
    assert guess_time_format(["01/02/2014", "21/01/2014"]) == "%d/%m/%Y"


def test_non_timestamps():
    assert guess_time_format(["12345678"]) is None
    assert guess_time_format(["hello"]) is None
    assert guess_time_format([""]) is None


# --- newline / compression / chain ------------------------------------------

def test_newline_vote():
    assert guess_newline(b"a\r\nb\r\nc\r\n") == "CRLF"
    assert guess_newline(b"a\nb\nc\n") == "LF"
    assert guess_newline(b"a\rb\rc\r") == "CR"


def test_compression_magic():
    assert guess_compression(gzip.compress(b"hello")) == "gzip"
    assert guess_compression(b"BZh91AY") == "bzip2"
    assert guess_compression(b"plain") is None


def test_csv_dialect_and_header():
    text = "id,name,ts\n1,alice,2014-01-01\n2,bob,2014-01-02\n"
    d = guess_csv_dialect(text)
    assert d["delimiter"] == ","
    assert d["header_line"] is True
    assert d["columns"] == [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "ts", "type": "timestamp", "format": "%Y-%m-%d"},
    ]


def test_csv_no_header_tab():
    text = "1\t2.5\tx\n2\t3.5\ty\n"
    d = guess_csv_dialect(text)
    assert d["delimiter"] == "\t"
    assert d["header_line"] is False
    assert [c["type"] for c in d["columns"]] == ["long", "double", "string"]


def test_guess_chain_gzip_csv_fixed_point():
    csv = "a,b\n" + "".join(f"{i},x{i}\n" for i in range(10))
    cfg = guess_bytes(gzip.compress(csv.encode()))
    assert cfg["decoders"] == [{"type": "gzip"}]
    assert cfg["charset"] == "UTF-8"
    assert cfg["newline"] == "LF"
    assert cfg["parser"]["type"] == "csv"
    assert cfg["parser"]["header_line"] is True


def test_guess_chain_json():
    cfg = guess_bytes(b'{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    assert cfg["parser"] == {"type": "json"}
