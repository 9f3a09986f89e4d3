"""Grok and XML ecosystem parsers + the eval (Catalyst-expression)
filter."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from embulk_spark.pipeline import apply_filter
from embulk_spark.sources.grok import BASE_PATTERNS, grok_compile, read_grok
from embulk_spark.sources.xml import read_xml


# ---------------------------------------------------------------------------
# grok
# ---------------------------------------------------------------------------

def test_grok_compile_named_and_typed():
    regex, cols = grok_compile("%{WORD:verb} %{NUMBER:code:int} %{GREEDYDATA:msg}")
    assert [c["name"] for c in cols] == ["verb", "code", "msg"]
    assert [c["type"] for c in cols] == ["string", "long", "string"]
    import re

    m = re.match("^" + regex + "$", "GET 200 hello world")
    assert m and m.group(2) == "200"


def test_grok_composite_group_order():
    # a named composite whose body carries named fields: the outer group
    # opens first, columns must follow regex group numbering
    regex, cols = grok_compile(
        "%{PAIR:pair}",
        extra_patterns={"PAIR": "%{WORD:k}=%{INT:v:int}"},
    )
    import re

    m = re.match(regex, "a=1")
    assert [c["name"] for c in cols] == ["pair", "k", "v"]
    assert (m.group(1), m.group(2), m.group(3)) == ("a=1", "a", "1")


def test_grok_unknown_and_cycle():
    with pytest.raises(ValueError, match="unknown grok"):
        grok_compile("%{NOPE:x}")
    with pytest.raises(ValueError, match="cycle"):
        grok_compile("%{A:x}", extra_patterns={"A": "%{B}", "B": "%{A}"})


def test_read_grok_apache_log(spark, tmp_path):
    p = tmp_path / "access.log"
    p.write_text(
        '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
        '"GET /apache_pb.gif HTTP/1.0" 200 2326\n'
        'not a log line\n'
        '10.0.0.5 - - [11/Oct/2000:14:00:01 +0000] '
        '"POST /submit HTTP/1.1" 404 -\n'
    )
    out = read_grok(
        spark, [str(p)], {"grok_pattern": "%{COMMONAPACHELOG}"}
    ).collect()
    assert len(out) == 2  # invalid line skipped
    by_ip = {r.clientip: r for r in out}
    r1 = by_ip["127.0.0.1"]
    assert (r1.auth, r1.verb, r1.request, r1.response, r1.bytes) == (
        "frank", "GET", "/apache_pb.gif", 200, 2326
    )
    r2 = by_ip["10.0.0.5"]
    assert (r2.response, r2.bytes) == (404, None)  # '-' bytes → null


def test_base_patterns_group_count_matches_columns():
    # every capture group must come from a %{...:field} reference —
    # stray parens in an alias body would break group↔column numbering
    import re

    for name in BASE_PATTERNS:
        expanded, cols = grok_compile("%{" + name + "}")
        assert re.compile(expanded).groups == len(cols), name


# ---------------------------------------------------------------------------
# xml
# ---------------------------------------------------------------------------

def test_read_xml_records(spark, tmp_path):
    p = tmp_path / "dump.xml"
    p.write_text(
        """<?xml version="1.0"?>
<export>
  <page id="1">
    <title>Alpha &amp; Beta</title>
    <views>100</views>
  </page>
  <page id="2">
    <title>Second
line</title>
  </page>
</export>
"""
    )
    out = read_xml(
        spark,
        [str(p)],
        {
            "row_tag": "page",
            "columns": [
                {"name": "@id", "type": "long"},
                {"name": "title", "type": "string"},
                {"name": "views", "type": "long"},
            ],
        },
    ).collect()
    got = {r.id: (r.title, r.views) for r in out}
    assert got == {1: ("Alpha & Beta", 100), 2: ("Second\nline", None)}


def test_xml_via_input_chain(spark, tmp_path):
    from embulk_spark.sources.files import read_input_files

    p = tmp_path / "r.xml"
    p.write_text("<d><r><v>7</v></r><r><v>8</v></r></d>")
    df, _ = read_input_files(
        spark,
        {
            "path_prefix": str(p),
            "parser": {
                "type": "xml",
                "row_tag": "r",
                "columns": [{"name": "v", "type": "long"}],
            },
        },
    )
    assert sorted(r.v for r in df.collect()) == [7, 8]


# ---------------------------------------------------------------------------
# filter-eval
# ---------------------------------------------------------------------------

def test_eval_filter(spark):
    df = spark.createDataFrame(
        [Row(id=1, score=0.2), Row(id=2, score=0.9), Row(id=3, score=0.7)]
    )
    out = apply_filter(
        df,
        {
            "type": "eval",
            "where": "score > 0.5",
            "columns": [
                {"name": "scaled", "expr": "round(score * 10)"},
                {"name": "score", "expr": "score * 2"},  # replace in place
            ],
            "drop": ["id"],
        },
    )
    rows = sorted(out.collect(), key=lambda r: r.scaled)
    assert out.columns == ["score", "scaled"]
    assert [(r.scaled, round(r.score, 2)) for r in rows] == [(7, 1.4), (9, 1.8)]
