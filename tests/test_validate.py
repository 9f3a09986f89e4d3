"""Data-quality rules: report counts, enforcement policies, pipeline hook."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from embulk_spark.operators.validate import validate, violation_report
from embulk_spark.pipeline import apply_filter

ROWS = [
    Row(id=1, v=5.0, kind="a", code="X1"),
    Row(id=2, v=-1.0, kind="b", code="X2"),     # range violation
    Row(id=3, v=None, kind="a", code="zz"),     # regex violation (v NULL passes range)
    Row(id=4, v=50.0, kind="c", code="X3"),     # in_set violation
    Row(id=5, v=2.0, kind=None, code="X4"),     # not_null violation
    Row(id=6, v=3.0, kind="a", code="X5"),
    Row(id=6, v=4.0, kind="b", code="X6"),      # unique violation (id 6 twice)
]

RULES = [
    {"column": "kind", "check": "not_null"},
    {"column": "v", "check": "range", "min": 0, "max": 10},
    {"column": "code", "check": "regex", "pattern": "^X[0-9]$"},
    {"column": "kind", "check": "in_set", "values": ["a", "b"]},
    {"column": "id", "check": "unique"},
    {"check": "expr", "expr": "id < 100", "name": "id_small"},
]


def test_violation_report_counts(spark):
    df = spark.createDataFrame(ROWS)
    rep = {r.rule: (r.violations, r.checked) for r in violation_report(df, RULES).collect()}
    assert rep["kind:not_null"] == (1, 7)
    assert rep["v:range[0,10]"] == (2, 7)  # -1 and 50; NULL passes
    assert rep["code:regex"] == (1, 7)
    assert rep["kind:in_set"] == (1, 7)  # 'c'; NULL passes (not_null's job)
    assert rep["id:unique"] == (2, 7)  # both rows of id 6
    assert rep["id_small"] == (0, 7)


def test_validate_fail_raises_with_counts(spark):
    df = spark.createDataFrame(ROWS)
    with pytest.raises(ValueError, match="kind:not_null"):
        validate(df, RULES, policy="fail")
    # a clean frame passes through unchanged
    clean = df.filter("id = 1")
    assert validate(clean, RULES, policy="fail").count() == 1


def test_validate_drop_and_tag(spark):
    df = spark.createDataFrame(ROWS)
    kept = {(r.id, r.kind) for r in validate(df, RULES, policy="drop").collect()}
    # row-level violations gone AND every row of duplicated id 6 gone
    assert kept == {(1, "a")}
    tagged = {r.id: r._valid for r in validate(df, RULES, policy="tag").collect() if r.id != 6}
    assert tagged == {1: True, 2: False, 3: False, 4: False, 5: False}


def test_pipeline_validate_filter(spark):
    df = spark.createDataFrame(ROWS)
    out = apply_filter(
        df,
        {
            "type": "validate",
            "policy": "drop",
            "rules": [{"column": "v", "check": "range", "min": 0}],
        },
    )
    assert {r.id for r in out.collect()} == {1, 3, 4, 5, 6}
