"""Data-quality validation rules: declarative row/key constraints with an
audited violation report and a drop/fail/tag enforcement gate.

Embulk's validity surface is per-record and implicit — a CSV row that
fails type coercion either aborts the run (``stop_on_invalid_record``,
reference embulk-util-csv via sources/files.py FAILFAST) or is skipped
with a log line; ColumnSetters null-out unparseable cells
(reference DoubleColumnSetter.java:44-49). This operator generalizes
that contract to declared, *named* rules over any frame in the filter
chain, with the counts a 100 TB ingest needs for monitoring (violation
counts per rule per run land in the pipeline's audit output, like the
commit metrics in streaming/lake.py).

Rule kinds (each a dict, ``name`` optional — defaults shown):
- ``{"column": c, "check": "not_null"}``
- ``{"column": c, "check": "range", "min": x, "max": y}`` (inclusive;
  either bound optional; NULL passes — pair with not_null to reject)
- ``{"column": c, "check": "regex", "pattern": p}`` (full-match not
  required; NULL passes)
- ``{"column": c, "check": "in_set", "values": [...]}`` (NULL passes)
- ``{"check": "expr", "expr": "<sql boolean>", "name": ...}`` —
  arbitrary row predicate (the escape hatch)
- ``{"column": c, "check": "unique"}`` — key-level: rows whose value
  occurs more than once are violations (NULLs exempt, like SQL UNIQUE)

Scale shape: every row-level rule folds into ONE aggregate pass
(conditional partial-combine sums — a single job regardless of rule
count), un-pivoted to (rule, violations, checked) rows by a ``stack``
projection over the 1-row result. Each ``unique`` rule adds one
hash-agg on its column (map-side combine; only over-represented keys
survive the filter). Nothing collects except the ≤ |rules|-row report.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rule_name(rule: dict) -> str:
    if rule.get("name"):
        return str(rule["name"])
    col = rule.get("column", "")
    extra = ""
    if rule["check"] == "range":
        extra = f"[{rule.get('min', '')},{rule.get('max', '')}]"
    return f"{col}:{rule['check']}{extra}" if col else rule["check"]


def rule_predicate(rule: dict) -> Column:
    """True ⇔ the row satisfies the (row-level) rule."""
    check = rule["check"]
    if check == "expr":
        return F.expr(rule["expr"])
    c = F.col(rule["column"])
    if check == "not_null":
        return c.isNotNull()
    if check == "range":
        pred = F.lit(True)
        if rule.get("min") is not None:
            pred = pred & (c >= F.lit(rule["min"]))
        if rule.get("max") is not None:
            pred = pred & (c <= F.lit(rule["max"]))
        return c.isNull() | pred
    if check == "regex":
        return c.isNull() | c.rlike(rule["pattern"])
    if check == "in_set":
        return c.isNull() | c.isin(list(rule["values"]))
    raise ValueError(f"not a row-level check: {check}")


def _split(rules: list[dict]) -> tuple[list[dict], list[dict]]:
    row = [r for r in rules if r["check"] != "unique"]
    key = [r for r in rules if r["check"] == "unique"]
    return row, key


def violation_report(df: DataFrame, rules: list[dict]) -> DataFrame:
    """(rule, violations, checked) — one row per rule.

    ``checked`` is the total row count for row-level rules and the
    non-NULL count for unique rules (NULL keys are exempt)."""
    row_rules, key_rules = _split(rules)
    parts: list[DataFrame] = []
    if row_rules:
        aggs = [F.count(F.lit(1)).alias("_n")]
        for i, r in enumerate(row_rules):
            aggs.append(
                F.sum(F.when(~rule_predicate(r), 1).otherwise(0)).alias(f"_v{i}")
            )
        one = df.agg(*aggs)
        pairs = ", ".join(
            f"'{_rule_name(r)}', _v{i}" for i, r in enumerate(row_rules)
        )
        parts.append(
            one.selectExpr(
                f"stack({len(row_rules)}, {pairs}) AS (rule, violations)", "_n"
            ).select(
                "rule",
                F.col("violations").cast("long").alias("violations"),
                F.col("_n").cast("long").alias("checked"),
            )
        )
    for r in key_rules:
        c = F.col(r["column"])
        per_key = (
            df.filter(c.isNotNull())
            .groupBy(r["column"])
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        parts.append(
            per_key.agg(
                F.coalesce(
                    F.sum(F.when(F.col("_cnt") > 1, F.col("_cnt"))), F.lit(0)
                ).cast("long").alias("violations"),
                F.coalesce(F.sum("_cnt"), F.lit(0)).cast("long").alias("checked"),
            ).select(F.lit(_rule_name(r)).alias("rule"), "violations", "checked")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def validate(
    df: DataFrame, rules: list[dict], *, policy: str = "fail"
) -> DataFrame:
    """Enforce the rules.

    - ``fail``: raise if ANY rule has violations (Embulk's
      ``stop_on_invalid_record`` as an all-or-nothing transaction gate;
      triggers one aggregate action — the only eager policy).
    - ``drop``: remove offending rows (for ``unique`` rules every row of
      a duplicated key goes — keep-one dedup is the ``dedup`` filter's
      job, a *constraint* has no winner).
    - ``tag``: append boolean ``_valid`` (row-level rules only in the
      tag; key-level uniqueness can't be a per-row verdict without a
      winner rule).
    """
    row_rules, key_rules = _split(rules)
    pred = F.lit(True)
    for r in row_rules:
        pred = pred & rule_predicate(r)
    if policy == "fail":
        bad = {
            r["rule"]: r["violations"]
            for r in violation_report(df, rules).collect()
            if r["violations"]
        }
        if bad:
            raise ValueError(f"validation failed: {bad}")
        return df
    if policy == "tag":
        return df.withColumn("_valid", pred)
    if policy == "drop":
        out = df.filter(pred)
        for r in key_rules:
            c = r["column"]
            dup_keys = (
                df.filter(F.col(c).isNotNull())
                .groupBy(c)
                .agg(F.count(F.lit(1)).alias("_cnt"))
                .filter(F.col("_cnt") > 1)
                .select(c)
            )
            out = out.join(dup_keys, on=c, how="left_anti")
        return out
    raise ValueError(f"unknown policy: {policy}")
