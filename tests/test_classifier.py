"""Hashed logistic-regression quality classifier: it learns, it matches
the unrolled DuckDB oracle, and the plan stays broadcast-shaped."""

from __future__ import annotations

import duckdb
from pyspark.sql import Row
from pyspark.sql import functions as F

from embulk_spark.operators.classifier import (
    logreg_oracle_sql,
    quality_classifier,
    score_logreg,
    train_logreg,
)


def _corpus(spark, n=120):
    rows = []
    for i in range(n):
        good = i % 2 == 0
        words = (["quality", "signal", "clean"] if good else ["spam", "noise", "junk"])
        filler = [f"w{(i * 7 + j) % 19}" for j in range(4)]
        rows.append(Row(doc_id=i, text=" ".join(words + filler), y_true=int(good)))
    return spark.createDataFrame(rows)


def test_classifier_learns_separation(spark):
    docs = _corpus(spark)
    out = quality_classifier(docs, F.col("y_true") == 1).toPandas()
    pos = out[out.y == 1].prob.mean()
    neg = out[out.y == 0].prob.mean()
    assert pos > 0.55 > 0.45 > neg  # 3 GD steps separate a separable corpus
    # and scoring is calibrated the same corpus it trained on
    acc = ((out.prob > 0.5).astype(int) == out.y).mean()
    assert acc > 0.95


def test_classifier_matches_unrolled_oracle(spark):
    docs = _corpus(spark, 80)
    got = {tuple(r) for r in quality_classifier(docs, F.col("y_true") == 1).collect()}
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    want = {tuple(r) for r in con.execute(
        logreg_oracle_sql("docs", "y_true = 1")
    ).fetchall()}
    assert got == want


def test_score_new_documents(spark):
    docs = _corpus(spark)
    w, b = train_logreg(docs, F.col("y_true") == 1)
    unseen = spark.createDataFrame(
        [Row(doc_id=900, text="quality clean signal signal"),
         Row(doc_id=901, text="junk noise spam spam"),
         Row(doc_id=902, text="")]  # zero tokens -> not scorable
    )
    got = {r.doc_id: r.prob for r in score_logreg(unseen, w, b).collect()}
    assert set(got) == {900, 901}
    assert got[900] > 0.5 > got[901]


def test_training_plan_broadcasts_weights(spark):
    docs = _corpus(spark, 40)
    out = quality_classifier(docs, F.col("y_true") == 1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
