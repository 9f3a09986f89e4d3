"""BM25 scoring: hand-checked values, oracle parity, plan shape."""

from __future__ import annotations

import math

import duckdb
from pyspark.sql import Row

from embulk_spark.operators.retrieval import bm25_oracle_sql, bm25_scores

DOCS = [
    Row(doc_id=1, text="spark shuffle join   Spark AGG"),
    Row(doc_id=2, text="join join join elephants"),
    Row(doc_id=3, text="nothing relevant here at all friends"),
    Row(doc_id=4, text=" spark "),
]


def test_bm25_hand_computed(spark):
    df = spark.createDataFrame(DOCS)
    got = {r.doc_id: (r.score, r.n_matched_terms)
           for r in bm25_scores(df, ["spark", "join"]).collect()}
    # corpus: N=4, dls = 5,4,6,1, avgdl=4; df(spark)=2 (docs 1,4), df(join)=2
    n, avgdl, k1, b = 4.0, 4.0, 1.2, 0.75

    def s(tf, dl, dft):
        idf = math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
        return idf * tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))

    assert set(got) == {1, 2, 4}  # doc 3 matches nothing
    assert got[1][1] == 2 and got[2][1] == 1 and got[4][1] == 1
    assert abs(got[1][0] - round(s(2, 5, 2) + s(1, 5, 2), 6)) < 1e-6
    assert abs(got[2][0] - round(s(3, 4, 2), 6)) < 1e-6
    assert abs(got[4][0] - round(s(1, 1, 2), 6)) < 1e-6


def test_bm25_matches_duckdb_oracle(spark):
    df = spark.createDataFrame(DOCS)
    got = {tuple(r) for r in bm25_scores(df, ["spark", "join", "agg"]).collect()}
    con = duckdb.connect()
    con.register("docs", df.toPandas())
    want = {tuple(r) for r in con.execute(
        bm25_oracle_sql("docs", ["spark", "join", "agg"])
    ).fetchall()}
    assert got == want


def test_bm25_plan_shape(spark):
    # query terms broadcast both joins; corpus never shuffles on token
    df = spark.createDataFrame(DOCS)
    plan = bm25_scores(df, ["spark"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row consts cross
    assert "CartesianProduct" not in plan
