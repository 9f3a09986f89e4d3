"""Incremental term-statistics index: incremental == batch, supersede,
tombstones, idempotent epoch commits."""

from __future__ import annotations

from pyspark.sql import functions as F

from embulk_spark.operators.retrieval import bm25_scores
from embulk_spark.operators.termindex import TermIndex


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_equals_batch_df_and_bm25(spark, tmp_path):
    idx = TermIndex(spark, str(tmp_path / "ti"), id_col="doc_id",
                    id_type="bigint")
    e0 = _docs(spark, [
        (1, "the quick brown fox"),
        (2, "the lazy dog"),
        (3, "quick quick dog"),
    ])
    # epoch 1: doc 1 updated, doc 2 deleted, doc 4 arrives
    e1 = _docs(spark, [
        (1, "the slow brown turtle"),
        (2, None),
        (4, "dog dog dog quick"),
    ])
    idx.update_epoch(e0, "text", 0)
    idx.update_epoch(e1, "text", 1)

    final = _docs(spark, [
        (1, "the slow brown turtle"),
        (3, "quick quick dog"),
        (4, "dog dog dog quick"),
    ])
    # df parity
    got_df = {(r.term, r.df) for r in idx.term_df().collect()}
    want_df = {
        (r.term, r.df)
        for r in final.select(
            F.explode(F.array_distinct(F.split(F.lower(F.trim("text")), r"\s+")))
            .alias("term")
        ).groupBy("term").agg(F.count(F.lit(1)).alias("df")).collect()
    }
    assert got_df == want_df

    # bm25 parity with the batch scorer over the final corpus
    q = ["quick", "dog", "turtle"]
    got = {
        (r.id, r.score, r.n_matched_terms)
        for r in idx.bm25(q).collect()
    }
    want = {
        (r.doc_id, r.score, r.n_matched_terms)
        for r in bm25_scores(final, q).collect()
    }
    assert got == want


def test_as_of_epoch_and_duplicate_delivery(spark, tmp_path):
    idx = TermIndex(spark, str(tmp_path / "ti"), id_col="doc_id",
                    id_type="bigint")
    e0 = _docs(spark, [(1, "alpha beta"), (2, "beta gamma")])
    assert idx.update_epoch(e0, "text", 0)["committed"]
    # duplicate delivery is a no-op
    assert idx.update_epoch(e0, "text", 0)["skipped_duplicate_epoch"]
    idx.update_epoch(_docs(spark, [(1, None)]), "text", 1)

    as_of0 = {(r.term, r.df) for r in idx.term_df(as_of_epoch=0).collect()}
    assert as_of0 == {("alpha", 1), ("beta", 2), ("gamma", 1)}
    now = {(r.term, r.df) for r in idx.term_df().collect()}
    assert now == {("beta", 1), ("gamma", 1)}


def test_resumed_handle_refuses_mixed_conventions(spark, tmp_path):
    import pytest

    TermIndex(spark, str(tmp_path / "ti"), id_col="doc_id", id_type="bigint")
    TermIndex(spark, str(tmp_path / "ti"), id_col="doc_id", id_type="bigint")
    with pytest.raises(ValueError, match="refusing to mix"):
        TermIndex(spark, str(tmp_path / "ti"), id_col="url")


def test_empty_index_answers_with_schema(spark, tmp_path):
    idx = TermIndex(spark, str(tmp_path / "ti"), id_col="doc_id",
                    id_type="bigint")
    assert idx.term_df().count() == 0
    assert idx.bm25(["x"]).count() == 0
