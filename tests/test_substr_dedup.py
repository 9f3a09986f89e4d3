"""ExactSubstr-style duplicated-span dedup (operators/substr.py):
keep-first semantics, span merging, within-doc repeats, and
partitioning invariance on crafted fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embulk_spark.operators.substr import (
    duplicated_gram_stats,
    kgram_hits,
    substring_dedup,
)

BLOCK = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens


def _dedup(spark, rows, k=8):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = substring_dedup(df, "text", "doc_id", k=k)
    return {r["doc_id"]: r for r in out.collect()}


def test_first_occurrence_keeps_later_docs_cut(spark):
    got = _dedup(spark, [
        (1, f"intro one two {BLOCK} outro"),
        (2, f"other prefix {BLOCK} tail words here"),
        (3, "nothing duplicated in this one at all ok"),
    ])
    assert got[1]["text"] == f"intro one two {BLOCK} outro"
    assert got[1]["n_dup_spans"] == 0
    assert got[2]["text"] == "other prefix tail words here"
    assert got[2]["n_dup_spans"] == 1 and got[2]["n_tokens_dropped"] == 8
    assert got[3]["n_dup_spans"] == 0


def test_longer_shared_run_merges_into_one_span(spark):
    long_block = BLOCK + " india juliet"  # 10 tokens → 3 dup 8-grams
    got = _dedup(spark, [
        (1, f"{long_block} unique tail"),
        (2, f"lead {long_block}"),
    ])
    assert got[2]["n_dup_spans"] == 1
    assert got[2]["n_tokens_dropped"] == 10
    assert got[2]["text"] == "lead"


def test_within_doc_repeat_is_cut(spark):
    got = _dedup(spark, [(1, f"{BLOCK} middle bit {BLOCK}")])
    assert got[1]["n_dup_spans"] == 1 and got[1]["n_tokens_dropped"] == 8
    assert got[1]["text"] == f"{BLOCK} middle bit"


def test_case_normalized_keys_original_case_kept(spark):
    got = _dedup(spark, [
        (1, f"x {BLOCK}"),
        (2, "y " + BLOCK.upper()),
    ])
    assert got[1]["n_dup_spans"] == 0
    assert got[2]["text"] == "y"  # cut despite different casing


def test_short_docs_pass_through_untouched(spark):
    text = "too   short\tto have grams"
    got = _dedup(spark, [(1, text), (2, text)])
    # < k tokens → no grams → byte-identical pass-through incl. whitespace
    assert got[1]["text"] == text and got[2]["text"] == text
    assert all(r["n_dup_spans"] == 0 for r in got.values())


def test_partitioning_invariant(spark):
    rows = [(i, f"doc {i} pad words {BLOCK} trailer {i}") for i in range(30)]
    df1 = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: (r["text"], r["n_tokens_dropped"])
         for r in substring_dedup(df1, "text", "doc_id").collect()}
    b = {r["doc_id"]: (r["text"], r["n_tokens_dropped"])
         for r in substring_dedup(df1.repartition(11), "text", "doc_id").collect()}
    assert a == b
    # shared context "pad words … trailer" makes windows at pos 2..5 all
    # duplicated → merged span [2, 13) = 11 tokens cut in every non-first doc
    assert a[0][1] == 0 and all(a[i][1] == 11 for i in range(1, 30))
    assert a[7][0] == "doc 7 7"


def test_stats_report_winner(spark):
    df = spark.createDataFrame(
        [(5, f"aa {BLOCK}"), (2, f"bb cc {BLOCK}")],
        "doc_id long, text string",
    )
    stats = duplicated_gram_stats(kgram_hits(df, "text", "doc_id")).collect()
    assert len(stats) == 1
    r = stats[0]
    assert (r["winner_id"], r["winner_pos"], r["n_occurrences"]) == (2, 2, 2)
