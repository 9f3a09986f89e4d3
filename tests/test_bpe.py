"""BPE tokenizer training (operators/bpe.py): merge-rule induction over
the word vocab, leftmost-first application, Spark ≡ DuckDB-oracle parity."""

from __future__ import annotations

import duckdb
import pandas as pd

from embulk_spark.operators.bpe import (
    bpe_encode,
    bpe_encode_oracle_sql,
    bpe_token_counts,
    bpe_train,
    bpe_train_oracle_sql,
)

CORPUS = [
    "the cat sat on the mat the cat",
    "a cat and a hat and a mat",
    "the hat that the cat wore",
]


def _docs(spark, texts=CORPUS):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_classical_merges_on_toy_corpus(spark):
    got = [
        (r["round"], r["pair_a"], r["pair_b"], r["merged"], r["pair_count"])
        for r in bpe_train(_docs(spark), n_merges=4, min_freq=1).collect()
    ]
    # hand-checked: 'at' appears in cat×4 sat mat×2 hat×2 that = 10
    assert got == [
        (1, "a", "t", "at", 10),
        (2, "t", "h", "th", 6),
        (3, "th", "e", "the", 5),
        (4, "c", "at", "cat", 4),
    ]


def test_leftmost_first_and_positional_counts(spark):
    """[a,a,a] counts (a,a) twice but merges leftmost-first to [aa, a]:
    round 2 must see the pair (aa, a) — never (a, aa)."""
    docs = _docs(spark, ["aaa aaa"])
    got = [
        (r["round"], r["pair_a"], r["pair_b"], r["pair_count"])
        for r in bpe_train(docs, n_merges=2, min_freq=1).collect()
    ]
    assert got == [(1, "a", "a", 4), (2, "aa", "a", 2)]


def test_spark_matches_duckdb_oracle(spark):
    merges = bpe_train(_docs(spark), n_merges=6, min_freq=1)
    got = [tuple(r) for r in merges.collect()]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"text": CORPUS}))
    want = con.execute(
        bpe_train_oracle_sql(n_merges=6, min_freq=1)
    ).fetchall()
    assert got == want


def test_token_counts_conserve_characters(spark):
    docs = _docs(spark)
    merges = bpe_train(docs, n_merges=4, min_freq=1)
    toks = bpe_token_counts(docs, merges).collect()
    total_chars = sum(len(r["token"]) * r["count"] for r in toks)
    import re

    want = sum(
        len(w) for t in CORPUS for w in re.split(r"[^a-z]+", t.lower()) if w
    )
    assert total_chars == want
    # learned merges actually fire: multi-char tokens dominate 'the'/'cat'
    by_tok = {r["token"]: r["count"] for r in toks}
    assert by_tok["the"] == 5 and by_tok["cat"] == 4


def _docs_with_ids(spark, texts=CORPUS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )


def test_encode_with_trained_merges_matches_token_counts(spark):
    """Trained→encode composition: summing per-document encode output by
    token must equal bpe_token_counts (the distinct-word-segmentation
    path) — the two plan shapes implement one segmentation."""
    from pyspark.sql import functions as F

    docs = _docs_with_ids(spark)
    merges = bpe_train(docs, n_merges=4, min_freq=1)
    enc = bpe_encode(docs, merges)
    got = {
        (r["token"], r["cnt"])
        for r in enc.select(F.explode("tokens").alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    want = {
        (r["token"], r["count"])
        for r in bpe_token_counts(docs, merges).collect()
    }
    assert got == want


def test_encode_order_rules_and_edges(spark):
    """Document order is preserved, later rules consume earlier rules'
    output symbols, and empty/null/no-letter docs encode to zero tokens."""
    docs = spark.createDataFrame(
        [(1, "The theme"), (2, ""), (3, None), (4, "123 !?")],
        "id long, text string",
    )
    merges = spark.createDataFrame(
        [(1, "t", "h", "th"), (2, "th", "e", "the")],
        "round int, pair_a string, pair_b string, merged string",
    )
    rows = {r["id"]: (r["tokens"], r["n_tokens"])
            for r in bpe_encode(docs, merges).collect()}
    assert rows[1] == (["the", "the", "m", "e"], 4)
    assert rows[2] == ([], 0)
    assert rows[3] == ([], 0)
    assert rows[4] == ([], 0)


def test_encode_matches_duckdb_oracle(spark):
    from pyspark.sql import functions as F

    rules = [("t", "h", "th"), ("th", "e", "the"), ("a", "t", "at")]
    merges = spark.createDataFrame(
        [(k, a, b, m) for k, (a, b, m) in enumerate(rules, 1)],
        "round int, pair_a string, pair_b string, merged string",
    )
    docs = _docs_with_ids(spark)
    got = {
        (r["id"], r["ts"], r["n_tokens"])
        for r in bpe_encode(docs, merges)
        .select("id", F.array_join("tokens", " ").alias("ts"), "n_tokens")
        .collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"id": range(len(CORPUS)), "text": CORPUS}),
    )
    want = {
        (i, ts, n) for (i, ts, n) in con.execute(
            bpe_encode_oracle_sql(rules, id_col="id")
        ).fetchall()
    }
    assert got == want
