"""Distributed BPE tokenizer training: merge-rule induction as pure
DataFrame plans.

A training-data pipeline that ships a corpus usually ships the tokenizer
trained ON that corpus (byte-pair encoding à la Sennrich 2016 / GPT-2).
The reference has no tokenizer surface (Embulk's chain is strictly
per-record, reference spi/FilterPlugin.java:15-35); this joins the
iterative-algorithm family (operators/graph.py, operators/semdedup.py) on
the fixed-iteration, oracle-friendly pattern.

Semantics — classical word-internal BPE:

1. vocab = distinct lowercase ``[a-z]+`` words with corpus frequency
   (``min_freq`` floor), each split into single-character symbols;
2. per round: count every ADJACENT symbol pair positionally (a word
   contributes ``freq`` per occurrence — [a,a,a] counts (a,a) twice),
   pick the max by (count DESC, pair ASC), merge every occurrence
   LEFTMOST-FIRST in every word, repeat ``n_merges`` times.

Leftmost-first is pinned because pair merging is not confluent
([a,a,a] under (a,a) is [aa,a], never [a,aa]); both the Spark fold and
the DuckDB oracle's replace-until-fixpoint implement exactly it (replace
is leftmost-greedy and a merge never creates a new occurrence of its own
pair to the left, so the two strategies retire the same occurrence set).

Scale shape: the corpus is touched ONCE (the word-count agg, map-side
partial combine); every round after that runs over the word VOCAB — a
frame bounded by distinct-word count, not corpus size. Per round: one
explode+agg over the vocab's adjacent pairs (pair frame ≤ Σ|word|),
one 1-row argmax that re-enters via broadcast crossJoin (never a driver
collect), and one JVM ``aggregate`` fold applying the merge — zero
Python in any hot path. ``localCheckpoint`` truncates the per-round
lineage exactly as PageRank/k-means do. At 100 TB the corpus pass
dominates and is a plain wordcount; rounds cost O(vocab) each.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: framing separator for the oracle's string representation — cannot
#: appear in [a-z]+ words
SEP = "\x1f"


def _word_vocab(
    docs: DataFrame, text_col: str, min_freq: int
) -> DataFrame:
    """(word, freq) over lowercase [a-z]+ runs; deterministic and
    engine-portable (ASCII-only tokens dodge unicode-casefold drift)."""
    words = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_freq)
    )


def _adjacent_pairs(vocab: DataFrame) -> DataFrame:
    """(a, b, cnt): positional adjacent-pair counts over the vocab,
    weighted by word frequency."""
    idx = F.when(
        F.size("syms") >= 2, F.sequence(F.lit(1), F.size("syms") - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = vocab.select(
        "freq",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("syms", i).alias("a"),
                    F.element_at("syms", i + 1).alias("b"),
                ),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("freq").alias("cnt")
    )


def _apply_merge(syms: Column, a: Column, b: Column, merged: Column) -> Column:
    """Leftmost-first exhaustive merge of adjacent (a, b) → merged, as one
    JVM fold (no Python, no shuffle): walk the symbols once, replacing the
    accumulator's tail when it is ``a`` and the next symbol is ``b``. A
    merge never cascades within its own rule (merged = a||b equals neither
    a nor b), so the single pass IS the exhaustive result."""
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 6,
    min_freq: int = 2,
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules from the corpus; returns the
    merge table (round, pair_a, pair_b, merged, pair_count) in training
    order — the artifact a tokenizer ships."""
    spark = docs.sparkSession
    vocab = (
        _word_vocab(docs, text_col, min_freq)
        .withColumn("syms", F.split("word", ""))
        .localCheckpoint(eager=True)
    )
    bests: list[DataFrame] = []
    for k in range(1, n_merges + 1):
        best = (
            _adjacent_pairs(vocab)
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .withColumn("m", F.concat("a", "b"))
            .localCheckpoint(eager=True)
        )
        bests.append(
            best.select(
                F.lit(k).alias("round"),
                F.col("a").alias("pair_a"),
                F.col("b").alias("pair_b"),
                F.col("m").alias("merged"),
                F.col("cnt").alias("pair_count"),
            )
        )
        vocab = (
            vocab.crossJoin(F.broadcast(best))
            .select(
                "word",
                "freq",
                _apply_merge(
                    F.col("syms"), F.col("a"), F.col("b"), F.col("m")
                ).alias("syms"),
            )
            .localCheckpoint(eager=True)
        )
    out = bests[0]
    for b in bests[1:]:
        out = out.unionByName(b)
    return out.orderBy("round")


def bpe_token_counts(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """(token, count) corpus token frequencies under a learned merge
    table: segment each DISTINCT word once (the merge rules are a tiny
    plan constant, applied as chained JVM folds in training order), then
    weight by word frequency — the corpus is never re-tokenized per rule."""
    rules = [
        (r["pair_a"], r["pair_b"], r["merged"])
        for r in merges.orderBy("round").collect()
    ]
    vocab = _word_vocab(docs, text_col, min_freq=1).withColumn(
        "syms", F.split("word", "")
    )
    for a, b, m in rules:
        vocab = vocab.withColumn(
            "syms", _apply_merge(F.col("syms"), F.lit(a), F.lit(b), F.lit(m))
        )
    return (
        vocab.select("freq", F.explode("syms").alias("token"))
        .groupBy("token")
        .agg(F.sum("freq").alias("count"))
    )


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "id",
) -> DataFrame:
    """Per-document token sequences under a learned merge table — the
    APPLY half of the tokenizer lifecycle (train → encode → pack →
    export): (id, tokens, n_tokens), tokens in document order.

    Scale shape: ZERO shuffle. The merge rules are a tiny plan constant
    (the artifact ``bpe_train`` ships); encoding is one per-row JVM
    expression — split to words, per word a chained leftmost-first fold
    per rule (the same ``_apply_merge`` the trainer uses, so encode ≡
    training segmentation by construction), flatten. Embarrassingly
    parallel at any corpus size: no corpus-wide join or re-agg, unlike
    the distinct-word-segmentation shape (``bpe_token_counts``), which
    trades a broadcast join + rebuild shuffle for fewer fold CPU cycles
    — right for counting, wrong for emitting per-doc sequences."""
    rules = [
        (r["pair_a"], r["pair_b"], r["merged"])
        for r in merges.orderBy("round").collect()
    ]
    words = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), "[^a-z]+"),
        lambda w: w != "",
    )

    def _segment(w: Column) -> Column:
        syms = F.split(w, "")
        for a, b, m in rules:
            syms = _apply_merge(syms, F.lit(a), F.lit(b), F.lit(m))
        return syms

    toks = F.flatten(F.transform(words, _segment))
    return docs.select(
        F.col(id_col),
        toks.alias("tokens"),
        F.size(toks).alias("n_tokens"),
    )


def bpe_encode_oracle_sql(
    rules: list[tuple[str, str, str]],
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "id",
) -> str:
    """DuckDB mirror of :func:`bpe_encode` for a LITERAL rule list:
    per-(doc, word-position) SEP-framed symbol strings, each rule a
    replace-until-fixpoint recursive CTE (the same leftmost-greedy
    equivalence argument as ``bpe_train_oracle_sql``), rebuilt into
    document order with a left join so zero-word documents keep their
    empty row."""
    sep = "chr(31)"
    parts = [
        f"""
w0 AS MATERIALIZED (
  SELECT {id_col} AS id, i AS pos,
         {sep} || array_to_string(
           [ws[i][j] FOR j IN range(1, length(ws[i]) + 1)], {sep}
         ) || {sep} AS s
  FROM (
    SELECT {id_col},
           string_split_regex(lower(coalesce({text_col}, '')), '[^a-z]+') AS ws
    FROM {table}
  ), unnest(range(1, len(ws) + 1)) AS t(i)
  WHERE ws[i] <> ''
)"""
    ]
    for k, (a, b, m) in enumerate(rules, start=1):
        pat = f"{sep}||'{a}'||{sep}||'{b}'||{sep}"
        rep = f"{sep}||'{m}'||{sep}"
        parts.append(f"""
f{k} AS (
  SELECT id, pos, s FROM w{k-1}
  UNION
  SELECT id, pos, replace(s, {pat}, {rep}) FROM f{k}
  WHERE s <> replace(s, {pat}, {rep})
),
w{k} AS MATERIALIZED (
  SELECT id, pos, s FROM f{k}
  WHERE s = replace(s, {pat}, {rep})
)""")
    last = f"w{len(rules)}"
    return f"""
WITH RECURSIVE {",".join(parts)},
enc AS (
  SELECT id,
         array_to_string(
           flatten(list(string_split(trim(s, {sep}), {sep}) ORDER BY pos)),
           ' ') AS tokens_str,
         sum(length(string_split(trim(s, {sep}), {sep})))::INT AS n_tokens
  FROM {last} GROUP BY id
)
SELECT d.{id_col},
       coalesce(e.tokens_str, '') AS tokens_str,
       coalesce(e.n_tokens, 0) AS n_tokens
FROM {table} d LEFT JOIN enc e ON d.{id_col} = e.id
"""


def bpe_train_oracle_sql(
    *, n_merges: int = 6, min_freq: int = 2, table: str = "documents",
    text_col: str = "text",
) -> str:
    """DuckDB mirror of :func:`bpe_train`: the K rounds unroll as chained
    CTEs; each round's merge applies via replace-until-fixpoint on
    SEP-framed symbol strings inside a recursive CTE (replace() is
    leftmost-greedy, so the fixpoint retires exactly the occurrences the
    Spark fold does — see the module docstring)."""
    sep = f"chr({ord(SEP)})"
    # MATERIALIZED is load-bearing: DuckDB inlines CTEs by default, and a
    # round's recursive fixpoint re-expanding the whole upstream chain per
    # iteration is exponential in n_merges
    parts = [
        f"""
v0 AS MATERIALIZED (
  SELECT word, count(*)::BIGINT AS freq,
         {sep} || array_to_string(
           [word[i] FOR i IN range(1, length(word) + 1)], {sep}
         ) || {sep} AS s
  FROM (
    SELECT unnest(string_split_regex(lower({text_col}), '[^a-z]+')) AS word
    FROM {table}
  )
  WHERE word <> ''
  GROUP BY word
  HAVING count(*) >= {min_freq}
)"""
    ]
    for k in range(1, n_merges + 1):
        v_prev, p, b, f_, v = f"v{k-1}", f"p{k}", f"b{k}", f"f{k}", f"v{k}"
        parts.append(f"""
{p} AS MATERIALIZED (
  SELECT sy[i] AS a, sy[i + 1] AS b, sum(freq)::BIGINT AS cnt
  FROM (
    SELECT freq, list_slice(sl, 2, len(sl) - 1) AS sy
    FROM (SELECT freq, string_split(s, {sep}) AS sl FROM {v_prev})
  ), unnest(range(1, len(sy))) AS t(i)
  GROUP BY 1, 2
),
{b} AS MATERIALIZED (
  SELECT a, b, a || b AS m, cnt
  FROM {p} ORDER BY cnt DESC, a, b LIMIT 1
),
{f_} AS (
  SELECT word, freq, s FROM {v_prev}
  UNION
  SELECT word, freq,
         replace(s, (SELECT {sep}||a||{sep}||b||{sep} FROM {b}),
                    (SELECT {sep}||m||{sep} FROM {b}))
  FROM {f_}
  WHERE s <> replace(s, (SELECT {sep}||a||{sep}||b||{sep} FROM {b}),
                        (SELECT {sep}||m||{sep} FROM {b}))
),
{v} AS MATERIALIZED (
  SELECT word, freq, s FROM {f_}
  WHERE s = replace(s, (SELECT {sep}||a||{sep}||b||{sep} FROM {b}),
                       (SELECT {sep}||m||{sep} FROM {b}))
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT {k} AS round, a AS pair_a, b AS pair_b, m AS merged, "
        f"cnt AS pair_count FROM b{k}"
        for k in range(1, n_merges + 1)
    )
    return (
        "WITH RECURSIVE " + ",".join(parts) + "\n" + union + "\nORDER BY round"
    )
