"""Exact duplicated-substring dedup (ExactSubstr-style).

Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better": substrings long enough to repeat verbatim across a web corpus
(licence blocks, syndicated snippets, templated footers) are removed
except for one occurrence. The paper's suffix-array construction is a
single-machine algorithm; this re-expresses the semantics at k-token
granularity so it distributes: a span is duplicated iff every k-gram in
it is duplicated, and maximal duplicated spans are exactly the merged
runs of duplicated k-gram start positions.

Keep rule (deterministic, partitioning/run-invariant): each duplicated
k-gram's global first occurrence — min (id, pos) — is the kept copy;
every other occurrence is redundant, and redundant positions merge into
cut spans. The first document to carry a duplicated block keeps it;
later documents (and later repeats inside the SAME document) lose it.

No reference analogue (corpus-curation extension per SURVEY §2.10);
sibling of the paragraph-level pass in operators/dedup.py
(dedup_paragraphs) — this one catches sub-paragraph duplication.

Scale shape: k-gram fingerprinting is one narrow map (md5 over a
slice-join — pure Columns, no Python); duplicated-gram stats are ONE
hash agg with map-side partial combine on the uniform md5 key;
redundancy is an equi-join of hits against the duplicated-key table
(both sides shuffle on the same uniform key — no skew, no broadcast
needed, right side is only the duplicated subset); span merge + text
rebuild are per-doc array folds (JVM HOFs). Nothing is ever collected;
the duplicate set is unbounded and never driver-held. Cost is linear in
total tokens with ~4 shuffles — the same budget as dedup_paragraphs.

Tokenization: whitespace split; gram keys hash the LOWERCASED joined
window (CCNet-style normalization) while the rebuilt text keeps the
original tokens. Rebuilt text is single-space joined (token-level
surgery cannot preserve the original whitespace around a cut).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda w: w != F.lit(""))


def _gram_structs(toks: Column, k: int) -> Column:
    """array<struct<pos:int, key:string>> — one entry per k-window start
    (0-based pos); empty for docs shorter than k tokens."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(0)))
    return F.when(F.size(toks) >= k, F.transform(
        idx,
        lambda i: F.struct(
            (i - 1).cast("int").alias("pos"),
            F.md5(F.lower(F.array_join(F.slice(toks, i, k), " "))).alias("key"),
        ),
    )).otherwise(F.array().cast("array<struct<pos:int,key:string>>"))


def kgram_hits(
    df: DataFrame, text_col: str, id_col: str, *, k: int = 8
) -> DataFrame:
    """(id, pos, key) — one row per k-gram occurrence."""
    return df.select(
        F.col(id_col).alias("_id"),
        F.explode(_gram_structs(_tokens(F.col(text_col)), k)).alias("_g"),
    ).select("_id", F.col("_g.pos").alias("_pos"), F.col("_g.key").alias("_key"))


def duplicated_gram_stats(
    hits: DataFrame, *, min_count: int = 2
) -> DataFrame:
    """Per duplicated gram key: occurrence count + global first
    occurrence (the kept copy). One hash agg; duplicated grams collapse
    in the map-side combiner."""
    return (
        hits.groupBy("_key")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min(F.struct("_id", "_pos")).alias("_w"),
        )
        .filter(F.col("n_occurrences") >= min_count)
        .select(
            "_key", "n_occurrences",
            F.col("_w._id").alias("winner_id"),
            F.col("_w._pos").alias("winner_pos"),
        )
    )


def _merge_spans(sorted_pos: Column, k: int) -> Column:
    """Fold sorted 0-based start positions into maximal disjoint spans
    [s, e) of k-token windows; adjacent-or-overlapping windows merge
    (p <= last.e)."""
    empty = F.array().cast("array<struct<s:int,e:int>>")
    return F.aggregate(
        sorted_pos,
        empty,
        lambda acc, p: F.when(
            (F.size(acc) > 0) & (p <= F.element_at(acc, -1).getField("e")),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.struct(
                    F.element_at(acc, -1).getField("s").alias("s"),
                    F.greatest(
                        F.element_at(acc, -1).getField("e"), (p + k).cast("int")
                    ).alias("e"),
                )),
            ),
        ).otherwise(
            F.concat(acc, F.array(F.struct(
                p.cast("int").alias("s"), (p + k).cast("int").alias("e")
            )))
        ),
    )


def substring_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Cut every redundant duplicated k-gram run from ``text_col``.

    Returns ``df`` with ``text_col`` rewritten (kept tokens re-joined
    with single spaces, original casing) plus audit columns
    ``n_dup_spans`` and ``n_tokens_dropped``. Docs with no redundant
    span pass through with their text UNTOUCHED (original whitespace
    preserved — only surgically-cut docs are re-joined).
    """
    hits = kgram_hits(df, text_col, id_col, k=k)
    stats = duplicated_gram_stats(hits, min_count=min_count)
    redundant = (
        hits.join(stats, "_key")
        .filter(
            ~((F.col("_id") == F.col("winner_id"))
              & (F.col("_pos") == F.col("winner_pos")))
        )
        .select("_id", "_pos")
    )
    spans = redundant.groupBy("_id").agg(
        _merge_spans(F.array_sort(F.collect_set("_pos")), k).alias("_spans")
    )
    toks = _tokens(F.col(text_col))
    covered = lambda i: F.exists(  # noqa: E731
        F.col("_spans"),
        lambda sp: (i >= sp.getField("s")) & (i < sp.getField("e")),
    )
    kept = F.filter(toks, lambda w, i: ~covered(i))
    dropped = F.aggregate(
        F.col("_spans"),
        F.lit(0),
        lambda acc, sp: acc + (sp.getField("e") - sp.getField("s")),
    )
    joined = df.join(spans, F.col(id_col) == F.col("_id"), "left")
    out_cols = [
        F.when(F.col("_spans").isNotNull(), F.array_join(kept, " "))
        .otherwise(F.col(text_col)).alias(text_col)
        if c == text_col else F.col(c)
        for c in df.columns
    ]
    return joined.select(
        *out_cols,
        F.coalesce(F.size("_spans"), F.lit(0)).alias("n_dup_spans"),
        F.coalesce(dropped, F.lit(0)).alias("n_tokens_dropped"),
    )
