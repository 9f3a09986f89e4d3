"""Data-selection importance weighting (DSIR-style).

Hashed n-gram importance resampling (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling"): score every raw
document by how target-like its token distribution is, as the
log-likelihood ratio Σ_w log(p_target[h(w)] / p_raw[h(w)]) over hashed
unigram buckets. The weights feed the deterministic sampler
(operators/sample.py) to select a target-shaped subcorpus without
training a model.

The reference has no analogue (closest: the filter plugin chain,
embulk-core/src/main/java/org/embulk/spi/FilterPlugin.java:14-37 — this
is a corpus-curation extension per SURVEY §2.10).

Scale shape: the bucket distributions are ONE hash-aggregate over the
exploded token stream (B ≈ 2^10..2^20 buckets — always broadcastable;
partial map-side combine collapses the token stream before the
exchange), and per-doc scoring is explode → broadcast-hash-join on the
bucket id → one re-agg by doc id. Two shuffles total, both of
(key, count) pairs, never of text. Nothing collects on the driver; the
bucket table stays a DataFrame end-to-end. Everything is md5-keyed and
deterministic across runs/partitionings/engines — the DuckDB oracle
replays the identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textops import _nonempty_words


def hashed_bucket(word: Column, n_buckets: int, salt: str = "dsir") -> Column:
    """Deterministic bucket ∈ [0, n_buckets): first 8 md5 hex chars of
    ``salt:word`` mod B. Oracle-parity form:
    ``('0x' || left(md5(salt || ':' || w), 8))::bigint % B``."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt + ":"), word)), 1, 8), 16, 10)
        .cast("long")
        % F.lit(n_buckets)
    )


def _doc_tokens(
    docs: DataFrame, is_target: Column, text_col: str, id_col: str,
    n_buckets: int, salt: str,
) -> DataFrame:
    """(doc_id, is_target, bkt) — one row per token occurrence."""
    return docs.select(
        F.col(id_col),
        is_target.alias("is_target"),
        F.explode(_nonempty_words(F.col(text_col))).alias("w"),
    ).select(
        id_col, "is_target", hashed_bucket(F.col("w"), n_buckets, salt).alias("bkt")
    )


def bucket_log_ratios(
    tokens: DataFrame, n_buckets: int
) -> DataFrame:
    """Per-bucket log(p_target/p_raw) with add-one smoothing over the
    B-bucket vocabulary. The target corpus is the ``is_target`` subset of
    the raw stream (DSIR's in-domain set); ``raw`` counts every token.
    Buckets no token hashes to contribute nothing to any document's score,
    so the inner join in :func:`dsir_weights` is exact, not an
    approximation."""
    counts = tokens.groupBy("bkt").agg(
        F.count(F.when(F.col("is_target"), F.lit(1))).alias("n_t"),
        F.count(F.lit(1)).alias("n_r"),
    )
    totals = counts.agg(
        F.sum("n_t").alias("nt_tot"), F.sum("n_r").alias("nr_tot")
    )
    b = float(n_buckets)
    # totals is ONE row: broadcast cross join, never a shuffle
    return counts.crossJoin(F.broadcast(totals)).select(
        "bkt",
        (
            F.log((F.col("n_t") + 1.0) / (F.col("nt_tot") + b))
            - F.log((F.col("n_r") + 1.0) / (F.col("nr_tot") + b))
        ).alias("log_ratio"),
    )


def dsir_weights(
    docs: DataFrame,
    is_target: Column,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    salt: str = "dsir",
) -> DataFrame:
    """Per-document DSIR log importance weight.

    Returns (id_col, n_tokens, dsir_logweight): the summed per-token
    log-likelihood ratio of the target vs raw hashed-unigram models.
    Documents with zero tokens produce no row (they carry no evidence
    either way). ``is_target`` marks the in-domain subset — e.g.
    ``F.col("lang") == "en"`` or a source predicate."""
    tokens = _doc_tokens(docs, is_target, text_col, id_col, n_buckets, salt)
    ratios = bucket_log_ratios(tokens, n_buckets)
    return (
        tokens.join(F.broadcast(ratios), "bkt")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("log_ratio"), 6).alias("dsir_logweight"),
        )
    )
