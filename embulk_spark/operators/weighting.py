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


def _doc_bigram_buckets(
    docs: DataFrame, is_target: Column, text_col: str, id_col: str,
    ctx_buckets: int, bi_buckets: int, salt: str,
) -> DataFrame:
    """(doc_id, is_target, hp, hb) — one row per bigram occurrence.
    hp = bucket of the context word, hb = bucket of the joined bigram;
    both derived from the SAME lowercased whitespace tokenization as
    :func:`dsir_weights` so the two scorers agree on token counts."""
    words = _nonempty_words(F.col(text_col))
    # n-gram enumeration mirrors textops._word_ngrams but keeps the
    # context word addressable without re-splitting the joined gram
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - 1, F.lit(0)))
    pairs = F.when(F.size(words) >= 2, F.transform(
        idx, lambda i: F.struct(
            F.element_at(words, i).alias("wp"),
            F.concat_ws(
                " ", F.element_at(words, i), F.element_at(words, i + 1)
            ).alias("g"),
        )
    )).otherwise(F.array().cast("array<struct<wp:string,g:string>>"))
    return docs.select(
        F.col(id_col), is_target.alias("is_target"),
        F.explode(pairs).alias("p"),
    ).select(
        id_col, "is_target",
        hashed_bucket(F.col("p.wp"), ctx_buckets, salt + "ctx").alias("hp"),
        hashed_bucket(F.col("p.g"), bi_buckets, salt + "bi").alias("hb"),
    )


def lm_perplexity(
    docs: DataFrame,
    is_target: Column,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ctx_buckets: int = 1024,
    bi_buckets: int = 4096,
    alpha: float = 1.0,
    salt: str = "lm",
) -> DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al. 2020, "CCNet:
    Extracting high-quality monolingual datasets from web crawl data" —
    the train-an-LM-on-target, score-perplexity-per-doc step), with the
    KenLM 5-gram model replaced by a hashed add-α bigram model so the
    whole thing is two aggregations and stays oracle-checkable:

        P(w_i | w_{i-1}) = (c_bi(hb) + α) / (c_ctx(hp) + α·B_bi)

    trained on the ``is_target`` subset; per-doc score is bits per
    bigram (low = target-like "head" quality, high = "tail").

    Scale shape: both count tables aggregate DOWN to ≤ B rows (bounded
    by the bucket count, NOT the corpus) before any join, so they are
    broadcastable by construction at any corpus size; scoring is
    explode → two broadcast left joins → one re-agg by doc. Like
    :func:`dsir_weights`, text never shuffles and nothing lands on the
    driver. Docs with < 2 tokens carry no evidence and emit no row.
    """
    import math

    tokens = _doc_bigram_buckets(
        docs, is_target, text_col, id_col, ctx_buckets, bi_buckets, salt
    )
    target = tokens.filter("is_target")
    c_ctx = target.groupBy("hp").agg(F.count(F.lit(1)).alias("c_ctx"))
    c_bi = target.groupBy("hb").agg(F.count(F.lit(1)).alias("c_bi"))
    denom_b = float(alpha) * float(bi_buckets)
    nll = -(
        F.log(F.coalesce(F.col("c_bi").cast("double"), F.lit(0.0)) + F.lit(float(alpha)))
        - F.log(F.coalesce(F.col("c_ctx").cast("double"), F.lit(0.0)) + F.lit(denom_b))
    )
    return (
        tokens.join(F.broadcast(c_ctx), "hp", "left")
        .join(F.broadcast(c_bi), "hb", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum(nll) / F.count(F.lit(1)) / math.log(2.0), 6).alias(
                "bits_per_bigram"
            ),
        )
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


def ccnet_buckets(
    docs: DataFrame,
    is_target: Column,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = 3,
    **lm_kwargs,
) -> DataFrame:
    """CCNet head/middle/tail partitioning (Wenzek et al. 2020 §4.4):
    per-language equal-frequency buckets of the LM score, lowest
    (most target-like) = bucket 1 = ``head``.

    Exact formulation: ``ntile(n)`` over one window keyed by language —
    ONE hashpartitioning exchange, per-language sort, deterministic tie
    break on the id. Scale note: the dominant language's sort serializes
    on its partition; at 100 TB compute :func:`bucket_thresholds` once
    (approx quantiles, tiny relation) and assign by broadcast
    comparison instead — same labels away from the boundaries, no
    per-language global sort.

    Output: ``id_col, lang, bits_per_bigram, bucket`` (1-based int)
    and, for ``n_buckets == 3``, the CCNet ``label``.
    """
    from pyspark.sql import Window

    scored = lm_perplexity(
        docs, is_target, text_col=text_col, id_col=id_col, **lm_kwargs
    )
    withlang = docs.select(id_col, lang_col).join(scored, id_col)
    w = Window.partitionBy(lang_col).orderBy("bits_per_bigram", id_col)
    out = withlang.select(
        id_col, lang_col, "bits_per_bigram",
        F.ntile(n_buckets).over(w).alias("bucket"),
    )
    if n_buckets == 3:
        out = out.withColumn(
            "label",
            F.when(F.col("bucket") == 1, "head")
            .when(F.col("bucket") == 3, "tail")
            .otherwise("middle"),
        )
    return out


def bucket_thresholds(
    scored: DataFrame,
    *,
    lang_col: str = "lang",
    score_col: str = "bits_per_bigram",
    n_buckets: int = 3,
    accuracy: int = 10000,
) -> DataFrame:
    """The 100 TB path for :func:`ccnet_buckets`: per-language
    approximate score quantiles (one partial-combine agg; result is
    |languages| × (n_buckets-1) — always broadcastable). Assign with
    :func:`bucket_by_thresholds`; labels can disagree with the exact
    ntile only for docs tied at a quantile boundary."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    return scored.groupBy(lang_col).agg(
        F.percentile_approx(score_col, qs, accuracy).alias("cuts")
    )


def bucket_by_thresholds(
    scored: DataFrame,
    thresholds: DataFrame,
    *,
    lang_col: str = "lang",
    score_col: str = "bits_per_bigram",
) -> DataFrame:
    """Bucket = 1 + number of quantile cuts strictly below the score —
    a broadcast join plus one JVM array fold; the corpus never sorts."""
    bucket = F.lit(1) + F.aggregate(
        F.col("cuts"),
        F.lit(0),
        lambda acc, c: acc + F.when(F.col(score_col) > c, 1).otherwise(0),
    )
    return scored.join(F.broadcast(thresholds), lang_col).withColumn(
        "bucket", bucket.cast("int")
    ).drop("cuts")
