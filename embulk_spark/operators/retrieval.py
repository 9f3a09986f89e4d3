"""BM25 relevance scoring: rank corpus documents against a term query
with corpus-level statistics — the retrieval/quality-prior scorer of a
training-data pipeline (e.g. "score every page against a topic seed
list", the MADLAD/Dolma-style targeted-crawl filter).

No reference analogue (Embulk filters are per-record and stateless);
SURVEY §2.10 curation surface.

Scale shape (what survives 100 TB):
- The corpus tokenizes narrowly (lower + ASCII ``\\s+`` split — the
  exact token convention of operators/dedup.py, so scores and dedup
  agree on what a "word" is); the per-doc length comes from the same
  array, no second pass.
- Query terms are a FILTER first, join second: after explode, rows not
  in the (tiny, broadcast) term set are dropped immediately, so only
  matching (doc, term) pairs ever shuffle — the corpus never shuffles
  on the token key.
- Corpus constants (N, avgdl) are ONE tiny agg broadcast-crossed back;
  per-term document frequencies aggregate to ≤ |terms| rows before the
  broadcast join. Nothing collects.
- Scores are `round(·, 6)`: the only libm-touching term (ln in idf)
  and the float sum across matched terms sit ~1e-10 above the rounding
  grain, the same tolerance contract the repo's other scored oracles
  pin (lm_perplexity, dsir_weights).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: ASCII whitespace split on lowercased text — single token convention
#: shared with operators/dedup.py (shingles) and functions/textops.py.
TOKENS_EXPR = r"filter(split(lower(trim({col})), '\\s+'), x -> x <> '')"


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, score, n_matched_terms) for every document matching ≥ 1 term.

    BM25 with the standard Robertson idf made strictly positive:
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``.
    """
    terms = sorted(set(query_terms))
    toked = docs.select(
        F.col(id_col).alias("_id"),
        F.expr(TOKENS_EXPR.format(col=text_col)).alias("_toks"),
    ).withColumn("_dl", F.size("_toks"))

    consts = toked.agg(
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
        F.avg("_dl").alias("_avgdl"),
    )

    # drop non-query tokens INSIDE the array (JVM HOF) before explode:
    # the flat-map then emits only matching tokens instead of the whole
    # corpus token stream — at 100 TB that's the difference between
    # exploding ~10^12 tokens and ~10^9 matches
    tf = (
        toked.select(
            "_id", "_dl",
            F.explode(
                F.filter("_toks", lambda x: x.isin(terms))
            ).alias("_term"),
        )
        .groupBy("_id", "_term")
        .agg(F.count(F.lit(1)).cast("double").alias("_tf"),
             F.first("_dl").alias("_dl"))
    )
    df_t = tf.groupBy("_term").agg(
        F.count(F.lit(1)).cast("double").alias("_df")
    )
    scored = (
        tf.join(F.broadcast(df_t), "_term")
        .crossJoin(F.broadcast(consts))
        .withColumn(
            "_idf",
            F.log(F.lit(1.0) + (F.col("_n_docs") - F.col("_df") + 0.5)
                  / (F.col("_df") + 0.5)),
        )
        .withColumn(
            "_contrib",
            # compound constants pre-folded in Python (k1+1, 1-b) so the
            # oracle can embed the IDENTICAL doubles — engines must not
            # each re-derive them in their own literal type (DuckDB
            # parses `1.2` as DECIMAL, not DOUBLE)
            F.col("_idf") * F.col("_tf") * F.lit(k1 + 1.0)
            / (F.col("_tf")
               + F.lit(k1) * (F.lit(1.0 - b)
                              + F.lit(b) * F.col("_dl") / F.col("_avgdl"))),
        )
    )
    return scored.groupBy("_id").agg(
        F.round(F.sum("_contrib"), 6).alias("score"),
        F.count(F.lit(1)).cast("long").alias("n_matched_terms"),
    ).select(F.col("_id").alias(id_col), "score", "n_matched_terms")


def bm25_oracle_sql(
    table: str,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB mirror generated from the same constants — single source
    of truth for the scoring formula."""
    terms = ", ".join(f"'{t}'" for t in sorted(set(query_terms)))
    k1p1, k1s, bs, omb = (
        f"CAST({k1 + 1.0!r} AS DOUBLE)",
        f"CAST({k1!r} AS DOUBLE)",
        f"CAST({b!r} AS DOUBLE)",
        f"CAST({1.0 - b!r} AS DOUBLE)",
    )
    return f"""
WITH toked AS (
  SELECT {id_col} AS _id,
         list_filter(regexp_split_to_array(trim(lower({text_col})), '\\s+'),
                     x -> x <> '') AS _toks
  FROM {table}
),
dl AS (SELECT _id, len(_toks) AS _dl, _toks FROM toked),
consts AS (SELECT count(*)::double AS _n_docs, avg(_dl) AS _avgdl FROM dl),
tf AS (
  SELECT _id, t AS _term, count(*)::double AS _tf, any_value(_dl) AS _dl
  FROM (SELECT _id, _dl, unnest(_toks) AS t FROM dl)
  WHERE t IN ({terms})
  GROUP BY _id, t
),
dft AS (SELECT _term, count(*)::double AS _df FROM tf GROUP BY _term)
SELECT tf._id AS {id_col},
       round(sum(
         ln(1.0 + (c._n_docs - d._df + 0.5) / (d._df + 0.5))
         * tf._tf * {k1p1}
         / (tf._tf + {k1s} * ({omb} + {bs} * tf._dl / c._avgdl))
       ), 6) AS score,
       count(*)::bigint AS n_matched_terms
FROM tf JOIN dft d USING (_term) CROSS JOIN consts c
GROUP BY tf._id
"""
