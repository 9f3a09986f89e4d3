"""In-engine trained quality classifier: hashed-unigram logistic
regression (the fastText-style linear text classifier) fit by
full-batch gradient descent — train AND inference as DataFrame plans.

The standard web-corpus curation move (GPT-3/LLaMA pipelines): label a
small "good" target (here: any boolean label expression over the
corpus) and train a linear model over hashed token features to score
everything else. DSIR (operators/weighting.py) is the generative
version of this; the discriminative logistic fit usually scores better
when labels exist. No reference analogue; SURVEY §2.10 surface.

Scale shape:
- Features: ONE explode + hash-agg to (doc, bucket, tf) — the exact
  hashed-bucket convention of operators/weighting.py (md5 mod B), tf
  normalized by doc token count. Persisted once, reused every
  iteration.
- Each iteration is two broadcast-joined aggregates: margins per doc
  (feats ⋈ broadcast weights, B ≤ 2^20 rows — broadcastable at ANY
  corpus size) and gradients per bucket (feats ⋈ broadcast errors? no —
  errors stay keyed by doc, so the gradient agg joins feats to the
  per-doc error frame on doc id: ONE shuffle over the (doc, bucket)
  pairs per iteration, text never reshuffles).
- Fixed iteration count (default 3), weights always a ≤ B-row frame;
  nothing collects.

Determinism/oracle: every hash is md5-pinned; the DuckDB oracle
(generated from the same constants) unrolls the iterations as chained
CTEs, replaying the identical arithmetic. Float caveat, quantified:
distributed sums are unordered, so margins/gradients carry ~1e-13
cross-engine (and run-to-run) drift after 3 iterations; scores are
therefore rounded to 4 decimals — a 5e-5 grid, ≥ 8 orders above the
drift — making a rounding flip astronomically unlikely (the same
tolerance argument as the repo's other scored oracles, one grid
coarser because training compounds drift across iterations).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .weighting import hashed_bucket

#: defaults: 256 buckets is plenty for a topic/lang probe and keeps the
#: unrolled oracle compact; real corpora use 2^18+ (still broadcastable)
N_BUCKETS = 256
ITERS = 3
#: full-batch GD on idf features: 4.0 reaches clean separation in 3
#: iterations on separable corpora (fixture acc 1.0) while staying
#: below the saturation/oscillation regime (empirically ≥ 8)
LR = 4.0
SCORE_DECIMALS = 4


def _features(
    docs: DataFrame, id_col: str, text_col: str, label: Column,
    n_buckets: int, salt: str, feature: str,
) -> DataFrame:
    """(_id, y, bkt, tf): hashed-bucket features per doc.

    ``feature='idf'`` (default): x = ln(N/df_b) per bucket the doc
    contains — presence·IDF. The corpus-frequent buckets every doc
    shares get idf ≈ 0 and drop out of the margin, so the handful of
    discriminative rare buckets dominates; without this, s ≈ 30
    correlated shared-vocab features amplify every common weight s× and
    3 GD steps either stall (tf) or saturate (raw presence) before the
    markers learn. df is ONE ≤B-row agg broadcast back — free.
    ``feature='presence'``: x = 1 per present bucket. ``feature='tf'``:
    length-normalized counts. Docs with zero tokens carry no features
    and are excluded from the fit (they'd train only the bias)."""
    toks = docs.select(
        F.col(id_col).alias("_id"),
        label.cast("int").cast("double").alias("y"),
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda x: x != "",
            )
        ).alias("w"),
    )
    per_bkt = (
        toks.select(
            "_id", "y", hashed_bucket(F.col("w"), n_buckets, salt).alias("bkt")
        )
        .groupBy("_id", "y", "bkt")
        .agg(F.count(F.lit(1)).cast("double").alias("_cnt"))
    )
    if feature == "presence":
        return per_bkt.select("_id", "y", "bkt", F.lit(1.0).alias("tf"))
    if feature == "idf":
        pres = per_bkt.select("_id", "y", "bkt")
        dfreq = pres.groupBy("bkt").agg(
            F.count(F.lit(1)).cast("double").alias("_df")
        )
        ndocs = pres.select("_id").distinct().agg(
            F.count(F.lit(1)).cast("double").alias("_n")
        )
        return (
            pres.join(F.broadcast(dfreq), "bkt")
            .crossJoin(F.broadcast(ndocs))
            .select(
                "_id", "y", "bkt",
                F.log(F.col("_n") / F.col("_df")).alias("tf"),
            )
        )
    if feature != "tf":
        raise ValueError(f"unknown feature mode: {feature}")
    per_doc = toks.groupBy("_id", "y").agg(F.count(F.lit(1)).alias("_dl"))
    return per_bkt.join(per_doc.select("_id", "_dl"), "_id").select(
        "_id", "y", "bkt", (F.col("_cnt") / F.col("_dl")).alias("tf")
    )


def train_logreg(
    docs: DataFrame,
    label: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    iters: int = ITERS,
    lr: float = LR,
    salt: str = "qc",
    feature: str = "idf",
) -> tuple[DataFrame, DataFrame]:
    """Fit and return (weights, bias): weights = (bkt, w) frame with one
    row per bucket that occurs in the corpus; bias = 1-row (bias) frame.

    Full-batch GD on the mean log-loss: per iteration
    ``err_d = σ(margin_d) - y_d``; ``w ← w - lr·Σ_d err_d·tf_{d,b}/N``;
    ``bias ← bias - lr·Σ_d err_d/N``.
    """
    feats = _features(docs, id_col, text_col, label, n_buckets, salt, feature).persist()
    labels = feats.select("_id", "y").distinct()
    # balanced class weights (exact integer counts → one double division
    # each, engine-parity): the loss is the BALANCED log-loss, so the
    # class prior cancels out of every feature shared by both classes —
    # without this, p(+) ≠ 0.5 leaks into all ~s correlated shared-vocab
    # features at once and full-batch GD spends its few iterations
    # oscillating on the prior instead of learning the markers
    counts = {int(r.y): r.n for r in labels.groupBy("y").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    n_pos, n_neg = counts.get(1, 0), counts.get(0, 0)
    nd = float(n_pos + n_neg)
    if n_pos == 0 or n_neg == 0:
        raise ValueError("label has a single class; nothing to fit")
    labels = labels.withColumn(
        "cw",
        F.when(F.col("y") == 1.0, F.lit(nd / (2.0 * n_pos)))
        .otherwise(F.lit(nd / (2.0 * n_neg))),
    )

    weights = feats.select("bkt").distinct().withColumn(
        "w", F.lit(0.0)
    )
    bias = docs.sparkSession.range(1).select(F.lit(0.0).alias("bias"))
    for _ in range(iters):
        margins = (
            feats.join(F.broadcast(weights), "bkt")
            .groupBy("_id")
            .agg(F.sum(F.col("tf") * F.col("w")).alias("_m0"))
            .join(labels, "_id")
            .crossJoin(F.broadcast(bias))
            .select(
                "_id", "y",
                ((F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("_m0") + F.col("bias"))))
                  - F.col("y")) * F.col("cw")).alias("err"),
            )
        )
        grads = (
            feats.join(margins.select("_id", "err"), "_id")
            .groupBy("bkt")
            .agg((F.sum(F.col("err") * F.col("tf")) / F.lit(nd)).alias("g"))
        )
        weights = (
            weights.join(grads, "bkt", "left")
            .select(
                "bkt",
                (F.col("w") - F.lit(lr) * F.coalesce(F.col("g"), F.lit(0.0))).alias("w"),
            )
        )
        bias = (
            margins.agg((F.sum("err") / F.lit(nd)).alias("gb"))
            .crossJoin(F.broadcast(bias))
            .select((F.col("bias") - F.lit(lr) * F.col("gb")).alias("bias"))
        )
    return weights, bias


def score_logreg(
    docs: DataFrame,
    weights: DataFrame,
    bias: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    salt: str = "qc",
    decimals: int = SCORE_DECIMALS,
    feature: str = "idf",
) -> DataFrame:
    """(id, prob): σ(margin) per scorable (≥ 1 token) document."""
    feats = _features(
        docs, id_col, text_col, F.lit(0), n_buckets, salt, feature
    )
    return (
        feats.join(F.broadcast(weights), "bkt")
        .groupBy("_id")
        .agg(F.sum(F.col("tf") * F.col("w")).alias("_m0"))
        .crossJoin(F.broadcast(bias))
        .select(
            F.col("_id").alias(id_col),
            F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("_m0") + F.col("bias")))),
                decimals,
            ).alias("prob"),
        )
    )


def quality_classifier(
    docs: DataFrame,
    label: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    iters: int = ITERS,
    lr: float = LR,
    salt: str = "qc",
    feature: str = "idf",
) -> DataFrame:
    """Train on ``label``, score the same corpus: (id, y, prob)."""
    weights, bias = train_logreg(
        docs, label, id_col=id_col, text_col=text_col,
        n_buckets=n_buckets, iters=iters, lr=lr, salt=salt, feature=feature,
    )
    scored = score_logreg(
        docs, weights, bias, id_col=id_col, text_col=text_col,
        n_buckets=n_buckets, salt=salt, feature=feature,
    )
    lab = docs.select(
        F.col(id_col), label.cast("int").cast("long").alias("y")
    )
    return scored.join(lab, id_col).select(id_col, "y", "prob")


def logreg_oracle_sql(
    table: str,
    label_sql: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    iters: int = ITERS,
    lr: float = LR,
    salt: str = "qc",
    decimals: int = SCORE_DECIMALS,
    feature: str = "idf",
) -> str:
    """DuckDB mirror of ``quality_classifier`` with the GD iterations
    unrolled as chained CTEs — generated from the same constants."""
    lrs = f"CAST({lr!r} AS DOUBLE)"
    ctes = [
        f"""toks AS (
  SELECT {id_col} AS _id,
         CAST(CAST(({label_sql}) AS INT) AS DOUBLE) AS y,
         unnest(list_filter(regexp_split_to_array(trim(lower({text_col})), '\\s+'),
                            x -> x <> '')) AS w
  FROM {table}
)""",
        (
            f"""feats AS (
  SELECT DISTINCT _id, y,
         (('0x' || left(md5('{salt}:' || w), 8))::bigint % {n_buckets}) AS bkt,
         CAST(1.0 AS DOUBLE) AS tf
  FROM toks
)"""
            if feature == "presence"
            else f"""pres AS (
  SELECT DISTINCT _id, y,
         (('0x' || left(md5('{salt}:' || w), 8))::bigint % {n_buckets}) AS bkt
  FROM toks
),
dfq AS (SELECT bkt, count(*)::double AS _df FROM pres GROUP BY bkt),
nall AS (SELECT count(DISTINCT _id)::double AS _n FROM pres),
feats AS (
  SELECT p._id, p.y, p.bkt, ln(n._n / d._df) AS tf
  FROM pres p JOIN dfq d USING (bkt) CROSS JOIN nall n
)"""
            if feature == "idf"
            else f"""feats AS (
  SELECT _id, y, bkt, _cnt / _dl AS tf
  FROM (
    SELECT _id, y,
           (('0x' || left(md5('{salt}:' || w), 8))::bigint % {n_buckets}) AS bkt,
           count(*)::double AS _cnt,
           sum(count(*)) OVER (PARTITION BY _id) AS _dl
    FROM toks GROUP BY _id, y, 3
  )
)"""
        ),
        "nd AS (SELECT count(DISTINCT _id)::double AS n FROM feats)",
        """cls AS (
  SELECT sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END)::double AS np,
         sum(CASE WHEN y = 1.0 THEN 0 ELSE 1 END)::double AS nn
  FROM (SELECT DISTINCT _id, y FROM feats)
)""",
        """lab AS (
  SELECT d._id, d.y,
         CASE WHEN d.y = 1.0 THEN (c.np + c.nn) / (2.0 * c.np)
              ELSE (c.np + c.nn) / (2.0 * c.nn) END AS cw
  FROM (SELECT DISTINCT _id, y FROM feats) d CROSS JOIN cls c
)""",
        f"w0 AS (SELECT DISTINCT bkt, CAST(0.0 AS DOUBLE) AS w FROM feats)",
        "b0 AS (SELECT CAST(0.0 AS DOUBLE) AS bias)",
    ]
    for t in range(iters):
        ctes.append(f"""m{t} AS (
  SELECT f._id, any_value(f.y) AS y,
         (1.0 / (1.0 + exp(-(sum(f.tf * w.w) + max(b.bias)))) - any_value(f.y))
           * max(l.cw) AS err
  FROM feats f JOIN w{t} w USING (bkt) JOIN lab l ON l._id = f._id
  CROSS JOIN b{t} b
  GROUP BY f._id
)""")
        ctes.append(f"""w{t + 1} AS (
  SELECT w.bkt,
         w.w - {lrs} * coalesce(g.g, 0.0) AS w
  FROM w{t} w LEFT JOIN (
    SELECT f.bkt, sum(m.err * f.tf) / max(n.n) AS g
    FROM feats f JOIN m{t} m USING (_id) CROSS JOIN nd n GROUP BY f.bkt
  ) g USING (bkt)
)""")
        ctes.append(f"""b{t + 1} AS (
  SELECT b.bias - {lrs} * (SELECT sum(err) FROM m{t}) / (SELECT n FROM nd) AS bias
  FROM b{t} b
)""")
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT f._id AS {id_col},
       CAST(max(f.y) AS BIGINT) AS y,
       round(1.0 / (1.0 + exp(-(sum(f.tf * w.w) + max(b.bias)))), {decimals}) AS prob
FROM feats f JOIN w{iters} w USING (bkt) CROSS JOIN b{iters} b
GROUP BY f._id
"""
    )
