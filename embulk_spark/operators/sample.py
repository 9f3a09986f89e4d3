"""Deterministic sampling and training-mix planning.

The last step of a curation pipeline is rarely "keep everything that
survived the filters" — it is "hit a token budget with a target mixture
across (source, lang) strata". Spark's built-in ``df.sample``/``sampleBy``
are seeded-RNG per partition: resilient to nothing (a retry, a
repartition, or a second run over the same corpus picks different rows).
Everything here is a pure function of (salt, row key), so samples are
reproducible across runs, partitionings, task retries, and engines (the
DuckDB oracle replays the identical md5 arithmetic).

The reference's closest analogue is preview's deterministic head sample
(/root/reference/embulk-core/src/main/java/org/embulk/exec/
SamplingParserPlugin.java:131-138 — first-N bytes, reproducible); this
generalizes it to rate-based corpus sampling.

Scale shape: ``hash_uniform`` is one md5 + conv per row (JVM codegen, no
shuffle); ``stratified_sample`` adds one broadcast hash join against the
(tiny) rates table. Nothing collects, nothing depends on row order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_U32 = 4294967296.0  # 2^32


def hash_uniform(key: Column, salt: str = "mix1") -> Column:
    """Deterministic uniform u ∈ [0, 1): first 8 md5 hex chars of
    ``salt:key`` scaled by 2^-32. Oracle-parity form:
    ``('0x' || left(md5(salt || ':' || key), 8))::bigint / 2^32``."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("double")
    return h / F.lit(_U32)


def deterministic_sample(
    df: DataFrame, rate: float, id_col: str, *, salt: str = "mix1"
) -> DataFrame:
    """Keep each row iff hash_uniform(id) < rate — same rows every run,
    any partitioning, any engine."""
    return df.filter(hash_uniform(F.col(id_col), salt) < F.lit(float(rate)))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    rates: dict,
    id_col: str,
    *,
    salt: str = "mix1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: ``rates`` maps a stratum value
    (or tuple of values for multi-column strata) to its keep-rate; strata
    not listed get ``default_rate``. One broadcast join against the tiny
    rates table + the per-row hash filter — no shuffle of the corpus."""
    spark = df.sparkSession
    rows_sql = []
    for k, r in rates.items():
        key = k if isinstance(k, tuple) else (k,)
        if len(key) != len(strata_cols):
            raise ValueError(f"rate key {k!r} does not match strata {strata_cols}")
        lits = ", ".join("'" + str(v).replace("'", "''") + "'" for v in key)
        rows_sql.append(f"({lits}, CAST({float(r)!r} AS DOUBLE))")
    cols = ", ".join([f"`{c}`" for c in strata_cols] + ["`_rate`"])
    # a VALUES relation, not createDataFrame: the latter routes 2 rows
    # through the Python-RDD path and cold-spawns one plain (non-Arrow)
    # python worker per core — measured ~9 s at local[32] for a table
    # this side of the join never needed Python for at all
    rate_df = spark.sql(
        f"SELECT * FROM (VALUES {', '.join(rows_sql)}) AS _rates({cols})"
    )
    casted = df
    join_cond = None
    for c in strata_cols:
        cond = casted[c].cast("string") == rate_df[c]
        join_cond = cond if join_cond is None else (join_cond & cond)
    joined = casted.join(F.broadcast(rate_df), join_cond, "left").select(
        *[casted[c] for c in df.columns],
        F.coalesce(rate_df["_rate"], F.lit(float(default_rate))).alias("_rate"),
    )
    return joined.filter(
        hash_uniform(F.col(id_col), salt) < F.col("_rate")
    ).drop("_rate")


def sample_exact_k(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str,
    *,
    salt: str = "mix1",
) -> DataFrame:
    """EXACTLY k rows per stratum (fewer iff the stratum is smaller) —
    the deterministic reservoir: rank rows by their uniform hash within
    each stratum and keep the k smallest. Rate sampling can't promise a
    count (binomial spread); eval sets, per-domain capping, and
    human-review draws need exact k. Same rows every run, any
    partitioning, any engine — and the sample is STABLE under corpus
    growth: a row is evicted only when a new row hashes below it, never
    reshuffled.

    Scale shape: one exchange on the strata key; the rank sorts each
    stratum locally within its post-shuffle partition (no global sort).
    For hot strata the sort is the per-partition cost of that stratum's
    row count — acceptable to k ~ 10^3; for larger k pre-filter with
    ``deterministic_sample`` at a safe rate first and rank the
    survivors."""
    w = Window.partitionBy(*strata_cols).orderBy(
        hash_uniform(F.col(id_col), salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def weighted_sample(
    df: DataFrame,
    rate: float,
    weight_col: str,
    id_col: str,
    *,
    salt: str = "wps1",
) -> DataFrame:
    """Weighted Poisson sampling with Horvitz–Thompson factors: keep a
    row iff ``hash_uniform(id) < p`` where ``p = min(1, rate·weight)``
    — inclusion probability proportional to the row's weight (an
    importance/quality score, a DSIR weight, a length prior). The
    estimator contract: summing ``ht_factor`` (= 1/p) over the sample
    unbiasedly estimates the population row count; summing
    ``x·ht_factor`` estimates any population total.

    Deterministic across runs/partitionings/engines with NO float-
    parity caveats: ``u`` is an exact binary scaling of a 32-bit md5
    prefix and ``p`` is one IEEE multiply — both engines round
    identically, unlike ln/pow-keyed A-ES ordering. Same rows forever;
    a narrow codegen'd filter, no shuffle, no state.

    Returns ``df`` + ``incl_p`` / ``ht_factor`` columns."""
    p = F.least(
        F.lit(1.0), F.lit(float(rate)) * F.col(weight_col).cast("double")
    )
    return (
        df.withColumn("incl_p", p)
        .filter(hash_uniform(F.col(id_col), salt) < F.col("incl_p"))
        .withColumn("ht_factor", F.lit(1.0) / F.col("incl_p"))
    )


def split_by_group(
    df: DataFrame,
    group_col: str,
    fractions: dict,
    *,
    salt: str = "split1",
) -> DataFrame:
    """Leakage-free train/validation/test split: EVERY row of a group
    (url, domain, dup-cluster id…) lands in the SAME split, so near-
    duplicate rows can never straddle train and eval — the web-corpus
    split hygiene exact/fuzzy dedup exists to protect.

    ``fractions``: ordered {split_name: fraction}, summing to ≤ 1 (any
    remainder joins the LAST split). Assignment is the group key's
    ``hash_uniform`` against cumulative fraction boundaries — pure
    per-row JVM arithmetic, no shuffle, no state; deterministic across
    runs/partitionings/engines, and adding rows to a group never moves
    the group (the cursor-stable property incremental pipelines need).

    Returns ``df`` + a ``split`` column; filter per split downstream."""
    total = sum(float(v) for v in fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    u = hash_uniform(F.col(group_col), salt)
    names = list(fractions)
    expr = F.lit(names[-1])  # remainder → last split
    hi = 0.0
    bounds = []
    for name, frac in fractions.items():
        hi += float(frac)
        bounds.append((name, hi))
    for name, b in reversed(bounds[:-1]):
        expr = F.when(u < F.lit(b), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def mixture_plan(
    available_tokens: dict,
    weights: dict,
    token_budget: int,
) -> dict:
    """Plan per-stratum sampling rates to hit ``token_budget`` tokens at
    the target ``weights`` mixture (driver-side arithmetic over the
    corpus_mixture_stats report — strata counts, not rows).

    Feasibility: a stratum can contribute at most its available tokens,
    so the achievable budget is ``min(budget, min_s avail[s]/w[s])`` —
    scaling the WHOLE mix down keeps the mixture exact instead of
    silently over-weighting rich strata. Returns
    ``{"rates": {stratum: rate}, "tokens": {stratum: planned},
    "achievable_budget": int}``; rates feed stratified_sample directly.
    """
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    norm = {s: w / total_w for s, w in weights.items() if w > 0}
    missing = [s for s in norm if available_tokens.get(s, 0) <= 0]
    if missing:
        raise ValueError(f"strata with target weight but no tokens: {missing}")
    achievable = min(
        float(token_budget),
        min(available_tokens[s] / w for s, w in norm.items()),
    )
    tokens = {s: achievable * w for s, w in norm.items()}
    rates = {s: tokens[s] / available_tokens[s] for s in norm}
    return {
        "rates": rates,
        "tokens": {s: int(t) for s, t in tokens.items()},
        "achievable_budget": int(achievable),
    }
